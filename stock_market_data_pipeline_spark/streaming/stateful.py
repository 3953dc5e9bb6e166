"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful operator beyond built-in windowed aggregation;
this is the engine's extension point for semantics Structured Streaming's
built-ins can't express — running per-key accumulators that survive across
micro-batches with explicit state schemas and timeouts.

:func:`stream_running_vwap` — per-symbol running VWAP (volume-weighted
average price) over the whole stream: state = (Σ price·volume, Σ volume),
updated per micro-batch, one output row per key per batch. State lives in
the executor state store (checkpointed, exactly-once under foreachBatch-free
sinks); memory is O(#keys), independent of stream length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VWAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("last_ts", TimestampType()),
        StructField("cum_volume", LongType()),
        StructField("vwap", DoubleType()),
    ]
)
VWAP_STATE_SCHEMA = StructType(
    [
        StructField("cum_pv", DoubleType()),
        StructField("cum_vol", LongType()),
    ]
)


def _vwap_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cum_pv, cum_vol = state.get if state.exists else (0.0, 0)
    last_ts = None
    for pdf in pdfs:
        cum_pv += float((pdf["price"] * pdf["volume"]).sum())
        cum_vol += int(pdf["volume"].sum())
        ts_max = pdf["timestamp"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((cum_pv, cum_vol))
    yield pd.DataFrame(
        {
            "symbol": [key[0]],
            "last_ts": [last_ts],
            "cum_volume": [cum_vol],
            "vwap": [round(cum_pv / cum_vol, 6) if cum_vol else None],
        }
    )


def stream_running_vwap(ticks: DataFrame) -> DataFrame:
    """Running VWAP per symbol across micro-batches (custom stateful op).

    Input: a *streaming* ticks DataFrame with symbol/price/volume/timestamp.
    Output stream: one (symbol, last_ts, cum_volume, vwap) row per key per
    micro-batch in update mode.
    """
    return ticks.groupBy("symbol").applyInPandasWithState(
        _vwap_fn,
        outputStructType=VWAP_OUTPUT_SCHEMA,
        stateStructType=VWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SILENCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("last_seen", TimestampType()),
        StructField("status", StringType()),
    ]
)
SILENCE_STATE_SCHEMA = StructType([StructField("last_seen_ms", LongType())])


def make_silence_fn(gap_seconds: int):
    """Build the per-key state function for :func:`stream_silence_monitor`
    (gap is closed over — applyInPandasWithState passes no extra args)."""

    def _silence_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last_ms,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "symbol": [key[0]],
                    "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                    "status": ["stale"],
                }
            )
            return
        last_ms = state.get[0] if state.exists else 0
        for pdf in pdfs:
            ts_max = pdf["timestamp"].max()
            last_ms = max(last_ms, int(ts_max.value // 1_000_000))
        state.update((last_ms,))
        state.setTimeoutTimestamp(last_ms + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                "status": ["active"],
            }
        )

    return _silence_fn


def stream_silence_monitor(
    ticks: DataFrame,
    gap_seconds: int = 600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Feed-health monitor: emits ``active`` per key per micro-batch and a
    terminal ``stale`` row once the event-time watermark passes the key's
    last event + ``gap_seconds`` — i.e. detects symbols that went SILENT,
    something windowed aggregation cannot express (no rows → no windows; the
    signal is the *absence* of data).

    Built on ``applyInPandasWithState`` with ``EventTimeTimeout``: state per
    key is one timestamp (O(#keys) memory); the timeout fires inside a later
    micro-batch when the watermark (driven by OTHER keys' events) crosses the
    deadline, and the state is dropped — a stale key that resumes starts
    fresh. The reference's availability checks poll object-store paths from
    Airflow (`check_minio_file.py`); this is the in-engine, per-key,
    event-time-correct form.
    """
    return (
        ticks.withWatermark("timestamp", watermark)
        .groupBy("symbol")
        .applyInPandasWithState(
            make_silence_fn(gap_seconds),
            outputStructType=SILENCE_OUTPUT_SCHEMA,
            stateStructType=SILENCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Heavy hitters: mergeable Misra-Gries summary per key (public algorithm —
# Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable Summaries").
# ---------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("max_count", LongType()),
        StructField("n_seen", LongType()),
    ]
)
HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("offset", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def make_heavy_hitters_fn(k: int):
    """Per-key state function: maintain at most ``k`` Misra-Gries counters
    across micro-batches. Each batch folds in as a Counter merge followed
    by the MG reduction (subtract the (k+1)-th largest count, drop ≤ 0) —
    the mergeable-summaries form, vectorized per Arrow batch instead of a
    per-row decrement loop.

    Guarantees (classic MG): ``est_count ≤ true ≤ est_count + offset``
    where ``offset`` accumulates every subtraction, and ANY item with true
    frequency > n_seen/(k+1) is guaranteed present in the summary. State
    is O(k) per key — independent of stream length."""
    import heapq
    from collections import Counter

    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, offset, n_seen = state.get
            summary = dict(zip(items, counts))
        else:
            summary, offset, n_seen = {}, 0, 0
        c = Counter(summary)
        for pdf in pdfs:
            # dropna BEFORE astype: astype(str) renders None as the literal
            # string "None", which would manufacture a phantom heavy hitter
            # out of missing data (round-7 review). NULL items are simply
            # not counted; surface missingness via dead_letter_stats-style
            # gates upstream.
            vals = pdf["item"].dropna().astype(str).tolist()
            n_seen += len(vals)
            c.update(vals)
        if len(c) > k:
            kth = heapq.nlargest(k + 1, c.values())[k]
            offset += kth
            c = Counter({i: v - kth for i, v in c.items() if v > kth})
        state.update(
            (list(c.keys()), [int(v) for v in c.values()], int(offset), int(n_seen))
        )
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "group": [str(key[0])] * len(ordered),
                "item": [i for i, _ in ordered],
                "est_count": pd.Series([v for _, v in ordered], dtype="int64"),
                "max_count": pd.Series(
                    [v + offset for _, v in ordered], dtype="int64"
                ),
                "n_seen": pd.Series([n_seen] * len(ordered), dtype="int64"),
            }
        )

    return _fn


def stream_heavy_hitters(
    events: DataFrame, k: int = 8, group_col: str = "group", item_col: str = "item"
) -> DataFrame:
    """Streaming top-item summary per group with O(k) state (custom
    stateful op Spark lacks natively): emits the current Misra-Gries
    summary per key per micro-batch in update mode. Any item whose true
    frequency exceeds n_seen/(k+1) is guaranteed present; per-item bounds
    come back as [est_count, max_count]. The exact batch groupBy count is
    the reconciliation twin (lambda pairing, like VWAP)."""
    src = events.select(
        events[group_col].cast("string").alias("group"),
        events[item_col].cast("string").alias("item"),
    )
    return src.groupBy("group").applyInPandasWithState(
        make_heavy_hitters_fn(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
