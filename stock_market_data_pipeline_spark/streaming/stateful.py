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
