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
