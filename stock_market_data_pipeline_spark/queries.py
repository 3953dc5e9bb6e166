"""Query registry: every implemented operator expressed as a named query
over the driver test lake, paired 1:1 with a DuckDB oracle in ``oracles.py``.

Each callable takes ``(spark, sf_dir)`` and returns a DataFrame whose column
NAMES and (rounded) VALUES match the oracle SQL exactly — the driver sorts
columns by name and hashes values (see repo contract in ``__spark_entry__``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.clean import (
    cast_ticks,
    drop_invalid,
)
from stock_market_data_pipeline_spark.plans.analytics import (
    multi_window_analytics,
    windowed_analytics,
    with_trading_signals,
)
from stock_market_data_pipeline_spark.operators.windows import sliding_metrics
from stock_market_data_pipeline_spark.sources.batch import read_table
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events
from stock_market_data_pipeline_spark.utils import round_doubles


# --------------------------------------------------------------------------
# Reference-parity queries (SURVEY §2) on the tick view of `events`
# --------------------------------------------------------------------------


def q_clean_cast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: wire-format (string-typed) ticks → typed, null-filtered ticks.

    Round-trips the events table through the raw wire shape (strings, '%'
    suffix on change_percent) to exercise the full cast path.
    """
    ev = read_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_type").alias("symbol"),
        F.col("value").cast("string").alias("price"),
        F.lit(None).cast("string").alias("change"),
        F.concat(F.col("value").cast("string"), F.lit("%")).alias("change_percent"),
        F.regexp_extract("props", '"k": (\\d+)', 1).alias("volume"),
        F.col("ts").cast("string").alias("timestamp"),
    )
    t = drop_invalid(cast_ticks(raw))
    return t.filter(F.col("price") > 0)


def q_sliding_window_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: 15-minute window sliding every 5 minutes — ma/volatility/volume."""
    t = ticks_from_events(spark, sf_dir)
    return round_doubles(sliding_metrics(t, "15 minutes", "5 minutes", "15m"))


def q_sliding_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: 1-hour window sliding every 10 minutes."""
    t = ticks_from_events(spark, sf_dir)
    return round_doubles(sliding_metrics(t, "1 hour", "10 minutes", "1h"))


def q_windowed_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SBP pipeline): A1 × A2 joined on (symbol, window_start)."""
    t = ticks_from_events(spark, sf_dir)
    return round_doubles(windowed_analytics(t))


def q_multi_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-A5 + U1: long-format 5min ∪ 15min ∪ 1hour tumbling metric table."""
    t = ticks_from_events(spark, sf_dir)
    return round_doubles(multi_window_analytics(t))


def q_trading_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (fixed): bullish/bearish, volatility level, volume trend per window."""
    t = ticks_from_events(spark, sf_dir)
    return round_doubles(with_trading_signals(windowed_analytics(t)))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "clean_cast_filter": q_clean_cast_filter,
    "sliding_window_15m": q_sliding_window_15m,
    "sliding_window_1h": q_sliding_window_1h,
    "windowed_analytics": q_windowed_analytics,
    "multi_window_tumbling": q_multi_window_tumbling,
    "trading_signals": q_trading_signals,
}
