"""The windowed-analytics plans — the reference's flagship pipelines,
re-expressed as composable DataFrame plans.

* :func:`windowed_analytics` ≙ SBP ``process_streaming_data``
  (``spark_stream_batch_processor.py:126-202``): watermark-tolerant clean →
  15m/5m sliding metrics (A1) → 1h/10m sliding metrics (A2) → inner join on
  (symbol, window_start) (J1) → final projection (P5). Output schema matches
  the warehouse contract ``load_stream_to_snowflake.py:86-103``:
  symbol, window_start, window_15m_end, window_1h_end, ma_15m, ma_1h,
  volatility_15m, volatility_1h, volume_sum_15m, volume_sum_1h.

* :func:`multi_window_analytics` ≙ DAP
  (``dags/scripts/spark_stream_batch_processor.py:141-245``) with the
  reference's three defects fixed (SURVEY U1/P8 and §7 hard-part #3):
  positional union → ``unionByName`` over generic metric names; trading
  signals computed where their inputs exist; no missing-column
  AnalysisException.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.joins import join_windowed_metrics
from stock_market_data_pipeline_spark.operators.rolling import with_rolling_metrics
from stock_market_data_pipeline_spark.operators.windows import (
    det_avg,
    sliding_metrics,
    tumbling_metrics,
)


def windowed_analytics(ticks: DataFrame) -> DataFrame:
    """15m-sliding × 1h-sliding metric join (SBP pipeline, exact semantics)."""
    m15 = sliding_metrics(ticks, "15 minutes", "5 minutes", "15m").withColumnRenamed(
        "window_end", "window_15m_end"
    )
    m1h = sliding_metrics(ticks, "1 hour", "10 minutes", "1h").withColumnRenamed(
        "window_end", "window_1h_end"
    )
    joined = join_windowed_metrics(m15, m1h)
    return joined.select(
        "symbol",
        "window_start",
        "window_15m_end",
        "window_1h_end",
        "ma_15m",
        "ma_1h",
        "volatility_15m",
        "volatility_1h",
        "volume_sum_15m",
        "volume_sum_1h",
    )


def multi_window_analytics(ticks: DataFrame) -> DataFrame:
    """Long-format multi-window table: 5min ∪ 15min ∪ 1hour tumbling metrics.

    The union is by NAME over identical generic schemas (window sizes emit
    the same columns), with ``window_type`` ∈ {5min, 15min, 1hour} as the
    discriminator — the reference's positional-union misalignment (DAP:206-215)
    cannot happen by construction.
    """
    w5 = tumbling_metrics(ticks, "5 minutes", "5min")
    w15 = tumbling_metrics(ticks, "15 minutes", "15min")
    w1h = tumbling_metrics(ticks, "1 hour", "1hour")
    return w5.unionByName(w15).unionByName(w1h)


def multi_window_signals(ticks: DataFrame, tiebreak: str = "event_id") -> DataFrame:
    """Full DAP-parity pipeline (``dags/scripts/spark_stream_batch_processor
    .py:121-245``), with the reference's three defects fixed:

    1. rolling 5/15/30-row metrics per tick (W1-W5, deterministic tiebreak);
    2. tumbling 5min/15min/1hour blocks that *carry* the rolling metrics via
       ``min_by(·, timestamp)`` (the reference's unordered ``first()`` is
       non-deterministic) under generic names — ma_primary/ma_secondary/
       rolling_volatility per window type, matching DAP's
       first(ma_5)/first(ma_15) per-window picks;
    3. union **by name** (U1 fix), then signals computed where their inputs
       exist (P8 fix): volume_trend compares each window's volume to the
       *covering 1-hour window's* volume via an explicit join — the
       reference referenced a ``total_volume_1h`` column that did not
       survive its positional union (AnalysisException).

    Scale: ONE pass — rolling is one sort-shuffle per symbol, and the three
    tumbling granularities aggregate together via GROUPING SETS over
    precomputed window starts (Catalyst's Expand ×3 + one partial-aggregated
    shuffle), instead of three scans/sorts/shuffles through a union. The
    volume join's right side is the tiny 1-hour slice → broadcast.
    """
    roll = with_rolling_metrics(ticks, tiebreak=tiebreak)
    ts = "timestamp"
    with_starts = roll.withColumns(
        {
            "ws5": F.date_trunc("minute", ts)
            - F.make_interval(mins=F.minute(ts) % 5),
            "ws15": F.date_trunc("minute", ts)
            - F.make_interval(mins=F.minute(ts) % 15),
            "ws1h": F.date_trunc("hour", ts),
        }
    )
    agg = with_starts.groupingSets(
        [["symbol", "ws5"], ["symbol", "ws15"], ["symbol", "ws1h"]],
        "symbol",
        "ws5",
        "ws15",
        "ws1h",
    ).agg(
        F.min_by("ma_5", ts).alias("first_ma_5"),
        F.min_by("ma_15", ts).alias("first_ma_15"),
        F.min_by("ma_30", ts).alias("first_ma_30"),
        F.min_by("price_volatility_5", ts).alias("first_pv5"),
        F.min_by("price_volatility_15", ts).alias("first_pv15"),
        det_avg("price").alias("avg_price"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.stddev("price").alias("volatility"),
        F.sum("volume").alias("total_volume"),
        F.count(F.lit(1)).alias("tick_count"),
    )
    wtype = (
        F.when(F.col("ws5").isNotNull(), "5min")
        .when(F.col("ws15").isNotNull(), "15min")
        .otherwise("1hour")
    )
    wstart = F.coalesce("ws5", "ws15", "ws1h")
    wmins = (
        F.when(F.col("ws5").isNotNull(), 5)
        .when(F.col("ws15").isNotNull(), 15)
        .otherwise(60)
    )
    unioned = agg.select(
        "symbol",
        wstart.alias("window_start"),
        (wstart + F.make_interval(mins=wmins)).alias("window_end"),
        wtype.alias("window_type"),
        "avg_price",
        "min_price",
        "max_price",
        "volatility",
        "total_volume",
        "tick_count",
        F.when(F.col("ws5").isNotNull(), F.col("first_ma_5"))
        .when(F.col("ws15").isNotNull(), F.col("first_ma_15"))
        .otherwise(F.col("first_ma_30"))
        .alias("ma_primary"),
        F.when(F.col("ws5").isNotNull(), F.col("first_ma_15"))
        .when(F.col("ws15").isNotNull(), F.col("first_ma_30"))
        .otherwise(F.lit(None).cast("double"))
        .alias("ma_secondary"),
        F.when(F.col("ws5").isNotNull(), F.col("first_pv5"))
        .when(F.col("ws15").isNotNull(), F.col("first_pv15"))
        .otherwise(F.lit(None).cast("double"))
        .alias("rolling_volatility"),
    )
    b1h = unioned.filter(F.col("window_type") == "1hour")

    hourly = b1h.select(
        F.col("symbol").alias("h_symbol"),
        F.col("window_start").alias("h_start"),
        F.col("total_volume").alias("volume_1h"),
    )
    joined = unioned.join(
        F.broadcast(hourly),
        (F.col("symbol") == F.col("h_symbol"))
        & (F.date_trunc("hour", F.col("window_start")) == F.col("h_start")),
    ).drop("h_symbol", "h_start")
    return (
        joined.withColumn(
            "price_trend",
            F.when(F.col("ma_primary") > F.col("ma_secondary"), "bullish")
            .when(F.col("ma_primary") < F.col("ma_secondary"), "bearish")
            .otherwise("neutral"),
        )
        .withColumn(
            "volatility_level",
            F.when(F.col("volatility") > 2.0, "high")
            .when(F.col("volatility") > 1.0, "medium")
            .otherwise("low"),
        )
        .withColumn(
            "volume_trend",
            F.when(
                F.col("total_volume") > F.col("volume_1h") * 0.3, "high_activity"
            ).otherwise("normal_activity"),
        )
        .drop("volume_1h")
    )


def with_trading_signals(metrics: DataFrame) -> DataFrame:
    """P8 trading signals, computed where their inputs exist (pre-union safe).

    Expects the :func:`windowed_analytics` schema (both 15m and 1h metrics on
    one row — so ``volume_sum_1h`` genuinely exists, unlike DAP:244):

    * price_trend: bullish/bearish/neutral — ma_15m vs ma_1h.
    * volatility_level: high/medium/low — volatility_15m thresholds 2.0/1.0
      (DAP:238-241).
    * volume_trend: high_activity when the 15-minute volume exceeds 30% of
      the 1-hour volume (DAP:242-244), else normal_activity.
    """
    return (
        metrics.withColumn(
            "price_trend",
            F.when(F.col("ma_15m") > F.col("ma_1h"), "bullish")
            .when(F.col("ma_15m") < F.col("ma_1h"), "bearish")
            .otherwise("neutral"),
        )
        .withColumn(
            "volatility_level",
            F.when(F.col("volatility_15m") > 2.0, "high")
            .when(F.col("volatility_15m") > 1.0, "medium")
            .otherwise("low"),
        )
        .withColumn(
            "volume_trend",
            F.when(
                F.col("volume_sum_15m") > F.col("volume_sum_1h") * 0.3, "high_activity"
            ).otherwise("normal_activity"),
        )
    )
