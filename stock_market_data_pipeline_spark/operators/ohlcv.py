"""Daily OHLCV rollup (SURVEY A6) — the operator the reference *implies but
never implements*: its warehouse loader demands
symbol/date/daily_open/high/low/volume/close/change from
``processed/historical`` (``load_to_snowflake.py:100,157-167``, DDL `:71-84`)
but no job produces that path. This operator closes the gap.

``daily_change`` is underspecified in the reference; the engine implements
both documented choices:

* intraday (default): close − open of the same day.
* close-over-close: close − lag(close) over (symbol ORDER BY date) — the
  conventional daily change; first day per symbol → NULL.

Scale notes: a single hash aggregate keyed (symbol, date) with map-side
combine — shuffle volume is #symbols × #days regardless of tick count.
``min_by``/``max_by`` pick open/close deterministically by timestamp (the
reference's pandas path relies on file order). The close-over-close variant
adds one window over the *aggregated* (tiny) table, not the tick table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_ohlcv(
    df: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    volume: str = "volume",
    change_mode: str = "intraday",
) -> DataFrame:
    agg = (
        df.groupBy(F.col(key), F.to_date(F.col(ts)).alias("date"))
        .agg(
            F.min_by(price, ts).alias("daily_open"),
            F.max(price).alias("daily_high"),
            F.min(price).alias("daily_low"),
            F.max_by(price, ts).alias("daily_close"),
            F.sum(volume).alias("daily_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
    )
    if change_mode == "intraday":
        return agg.withColumn("daily_change", F.col("daily_close") - F.col("daily_open"))
    if change_mode == "close_over_close":
        w = Window.partitionBy(key).orderBy("date")
        return agg.withColumn(
            "daily_change", F.col("daily_close") - F.lag("daily_close").over(w)
        )
    raise ValueError(f"unknown change_mode: {change_mode}")
