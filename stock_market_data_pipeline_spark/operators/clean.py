"""Cast-and-clean projections + data-quality predicates (SURVEY P1-P4, A7, A9).

Reference parity:

* P1 type-cast projection — ``to_timestamp(timestamp)``, price/change →
  Double, volume → numeric (``spark_stream_processor.py:139-144``). The
  reference casts volume to IntegerType; we use LongType (real volumes exceed
  2^31 — SURVEY §7 defect list).
* P2 ``regexp_replace(change_percent, "%", "")`` then cast
  (``spark_stream_processor.py:142-143``).
* P3 null-rejecting filter on symbol/price/timestamp
  (``dags/scripts/spark_stream_batch_processor.py:111-113``).
* P4 range-validation predicates (``README.md:676-694``): price <= 0 count,
  future-timestamp count — exposed as :func:`quality_counts`.
* A9 null-fill: numeric → 0, string → 'unknown'
  (``load_stream_to_snowflake.py:203-208``) — :func:`fill_defaults`.

All expressions are built-in functions → whole-stage codegen; the null
filters are Catalyst-pushable into the scan (``PushedFilters: IsNotNull``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from stock_market_data_pipeline_spark.schemas import normalize_tick_columns


def cast_ticks(df: DataFrame) -> DataFrame:
    """Raw wire tick (string-typed fields) → canonical typed tick."""
    df = normalize_tick_columns(df)
    return df.select(
        F.col("symbol"),
        F.col("price").cast("double").alias("price"),
        F.col("change").cast("double").alias("change"),
        F.regexp_replace(F.col("change_percent").cast("string"), "%", "")
        .cast("double")
        .alias("change_percent"),
        F.col("volume").cast("long").alias("volume"),
        F.to_timestamp(F.col("timestamp")).alias("timestamp"),
    )


def drop_invalid(
    df: DataFrame, required: tuple[str, ...] = ("symbol", "price", "timestamp")
) -> DataFrame:
    """P3: reject rows with nulls in the required columns (pushable filters)."""
    cond = None
    for c in required:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond)


def quality_counts(
    df: DataFrame,
    price_col: str = "price",
    ts_col: str = "timestamp",
) -> dict[str, int]:
    """P4/A7 data-quality summary in ONE pass (single job, conditional aggs).

    The reference runs one ``count()`` action per check; at 100 TB each is a
    full scan. Conditional aggregation folds all checks into one scan.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col(price_col) <= 0).cast("long")).alias("nonpositive_price"),
        F.sum((F.col(ts_col) > F.current_timestamp()).cast("long")).alias("future_ts"),
        F.sum(F.col(price_col).isNull().cast("long")).alias("null_price"),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}


def fill_defaults(
    df: DataFrame, numeric_default: float = 0.0, string_default: str = "unknown"
) -> DataFrame:
    """A9: numeric nulls → 0, string nulls → 'unknown' (type-aware)."""
    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    out = df
    if num_cols:
        out = out.na.fill(numeric_default, subset=num_cols)
    if str_cols:
        out = out.na.fill(string_default, subset=str_cols)
    return out
