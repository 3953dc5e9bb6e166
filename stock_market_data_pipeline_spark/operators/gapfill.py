"""Time-series gap-fill + forward-fill (hypertable-rollup-style operator).

Market data (and any event stream) has empty intervals; downstream
consumers — charting, feature windows, model training — want a DENSE grid
per key with the last observation carried forward. The reference's pandas
paths get this for free from ``DataFrame.resample``; distributed, it has to
be built from relational pieces:

1. bucket ticks to the grid step (``date_trunc`` family — pure projection);
2. aggregate one row per (key, bucket): last price in bucket, volume sum —
   single map-side-combined hash aggregate, shuffle is #keys × #buckets;
3. generate each key's full bucket range with ``sequence`` + ``explode`` —
   the grid materializes from per-key (min, max) bounds, i.e. from the
   TINY aggregated table, never from the tick table;
4. left-join the grid to the observed buckets (equi-join on key+bucket);
5. forward-fill with ``last(col, ignorenulls=True)`` over an unbounded
   preceding window per key — one sort per key, Spark's native
   running-aggregate window, no UDF.

Scale shape: everything after step 2 operates on #keys × #buckets rows
(grid size), independent of tick count. The window in step 5 partitions by
key, so no single-partition global sort exists anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill_forward_fill(
    df: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    volume: str = "volume",
    step_minutes: int = 15,
    tiebreak: str | None = None,
) -> DataFrame:
    """Dense per-key time grid at ``step_minutes`` with forward-filled close.

    Output per (key, bucket): ``close`` = last observed price at or before
    the bucket (carried forward across empty buckets), ``bucket_volume`` =
    volume observed IN the bucket (0 when empty — volume is a flow, not a
    level, so it does not carry), ``is_gap`` = 1 iff the bucket had no
    ticks. Leading buckets before a key's first tick cannot exist: the grid
    starts at each key's first observed bucket.

    Bucketing: minutes-since-epoch floored to the step — portable arithmetic
    (the oracle computes the identical expression), avoids tz-sensitive
    truncation beyond the minute.
    """
    step = step_minutes * 60
    # Epoch-second arithmetic, not date_trunc: floor(unix/step)*step is the
    # same integer expression in every engine and session timezone
    # (timestamp_seconds/make_timestamp are both tz-free epoch constructors).
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts)) / step).cast("bigint") * step
    )
    # last-in-bucket price: with a tiebreak, take the struct-max over
    # (ts, tiebreak, price) — lexicographic, so duplicate timestamps resolve
    # by the unique tiebreak instead of partition order (the repo-wide
    # determinism rule; bare max_by(price, ts) is nondeterministic on ties).
    if tiebreak is not None:
        last_price = F.max(
            F.struct(
                F.col(ts).alias("_t"),
                F.col(tiebreak).alias("_k"),
                F.col(price).alias("_p"),
            )
        ).getField("_p")
    else:
        last_price = F.max_by(price, ts)
    observed = (
        df.groupBy(F.col(key), bucket.alias("bucket"))
        .agg(
            last_price.alias("last_price"),
            F.sum(volume).alias("bucket_volume"),
        )
    )
    bounds = observed.groupBy(key).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = bounds.select(
        F.col(key),
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"interval {step} seconds")
            )
        ).alias("bucket"),
    )
    joined = grid.join(observed, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key),
        F.col("bucket"),
        F.last("last_price", ignorenulls=True).over(w).alias("close"),
        F.coalesce("bucket_volume", F.lit(0)).alias("bucket_volume"),
        F.col("last_price").isNull().cast("int").alias("is_gap"),
    )


def gapfill_interpolate(
    df: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    step_minutes: int = 15,
    tiebreak: str | None = None,
) -> DataFrame:
    """Dense per-key time grid with LINEAR interpolation across gaps — the
    resampling mode ML feature pipelines want where forward-fill's step
    function biases downstream deltas: a gap bucket gets
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)`` between the
    nearest observed buckets on each side. The grid spans first..last
    observed bucket per key, so every gap has both endpoints by
    construction (no extrapolation).

    Same portable epoch-floor bucketing as :func:`gapfill_forward_fill`;
    the interpolation arithmetic is a fixed sequence of IEEE double ops
    both engines evaluate identically. Output: ``key, bucket, price
    (6 dp), is_gap``.

    Scale: one shuffle on ``key`` for the grouped last-price, then the
    grid explode and two windows ride the same (key, bucket) sort — the
    window frames are unbounded but ``last/first ignorenulls`` are
    running accumulators, not per-row rescans.
    """
    step = step_minutes * 60
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts)) / step).cast("bigint") * step
    )
    if tiebreak is not None:
        last_price = F.max(
            F.struct(
                F.col(ts).alias("_t"),
                F.col(tiebreak).alias("_k"),
                F.col(price).alias("_p"),
            )
        ).getField("_p")
    else:
        last_price = F.max_by(price, ts)
    observed = df.groupBy(F.col(key), bucket.alias("bucket")).agg(
        last_price.alias("last_price")
    )
    bounds = observed.groupBy(key).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = bounds.select(
        F.col(key),
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"interval {step} seconds")
            )
        ).alias("bucket"),
    )
    joined = grid.join(observed, [key, "bucket"], "left")
    secs = F.unix_timestamp("bucket")
    obs_secs = F.when(F.col("last_price").isNotNull(), secs)
    w_prev = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_p = F.last("last_price", ignorenulls=True).over(w_prev)
    prev_s = F.last(obs_secs, ignorenulls=True).over(w_prev)
    next_p = F.first("last_price", ignorenulls=True).over(w_next)
    next_s = F.first(obs_secs, ignorenulls=True).over(w_next)
    frac = (secs - prev_s) / (next_s - prev_s).cast("double")
    interp = F.when(
        F.col("last_price").isNotNull(), F.col("last_price")
    ).otherwise(prev_p + (next_p - prev_p) * frac)
    from stock_market_data_pipeline_spark.utils import round_det

    return joined.select(
        F.col(key),
        F.col("bucket"),
        round_det(interp, 6).alias("price"),
        F.col("last_price").isNull().cast("int").alias("is_gap"),
    )
