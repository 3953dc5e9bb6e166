"""Time-window aggregations: sliding + tumbling (SURVEY A1-A5, T2-T3).

Reference parity:

* A1 — ``groupBy(symbol, window(ts, "15 minutes", "5 minutes")).agg(avg(price)
  → ma_15m, stddev(price) → volatility_15m, sum(volume) → volume_sum_15m)``
  (``spark_stream_processor.py:182,186-198``).
* A2 — same with ``window(ts, "1 hour", "10 minutes")``
  (``spark_stream_processor.py:183,200-213``).
* A3-A5 — tumbling 5m/15m/1h aggregates with first/last/avg/min/max/stddev/
  sum/count (``dags/scripts/spark_stream_batch_processor.py:149-203``). The
  reference's ``first(ts)``/``last(ts)`` without ordering are
  non-deterministic; the engine uses ``min``/``max`` over the timestamp and
  ``min_by``/``max_by`` for order-correlated values (SURVEY §7 hard-part #2).

``stddev`` is *sample* stddev (``stddev_samp``) exactly like the reference —
single-row groups produce NULL; tests pin that behavior.

Scale notes: ``groupBy(key, window(...))`` is a single hash-aggregate with
map-side partial aggregation — one shuffle keyed on (key, window). A sliding
window of size w and slide s expands each row into w/s window instances
*before* the partial aggregate (Spark's `Expand` node); the pre-shuffle
combine keeps shuffle volume at (#keys × #windows), independent of row count.
Skewed keys (one hot symbol) are handled by AQE skew-join/partition splitting;
for extreme skew pre-salt with ``salt_column``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _window_bounds(prefix: str = "") -> list[Column]:
    return [
        F.col("window.start").alias(f"window_start{prefix}"),
        F.col("window.end").alias(f"window_end{prefix}"),
    ]


def det_avg(col: str | Column, cents_scale: int = 100) -> Column:
    """Partitioning-independent mean of a fixed-decimal-precision column.

    A plain double ``avg`` differs in the last ulps between partitionings
    (addition order) — enough to flip a rounded comparison on exact .5
    boundaries. Market prices carry fixed 2-dp precision, so scaling to
    integer cents and summing longs is exact and associative (and much
    cheaper than decimal accumulation); the trailing double divisions are
    then bit-identical everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    cents = F.round(c * cents_scale, 0).cast("long")
    return (
        F.sum(cents).cast("double") / F.lit(float(cents_scale)) / F.count(F.lit(1))
    )


def sliding_metrics(
    df: DataFrame,
    window_size: str,
    slide: str,
    suffix: str,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    volume: str = "volume",
) -> DataFrame:
    """A1/A2: per-(key, sliding window) moving average, volatility, volume sum.

    Output: key, window_start, window_end, ma_<suffix>, volatility_<suffix>,
    volume_sum_<suffix> — the reference's column contract
    (``spark_stream_processor.py:186-213``).
    """
    return (
        df.groupBy(F.col(key), F.window(F.col(ts), window_size, slide))
        .agg(
            det_avg(price).alias(f"ma_{suffix}"),
            F.stddev(price).alias(f"volatility_{suffix}"),
            F.sum(volume).alias(f"volume_sum_{suffix}"),
        )
        .select(F.col(key), *_window_bounds(), f"ma_{suffix}", f"volatility_{suffix}", f"volume_sum_{suffix}")
    )


def tumbling_metrics(
    df: DataFrame,
    window_size: str,
    window_type: str,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    volume: str = "volume",
) -> DataFrame:
    """A3-A5 (deterministic form): tumbling-window OHLC-style metric block.

    Generic metric names (avg_price, min_price, …) per SURVEY U1 so windows of
    different sizes union by name — not by position.
    ``first/last`` → ``min_by/max_by`` on the timestamp for determinism.
    """
    return (
        df.groupBy(F.col(key), F.window(F.col(ts), window_size))
        .agg(
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
            # struct keys pin ties: lowest price opens among tied-earliest
            # ticks, highest closes among tied-latest (round-8 review —
            # the repo-wide OHLC tie rule, mirrored by the oracle's
            # struct_pack min/max)
            F.min_by(price, F.struct(F.col(ts), F.col(price))).alias(
                "open_price"
            ),
            F.max_by(price, F.struct(F.col(ts), F.col(price))).alias(
                "close_price"
            ),
            det_avg(price).alias("avg_price"),
            F.min(price).alias("min_price"),
            F.max(price).alias("max_price"),
            F.stddev(price).alias("volatility"),
            F.sum(volume).alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            F.col(key),
            *_window_bounds(),
            "first_ts",
            "last_ts",
            "open_price",
            "close_price",
            "avg_price",
            "min_price",
            "max_price",
            "volatility",
            "total_volume",
            "tick_count",
        )
        .withColumn("window_type", F.lit(window_type))
    )


def session_windows(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows: activity bursts per key separated by ≥ ``gap`` idle.

    Uses Spark's native ``session_window`` (state-mergeable, streaming-ready):
    session start = first event, end = last event + gap, matching the
    standard session semantics. One shuffle on (key, merged window).
    """
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("first_event"),
            F.max(ts).alias("last_event"),
        )
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_event",
            "last_event",
        )
    )


def salt_column(key: Column, buckets: int) -> Column:
    """Skew mitigation helper: stable salt in [0, buckets) to append to a hot
    grouping key; aggregate twice (salted partial → unsalted final)."""
    return F.pmod(F.xxhash64(key), F.lit(buckets))


def salted_sum_agg(
    df,
    keys: list[str],
    sums: dict[str, str],
    salt_src: str,
    buckets: int = 16,
):
    """Two-phase skew-safe aggregation: partial sums keyed (keys..., salt),
    then the unsalted final — a hot key's rows split across ``buckets``
    reducers in phase 1, so no single task owns the whole key.

    ``sums`` maps output alias → input column (SUM/COUNT decompose exactly;
    for AVG carry sum+count and divide in the final projection — never
    average partial averages). AQE's skew-join/agg handles moderate skew on
    its own; explicit salting is for the pathological hot key you know about
    (one symbol = half the exchange feed).

    EXACT-TYPE COLUMNS ONLY (integral/decimal): their addition is
    associative, so the two-phase result is bit-identical to the direct
    GROUP BY — the oracle-equality claim. Float/double sums REASSOCIATE
    under salting (different partial order → different last-ulp results,
    varying with partitioning), so they are rejected here; sum cents/
    DECIMAL instead (`plans.relational._exact_sum`, `rolling._frame_avg`).
    """
    for alias, src in sums.items():
        dt = df.schema[src].dataType.typeName()
        if dt in ("double", "float"):
            raise TypeError(
                f"salted_sum_agg({alias}={src!r}): {dt} sums reassociate "
                f"under salting and lose bit-equality with the direct "
                f"aggregation; cast to DECIMAL or integer units first"
            )
    salted = df.withColumn("_salt", salt_column(F.col(salt_src), buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(src).alias(f"_p_{alias}") for alias, src in sums.items()],
        F.count(F.lit(1)).alias("_p_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{alias}").alias(alias) for alias in sums],
        F.sum("_p_n").alias("n_rows"),
    )
