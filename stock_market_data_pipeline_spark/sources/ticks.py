"""Tick-shaped views over the synthetic test lake, plus a deterministic
synthetic tick generator (reference S6).

The engine's domain model is the tick stream ``(symbol, price, volume,
timestamp)`` (SURVEY.md §1.1). The driver's test lake has no tick table, so
:func:`ticks_from_events` maps the ``events`` table onto tick semantics —
``event_type`` plays the symbol, ``value`` the price, the JSON ``props.k``
field the volume — letting every windowed/rolling/OHLCV operator run (and be
oracle-checked) on driver data.

:func:`synthetic_ticks` replaces the reference's random-walk producer
(``src/kafka/producer/stream_data_producer.py:66-98``: ±0.5% market + ±0.5%
stock factor, 5% chance of a ±2% jump, volume 1000–100000, 8 seeded symbols).
The reference's generator is a driver-side Python loop; ours is a declarative
plan over ``spark.range`` (batch) so generation itself distributes, and it is
fully deterministic given (seed, n_ticks) — hash-derived pseudo-randoms, no
Python RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Reference seed prices (stream_data_producer.py:28-37).
SYMBOL_SEEDS: dict[str, float] = {
    "AAPL": 170.0,
    "MSFT": 380.0,
    "GOOGL": 140.0,
    "AMZN": 155.0,
    "META": 480.0,
    "TSLA": 180.0,
    "NVDA": 800.0,
    "INTC": 43.0,
}


def ticks_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the test lake's ``events`` table to canonical tick columns.

    Pure projection — no shuffle; the JSON field extraction stays JVM-side
    (``regexp_extract``), and column pruning reaches the parquet scan.
    """
    from stock_market_data_pipeline_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("symbol"),
        F.col("value").alias("price"),
        F.regexp_extract(F.col("props"), '"k": (\\d+)', 1).cast("long").alias("volume"),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
        F.col("user_id"),
    )


def _unit_hash(*cols) -> F.Column:
    """Deterministic pseudo-uniform in [0, 1) from arbitrary columns.

    xxhash64 is a JVM-side 64-bit hash; dividing its non-negative part by
    2^63 gives a uniform double — the distributed, stateless stand-in for the
    reference's ``random.uniform`` calls.
    """
    return (F.abs(F.xxhash64(*cols)) % F.lit(2**53)).cast("double") / F.lit(float(2**53))


def synthetic_ticks(
    spark: SparkSession,
    n_ticks_per_symbol: int = 240,
    interval_seconds: int = 30,
    start_ts: str = "2024-01-01 00:00:00",
    seed: int = 42,
) -> DataFrame:
    """Deterministic random-walk-style tick table (batch S6 analog).

    Price path: seed_price * cumulative drift expressed in closed form so each
    row is independent of the previous one (no sequential state → fully
    parallel): drift_i = sum of hash-derived steps is approximated by a
    bounded pseudo-walk ``sin``-mix, which preserves the reference's
    *statistical envelope* (±1% steps, occasional ±2% jumps) without a
    sequential dependency. Volume is uniform 1000–100000 like the reference.
    """
    sym_df = spark.createDataFrame(
        [(s, p) for s, p in SYMBOL_SEEDS.items()], ["symbol", "seed_price"]
    )
    idx = spark.range(n_ticks_per_symbol).withColumnRenamed("id", "tick_idx")
    base = sym_df.crossJoin(idx)  # 8 × n — tiny dimension cross, intentional

    u1 = _unit_hash(F.col("symbol"), F.col("tick_idx"), F.lit(seed))
    u2 = _unit_hash(F.col("symbol"), F.col("tick_idx"), F.lit(seed + 1))
    jump = (u2 < F.lit(0.05)).cast("double") * (u1 - 0.5) * 0.04
    # Bounded pseudo-walk: low-frequency sinusoid mix + per-tick noise.
    walk = (
        F.sin(F.col("tick_idx") / 37.0 + F.xxhash64("symbol") % 7) * 0.02
        + (u1 - 0.5) * 0.01
        + jump
    )
    price = F.round(F.col("seed_price") * (1.0 + walk), 2)
    ts = F.to_timestamp(F.lit(start_ts)) + F.make_interval(
        secs=(F.col("tick_idx") * F.lit(interval_seconds)).cast("double")
    )
    df = base.select(
        "symbol",
        price.alias("price"),
        ts.alias("timestamp"),
        (1000 + (F.abs(F.xxhash64("symbol", "tick_idx", F.lit(seed + 2))) % 99001)).alias(
            "volume"
        ),
    )
    w_change = F.round(
        F.col("price") - F.lag("price").over(Window.partitionBy("symbol").orderBy("timestamp")),
        2,
    )
    df = df.withColumn("change", w_change)
    df = df.withColumn(
        "change_percent",
        F.round(F.col("change") / (F.col("price") - F.col("change")) * 100.0, 4),
    )
    return df.select("symbol", "price", "change", "change_percent", "volume", "timestamp")
