"""Streaming sources (SURVEY S2/S4/S6).

* S2 — file-source streaming: new files under a directory become new data
  (``spark_stream_processor.py:132-135``). Identical here, any format.
* S4 — Kafka: the reference runs a confluent-kafka ``poll`` loop with manual
  offset commits and JSON decoding (``realtime_data_consumer.py:69-134``);
  the Spark-native equivalent is the built-in kafka source +
  ``from_json(value)`` — offsets live in the checkpoint, exactly-once into
  the lake, no consumer loop to operate. (Untestable in this container — no
  broker — but the plan construction is covered by tests up to ``load()``.)
* S6 — synthetic ticks: the reference's driver-side random-walk producer
  (``stream_data_producer.py:66-98``) becomes a transform over the built-in
  ``rate`` source: stateless, deterministic given the seed, and generated
  *on the executors* — a load generator that scales with the cluster instead
  of one Python process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from stock_market_data_pipeline_spark.schemas import RAW_TICK_SCHEMA
from stock_market_data_pipeline_spark.sources.ticks import SYMBOL_SEEDS


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "csv",
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S2: file-source stream with explicit schema."""
    reader = spark.readStream.schema(schema).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType = RAW_TICK_SCHEMA,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S4: Kafka topic → parsed tick columns (key = symbol, value = JSON)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("m")
    ).select("m.*")


def rate_ticks(
    spark: SparkSession,
    rows_per_second: int = 8,
    seed: int = 42,
) -> DataFrame:
    """S6: deterministic synthetic tick stream over the rate source.

    Each rate row maps to one symbol (round-robin) with a hash-derived
    bounded pseudo-walk around the reference's seed prices — statistically
    matching the reference generator (±1% steps, 5% chance of ±2% jumps,
    volume 1000–100000) without driver-side state.
    """
    base = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    symbols = list(SYMBOL_SEEDS)
    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]), (F.col("value") % len(symbols) + 1).cast("int")
    )
    seed_price = F.element_at(
        F.array(*[F.lit(SYMBOL_SEEDS[s]) for s in symbols]),
        (F.col("value") % len(symbols) + 1).cast("int"),
    )
    u1 = (F.abs(F.xxhash64(F.col("value"), F.lit(seed))) % F.lit(2**53)).cast(
        "double"
    ) / F.lit(float(2**53))
    u2 = (F.abs(F.xxhash64(F.col("value"), F.lit(seed + 1))) % F.lit(2**53)).cast(
        "double"
    ) / F.lit(float(2**53))
    jump = (u2 < F.lit(0.05)).cast("double") * (u1 - 0.5) * 0.04
    walk = F.sin(F.col("value") / 37.0) * 0.02 + (u1 - 0.5) * 0.01 + jump
    return base.select(
        sym.alias("symbol"),
        F.round(seed_price * (1.0 + walk), 2).alias("price"),
        F.lit(None).cast("double").alias("change"),
        F.lit(None).cast("double").alias("change_percent"),
        (1000 + (F.abs(F.xxhash64(F.col("value"), F.lit(seed + 2))) % 99001)).alias("volume"),
        F.col("timestamp"),
    )
