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


def parse_kafka_envelope(
    raw: DataFrame,
    schema: StructType = RAW_TICK_SCHEMA,
    keep_lineage: bool = True,
) -> DataFrame:
    """Kafka wire envelope → typed tick columns (the transform HALF of S4,
    broker-independent and contract-tested against simulated wire rows).

    Input contract = the kafka source's fixed output schema (key/value
    binary, topic, partition, offset, timestamp). ``value`` is the
    reference producer's JSON tick (``stream_data_producer.py:86-94``);
    ``key`` is the symbol. Parsing is PERMISSIVE ``from_json`` — a corrupt
    payload yields a row of nulls rather than killing the stream (poison-
    pill tolerance the reference's ``json.loads`` loop lacks); downstream
    null-gates drop it, and ``_value_ok`` marks it for dead-lettering.

    ``keep_lineage`` retains (topic, partition, offset, kafka_ts) — the
    exactly-once audit columns (P6 metadata parity): offset is the
    per-partition unique id a replayed pipeline dedups on.
    """
    parsed = raw.select(
        F.col("key").cast("string").alias("key_symbol"),
        F.from_json(F.col("value").cast("string"), schema).alias("m"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
    )
    cols = [F.col(f"m.{f.name}") for f in schema.fields]
    lineage = (
        [
            F.col("key_symbol"),
            F.col("topic"),
            F.col("partition"),
            F.col("offset"),
            F.col("kafka_ts"),
        ]
        if keep_lineage
        else []
    )
    required = schema.fields[0].name  # first field is the contract's id col
    return parsed.select(
        *cols,
        *lineage,
        # PERMISSIVE from_json yields a struct of NULL fields (not a null
        # struct) on malformed input — detect via the required field.
        (F.col("m").isNotNull() & F.col(f"m.{required}").isNotNull()).alias(
            "_value_ok"
        ),
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType = RAW_TICK_SCHEMA,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S4: Kafka topic → parsed tick columns (key = symbol, value = JSON).

    Plan construction only runs where a broker exists; the parse/lineage
    half is :func:`parse_kafka_envelope`, tested without one.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_envelope(raw, schema)


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


def dead_letter_stats(
    parsed: DataFrame, ok_col: str = "_value_ok"
) -> DataFrame:
    """Per-(topic, partition) poison-pill rollup over a parsed envelope
    frame (the observability half of S4 — the reference consumer only
    LOGS parse failures, ``realtime_data_consumer.py:96-100``; this makes
    them a queryable metric the dead-letter topic/alerting can ride).

    Output: ``n_rows``, ``n_dead``, ``dead_rate`` (6 dp), and the
    first/last dead offsets — the replay bounds an operator needs to
    re-consume a poisoned window. Map-side-combined aggregate: ≤ one row
    per (topic, partition) ever crosses the shuffle; works identically on
    a batch frame or inside ``foreachBatch``.
    """
    from stock_market_data_pipeline_spark.utils import round_det

    dead = ~F.col(ok_col)
    return parsed.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dead.cast("long")).alias("n_dead"),
        round_det(
            F.sum(dead.cast("long")) / F.count(F.lit(1))
        ).alias("dead_rate"),
        F.min(F.when(dead, F.col("offset"))).alias("first_dead_offset"),
        F.max(F.when(dead, F.col("offset"))).alias("last_dead_offset"),
    )
