"""Batch sources: typed CSV/parquet scans over (optionally Hive-partitioned) paths.

Reference parity: S1 CSV batch scan (``spark_batch_processor.py:54``), S3
parquet scan — the reference's loader lists objects with boto3 and reads each
file with pandas (``load_to_snowflake.py:104-144``), a driver-side loop that
cannot scale; ``spark.read.parquet`` on the prefix subsumes it with
distributed, partition-discovering reads. S7 manual partition pruning — the
reference string-builds ``year=/month=/day=`` into the read path
(``spark_batch_processor.py:47``); here you read the lake root and ``.where()``
on partition columns, and Catalyst prunes directories before listing files
(visible as ``PartitionFilters`` in ``.explain``).

Scale notes: explicit schemas avoid inference scans over 100 TB; predicate
pushdown + column pruning reach the parquet reader automatically when filters/
selects are declared on the scan DataFrame (check ``PushedFilters``/
``ReadSchema`` in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

# Test-lake columns physically stored as parquet TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they surface as LongType nanos and are
# converted to microsecond timestamps here (integer `div` — a double-based
# division would lose precision above 2^53 ns).
_NANOS_TS_COLS = frozenset({"ts", "l_shipdate", "o_orderdate"})


def read_csv_lake(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    where: Column | None = None,
) -> DataFrame:
    """Typed CSV scan. ``where`` on partition columns prunes directories."""
    df = spark.read.schema(schema).option("header", str(header).lower()).csv(path)
    return df.where(where) if where is not None else df


def read_parquet_lake(
    spark: SparkSession,
    path: str,
    where: Column | None = None,
) -> DataFrame:
    """Parquet scan with partition discovery; filter for partition pruning."""
    df = spark.read.parquet(path)
    return df.where(where) if where is not None else df


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensively pin the runtime confs this engine's semantics depend on.

    The driver contract hands us an externally-built SparkSession; without
    nanosAsLong every test-lake read throws PARQUET_TYPE_ILLEGAL, and without
    a UTC session timezone window boundaries drift vs. the oracle. Both are
    runtime-settable SQL confs; setting them is idempotent.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # immutable-conf environments keep their own (already-working) values


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the test-lake tables (``<sf_dir>/<name>.parquet``),
    normalizing nano-timestamp columns to proper timestamps."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name in _NANOS_TS_COLS and isinstance(f.dataType, LongType):
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
    return df


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSONL corpus scan with poison-line quarantine — the ingest format of
    most raw LLM-training corpora (one JSON doc per line, a few percent of
    which are truncated or malformed in the wild).

    Returns ``(clean, quarantined)``. The file is scanned as TEXT and parsed
    with ``from_json`` carrying an in-struct corrupt-record field: unlike the
    native ``spark.read.json`` corrupt column (which Spark refuses to query
    in isolation — QUERY_ONLY_CORRUPT_RECORD_COLUMN — forcing a cache), a
    computed struct has no such restriction, so both branches stay lazy,
    prunable plans over one scan definition. Malformed lines keep their raw
    text plus whatever fields half-parsed; clean rows surface typed. At
    100 TB the quarantine side writes to a dead-letter path while the clean
    side flows on — the Kafka poison-pill pattern
    (`streaming/sources.py:parse_kafka_envelope`) applied to files.

    The schema must NOT contain ``quarantine_col``; it is appended here.
    """
    from pyspark.sql.types import StringType

    full = StructType(
        list(schema.fields) + [StructField(quarantine_col, StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": quarantine_col},
        ).alias("_p"),
    )
    # A blank/whitespace-only line parses to a NULL struct (corrupt field
    # null too) — it must land in quarantine, not surface as an all-null
    # "clean" document.
    ok = F.col("_p").isNotNull() & F.col(f"_p.{quarantine_col}").isNull()
    clean = parsed.filter(ok).select(
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.filter(~ok).select(
        "raw_line",
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields],
    )
    return clean, quarantined
