"""Central, explicit schemas (SURVEY.md §1.2).

The reference declares every schema explicitly and never infers
(``src/spark/jobs/spark_stream_processor.py:75-82``,
``src/spark/jobs/spark_batch_processor.py:36-43``). We keep that discipline —
explicit schemas skip inference scans and make CSV/JSON reads deterministic —
but fix its landmines:

* the producer emits ``percent_change`` while every consumer schema says
  ``change_percent`` (positional-binding accident,
  ``src/kafka/producer/stream_data_producer.py:92``): the engine normalizes to
  ``change_percent`` at ingest via :func:`normalize_tick_columns`.
* ``volume`` was String → cast IntegerType (overflow above 2^31,
  ``spark_stream_processor.py:144``): the engine uses LongType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw tick as it arrives from the wire (JSON/CSV): numeric-ish fields are
# strings and are cast in flight by operators.clean.cast_ticks
# (reference: spark_stream_processor.py:75-82).
RAW_TICK_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), nullable=False),
        StructField("price", DoubleType(), nullable=True),
        StructField("change", DoubleType(), nullable=True),
        StructField("change_percent", StringType(), nullable=True),
        StructField("volume", StringType(), nullable=True),
        StructField("timestamp", StringType(), nullable=True),
    ]
)

# Tick after cast-and-clean: the canonical in-engine shape.
CLEAN_TICK_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), nullable=False),
        StructField("price", DoubleType(), nullable=True),
        StructField("change", DoubleType(), nullable=True),
        StructField("change_percent", DoubleType(), nullable=True),
        StructField("volume", LongType(), nullable=True),
        StructField("timestamp", TimestampType(), nullable=True),
    ]
)

# Daily OHLCV bar (reference: batch_data_producer.py:73-86,104-106).
OHLCV_SCHEMA = StructType(
    [
        StructField("date", StringType(), nullable=True),
        StructField("symbol", StringType(), nullable=False),
        StructField("open", DoubleType(), nullable=True),
        StructField("high", DoubleType(), nullable=True),
        StructField("low", DoubleType(), nullable=True),
        StructField("close", DoubleType(), nullable=True),
        StructField("volume", LongType(), nullable=True),
        StructField("batch_id", StringType(), nullable=True),
        StructField("batch_date", StringType(), nullable=True),
    ]
)

# Producer-order variant of the raw tick (field named percent_change), for
# wire formats that arrive with producer naming.
PRODUCER_TICK_FIELDS = ["symbol", "price", "change", "percent_change", "volume", "timestamp"]


def normalize_tick_columns(df: DataFrame) -> DataFrame:
    """Normalize producer naming (``percent_change``) to the canonical
    ``change_percent`` (SURVEY.md §1.2 naming landmine)."""
    if "percent_change" in df.columns and "change_percent" not in df.columns:
        df = df.withColumnRenamed("percent_change", "change_percent")
    return df
