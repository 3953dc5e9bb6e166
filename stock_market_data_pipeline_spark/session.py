"""SparkSession factory with scale-appropriate defaults.

The reference tunes its sessions per-script (shuffle.partitions=2/4, Kryo,
AQE on in one variant only — see SURVEY.md §4). Here there is exactly one
factory: AQE + partition coalescing + skew-join handling always on, session
timezone pinned to UTC (window boundaries must be timezone-stable to match
any oracle), Arrow enabled for the few Pandas-UDF paths.

At 100 TB the same factory applies — only ``shuffle_partitions`` (or leaving
AQE to coalesce from a high initial number) and cluster-manager configs
change; nothing in the operator library depends on local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[*] test/bench envelope; override per call.
_DEFAULTS: dict[str, str] = {
    # Window boundaries, to_date(), and oracle comparisons are TZ-sensitive.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching — the scale workhorses.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime row-level filtering: when a selective filter sits on the
    # build side of a shuffle join, inject a bloom filter on the probe-side
    # scan — at 100 TB this prunes fact-table rows before they ever ride
    # the shuffle. Size gates (creationSideThreshold 10 MB / application-
    # side scan threshold 10 GB) stay at Spark defaults so tiny local joins
    # skip the overhead; tests pin the injection with the gates lowered
    # (tests/test_plan_shapes.py::test_runtime_bloom_filter_injects).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for mapInPandas / pandas_udf operators (multimodal, ANN rerank).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.compression.codec": "snappy",
    # Write timestamps as INT64 micros, not Spark's legacy INT96: INT96
    # carries no usable parquet statistics, which (a) defeats row-group
    # min/max pruning on every timestamp predicate a reader pushes down
    # and (b) blocks the manifest sinks' footer-harvested stats sidecars
    # (guide §6 — predicate pushdown needs stats the writer actually
    # records). Micros is also the parquet ecosystem's interchange type.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Timestamps in the synthetic lake are naive; keep NTZ inference so
    # Spark and the DuckDB oracle agree on wall-clock values.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # The test lake stores TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as long and convert centrally (sources.batch.read_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # T8: drain in-flight micro-batches on shutdown (reference SP:46).
    "spark.streaming.stopGracefullyOnShutdown": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "stock-market-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default policy.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    cluster is configured; on a real cluster pass ``None`` with a configured
    ``spark-submit``/cluster manager and the master arg is untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
