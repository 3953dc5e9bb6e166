"""Orchestration-level utilities (SURVEY O1-O4) — Airflow-free library calls.

The reference wires these as Airflow sensors/operators; the engine exposes
them as plain functions so any scheduler (or none) can drive a pipeline:

* O1/O2 — data-availability gate: poll a path until ≥N non-empty data files
  exist (``stock_market_stream_dag.py:10-44``, ``check_minio_file.py:47-88``).
* O4 — post-run lake summary: file/row/partition counts per layer
  (``stock_market_stream_dag.py:190-247``).

URI paths (s3a://, hdfs://, file:) go through the Hadoop FileSystem API
(``sinks/lake._HadoopFS``) like the rest of the lake layer — the round-6
``os.walk`` form silently saw NOTHING on an object store. Scheme-LESS
paths keep the reference sensors' local-disk semantics (resolving them
against ``fs.defaultFS`` would silently re-point a local drop directory
at HDFS on a real cluster); they also work with no SparkSession at all.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def _data_files(path: str, spark: SparkSession | None = None) -> list[tuple[str, int]]:
    """(path, size) of non-empty data files under ``path`` (recursive,
    ``_``/``.``-prefixed basenames skipped).

    Scheme-LESS paths always mean the LOCAL disk (the pre-round-7 os.walk
    semantics the reference sensors had) — resolving them against the
    session's ``fs.defaultFS`` would silently re-point a local-drop sensor
    at HDFS on a cluster (round-7 review). Object stores are explicit:
    pass ``s3a://…``/``hdfs://…``/``file:…`` and the Hadoop FS API is
    used.
    """
    has_scheme = ":" in path.split("/", 1)[0] if "/" in path else ":" in path
    spark = spark or SparkSession.getActiveSession()
    if has_scheme:
        if spark is None:
            # Falling back to os.walk here would silently see NOTHING on
            # s3a://… and burn the sensor's full timeout as if the files
            # never arrived — a configuration error masquerading as an
            # empty directory (round-7 ADVICE). Fail loudly instead.
            raise RuntimeError(
                f"{path} has a filesystem scheme but no SparkSession is "
                "active/passed; a URI sensor needs the Hadoop FS API"
            )
        from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS

        return [
            (p, sz)
            for p, sz in _HadoopFS(spark, path).list_data_files(path)
            if sz > 0
        ]
    found: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            sz = os.path.getsize(full)
            if sz > 0:
                found.append((full, sz))
    return found


def wait_for_path(
    path: str,
    min_files: int = 1,
    timeout_s: float = 180.0,
    poll_s: float = 15.0,
    spark: SparkSession | None = None,
) -> bool:
    """O1/O2: block until ``path`` holds ≥ ``min_files`` non-empty data
    files, or time out (False). Mirrors the reference sensor's 15 s poke /
    180 s timeout defaults. Scheme-less paths poll the local disk; URI
    paths (s3a://, hdfs://, file:) go through the Hadoop FS of the active
    (or explicitly passed) SparkSession."""
    deadline = time.monotonic() + timeout_s
    while True:
        if len(_data_files(path, spark)) >= min_files:
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(poll_s, max(deadline - time.monotonic(), 0.01)))


def describe_lake(spark: SparkSession, root: str, fmt: str = "parquet") -> dict:
    """O4: diagnostic summary of a lake layer — file count, bytes, row count,
    partition directories (any ``key=value`` directory that directly holds
    data files)."""
    files = _data_files(root, spark)
    from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS

    root_plain = _HadoopFS(spark, root)._jpath.toUri().getPath() or root
    partitions = sorted(
        {
            os.path.relpath(parent, root_plain)
            for parent in {os.path.dirname(p) for p, _sz in files}
            if "=" in os.path.basename(parent)
        }
    )
    rows = 0
    if files:
        rows = spark.read.format(fmt).load(root).count()
    return {
        "path": root,
        "n_files": len(files),
        "total_bytes": sum(sz for _p, sz in files),
        "n_rows": rows,
        "partitions": partitions,
    }
