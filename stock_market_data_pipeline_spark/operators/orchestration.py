"""Orchestration-level utilities (SURVEY O1-O4) — Airflow-free library calls.

The reference wires these as Airflow sensors/operators; the engine exposes
them as plain functions so any scheduler (or none) can drive a pipeline:

* O1/O2 — data-availability gate: poll a path until ≥N non-empty data files
  exist (``stock_market_stream_dag.py:10-44``, ``check_minio_file.py:47-88``).
* O4 — post-run lake summary: file/row/partition counts per layer
  (``stock_market_stream_dag.py:190-247``).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def _data_files(path: str) -> list[str]:
    found: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            if os.path.getsize(full) > 0:
                found.append(full)
    return found


def wait_for_path(
    path: str,
    min_files: int = 1,
    timeout_s: float = 180.0,
    poll_s: float = 15.0,
) -> bool:
    """O1/O2: block until ``path`` holds ≥ ``min_files`` non-empty data
    files, or time out (False). Mirrors the reference sensor's 15 s poke /
    180 s timeout defaults."""
    deadline = time.monotonic() + timeout_s
    while True:
        if os.path.isdir(path) and len(_data_files(path)) >= min_files:
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(poll_s, max(deadline - time.monotonic(), 0.01)))


def describe_lake(spark: SparkSession, root: str, fmt: str = "parquet") -> dict:
    """O4: diagnostic summary of a lake layer — file count, bytes, row count,
    partition directories."""
    files = _data_files(root) if os.path.isdir(root) else []
    partitions = sorted(
        {
            os.path.relpath(r, root)
            for r, _d, fs in os.walk(root)
            if fs and "=" in os.path.basename(r)
        }
    )
    rows = 0
    if files:
        rows = spark.read.format(fmt).load(root).count()
    return {
        "path": root,
        "n_files": len(files),
        "total_bytes": sum(os.path.getsize(f) for f in files),
        "n_rows": rows,
        "partitions": partitions,
    }
