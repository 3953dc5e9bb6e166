"""Round-20 scale probes (SKEW_BENCH.json):

1. ``r20_resolve_depth`` — the r19 verdict's top structural item,
   closed: ``_resolve_manifest``/``_list_manifests`` paid one full
   directory listing per resolve — O(retained versions) metadata IO on
   EVERY read/walk/stream cycle (~100 paginated LISTs per read at a
   100k-commit CDF-retaining table on an object store). r20 adds a
   Delta ``_last_checkpoint``-shaped advisory pointer updated
   post-commit under the table lock (the create-exclusive marker stays
   the commit arbiter; a stale pointer is recovered by a bounded
   forward probe). Probe: REAL commit histories at 25 / 250 / 1000
   versions (files staged once, committed one version at a time
   through the real ``_commit`` path), then measure — per latest-
   resolve — the number of filesystem METADATA OPERATIONS (listings,
   existence probes, file reads) and wall time, pointer-backed vs the
   legacy listing path (pointer file deleted). The receipt: pointer-
   backed ops and listing count stay FLAT (listings = 0) while commit
   depth grows 40x; the legacy path pays a listing whose payload grows
   with depth.

Run:  python scripts/skew_probes_r20.py   (merges into SKEW_BENCH.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.session import get_spark
from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    _LATEST_PTR,
    _commit,
    _mf_dir,
    _resolve_manifest,
    _stage_files,
    publish_files,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _build_history(spark, root, n_commits: int) -> None:
    """v1 publish + (n_commits-1) REAL metadata commits: files staged
    once (one write job), then appended entry-at-a-time through the
    real ``_commit`` path — the micro-batch-ingested history shape,
    without paying n write jobs."""
    publish_files(
        spark,
        spark.range(1_000).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        ),
        root,
    )
    fs = _HadoopFS(spark, root)
    cur, meta = _resolve_manifest(fs, root)
    staged = _stage_files(
        spark,
        spark.range(n_commits * 10)
        .select(
            (F.col("id") + 10_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartitionByRange(max(n_commits - 1, 1), "k"),
        root,
        "parquet",
        None,
    )
    entries = list(meta.get("files") or [])
    sj = meta.get("schema")
    for e in staged:
        entries.append(e)
        cur = _commit(
            spark, root, list(entries), "parquet",
            expected_prev=cur, schema_json=sj, operation="APPEND",
        )


class _CountingFS(_HadoopFS):
    """Counts metadata operations per category."""

    def __init__(self, spark, path):
        super().__init__(spark, path)
        self.ops = {"list": 0, "exists": 0, "read": 0}

    def child_names(self, p):
        self.ops["list"] += 1
        return super().child_names(p)

    def is_dir(self, p):
        self.ops["list"] += 1  # listing-path precursor, counted with it
        return super().is_dir(p)

    def exists(self, p):
        self.ops["exists"] += 1
        return super().exists(p)

    def read_text(self, p):
        self.ops["read"] += 1
        return super().read_text(p)


def _measure_resolve(spark, root, n_iter: int = 20) -> dict:
    fs = _CountingFS(spark, root)
    _resolve_manifest(fs, root, None)  # warm (JVM path objects)
    fs.ops = {"list": 0, "exists": 0, "read": 0}
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _resolve_manifest(fs, root, None)
    dt = (time.perf_counter() - t0) / n_iter
    return {
        "ms_per_resolve": round(dt * 1000, 2),
        "listings_per_resolve": fs.ops["list"] / n_iter,
        "exists_per_resolve": fs.ops["exists"] / n_iter,
        "reads_per_resolve": fs.ops["read"] / n_iter,
    }


def main() -> None:
    spark = get_spark(
        app_name="skew-probes-r20",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    depths = [25, 250, 1000]
    tmp = tempfile.mkdtemp(prefix="smdp_r20_resolve_")
    try:
        for d in depths:
            root = f"{tmp}/t{d}"
            spark.sparkContext.setJobDescription(
                f"r20_resolve_depth: build {d}-commit history"
            )
            _build_history(spark, root, d)
            rec = {"pointer": _measure_resolve(spark, root)}
            # legacy path: delete the pointer -> every resolve lists
            fs = _HadoopFS(spark, root)
            fs.delete(f"{_mf_dir(root)}/{_LATEST_PTR}")
            rec["legacy_listing"] = _measure_resolve(spark, root)
            out[f"depth_{d}"] = rec
        ptr_ops = [
            out[f"depth_{d}"]["pointer"]["listings_per_resolve"]
            for d in depths
        ]
        out["claim"] = (
            "pointer-backed latest-resolve pays ZERO directory listings "
            "and a flat, depth-independent op count; the legacy path "
            "lists the whole manifest dir every resolve"
        )
        out["pointer_listings_flat"] = all(x == 0 for x in ptr_ops)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_BENCH.json",
    )
    try:
        with open(path) as fh:
            merged = json.load(fh)
    except (OSError, ValueError):
        merged = {}
    merged["r20_resolve_depth"] = out
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(json.dumps({"r20_resolve_depth": out}))


if __name__ == "__main__":
    main()
