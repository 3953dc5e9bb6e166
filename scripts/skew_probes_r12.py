"""Round-12 scale probes (SKEW_BENCH.json):

1. ``r12_manifest_shard_scale`` — the two-level manifest at 10^4 vs 10^5
   entries (the round-11 verdict's item 4: the old MAX_MANIFEST_ENTRIES
   hard cap at 100 k made ~800 k-file / 100 TB tables unrepresentable).
   Times commit of a full table, a 10-file append, and a rollback at
   both sizes — append and rollback must stay ~flat in table size
   because untouched segments are carried by reference.

2. ``r12_prune_plan_only`` — planning-only prune timing (verdict item
   5): the r10 probe conflated skip-list planning with reading ~9 k
   surviving rows; this one times ``_sidecar_skip_decisions`` ALONE at
   10^4 vs 10^5 sidecar file rows. Plan cost is one small distributed
   scan, so it must grow far slower than 10x.

Both probes exercise the METADATA path with synthetic entries (no data
files): manifest commits and prune planning never open data files, so
their costs are measurable without writing 10^5 parquet files.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stock_market_data_pipeline_spark.sinks.manifest_lake as ml
from stock_market_data_pipeline_spark.session import get_spark
from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS


def _fake_entries(n, sidecar=None, start=0):
    ents = [
        {"name": f"f{i:08d}.parquet", "bytes": 128 * 1024 * 1024}
        for i in range(start, start + n)
    ]
    if sidecar:
        for e in ents:
            e["stats_file"] = sidecar
    return ents


def probe_shard_scale(spark, out, tmp):
    res = {}
    for n in (10_000, 100_000):
        root = f"{tmp}/shard_{n}"
        t0 = time.perf_counter()
        ml._commit(
            spark, root, _fake_entries(n), "parquet", expected_prev=None
        )
        publish_s = time.perf_counter() - t0

        fs = _HadoopFS(spark, root)
        _, meta = ml._resolve_manifest(fs, root, None)
        t0 = time.perf_counter()
        ml._commit(
            spark,
            root,
            list(meta.get("files") or []) + _fake_entries(10, start=n),
            "parquet",
            expected_prev=1,
            reuse_segments=list(meta.get("segments") or []),
        )
        append_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        ml.rollback_manifest(spark, root, to_version=1)
        rollback_s = time.perf_counter() - t0

        _, m3 = ml._resolve_manifest(fs, root, None)
        res[f"{n}_entries"] = {
            "publish_s": round(publish_s, 3),
            "append10_s": round(append_s, 3),
            "rollback_s": round(rollback_s, 3),
            "segments": len(meta.get("segments") or []),
            "entries_readback": len(ml._manifest_entries(fs, root, m3)),
        }
    res["append_ratio_10x"] = round(
        res["100000_entries"]["append10_s"] / res["10000_entries"]["append10_s"],
        2,
    )
    res["rollback_ratio_10x"] = round(
        res["100000_entries"]["rollback_s"]
        / res["10000_entries"]["rollback_s"],
        2,
    )
    res["note"] = (
        "two-level manifest at the 100 TB entry count the old hard cap "
        "rejected; append/rollback carry untouched segments by reference"
    )
    out["r12_manifest_shard_scale"] = res


def probe_prune_plan_only(spark, out, tmp):
    from pyspark.sql import functions as F

    res = {}
    for n in (10_000, 100_000):
        root = f"{tmp}/plan_{n}"
        # synthesize one sidecar of n file-stat rows: hour-spaced ts ranges
        sc_name = "st-probe"
        base = F.lit("2026-01-01 00:00:00").cast("timestamp")
        rows = (
            spark.range(n)
            .select(
                F.format_string("f%08d.parquet", F.col("id")).alias("file"),
                F.lit("ts").alias("col"),
                F.lit("timestamp").alias("dtype"),
                (base + F.make_interval(hours=F.col("id")))
                .cast("string")
                .alias("vmin"),
                (base + F.make_interval(hours=F.col("id") + 1))
                .cast("string")
                .alias("vmax"),
                F.lit(0).cast("bigint").alias("nulls"),
            )
        )
        rows.coalesce(1).write.mode("overwrite").parquet(
            f"{ml._stats_dir(root)}/{sc_name}"
        )
        entries = _fake_entries(n, sidecar=sc_name)
        # keep ~100 files at the range head: lo at hour 0, hi at hour 100
        klo = ml._stat_key("2026-01-01 00:00:00")
        khi = ml._stat_key("2026-01-05 04:00:00")
        # warm, then 3 timed plan-only runs
        for _ in range(1):
            ml._sidecar_skip_decisions(
                spark, root, entries, "ts", klo, khi, set()
            )
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            dec = ml._sidecar_skip_decisions(
                spark, root, entries, "ts", klo, khi, set()
            )
            runs.append(round(time.perf_counter() - t0, 3))
        res[f"{n}_files"] = {
            "plan_runs_s": runs,
            "median_s": sorted(runs)[1],
            "skipped": sum(1 for v in dec.values() if v),
        }
    res["plan_ratio_10x"] = round(
        res["100000_files"]["median_s"] / res["10000_files"]["median_s"], 2
    )
    res["note"] = (
        "verdict item 5: _sidecar_skip_decisions timed alone (no survivor "
        "read); one distributed sidecar scan, only skipped names collected"
    )
    out["r12_prune_plan_only"] = res


def main():
    import shutil
    import tempfile

    spark = get_spark(
        app_name="skew-probes-r12",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r12probe_")
    out = {}
    try:
        probe_shard_scale(spark, out, tmp)
        probe_prune_plan_only(spark, out, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out, indent=1))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_BENCH.json",
    )
    with open(path) as fh:
        bench = json.load(fh)
    bench.update(out)
    with open(path, "w") as fh:
        json.dump(bench, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
