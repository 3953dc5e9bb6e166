"""Round-14b scale probes (SKEW_BENCH.json):

1. ``r14_cluster_compact_scale`` — X133: clustering compaction's cost is
   the rewrite the table already pays (one range shuffle over the small
   files); the payoff is measured as the pruned-read file count on a
   day window before vs after, at 1x and 10x rows.
2. ``r14_composed_prune`` — X134: files opened by a day-range read vs
   the same range COMPOSED with a Bloom point lookup — the intersection
   must open no more (and typically fewer) files, flat at 10x.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.session import get_spark
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    add_bloom_index,
    compact_manifest,
    publish_files,
    read_manifest_pruned,
    read_manifest_pruned_multi,
)


def ts_table(spark, n):
    secs = (F.col("id") * F.lit(864000.0 / n)).cast("double")
    return spark.range(n).select(
        F.col("id").alias("k"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=secs)
        ).alias("ts"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_BENCH.json")
    out = json.load(open(out_path))

    lo = dt.datetime(2026, 1, 4)
    hi = dt.datetime(2026, 1, 4, 23, 59, 59)

    res1 = {}
    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_cc_probe_{label}_")
        try:
            # arrival-ordered ingestion: every file spans all 10 days
            publish_files(spark, ts_table(spark, n).repartition(16),
                          root, stats_cols=["ts"])
            before = len(read_manifest_pruned(
                spark, root, "ts", lo, hi).inputFiles())
            from stock_market_data_pipeline_spark.sinks.manifest_lake import (
                manifest_files,
            )
            total = sum(e["bytes"] for e in manifest_files(spark, root))
            t0 = time.perf_counter()
            # size the target for ~4 clustered outputs (threshold total/8 >
            # per-file total/16, so every file packs) — the payoff is
            # measured ACROSS files, not within one
            r = compact_manifest(
                spark, root, target_file_bytes=max(total // 4, 2),
                cluster_cols=["ts"],
            )
            sec = round(time.perf_counter() - t0, 3)
            after_df = read_manifest_pruned(spark, root, "ts", lo, hi)
            res1[label] = {
                "rows": n, "sec_cluster_compact": sec,
                "files_written": r["files_written"],
                "day_read_files_before": before,
                "day_read_files_after": len(after_df.inputFiles()),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res1["note"] = (
        "arrival-ordered files all straddle the day window (nothing "
        "prunes); after cluster-compaction the day read opens the "
        "overlapping clustered files only"
    )
    out["r14_cluster_compact_scale"] = res1

    res2 = {}
    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_cp_probe_{label}_")
        try:
            publish_files(
                spark,
                ts_table(spark, n).repartitionByRange(16, "ts"),
                root, stats_cols=["ts"],
            )
            add_bloom_index(spark, root, "k")
            key = n // 2  # a key whose ts falls inside the day window?
            # day 4 of 10 -> ids in [0.3n, 0.4n); pick one
            key = int(n * 0.35)
            range_only = read_manifest_pruned(spark, root, "ts", lo, hi)
            t0 = time.perf_counter()
            composed = read_manifest_pruned_multi(
                spark, root, [("ts", lo, hi)], bloom_value=key)
            got = [r["k"] for r in composed.select("k").collect()]
            sec = round(time.perf_counter() - t0, 3)
            assert got == [key], got
            res2[label] = {
                "rows": n,
                "files_range_only": len(range_only.inputFiles()),
                "files_composed": len(composed.inputFiles()),
                "sec_composed_lookup": sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res2["note"] = (
        "the composed read opens the INTERSECTION of the range and bloom "
        "survivor sets — never more than either alone, flat at 10x"
    )
    out["r14_composed_prune"] = res2

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("r14_cluster_compact_scale", "r14_composed_prune")},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
