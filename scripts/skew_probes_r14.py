"""Round-14 scale probes (SKEW_BENCH.json):

1. ``r14_replace_where_scale`` — X128: a predicate-scoped replace of a
   ~10% time window on a range-clustered table must cost O(window-touched
   files), a small fraction of the full-table publish, and the fraction
   must HOLD as the table grows 10x (the backfill story at 100 TB).
2. ``r14_wap_overhead`` — X129: write-audit-publish vs a plain append of
   the same batch. The commit-machinery delta (stage JSON without marker
   + promote re-check + marker) must stay ~flat in table size; the
   audit's own candidate scan is the workload's choice and is reported
   separately (here: one null-count over the key column).
3. ``r14_incremental_scale`` — X130: an incremental read after a small
   append must cost O(appended files) — ~flat as the base table grows
   10x — because planning is a metadata-only file-set difference and the
   scan opens only the added files.
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
    append_files,
    publish_files,
    publish_files_wap,
    read_manifest_incremental,
    replace_where_manifest,
)


def timed(fn):
    t0 = time.perf_counter()
    res = fn()
    return round(time.perf_counter() - t0, 3), res


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
    out = json.load(open(out_path)) if os.path.exists(out_path) else {}

    # 1. replaceWhere at 1x/10x
    res1 = {}
    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_rw_probe_{label}_")
        try:
            df = ts_table(spark, n).repartitionByRange(16, "ts")
            sp, _ = timed(lambda: publish_files(spark, df, root,
                                                stats_cols=["ts"]))
            lo = dt.datetime(2026, 1, 4)
            hi = dt.datetime(2026, 1, 4, 23, 59, 59)
            incoming = ts_table(spark, n // 100).filter(
                F.col("ts").between(F.lit(lo), F.lit(hi))
            )
            sr, r = timed(lambda: replace_where_manifest(
                spark, incoming, root, "ts", lo, hi))
            res1[label] = {
                "rows": n, "sec_full_publish": sp, "sec_replace": sr,
                "replace_vs_publish": round(sr / max(sp, 1e-9), 2), **r,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res1["ratio_10x"] = round(
        res1["10x"]["sec_replace"] / res1["1x"]["sec_replace"], 2)
    res1["note"] = (
        "replace cost = window-touched files (carried files are metadata-"
        "only); the replace/publish fraction must stay small at 10x"
    )
    out["r14_replace_where_scale"] = res1

    # 2. WAP overhead vs plain append at 1x/10x base-table size
    res2 = {}
    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_wap_probe_{label}_")
        try:
            base = ts_table(spark, n).repartitionByRange(16, "ts")
            publish_files(spark, base, root, stats_cols=["ts"])
            batch = ts_table(spark, 1_000).withColumn(
                "k", F.col("k") + 10_000_000)
            sa, _ = timed(lambda: append_files(spark, batch, root))
            audit = lambda cand: cand.filter(F.col("k").isNull()).count() == 0
            sw, _ = timed(lambda: publish_files_wap(
                spark, batch, root, audit=audit))
            res2[label] = {
                "base_rows": n, "sec_append": sa, "sec_wap": sw,
                "wap_delta_s": round(sw - sa, 3),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res2["note"] = (
        "wap_delta = markerless stage + candidate audit (one key "
        "null-count scan — the workload's own choice) + re-check + "
        "marker; commit machinery stays metadata-sized, the audit scan "
        "is the honest variable cost"
    )
    out["r14_wap_overhead"] = res2

    # 3. incremental read flat vs base size
    res3 = {}
    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_inc_probe_{label}_")
        try:
            publish_files(spark, ts_table(spark, n).repartitionByRange(
                16, "ts"), root, stats_cols=["ts"])
            batch = ts_table(spark, 5_000).withColumn(
                "k", F.col("k") + 10_000_000)
            append_files(spark, batch.repartition(2), root)
            si, cnt = timed(lambda: read_manifest_incremental(
                spark, root, 1).count())
            assert cnt == 5_000, cnt
            res3[label] = {"base_rows": n, "sec_incremental": si,
                           "rows_returned": cnt}
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res3["ratio_10x"] = round(
        res3["10x"]["sec_incremental"] / res3["1x"]["sec_incremental"], 2)
    res3["note"] = (
        "planning = metadata file-set difference, scan = the 2 appended "
        "files only; must stay ~flat as the base grows 10x"
    )
    out["r14_incremental_scale"] = res3

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("r14_replace_where_scale", "r14_wap_overhead",
                       "r14_incremental_scale")}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
