"""Round-16 scale probes (SKEW_BENCH.json):

1. ``r16_update_dv_scale`` — X150: a DV-backed UPDATE of a FIXED
   absolute key slice (same matched-row count at both scales) costs
   O(pruned-file scan) + O(matched bytes staged) + a metadata commit,
   never O(table): at 10x table rows the stats-pruned scan still opens
   ~1 file and the staged postimage bytes stay constant, while the
   naive alternative (publish a CASE-rewritten table — what a user
   without UPDATE does) grows 10x. Mirrors the r15 DV-delete probe's
   framing: cost tracks pruned-file bytes, not table bytes.

2. ``r16_stream_cdf_scale`` — X151: the readChangeFeed stream plans a
   micro-batch from the commit's METADATA (added-file list + DV
   sidecar delta), so streaming one UPDATE commit costs O(changed
   rows), not O(table). Measured as the availableNow lifecycle over
   startingVersion=1 (exactly the update commit) at both scales.
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
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    manifest_files,
    publish_files,
    update_where_dv,
)
from stock_market_data_pipeline_spark.streaming.manifest_source import (
    ManifestStreamDataSource,
)


def kv_table(spark, n_rows):
    return spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("bigint").alias("flag"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


# same absolute slice at both scales -> identical matched-row count
PRED = "k >= 96000 AND k < 100000 AND flag < 500"
RANGES = {"k": (96000, 99999)}


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(ManifestStreamDataSource)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_BENCH.json")
    out = json.load(open(out_path))

    upd, scdf = {}, {}
    for label, n in (("1x", 400_000), ("10x", 4_000_000)):
        tmp = tempfile.mkdtemp(prefix=f"smdp_updv_probe_{label}_")
        root = f"{tmp}/t"
        try:
            # k-clustered layout (100 files): the slice prunes to ~1 file
            publish_files(
                spark,
                kv_table(spark, n).repartitionByRange(100, "k"),
                root,
                stats_cols=["k"],
            )                                                        # v1
            names_v1 = {e["name"] for e in manifest_files(spark, root)}
            t0 = time.perf_counter()
            r = update_where_dv(
                spark, root, {"flag": "flag + 1000"}, PRED,
                ranges=RANGES,
            )                                                        # v2
            sec_upd = round(time.perf_counter() - t0, 3)
            assert r["updated_rows"] == 2000, r  # fixed at BOTH scales
            new_files = [
                e for e in manifest_files(spark, root)
                if e["name"] not in names_v1
            ]
            staged_bytes = sum(int(e["bytes"]) for e in new_files)

            # the no-UPDATE alternative: CASE-rewrite the whole table
            t0 = time.perf_counter()
            rewritten = kv_table(spark, n).withColumn(
                "flag",
                F.expr(f"CASE WHEN {PRED} THEN flag + 1000 ELSE flag END"),
            )
            publish_files(
                spark, rewritten.repartitionByRange(100, "k"),
                f"{tmp}/full", stats_cols=["k"],
            )
            sec_full = round(time.perf_counter() - t0, 3)
            upd[label] = {
                "rows": n,
                "updated_rows": r["updated_rows"],
                "files_touched": r["files_touched"],
                "update_staged_bytes": staged_bytes,
                "sec_update_dv": sec_upd,
                "sec_full_case_rewrite": sec_full,
            }

            # stream exactly the UPDATE commit as a change feed
            sink, ckpt = f"{tmp}/sink", f"{tmp}/ckpt"
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("manifest_stream")
                .option("path", root)
                .option("readChangeFeed", "true")
                .option("startingVersion", "1")
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "cdf stream probe still running after 300s — "
                    "refusing to record a partial-sink timing"
                )
            sec_stream = round(time.perf_counter() - t0, 3)
            n_feed = spark.read.parquet(sink).count()
            assert n_feed == 2 * r["updated_rows"], n_feed
            scdf[label] = {
                "rows": n,
                "feed_rows": n_feed,
                "sec_stream_one_update_commit": sec_stream,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    upd["note"] = (
        "same 2000-row absolute slice at both scales: update_where_dv "
        "scans the ~1 stats-pruned file and stages O(matched) postimage "
        "bytes (flat), while the CASE-rewrite alternative republishes "
        "the whole table (10x) — the Delta DV-UPDATE cost model"
    )
    scdf["note"] = (
        "streaming one UPDATE commit plans from commit metadata (added "
        "files + DV sidecar delta) and reads preimages by Table.take on "
        "the one touched file: cost tracks changed rows, not table rows"
    )
    out["r16_update_dv_scale"] = upd
    out["r16_stream_cdf_scale"] = scdf

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(
        {"r16_update_dv_scale": upd, "r16_stream_cdf_scale": scdf},
        indent=1,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
