"""Round-15 scale probes (SKEW_BENCH.json):

1. ``r15_cdf_scale`` — X136: the change-data-feed read plans only the
   files removed-or-added between versions, so its cost tracks the
   CHANGED files (constant touched-bucket count here) while a full
   ``manifest_version_diff`` joins both whole versions. Measured at 1x
   and 10x table rows with an identical 24-key update batch: the feed's
   advantage over the full diff must hold/widen as the table grows.
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
    manifest_version_diff,
    merge_upsert_manifest,
    read_manifest_changes,
)


def kv_table(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
        F.lit(0).alias("seq"),
    )


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_BENCH.json")
    out = json.load(open(out_path))

    res = {}
    for label, n in (("1x", 400_000), ("10x", 4_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_cdf_probe_{label}_")
        try:
            merge_upsert_manifest(
                spark, kv_table(spark, n), root, keys=["k"],
                order_col="seq", n_buckets=64,
            )
            v1_names = {e["name"] for e in manifest_files(spark, root)}
            batch = spark.createDataFrame(
                [(int(i * n / 24), "updated", 1) for i in range(24)],
                "k long, v string, seq int",
            )
            merge_upsert_manifest(
                spark, batch, root, keys=["k"], order_col="seq",
                n_buckets=64,
            )
            v2_names = {e["name"] for e in manifest_files(spark, root)}
            t0 = time.perf_counter()
            n_cdf = read_manifest_changes(
                spark, root, 1, 2, keys=["k"]
            ).count()
            sec_cdf = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n_diff = manifest_version_diff(
                spark, root, 1, 2, keys=["k"]
            ).count()
            sec_full = round(time.perf_counter() - t0, 3)
            assert n_cdf == 48, n_cdf  # 24 pre + 24 post images
            assert n_diff == 24, n_diff
            res[label] = {
                "rows": n,
                "files_total": len(v2_names),
                "files_changed": len(
                    (v1_names - v2_names) | (v2_names - v1_names)
                ),
                "sec_cdf": sec_cdf,
                "sec_full_version_diff": sec_full,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res["note"] = (
        "same 24-key batch at both scales: the feed joins only the "
        "removed+added bucket files; the full key diff joins both whole "
        "versions — the gap must hold or widen at 10x"
    )
    out["r15_cdf_scale"] = res

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps({"r15_cdf_scale": res}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
