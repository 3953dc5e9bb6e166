"""Round-15b scale probe (SKEW_BENCH.json):

``r15_dv_scale`` — X143 deletion vectors. The 100 TB claims under test:
(1) a range-scoped DV delete costs O(pruned files), not O(table) — here
the predicate's support lives in ONE of 16 range-clustered files at
both scales; (2) the delete rewrites ZERO data files (merge-on-read);
(3) the read-side DV subtraction is a bounded overhead vs the plain
read; (4) purge rewrites ONLY the affected file. Measured at 1x
(400k rows) and 10x (4M rows): the delete and purge must track the
pruned-file bytes (~10x the file size, never the 16-file table), the
read overhead ratio must stay flat.
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
    delete_where_dv,
    manifest_files,
    publish_files,
    purge_deletion_vectors,
    read_manifest,
)


def table(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_BENCH.json")
    out = json.load(open(out_path))

    res = {}
    for label, n in (("1x", 400_000), ("10x", 4_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_dv_probe_{label}_")
        try:
            publish_files(
                spark,
                table(spark, n).repartitionByRange(16, "k"),
                root,
                stats_cols=["k"],
            )
            # a real scan on both sides: count() would hit parquet's
            # row-group count pushdown on the plain path only and make
            # the ratio meaningless
            t0 = time.perf_counter()
            plain = read_manifest(spark, root).agg(
                F.count("*"), F.sum("k")
            ).collect()[0]
            n_plain = plain[0]
            sec_read_plain = round(time.perf_counter() - t0, 3)
            names_before = {e["name"] for e in manifest_files(spark, root)}
            t0 = time.perf_counter()
            d = delete_where_dv(
                spark, root, "k < 200", ranges={"k": (None, 200)}
            )
            sec_delete = round(time.perf_counter() - t0, 3)
            assert d["deleted_rows"] == 200, d
            assert d["files_touched"] == 1, d
            assert {
                e["name"] for e in manifest_files(spark, root)
            } == names_before, "merge-on-read violated: files rewritten"
            t0 = time.perf_counter()
            dv_row = read_manifest(spark, root).agg(
                F.count("*"), F.sum("k")
            ).collect()[0]
            sec_read_dv = round(time.perf_counter() - t0, 3)
            assert dv_row[0] == n_plain - 200
            assert dv_row[1] == plain[1] - sum(range(200))
            t0 = time.perf_counter()
            p = purge_deletion_vectors(spark, root)
            sec_purge = round(time.perf_counter() - t0, 3)
            assert p["purged_files"] == 1 and p["carried_files"] == 15, p
            res[label] = {
                "rows": n,
                "files": 16,
                "sec_dv_delete_1file_scoped": sec_delete,
                "sec_read_plain": sec_read_plain,
                "sec_read_with_dv": sec_read_dv,
                "read_overhead_ratio": round(
                    sec_read_dv / max(sec_read_plain, 1e-9), 2
                ),
                # the pinned metric: broadcast-anti-join setup is a
                # FIXED cost, so the absolute delta must stay flat
                "read_overhead_sec": round(
                    sec_read_dv - sec_read_plain, 3
                ),
                "sec_purge": sec_purge,
                "purge_files_rewritten": p["files_rewritten"],
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    res["note"] = (
        "200-row DV delete scoped to 1 of 16 range files at both "
        "scales: zero data files rewritten, delete/purge track the "
        "pruned-file bytes (not the table), read-side DV anti-join "
        "ABSOLUTE overhead (read_overhead_sec) must stay flat — the "
        "ratio denominator shrinks with JVM warmth and is advisory"
    )
    out["r15_dv_scale"] = res

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps({"r15_dv_scale": res}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
