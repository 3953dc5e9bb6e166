"""Round-17 scale probes (SKEW_BENCH.json):

1. ``r17_replace_where_cdf_scale`` — X154: recording the replaceWhere
   change-data sidecar costs O(matched + incoming rows), never
   O(table). A FIXED absolute key range is restated at 1x and 10x
   table rows over a k-clustered layout: the stats classification
   prunes the matched files identically at both scales, so the
   property-ON overhead (sidecar recording = read matched rows once +
   one changed-rows-sized write) stays flat while the table grows 10x.
   Both timings recorded; the receipt is the flat ON-OFF delta.

2. ``r17_table_changes_scale`` — X155: the per-commit batch walk
   (``read_manifest_table_changes``) read two ways. KEYED-DIFF
   reconstruction (pre-property history) costs O(touched bucket-file
   BYTES per commit) — a hash-bucketed merge touching all buckets
   makes each step table-sized, the honest fallback — while the
   SIDECAR-backed walk (property on) reads recorded change rows and
   stays flat across a 10x table growth. The pair is the receipt for
   WHY write-time sidecars exist.

3. ``r17_multipart_sidecar`` — the r16 advice fix: above
   ``_CDF_ROWS_PER_FILE`` rows the sidecar write fans out across
   tasks (``ceil(rows / cap)`` part files) instead of serializing
   through ``coalesce(1)``. Probed with the cap pinned to 100k over a
   ~600k-image merge change set: parts >= ceil (per-partition
   maxRecordsPerFile split), the stream consumes
   the directory unchanged. Production cap is 1M rows/file.
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
from stock_market_data_pipeline_spark.sinks import manifest_lake as ml
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    describe_manifest,
    enable_change_feed,
    merge_upsert_manifest,
    publish_files,
    replace_where_manifest,
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


# same absolute range at both scales -> identical matched-row count
LO, HI = 96_000, 99_999


def _replace_once(spark, tmp, n, with_feed):
    root = f"{tmp}/t_{'on' if with_feed else 'off'}"
    publish_files(
        spark,
        kv_table(spark, n).repartitionByRange(100, "k"),
        root,
        stats_cols=["k"],
    )                                                                # v1
    if with_feed:
        enable_change_feed(spark, root)                              # v2
    incoming = (
        kv_table(spark, HI + 1)
        .filter((F.col("k") >= LO) & (F.col("k") <= HI))
        .withColumn("flag", F.col("flag") + 5000)
    )
    t0 = time.perf_counter()
    r = replace_where_manifest(spark, incoming, root, "k", LO, HI)
    sec = round(time.perf_counter() - t0, 3)
    return root, r, sec


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(ManifestStreamDataSource)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_BENCH.json")
    out = json.load(open(out_path))

    # untimed warm-up: the session's FIRST replace_where pays JVM/codegen
    # warm-up (~7 s observed) that would otherwise pollute the 1x pair
    warm = tempfile.mkdtemp(prefix="smdp_rwcdf_warm_")
    try:
        _replace_once(spark, warm, 200_000, True)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    rw = {}
    for label, n in (("1x", 400_000), ("10x", 4_000_000)):
        tmp = tempfile.mkdtemp(prefix=f"smdp_rwcdf_probe_{label}_")
        try:
            _, r_off, sec_off = _replace_once(spark, tmp, n, False)
            root_on, r_on, sec_on = _replace_once(spark, tmp, n, True)
            d = describe_manifest(spark, root_on)
            # 4000 matched deletes + 4000 incoming inserts, BOTH scales
            assert d["cdf"] == {"rows": 8000}, d["cdf"]
            assert r_on["carried"] >= 90, r_on  # stats-pruned layout held
            rw[label] = {
                "rows": n,
                "cdf_rows": d["cdf"]["rows"],
                "carried_files": r_on["carried"],
                "sec_replace_where_feed_off": sec_off,
                "sec_replace_where_feed_on": sec_on,
                "sec_sidecar_overhead": round(sec_on - sec_off, 3),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    rw["note"] = (
        "same 4000-row absolute range restated at both scales: the "
        "stats classification prunes matched files identically, so the "
        "change_feed overhead (read matched rows + one 8000-row sidecar "
        "write) is flat while the table grows 10x — replaceWhere CDF "
        "costs O(matched + incoming), never O(table)"
    )
    out["r17_replace_where_cdf_scale"] = rw

    # --- per-commit walk scales with changed files, not table size ---
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        read_manifest_table_changes,
    )

    tc = {}
    for label, n in (("1x", 400_000), ("10x", 4_000_000)):
        tmp = tempfile.mkdtemp(prefix=f"smdp_tchg_probe_{label}_")
        try:
            entry = {"rows": n, "commits_walked": 4}
            for mode in ("keyed_diff", "sidecar"):
                root = f"{tmp}/t_{mode}"
                merge_upsert_manifest(
                    spark,
                    kv_table(spark, n).withColumn("seq", F.lit(0)),
                    root, keys=["k"], order_col="seq", n_buckets=32,
                )                                                    # v1
                if mode == "sidecar":
                    enable_change_feed(spark, root)
                for step in range(1, 5):                      # v2..v5
                    batch = (
                        kv_table(spark, 2_000)
                        .withColumn("flag", F.col("flag") + 1000 * step)
                        .withColumn("seq", F.lit(step))
                    )
                    merge_upsert_manifest(
                        spark, batch, root, keys=["k"], order_col="seq",
                        n_buckets=32,
                    )
                v0 = 1 if mode == "keyed_diff" else 2
                t0 = time.perf_counter()
                feed = read_manifest_table_changes(
                    spark, root, v_from=v0, keys=["k"]
                )
                n_feed = feed.count()
                sec = round(time.perf_counter() - t0, 3)
                # 4 commits x 2000 update pairs at BOTH scales
                assert n_feed == 4 * 2 * 2_000, (mode, n_feed)
                entry[f"sec_walk_{mode}"] = sec
                entry["feed_rows"] = n_feed
            tc[label] = entry
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    tc["note"] = (
        "four 2000-key restatement commits walked per-commit, two "
        "ways: the KEYED-DIFF fallback (pre-property history) reads "
        "each commit's touched bucket-file BYTES — all 32 hash "
        "buckets here, so it grows with the table — while the "
        "SIDECAR walk reads recorded change rows and stays flat at "
        "10x; the gap is the case for enable_change_feed on "
        "merge-maintained tables"
    )
    out["r17_table_changes_scale"] = tc

    # --- multi-part sidecar fan-out (cap pinned to 100k) ---
    cap_orig = ml._CDF_ROWS_PER_FILE
    ml._CDF_ROWS_PER_FILE = 100_000
    tmp = tempfile.mkdtemp(prefix="smdp_mpcdf_probe_")
    try:
        root = f"{tmp}/t"
        base = kv_table(spark, 300_000).withColumn("seq", F.lit(0))
        merge_upsert_manifest(
            spark, base, root, keys=["k"], order_col="seq", n_buckets=16,
        )                                                            # v1
        enable_change_feed(spark, root)                              # v2
        restated = (
            kv_table(spark, 300_000)
            .withColumn("flag", F.col("flag") + 7000)
            .withColumn("seq", F.lit(1))
        )
        t0 = time.perf_counter()
        merge_upsert_manifest(
            spark, restated, root, keys=["k"], order_col="seq",
            n_buckets=16,
        )                                                            # v3
        sec_merge = round(time.perf_counter() - t0, 3)
        d = describe_manifest(spark, root)
        assert d["cdf"] == {"rows": 600_000}, d["cdf"]  # 300k pre + post
        scs = [
            f for f in os.listdir(f"{root}/stats") if f.startswith("cdf-")
        ]
        assert len(scs) == 1, scs
        parts = [
            f for f in os.listdir(f"{root}/stats/{scs[0]}")
            if f.endswith(".parquet")
        ]
        assert len(parts) >= 6, parts  # >= ceil(600k/100k); per-partition split
        sink, ckpt = f"{tmp}/sink", f"{tmp}/ckpt"
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("manifest_stream")
            .option("path", root)
            .option("readChangeFeed", "true")
            .option("startingVersion", "2")
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
                "multipart cdf stream probe still running after 300s"
            )
        sec_stream = round(time.perf_counter() - t0, 3)
        assert spark.read.parquet(sink).count() == 600_000
        out["r17_multipart_sidecar"] = {
            "change_rows": 600_000,
            "cap_rows_per_file": 100_000,
            "sidecar_parts": len(parts),
            "sec_merge_with_sidecar": sec_merge,
            "sec_stream_sidecar_commit": sec_stream,
            "note": (
                "a 600k-image merge change set fans out across >=6 "
                "sidecar parts (maxRecordsPerFile) instead of one coalesce(1) "
                "straggler; the stream consumes the directory unchanged "
                "(production cap 1M rows/file)"
            ),
        }
    finally:
        ml._CDF_ROWS_PER_FILE = cap_orig
        shutil.rmtree(tmp, ignore_errors=True)

    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(
        {
            "r17_replace_where_cdf_scale": out["r17_replace_where_cdf_scale"],
            "r17_multipart_sidecar": out["r17_multipart_sidecar"],
        },
        indent=1,
    ))


if __name__ == "__main__":
    main()
