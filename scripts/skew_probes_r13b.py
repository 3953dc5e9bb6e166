"""Round-13 follow-up probe: ``r13_key_delete_scale`` — the X124
bucket-scoped delete at 1× vs 10× table size. A fixed 5-key delete
against merge-built tables of 20k vs 200k rows (64 buckets) must cost
~flat wall time: the keyset maps to ≤5 buckets, only those buckets'
files are read/anti-joined/rewritten, and the metadata commit reuses
untouched segments — table size only enters through per-bucket file
size, which is held constant here by scaling bucket count with data
volume being rejected (we keep 64 buckets, so 10× rows means 10× bigger
touched files; the honest expectation is therefore sub-linear, bounded
by touched-bucket bytes, NOT flat-at-zero)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_data_pipeline_spark.session import get_spark
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    delete_keys_manifest,
    merge_upsert_manifest,
    read_manifest,
)


def main():
    import shutil
    import tempfile

    spark = get_spark(
        app_name="skew-probes-r13b",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r13bprobe_")
    res = {}
    try:
        for n in (20_000, 200_000):
            root = f"{tmp}/t{n}"
            base = spark.range(n).selectExpr(
                "id AS k", "CAST(id * 2 AS STRING) AS v", "0 AS seq"
            )
            merge_upsert_manifest(
                spark, base, root, keys=["k"], order_col="seq", n_buckets=64
            )
            dk = spark.createDataFrame(
                [(3,), (499,), (1777,), (5003,), (9999,)], "k long"
            )
            t0 = time.perf_counter()
            r = delete_keys_manifest(spark, dk, root, ["k"], 64)
            dt = time.perf_counter() - t0
            assert read_manifest(spark, root).count() == n - 5
            res[f"{n}_rows"] = {
                "delete_s": round(dt, 3),
                "touched_buckets": r["touched_buckets"],
                "carried_files": r["carried_files"],
                "rewritten_files": r["rewritten_files"],
            }
        res["delete_ratio_10x"] = round(
            res["200000_rows"]["delete_s"] / res["20000_rows"]["delete_s"], 2
        )
        res["note"] = (
            "5-key delete touches <=5 of 64 buckets at both sizes; cost "
            "bounded by touched-bucket bytes (which scale with rows here), "
            "so sub-linear growth — never O(table files)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_BENCH.json",
    )
    with open(path) as fh:
        bench = json.load(fh)
    bench["r13_key_delete_scale"] = res
    with open(path, "w") as fh:
        json.dump(bench, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
