"""Round-9 scale probes: manifest metadata path after the stats-sidecar
rewrite (judge item 3) — append commit cost and rollback cost must stay
~flat as the table's existing file count grows 10×, because an append's
stats work is O(new files) (one sidecar per staging pass, no driver
stats collect) and a rollback is a pure metadata commit.

Merges results into SKEW_BENCH.json. Run alone (no concurrent Spark).
"""

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
    manifest_files,
    publish_files,
    read_manifest_pruned,
    rollback_manifest,
)


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def synth(spark, n_rows):
    return spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("val"),
    )


def main():
    spark = get_spark(app_name="skew-probes-r9", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = {}

    for label, n_files in (("1x", 60), ("10x", 600)):
        root = tempfile.mkdtemp(prefix=f"smdp_probe_mfappend_{label}_")
        try:
            base = synth(spark, n_files * 2000).repartition(n_files)
            t_pub, _ = timed(
                lambda: publish_files(spark, base, root, stats_cols=["k"])
            )
            inc = synth(spark, 8000).repartition(4)
            # warm append, then the measured one (JVM/codegen warm)
            append_files(spark, inc, root, stats_cols=["k"])
            t_app, _ = timed(
                lambda: append_files(spark, inc, root, stats_cols=["k"])
            )
            t_rb, _ = timed(lambda: rollback_manifest(spark, root, 1))
            # pruned-read planning: stats sidecar scan + file skip
            t_prune, n_in = timed(
                lambda: len(
                    read_manifest_pruned(
                        spark, root, "k", lo=0, hi=100
                    ).inputFiles()
                )
            )
            results[label] = {
                "files": len(manifest_files(spark, root)),
                "publish_s": t_pub,
                "append4_s": t_app,
                "rollback_s": t_rb,
                "prune_plan_s": t_prune,
                "pruned_files_read": n_in,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    probe = {
        "append_commit_ratio_10x": round(
            results["10x"]["append4_s"] / results["1x"]["append4_s"], 2
        ),
        "rollback_ratio_10x": round(
            results["10x"]["rollback_s"] / max(results["1x"]["rollback_s"], 1e-3), 2
        ),
        "detail": results,
    }
    print(json.dumps(probe, indent=1))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_BENCH.json",
    )
    with open(path) as fh:
        bench = json.load(fh)
    bench["r9_manifest_sidecar_scale"] = probe
    with open(path, "w") as fh:
        json.dump(bench, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
