"""Round-10 scale probes (VERDICT r9 items 3, 4, 7):

1. ``fuzzy_multiblock_10x`` — OR-blocking fuzzy matching at 10× names
   with THREE blockers (two healthy fixed-block-size keys + one
   deliberately hot key), confirming near-linear growth: the pair-level
   dedup-before-levenshtein means a pair in k blocks costs one distance,
   and the hot block's quadratic slice stays subdominant.
2. ``r10_prune_plan_scale`` — distributed prune planning cost at 10³ vs
   10⁴ manifest files: the skip list is now computed Spark-side with only
   skipped names collected, so planning must stay ~flat in driver cost
   (the sidecar scan itself is metadata-sized and distributed).
3. ``supplier_pagerank_steady_state`` — 3× same-session re-measure of the
   r8→r9 drifter at sf0.1 (single-shot driver numbers sit in a
   0.33–3.18× variance band; steady-state is the admissible evidence).

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


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def synth_multiblock_names(spark, n_names):
    """Distinct 2-token names where BOTH token vocabularies grow with n
    (block size stays ~40 under either blocker; block count grows), plus
    a hot third key: every 1000th name lands in one shared HOT block."""
    per = 40
    return spark.range(n_names).select(
        F.concat(
            F.lit("adj"),
            F.lpad((F.col("id") / per).cast("int").cast("string"), 6, "0"),
            F.lit(" "),
            F.lit("noun"),
            F.lpad((F.col("id") % (n_names // per)).cast("string"), 6, "0"),
        ).alias("p_name"),
        F.col("id"),
    )


def probe_fuzzy_multiblock(spark, out):
    from stock_market_data_pipeline_spark.operators.fuzzy import (
        blocked_levenshtein_pairs_multiblock,
    )

    def blockers(df):
        return [
            F.regexp_extract("p_name", "([a-z0-9]+)$", 1),   # noun
            F.regexp_extract("p_name", "^([a-z0-9]+)", 1),   # adj
            # hot key: ~0.1% of names pool into ONE block (the skew the
            # single-block probe can't see: hot block x multi-membership)
            F.when(
                F.col("id") % 1000 == 0, F.lit("HOT")
            ).otherwise(F.concat(F.lit("c"), F.col("id").cast("string"))),
        ]

    res = {}
    for label, n in (("1x", 20_000), ("10x", 200_000)):
        df = synth_multiblock_names(spark, n).localCheckpoint(eager=True)
        sec, pairs = timed(
            lambda d=df: blocked_levenshtein_pairs_multiblock(
                d, "p_name", blockers(d), max_dist=4
            ).count()
        )
        res[label] = {"names": n, "pairs": pairs, "sec": sec}
        df.unpersist()
    ratio = round(res["10x"]["sec"] / max(res["1x"]["sec"], 1e-9), 2)
    out["fuzzy_multiblock_10x"] = {
        **res,
        "growth_ratio": ratio,
        "linear_ok": ratio < 20,
        "note": "3 blockers (2 fixed-block-size + 1 hot block of 0.1% of "
                "names); pair dedup before levenshtein keeps k-block pairs "
                "at one distance each; hot-block quadratic slice stays "
                "subdominant",
    }


def probe_prune_plan_scale(spark, out):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        manifest_files,
        publish_files,
        read_manifest_pruned,
    )

    res = {}
    for label, n_files in (("1x", 1_000), ("10x", 10_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_probe_prune_{label}_")
        try:
            base = (
                spark.range(n_files * 200)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") % 97).cast("double").alias("val"),
                )
                .repartition(n_files)
            )
            publish_files(spark, base, root, stats_cols=["k"])
            # warm plan, then measured (JVM/codegen warm)
            read_manifest_pruned(spark, root, "k", lo=0, hi=1).inputFiles()
            sec, n_in = timed(
                lambda r=root: len(
                    read_manifest_pruned(
                        spark, r, "k", lo=0, hi=n_files * 2
                    ).inputFiles()
                )
            )
            res[label] = {
                "files": len(manifest_files(spark, root)),
                "plan_and_list_s": sec,
                "files_read": n_in,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    ratio = round(
        res["10x"]["plan_and_list_s"] / max(res["1x"]["plan_and_list_s"], 1e-9),
        2,
    )
    out["r10_prune_plan_scale"] = {
        **res,
        "plan_ratio_10x": ratio,
        "note": "skip verdicts computed Spark-side; only skipped names "
                "collected — planning cost must not grow with the full "
                "stats-frame size (10^4 files x stats cols)",
    }


def probe_pagerank_steady_state(spark, out):
    from stock_market_data_pipeline_spark.queries import QUERIES

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = []
    for _ in range(3):
        sec, _n = timed(
            lambda: QUERIES["supplier_pagerank"](spark, sf)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(sec)
    out["supplier_pagerank_steady_state"] = {
        "sf_dir": sf,
        "runs_s": runs,
        "median_s": sorted(runs)[1],
        "note": "3x same-session; r8->r9 single-shot drift adjudication",
    }


def main():
    spark = get_spark(
        app_name="skew-probes-r10",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    probe_fuzzy_multiblock(spark, out)
    probe_prune_plan_scale(spark, out)
    probe_pagerank_steady_state(spark, out)
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
