"""Round-8 skew/scale probes: fuzzy blocking (block-count vs block-size
growth), manifest retention vs full rewrite, bucket fingerprints, and a
hot-user interval merge. Merges results into SKEW_BENCH.json.

Run alone (no concurrent Spark) — single-shot numbers at local[32].
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def synth_names(spark, n_nouns, names_per_noun):
    """Distinct 2-token names: <adj_i> <noun_j>; rows = 3 per name."""
    nouns = [f"noun{j:04d}" for j in range(n_nouns)]
    return (
        spark.range(n_nouns * names_per_noun)
        .select(
            F.concat(
                F.lit("adj"),
                F.lpad((F.col("id") % names_per_noun).cast("string"), 5, "0"),
                F.lit(" "),
                F.element_at(
                    F.array(*[F.lit(x) for x in nouns]),
                    (F.col("id") / names_per_noun).cast("int") + 1,
                ),
            ).alias("p_name")
        )
        .withColumn("dup", F.explode(F.array(*[F.lit(i) for i in range(3)])))
        .drop("dup")
    )


def main():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    out = {}

    from stock_market_data_pipeline_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
    )

    # 1a. block-COUNT growth (block size fixed): the scale path — linear.
    blk = F.regexp_extract("p_name", "([a-z0-9]+)$", 1)
    d1 = synth_names(spark, 50, 40).localCheckpoint(eager=True)
    d10 = synth_names(spark, 500, 40).localCheckpoint(eager=True)
    s1, n1 = timed(
        lambda: blocked_levenshtein_pairs(d1, "p_name", blk, 4).count()
    )
    s10, n10 = timed(
        lambda: blocked_levenshtein_pairs(d10, "p_name", blk, 4).count()
    )
    out["fuzzy_block_count_10x"] = {
        "names_1x": 2000, "names_10x": 20000,
        "pairs_1x": n1, "pairs_10x": n10,
        "sec_1x": s1, "sec_10x": s10,
        "growth_ratio": round(s10 / max(s1, 1e-9), 2),
        "linear_ok": s10 / max(s1, 1e-9) < 20,
        "note": "10x more blocks at fixed block size -> pair work grows "
                "linearly; this is the posture the block key must deliver",
    }

    # 1b. block-SIZE growth (one noun): the documented quadratic worst
    # case the length-band guard only dampens.
    g1 = synth_names(spark, 1, 1000).localCheckpoint(eager=True)
    g3 = synth_names(spark, 1, 3000).localCheckpoint(eager=True)
    s1b, p1 = timed(
        lambda: blocked_levenshtein_pairs(g1, "p_name", blk, 4).count()
    )
    s3b, p3 = timed(
        lambda: blocked_levenshtein_pairs(g3, "p_name", blk, 4).count()
    )
    out["fuzzy_giant_block_3x"] = {
        "names_1x": 1000, "names_3x": 3000,
        "pairs_1x": p1, "pairs_3x": p3,
        "sec_1x": s1b, "sec_3x": s3b,
        "growth_ratio": round(s3b / max(s1b, 1e-9), 2),
        "note": "degenerate single block -> O(size^2) candidate pairs; "
                "quantifies the worst case the block-key choice exists to "
                "prevent (cf. giant_cell_semantic_dedup)",
    }

    # 2. manifest retention vs full rewrite at 10x.
    import datetime as dt
    import shutil
    import tempfile

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        publish_files,
        retention_delete,
    )

    def ts_table(n):
        # spread evenly over the full 10-day range at ANY scale, so the
        # cutoff always lands mid-table (the 1x probe otherwise never
        # exercises the carry path)
        secs = (F.col("id") * F.lit(864000.0 / n)).cast("double")
        return spark.range(n).select(
            F.col("id").alias("k"),
            (
                F.lit("2026-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=secs)
            ).alias("ts"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )

    for label, n in (("1x", 200_000), ("10x", 2_000_000)):
        root = tempfile.mkdtemp(prefix=f"smdp_ret_probe_{label}_")
        try:
            df = ts_table(n).repartitionByRange(16, "ts")
            sp, _ = timed(
                lambda: publish_files(spark, df, root, stats_cols=["ts"])
            )
            cutoff = dt.datetime(2026, 1, 4)  # ~30% expires
            sr, res = timed(
                lambda: retention_delete(spark, root, "ts", cutoff)
            )
            out[f"manifest_retention_{label}"] = {
                "rows": n,
                "sec_full_publish": sp,
                "sec_retention": sr,
                "retention_vs_rewrite": round(sr / max(sp, 1e-9), 2),
                **res,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # 3. bucket fingerprint diff growth.
    from stock_market_data_pipeline_spark.operators.fingerprint import (
        fingerprint_diff,
    )

    def kv(n):
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )

    for label, n in (("1x", 500_000), ("10x", 5_000_000)):
        a = kv(n)
        b = a.filter(F.col("k") % 9973 != 0)
        s, cnt = timed(
            lambda: fingerprint_diff(a, b, "k", ["k", "v"], 64).count()
        )
        out[f"bucket_fingerprint_{label}"] = {"rows": n, "sec": s, "diff_buckets": cnt}
    out["bucket_fingerprint_growth"] = {
        "growth_ratio": round(
            out["bucket_fingerprint_10x"]["sec"]
            / max(out["bucket_fingerprint_1x"]["sec"], 1e-9),
            2,
        ),
        "linear_ok": out["bucket_fingerprint_10x"]["sec"]
        / max(out["bucket_fingerprint_1x"]["sec"], 1e-9)
        < 20,
    }

    # 4. hot-user interval merge: one user owns 50% of intervals.
    from stock_market_data_pipeline_spark.operators.events import (
        merge_intervals,
    )

    def intervals(n):
        return spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 997)
            .alias("u"),
            (F.col("id") % 100000).alias("s"),
        ).withColumn("e", F.col("s") + 40)

    for label, n in (("1x", 500_000), ("10x", 5_000_000)):
        s, cnt = timed(
            lambda: merge_intervals(intervals(n), "u", "s", "e").count()
        )
        out[f"interval_merge_hot_user_{label}"] = {"rows": n, "sec": s, "segments": cnt}
    out["interval_merge_hot_user_growth"] = {
        "hot_share": 0.5,
        "growth_ratio": round(
            out["interval_merge_hot_user_10x"]["sec"]
            / max(out["interval_merge_hot_user_1x"]["sec"], 1e-9),
            2,
        ),
        "note": "one user holds half the intervals -> its window sort is "
                "one task; same single-key envelope sessionize documents",
    }

    spark.stop()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SKEW_BENCH.json")
    cur = json.load(open(path))
    cur.update(out)
    json.dump(cur, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
