"""Round-6 invariants: quantized-rerank ANN recall held off the toy scale
(the 10× growth probe, r5 verdict #8) and the steady-state band-join
decomposition staying an equi join (see test_plan_shapes for the plan pin).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quantized_rerank_recall_holds_at_probe_scale(spark):
    """recall@5 ≥ 0.9 on a 300k-vector synthetic corpus (600× the sf0.01
    embeddings table) — the invariant bound behind the X67 'recall 1.0'
    claim; bench_skew.py records the measured value + runtime each round."""
    from stock_market_data_pipeline_spark.operators.similarity import (
        cosine_topk_vectorized,
        quantized_topk_rerank,
    )

    n, dim = 300_000, 64
    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda j: (
                    F.pmod(F.xxhash64(F.col("id") * 131 + j), 2000) / 1000.0
                    - 1.0
                ),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    qs = corpus.filter(F.col("vec_id") % 6000 == 0)  # 50 queries
    gt = cosine_topk_vectorized(corpus, qs).select("query_id", "neighbor_id")
    approx = quantized_topk_rerank(corpus, qs).select("query_id", "neighbor_id")
    total = gt.count()
    hits = approx.join(gt, ["query_id", "neighbor_id"]).count()
    assert total == 50 * 5
    assert hits / total >= 0.9, f"recall@5 collapsed at probe scale: {hits}/{total}"


def test_soft_dedup_keeps_canonical_and_downweights(spark):
    from stock_market_data_pipeline_spark.operators.dedup import soft_dedup
    from stock_market_data_pipeline_spark.operators.sampling import (
        HASH_SPACE,
        sample_hash32,
    )

    rows = [(i, "dup text") for i in range(100)] + [(1000, "unique text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in soft_dedup(df).collect()}
    # canonical of the 100-dup group and the singleton are always kept
    assert got[0]["is_canonical"] and got[0]["kept"]
    assert got[1000]["dup_count"] == 1 and got[1000]["kept"]
    # the keep decision replays the hash threshold exactly
    thresh = int(HASH_SPACE / (100 ** 0.5))
    h = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", sample_hash32(__import__("pyspark").sql.functions.col("doc_id"), "soft").alias("h")
        ).collect()
    }
    for i in range(1, 100):
        assert got[i]["kept"] == (h[i] < thresh), i
    # downweighting actually bites: far fewer than 100 survive, more than 1
    n_kept = sum(1 for i in range(100) if got[i]["kept"])
    assert 1 <= n_kept <= 40  # E ≈ 1 + 99/10 ≈ 11


def test_containment_catches_short_in_long_where_jaccard_misses(spark):
    from stock_market_data_pipeline_spark.operators.neardup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"tok{i} filler{i} pad{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "unrelated words entirely different here")],
        "doc_id long, text string",
    )
    cont = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(df, threshold=0.9).collect()}
    assert (1, 2) in cont  # every shingle of the short doc is in the long one
    assert cont[(1, 2)]["containment"] == 1.0
    # Jaccard at the same pair is tiny (|A|/|B|) — below any useful threshold
    jac = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) not in jac


def test_upsample_mix_copy_counts(spark):
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.operators.sampling import (
        HASH_SPACE,
        sample_hash32,
        upsample_mix,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)],
        "doc_id long, grp string",
    )
    out = upsample_mix(df, {"a": 2.5, "b": 0.0}, group_col="grp")
    rows = out.groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in rows}
    # group b (weight 0) vanishes entirely
    assert all(i not in got for i in range(50, 100))
    # group a rows appear 2 or 3 times, by the deterministic fraction hash
    h = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", sample_hash32(F.col("doc_id"), "upsample").alias("h")).collect()
    }
    for i in range(50):
        expect = 2 + (1 if h[i] < int(0.5 * HASH_SPACE) else 0)
        assert got[i] == expect, i
    # copy ids are 0..n-1 per row (distinct rows downstream)
    ids = out.filter(F.col("doc_id") == 0).select("copy_id").collect()
    assert sorted(r["copy_id"] for r in ids) == list(range(got[0]))
