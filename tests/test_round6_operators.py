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
