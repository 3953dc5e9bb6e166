"""End-to-end corpus curation plan — the LLM-training-data flow the engine's
extension operators exist for, composed as one declarative pipeline:

    quality gate → exact dedup (keep canonical) → MinHash-LSH near-dup
    removal (keep lowest id per dup pair) → curated corpus with features.

Scale shape: one scan computes all per-doc features (codegen projection);
exact dedup joins on 16-byte md5 fingerprints; near-dup candidates come from
the LSH band equi-join only among *survivors* (each stage shrinks the data
the next stage touches — filter early, hash before shuffle, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.dedup import normalize_text
from stock_market_data_pipeline_spark.operators.neardup import minhash_lsh_pairs
from stock_market_data_pipeline_spark.operators.textstats import (
    with_lang_id,
    with_quality,
)


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    neardup_threshold: float = 0.75,
    boilerplate_min_docs: int | None = None,
) -> DataFrame:
    """Curated corpus: per-doc features + all three filters applied.

    ``boilerplate_min_docs`` switches on the line-level boilerplate strip
    (:func:`..operators.dedup.line_dedup`) BEFORE the quality gate — the
    C4-style composition point: repeated header/footer/nav lines inflate
    token counts and quality scores, so they must go before any per-doc
    feature is trusted. Default off (the oracle-gated corpus_curation
    contract is the unstripped pipeline).

    Output: doc_id, lang_pred, n_tokens, quality_score (rounded upstream by
    the caller) for every surviving document.
    """
    if boilerplate_min_docs is not None:
        from stock_market_data_pipeline_spark.operators.dedup import line_dedup

        cleaned = line_dedup(docs, min_docs=boilerplate_min_docs).select(
            "doc_id", F.col("text_clean").alias("text")
        )
        docs = docs.drop("text").join(cleaned, "doc_id")
    feats = with_lang_id(with_quality(docs))
    gated = feats.filter(
        (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )

    # Exact dedup: canonical = min doc_id per normalized-content fingerprint.
    fp = gated.select(
        "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
    )
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    exact_kept = fp.join(canon, "fingerprint").filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id")

    survivors = gated.join(exact_kept, "doc_id")
    # Pin the survivor frame: it feeds BOTH the near-dup candidate pipeline
    # and the final anti-join, and without pinning Spark replans the whole
    # regex-heavy feature/gate/exact-dedup subtree per consumer (measured: 9
    # documents scans in the un-pinned plan). Lazy localCheckpoint
    # materializes once at the action; at cluster scale the same role is
    # played by persist(DISK_ONLY) or a staged write of the (shrunken)
    # survivor set — either way recompute-per-consumer is the wrong trade
    # for a many-consumer, expensive-to-produce frame.
    survivors = survivors.localCheckpoint(eager=False)

    # Near-dup removal among survivors: for each LSH pair above threshold,
    # the higher id drops.
    pairs = minhash_lsh_pairs(survivors.select("doc_id", "text"))
    drop = (
        pairs.filter(F.col("est_jaccard") >= neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    curated = survivors.join(drop, "doc_id", "left_anti")
    return curated.select("doc_id", "lang_pred", "n_tokens", "quality_score")


def curate_corpus_transitive(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    neardup_threshold: float = 0.75,
) -> DataFrame:
    """:func:`curate_corpus` with TRANSITIVE near-dup removal: connected
    components over the LSH pair graph, keep exactly the min-id doc per
    cluster.

    Semantics difference from the pairwise form: for a~9, b~9, a≁b the
    pairwise rule keeps BOTH a and b (they are not near-dups of each
    other); the cluster rule keeps only min(a, b, 9)'s component root —
    one representative per connected group, the policy dedup papers call
    "cluster then keep one". Chains (a~b~c with a≁c) are handled correctly
    by both here (pairwise drops every non-min pair member), but cluster
    membership is the stated contract only in this form. Adds the
    O(diameter) label-propagation rounds on edge endpoints; everything else
    is the same shrinking pipeline.
    """
    from stock_market_data_pipeline_spark.operators.neardup import (
        connected_components,
    )

    feats = with_lang_id(with_quality(docs))
    gated = feats.filter(
        (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    fp = gated.select("doc_id", F.md5(normalize_text("text")).alias("fingerprint"))
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    exact_kept = fp.join(canon, "fingerprint").filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id")
    survivors = gated.join(exact_kept, "doc_id")
    # Same pinning rationale as curate_corpus (see comment there).
    survivors = survivors.localCheckpoint(eager=False)

    pairs = minhash_lsh_pairs(survivors.select("doc_id", "text")).filter(
        F.col("est_jaccard") >= neardup_threshold
    )
    comp = connected_components(pairs)
    # drop every clustered doc that is not its component's min id
    drop = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    curated = survivors.join(drop, "doc_id", "left_anti")
    return curated.select("doc_id", "lang_pred", "n_tokens", "quality_score")
