"""TF-IDF term scoring (engine extension) — the classic corpus-relational
text operator: keyword extraction, topic routing, boilerplate detection
(terms with idf ≈ 0 appear everywhere), and a cheap retrieval baseline.

Plan shape at 100 TB:

* term frequencies: explode words → one hash aggregate keyed (doc, term) —
  map-side combine compresses each partition to its local (doc, term)
  counts before the only data-sized shuffle;
* document frequencies: second aggregate over the (doc, term) pairs keyed
  by term — input is already the *deduplicated* pair set, far smaller than
  the token stream;
* corpus size N: a single-row aggregate broadcast into the score join (no
  driver round-trip, stays a lazy plan);
* idf join: (doc, term) ⋈ (term) — shuffle keyed by term; skew from
  ultra-common terms is bounded because df-per-term rows are unique.

Ranking uses the ROUNDED score (6 dp) with a term tiebreak: ``ln`` is not
guaranteed correctly-rounded across libm implementations, so ranking on the
raw double could flip neighbors that differ by 1 ulp between engines;
ranking on the rounded value keeps the top-k reproducible everywhere the
oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_market_data_pipeline_spark.operators.dedup import normalize_text
from stock_market_data_pipeline_spark.utils import round_det


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-``top_k`` terms per document by tf·idf.

    Output: id, term, tf, df_t, tfidf (= tf · ln(N / df_t), 6 dp), rank.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("_n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.col("df_t"),
            round_det(
                F.col("tf")
                * F.log(F.col("_n_docs").cast("double") / F.col("df_t")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval baseline: score every document against a fixed
    bag of ``query_terms`` and keep the global top-``top_k``.

    idf uses the standard smoothed form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative, so stopword-like query terms can't subtract), and the
    length normalization divides by the corpus mean document length.

    Output: id, score (6 dp), dl, n_hits (query terms present).

    Plan shape: ONE corpus scan. The exploded token stream aggregates once
    per doc with the query-term tfs as |query| conditional-count columns
    alongside the document length — the same single-pass conditional-agg
    discipline as the expectations gate — so there is exactly one
    data-sized shuffle (on the doc id) and the per-doc state is
    query-bounded, never vocabulary-sized. N, avgdl, and per-term dfs then
    come from ONE single-row aggregate over the per-doc frame, broadcast
    into the (columnwise, codegen'd) score projection; a term absent from
    a doc contributes exactly +0.0. Ranking uses the ROUNDED score + id
    tiebreak for the same cross-libm reproducibility reason as
    ``tfidf_top_terms``; the global top-k is a TakeOrderedAndProject, not
    a full sort.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    q = [t.lower() for t in query_terms]
    per_doc = terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(
                F.when(F.col("term") == t, 1).otherwise(0)
            ).alias(f"_tf{i}")
            for i, t in enumerate(q)
        ],
    )
    # The corpus stats derive from per_doc AND join back onto it; without
    # materialization both references re-run the exploded corpus scan.
    # per_doc is |docs| narrow rows — checkpointing it (lazily) makes the
    # token-stream explode happen exactly once.
    per_doc = per_doc.localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.sum("dl").cast("double").alias("_sum_dl"),
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int"))
            .cast("double")
            .alias(f"_df{i}")
            for i in range(len(q))
        ],
    )
    avgdl = F.col("_sum_dl") / F.col("_n_docs")
    score = F.lit(0.0)
    n_hits = F.lit(0)
    for i in range(len(q)):
        tf = F.col(f"_tf{i}")
        df_t = F.col(f"_df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("_n_docs") - df_t + 0.5) / (df_t + 0.5)
        )
        score = score + idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / avgdl)
        )
        n_hits = n_hits + (tf > 0).cast("int")
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .withColumn("n_hits", n_hits)
        .filter(F.col("n_hits") > 0)
        .select(
            F.col(id_col),
            F.col("dl"),
            round_det(score, 6).alias("score"),
            F.col("n_hits").cast("long").alias("n_hits"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col)
    ).limit(top_k)
