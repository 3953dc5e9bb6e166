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

    Plan shape: the query bag is a BROADCAST literal array — term filtering
    happens in the exploded scan before the only data-sized aggregate, so
    the (doc, term) state is |docs| × |query| at most, never the corpus
    vocabulary. Document lengths come from the same single scan (explode →
    two-level agg), N/avgdl/df are single-row/|query|-row aggregates
    broadcast into the score join. Ranking uses the ROUNDED score + id
    tiebreak for the same cross-libm reproducibility reason as
    ``tfidf_top_terms``; the global top-k is a TakeOrderedAndProject, not a
    full sort.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    # per-doc length over ALL terms (needed before the query filter)
    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").cast("double").alias("_sum_dl"),
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
    )
    q = [t.lower() for t in query_terms]
    hits = terms.filter(F.col("term").isin(q))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
            ),
        )
        .withColumn(
            "_part",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (
                    1
                    - b
                    + b * F.col("dl") / (F.col("_sum_dl") / F.col("_n_docs"))
                )
            ),
        )
        .groupBy(id_col, "dl")
        .agg(
            round_det(F.sum("_part"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col)
    ).limit(top_k)
