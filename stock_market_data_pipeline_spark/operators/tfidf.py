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
