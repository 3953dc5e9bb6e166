"""Keyed and exact deduplication (SURVEY A8 + LLM-pipeline exact dedup).

Reference parity: A8 — pandas ``drop_duplicates(subset=keys, keep='last')``
(``load_to_snowflake.py:154``, ``load_stream_to_snowflake.py:197-201``). The
pandas 'last' depends on file read order; the engine demands an explicit
ordering column and keeps the greatest — deterministic, and exactly the MERGE
last-writer-wins semantics the loaders implement downstream.

Scale notes: ``row_number`` over (keys ORDER BY order) is one shuffle on the
keys; with AQE skew handling hot keys split. For order-irrelevant dedup,
``dropDuplicates(keys)`` lets Spark use a partial (map-side) aggregate —
cheaper than a window — so both forms are exposed.

``dedup_exact_text`` is the LLM-data exact-dedup operator: group by a
fingerprint of the normalized content, keep the smallest id as canonical and
count duplicates. Hashing first (md5) means the shuffle carries 16-byte keys,
not document bodies — at 100 TB that is the difference between shuffling
hashes and shuffling the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_keep_last(
    df: DataFrame, keys: list[str], order: list[str]
) -> DataFrame:
    """Keep exactly one row per key combo: the one greatest in ``order``."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_any(df: DataFrame, keys: list[str]) -> DataFrame:
    """Order-irrelevant keyed dedup (map-side-combinable)."""
    return df.dropDuplicates(keys)


def normalize_text(col: F.Column | str) -> F.Column:
    """Canonical text form for fingerprinting: lowercase, collapsed
    whitespace, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def dedup_exact_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-dup groups by content hash: canonical (min) id, dup count.

    Output: fingerprint, canonical_id, dup_count — join back on fingerprint
    to filter the corpus.
    """
    return (
        df.select(
            F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col)
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def soft_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "soft",
) -> DataFrame:
    """Soft (frequency-discounted) dedup: instead of dropping duplicates,
    keep each non-canonical copy with probability ``1/sqrt(dup_count)`` —
    the standard downweighting compromise when exact duplication carries
    signal (boilerplate vs popular content) and hard dedup over-prunes.
    Expected copies kept per group ≈ 1 + (n-1)/sqrt(n) ≈ sqrt(n): heavy
    clusters shrink quadratically, small ones barely change.

    Deterministic: the keep decision is the engine-portable
    ``hash32(seed, id) < 2^32/sqrt(n)`` threshold (same md5-derived uniform
    as the sampling operators), so re-runs and the DuckDB oracle reproduce
    the identical survivor set. The canonical (min-id) row is always kept.

    Scale shape: one shuffle, keyed by the 16-byte fingerprint, carrying
    (fingerprint, id) only — text never rides the exchange; the window
    computes per-group count and min in the same pass.
    """
    from pyspark.sql.window import Window

    from stock_market_data_pipeline_spark.operators.sampling import (
        HASH_SPACE,
        sample_hash32,
    )

    w = Window.partitionBy("fingerprint")
    slim = df.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint")
    )
    return (
        slim.withColumn("dup_count", F.count(F.lit(1)).over(w))
        .withColumn("_min_id", F.min(id_col).over(w))
        .select(
            id_col,
            "fingerprint",
            "dup_count",
            (F.col(id_col) == F.col("_min_id")).alias("is_canonical"),
            (
                (F.col(id_col) == F.col("_min_id"))
                | (
                    sample_hash32(F.col(id_col), seed)
                    < F.floor(
                        F.lit(float(HASH_SPACE))
                        / F.sqrt(F.col("dup_count").cast("double"))
                    )
                )
            ).alias("kept"),
        )
    )
