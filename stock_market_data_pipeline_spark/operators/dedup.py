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


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
) -> DataFrame:
    """Line-level boilerplate removal (C4-style, X96): strip LINES that
    repeat across many documents (headers, footers, nav chrome) while the
    document-level dedup family handles whole-duplicate docs.

    Pipeline: posexplode lines → fingerprint the trimmed line (md5, so the
    doc-frequency shuffle carries 16-byte keys, not line text) → count
    distinct docs per fingerprint → flag lines present in ≥ ``min_docs``
    docs → reassemble each doc's surviving lines in original order.
    Whitespace-only lines never count as boilerplate (dropping them by
    frequency would strip paragraph structure from every document).

    Output: one row per input document — ``text_clean`` (surviving lines
    joined by newline; empty string when everything was boilerplate),
    ``n_lines`` (total), ``n_removed``.

    Scale shape: the inverted-index build is the same as the MinHash/LSH
    band join (``neardup.py``) — one distinct + map-side-combined count on
    the fingerprint, one fingerprint equi-join back (never all-pairs), one
    groupBy on the doc id for reassembly. Line text crosses the reassembly
    shuffle once, which any reassembling formulation pays.
    """
    # posexplode_OUTER: a NULL-text document still yields one (NULL, NULL)
    # line row, so it keeps its output row (text_clean='', n_lines=0)
    # instead of silently vanishing from the corpus (round-7 review).
    lines = docs.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    fp = F.md5(F.trim(F.col("line")))
    freq = (
        lines.filter(F.trim(F.col("line")) != "")
        .select(fp.alias("fp"), id_col)
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    boiler = freq.filter(F.col("n_docs") >= min_docs).select(
        "fp", F.lit(1).alias("_boiler")
    )
    marked = lines.withColumn("fp", fp).join(boiler, "fp", "left")
    keep = F.col("_boiler").isNull() | (F.trim(F.col("line")) == "")
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("text_clean"),
            F.count(F.col("line")).alias("n_lines"),  # NULL-text doc -> 0
            F.sum((~keep).cast("long")).alias("n_removed"),
        )
    )
