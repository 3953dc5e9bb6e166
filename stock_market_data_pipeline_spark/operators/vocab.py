"""Vocabulary induction primitives — the corpus-statistics inner loop of
BPE-style tokenizer training, expressed relationally.

BPE training repeats one step until the vocab is full: count adjacent
symbol pairs across the corpus, merge the most frequent pair. The counting
step is the data-scale part (the merge itself touches only the vocabulary),
and it has a classic distributed formulation: aggregate the corpus to a
WORD FREQUENCY table first, then expand pairs over the *distinct* words
weighted by their frequency. At 100 TB the token stream is trillions of
positions but the distinct-word dictionary is merely millions — the pair
expansion runs over the dictionary, so the only corpus-sized work is the
word count's map-side-combined aggregate (exactly how the original
sentencepiece/HF trainers shard it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from stock_market_data_pipeline_spark.operators.dedup import normalize_text


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus word-frequency dictionary: ``word``, ``freq``. One exploded
    scan + one map-side-combined aggregate keyed by word."""
    words = df.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """One BPE counting step at the character level: total corpus frequency
    of every adjacent character pair, computed as
    Σ over distinct words of (word_freq × pair occurrences in word).

    Output: ``pair`` (2-char string), ``total`` — optionally the global
    top-``top_k`` ordered by (total desc, pair) so the selection is
    deterministic under ties.

    Plan: word dictionary (corpus-sized agg) → per-word sliding bigrams via
    ``transform(sequence(...))`` over the dictionary only → one small agg
    keyed by pair (|alphabet|² rows). No UDFs — the pair expansion is a
    codegen'd higher-order function.
    """
    freqs = word_frequencies(df, text_col=text_col)
    pairs = freqs.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    out = pairs.groupBy("pair").agg(F.sum("freq").alias("total"))
    if top_k is not None:
        out = out.orderBy(F.col("total").desc(), F.col("pair")).limit(top_k)
    return out
