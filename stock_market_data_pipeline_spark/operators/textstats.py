"""Document-level text analysis operators (engine extension: the text side of
an LLM-training-data pipeline — language ID, quality scoring, token counting,
fingerprinting — over the ``documents`` table).

Each operator is a single narrow projection (no shuffle, no UDF): at 100 TB
these run at parquet-scan speed and their outputs are the filter columns for
corpus curation (drop low-quality, route by language, dedup by fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.functions.text import (
    lang_id,
    quality_features,
    quality_score,
    stopword_hits,
    token_count_bpe_ish,
    token_count_ws,
    LANG_ORDER,
)
from stock_market_data_pipeline_spark.operators.dedup import normalize_text
from stock_market_data_pipeline_spark.utils import round_det


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens_ws": token_count_ws(c),
            "n_tokens_bpe": token_count_bpe_ish(c),
        }
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    n_tokens = token_count_ws(c)
    feats = quality_features(c, n_tokens)
    out = df.withColumn("n_tokens", n_tokens).withColumns(feats)
    return out.withColumn("quality_score", quality_score(feats, F.col("n_tokens")))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    out = df.withColumns(
        {f"{lang}_hits": stopword_hits(c, lang) for lang in LANG_ORDER}
    )
    return out.withColumn("lang_pred", lang_id(c))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the normalized text (exact-dup key) plus a
    64-bit rolling-style fingerprint (xxhash64 of normalized text) for
    compact storage/joins."""
    norm = normalize_text(text_col)
    return df.withColumns(
        {
            "fingerprint_md5": F.md5(norm),
            "fingerprint_64": F.xxhash64(norm),
        }
    )


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals: the standard filters for
    detecting degenerate (looping, boilerplate, keyword-stuffed) documents
    in LLM training corpora.

    * ``distinct_word_ratio`` — |distinct words| / |words| (low → loopy).
    * ``top_word_ratio`` — frequency of the most common word / |words|.
    * ``top_bigram_ratio`` — frequency of the most common word 2-gram /
      |2-grams| (the "fraction in most common n-gram" filter).
    * ``mean_word_len`` — chars per word (out-of-band values → non-text).

    All four are pure per-row array expressions — no explode, no shuffle, so
    at 100 TB the operator runs at scan speed, embarrassingly parallel. The
    relational alternative (explode + two groupBys) costs two data-sized
    shuffles to compute the same per-document numbers.

    The mode (most-common element count) is a LONGEST-RUN fold over the
    sorted array — one pass, one array construction per fold. The obvious
    ``max over distinct w of count(t == w)`` form references the outer
    array inside the lambda, and lambda expressions get no subexpression
    elimination: the text was re-tokenized once per distinct word per row
    (measured 21 s for 5 k docs at sf0.1 vs ~1 s for this form).
    """
    toks = F.split(normalize_text(text_col), " ")
    n = F.size(toks)

    def max_freq(arr: F.Column) -> F.Column:
        # longest run in the sorted array == count of the most common element
        zero = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc: F.Column, x: F.Column) -> F.Column:
            run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc.best, run).alias("best"),
            )

        return F.aggregate(F.array_sort(arr), zero, step, lambda acc: acc.best)

    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    total_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return df.withColumns(
        {
            "n_words": n,
            "distinct_word_ratio": round_det(
                F.size(F.array_distinct(toks)) / n.cast("double"), 6
            ),
            "top_word_ratio": round_det(max_freq(toks) / n.cast("double"), 6),
            "top_bigram_ratio": round_det(
                F.when(n > 1, max_freq(bigrams) / (n - 1).cast("double")), 6
            ),
            "mean_word_len": round_det(total_chars / n.cast("double"), 6),
        }
    )


# PII patterns: conservative, cross-engine-portable regex (no lookarounds —
# Java and RE2-family engines agree on these).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{6,}[0-9]",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline runs
    before text leaves curation: emails, phone-like numbers, SSN-formatted
    ids replaced by typed placeholder tags, with per-kind match counts kept
    as audit columns.

    Order matters (SSN before phone — an SSN is also phone-shaped);
    replacements chain inside one projection, all JVM-regex, no UDF — scan
    speed at any scale. The synthetic test lake contains no digits, so this
    operator is verified by crafted-input unit tests rather than a registry
    query (a lake-wide all-zeros oracle would assert nothing).
    """
    c = F.col(text_col)
    counts = {
        f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = c
    for kind in ("email", "ssn", "phone"):  # ssn before phone
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return df.withColumns({**counts, "text_redacted": redacted})


def with_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Overlapping word-window chunking — the document→training-example
    splitter (context-window packing): one output row per (doc, window
    start), windows of ``chunk_size`` words every ``stride`` words, the last
    window possibly short.

    Pure generate: tokenize → sequence of starts → explode — a row
    expansion with no shuffle; chunk text is sliced from the token array in
    the same projection. Output: id, chunk_start (1-based word offset,
    the deterministic chunk key), chunk_text, chunk_tokens.
    """
    toks = F.split(normalize_text(text_col), " ")
    out = (
        df.filter(F.size(toks) > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(
                F.sequence(F.lit(1), F.size(toks), F.lit(stride))
            ).alias("chunk_start"),
        )
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start"), chunk_size)
    return out.select(
        F.col(id_col),
        F.col("chunk_start"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_tokens"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-LM quality score (CCNet-style): per-doc mean log-probability
    of its tokens under an add-1-smoothed unigram model fit on the SAME
    corpus. Low scores mark out-of-distribution / junk documents — the
    cheap stand-in for "perplexity under a reference LM" quality filtering,
    with the LM derived from the data itself (no model artifact needed).

    p(w) = (count(w) + 1) / (N + V);  score(doc) = mean over tokens of ln p.

    100 TB posture: token explode is a projection; the unigram count is one
    map-side-combined aggregate on the token key; N and V are a driver-sized
    broadcast row. The token→logprob join keys on the token — Zipf-skewed,
    but the count table is |vocab|-sized (millions of rows at corpus scale,
    still the small side), so it broadcasts and the corpus never shuffles;
    the final per-doc mean reuses the doc key.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    logp = toks.join(F.broadcast(counts), "token").crossJoin(
        F.broadcast(totals)
    )
    return logp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        round_det(
            F.avg(
                F.log(
                    (F.col("c") + F.lit(1.0))
                    / (F.col("n_total") + F.col("v_size")).cast("double")
                )
            ),
            6,
        ).alias("avg_logprob"),
    )
