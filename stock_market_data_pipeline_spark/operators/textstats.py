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
