"""Text-analysis column expressions for LLM-training-data pipelines.

These are the per-document scalar features a 100 TB corpus pipeline computes
before filtering/dedup: token counts, quality signals, n-gram language ID,
content fingerprints. All of them are built-in-function compositions — they
run inside whole-stage codegen on the executors; no UDFs, so a full-corpus
pass is one parallel scan with zero Python overhead.

(The reference repo has no text surface — this is the engine-extension layer
mandated by BASELINE.json's north star.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword heuristic
# language ID. Deliberately small and disjoint-ish: the operator contract is
# "deterministic heuristic", not "NLP-grade LID" (swap in a real model via
# the multimodal mapInPandas plumbing when libraries are available).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on", "with", "as"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auch"),
    "es": ("el", "los", "las", "una", "y", "es", "por", "que", "con", "para"),
    "fr": ("le", "les", "et", "est", "pour", "dans", "que", "une", "sur", "pas"),
}
LANG_ORDER = ("en", "de", "es", "fr")


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens (non-space runs); [] for empty/blank text."""
    return F.regexp_extract_all(col, F.lit("\\S+"), 0)


def words_lower(col: Column) -> Column:
    """Lowercased alphabetic words — the unit for stopword/lang features."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z]+"), 0)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_ws(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token count: alphabetic runs, digit runs, and single
    non-alphanumeric marks each count as one token — a deterministic proxy
    for subword tokenizer counts."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0)
    )


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of word tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(words_lower(col), lambda x: x.isin(*sw)))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, first-in-order wins
    ties, 'unknown' when no stopword matches at all."""
    hits = {lang: stopword_hits(col, lang) for lang in LANG_ORDER}
    total = sum(hits.values(), F.lit(0))
    expr = F.when(total == 0, F.lit("unknown"))
    for i, lang in enumerate(LANG_ORDER):
        cond = None
        for other in LANG_ORDER[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = expr.when(cond if cond is not None else F.lit(True), F.lit(lang))
    return expr


def quality_features(col: Column, n_tokens: Column) -> dict[str, Column]:
    """Quality signal block: ratios over characters and tokens."""
    n_chars = F.length(col)
    alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(col, "[^.,;:!?'\"()]", ""))
    digits = F.length(F.regexp_replace(col, "[^0-9]", ""))
    nonspace = F.length(F.regexp_replace(col, "\\s", ""))
    en_hits = stopword_hits(col, "en")
    safe_tokens = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    return {
        "n_chars_actual": n_chars,
        "alpha_ratio": alpha / F.nullif(n_chars.cast("double"), F.lit(0.0)),
        "punct_ratio": punct / F.nullif(n_chars.cast("double"), F.lit(0.0)),
        "digit_ratio": digits / F.nullif(n_chars.cast("double"), F.lit(0.0)),
        "avg_token_len": nonspace / safe_tokens,
        "stopword_ratio": en_hits / safe_tokens,
    }


def quality_score(feats: dict[str, Column], n_tokens: Column) -> Column:
    """Composite [0,1] quality score — fixed, documented weights.

    0.25·min(tokens/100, 1) + 0.35·alpha_ratio + 0.25·min(4·stopword_ratio, 1)
    + 0.15·(1 − min(10·punct_ratio, 1)).
    """
    return F.least(
        F.lit(1.0),
        F.lit(0.25) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.35) * feats["alpha_ratio"]
        + F.lit(0.25) * F.least(feats["stopword_ratio"] * 4.0, F.lit(1.0))
        + F.lit(0.15) * (F.lit(1.0) - F.least(feats["punct_ratio"] * 10.0, F.lit(1.0))),
    )
