"""Deterministic sampling for training-data pipelines (engine extension).

Corpus curation ends with a MIX decision: keep X% of each language /
source / quality band. Doing that with ``df.sample`` is non-reproducible
across runs and partitionings; doing it with a shuffle-based rank cutoff
costs a global sort. Hash-threshold sampling gives both properties the
pipeline actually needs:

* **Deterministic & partition-independent** — keep iff
  ``hash32(seed, id) < rate · 2^32``; the decision depends only on (seed,
  id), so re-runs, retries, and repartitions select the identical rows, and
  the DuckDB oracle reproduces the exact sample.
* **Zero shuffle** — a pure filter; at 100 TB it composes with the scan
  (predicate evaluated next to the parquet reader, no exchange at all).
* **Stratified** — the threshold is a CASE over the stratum column, so each
  stratum gets its own rate in the same single pass.

The hash is the first 8 hex chars of md5 (a 32-bit uniform), not Spark's
``xxhash64``, because md5 is the cross-engine deterministic choice every
other operator here already relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def sample_hash32(id_col: Column, seed: str) -> Column:
    """Uniform 32-bit integer from (seed, id) — md5-derived, engine-portable."""
    digest = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")


def hash_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sample at exactly the configured rates,
    deterministic in (seed, id).

    ``rates`` maps stratum value → keep probability; strata not listed keep
    ``default_rate``. Expected kept fraction per stratum equals its rate
    (binomial, not exact-count quota — quota sampling needs a per-stratum
    global sort; at 100 TB the binomial guarantee is the one you can afford,
    and the variance at corpus scale is negligible).

    The stratum→threshold map is a BROADCAST-JOINED relation, not a CASE
    chain: when ``stratum_col`` is itself a computed expression (e.g. a
    language-ID CASE over higher-order list ops), a threshold CASE would
    inline that expression into every WHEN branch of the pushed-down filter
    — Catalyst does no subexpression elimination on lambda expressions, so
    the stratum gets recomputed once per configured rate (measured ~6× on
    the language-stratified query). The join evaluates the stratum once per
    row, and a broadcast hash join adds no exchange.
    """
    rates_df = df.sparkSession.createDataFrame(
        [(value, int(rate * HASH_SPACE)) for value, rate in rates.items()],
        schema=f"`{stratum_col}` string, `_keep_below` bigint",
    )
    return (
        df.join(F.broadcast(rates_df), stratum_col, "left")
        .filter(
            sample_hash32(F.col(id_col), seed)
            < F.coalesce(F.col("_keep_below"), F.lit(int(default_rate * HASH_SPACE)))
        )
        .select(*df.columns)
    )


def hash_quota_sample(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, int],
    id_col: str = "doc_id",
    seed: str = "quota",
) -> DataFrame:
    """Exact-count per-stratum sample: the ``quotas[stratum]`` rows with the
    SMALLEST hash32(seed, id) in each stratum — deterministic, reproducible,
    and stable under corpus growth (a row stays selected until enough
    smaller-hash rows arrive; cf. bottom-k / KMV sketch selection).

    Strata not in ``quotas`` contribute nothing. Complements
    :func:`hash_stratified_sample`: rate-based when proportions matter,
    quota-based when the downstream mix needs exact counts (eval sets,
    balanced fine-tuning mixes).

    Scale shape: per-stratum top-N by hash = window ``row_number`` over
    (stratum, hash order) — a shuffle keyed by stratum and a per-stratum
    sort. For huge strata, pre-filter with
    ``hash_stratified_sample(rate ≈ margin·quota/|stratum|)`` first so the
    exact rank sorts only ~margin·quota survivors; the two compose without
    changing the selected set (hash-threshold keeps a superset of the
    bottom-k for any margin ≥ 1 realized ratio).
    """
    from pyspark.sql.window import Window

    quota_df = df.sparkSession.createDataFrame(
        [(value, int(n)) for value, n in quotas.items()],
        schema=f"`{stratum_col}` string, `_quota` int",
    )
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash32(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.join(F.broadcast(quota_df), stratum_col, "inner")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
        .select(*df.columns)
    )


def alpha_temperature_sample(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    id_col: str = "doc_id",
    seed: str = "alpha",
) -> DataFrame:
    """Temperature-based multi-source mixing: sample so group g's share of
    the output is ∝ n_g^alpha (alpha<1 upweights small sources, alpha=1 is
    proportional, alpha=0 uniform across groups) at an overall target
    fraction — the standard corpus-mixing recipe for combining crawl dumps
    of wildly different sizes.

    keep_rate_g = min(1, N·f·w_g / (Σw · n_g)),  w_g = n_g^alpha; groups
    capped at rate 1 leave the realized total slightly under target (the
    usual convention — no re-normalization pass, deterministic rates).

    Plan: the rate table derives from ONE tiny groupBy (|groups| rows;
    window-over-all on that frame is |groups|-local, not data-sized),
    broadcast back; the data-side decision is the same zero-shuffle
    hash-threshold filter as ``hash_stratified_sample``.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    wall = Window.partitionBy()
    wt = F.pow(F.col("_n").cast("double"), F.lit(alpha))
    rate = F.least(
        F.lit(1.0),
        (
            F.sum("_n").over(wall).cast("double")
            * F.lit(target_fraction)
            * wt
            / F.sum(wt).over(wall)
        )
        / F.col("_n"),
    )
    thresholds = counts.select(
        group_col,
        F.floor(rate * F.lit(float(HASH_SPACE))).cast("bigint").alias("_keep_below"),
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(sample_hash32(F.col(id_col), seed) < F.col("_keep_below"))
        .select(*df.columns)
    )


def upsample_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "upsample",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic sampling WITH replacement: replicate group g's rows by
    factor ``weights[g]`` (may exceed 1 — the epoch-style domain upweighting
    every training mix needs for scarce high-quality sources; fractional
    factors Bernoulli-round per row).

    ``n_copies(row) = floor(w) + [hash32(seed, id) < frac(w)·2^32]`` — the
    decision depends only on (seed, id), so re-runs and the DuckDB oracle
    produce the identical multiset. Output adds ``copy_id`` (0..n-1) so
    downstream shuffles/packing see distinct rows, not accidental dedup
    fodder.

    Scale shape: the weight table broadcasts; replication is a generate-
    and-explode on the already-filtered rows — no shuffle at all; output
    volume is exactly the mixed corpus size (the irreducible cost).
    """
    rows = [(g, float(w)) for g, w in weights.items()]
    wdf = df.sparkSession.createDataFrame(
        rows, schema=f"`{group_col}` string, `_w` double"
    )
    w = F.coalesce(F.col("_w"), F.lit(float(default_weight)))
    frac_thresh = F.floor((w - F.floor(w)) * F.lit(float(HASH_SPACE)))
    n_copies = (
        F.floor(w)
        + F.when(sample_hash32(F.col(id_col), seed) < frac_thresh, 1).otherwise(0)
    ).cast("int")
    return (
        df.join(F.broadcast(wdf), group_col, "left")
        .withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(0), F.col("_n_copies") - 1)
            ).alias("copy_id"),
        )
    )


def with_split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split",
    fracs: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every training
    pipeline needs pinned BEFORE any shuffling/packing, so that re-runs,
    backfills, and engines all agree on membership and eval documents can
    never leak into train.

    ``fracs`` maps split name → fraction (must sum to ≤ 1; any remainder
    lands in the LAST split listed). Assignment thresholds the same
    portable md5-derived hash as the samplers (``sample_hash32 % 10_000``),
    cut at cumulative-fraction boundaries in dict order — a pure
    zero-shuffle projection, reproducible across runs, partitionings, and
    engines, and stable under corpus growth (a doc's split never changes
    when other docs arrive, which resampling-based splits can't promise).
    """
    fracs = fracs or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fracs.values())
    if total > 1.0 + 1e-9 or any(v < 0 for v in fracs.values()):
        # oversubscribed fractions would silently shrink or empty later
        # splits (cumulative thresholds past 10_000 make earlier WHEN
        # branches absorb everything) — fail loudly instead (round-9
        # advice)
        raise ValueError(
            f"split fractions must be >= 0 and sum to <= 1, got {fracs} "
            f"(sum {total})"
        )
    h = sample_hash32(F.col(id_col), seed) % 10_000
    names = list(fracs)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fracs[name]
        cond = h < int(round(acc * 10_000))
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    split = (
        expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn("split", split)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): rank every row by ``ln(u) / w`` where
    ``u`` derives from the portable md5 hash of (seed, id), keep the top
    ``n``. Items with weight w are selected with the exact A-ES
    probabilities, the selection is a pure function of (seed, ids,
    weights) — reproducible across runs, engines, and partitionings — and
    the global top-n is a TakeOrderedAndProject (per-partition heaps, no
    full sort), so the shuffle carries n rows per partition at most.

    The ranking key is ROUNDED (9 dp) before ordering with an id
    tiebreak: ``ln`` is not correctly-rounded across libm implementations,
    and an unrounded boundary between rank n and n+1 could flip between
    engines. Non-positive weights are excluded (they have no A-ES key).

    Output: the sampled rows plus ``wkey`` (the rounded ranking key).
    """
    from stock_market_data_pipeline_spark.utils import round_det

    h = sample_hash32(F.col(id_col), seed)
    u = (h + 1).cast("double") / F.lit(4294967296.0)
    key = round_det(F.log(u) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("wkey", key)
        .orderBy(F.col("wkey").desc(), F.col(id_col))
        .limit(n)
    )
