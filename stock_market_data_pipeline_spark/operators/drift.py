"""Distribution-drift monitoring (engine extension): Population Stability
Index between a reference slice and a current slice of the same metric —
the standard production check that a feature/metric distribution hasn't
shifted (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 major; the credit-
scoring convention).

Scale shape: ONE tiny aggregate computes the reference [min, max]; both
slices then bin with a pure projection and aggregate map-side-combined per
bin (≤ n_bins rows ever cross a shuffle). Fixed-width bins from the
reference range — not quantile edges — keep the whole computation
deterministic and DuckDB-reproducible (exact cross-engine quantiles of
doubles are not portable; fixed edges are plain IEEE arithmetic).
Bin proportions are plain ``count/N`` clamped to an epsilon floor before
the log — additive (Laplace) smoothing looks tempting but biases PSI > 0
for IDENTICAL distributions whenever the two samples differ in size (the
smoothed masses get different denominators); the epsilon clamp keeps
identical-distribution PSI exactly 0 at any size ratio while still
keeping empty-on-one-side bins finite (and loud — an empty bin against
real mass is the drift signal itself, not an error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.utils import round_det


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI contributions + totals for ``value_col`` drift.

    Output: one row per bin — ``bin`` (0..n_bins-1; out-of-reference-range
    current values clamp into the edge bins), ``ref_count``, ``cur_count``,
    ``ref_pct`` / ``cur_pct`` (smoothed, 6 dp), ``psi_term`` (6 dp) — plus
    the scalars ``psi_total``, ``ref_null_count`` and ``cur_null_count``
    repeated per row so one frame carries the diagnosis (which bins
    moved), the verdict, and the missingness signal.

    NULL values are excluded from the bins and surfaced in the
    ``*_null_count`` columns instead: folding them into bin 0 (the old
    behavior) made a rising NULL rate masquerade as distribution mass at
    the range minimum — missingness drift is its own signal, not bin-0
    drift (round-6 ADVICE).
    """
    bounds = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        scaled = F.floor(
            (v - F.col("_lo"))
            / F.nullif(F.col("_hi") - F.col("_lo"), F.lit(0.0))
            * n_bins
        )
        # NULL value -> NULL bin (split out below); non-NULL value with a
        # degenerate reference range (hi == lo) -> bin 0 via the coalesce.
        b = F.when(
            v.isNotNull(),
            F.least(
                F.greatest(F.coalesce(scaled, F.lit(0)), F.lit(0)),
                F.lit(n_bins - 1),
            ).cast("int"),
        )
        return (
            df.join(F.broadcast(bounds))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    bins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    # Pin the two aggregated frames (≤ n_bins+1 rows each): both feed TWO
    # consumers (the bin join and the null-counter extraction below), and
    # without pinning Spark re-runs the full ref/cur scan+aggregate per
    # consumer — double the data passes for a frame this tiny (round-7
    # review; lazy localCheckpoint materializes once at the first action).
    r = binned(ref, "ref_count").localCheckpoint(eager=False)
    c = binned(cur, "cur_count").localCheckpoint(eager=False)
    # The NULL-bin rows (≤ 1 per side of an already-aggregated ≤ n_bins+1
    # frame) become the global missingness counters.
    nulls = (
        r.filter(F.col("bin").isNull())
        .agg(F.coalesce(F.sum("ref_count"), F.lit(0)).alias("ref_null_count"))
        .join(
            c.filter(F.col("bin").isNull()).agg(
                F.coalesce(F.sum("cur_count"), F.lit(0)).alias("cur_null_count")
            )
        )
    )
    r = r.filter(F.col("bin").isNotNull())
    c = c.filter(F.col("bin").isNotNull())
    joined = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
        )
    )
    tot = joined.agg(
        F.sum("ref_count").alias("_rn"), F.sum("cur_count").alias("_cn")
    )
    eps = F.lit(1e-6)
    out = joined.join(F.broadcast(tot))
    # nullif guards an all-NULL (or empty) side: 0-total division would
    # throw under ANSI; greatest() skips the NULL and lands on the epsilon
    # floor, so an empty side reads as uniform-epsilon mass (loud drift).
    p = F.greatest(F.col("ref_count") / F.nullif(F.col("_rn"), F.lit(0)), eps)
    q = F.greatest(F.col("cur_count") / F.nullif(F.col("_cn"), F.lit(0)), eps)
    term = (q - p) * F.log(q / p)
    out = out.select(
        "bin",
        "ref_count",
        "cur_count",
        round_det(p).alias("ref_pct"),
        round_det(q).alias("cur_pct"),
        round_det(term).alias("psi_term"),
    )
    total = out.agg(round_det(F.sum("psi_term")).alias("psi_total"))
    return (
        out.join(F.broadcast(total))
        .join(F.broadcast(nulls))
        .orderBy("bin")
    )
