"""Per-group normalization operators — native-first, with the grouped-map
Pandas form as the escape hatch for genuinely multi-pass group logic.

:func:`robust_zscore` (native): median/MAD z-score per key. Needs two
dependent aggregations (median of |x − median|); expressed as two grouped
aggregations + broadcast joins — all JVM-side.

:func:`robust_zscore_grouped_map` (applyInPandas): identical semantics, one
Arrow batch per group. This is the grouped-map pattern (pandas DataFrame in,
pandas DataFrame out per key); prefer the native form — the Pandas path
exists for logic that cannot be two aggregations (iterative fits, scipy
calls) and as the template for swapping those in. Groups must fit in executor
memory (per-symbol market data does; a megagroup would need salting first).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826  # MAD → σ under normality


def robust_zscore(
    df: DataFrame, key: str = "symbol", value: str = "price"
) -> DataFrame:
    """Median/MAD z-score per key, fully native (two aggs + broadcast joins)."""
    med = df.groupBy(key).agg(F.median(value).alias("_med"))
    with_med = df.join(F.broadcast(med), key)
    mad = (
        with_med.groupBy(key)
        .agg(F.median(F.abs(F.col(value) - F.col("_med"))).alias("_mad"))
    )
    return (
        with_med.join(F.broadcast(mad), key)
        .withColumn(
            "robust_z",
            (F.col(value) - F.col("_med"))
            / F.nullif(F.col("_mad") * MAD_CONSISTENCY, F.lit(0.0)),
        )
        .drop("_med", "_mad")
    )


def robust_zscore_grouped_map(
    df: DataFrame, key: str = "symbol", value: str = "price"
) -> DataFrame:
    """Same semantics via applyInPandas (one pandas frame per group)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", robust_z double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value].median()
        mad = (pdf[value] - med).abs().median()
        denom = mad * MAD_CONSISTENCY
        pdf = pdf.copy()
        # Zero MAD (constant group) must yield NULL, not NaN, to match the
        # native form's nullif — Spark treats NaN and NULL as distinct values.
        pdf["robust_z"] = (pdf[value] - med) / denom if denom else None
        return pdf

    return df.groupBy(key).applyInPandas(per_group, schema=out_schema)


def winsorize(
    df: DataFrame,
    key: str = "symbol",
    value: str = "price",
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-key winsorization: clip ``value`` to its group's exact
    [lower, upper] interpolated percentiles and flag the clipped rows — the
    outlier treatment that keeps heavy-tailed features usable without
    dropping rows (and, on tick data, tames fat-finger prints before
    normalization).

    Plan: one map-side-combined aggregate computes both bounds per key
    (exact ``percentile`` — at 100 TB swap for ``approx_percentile``, same
    plan shape); the bounds frame is |keys|-sized and broadcasts back, so
    the data passes once and never shuffles.
    """
    from stock_market_data_pipeline_spark.utils import round_det

    bounds = df.groupBy(key).agg(
        F.percentile(value, F.lit(lower)).alias("_lo"),
        F.percentile(value, F.lit(upper)).alias("_hi"),
    )
    clipped = F.least(F.greatest(F.col(value), F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), key)
        .withColumn(f"{value}_winsorized", round_det(clipped, 6))
        .withColumn(
            "was_clipped",
            (F.col(value) < F.col("_lo")) | (F.col(value) > F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )
