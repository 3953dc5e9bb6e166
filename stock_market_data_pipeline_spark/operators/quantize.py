"""Embedding quantization (engine extension): per-vector symmetric int8 —
the standard storage/serving compression for embedding corpora (4× smaller
than float32, 8× than float64; ANN recall loss typically <1%).

Per vector: ``scale = max|x| / 127``, ``q_i = round(x_i / scale)`` ∈
[-127, 127]. Symmetric (no zero-point) keeps dequantization a single
multiply — the form vector databases and GEMM kernels want.

Scale shape: one narrow projection — two array folds per row (max-abs, then
the quantize transform), no shuffle, runs at scan speed on 100 TB. The
reconstruction-error column makes quantization QA a query instead of a
notebook exercise.

Determinism: ``round`` is biased off exact halves (``round_det``) so both
engines land identically; folds are sequential left-to-right in both Spark
``aggregate`` and DuckDB ``list_sum`` (the proven cosine-oracle pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.functions.vectors import as_double_vec
from stock_market_data_pipeline_spark.utils import round_det


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Output: id, scale (6 dp), q (array<int> in [-127, 127]),
    mean_abs_err (6 dp, mean |x - q·scale| over dims).

    Zero vectors get scale 0 and an all-zero q (nullif guards the division).
    """
    v = as_double_vec(vec_col)
    max_abs = F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = max_abs / F.lit(127.0)
    safe = F.nullif(scale, F.lit(0.0))
    q = F.transform(
        v, lambda x: F.coalesce(round_det(x / safe, 0), F.lit(0.0)).cast("int")
    )
    base = df.select(
        F.col(id_col), v.alias("_v"), scale.alias("_scale"), q.alias("q")
    )
    err_sum = F.aggregate(
        F.zip_with(
            F.col("_v"),
            F.col("q"),
            lambda x, qi: F.abs(x - qi.cast("double") * F.col("_scale")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return base.select(
        F.col(id_col),
        round_det(F.col("_scale"), 6).alias("scale"),
        F.col("q"),
        round_det(err_sum / F.size(F.col("_v")).cast("double"), 6).alias(
            "mean_abs_err"
        ),
    )
