"""Grouped-map vs native robust z-score: both forms must agree exactly —
including NULL (not NaN) on zero-MAD constant groups (Spark distinguishes
NaN from NULL, so the twins must produce the same one)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.normalize import (
    robust_zscore,
    robust_zscore_grouped_map,
)
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events


def _assert_twins_agree(native_rows, pandas_rows):
    native = {(r.symbol, r.event_id): r.robust_z for r in native_rows}
    pandas_form = {(r.symbol, r.event_id): r.robust_z for r in pandas_rows}
    assert set(native) == set(pandas_form)
    for k, v in native.items():
        p = pandas_form[k]
        if v is None:
            assert p is None, (k, "native NULL but pandas", p)
        else:
            assert p is not None and not math.isnan(p), (k, v, p)
            assert abs(v - p) < 1e-9, (k, v, p)


def test_grouped_map_matches_native(spark, sf_dir):
    t = ticks_from_events(spark, sf_dir).select("symbol", "event_id", "price")
    _assert_twins_agree(
        robust_zscore(t).collect(), robust_zscore_grouped_map(t).collect()
    )


def test_zero_mad_group_yields_null_in_both_forms(spark):
    # A constant-price group has MAD 0: native nullif → NULL; the grouped-map
    # twin must also emit NULL, never NaN.
    rows = [("CONST", i, 42.0) for i in range(5)] + [
        ("VARY", i, float(i)) for i in range(5)
    ]
    t = spark.createDataFrame(rows, "symbol string, event_id int, price double")
    native_rows = robust_zscore(t).collect()
    pandas_rows = robust_zscore_grouped_map(t).collect()
    _assert_twins_agree(native_rows, pandas_rows)
    const_native = [r.robust_z for r in native_rows if r.symbol == "CONST"]
    const_pandas = [r.robust_z for r in pandas_rows if r.symbol == "CONST"]
    assert const_native == [None] * 5
    assert const_pandas == [None] * 5
    # and NULL really is NULL Spark-side (isnan would be False, isNull True)
    nn = (
        robust_zscore_grouped_map(t)
        .filter(F.col("symbol") == "CONST")
        .select(
            F.sum(F.col("robust_z").isNull().cast("int")).alias("nulls"),
            F.sum(F.isnan("robust_z").cast("int")).alias("nans"),
        )
        .collect()[0]
    )
    assert nn.nulls == 5 and nn.nans == 0
