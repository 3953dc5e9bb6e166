"""Grouped-map vs native robust z-score: both forms must agree."""

from __future__ import annotations

import math

from stock_market_data_pipeline_spark.operators.normalize import (
    robust_zscore,
    robust_zscore_grouped_map,
)
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events


def test_grouped_map_matches_native(spark, sf_dir):
    t = ticks_from_events(spark, sf_dir).select("symbol", "event_id", "price")
    native = {
        (r.symbol, r.event_id): r.robust_z for r in robust_zscore(t).collect()
    }
    pandas_form = {
        (r.symbol, r.event_id): r.robust_z
        for r in robust_zscore_grouped_map(t).collect()
    }
    assert set(native) == set(pandas_form)
    for k, v in native.items():
        p = pandas_form[k]
        if v is None or (isinstance(p, float) and math.isnan(p)):
            assert v is None or math.isnan(p)
        else:
            assert abs(v - p) < 1e-9, (k, v, p)
