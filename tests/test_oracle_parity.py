"""The core correctness gate, run locally: every registered query must match
its DuckDB oracle on the test lake (same check the driver performs at sf0.01).
"""

from __future__ import annotations

import pytest

from stock_market_data_pipeline_spark.oracles import ORACLES
from stock_market_data_pipeline_spark.queries import QUERIES

from tests.conftest import assert_frames_match


def test_registry_is_consistent():
    # Every oracle refers to a registered query; queries without an oracle are
    # allowed (rows-only check) but must be deliberate.
    assert set(ORACLES) <= set(QUERIES), "oracle without a query"


def test_driver_window_composition():
    """The driver oracle-checks exactly the first 50 registry entries
    (rotation contract, see the comment above QUERIES). Guard the round-9
    plan: never-driver-checked round-9 additions lead, then the rows
    whose code changed since their last driver row (manifest_lake sidecar
    rewrite, fuzzy.py extension, split fracs validation, lake _key_diff
    refactor), then the 7 rows the round-8 OHLC struct-tie fix touched
    after their last driver check, then the five r5-era oldest-green
    rows, then the oldest-green tail front."""
    window = list(QUERIES)[:50]
    # round-9 additions - never driver-checked - at the very front
    assert window[:3] == [
        "stream_heavy_hitters_parity",
        "fuzzy_name_pairs_multiblock",
        "manifest_rollback_diff",
    ]
    # code touched since the r8 driver check (round-9 rewrites/fixes)
    assert window[3:8] == [
        "merge_manifest_state",  # manifest_lake sidecar/bucket rewrite
        "retention_revenue",     # manifest_lake sidecar/bucket rewrite
        "fuzzy_name_pairs",      # fuzzy.py multiblock extension
        "split_assign",          # fracs-sum validation
        "version_diff",          # lake.py _key_diff refactor
    ]
    # round-8 review touched the OHLC/windows tie rules AFTER these rows'
    # last driver check (r8 verdict item 1)
    assert window[8:15] == [
        "multi_window_tumbling",
        "multi_window_signals",
        "trading_signals",
        "windowed_analytics",
        "sliding_window_15m",
        "sliding_window_1h",
        "unpivot_ohlcv",
    ]
    # the five r5-era oldest-green rows (r8 verdict item 1)
    assert window[15:20] == [
        "unigram_logprob",
        "return_correlation",
        "kmeans_iteration",
        "last_touch_attribution",
        "scd2_history",
    ]
    must_be_in = [
        # the oldest-green tail front now rotating through
        "multimodal_resize",
        "multimodal_image_features",
        "approx_stats",
        "promo_revenue_pct",
        "soft_dedup",
        "containment_pairs",
        "upsample_mix",
        "customer_value_deciles",
        "hll_user_rollup",
        "supplier_pagerank",
        "national_market_share",
        "training_mix_report",
        "stream_batch_session_parity",
        "sequence_packing",
        "wealthy_inactive_customers",
        "corpus_report",
    ]
    missing = [q for q in must_be_in if q not in window]
    assert not missing, f"queries fell out of the driver window: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_in_final_schema(spark, sf_dir, name):
    # The driver's value-hash rejects DecimalType output columns even when the
    # decimal values are bit-identical on both engines (CORRECTNESS_r01: the 5
    # hash failures were exactly the queries ending in raw decimal(35,10)).
    # Rule: decimal accumulation stays internal; every exposed column is a
    # rounded double / string / integral type.
    from pyspark.sql.types import DecimalType

    df = QUERIES[name](spark, sf_dir)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name} exposes DecimalType columns {bad}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_frames_match(df, duck, ORACLES[name], query_name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
