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
    (rotation contract, see the comment above QUERIES). Guard the round-8
    plan: never-driver-checked round-8 additions lead, followed by the
    rows whose code changed since their r7 driver row, then the 40
    oldest-green rows from the tail front (the r4 remainder the r7 plan
    earmarked)."""
    window = list(QUERIES)[:50]
    # round-8 additions - never driver-checked - at the very front
    assert window[:13] == [
        "interval_merge",
        "fuzzy_name_pairs",
        "bm25_topk",
        "version_diff",
        "split_assign",
        "bpe_merge_candidates",
        "bucket_fingerprint_diff",
        "entity_clusters",
        "weighted_sample",
        "retention_revenue",
        "merge_manifest_state",
        "fk_integrity",
        "time_range_rolling",
    ]
    # code touched since the r7 driver check (round-8 ADVICE fixes)
    assert window[13:16] == [
        "line_dedup",         # oracle NULL-text LEFT JOIN fix
        "incremental_ohlcv",  # ohlcv_partial intra-batch tie fix
        "pruned_scan_revenue",  # date-stats prune extension
    ]
    must_be_in = [
        # the r4-remainder oldest-green block now rotating through
        "ewma",
        "daily_ohlcv",
        "daily_change_close_over_close",
        "dedup_keep_last",
        "null_fill_defaults",
        "event_transitions",
        "winsorize_prices",
        "alpha_sample",
        "market_beta",
        "daily_vwap",
        "chunk_dedup_stats",
        "retention_cohorts",
        "macd_signal",
        "pii_redaction",
        "ann_recall",
        "gapfill_15m",
        "tfidf_top_terms",
        "price_band_join",
        "technical_indicators",
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
