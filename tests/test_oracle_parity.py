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
    (rotation contract, see the comment above QUERIES). Guard the round-12
    plan: the manifest trio leads (manifest_lake.py rewritten this round —
    manifest-list sharding + S3A lock adapter — so their r11 rows certify
    pre-change code), then the ELEVEN r7-era rows (4 rounds stale, past
    the ≤3-round budget; round 11 shipped nothing so the r11-planned
    rotation lands in round 12), then the 36 oldest r8-green rows in
    registry order."""
    window = list(QUERIES)[:50]
    # round-12 additions — never driver-checked — at the very front
    assert window[:3] == [
        "manifest_sharded_scan",
        "stream_stream_join_parity",
        "supplier_late_blame",
    ]
    # manifest_lake.py code-touched rows (sharding + lock-adapter rewrite)
    assert window[3:6] == [
        "manifest_rollback_diff",
        "merge_manifest_state",
        "retention_revenue",
    ]
    # the eleven r7-era rows — the registry's stalest (r11 verdict item 1)
    assert window[6:17] == [
        "lang_id",
        "doc_fingerprint",
        "price_trend_regression",
        "ngram_jaccard_pairs",
        "simhash16",
        "simhash_neardup_pairs",
        "cosine_topk_vectorized",
        "lsh_cosine_topk",
        "ivf_cosine_topk",
        "multimodal_content_dedup",
        "rolling_frames",
    ]
    must_be_in = [
        # the 33 oldest r8-green rows fill the rest (spot-check ends +
        # anchors)
        "interval_merge",
        "bm25_topk",
        "bucket_fingerprint_diff",
        "entity_clusters",
        "weighted_sample",
        "fk_integrity",
        "time_range_rolling",
        "line_dedup",
        "incremental_ohlcv",
        "pruned_scan_revenue",
        "ewma",
        "daily_ohlcv",
        "dedup_keep_last",
        "event_funnel_windowed",
        "market_beta",
        "daily_vwap",
        "ann_recall",
        "gapfill_15m",
        "repetition_signals",
    ]
    missing = [q for q in must_be_in if q not in window]
    assert not missing, f"queries fell out of the driver window: {missing}"
    # the tail front (r13 rotation candidates) starts with the three r8
    # rows the round-12 additions displaced, then the remaining r8 block
    assert list(QUERIES)[50:54] == [
        "doc_chunks",
        "tfidf_top_terms",
        "price_band_join",
        "quota_sample",
    ]


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
