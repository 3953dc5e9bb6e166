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
    (rotation contract, see the comment above QUERIES; budget = 4
    rounds — SURVEY §2.10). Guard the round-15 plan: 5 new rows
    (deletion vectors, CDF read, composed-prune flagship,
    cluster-compact read, the manifest streaming source), then 3
    code-touched re-certs (multi-column bloom rewrite; scoped commit
    lock under plain commit and WAP promote), then ALL 35 deferred r11
    rows (staleness exactly 4 — the budget edge, MANDATORY), then the
    7 oldest r12 rows (the 42-row r12 wave starts draining). The 35
    remaining r12 rows sit at positions 50:85 — r16's mandatory
    front."""
    window = list(QUERIES)[:50]
    # round-15 additions — never driver-checked — at the very front
    assert window[:5] == [
        "dv_delete_equality",
        "cdf_read_equality",
        "composed_prune_fingerprint",
        "cluster_compact_read",
        "manifest_stream_read_equality",
    ]
    # code-touched re-certs (multi-col blooms; hold_commit_scope)
    assert window[5:8] == [
        "bloom_point_lookup",
        "merge_manifest_state",
        "wap_publish_equality",
    ]
    # ALL 35 deferred r11 rows (the r14 verdict's designated r15 front)
    assert window[8:43] == [
        "quantize_embeddings",
        "user_set_ops",
        "multimodal_audio_features",
        "dead_letter_stats",
        "multimodal_audio_windows",
        "psi_drift",
        "asof_join",
        "asof_join_forward",
        "asof_join_tolerance",
        "apply_changelog",
        "incremental_dedup",
        "zorder_fingerprint",
        "dedup_exact",
        "pricing_summary",
        "top_revenue_orders",
        "region_revenue",
        "order_priority_counts",
        "revenue_forecast",
        "customer_order_ranks",
        "session_windows",
        "corpus_curation",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "neardup_clusters",
        "embedding_neardup_pairs",
        "cosine_topk",
        "robust_zscore",
        "rollup_revenue",
        "quantity_percentiles",
        "linestatus_pivot",
        "zscore_normalize",
        "embedding_unit_norm",
        "cube_order_stats",
        "token_counts",
        "text_quality",
    ]
    # the 7 oldest r12-green rows (r12 cohort due in full by r16)
    assert window[43:50] == [
        "supplier_late_blame",
        "lang_id",
        "doc_fingerprint",
        "price_trend_regression",
        "ngram_jaccard_pairs",
        "simhash_neardup_pairs",
        "cosine_topk_vectorized",
    ]
    # the 35 remaining r12 rows are the tail front — r16's mandatory
    # front (they hit the 4-round budget edge at r16)
    assert list(QUERIES)[50:85] == [
        "lsh_cosine_topk",
        "ivf_cosine_topk",
        "multimodal_content_dedup",
        "rolling_frames",
        "interval_merge",
        "bm25_topk",
        "bpe_merge_candidates",
        "bucket_fingerprint_diff",
        "entity_clusters",
        "weighted_sample",
        "fk_integrity",
        "time_range_rolling",
        "line_dedup",
        "incremental_ohlcv",
        "ewma",
        "daily_ohlcv",
        "daily_change_close_over_close",
        "dedup_keep_last",
        "null_fill_defaults",
        "event_transitions",
        "winsorize_prices",
        "event_funnel_windowed",
        "alpha_sample",
        "market_beta",
        "risk_metrics",
        "daily_vwap",
        "chunk_dedup_stats",
        "event_funnel",
        "retention_cohorts",
        "event_json_stats",
        "pii_redaction",
        "ann_recall",
        "stratified_sample",
        "gapfill_15m",
        "repetition_signals",
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
