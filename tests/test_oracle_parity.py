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
    rounds — SURVEY §2.10). Guard the round-16 plan: 4 new rows
    (DV-backed row-level UPDATE, readChangeFeed streaming mode, CDC
    replication, write-time change sidecars), then 4 code-touched
    re-certs (merge evolved-schema guard; the stream source's CDF
    restructure; _commit_dv_state generalization; retention_delete
    gained change-sidecar recording), then ALL 35 deferred r12 rows
    (staleness exactly 4 — the budget edge, MANDATORY), then the 7
    oldest r13 rows (the 38-row r13 wave starts draining). The 31
    remaining r13 rows sit at positions 50:81 — r17's mandatory
    front."""
    window = list(QUERIES)[:50]
    # round-16 additions — never driver-checked — at the very front
    assert window[:4] == [
        "dv_update_equality",
        "stream_cdf_parity",
        "cdc_replicate_equality",
        "stream_cdf_merge_parity",
    ]
    # code-touched re-certs (merge schema guard; manifest_source CDF
    # branch; _commit_dv_state postimage generalization; retention
    # change-sidecar recording)
    assert window[4:8] == [
        "merge_manifest_state",
        "manifest_stream_read_equality",
        "dv_delete_equality",
        "retention_revenue",
    ]
    # ALL 35 deferred r12 rows (the r15 verdict's designated r16 front)
    assert window[8:43] == [
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
    # the 7 oldest r13-green rows (r13 cohort due in full by r17)
    assert window[43:50] == [
        "compact_equality",
        "jsonl_quarantine",
        "min_cost_supplier",
        "important_parts",
        "stream_stream_left_join_parity",
        "gapfill_interpolate",
        "macd_signal",
    ]
    # the 31 remaining r13 rows are the tail front — r17's mandatory
    # front (they hit the 4-round budget edge at r17)
    assert list(QUERIES)[50:81] == [
        "stream_stream_join_parity",
        "stream_incremental_dedup",
        "stream_cdc_parity",
        "stream_silence_parity",
        "stream_dim_enrich_parity",
        "stream_watermark_drop_parity",
        "stream_batch_session_parity",
        "stream_heavy_hitters_parity",
        "corpus_curation_transitive",
        "doc_chunks",
        "multimodal_frame_sample",
        "ngram_decontaminate",
        "price_band_join",
        "quota_sample",
        "salted_symbol_volume",
        "technical_indicators",
        "tfidf_top_terms",
        "windowed_analytics",
        "trading_signals",
        "multi_window_tumbling",
        "multi_window_signals",
        "unpivot_ohlcv",
        "containment_pairs",
        "hll_user_rollup",
        "kmeans_iteration",
        "last_touch_attribution",
        "multimodal_image_features",
        "multimodal_resize",
        "packed_sequence_stats",
        "quantized_topk_rerank",
        "return_correlation",
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
