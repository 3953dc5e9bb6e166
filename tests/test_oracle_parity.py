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
    rounds — SURVEY §2.10). Guard the round-17 plan: 2 new rows (X154
    change feed across replaceWhere — Delta's uncancelled
    delete-all ∪ insert-all sidecar; X155 per-commit batch
    table_changes with replica-backfill runtime assert), then 3
    code-touched re-certs
    (the shared change-row emitter with null-safe key joins rewired
    both CDF paths; _write_cdf_sidecar fans out above 1M rows; the
    CDC replicator consumes the restructured feed), then ALL 31
    deferred r13 rows (staleness exactly 4 — the budget edge,
    MANDATORY), then 14 r14 rows (the 46-row r14 wave starts
    draining — >= 10 required; ALL remaining 32 are r18's mandatory
    front)."""
    window = list(QUERIES)[:50]
    # round-17 additions — never driver-checked — at the very front
    assert window[:2] == [
        "stream_cdf_replace_parity",
        "table_changes_parity",
    ]
    # code-touched re-certs (shared emitter + multi-part sidecars)
    assert window[2:5] == [
        "stream_cdf_parity",
        "stream_cdf_merge_parity",
        "cdc_replicate_equality",
    ]
    # ALL 31 deferred r13 rows (the r16 verdict's designated r17 front)
    assert window[5:36] == [
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
    # 14 r14 rows: replace_where_equality first (its write path gained
    # CDF recording this round), then manifest-format neighbors of the
    # emitter refactor, then stream/dedup rows (approx_stats rolls to
    # the front of r18's mandatory r14 block — drain stays >= 10)
    assert window[36:50] == [
        "replace_where_equality",
        "manifest_key_delete",
        "version_diff",
        "manifest_rollback_diff",
        "incremental_read_equality",
        "manifest_schema_evolution",
        "manifest_sharded_scan",
        "scd2_history",
        "time_travel_read",
        "clustered_scan_fingerprint",
        "stream_dedup_keyed_parity",
        "semantic_dedup",
        "semantic_decontaminate",
        "fuzzy_name_pairs",
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
