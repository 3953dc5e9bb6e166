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
    rounds — SURVEY §2.10). Guard the round-14 plan: 6 new rows, then 3
    code-touched re-certs (bloom lookup path rewritten; countmin left
    join; rrf guard), then the 7 r13-green manifest rows re-certed
    because _commit / the pruned reader / maintenance bloom-carry
    changed under them, then ALL 27 deferred r9 rows (staleness exactly
    4 — the budget edge, MANDATORY), then the 7 oldest r11 rows (partial
    early drain). The 35 remaining r11 rows sit at positions 50:85 —
    r15's mandatory front."""
    window = list(QUERIES)[:50]
    # round-14 additions — never driver-checked — at the very front
    assert window[:6] == [
        "clustered_scan_fingerprint",
        "time_travel_read",
        "stream_dedup_keyed_parity",
        "replace_where_equality",
        "wap_publish_equality",
        "incremental_read_equality",
    ]
    # code-touched re-certs (round-13 ADVICE + round-14 review fixes)
    assert window[6:9] == [
        "bloom_point_lookup",
        "countmin_user_topk",
        "rank_fusion_topk",
    ]
    # manifest rows over the changed commit/prune/bloom-carry paths
    assert window[9:16] == [
        "manifest_schema_evolution",
        "manifest_key_delete",
        "manifest_sharded_scan",
        "manifest_rollback_diff",
        "merge_manifest_state",
        "retention_revenue",
        "pruned_scan_revenue",
    ]
    # ALL 27 deferred r9 rows (the r13 verdict's designated r14 front)
    assert window[16:43] == [
        "approx_stats",
        "corpus_report",
        "customer_order_distribution",
        "customer_value_deciles",
        "discounted_revenue",
        "large_volume_orders",
        "nation_trade_volume",
        "national_market_share",
        "product_profit",
        "promo_revenue_pct",
        "returned_item_customers",
        "scd2_history",
        "semantic_decontaminate",
        "semantic_dedup",
        "sequence_packing",
        "session_peak_overlap",
        "small_quantity_revenue",
        "soft_dedup",
        "split_assign",
        "supplier_count_by_part_attrs",
        "supplier_pagerank",
        "top_supplier_revenue",
        "training_mix_report",
        "unigram_logprob",
        "upsample_mix",
        "version_diff",
        "wealthy_inactive_customers",
    ]
    # the 7 oldest r11-green rows (early drain; r11 cohort due by r15)
    assert window[43:50] == [
        "fuzzy_name_pairs_multiblock",
        "fuzzy_name_pairs",
        "clean_cast_filter",
        "curriculum_packing",
        "data_expectations",
        "event_sessionization",
        "price_histogram",
    ]
    # the 35 remaining r11 rows are the tail front — r15's mandatory
    # front (they hit the 4-round budget edge at r15)
    assert list(QUERIES)[50:85] == [
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
