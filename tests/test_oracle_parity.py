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
    rounds — SURVEY §2.10). Guard the round-18 plan: 1 new row (X156
    change feed across full REPLACE and RESTORE), then 8 code-touched
    re-certs (the per-commit walk's one-scan rework; the CDF commit
    classes and protocol-versioned resolve/commit paths; the CDC
    replicator's reserved-name guard; rollback's new sidecar recorder;
    publish under WAP; the truncating stats writer behind every
    pruned scan), then ALL 32 remaining r14 rows (staleness exactly 4
    — the budget edge, MANDATORY), then 9 oldest r15 rows (the 47-row
    r15 wave starts draining — 36 left for r19's mandatory front)."""
    window = list(QUERIES)[:50]
    # round-18 addition — never driver-checked — at the very front
    assert window[0] == "stream_cdf_restore_parity"
    # code-touched re-certs
    assert window[1:9] == [
        "table_changes_parity",
        "stream_cdf_replace_parity",
        "stream_cdf_parity",
        "stream_cdf_merge_parity",
        "cdc_replicate_equality",
        "manifest_rollback_diff",
        "wap_publish_equality",
        "composed_prune_fingerprint",
    ]
    # ALL 32 remaining r14 rows (the r17 verdict's designated r18
    # front; age 4 at r18 = the rotation-budget edge)
    assert window[9:41] == [
        "approx_stats",
        "countmin_user_topk",
        "rank_fusion_topk",
        "pruned_scan_revenue",
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
        "wealthy_inactive_customers",
        "fuzzy_name_pairs_multiblock",
        "clean_cast_filter",
        "curriculum_packing",
        "data_expectations",
        "event_sessionization",
        "price_histogram",
    ]
    # 9 oldest r15 rows start the r15 drain
    assert window[41:50] == [
        "apply_changelog",
        "asof_join",
        "asof_join_forward",
        "asof_join_tolerance",
        "bloom_point_lookup",
        "cdf_read_equality",
        "cluster_compact_read",
        "corpus_curation",
        "cosine_topk",
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
