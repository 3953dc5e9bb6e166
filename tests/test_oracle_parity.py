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
    (rotation contract, see the comment above QUERIES). Guard the round-6
    plan: the new/changed round-6 rows and the never-driver-green
    approx_stats LEAD the window; code-touched and once-green r5 rows stay
    in for their second confirmation."""
    window = list(QUERIES)[:50]
    # new/changed this round + the one never-driver-green query: the whole
    # point of the round-6 rotation — they must be at the very front
    assert window[:4] == [
        "multimodal_resize",
        "stream_incremental_dedup",
        "multimodal_image_features",
        "approx_stats",
    ]
    must_be_in = [
        # round-6 additions — never driver-checked
        "promo_revenue_pct",
        "discounted_revenue",
        "supplier_count_by_part_attrs",
        "nation_trade_volume",
        "soft_dedup",
        "containment_pairs",
        "upsample_mix",
        "asof_join_tolerance",
        "zorder_fingerprint",
        "psi_drift",
        "apply_changelog",
        "small_quantity_revenue",
        "customer_value_deciles",
        "product_profit",
        "customer_order_distribution",
        # code changed in round 6 (HLL envelope, asof tiebreak) — re-confirm
        "hll_user_rollup",
        "asof_join_forward",
        # once-green in r5 — need a second driver confirmation
        "session_peak_overlap",
        "supplier_pagerank",
        "quantized_topk_rerank",
        "national_market_share",
        "returned_item_customers",
        "training_mix_report",
        "semantic_decontaminate",
        "incremental_dedup",
        "stream_batch_session_parity",
        "sequence_packing",
        "packed_sequence_stats",
        "curriculum_packing",
        "wealthy_inactive_customers",
        "top_supplier_revenue",
        "large_volume_orders",
        "semantic_dedup",
        "corpus_report",
        "price_histogram",
        "user_set_ops",
        "data_expectations",
        "event_sessionization",
        "quantize_embeddings",
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
