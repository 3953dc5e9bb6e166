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
    (rotation contract, see the comment above QUERIES). Guard the round-10
    plan: never-driver-checked round-10 additions lead, then the rows
    whose code changed since their last driver row (fuzzy injective
    pair key; manifest_lake distributed prune planning + sidecar
    consolidation), then the SEVEN r6-era rows — the registry's stalest
    (r9 verdict item 2) — then the 35 oldest r7-green rows in registry
    order."""
    window = list(QUERIES)[:50]
    # round-10 additions - never driver-checked - at the very front
    assert window[:3] == [
        "stream_silence_parity",
        "stream_dim_enrich_parity",
        "stream_watermark_drop_parity",
    ]
    # code touched since the r9 driver check (round-10 rewrites/fixes)
    assert window[3:8] == [
        "fuzzy_name_pairs_multiblock",  # injective pair-key fix
        "fuzzy_name_pairs",             # fuzzy.py touched
        "manifest_rollback_diff",       # manifest_lake prune/consolidation
        "merge_manifest_state",         # manifest_lake prune/consolidation
        "retention_revenue",            # manifest_lake prune/consolidation
    ]
    # the seven r6-era rows — stalest in the registry (r9 verdict item 2)
    assert window[8:15] == [
        "clean_cast_filter",
        "curriculum_packing",
        "data_expectations",
        "event_sessionization",
        "price_histogram",
        "quantize_embeddings",
        "user_set_ops",
    ]
    must_be_in = [
        # the 35 oldest r7-green rows fill the rest (spot-check ends +
        # anchors)
        "multimodal_audio_features",
        "stream_cdc_parity",
        "dead_letter_stats",
        "psi_drift",
        "asof_join",
        "apply_changelog",
        "incremental_dedup",
        "stream_incremental_dedup",
        "dedup_exact",
        "pricing_summary",
        "corpus_curation",
        "minhash_lsh_pairs",
        "neardup_clusters",
        "cosine_topk",
        "rollup_revenue",
        "linestatus_pivot",
        "cube_order_stats",
        "token_counts",
        "text_quality",
    ]
    missing = [q for q in must_be_in if q not in window]
    assert not missing, f"queries fell out of the driver window: {missing}"
    # the tail front (r11 rotation candidates) starts with the remaining
    # r7-green rows
    assert list(QUERIES)[50:52] == ["lang_id", "doc_fingerprint"]


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
