"""Physical-plan assertions: the scale properties we claim must be visible
in the executed plan, not just intended."""

from __future__ import annotations

from stock_market_data_pipeline_spark.queries import QUERIES


def _plan(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert plan.count("Exchange") == 1  # one partial->final agg shuffle
    # range predicate reaches the parquet scan
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_region_revenue_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "region_revenue")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_rolling_frames_single_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rolling_frames")
    # all five rolling frames share one (partition, order) spec: exactly one
    # exchange and one sort feeding one Window node
    assert plan.count("Exchange") == 1
    assert plan.count("Sort [") == 1


def test_cosine_topk_keeps_corpus_unshuffled(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cosine_topk")
    # query side broadcast: nested-loop broadcast join, corpus side scans in place
    assert "BroadcastNestedLoopJoin" in plan


def test_minhash_pairs_band_equijoin(spark, sf_dir):
    plan = _plan(spark, sf_dir, "minhash_lsh_pairs")
    # candidate generation must be an equi-join (hash or sort-merge), never
    # a cartesian/nested-loop product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_in_text_ops(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_quality")
    # codegen stages appear as "*(n)" markers in the executed plan string
    assert "*(" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
