"""Round-5 operators: interval_join (bin-decomposed overlap), pagerank,
quantized shortlist + rerank ANN — semantics unit tests plus the plan-shape
properties their 100 TB claims rest on."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.graph import pagerank
from stock_market_data_pipeline_spark.operators.joins import interval_join
from stock_market_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    quantized_topk_rerank,
)
from stock_market_data_pipeline_spark.queries import QUERIES


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- interval_join
def _intervals(spark, rows, start="s", end="e", extra=("id",)):
    return spark.createDataFrame(
        rows, f"{extra[0]} long, {start} timestamp, {end} timestamp"
    )


def test_interval_join_basic_overlap_and_overlap_sec(spark):
    left = _intervals(
        spark, [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        extra=("lid",),
    )
    right = spark.createDataFrame(
        [
            # overlaps [10:30, 12:00] -> 30 min shared
            (10, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 12:00:00")),
            # touches at a point (11:00 == left end) -> overlap_sec 0, kept
            (11, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 11:30:00")),
            # disjoint
            (12, _ts("2024-01-01 12:00:01"), _ts("2024-01-01 13:00:00")),
        ],
        "rid long, rs timestamp, re timestamp",
    )
    out = interval_join(left, right, "s", "e", "rs", "re", bin_seconds=600)
    got = {r["rid"]: r["overlap_sec"] for r in out.collect()}
    assert got == {10: 1800, 11: 0}


def test_interval_join_no_duplicate_for_many_shared_bins(spark):
    # Both intervals span many 60 s bins; the first-shared-bin guard must
    # emit the pair exactly once with the full overlap.
    left = _intervals(
        spark, [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        extra=("lid",),
    )
    right = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:50:00"))],
        "rid long, rs timestamp, re timestamp",
    )
    out = interval_join(left, right, "s", "e", "rs", "re", bin_seconds=60)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["overlap_sec"] == 40 * 60


def test_interval_join_zero_length_interval_matches(spark):
    # A single-instant session still pairs with the window containing it.
    left = _intervals(
        spark, [(1, _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:15:00"))],
        extra=("lid",),
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))],
        "rid long, rs timestamp, re timestamp",
    )
    out = interval_join(left, right, "s", "e", "rs", "re", bin_seconds=900)
    assert out.count() == 1


def test_interval_join_equi_keys_partition_matches(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("B", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        "sym string, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:45:00"))],
        "sym string, rs timestamp, re timestamp",
    )
    out = interval_join(
        left, right, "s", "e", "rs", "re", bin_seconds=900, equi_keys=["sym"]
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["sym"] == "A"
    assert rows[0]["overlap_sec"] == 15 * 60


def test_interval_join_plans_equi_join_not_nested_loop(spark, sf_dir):
    """The whole point of the bin decomposition: the physical plan is a hash
    or sort-merge join keyed on the bin — never BroadcastNestedLoop or
    CartesianProduct, regardless of side sizes."""
    df = QUERIES["session_peak_overlap"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the interval join runs as an EQUI join keyed on the time bin
    join_lines = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and "_bin" in ln
    ]
    assert join_lines and all(
        ("BroadcastHashJoin" in ln)
        or ("SortMergeJoin" in ln)
        or ("ShuffledHashJoin" in ln)
        for ln in join_lines
    ), join_lines
    # the only nested-loop allowed is the 1-row scalar-threshold broadcast —
    # never one touching the interval endpoints
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "_thr" in ln, ln


# -------------------------------------------------------------------- pagerank
def test_pagerank_uniform_cycle_is_uniform(spark):
    # Symmetric ring: every node must get exactly the same rank, sum ~ 1.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"), ("c", "b"), ("a", "c")],
        "src string, dst string",
    )
    out = pagerank(edges, n_iter=3).collect()
    ranks = {r["node"]: r["rank"] for r in out}
    assert len(set(ranks.values())) == 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-5


def test_pagerank_hub_outranks_leaves(spark):
    # Star graph symmetrized: the hub concentrates rank.
    e = [("hub", x) for x in ("l1", "l2", "l3", "l4")]
    edges = spark.createDataFrame(
        e + [(d, s) for s, d in e], "src string, dst string"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=3).collect()}
    assert ranks["hub"] > max(v for k, v in ranks.items() if k != "hub")
    assert abs(sum(ranks.values()) - 1.0) < 1e-5


def test_pagerank_weights_shift_rank(spark):
    # b receives 9x the edge weight of c from the same source: with
    # symmetrized edges b must outrank c.
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("b", "a", 9.0), ("a", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight="w", n_iter=3).collect()
    }
    assert ranks["b"] > ranks["c"]


# -------------------------------------------------- quantized shortlist+rerank
def test_quantized_rerank_matches_exact_on_separable_vectors(spark):
    # Vectors with distinct directions: int8 quantization cannot reorder the
    # top-k, so the rerank output must equal exact brute force bit-for-bit.
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, q, k=3).collect()
    }
    quant = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in quantized_topk_rerank(emb, q, k=3, shortlist=20).collect()
    }
    assert quant == exact


def test_quantized_rerank_zero_vector_safe(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),  # zero vector: scale 0, cosine NULL — never ranks
            (2, [0.5, 0.5]),
            (3, [1.0, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = quantized_topk_rerank(emb, q, k=2, shortlist=3).collect()
    ids = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids == [3, 2]


def test_quantized_rerank_slim_shortlist_no_vectors_through_topk(spark, sf_dir):
    """The shortlist shuffle carries (query_id, neighbor_id, score) only —
    vectors rejoin after the cut. Assert no array column rides the window
    exchange that ranks the approx scores."""
    df = QUERIES["quantized_topk_rerank"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(query_id" in ln
    ]
    assert exchanges, plan[:800]
    # final rerank exchange may carry c_vec? No: the rank window runs after
    # cosine is scalar — no qv/embedding identifier may appear on either.
    for ln in exchanges:
        assert "qv#" not in ln and "embedding#" not in ln, ln


# ------------------------------------------------------- relational Q8 / Q10
def test_market_share_single_conditional_agg_pass(spark, sf_dir):
    """Numerator and denominator come from ONE aggregate over the joined
    fact rows — no self-join, no second lineitem scan."""
    df = QUERIES["national_market_share"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scans = [ln for ln in scans if "lineitem" in ln]
    assert len(li_scans) == 1, li_scans
    # the part-type filter is pushed into the part scan
    part_scans = [ln for ln in scans if "/part.parquet" in ln]
    assert part_scans and "PROMO" in part_scans[0], part_scans


def test_returned_items_dims_attach_after_rollup(spark, sf_dir):
    """The custkey rollup happens on (filtered) fact rows only; customer and
    nation broadcast-join onto the aggregated frame, so dimension columns
    never ride a fact-sized exchange. The returnflag filter reaches the
    lineitem scan."""
    df = QUERIES["returned_item_customers"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scan = [ln for ln in scans if "lineitem" in ln][0]
    assert "l_returnflag" in li_scan.split("PushedFilters")[1][:200], li_scan
    # aggregation keyed on custkey exists and is partial (map-side combine)
    assert "partial_" in plan


# ------------------------------------------------------- training mix pipeline
def test_training_mix_funnel_invariants(spark, sf_dir):
    """Each stage can only shrink the corpus; the packed row preserves the
    mixed token total exactly (packing assembles, never drops)."""
    rows = {
        r["stage"]: r
        for r in QUERIES["training_mix_report"](spark, sf_dir).collect()
    }
    assert set(rows) == {"raw", "curated", "decontaminated", "mixed", "packed"}
    assert (
        rows["raw"]["docs"]
        >= rows["curated"]["docs"]
        >= rows["decontaminated"]["docs"]
        >= rows["mixed"]["docs"]
    )
    assert rows["packed"]["tokens"] == rows["mixed"]["tokens"]
    # sequences are budget-packed: at least tokens/budget of them
    assert rows["packed"]["docs"] >= rows["mixed"]["tokens"] // 512


# ----------------------------------------------------------- clustered write
def test_write_clustered_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """The point of clustering: after range-repartition + in-file sort, a
    selective predicate's value falls inside the min/max stats of only a
    few row groups, so engines skip the rest. Measured directly on the
    parquet footers of both layouts."""
    import pyarrow.parquet as pq

    from stock_market_data_pipeline_spark.sinks.lake import write_clustered
    from stock_market_data_pipeline_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    plain, clustered = str(tmp_path / "plain"), str(tmp_path / "clustered")
    # shuffle-randomized baseline: 8 hash-partitioned unsorted files
    ev.repartition(8, "event_id").write.parquet(plain)
    write_clustered(ev, clustered, ["user_id"], n_files=8)

    target = ev.agg(F.expr("percentile_approx(user_id, 0.5)")).collect()[0][0]

    def matching_rowgroups(path: str) -> tuple[int, int]:
        import glob

        total = hits = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index("user_id")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                total += 1
                if st.min <= target <= st.max:
                    hits += 1
        return total, hits

    p_total, p_hits = matching_rowgroups(plain)
    c_total, c_hits = matching_rowgroups(clustered)
    # unsorted: (nearly) every row group spans the full range -> no skipping
    assert p_hits == p_total
    # clustered: the target key lives in a small fraction of row groups
    assert c_hits * 4 <= c_total, (c_hits, c_total)
    # equality of content (layout change only)
    assert spark.read.parquet(clustered).count() == ev.count()


# ------------------------------------------------------------- HLL sketches
def test_hll_rollup_small_exact_regime(spark):
    # Small cardinalities sit in the sketch's exact (sparse) regime: both
    # verdicts must be true and the exact column correct.
    df = spark.createDataFrame(
        [(g, d, u) for g in ("a", "b") for d in range(3) for u in range(40)],
        "g string, d int, u int",
    )
    rows = {
        r["g"]: r
        for r in __import__(
            "stock_market_data_pipeline_spark.operators.sketches",
            fromlist=["hll_cardinality_rollup"],
        )
        .hll_cardinality_rollup(df, "g", F.col("d"), "u")
        .collect()
    }
    for g in ("a", "b"):
        assert rows[g]["n_grains"] == 3
        assert rows[g]["exact_distinct"] == 40
        assert rows[g]["merged_within_envelope"] is True
        assert rows[g]["est_within_envelope"] is True


# ------------------------------------------------- semantic decontamination
def test_semantic_decontaminate_flags_and_nulls(spark):
    from stock_market_data_pipeline_spark.operators.decontam import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # identical direction to eval -> cosine 1.0
            (2, [0.0, 1.0]),   # orthogonal -> 0.0
            (3, [0.0, 0.0]),   # zero vector -> NULL, not contaminated
            (4, [0.9, 0.1]),   # close -> high cosine
        ],
        "vec_id long, embedding array<double>",
    )
    eval_set = spark.createDataFrame(
        [(100, [2.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, eval_set, threshold=0.8).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["max_eval_cosine"] == 1.0
    assert not rows[2]["contaminated"] and rows[2]["max_eval_cosine"] == 0.0
    assert rows[3]["max_eval_cosine"] is None and not rows[3]["contaminated"]
    assert rows[4]["contaminated"]  # 0.9/|v| ≈ 0.994


# ----------------------------------------------------------- forward as-of
def test_asof_forward_picks_earliest_following(spark):
    from stock_market_data_pipeline_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "t1")],
        "k long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), 1.0),  # before -> must NOT match
            (1, _ts("2024-01-01 10:05:00"), 2.0),  # earliest after -> match
            (1, _ts("2024-01-01 11:00:00"), 3.0),
        ],
        "k long, rts timestamp, v double",
    )
    rows = as_of_join(
        left, right, key="k", left_ts="lts", right_ts="rts", direction="forward"
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0
    # exact-timestamp right row matches in forward direction too
    right2 = right.union(
        spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 9.0)], right.schema)
    )
    rows2 = as_of_join(
        left, right2, key="k", left_ts="lts", right_ts="rts", direction="forward"
    ).collect()
    assert rows2[0]["v"] == 9.0
    # tolerance drops matches beyond the window
    rows3 = as_of_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        direction="forward", tolerance="2 minutes",
    ).collect()
    assert rows3[0]["v"] is None
