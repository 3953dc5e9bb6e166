"""Round-9 operators: OR-blocking fuzzy matching, split-fraction
validation, streaming heavy-hitters parity plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.fuzzy import (
    blocked_levenshtein_pairs,
    blocked_levenshtein_pairs_multiblock,
)


def _names_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_multiblock_unions_blockers_and_dedups_pairs(spark):
    """A pair sharing only the FIRST token is invisible to the head-noun
    blocker but found by OR-blocking; a pair sharing BOTH blockers is
    still emitted exactly once."""
    names = [
        "alpha steel rod",    # shares first token with the next name only
        "alpha steel rodz",   # same head?? no: rod vs rodz differ
        "beta wool rug",      # shares BOTH blockers with the next
        "beta wool rug ",     # (trailing space: same tokens, dist 1)
    ]
    df = _names_df(spark, names)
    blockers = [
        F.regexp_extract("name", "([a-z]+)$", 1),   # head noun
        F.regexp_extract("name", "^([a-z]+)", 1),   # first token
    ]
    single = blocked_levenshtein_pairs(
        df, "name", block_col=F.regexp_extract("name", "([a-z]+)$", 1),
        max_dist=4,
    ).collect()
    multi = blocked_levenshtein_pairs_multiblock(
        df, "name", block_cols=blockers, max_dist=4
    ).collect()
    single_pairs = {(r["name_a"], r["name_b"]) for r in single}
    multi_pairs = [(r["name_a"], r["name_b"]) for r in multi]
    # head-noun blocker alone misses the rod/rodz pair
    assert ("alpha steel rod", "alpha steel rodz") not in single_pairs
    assert ("alpha steel rod", "alpha steel rodz") in multi_pairs
    # single-blocker pairs are a subset of OR-blocked pairs
    assert single_pairs <= set(multi_pairs)
    # no duplicate emission for pairs found by both blockers
    assert len(multi_pairs) == len(set(multi_pairs))
    dists = {
        (r["name_a"], r["name_b"]): r["dist"] for r in multi
    }
    assert dists[("alpha steel rod", "alpha steel rodz")] == 1


def test_multiblock_dedup_happens_before_distance(spark):
    """The plan must dedup candidate pairs (16-byte md5 key) BEFORE
    computing levenshtein — a pair sharing k blocks costs ONE distance.
    In the physical plan string (top = last to execute), the levenshtein
    projection therefore appears ABOVE the pair-key aggregate."""
    df = _names_df(spark, [f"name {i}" for i in range(10)])
    out = blocked_levenshtein_pairs_multiblock(
        df, "name",
        block_cols=[
            F.regexp_extract("name", "([a-z]+)$", 1),
            F.regexp_extract("name", "^([a-z]+)", 1),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "levenshtein" in plan and "_pk" in plan
    assert plan.index("levenshtein") < plan.index("_pk")


def test_multiblock_empty_block_keys_dropped(spark):
    """Names yielding an empty block key must not pool into a degenerate
    all-pairs block."""
    df = _names_df(spark, ["12345", "12346", "alpha x", "alpha y"])
    out = blocked_levenshtein_pairs_multiblock(
        df, "name",
        block_cols=[F.regexp_extract("name", "^([a-z]+)", 1)],
        max_dist=4,
    ).collect()
    pairs = {(r["name_a"], r["name_b"]) for r in out}
    # the numeric names share only the EMPTY key -> never paired
    assert ("12345", "12346") not in pairs
    assert ("alpha x", "alpha y") in pairs


def test_split_assign_rejects_oversubscribed_fracs(spark):
    from stock_market_data_pipeline_spark.operators.sampling import (
        with_split_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    with pytest.raises(ValueError, match="sum"):
        with_split_assign(df, fracs={"train": 0.9, "val": 0.2})
    with pytest.raises(ValueError, match="sum"):
        with_split_assign(df, fracs={"train": -0.1, "val": 0.5})
    # exactly 1.0 (within tolerance) is fine
    out = with_split_assign(df, fracs={"a": 0.5, "b": 0.5})
    assert set(out.select("split").distinct().toPandas()["split"]) <= {
        "a", "b",
    }
