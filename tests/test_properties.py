"""Property-based tests (hypothesis) for order-sensitive operators.

Each property runs few examples (Spark job per example) but explores the
adversarial shapes fixed fixtures miss: duplicate keys, equal timestamps,
empty sides, single-row groups.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.dedup import dedup_keep_last
from stock_market_data_pipeline_spark.operators.joins import as_of_join

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.sampled_from(["A", "B", "C"])
_ts = st.integers(min_value=0, max_value=50)


@_SETTINGS
@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=15),
    right=st.lists(st.tuples(_keys, _ts, st.floats(1, 100)), max_size=15),
)
def test_as_of_join_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
    ).select("k", F.timestamp_seconds("t").alias("t"), "lid")
    if right:
        rdf = spark.createDataFrame(
            [(k, t, v) for (k, t, v) in right], ["k", "rt", "v"]
        )
    else:
        rdf = spark.createDataFrame([], "k string, rt long, v double")
    rdf = rdf.select("k", F.timestamp_seconds("rt").alias("rt"), "v")
    # pandas reference: merge_asof(by=key, direction backward) after dropping
    # duplicate (k, rt) keeping the max v? merge_asof keeps the LAST match in
    # sort order for equal rt; dedupe right to one row per (k, rt) for a
    # well-defined comparison (our operator picks the last in (rt, order)).
    rpd = (
        pd.DataFrame(right, columns=["k", "rt", "v"])
        .groupby(["k", "rt"], as_index=False)["v"]
        .max()
        .sort_values(["rt", "k"])
        if right
        else pd.DataFrame(columns=["k", "rt", "v"])
    )
    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).sort_values(["t", "lid"])
    if len(rpd):
        expected = pd.merge_asof(
            lpd, rpd, left_on="t", right_on="rt", by="k", direction="backward"
        )
        exp = {(r.k, r.lid): (None if pd.isna(r.v) else round(r.v, 9)) for r in expected.itertuples()}
    else:
        exp = {(r.k, r.lid): None for r in lpd.itertuples()}

    rdedup = rdf.groupBy("k", "rt").agg(F.max("v").alias("v"))
    out = as_of_join(ldf, rdedup, key="k", left_ts="t", right_ts="rt")
    got = {
        (r.k, r.lid): (None if r.v is None else round(r.v, 9))
        for r in out.collect()
    }
    assert got == exp


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_keep_last_is_argmax_per_key(spark, rows):
    df = spark.createDataFrame(rows, ["k", "sub", "ord"])
    out = dedup_keep_last(df, keys=["k", "sub"], order=["ord"]).collect()
    seen = {}
    for k, sub, o in rows:
        seen[(k, sub)] = max(seen.get((k, sub), -1), o)
    assert {(r.k, r.sub) for r in out} == set(seen)
    for r in out:
        assert r.ord == seen[(r.k, r.sub)]
    assert len(out) == len(seen)


_edges = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@_SETTINGS
@given(edges=_edges)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == classic union-find on any graph
    shape hypothesis throws (cycles, multi-edges, reversed duplicates,
    star+chain mixtures)."""
    from stock_market_data_pipeline_spark.operators.neardup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    expected = {n: find(n) for n in nodes}
    # canonicalize: union-find with min-root unions yields min-id roots
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == expected
