"""Graph analytics over relational edge lists (engine extension).

The reference pipeline has no graph surface; this module adds the second
classic iterative-fixpoint operator next to connected components
(``operators/neardup.py:connected_components``): weighted PageRank by
unrolled power iteration. Training-data pipelines use it to rank entities in
derived graphs — template/boilerplate detection over near-dup graphs,
influence ranking over interaction graphs — anywhere "importance flows along
edges" beats raw degree counts.

Scale shape: each iteration is one join of the rank vector to the edge list
on ``src`` (both partitioned by the node key — co-partitioned at cluster
scale via bucketing) plus one map-side-combinable sum on ``dst``. No
all-pairs work, no driver-side matrices; the rank frame is O(#nodes), edges
are O(#edges), exactly the frames Pregel/GraphX shuffle. The normalized edge
list is pinned once (lazy ``localCheckpoint``) so the per-iteration plan
does not replay edge normalization — the same lineage-truncation trade as
``connected_components``.

Determinism: fixed iteration count (no data-dependent convergence test),
uniform init, damping as an exact literal; final ranks rounded via
``round_det`` so last-ulp summation-order drift between engines disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.utils import round_det


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 3,
    pin_edges: bool = True,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Weighted PageRank, ``n_iter`` unrolled power iterations.

    ``rank_0 = 1/N`` for every node (nodes = distinct src ∪ dst);
    ``rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_t(u) · w(u,v)/W_out(u)``.

    Dangling nodes (no out-edges) leak their mass — callers wanting the
    strict stochastic form should symmetrize the edge list first (the
    registry query does), which also makes the result a centrality over the
    undirected graph. ``weight=None`` means every edge weighs 1.

    Output: ``node, rank`` (rank rounded to 6 dp). Σrank ≈ 1 when no node
    dangles.

    ``broadcast_ranks=True`` broadcasts the rank vector into each
    iteration's join instead of shuffling the edge list on ``src``: with
    map-side partial aggregation on ``dst``, an iteration then moves only
    O(#nodes) bytes through the exchange — the right plan whenever the node
    set fits an executor (millions), while edge lists are billions. For
    billion-node graphs leave it False and co-partition edges and ranks on
    the node key instead.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    )
    out_strength = e.groupBy("_src").agg(F.sum("_w").alias("_wout"))
    norm = (
        e.join(out_strength, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_wout")).alias("_wn"))
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    if pin_edges:
        # Both frames are reused verbatim by every iteration — pin them so
        # iteration k's plan doesn't re-derive edge construction and
        # normalization k times (curation.py pattern; at cluster scale
        # persist(DISK_ONLY) or a staged table plays this role). Unpinned,
        # the whole upstream edge derivation (e.g. a fact-table join) replays
        # once per iteration per consumer.
        norm = norm.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    # N rides the plan as a 1-row broadcast, not a driver-side collect: the
    # operator stays a single lazy DataFrame program.
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(n_iter):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            norm.join(rank_side, norm["_src"] == ranks["node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_wn")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", round_det(F.col("rank"), 6).alias("rank"))
