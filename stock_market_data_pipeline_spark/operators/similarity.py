"""Similarity search over embedding columns (engine extension).

Two tiers, per the standard ANN playbook:

* :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus and rank by cosine. At 100 TB corpus scale this is
  one full scan per query batch — the *baseline* and the recall oracle. The
  join is a broadcast nested-loop on purpose: corpus never shuffles, each
  partition scores its rows against the broadcast queries and a per-query
  top-k heap (window + filter under AQE) cuts the result.
* :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH.
  Signatures bucket both sides; candidates come from an equi-join on the
  bucket (shuffle keyed by bucket, cardinality #buckets), exact cosine
  reranks within buckets. Recall < 1 by construction; the hyperplanes are
  deterministic Python constants (seeded md5 parity) so results are exactly
  reproducible — and oracle-checkable — everywhere.

An IVF variant (k-means centroids instead of hyperplanes) drops in by
replacing ``bucket_of`` with an argmin-over-centroids expression; centroid
fitting is out of scope here (no MLlib dependency wanted for the core).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_market_data_pipeline_spark.functions.vectors import (
    as_double_vec,
    cosine,
    weighted_dot,
)
from stock_market_data_pipeline_spark.utils import round_det

NUM_PLANES = 8


def hyperplanes(dim: int, num_planes: int = NUM_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign = parity of md5(seed:plane:dim).

    Plain Python constants — they appear as literals in both the Spark plan
    and the oracle SQL, so bucketing is engine-independent.
    """
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit p set iff the projection on plane p is positive."""
    out = None
    for p, w in enumerate(planes):
        bit = F.when(weighted_dot(vec, w) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else (out + bit)
    return out


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k of corpus rows per query row.

    Output: query_id, neighbor_id, cosine (6 dp), rank (1..k); self-matches
    excluded; ties broken by neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    _max_queries: int = 10_000,
) -> DataFrame:
    """Brute-force cosine top-k, Arrow/numpy execution (the scale path).

    Same output contract as :func:`cosine_topk`, but the scoring runs as one
    numpy matmul per Arrow batch inside ``mapInPandas``: the query matrix is
    collected once (queries are small by construction), normalized on the
    driver, and closed over; each executor batch computes
    ``C_norm @ Q_norm.T`` and emits only its local top-k per query, so the
    shuffle to the global top-k window carries O(k·|Q|) rows per batch
    instead of |C|·|Q|. ~10-100× over per-row expression evaluation at
    large |C| (vectorized BLAS vs interpreted fold), at the cost of leaving
    whole-stage codegen — exactly the trade Pandas UDFs exist for.
    """
    import numpy as np
    import pandas as pd

    # The collect is bounded by the small-query contract: the query matrix is
    # broadcast into every task closure, so an unbounded query set would blow
    # executor memory silently. Fail loudly instead.
    q_rows = queries.select(id_col, vec_col).limit(_max_queries + 1).collect()
    if len(q_rows) > _max_queries:
        raise ValueError(
            f"cosine_topk_vectorized collects the query set into the task "
            f"closure; got >{_max_queries} queries. Use lsh_cosine_topk / "
            f"ivf_cosine_topk for large query sets."
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = c_norm @ q_norm.T  # |batch| x |Q|
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                # Round BEFORE local selection and tiebreak by id: the global
                # rank window orders by (rounded cosine DESC, neighbor_id), so
                # the per-batch top-k must use the identical order or a
                # boundary tie could drop the globally-winning row.
                col = np.round(sims[:, j] + 1e-9, 6)
                idx = np.nonzero(ids != qid)[0]
                if len(idx) == 0:
                    continue
                take = min(k, len(idx))
                order = np.lexsort((ids[idx], -col[idx]))[:take]
                top = idx[order]
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top])
                out_s.extend(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 32,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flavored ANN: partition the corpus into cells around pivot
    vectors, search the query's ``nprobe`` nearest cells, exact-rerank
    inside (corpus rows live in exactly ONE cell each — probing widens the
    query side only, the standard IVF recall knob: recall grows ~linearly in
    probed cells at O(nprobe/n_cells) extra scan fraction).

    Pivots are a CONSTANT-SIZE deterministic corpus sample — the ``n_cells``
    rows first in (md5(id), id) order, a training-free stand-in for k-means
    centroids (swap in fitted centroids without touching the plan; selection
    is pure SQL so the oracle reproduces it). Hash order makes the sample
    scatter across the id space regardless of id distribution, and the
    global ``ORDER BY … LIMIT n_cells`` compiles to TakeOrdered — each
    partition keeps a local top-``n_cells``, the driver merges; no full
    sort, no data-sized shuffle.

    Cost model at scale (the round-1 scheme sampled ``id % 125`` — a pivot
    set and broadcast growing LINEARLY with the corpus, O(|C|²/125)
    assignment compute): pivot set is O(n_cells) regardless of |C|, the
    broadcast is constant-size, and assignment is O(|C|·n_cells) — argmax
    over a fixed pivot array per row, corpus never shuffles. Candidates then
    join on the cell id — shuffle keyed by cell, like the LSH path. Cell
    assignment = argmax cosine to pivot, ties broken by pivot id.
    """
    pivots = (
        corpus.select(
            F.col(id_col).alias("pivot_id"), as_double_vec(vec_col).alias("p_vec")
        )
        .orderBy(F.md5(F.col("pivot_id").cast("string")), F.col("pivot_id"))
        .limit(n_cells)
    )

    def assign(df: DataFrame, out_id: str, probes: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(pivots)).select(
            F.col(out_id),
            "pivot_id",
            round_det(cosine(F.col("_v"), F.col("p_vec")), 6).alias("sim"),
        )
        w = Window.partitionBy(out_id).orderBy(F.col("sim").desc(), F.col("pivot_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= probes)
            .select(F.col(out_id), F.col("pivot_id").alias("cell"))
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("_v")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("_v")
    )
    c_cells = assign(c, "neighbor_id", 1)
    q_cells = assign(q, "query_id", nprobe)
    c_full = c.join(c_cells, "neighbor_id").select(
        "neighbor_id", F.col("_v").alias("c_vec"), "cell"
    )
    q_full = q.join(F.broadcast(q_cells), "query_id").select(
        "query_id", F.col("_v").alias("q_vec"), "cell"
    )
    scored = (
        c_full.join(F.broadcast(q_full), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = NUM_PLANES,
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the LSH hyperplane bucket,
    exact cosine reranks within the bucket. Same output contract as
    :func:`cosine_topk`; queries whose bucket holds < k corpus rows return
    fewer neighbors (documented ANN recall trade-off).

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (flip each plane bit once) — the
    standard multi-probe LSH recall knob: a true neighbor on the wrong side
    of ONE hyperplane is recovered, at (1 + num_planes)× candidate cost.
    Only the query side fans out; the corpus stays bucketed once, so the
    join remains an equi-join keyed by bucket."""
    planes = hyperplanes(dim, num_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("q_vec")
    ).withColumn("bucket", bucket_of(F.col("q_vec"), planes))
    if multiprobe:
        probe_list = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(num_planes)
            ],
        )
        q = q.select(
            "query_id", "q_vec", F.explode(probe_list).alias("bucket")
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("c_vec")
    ).withColumn("bucket", bucket_of(F.col("c_vec"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    num_planes: int = NUM_PLANES,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of the
    dedup family (MinHash/SimHash catch lexical dups; this catches semantic
    dups that share no tokens).

    Candidates come from the hyperplane-LSH bucket self-join (equi-join on
    the bucket id — never an all-pairs product); exact cosine filters at
    ``threshold``. Output: (vec_a, vec_b, cosine) with vec_a < vec_b, one row
    per surviving pair.

    Scale shape: one shuffle keyed by bucket; each bucket's pair blowup is
    O(bucket_size²), bounded by adding planes (``num_planes`` +1 halves the
    expected bucket occupancy). Recall < 1 by LSH construction — a pair can
    straddle buckets; multi-probe or banded plane sets raise recall the same
    way they do for MinHash bands. Deterministic: planes are seeded md5
    parity literals, reproducible in the DuckDB oracle.
    """
    planes = hyperplanes(dim, num_planes, seed)
    v = corpus.select(
        F.col(id_col).alias("vid"), as_double_vec(vec_col).alias("vec")
    ).withColumn("bucket", bucket_of(F.col("vec"), planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            round_det(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_iteration(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """One Lloyd's-iteration step over the IVF pivot set: assign every vector
    to its max-cosine pivot, then report per-cell size, cohesion, and how far
    the recomputed centroid moved — the training loop IVF needs to upgrade
    its hash-sampled pivots (``ivf_cosine_topk``'s "swap in fitted centroids"
    path) without an MLlib dependency.

    Output per cell: ``cell`` (pivot id), ``n_members``, ``cohesion`` (mean
    member→pivot cosine), ``centroid_drift`` (cosine between the old pivot
    and the recomputed mean vector — 1.0 means converged).

    100 TB posture: pivots are a constant-size broadcast (TakeOrdered sample,
    same as IVF); assignment is a per-row argmax over the broadcast array —
    the corpus never shuffles for it. The component-wise centroid mean is 64
    algebraic ``avg`` aggregates on the cell key: map-side partial combine,
    ONE shuffle of n_cells × dim partial sums. Iterating = feeding the new
    centroids back as pivots; each round is one job with identical shape.
    """
    dim = 64
    pivots = (
        corpus.select(
            F.col(id_col).alias("pivot_id"), as_double_vec(vec_col).alias("p_vec")
        )
        .orderBy(F.md5(F.col("pivot_id").cast("string")), F.col("pivot_id"))
        .limit(n_cells)
    )
    c = corpus.select(F.col(id_col).alias("vid"), as_double_vec(vec_col).alias("_v"))
    scored = c.crossJoin(F.broadcast(pivots)).select(
        "vid",
        "_v",
        "pivot_id",
        "p_vec",
        round_det(cosine(F.col("_v"), F.col("p_vec")), 6).alias("sim"),
    )
    # Argmax via max_by, not Window+row_number: the aggregate partially
    # combines map-side, so the exchange carries one row per vid instead of
    # the full n_cells × corpus scored frame (~n_cells× less shuffle volume).
    # Tie-break mirrors the old (sim DESC, pivot_id ASC) ordering: max over
    # the struct (sim, -pivot_id).
    assigned = (
        scored.groupBy("vid")
        .agg(
            F.max_by(
                F.struct("pivot_id", "p_vec", "sim"),
                F.struct(F.col("sim"), (-F.col("pivot_id")).alias("_nid")),
            ).alias("_best"),
            F.first("_v").alias("_v"),
        )
        .select(
            "vid",
            "_v",
            F.col("_best.pivot_id").alias("cell"),
            F.col("_best.p_vec").alias("p_vec"),
            F.col("_best.sim").alias("sim"),
        )
    )
    new_centroids = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        round_det(F.avg("sim"), 6).alias("cohesion"),
        *[F.avg(F.col("_v")[i]).alias(f"_m{i}") for i in range(dim)],
        F.first("p_vec").alias("p_vec"),
    )
    mean_vec = F.array(*[F.col(f"_m{i}") for i in range(dim)])
    return new_centroids.select(
        "cell",
        "n_members",
        "cohesion",
        round_det(cosine(mean_vec, F.col("p_vec")), 4).alias("centroid_drift"),
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    tau: float = 0.35,
    kernel: str = "arrow",
    _max_cell_members: int = 200_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings into cells, then inside each cell
    drop every vector that has a higher-priority (lower-id) member at cosine
    ≥ ``tau`` — semantic dups share meaning, not tokens, so the lexical
    family (MinHash/SimHash) can't see them.

    Cells are the deterministic IVF pivot assignment of
    :func:`ivf_cosine_topk` (argmax cosine over a constant-size broadcast
    pivot set, ties to the lower pivot id) — swap in k-means centroids from
    :func:`kmeans_iteration` without touching the plan. The pairwise stage
    is keyed ON THE CELL only — never an all-pairs product: one shuffle by
    cell, per-cell O(size²) compare like the paper's within-cluster design.
    At 100 TB, ``n_cells`` scales with the corpus to hold E[cell²] bounded,
    and a hot cell (skew) splits by raising n_cells; determinism: cosines
    rounded to 6 dp before the threshold and min-witness selection.

    Two kernels, identical output (unit test pins equivalence; the oracle
    gates the default):

    * ``"arrow"`` (default, the scale path): assignment is one numpy matmul
      per Arrow batch against the collected pivot matrix (bounded by
      n_cells); the pairwise stage is per-cell ``applyInPandas`` computing
      the cell's Gram matrix — vectorized BLAS instead of a 64-element
      Catalyst fold per pair (measured ~10× on the 10× growth probe). Cell
      membership is capped at ``_max_cell_members`` (members² floats must
      fit an executor — the paper's per-cluster-in-memory design point);
      oversize cells raise with "increase n_cells".
    * ``"expr"``: pure-DataFrame form (crossJoin-broadcast argmax via
      map-side-combined ``max_by`` — never a Window over the scored frame,
      and never a vector through that exchange — plus a cell-keyed
      self-equi-join). Stays in codegen; the cross-check and fallback.

    Output one row per vector: ``vec_id``, ``cell``, ``removed`` (0/1),
    ``dup_of`` (lowest-id witness ≥ tau in-cell, NULL when kept).
    """
    pivots = (
        corpus.select(
            F.col(id_col).alias("pivot_id"), as_double_vec(vec_col).alias("p_vec")
        )
        .orderBy(F.md5(F.col("pivot_id").cast("string")), F.col("pivot_id"))
        .limit(n_cells)
    )
    v = corpus.select(F.col(id_col).alias("vid"), as_double_vec(vec_col).alias("vec"))

    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        # Bounded collect: exactly n_cells rows by construction.
        p_rows = sorted(pivots.collect(), key=lambda r: r[0])
        p_ids = np.array([r[0] for r in p_rows], dtype=np.int64)
        p_mat = np.array([r[1] for r in p_rows], dtype=np.float64)
        p_norm = p_mat / np.linalg.norm(p_mat, axis=1, keepdims=True)

        def assign(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                ids = pdf["vid"].to_numpy(dtype=np.int64)
                c = np.array(list(pdf["vec"]), dtype=np.float64)
                c_norm = c / np.linalg.norm(c, axis=1, keepdims=True)
                # Same bias-then-round as round_det; p_ids ascending makes
                # np.argmax's first-max rule the lower-pivot-id tiebreak.
                sims = np.round(c_norm @ p_norm.T + 1e-9, 6)
                yield pd.DataFrame(
                    {"vid": ids, "vec": pdf["vec"], "cell": p_ids[np.argmax(sims, axis=1)]}
                )

        assigned = v.mapInPandas(
            assign, schema="vid long, vec array<double>, cell long"
        )

        def in_cell_pairs(key, pdf):
            if len(pdf) > _max_cell_members:
                raise ValueError(
                    f"semantic_dedup cell {key[0]} has {len(pdf)} members "
                    f"(> {_max_cell_members}); increase n_cells so the "
                    f"per-cell Gram matrix fits an executor"
                )
            order = pdf["vid"].to_numpy(dtype=np.int64).argsort()
            ids = pdf["vid"].to_numpy(dtype=np.int64)[order]
            m = np.array(list(pdf["vec"]), dtype=np.float64)[order]
            m_norm = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = np.round(m_norm @ m_norm.T + 1e-9, 6)
            hit = sims >= tau
            # ids ascending: the first True strictly below the diagonal is
            # the lowest-id witness.
            tril = np.tril(hit, k=-1)
            has = tril.any(axis=1)
            first = tril.argmax(axis=1)
            return pd.DataFrame(
                {"vid": ids[has], "dup_of": ids[first[has]]}
            )

        witnesses = assigned.groupBy("cell").applyInPandas(
            in_cell_pairs, schema="vid long, dup_of long"
        )
    elif kernel == "expr":
        # Argmax WITHOUT the vector attached: the scored frame is n·n_cells
        # rows, and groupBy+max_by partial-aggregates map-side to one slim
        # row per vid before the exchange (same lesson as kmeans_iteration's
        # r4→r5 argmax fix). A Window.partitionBy(vid) here would shuffle
        # n·n_cells rows — and carrying `vec` through it shuffles
        # n·n_cells·dim doubles (~100 GB at the 10× growth probe). Ties
        # break to the lower pivot id via max of (sim, -pivot_id).
        scored = v.crossJoin(F.broadcast(pivots)).select(
            "vid",
            "pivot_id",
            round_det(cosine(F.col("vec"), F.col("p_vec")), 6).alias("sim"),
        )
        cells = scored.groupBy("vid").agg(
            F.max_by(
                "pivot_id", F.struct(F.col("sim"), (-F.col("pivot_id")).alias("_np"))
            ).alias("cell")
        )
        assigned = v.join(cells, "vid").select("vid", "vec", "cell")
        a, b = assigned.alias("a"), assigned.alias("b")
        witnesses = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("b.vid") < F.col("a.vid")),
            )
            .filter(round_det(cosine(F.col("a.vec"), F.col("b.vec")), 6) >= tau)
            .groupBy(F.col("a.vid").alias("vid"))
            .agg(F.min(F.col("b.vid")).alias("dup_of"))
        )
    else:
        raise ValueError(f"unknown kernel {kernel!r}: use 'arrow' or 'expr'")
    return (
        assigned.join(witnesses, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.col("dup_of").isNotNull().cast("int").alias("removed"),
            "dup_of",
        )
    )


def quantized_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 20,
) -> DataFrame:
    """Scalar-quantized ANN: int8 shortlist scan + exact float rerank.

    The memory-bandwidth play every production vector store makes: score the
    corpus against the queries in int8 (4× less data moved than float32, 8×
    less than float64 — at 100 TB the shortlist scan is bandwidth-bound, so
    that factor is the speedup), keep a ``shortlist`` of candidates per
    query, then rerank only those few rows with exact float cosine. With
    shortlist ≈ 4k the recall loss of symmetric int8 is ~zero (quantization
    error ~1/254 per dim; composes `operators/quantize.py` with the
    `cosine_topk` contract).

    Key algebraic fact the plan leans on: for symmetric quantization
    ``q = round(x/scale)`` the per-vector ``scale`` CANCELS in cosine —
    ``cos(q_vec, scale·q_int) == cos(q_vec, q_int)`` — so the shortlist pass
    never joins scales back, it just scores the int array directly.

    Only ids + the approx score ride the top-k shuffle (the slim-frame rule:
    vectors re-join AFTER the shortlist cut, query side broadcast, corpus
    side an equi-join on id). Output contract matches `cosine_topk`:
    query_id, neighbor_id, cosine (exact, 6 dp), rank 1..k.
    """
    v = as_double_vec(vec_col)
    max_abs = F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    safe = F.nullif(max_abs / F.lit(127.0), F.lit(0.0))
    q_int = F.transform(
        v, lambda x: F.coalesce(round_det(x / safe, 0), F.lit(0.0)).cast("int")
    )
    c_q = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(q_int, lambda x: x.cast("double")).alias("qv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("q_vec")
    )
    approx = (
        c_q.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(cosine(F.col("q_vec"), F.col("qv")), 6).alias("_approx"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_approx").desc(), F.col("neighbor_id")
    )
    cand = (
        approx.withColumn("_srank", F.row_number().over(w))
        .filter(F.col("_srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    c_f = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("c_vec")
    )
    rerank = (
        c_f.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            round_det(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked retrieval lists — the standard
    zero-tuning hybrid-retrieval combiner (Cormack et al.'s RRF; what
    production search stacks use to merge lexical BM25 with vector ANN).
    Each input frame must carry ``(query_id, neighbor_id, rank)`` with
    rank 1-based; a candidate scores ``Σ_r 1/(rrf_k + rank_r)`` over the
    rankers that returned it (absent → contributes nothing).

    Plan shape: union of the (already small, top-k-per-query) ranked
    lists → one groupBy(query, neighbor) sum → one rank window. The
    inputs are k·|Q| rows each, so fusion cost is independent of corpus
    size — the rankers did the heavy lifting; at 100 TB you fuse
    milligrams, not the corpus. Determinism: with ≤2 rankers the
    per-candidate sum has ≤2 IEEE addends (order-free); scores are
    rounded to 6 dp and ties break by neighbor_id, per the cross-engine
    ranking rule.

    Output: ``query_id, neighbor_id, rrf_score (6 dp), n_rankers,
    rank (1..k)``.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    parts = [
        r.select("query_id", "neighbor_id", "rank") for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    scored = allr.groupBy("query_id", "neighbor_id").agg(
        round_det(
            F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))), 6
        ).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_rankers"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
