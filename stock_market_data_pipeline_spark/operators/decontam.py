"""Train/eval n-gram decontamination (engine extension, LLM-pipeline core).

Before pretraining, every serious corpus pipeline checks training documents
for verbatim n-gram overlap against held-out evaluation sets (the standard
train-test decontamination step: a training doc sharing a long n-gram with a
benchmark is flagged or dropped). The reference pipeline has no analogue —
this extends the documents-table surface the same way the near-dup operators
do (provenance anchor: the reference's batch QA step,
`/root/reference/src/spark/jobs/spark_batch_processor.py`, validates rows but
never cross-references datasets).

100 TB posture: the eval/benchmark set is small by construction (benchmarks
are KBs-to-MBs, the corpus is the 100 TB side), so its distinct-shingle set
broadcasts; the train side computes shingles in a projection (explode —
no shuffle), dedupes per doc with one shuffle on (doc_id, shingle), and the
collision join is a broadcast hash join — the corpus never shuffles on the
shingle key. Shingle strings could be md5-hashed to 16 bytes before the join
at real scale; kept as strings here so the oracle is a direct SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ngram_shingles(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into its word n-gram shingles (space-joined).

    Tokens = single-space split (matches the oracle's ``string_split``).
    Documents shorter than ``n`` tokens produce no shingles.
    """
    toks = F.split(F.col(text_col), " ")
    hi = F.size(toks) - F.lit(n - 1)
    # sequence(1, hi) would count DOWN when hi < 1 — guard to an empty array
    idx = F.when(hi >= 1, F.sequence(F.lit(1), hi)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ).alias("shingle"),
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training doc: distinct n-gram count, how many collide with the
    eval set, and a ``contaminated`` flag (any collision).

    Every training doc appears in the output (zero-collision docs included —
    the anchor is the train id set, not the collision join).
    """
    tr = ngram_shingles(train, n=n, id_col=id_col, text_col=text_col).distinct()
    ev = (
        ngram_shingles(eval_set, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # Single pass: flag each distinct train shingle via broadcast left join,
    # then ONE doc-key aggregation computes both counts (vs separate
    # count + collision aggregations = twice the shuffled shingle traffic).
    per_doc = (
        tr.join(F.broadcast(ev), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_collisions"),
        )
    )
    return (
        train.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_collisions", F.lit(0)).alias("n_collisions"),
            (F.coalesce("n_collisions", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_gate(
    df: DataFrame,
    eval_shingles: frozenset[str],
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-row contamination gate: flag each document whose text contains any
    verbatim n-gram from the (pre-collected) eval shingle set — the STREAMING
    twin of :func:`ngram_decontaminate`. Stateless, so the same operator runs
    identically on a batch frame and inside a structured stream (no
    watermark, no state store — ingest-time gating, not corpus analytics).

    The eval set ships as a closed-over Python frozenset inside an
    Arrow-batched ``mapInPandas`` kernel: benchmark suites are KBs-to-MBs
    (constant-size relative to the corpus), so the task closure is the
    broadcast; membership tests are O(1) per shingle. This is the right
    boundary for Python — a join would force shuffle or a giant literal
    array into codegen; a per-row UDF would be 10-100× slower than the
    batch loop.

    Output: id, n_shingles, n_collisions, contaminated — same contract as
    the batch operator's per-doc columns (parity pinned by test).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    schema = f"{id_col} long, n_shingles long, n_collisions long, contaminated boolean"
    ev = eval_shingles  # local name for closure pickling

    def run(batches):
        for pdf in batches:
            ids, n_sh, n_col = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = text.split(" ") if isinstance(text, str) else []
                grams = {
                    " ".join(toks[i : i + n])
                    for i in range(max(0, len(toks) - n + 1))
                }
                ids.append(did)
                n_sh.append(len(grams))
                n_col.append(sum(1 for g in grams if g in ev))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_shingles": n_sh,
                    "n_collisions": n_col,
                    "contaminated": [c > 0 for c in n_col],
                }
            )

    return df.mapInPandas(run, schema=schema)


def collect_eval_shingles(
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingles: int = 5_000_000,
) -> frozenset[str]:
    """Collect the eval set's distinct shingles to the driver for the gate's
    closure. Guarded: benchmark sets are small by definition; a corpus-sized
    frame here is a usage error, not something to silently collect."""
    ev = ngram_shingles(eval_set, n=n, id_col=id_col, text_col=text_col)
    cnt = ev.select("shingle").distinct()
    rows = cnt.limit(max_shingles + 1).collect()
    if len(rows) > max_shingles:
        raise ValueError(
            f"eval set produced >{max_shingles} distinct shingles — "
            "that is corpus-sized; use ngram_decontaminate (broadcast join) instead"
        )
    return frozenset(r["shingle"] for r in rows)


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    _max_eval: int = 10_000,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus items whose max cosine
    against ANY held-out benchmark embedding reaches ``threshold`` — the
    paraphrase-leakage companion to verbatim n-gram decontamination
    (:func:`ngram_decontaminate` catches exact overlap; this catches
    reworded near-copies that share no 8-gram).

    Scale shape: the benchmark matrix is driver-collected (guarded — eval
    sets are small by definition), normalized once, and closed over; each
    Arrow batch computes one ``C_norm @ E_norm.T`` matmul and reduces to a
    per-row max — a SINGLE corpus pass with NO shuffle at all (the output
    is row-aligned with the input). The O(corpus × eval) fold lives on the
    BLAS path per the r5 kernel rule: expression-tree cosine folds at this
    shape measured ~48× slower (PERF_NOTES, semantic_dedup).

    Output: id, ``max_eval_cosine`` (6 dp; NULL for zero-norm rows),
    ``contaminated`` (rounded max ≥ threshold — rounding first keeps the
    flag boundary engine-deterministic).
    """
    import numpy as np
    import pandas as pd

    ev_rows = eval_set.select(id_col, vec_col).limit(_max_eval + 1).collect()
    if len(ev_rows) > _max_eval:
        raise ValueError(
            f"semantic_decontaminate closes the eval matrix over every task; "
            f"got >{_max_eval} eval rows — shard the eval set or use the "
            f"LSH/IVF candidate path instead."
        )
    if not ev_rows:
        # An empty benchmark means nothing can be contaminated — but a bare
        # np.array([]) is 1-D and norm(axis=1) would raise an opaque
        # AxisError deep in the kernel. Fail with intent instead.
        raise ValueError(
            "semantic_decontaminate got an empty eval_set; nothing to "
            "decontaminate against (pass a non-empty benchmark split)"
        )
    e_mat = np.array([r[1] for r in ev_rows], dtype=np.float64)
    e_norms = np.linalg.norm(e_mat, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        e_norm = np.where(e_norms > 0, e_mat / e_norms, np.nan)

    def score(batches):
        for pdf in batches:
            raw_ids = pdf[id_col]
            if raw_ids.isna().any():
                raise ValueError(
                    f"semantic_decontaminate: id column {id_col!r} contains "
                    "nulls; ids must be non-null integers"
                )
            ids = raw_ids.to_numpy(dtype=np.int64)
            c = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(c, axis=1, keepdims=True)
            with np.errstate(invalid="ignore", divide="ignore"):
                c_norm = np.where(norms > 0, c / norms, np.nan)
            sims = c_norm @ e_norm.T  # |batch| x |E|; nan where either norm 0
            all_nan = np.isnan(sims).all(axis=1)
            with np.errstate(invalid="ignore"):
                mx = np.where(all_nan, np.nan, np.nanmax(sims, axis=1))
            mx = np.round(mx + 1e-9, 6)  # utils.ROUND_BIAS, kernel-side
            out = pd.DataFrame(
                {
                    id_col: ids,
                    "max_eval_cosine": mx,
                    "contaminated": np.where(
                        np.isnan(mx), False, mx >= threshold
                    ).astype(bool),
                }
            )
            out.loc[np.isnan(mx), "max_eval_cosine"] = None
            yield out

    return corpus.select(id_col, vec_col).mapInPandas(
        score,
        schema=f"{id_col} long, max_eval_cosine double, contaminated boolean",
    )
