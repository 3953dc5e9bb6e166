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
