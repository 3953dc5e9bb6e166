"""Causal-LM sequence packing — assign documents to fixed-token-budget
training sequences, the last batch-prep step of an LLM data pipeline.

GPT-style packing concatenates the token streams of all documents in a shard
and splits the stream at exact ``budget`` boundaries, letting documents
straddle sequence boundaries (no padding waste).  The assignment is therefore
pure arithmetic on a per-shard running token offset:

* ``shard``            — ``doc_id % n_shards`` (deterministic, oracle-friendly;
                         production would use ``pmod(xxhash64(id), n_shards)``)
* ``start_offset``     — tokens emitted before this doc within its shard
                         (cumulative token count over shard order, exclusive)
* ``seq_id``           — ``floor(start_offset / budget)``: the training
                         sequence the doc's first token lands in
* ``spans_boundary``   — whether the doc crosses into the next sequence
                         (``floor((end-1)/budget) > seq_id``)

100 TB posture: the only shuffle is on the shard key; within a shard the
running offset is one window cumsum over the shard's sort. Shard count is the
parallelism knob — at petabyte scale use O(10^4) shards so each window
partition stays executor-sized. No collect, no global ordering: sequences are
numbered per shard, exactly how distributed training shards its data files.

No reference counterpart (the reference pipeline stops at warehouse load:
`/root/reference/src/snowflake/scripts/load_to_snowflake.py:212-229`); this is
an engine extension for the training-data use case (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.functions.text import token_count_bpe_ish


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document packing assignment: (shard, seq_id, start_offset,
    n_tokens, spans_boundary) under a fixed per-sequence token budget.

    ``order_keys`` sets the within-shard packing order — the curriculum
    knob — as ``[(column_name, "asc"|"desc"), ...]`` over columns of
    ``docs`` (e.g. ``[("n_chars", "desc")]`` packs longest-first);
    ``id_col`` ascending is always appended as the deterministic tiebreak.
    Default: pure id order. Only the named scalar order columns ride
    through the shard shuffle alongside (id, shard, n_tokens) — the text
    column is dropped before the exchange either way."""
    shard = (F.col(id_col) % n_shards).cast("bigint")
    toks = token_count_bpe_ish(F.col(text_col)).cast("bigint")
    keys = list(order_keys or [])
    order = [
        F.col(name).desc() if direction == "desc" else F.col(name).asc()
        for name, direction in keys
    ] + [F.col(id_col).asc()]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        docs.select(
            F.col(id_col),
            shard.alias("shard"),
            toks.alias("n_tokens"),
            *[F.col(name) for name, _ in keys],
        )
        .withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("seq_id", F.floor(F.col("start_offset") / budget))
        .withColumn(
            "spans_boundary",
            (
                F.floor(
                    (F.col("start_offset") + F.col("n_tokens") - 1) / budget
                )
                > F.col("seq_id")
            ).cast("int"),
        )
        .drop(*[name for name, _ in keys])
    )
    return out


def packed_sequence_stats(
    assignments: DataFrame, budget: int = 512
) -> DataFrame:
    """Sequence-level packing QA over :func:`pack_sequences` output: docs
    per sequence, tokens contributed by docs STARTING in the sequence, and
    how many docs straddle out of it. One map-side-combined agg on the
    (shard, seq_id) key — output is O(total_tokens/budget) rows."""
    return assignments.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
        F.sum("spans_boundary").alias("n_straddlers"),
    )
