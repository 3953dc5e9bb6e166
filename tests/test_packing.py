"""Behavioral invariants for causal-LM sequence packing — properties the
value-hash oracle can't express: token conservation, offset contiguity, and
budget geometry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.packing import (
    pack_sequences,
    packed_sequence_stats,
)
from stock_market_data_pipeline_spark.sources.batch import read_table

BUDGET = 512
N_SHARDS = 8


def _assignments(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, budget=BUDGET, n_shards=N_SHARDS)


def test_offsets_are_contiguous_per_shard(spark, sf_dir):
    """Within a shard the token stream has no gaps or overlaps: each doc's
    start_offset equals the previous doc's start_offset + n_tokens."""
    rows = _assignments(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == N_SHARDS
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in docs:
            assert r.start_offset == expect, (shard, r.doc_id)
            expect += r.n_tokens


def test_seq_id_and_straddle_geometry(spark, sf_dir):
    """seq_id is the budget-quotient of the start offset; spans_boundary is
    set iff the doc's last token lands in a later sequence."""
    for r in _assignments(spark, sf_dir).collect():
        assert r.seq_id == r.start_offset // BUDGET
        last = r.start_offset + r.n_tokens - 1
        assert r.spans_boundary == (1 if last // BUDGET > r.seq_id else 0)


def test_token_conservation_into_stats(spark, sf_dir):
    """Sequence stats conserve tokens and docs: summing tokens_started and
    n_docs over sequences returns the corpus totals."""
    a = _assignments(spark, sf_dir)
    stats = packed_sequence_stats(a, budget=BUDGET)
    got = stats.agg(
        F.sum("n_docs").alias("docs"), F.sum("tokens_started").alias("toks")
    ).collect()[0]
    want = a.agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    assert got.docs == want.docs
    assert got.toks == want.toks


def test_packing_single_shard_exchange(spark, sf_dir):
    """The only data exchange is the shard-key hash partitioning feeding the
    per-shard window — no global sort, no extra shuffles."""
    df = _assignments(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    data_exchanges = [
        ln for ln in exchanges if "hashpartitioning(shard" in ln
    ]
    assert data_exchanges, exchanges
    assert not any("rangepartitioning" in ln for ln in exchanges), exchanges
