"""End-to-end training-data mix pipeline — the flagship composition of the
engine's LLM-corpus extensions into the one job a pretraining data team
actually runs over 100 TB of raw crawl:

    raw corpus
      → curation   (quality gate + exact dedup + MinHash-LSH near-dup drop,
                    `plans/curation.py:curate_corpus`)
      → decontamination (verbatim 8-gram overlap vs the held-out benchmark
                    split, `operators/decontam.py:ngram_decontaminate`)
      → mixing     (temperature/alpha sampling across sources,
                    `operators/sampling.py:alpha_temperature_sample`)
      → packing    (fixed-budget causal-LM sequence assembly,
                    `operators/packing.py:pack_sequences`)

The registry-visible output is the per-stage funnel report — documents and
BPE-ish tokens surviving each stage, plus the packed-sequence total — which
is exactly the number a data-mix design review asks for ("how much do we
lose at each gate?"), and small enough to oracle-hash exactly.

Scale shape: every stage shrinks what the next touches; per-stage metric
rows join the *id set* of the stage against ONE pinned (doc_id, n_tokens,
source) projection, so the token regex runs once over the corpus, not once
per stage. Stage id-frames are pinned (lazy localCheckpoint) because each
feeds both its report row and the next stage — the curation survivor-pinning
lesson (PERF_NOTES r5) applied at pipeline scope. At cluster scale the pins
become staged lake writes, which a real pipeline wants anyway (each stage's
output is a deliverable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.functions.text import token_count_bpe_ish
from stock_market_data_pipeline_spark.operators.decontam import ngram_decontaminate
from stock_market_data_pipeline_spark.operators.packing import pack_sequences
from stock_market_data_pipeline_spark.operators.sampling import (
    alpha_temperature_sample,
)
from stock_market_data_pipeline_spark.plans.curation import curate_corpus
from stock_market_data_pipeline_spark.sources.batch import read_table


def training_mix_report(
    spark: SparkSession,
    sf_dir: str,
    eval_mod: int = 20,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Funnel report: one row per pipeline stage.

    Output: ``stage_ord`` (1-5), ``stage``, ``docs``, ``tokens`` — where the
    ``packed`` row counts SEQUENCES in ``docs`` (token total unchanged from
    the mix, packing loses nothing).
    """
    docs = read_table(spark, sf_dir, "documents")
    # One corpus-wide token/source projection, reused by every stage row.
    base = docs.select(
        "doc_id",
        "source",
        token_count_bpe_ish(F.col("text")).cast("bigint").alias("n_tokens"),
    ).localCheckpoint(eager=False)

    corpus = docs.select("doc_id", "text", "source")
    eval_set = corpus.filter(F.col("doc_id") % eval_mod == 0).select(
        "doc_id", "text"
    )

    curated_ids = (
        curate_corpus(corpus.select("doc_id", "text"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    train = corpus.join(curated_ids, "doc_id").select("doc_id", "text")
    decon_ids = (
        ngram_decontaminate(train, eval_set, n=8)
        .filter(~F.col("contaminated"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    mixed_ids = (
        alpha_temperature_sample(
            base.join(decon_ids, "doc_id").select("doc_id", "source"),
            group_col="source",
            alpha=alpha,
            target_fraction=target_fraction,
        )
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    packed = pack_sequences(
        corpus.join(mixed_ids, "doc_id").select("doc_id", "text"),
        budget=budget,
        n_shards=n_shards,
    )

    def stage_row(ids: DataFrame | None, ord_: int, name: str) -> DataFrame:
        frame = base if ids is None else base.join(ids, "doc_id")
        return frame.agg(
            F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
        ).select(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            "docs",
            "tokens",
        )

    packed_row = packed.agg(
        F.count_distinct(F.col("shard"), F.col("seq_id")).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    ).select(
        F.lit(5).alias("stage_ord"), F.lit("packed").alias("stage"), "docs", "tokens"
    )
    return (
        stage_row(None, 1, "raw")
        .unionByName(stage_row(curated_ids, 2, "curated"))
        .unionByName(stage_row(decon_ids, 3, "decontaminated"))
        .unionByName(stage_row(mixed_ids, 4, "mixed"))
        .unionByName(packed_row)
    )
