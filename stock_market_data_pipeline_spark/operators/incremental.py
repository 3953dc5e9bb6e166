"""Incremental corpus dedup against a persistent fingerprint store — the
production shape of exact dedup for a training-data pipeline that ingests
batches continuously instead of re-scanning the whole corpus.

A bucketed parquet store holds one row per content fingerprint ever seen
(``fingerprint`` md5, ``canonical_id``). Each new batch is:

1. fingerprinted (md5 of normalized text — same canonical form as
   :func:`..operators.dedup.dedup_exact_text`);
2. classified against the store with a bucket-pruned lookup join — only the
   store buckets the batch's fingerprints hash into are read, so a small
   batch against a 100-TB-corpus store touches O(batch) data, never the
   whole store;
3. the batch's novel fingerprints are merged back via the bucketed
   dynamic-overwrite MERGE (:func:`..sinks.lake.merge_upsert_bucketed`),
   which rewrites only the touched buckets.

This composes dedup + K6 exactly like the reference's incremental
load-then-MERGE loop (`/root/reference/src/snowflake/scripts/
load_to_snowflake.py:212-229`), with the warehouse MERGE replaced by the
lake-native bucketed merge.

Idempotence: re-merging the same batch adds nothing — the merge dedups per
fingerprint keep-last on a stable order column, so replays (at-least-once
upstream delivery, job retries) are safe.

Ordering contract: classification is pinned (localCheckpoint) BEFORE the
store update runs, because the lazy classified plan reads store files the
merge is about to rewrite. In production the classified batch is written to
the lake first, then the store updated — same write-then-merge ordering,
durable instead of session-cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.dedup import normalize_text
from stock_market_data_pipeline_spark.sinks.lake import (
    BUCKET_COL,
    _HadoopFS,
    merge_upsert_bucketed,
)

STORE_KEY = "fingerprint"


def seed_fingerprint_store(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    batch_id: int = -1,
) -> None:
    """Initialize (or top up) the store from a document frame: one row per
    distinct fingerprint, canonical_id = min id that produced it.
    ``first_batch_id`` records ingest lineage (seeded history = -1) so a
    streaming gate can distinguish "seen in an EARLIER batch" from "merged
    by a crashed attempt of THIS batch" (see ``batch_id`` below)."""
    fps = (
        docs.select(
            F.md5(normalize_text(text_col)).alias(STORE_KEY),
            F.col(id_col).alias("canonical_id"),
        )
        .groupBy(STORE_KEY)
        .agg(F.min("canonical_id").alias("canonical_id"))
        .withColumn("first_batch_id", F.lit(batch_id).cast("bigint"))
    )
    merge_upsert_bucketed(
        spark,
        fps,
        store_path,
        keys=[STORE_KEY],
        order_col="canonical_id",
        n_buckets=n_buckets,
    )


def incremental_dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    batch_id: int | None = None,
) -> DataFrame:
    """Classify a new batch against the fingerprint store, then merge the
    batch's novel fingerprints in.

    Output per batch row: ``doc_id``, ``fingerprint``, ``status`` —
    ``dup_of_store`` (content already ingested in a prior batch),
    ``dup_in_batch`` (first seen in THIS batch but not this row), or
    ``novel`` (this row is the batch-canonical first sighting).

    ``batch_id`` (streaming gate): when given, a store row counts as
    "prior" only if its ``first_batch_id`` is STRICTLY EARLIER. This makes
    classification replay-idempotent under at-least-once delivery: if a
    run crashed after the store merge but before the output committed, the
    replay of the same micro-batch sees its own fingerprints in the store
    with ``first_batch_id == batch_id`` and still classifies them
    novel/dup_in_batch exactly as the first attempt did. ``None`` keeps
    plain presence semantics for one-shot batch jobs.

    100 TB posture: the lookup join reads only the store buckets the batch
    hashes into (partition-pruned scan on the bucket column); the store
    update rewrites only those buckets. The batch never shuffles against
    the full store.
    """
    fs = _HadoopFS(spark, store_path)
    fp = batch.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text(text_col)).alias(STORE_KEY),
    )
    from stock_market_data_pipeline_spark.sinks.lake import _bucket_expr

    fp = fp.withColumn(BUCKET_COL, _bucket_expr([STORE_KEY], n_buckets))
    has_store = fs.is_dir(store_path) and any(
        n.startswith(f"{BUCKET_COL}=") for n in fs.child_names(store_path)
    )
    if has_store:
        touched = sorted(
            r[0] for r in fp.select(BUCKET_COL).distinct().collect()
        )
        store = (
            spark.read.parquet(store_path)
            .filter(F.col(BUCKET_COL).isin(touched))
            .select(STORE_KEY, F.col("first_batch_id").alias("_store_batch"))
        )
        looked = fp.join(store, STORE_KEY, "left")
    else:
        looked = fp.withColumn("_store_batch", F.lit(None).cast("bigint"))
    prior = (
        F.col("_store_batch") < batch_id
        if batch_id is not None
        else F.col("_store_batch").isNotNull()
    )
    batch_min = fp.groupBy(STORE_KEY).agg(F.min("doc_id").alias("_bmin"))
    classified = (
        looked.join(batch_min, STORE_KEY)
        .select(
            "doc_id",
            STORE_KEY,
            F.when(prior, F.lit("dup_of_store"))
            .when(F.col("doc_id") == F.col("_bmin"), F.lit("novel"))
            .otherwise(F.lit("dup_in_batch"))
            .alias("status"),
        )
        # Pin the pre-merge classification: the merge below rewrites the very
        # store files this lazy plan reads.
        .localCheckpoint(eager=True)
    )
    novel = (
        classified.filter(F.col("status") == "novel")
        .select(
            STORE_KEY,
            F.col("doc_id").alias("canonical_id"),
            F.lit(-1 if batch_id is None else batch_id)
            .cast("bigint")
            .alias("first_batch_id"),
        )
    )
    merge_upsert_bucketed(
        spark,
        novel,
        store_path,
        keys=[STORE_KEY],
        order_col="canonical_id",
        n_buckets=n_buckets,
    )
    return classified
