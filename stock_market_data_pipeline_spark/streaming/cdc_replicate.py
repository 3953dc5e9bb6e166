"""Manifest-to-manifest CDC replication (X152): a readChangeFeed stream
over a source manifest table applied continuously to a replica table —
the lakehouse "materialized replica" story, end-to-end exactly-once.

The composition is three existing pieces, each already scale-audited:

* the X151 ``readChangeFeed`` stream source plans each source commit
  from metadata (added files + DV-sidecar deltas) — O(changed rows);
* ``merge_upsert_manifest`` applies inserts/update-postimages at
  O(touched buckets) with last-writer-wins on ``commit_version``;
* ``delete_keys_manifest`` removes deleted keys at O(touched buckets).

Exactly-once rides TWO cooperating idempotence layers, the same pair
Delta recommends for foreachBatch sinks: the stream checkpoint replays
a failed micro-batch with the SAME batch_id and contents (version-range
offsets over immutable files), and both table writes carry
``txn_id=(app, batch_id)`` watermarks, so the replayed half of a
crashed batch no-ops while the unapplied half lands. Merge and delete
use DISTINCT txn apps — a crash between them replays the batch, the
merge watermark short-circuits, and only the missing delete applies.

Within one micro-batch a key may change several times (insert at v2,
update at v3, delete at v4 when the trigger spans commits): the
handler folds the feed to each key's FINAL state by ``commit_version``
before touching the replica — preimages are dropped, the winner per
key is the highest-version change (at equal versions the insert
outranks the delete: a replaceWhere commit's uncancelled feed emits
both for an identically-restated key, and its net effect is the
insert), delete winners leave, everything else merges. The replica carries the winning ``commit_version`` as its
merge order column (``_cdc_version``), which is also what makes a
REPLAYED apply idempotent at the row level: last-writer-wins can never
regress a newer replica row to an older image.

At 100 TB: the stream moves only changed rows, the replica writes only
touched buckets, and nothing in the path is O(table) — the replica's
first batch (the source's full history at ``startingVersion=0``) is
the one deliberately table-sized step, exactly like Delta's initial
snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CDC_VERSION = "_cdc_version"


def apply_changefeed_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    dst_root: str,
    keys: list[str],
    n_buckets: int = 64,
    app_id: str = "cdc-replicate",
) -> dict[str, int]:
    """Apply one micro-batch of change-feed rows to the replica table.
    Exposed separately from the stream wiring so batch backfills and
    tests drive the same code — the batch feed that fits is
    ``read_manifest_table_changes`` (X155), whose output carries the
    ``commit_version`` the fold orders by (the endpoint diff's output
    deliberately lacks it). Returns ``{"upserted", "deleted"}``
    (post-fold winner counts)."""
    from pyspark.sql import Window
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_keys_manifest,
        merge_upsert_manifest,
    )

    # reserved working names, guarded LOUDLY like the feed APIs guard
    # change_type/commit_version (r18 advice): a source column named
    # _cdc_rank/_cdc_dup would be silently overwritten and dropped by
    # the fold's working columns (corrupting the fold), and
    # _cdc_version is the replica's merge-order column (the rename
    # below would collide)
    reserved = {"_cdc_rank", "_cdc_dup", _CDC_VERSION} & set(batch.columns)
    if reserved:
        raise ValueError(
            f"apply_changefeed_batch: feed columns {sorted(reserved)} "
            "collide with the replica's reserved working columns — "
            "rename them on the source (the fold would silently "
            "clobber their values)"
        )
    # ONE pass computes the fold AND the key-uniqueness audit (r19: the
    # former separate dup-check aggregate re-evaluated the whole
    # micro-batch input before the fold read it again):
    #
    # * fold to each key's FINAL state — drop preimages, keep the
    #   highest-commit_version change per key. Keyed commits emit at
    #   most one non-preimage change per key per version, but a
    #   replaceWhere commit's UNCANCELLED feed (X154) emits delete AND
    #   insert for an identically-restated key at the SAME version —
    #   the commit's net effect is delete-then-insert, so at equal
    #   versions the insert/postimage outranks the delete (without the
    #   tiebreak the fold could arbitrarily pick the delete and drop a
    #   live row from the replica);
    # * audit: a source commit staging the same key twice (replaceWhere
    #   has no key contract) puts >1 insert/postimage at one
    #   (key, commit_version) — folding that would pick an arbitrary
    #   winner, so the batch must refuse loudly BEFORE touching the
    #   replica (r17 review). The per-(key, version) count rides a
    #   window over the same key clustering and the winner row carries
    #   its key's max, checked on the pinned fold output below.
    non_pre = batch.filter(
        F.col("change_type") != "update_preimage"
    ).withColumn(
        "_cdc_rank",
        F.when(F.col("change_type") == "delete", F.lit(0))
        .otherwise(F.lit(1)),
    )
    w_dup = Window.partitionBy(*keys, "commit_version")
    w_key = Window.partitionBy(*keys)
    w_ord = w_key.orderBy(
        F.col("commit_version").desc(), F.col("_cdc_rank").desc()
    )
    winners = (
        non_pre.withColumn(
            "_cdc_dup0", F.sum(F.col("_cdc_rank")).over(w_dup)
        )
        .withColumn("_cdc_dup", F.max(F.col("_cdc_dup0")).over(w_key))
        .withColumn("_rn", F.row_number().over(w_ord))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_cdc_rank", "_cdc_dup0")
        .localCheckpoint(eager=True)
    )
    if winners.filter(F.col("_cdc_dup") > 1).limit(1).count():
        raise ValueError(
            "apply_changefeed_batch: the change feed carries more than "
            "one insert/postimage for a single key within one commit — "
            "the source table violates key uniqueness on "
            f"{keys} (a replaceWhere staging duplicate keys?); a keyed "
            "replica of a non-keyed source is undefined"
        )
    winners = winners.drop("_cdc_dup")
    # two passes (split + apply) must see the same winners — pinned
    # above; batch-sized by the change-feed contract
    dels = winners.filter(F.col("change_type") == "delete")
    ups = (
        winners.filter(F.col("change_type") != "delete")
        .withColumnRenamed("commit_version", _CDC_VERSION)
        .drop("change_type")
    )
    # one count job over the pinned winners instead of two
    by_type = {
        bool(r["_is_del"]): int(r["n"])
        for r in winners.groupBy(
            (F.col("change_type") == "delete").alias("_is_del")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_up = by_type.get(False, 0)
    n_del = by_type.get(True, 0)
    if n_up:
        merge_upsert_manifest(
            spark, ups, dst_root, keys=keys, order_col=_CDC_VERSION,
            n_buckets=n_buckets, txn_id=(f"{app_id}-m", int(batch_id)),
        )
    if n_del:
        try:
            delete_keys_manifest(
                spark, dels.select(*keys), dst_root, keys=keys,
                n_buckets=n_buckets, txn_id=(f"{app_id}-d", int(batch_id)),
            )
        except FileNotFoundError:
            if n_up:
                raise  # merge just committed — a missing table is a bug
            # replica has no committed version yet (every key in this
            # batch was inserted AND deleted within it): deleting from
            # an empty replica is a no-op, not an error
    return {"upserted": n_up, "deleted": n_del}


def replicate_changefeed(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    keys: list[str],
    checkpoint: str,
    n_buckets: int = 64,
    starting_version: int = 0,
    app_id: str = "cdc-replicate",
    timeout: int = 300,
) -> None:
    """Run one availableNow replication pass: stream the source's
    change feed from the checkpoint's position (or
    ``starting_version`` on first run) and fold it into the replica.
    Call repeatedly (cron-style) or swap the trigger for a continuous
    deployment — the checkpoint + txn watermarks make either shape
    exactly-once. Raises on timeout instead of leaving a half-applied
    sink unreported."""
    from stock_market_data_pipeline_spark.streaming.manifest_source import (
        ManifestStreamDataSource,
    )

    spark.dataSource.register(ManifestStreamDataSource)

    def _handle(batch: DataFrame, batch_id: int) -> None:
        apply_changefeed_batch(
            batch.sparkSession, batch, batch_id, dst_root, keys,
            n_buckets=n_buckets, app_id=app_id,
        )

    q = (
        spark.readStream.format("manifest_stream")
        .option("path", src_root)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
        .load()
        .writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"cdc replication {src_root} -> {dst_root} still running "
            f"after {timeout}s — partial state is retry-safe (txn "
            "watermarks), but this pass did not complete"
        )
