"""Manifest-to-manifest CDC replication (X152,
streaming/cdc_replicate.py): the readChangeFeed stream folds into a
replica table via merge/delete with per-batch txn watermarks —
exactly-once end to end, convergent under replay and crash-retry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    append_files,
    delete_where_dv,
    manifest_history,
    publish_files,
    read_manifest,
    update_where_dv,
)
from stock_market_data_pipeline_spark.streaming.cdc_replicate import (
    apply_changefeed_batch,
    replicate_changefeed,
)


def _df(spark, lo, hi):
    rows = [(k, k % 5, float(k)) for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, g long, x double")


def _state(spark, root, drop_cdc=True):
    df = read_manifest(spark, root)
    if drop_cdc and "_cdc_version" in df.columns:
        df = df.drop("_cdc_version")
    return {(r["k"], r["g"], r["x"]) for r in df.collect()}


def test_replicate_converges_and_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    publish_files(spark, _df(spark, 0, 40), src)                     # v1
    append_files(spark, _df(spark, 100, 120), src)                   # v2
    update_where_dv(spark, src, {"x": "x + 0.25"}, "g = 1")          # v3
    delete_where_dv(spark, src, "g = 3")                             # v4

    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    assert _state(spark, dst) == _state(spark, src)
    versions_after_first = len(manifest_history(spark, dst))

    # replay with no new source commits: zero new replica versions
    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    assert len(manifest_history(spark, dst)) == versions_after_first
    assert _state(spark, dst) == _state(spark, src)

    # incremental: further source commits converge on the next pass
    update_where_dv(spark, src, {"x": "x * 2"}, "g = 2")             # v5
    delete_where_dv(spark, src, "k >= 110")                          # v6
    append_files(spark, _df(spark, 200, 205), src)                   # v7
    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    assert _state(spark, dst) == _state(spark, src)


def test_apply_batch_folds_to_final_state_per_key(spark, tmp_path):
    dst = str(tmp_path / "dst")
    feed = spark.createDataFrame(
        [
            # k=1: insert then updated -> final x=9.0 (preimage ignored)
            (1, 0, 1.0, "insert", 2),
            (1, 0, 1.0, "update_preimage", 3),
            (1, 0, 9.0, "update_postimage", 3),
            # k=2: insert then deleted within the batch -> absent
            (2, 1, 2.0, "insert", 2),
            (2, 1, 2.0, "delete", 4),
            # k=3: plain insert
            (3, 2, 3.0, "insert", 2),
        ],
        "k long, g long, x double, change_type string, commit_version long",
    )
    out = apply_changefeed_batch(spark, feed, 0, dst, keys=["k"])
    assert out == {"upserted": 2, "deleted": 1}
    assert _state(spark, dst) == {(1, 0, 9.0), (3, 2, 3.0)}


def test_apply_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-retry shape: the same batch_id re-applies after a crash
    between the merge and the delete — the merge watermark no-ops, the
    delete lands, and a FULL replay changes nothing."""
    dst = str(tmp_path / "dst")
    feed1 = spark.createDataFrame(
        [(1, 0, 1.0, "insert", 2), (2, 1, 2.0, "insert", 2)],
        "k long, g long, x double, change_type string, commit_version long",
    )
    apply_changefeed_batch(spark, feed1, 0, dst, keys=["k"])
    v0 = len(manifest_history(spark, dst))
    # full replay of batch 0: both watermarks short-circuit
    apply_changefeed_batch(spark, feed1, 0, dst, keys=["k"])
    assert len(manifest_history(spark, dst)) == v0
    assert _state(spark, dst) == {(1, 0, 1.0), (2, 1, 2.0)}
    # batch 1 deletes k=2 and restates k=1; replaying batch 1 no-ops too
    feed2 = spark.createDataFrame(
        [
            (1, 0, 5.0, "update_postimage", 3),
            (2, 1, 2.0, "delete", 4),
        ],
        "k long, g long, x double, change_type string, commit_version long",
    )
    apply_changefeed_batch(spark, feed2, 1, dst, keys=["k"])
    v1 = len(manifest_history(spark, dst))
    apply_changefeed_batch(spark, feed2, 1, dst, keys=["k"])
    assert len(manifest_history(spark, dst)) == v1
    assert _state(spark, dst) == {(1, 0, 5.0)}
    # an OLDER image replayed out of order can never regress the row
    # (last-writer-wins on _cdc_version)
    stale = spark.createDataFrame(
        [(1, 0, 1.0, "insert", 2)],
        "k long, g long, x double, change_type string, commit_version long",
    )
    apply_changefeed_batch(spark, stale, 2, dst, keys=["k"])
    assert _state(spark, dst) == {(1, 0, 5.0)}


def test_first_batch_all_inserted_then_deleted(spark, tmp_path):
    """Every key inserted AND deleted inside the first batch: the
    replica never commits a version and the delete is a clean no-op."""
    dst = str(tmp_path / "dst")
    feed = spark.createDataFrame(
        [(1, 0, 1.0, "insert", 2), (1, 0, 1.0, "delete", 3)],
        "k long, g long, x double, change_type string, commit_version long",
    )
    out = apply_changefeed_batch(spark, feed, 0, dst, keys=["k"])
    assert out == {"upserted": 0, "deleted": 1}
    with pytest.raises(FileNotFoundError):
        read_manifest(spark, dst)


def test_replicate_merge_maintained_source_with_sidecars(spark, tmp_path):
    """X152 x X153: with the source's change_feed property on, a
    merge/key-delete-maintained source streams its sidecars and the
    replica converges — the composition that makes the replica work
    for tables maintained by MERGE, not just append/DV writers."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_keys_manifest,
        enable_change_feed,
        merge_upsert_manifest,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    base = _df(spark, 0, 30).withColumn("seq", F.lit(0))
    merge_upsert_manifest(
        spark, base, src, keys=["k"], order_col="seq", n_buckets=4,
    )                                                                # v1
    enable_change_feed(spark, src)                                   # v2
    upd = (
        _df(spark, 0, 5)
        .withColumn("x", F.col("x") + 100.0)
        .withColumn("seq", F.lit(1))
    )
    merge_upsert_manifest(
        spark, upd, src, keys=["k"], order_col="seq", n_buckets=4,
    )                                                                # v3
    delete_keys_manifest(
        spark, spark.createDataFrame([(7,), (8,)], "k long"), src,
        keys=["k"], n_buckets=4,
    )                                                                # v4

    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    src_rows = {
        (r["k"], r["g"], r["x"], r["seq"])
        for r in read_manifest(spark, src).collect()
    }
    dst_rows = {
        (r["k"], r["g"], r["x"], r["seq"])
        for r in read_manifest(spark, dst).drop("_cdc_version").collect()
    }
    assert dst_rows == src_rows
    assert len(dst_rows) == 28


def test_replicate_across_replace_where_uncancelled_feed(spark, tmp_path):
    """X152 x X154: a replaceWhere-maintained source streams its
    UNCANCELLED sidecar (identically-restated keys emit delete AND
    insert at the SAME commit_version). The fold's equal-version
    tiebreak must pick the insert — without it the replica could drop
    a live row — and the replica converges to the source exactly."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        enable_change_feed,
        replace_where_manifest,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    publish_files(spark, _df(spark, 0, 40), src)                     # v1
    enable_change_feed(spark, src)                                   # v2
    # restate k in [0, 20): k=0..4 keep IDENTICAL values (the
    # tiebreak probe), k=5..14 change x, k=15..19 vanish
    incoming = _df(spark, 0, 15).withColumn(
        "x",
        F.when(F.col("k") < 5, F.col("x")).otherwise(F.col("x") + 50.0),
    )
    replace_where_manifest(spark, incoming, src, "k", 0, 19)         # v3

    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    assert _state(spark, dst) == _state(spark, src)
    # the identically-restated keys survived the delete+insert pair
    assert {
        r["k"] for r in read_manifest(spark, dst)
        .filter(F.col("k") < 5).collect()
    } == {0, 1, 2, 3, 4}
    # the vanished slice is gone
    assert read_manifest(spark, dst).filter(
        (F.col("k") >= 15) & (F.col("k") < 20)
    ).count() == 0

    # a further replaceWhere on the next pass converges too
    replace_where_manifest(
        spark, _df(spark, 30, 35).withColumn("x", F.lit(-1.0)),
        src, "k", 30, 39,
    )                                                                # v4
    replicate_changefeed(spark, src, dst, keys=["k"], checkpoint=ckpt)
    assert _state(spark, dst) == _state(spark, src)


def test_fold_tiebreak_insert_outranks_delete_at_equal_version(
    spark, tmp_path
):
    """Direct probe of the equal-version fold: a batch carrying BOTH a
    delete and an insert for one key at the same commit_version (the
    replaceWhere uncancelled pair) must apply the insert."""
    dst = str(tmp_path / "dst")
    batch = spark.createDataFrame(
        [
            (1, 0, 1.0, "delete", 3),
            (1, 0, 1.0, "insert", 3),
            (2, 0, 2.0, "insert", 3),
            (2, 0, 2.0, "delete", 3),  # input order must not matter
        ],
        "k long, g long, x double, change_type string, "
        "commit_version long",
    )
    r = apply_changefeed_batch(spark, batch, 0, dst, keys=["k"])
    assert r == {"upserted": 2, "deleted": 0}
    assert _state(spark, dst) == {(1, 0, 1.0), (2, 0, 2.0)}


def test_duplicate_key_feed_is_refused(spark, tmp_path):
    """r17 review: replaceWhere has no key contract, so a source can
    stage the same key twice — its feed then carries two inserts for
    one key at one commit_version, and a silent arbitrary-winner fold
    would let the replica diverge. The apply refuses loudly."""
    dst = str(tmp_path / "dst")
    batch = spark.createDataFrame(
        [
            (1, 0, 1.0, "insert", 3),
            (1, 0, 99.0, "insert", 3),  # duplicate key, same commit
        ],
        "k long, g long, x double, change_type string, "
        "commit_version long",
    )
    with pytest.raises(ValueError, match="key uniqueness"):
        apply_changefeed_batch(spark, batch, 0, dst, keys=["k"])


def test_reserved_working_columns_are_refused(spark, tmp_path):
    """r18 advice: a feed column named _cdc_rank was silently
    overwritten (and dropped) by the fold's tiebreak helper —
    corrupting the fold — and _cdc_version collides with the replica's
    merge-order column. Both now raise loudly, matching the feed APIs'
    change_type/commit_version guards."""
    dst = str(tmp_path / "dst")
    for col in ("_cdc_rank", "_cdc_version"):
        batch = spark.createDataFrame(
            [(1, 1.0, 7, "insert", 3)],
            f"k long, x double, `{col}` long, change_type string, "
            "commit_version long",
        )
        with pytest.raises(ValueError, match="reserved working"):
            apply_changefeed_batch(spark, batch, 0, dst, keys=["k"])
