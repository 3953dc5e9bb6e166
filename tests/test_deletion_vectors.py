"""Deletion vectors (X143, sinks/manifest_lake.py delete_where_dv /
purge_deletion_vectors): merge-on-read deletes — matching row positions
land in a sidecar, no data file is rewritten, every read path subtracts
them, maintenance rewrites materialize them, and purge retires them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    compact_manifest,
    delete_where_dv,
    describe_manifest,
    manifest_files,
    publish_files,
    purge_deletion_vectors,
    read_manifest,
    read_manifest_changes,
    read_manifest_incremental,
    read_manifest_pruned,
    vacuum_manifest,
)


def _df(spark, lo, hi):
    rows = [(k, k % 7, f"v{k}") for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, g long, s string")


def test_dv_delete_hides_rows_without_rewriting_files(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = publish_files(
        spark, _df(spark, 0, 100).repartitionByRange(4, "k"), root,
        stats_cols=["k"],
    )
    before = {e["name"] for e in manifest_files(spark, root)}
    out = delete_where_dv(spark, root, "g = 3")
    expect_deleted = sum(1 for k in range(100) if k % 7 == 3)
    assert out["deleted_rows"] == expect_deleted
    assert out["version"] == v1 + 1
    # merge-on-read: the file set is IDENTICAL — no rewrite happened
    after = {e["name"] for e in manifest_files(spark, root)}
    assert after == before
    got = read_manifest(spark, root)
    assert got.count() == 100 - expect_deleted
    assert got.filter("g = 3").count() == 0
    # time travel: the pre-delete version still sees every row
    assert read_manifest(spark, root, version=v1).count() == 100
    d = describe_manifest(spark, root)
    assert d["dv"] == {"rows": expect_deleted}


def test_dv_accumulates_and_rededelete_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 50), root)
    first = delete_where_dv(spark, root, "k < 10")
    assert first["deleted_rows"] == 10
    # same predicate again: matches are computed on the DV-applied read
    again = delete_where_dv(spark, root, "k < 10")
    assert again["deleted_rows"] == 0
    # a 0-match delete without txn_id commits nothing
    assert again["version"] == first["version"]
    second = delete_where_dv(spark, root, "k >= 45")
    assert second["deleted_rows"] == 5
    assert second["dv_rows"] == 15
    assert read_manifest(spark, root).count() == 35
    assert {r[0] for r in read_manifest(spark, root).select("k").collect()} \
        == set(range(10, 45))


def test_dv_txn_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 20), root)
    out1 = delete_where_dv(spark, root, "k = 5", txn_id=("job", 1))
    replay = delete_where_dv(spark, root, "k = 7", txn_id=("job", 1))
    assert replay["deleted_rows"] == 0
    assert replay["version"] == out1["version"]
    assert read_manifest(spark, root).filter("k = 7").count() == 1


def test_dv_range_pruned_delete_and_pruned_reads_apply_dv(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(
        spark, _df(spark, 0, 100).repartitionByRange(4, "k"), root,
        stats_cols=["k"],
    )
    out = delete_where_dv(
        spark, root, "k % 2 = 0", ranges={"k": (0, 24)}
    )
    # only rows inside the pruned scan window can match
    assert out["deleted_rows"] == 13  # evens in [0, 24]
    pruned = read_manifest_pruned(spark, root, "k", 0, 30)
    assert pruned.filter("k % 2 = 0 and k <= 24").count() == 0
    assert pruned.filter("k % 2 = 0 and k > 24").count() > 0
    full = read_manifest(spark, root)
    assert full.count() == 87


def test_maintenance_rewrite_materializes_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    # many small files so compaction packs them
    publish_files(spark, _df(spark, 0, 80).repartition(8), root)
    delete_where_dv(spark, root, "g = 1")
    expect = read_manifest(spark, root).count()
    before = {e["name"] for e in manifest_files(spark, root)}
    out = compact_manifest(spark, root, target_file_bytes=1 << 30)
    assert out["compacted"] == 8
    # rewritten files physically exclude the deleted rows: read them RAW
    new_names = {
        e["name"] for e in manifest_files(spark, root)
    } - before
    raw = spark.read.parquet(
        *[f"{root}/data/{n}" for n in sorted(new_names)]
    )
    assert raw.filter("g = 1").count() == 0
    # and the manifest read is unchanged through the rewrite
    assert read_manifest(spark, root).count() == expect


def test_purge_rewrites_only_affected_files_and_drops_ref(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(
        spark, _df(spark, 0, 100).repartitionByRange(4, "k"), root,
        stats_cols=["k"],
    )
    # delete only from the low range: 3 of 4 files have no DV rows
    delete_where_dv(spark, root, "k < 10")
    before = {e["name"] for e in manifest_files(spark, root)}
    out = purge_deletion_vectors(spark, root)
    assert out["purged_files"] >= 1
    assert out["carried_files"] == 4 - out["purged_files"]
    after = {e["name"] for e in manifest_files(spark, root)}
    # unaffected files carry by reference (same physical names)
    assert len(before & after) == out["carried_files"]
    assert describe_manifest(spark, root)["dv"] is None
    got = read_manifest(spark, root)
    assert got.count() == 90
    assert got.filter("k < 10").count() == 0
    # idempotent: purging a DV-free table is a no-version no-op
    again = purge_deletion_vectors(spark, root)
    assert again["files_rewritten"] == 0
    assert again["version"] == out["version"]


def test_incremental_read_refuses_across_dv_change(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        append_files,
    )

    root = str(tmp_path / "t")
    v1 = publish_files(spark, _df(spark, 0, 20), root)
    v2 = delete_where_dv(spark, root, "k = 3")["version"]
    with pytest.raises(ValueError, match="deletion vectors changed"):
        read_manifest_incremental(spark, root, v1, v2)
    # appends AFTER the delete are still incrementally readable
    v3 = append_files(spark, _df(spark, 100, 110), root)
    inc = read_manifest_incremental(spark, root, v2, v3)
    assert inc.count() == 10


def test_cdf_emits_dv_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = publish_files(
        spark, _df(spark, 0, 40).repartitionByRange(4, "k"), root,
        stats_cols=["k"],
    )
    v2 = delete_where_dv(spark, root, "k in (5, 17, 33)")["version"]
    feed = read_manifest_changes(spark, root, v1, v2, keys=["k"])
    rows = {(r["k"], r["change_type"]) for r in feed.collect()}
    assert rows == {(5, "delete"), (17, "delete"), (33, "delete")}


def test_vacuum_keeps_dv_sidecar(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 30), root)
    delete_where_dv(spark, root, "k < 5")
    vacuum_manifest(spark, root, keep_versions=1, grace_seconds=0)
    # the retained version's DV still applies after GC
    assert read_manifest(spark, root).count() == 25
    d = describe_manifest(spark, root)
    assert d["dv"] == {"rows": 5}
    assert os.path.isdir(f"{root}/stats")


def test_stream_source_refuses_dv_table(spark, tmp_path):
    from stock_market_data_pipeline_spark.streaming.manifest_source import (
        ManifestStreamReader,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)
    v = delete_where_dv(spark, root, "k = 1")["version"]
    reader = ManifestStreamReader(root, read_manifest(spark, root).schema, {})
    with pytest.raises(ValueError, match="deletion vectors"):
        reader.partitions({"version": 0}, {"version": v})
    relaxed = ManifestStreamReader(
        root, read_manifest(spark, root).schema, {"ignorechanges": "true"}
    )
    assert relaxed.partitions({"version": 0}, {"version": v})


def test_dv_on_bucketed_table_and_keyed_maintenance(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_keys_manifest,
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 60), root, keys=["k"], order_col="g",
        n_buckets=8,
    )
    delete_where_dv(spark, root, "g = 2")
    expect = {
        k for k in range(60) if k % 7 != 2
    }
    got = {r[0] for r in read_manifest(spark, root).select("k").collect()}
    assert got == expect
    # keyed delete on a DV-carrying table: bucket rewrite materializes
    # the DV for touched buckets, carried buckets keep subtracting
    dk = spark.createDataFrame([(11,), (12,)], "k long")
    delete_keys_manifest(spark, dk, root, keys=["k"], n_buckets=8)
    got2 = {r[0] for r in read_manifest(spark, root).select("k").collect()}
    assert got2 == expect - {11, 12}


def test_dv_refused_on_csv_table(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root, fmt="csv")
    with pytest.raises(ValueError, match="parquet"):
        delete_where_dv(spark, root, "k = 1")


def test_delete_keys_dv_merge_on_read(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_keys_dv,
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 60), root, keys=["k"], order_col="g",
        n_buckets=8,
    )
    before = {e["name"] for e in manifest_files(spark, root)}
    dk = spark.createDataFrame([(3,), (41,), (59,)], "k long")
    out = delete_keys_dv(spark, dk, root, keys=["k"], n_buckets=8)
    assert out["deleted_rows"] == 3
    # merge-on-read: zero bucket files rewritten
    assert {e["name"] for e in manifest_files(spark, root)} == before
    got = {r[0] for r in read_manifest(spark, root).select("k").collect()}
    assert got == set(range(60)) - {3, 41, 59}
    # re-deleting the same keys matches nothing and commits nothing
    again = delete_keys_dv(spark, dk, root, keys=["k"], n_buckets=8)
    assert again["deleted_rows"] == 0
    assert again["version"] == out["version"]
    # a later keyed MERGE re-inserts a DV-deleted key as a fresh row
    # (the DV pins positions in OLD files; the rewrite of the touched
    # bucket materializes the delete, then the new row lands)
    merge_upsert_manifest(
        spark,
        spark.createDataFrame([(3, 99, "back")], "k long, g long, s string"),
        root, keys=["k"], order_col="g", n_buckets=8,
    )
    row = read_manifest(spark, root).filter("k = 3").collect()
    assert len(row) == 1 and row[0]["s"] == "back"
    # layout mismatch refused
    with pytest.raises(ValueError, match="bucketed"):
        delete_keys_dv(spark, dk, root, keys=["k"], n_buckets=16)


def test_delete_keys_dv_txn_replay(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_keys_dv,
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 20), root, keys=["k"], order_col="g",
        n_buckets=4,
    )
    dk1 = spark.createDataFrame([(1,)], "k long")
    out = delete_keys_dv(spark, dk1, root, keys=["k"], n_buckets=4,
                         txn_id=("job", 1))
    dk2 = spark.createDataFrame([(2,)], "k long")
    replay = delete_keys_dv(spark, dk2, root, keys=["k"], n_buckets=4,
                            txn_id=("job", 1))
    assert replay["deleted_rows"] == 0
    assert replay["version"] == out["version"]
    assert read_manifest(spark, root).filter("k = 2").count() == 1


def test_bloom_index_build_carries_all_extensions(spark, tmp_path):
    """Self-review r15: extra_meta is the new version's ONLY source of
    extension keys, and add_bloom_index passed a blooms-only literal —
    shedding the DV ref (resurrecting deleted rows), CHECK constraints
    and drop tombstones on every index build/reindex. Now spreads the
    full carry."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        add_bloom_index,
        add_table_constraint,
        drop_column,
        reindex_bloom,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 60).repartition(2), root)
    add_table_constraint(spark, root, "k_nonneg", "k >= 0")
    drop_column(spark, root, "s")
    delete_where_dv(spark, root, "g = 4")
    expect = read_manifest(spark, root).count()
    add_bloom_index(spark, root, "k", m=1 << 12)
    d = describe_manifest(spark, root)
    # every extension survived the index build
    assert d["constraints"] == {"k_nonneg": "k >= 0"}
    assert d["dropped_cols"] == ["s"]
    assert d["dv"] is not None
    assert read_manifest(spark, root).count() == expect
    assert read_manifest(spark, root).filter("g = 4").count() == 0
    # and survives a reindex too
    reindex_bloom(spark, root)
    assert describe_manifest(spark, root)["dv"] is not None
    assert read_manifest(spark, root).count() == expect
