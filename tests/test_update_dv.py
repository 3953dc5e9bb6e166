"""Row-level UPDATE via deletion vectors (X150,
sinks/manifest_lake.py update_where_dv): matched rows' old positions
land in the DV sidecar AND the post-SET rows append as new files in one
atomic commit — no data file rewritten, O(matched rows) cost, Delta's
DV-backed UPDATE shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    IdentityAssignmentError,
    add_generated_column,
    add_identity_column,
    add_table_constraint,
    append_files,
    delete_keys_dv,
    describe_manifest,
    manifest_files,
    merge_upsert_manifest,
    publish_files,
    purge_deletion_vectors,
    read_manifest,
    read_manifest_changes,
    update_where_dv,
)
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    ConstraintViolationError,
)


def _df(spark, lo, hi):
    rows = [(k, k % 7, float(k), f"v{k}") for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, g long, x double, s string")


def test_update_appends_postimage_without_rewriting_files(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = publish_files(
        spark, _df(spark, 0, 100).repartitionByRange(4, "k"), root,
        stats_cols=["k"],
    )
    before = {e["name"] for e in manifest_files(spark, root)}
    out = update_where_dv(spark, root, {"x": "x + 1000"}, "g = 3")
    n = sum(1 for k in range(100) if k % 7 == 3)
    assert out["updated_rows"] == n
    assert out["new_files"] >= 1
    assert out["dv_rows"] == n
    assert out["version"] == v1 + 1
    # every pre-update file survives by reference; only postimage files add
    after = {e["name"] for e in manifest_files(spark, root)}
    assert before <= after
    assert len(after) == len(before) + out["new_files"]
    got = read_manifest(spark, root)
    assert got.count() == 100  # an update never changes cardinality
    assert got.filter("g = 3 and x < 1000").count() == 0
    assert got.filter("g = 3 and x >= 1000").count() == n
    assert got.filter("g <> 3 and x >= 1000").count() == 0
    # time travel: pre-update version unchanged
    assert read_manifest(spark, root, version=v1).filter("x >= 1000").count() == 0


def test_update_is_simultaneous_and_casts_to_recorded_type(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)
    # simultaneous: swap g and k via one projection over OLD values
    update_where_dv(spark, root, {"g": "k", "k": "g"}, "k = 8")
    got = read_manifest(spark, root).filter("g = 8").collect()
    assert len(got) == 1 and got[0]["k"] == 8 % 7
    # SET result casts to the recorded column type (x is double)
    update_where_dv(spark, root, {"x": "CAST(7 AS INT)"}, "k = 0 and g = 0")
    [r] = read_manifest(spark, root).filter("k = 0 and g = 0").collect()
    assert isinstance(r["x"], float) and r["x"] == 7.0
    sch = {f.name: f.dataType.simpleString()
           for f in read_manifest(spark, root).schema.fields}
    assert sch == {"k": "bigint", "g": "bigint", "x": "double", "s": "string"}


def test_update_rerun_noop_and_txn_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 30), root)
    first = update_where_dv(spark, root, {"g": "99"}, "g = 2")
    assert first["updated_rows"] == 4
    # matches run on the DV-applied read: the postimage no longer matches
    again = update_where_dv(spark, root, {"g": "99"}, "g = 2")
    assert again["updated_rows"] == 0
    assert again["version"] == first["version"]  # no empty commit
    replay = update_where_dv(
        spark, root, {"g": "123"}, "g = 99", txn_id=("job", 1)
    )
    noop = update_where_dv(
        spark, root, {"g": "456"}, "g = 123", txn_id=("job", 1)
    )
    assert noop["updated_rows"] == 0 and noop["version"] == replay["version"]
    assert read_manifest(spark, root).filter("g = 456").count() == 0
    assert read_manifest(spark, root).filter("g = 123").count() == 4


def test_update_refuses_generated_identity_unknown_and_recomputes(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    df = _df(spark, 0, 20).withColumn("g2", F.col("g") * 2)
    publish_files(spark, df, root)
    add_generated_column(spark, root, "g2", "g * 2")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        update_where_dv(spark, root, {"g2": "1"}, "k = 1")
    with pytest.raises(KeyError, match="no such column"):
        update_where_dv(spark, root, {"nope": "1"}, "k = 1")
    # updating the SOURCE column recomputes the rule on the postimage
    update_where_dv(spark, root, {"g": "g + 100"}, "k = 1")
    [r] = read_manifest(spark, root).filter("k = 1").collect()
    assert r["g2"] == r["g"] * 2 and r["g"] >= 100
    # identity: rides along unchanged, refused as a SET target
    root2 = str(tmp_path / "t2")
    publish_files(
        spark,
        spark.createDataFrame([], "id long, v string"),
        root2,
    )
    add_identity_column(spark, root2, "id")
    append_files(
        spark, spark.createDataFrame([("a",), ("b",)], "v string"), root2
    )
    with pytest.raises(IdentityAssignmentError):
        update_where_dv(spark, root2, {"id": "id + 1"}, "v = 'a'")
    ids_before = {r["id"] for r in read_manifest(spark, root2).collect()}
    update_where_dv(spark, root2, {"v": "upper(v)"}, "v = 'a'")
    got = read_manifest(spark, root2)
    assert {r["id"] for r in got.collect()} == ids_before
    assert got.filter("v = 'A'").count() == 1


def test_update_gated_by_check_constraints(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)
    add_table_constraint(spark, root, "x_nonneg", "x >= 0")
    v = describe_manifest(spark, root)["version"]
    with pytest.raises(ConstraintViolationError):
        update_where_dv(spark, root, {"x": "-1.0"}, "k = 3")
    assert describe_manifest(spark, root)["version"] == v
    assert read_manifest(spark, root).filter("x < 0").count() == 0


def test_update_on_bucketed_table_keeps_bucket_discipline(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 200), root, keys=["k"], order_col="g",
        n_buckets=8,
    )
    update_where_dv(spark, root, {"s": "'updated'"}, "g = 5")
    # postimage files carry bucket tags — keyed maintenance stays pruned
    new = [e for e in manifest_files(spark, root) if "bucket" in e]
    assert all(e.get("bucket") is not None for e in new)
    keys_df = spark.createDataFrame([(3,), (10,)], "k long")
    out = delete_keys_dv(spark, keys_df, root, keys=["k"], n_buckets=8)
    assert out["deleted_rows"] == 2
    got = read_manifest(spark, root)
    assert got.count() == 198
    assert got.filter("g = 5 and s <> 'updated'").count() == 0


def test_update_cdf_emits_pre_and_postimages(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = publish_files(spark, _df(spark, 0, 40), root)
    out = update_where_dv(spark, root, {"x": "x * -1"}, "g = 1")
    feed = read_manifest_changes(spark, root, v1, out["version"], keys=["k"])
    pre = feed.filter("change_type = 'update_preimage'")
    post = feed.filter("change_type = 'update_postimage'")
    n = sum(1 for k in range(40) if k % 7 == 1)
    assert pre.count() == n and post.count() == n
    assert pre.filter("x < 0").count() == 0
    assert post.filter("x >= 0").count() == 0
    assert feed.filter(
        "change_type not in ('update_preimage','update_postimage')"
    ).count() == 0


def test_update_then_purge_materializes(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(
        spark, _df(spark, 0, 60).repartitionByRange(3, "k"), root,
        stats_cols=["k"],
    )
    update_where_dv(
        spark, root, {"s": "concat(s, '!')"}, "k < 10",
        ranges={"k": (0, 9)},
    )
    out = purge_deletion_vectors(spark, root)
    assert out["files_rewritten"] >= 1
    assert describe_manifest(spark, root)["dv"] is None
    got = read_manifest(spark, root)
    assert got.count() == 60
    assert got.filter("k < 10 and s not like '%!'").count() == 0
    assert got.filter("k >= 10 and s like '%!'").count() == 0


def test_update_on_shallow_clone_stays_zero_copy(spark, tmp_path):
    """X150 x X146: updating a shallow clone DVs positions in files it
    references from the SOURCE's data dir (per-entry base) and stages
    postimages in its OWN dir — the source table's files and rows are
    untouched, and the clone's readChangeFeed stream emits the update
    from the clone's own commit metadata."""
    import glob
    import os

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        clone_manifest,
    )
    from stock_market_data_pipeline_spark.streaming.manifest_source import (
        ManifestStreamDataSource,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    publish_files(spark, _df(spark, 0, 50), src)
    src_files_before = sorted(glob.glob(f"{src}/data/*"))
    v_clone = clone_manifest(spark, src, dst)
    out = update_where_dv(spark, dst, {"x": "x + 500"}, "g = 4")
    n = sum(1 for k in range(50) if k % 7 == 4)
    assert out["updated_rows"] == n
    # source bytes and rows untouched
    assert sorted(glob.glob(f"{src}/data/*")) == src_files_before
    assert read_manifest(spark, src).filter("x >= 500").count() == 0
    # clone sees the update; postimage bytes live in the CLONE's dir
    got = read_manifest(spark, dst)
    assert got.count() == 50
    assert got.filter("g = 4 and x < 500").count() == 0
    staged = [
        f for f in os.listdir(f"{dst}/data")
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    assert len(staged) == out["new_files"]
    # the clone's change feed streams its own update commit
    spark.dataSource.register(ManifestStreamDataSource)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", dst)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(v_clone))
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    feed = spark.read.parquet(sink)
    assert feed.count() == 2 * n
    assert feed.filter(
        "change_type = 'update_preimage' and x >= 500"
    ).count() == 0
    assert feed.filter(
        "change_type = 'update_postimage' and x < 500"
    ).count() == 0


def test_update_refuses_incremental_read_across_it(spark, tmp_path):
    """X150 x X130: the append-only incremental reader must refuse a
    range containing an UPDATE_DV commit — visible rows changed without
    an append-only explanation; the change feed is the right consumer."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        read_manifest_incremental,
    )

    root = str(tmp_path / "t")
    v1 = publish_files(spark, _df(spark, 0, 20), root)
    out = update_where_dv(spark, root, {"g": "g + 50"}, "k < 5")
    with pytest.raises(ValueError):
        read_manifest_incremental(spark, root, v1, out["version"]).count()
