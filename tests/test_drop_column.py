"""DROP COLUMN with resurrection tombstones (X145,
sinks/manifest_lake.py drop_column / purge_dropped_columns): the drop is
metadata-only, the name is tombstoned until the bytes are purged, and
re-adding it early is refused instead of resurrecting old values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    add_table_constraint,
    append_files,
    describe_manifest,
    drop_column,
    manifest_files,
    publish_files,
    purge_dropped_columns,
    read_manifest,
)


def _df(spark, lo, hi):
    rows = [(k, k % 7, f"v{k}") for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, g long, s string")


def test_drop_column_is_metadata_only_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = publish_files(spark, _df(spark, 0, 40).repartition(3), root)
    before = {e["name"] for e in manifest_files(spark, root)}
    v2 = drop_column(spark, root, "s")
    assert {e["name"] for e in manifest_files(spark, root)} == before
    got = read_manifest(spark, root)
    assert got.columns == ["k", "g"]
    assert got.count() == 40
    # prior versions keep their schema
    assert read_manifest(spark, root, version=v1).columns == ["k", "g", "s"]
    assert describe_manifest(spark, root)["dropped_cols"] == ["s"]
    assert v2 == v1 + 1


def test_dropped_name_is_tombstoned_until_purged(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 30).repartition(2), root)
    pre_drop = {e["name"] for e in manifest_files(spark, root)}
    drop_column(spark, root, "s")
    # appends WITHOUT the name are fine
    append_files(
        spark, spark.createDataFrame([(100, 2)], "k long, g long"), root
    )
    n_entries = len(manifest_files(spark, root))
    # re-adding the dropped name refuses: old files still hold bytes
    with pytest.raises(ValueError, match="resurrect"):
        append_files(spark, _df(spark, 200, 205), root)
    out = purge_dropped_columns(spark, root)
    # only the pre-drop files carry the column; the post-drop append
    # files are clean and carry by reference
    assert out["carried_files"] == n_entries - len(pre_drop)
    assert {e["name"] for e in manifest_files(spark, root)} & pre_drop         == set()
    assert describe_manifest(spark, root)["dropped_cols"] == []
    # name free again — and the resurrected-read hazard is GONE: the
    # re-added column is NULL for all pre-drop rows
    append_files(spark, _df(spark, 200, 203), root)
    got = read_manifest(spark, root)
    assert got.filter("k < 100 and s is not null").count() == 0
    assert got.filter("k >= 200 and s is null").count() == 0


def test_drop_refuses_bucket_key_and_constrained_column(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 20), root, keys=["k"], order_col="g",
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="bucketing key"):
        drop_column(spark, root, "k")
    add_table_constraint(spark, root, "g_nonneg", "g >= 0")
    with pytest.raises(ValueError, match="constraint"):
        drop_column(spark, root, "g")
    # the string column is unencumbered
    drop_column(spark, root, "s")
    assert read_manifest(spark, root).columns == ["k", "g"]


def test_drop_retires_bloom_index_and_full_replace_sheds_tombstone(
    spark, tmp_path
):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        add_bloom_index,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 50).repartition(2), root)
    add_bloom_index(spark, root, "s", m=1 << 12)
    assert describe_manifest(spark, root)["blooms"].get("s")
    drop_column(spark, root, "s")
    assert "s" not in describe_manifest(spark, root)["blooms"]
    # a full replace writes an all-new file set: no pre-drop bytes
    # survive, so the tombstone lifts and the name is reusable
    publish_files(spark, _df(spark, 0, 10), root)
    assert describe_manifest(spark, root)["dropped_cols"] == []
    assert read_manifest(spark, root).columns == ["k", "g", "s"]


def test_drop_last_column_and_missing_column_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(
        spark, spark.createDataFrame([(1,)], "k long"), root
    )
    with pytest.raises(ValueError, match="only column"):
        drop_column(spark, root, "k")
    with pytest.raises(KeyError):
        drop_column(spark, root, "nope")


def test_merge_respects_tombstones_and_evolution_guard(spark, tmp_path):
    """round-16 advice (high): merge_upsert_manifest must run the same
    _evolved_schema_json guard as append — a merge batch carrying a
    dropped column name would re-record the column while carried
    pre-drop bucket files still hold its old bytes (silent
    resurrection), and a same-name type conflict would record a schema
    the carried buckets violate."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, k % 7, f"v{k}", k * 10) for k in range(0, 40)],
        "k long, g long, s string, ord long",
    )
    merge_upsert_manifest(spark, base, root, keys=["k"], order_col="ord")
    drop_column(spark, root, "s")
    # a merge batch re-introducing the dropped name is refused BEFORE
    # any bucket is rewritten (the same contract as append)
    v_files = {e["name"] for e in manifest_files(spark, root)}
    bad = spark.createDataFrame(
        [(1, 1, "ghost", 999)], "k long, g long, s string, ord long"
    )
    with pytest.raises(ValueError, match="resurrect"):
        merge_upsert_manifest(spark, bad, root, keys=["k"], order_col="ord")
    assert {e["name"] for e in manifest_files(spark, root)} == v_files
    # same-name type conflict refused (would record a schema half the
    # carried files violate)
    conflict = spark.createDataFrame(
        [(1, "seven", 999)], "k long, g string, ord long"
    )
    with pytest.raises(ValueError, match="type conflict"):
        merge_upsert_manifest(
            spark, conflict, root, keys=["k"], order_col="ord"
        )
    # a legitimately NEW column evolves union-by-name: carried-bucket
    # rows read NULL, the batch's rows carry values
    add = spark.createDataFrame(
        [(100, 2, 999, "x")], "k long, g long, ord long, extra string"
    )
    merge_upsert_manifest(spark, add, root, keys=["k"], order_col="ord")
    got = read_manifest(spark, root)
    assert got.filter("k = 100 and extra = 'x'").count() == 1
    assert got.filter("k < 40 and extra is not null").count() == 0
