"""Write-time change-data sidecars (X153, enable_change_feed +
sinks/manifest_lake.py _change_rows/_write_cdf_sidecar): with the
change_feed table property on, keyed MERGE and key-delete commits
record their row-level changes at commit time, and the readChangeFeed
stream flows continuously across them instead of raising.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    compact_manifest,
    delete_keys_manifest,
    describe_manifest,
    disable_change_feed,
    enable_change_feed,
    merge_upsert_manifest,
    publish_files,
    read_manifest,
    read_manifest_changes,
    vacuum_manifest,
)
from stock_market_data_pipeline_spark.streaming.manifest_source import (
    ManifestStreamDataSource,
)


def _df(spark, lo, hi, seq=0):
    rows = [(k, f"v{k}", float(k), seq) for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, s string, x double, seq long")


def _run_cdf(spark, root, sink, ckpt, starting=None):
    spark.dataSource.register(ManifestStreamDataSource)
    r = (
        spark.readStream.format("manifest_stream")
        .option("path", root)
        .option("readChangeFeed", "true")
    )
    if starting is not None:
        r = r.option("startingVersion", str(starting))
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _rows(spark, sink):
    return {
        (r["k"], r["s"], r["x"], r["seq"], r["change_type"],
         r["commit_version"])
        for r in spark.read.parquet(sink).collect()
    }


def test_merge_and_delete_stream_continuously_with_sidecars(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    merge_upsert_manifest(
        spark, _df(spark, 0, 30), root, keys=["k"], order_col="seq",
        n_buckets=8,
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    assert describe_manifest(spark, root)["change_feed"] is True
    # restate 3 existing keys (new x), 1 no-op restatement (identical
    # values — must NOT appear in the feed), insert 2 new keys
    batch = spark.createDataFrame(
        [
            (1, "v1", 100.0, 1),
            (2, "v2", 200.0, 1),
            (3, "v3", 300.0, 1),
            (4, "v4", 4.0, 0),       # identical to the v1 row: no-op
            (100, "v100", 100.0, 1),
            (101, "v101", 101.0, 1),
        ],
        "k long, s string, x double, seq long",
    )
    merge_upsert_manifest(
        spark, batch, root, keys=["k"], order_col="seq", n_buckets=8,
    )                                                                # v3
    assert describe_manifest(spark, root)["cdf"] == {"rows": 8}
    dels = spark.createDataFrame([(5,), (100,)], "k long")
    delete_keys_manifest(spark, dels, root, keys=["k"], n_buckets=8)  # v4
    assert describe_manifest(spark, root)["cdf"] == {"rows": 2}

    _run_cdf(spark, root, sink, ckpt)
    got = _rows(spark, sink)
    # v1: the initial merge's files stream as plain inserts
    assert {(t[0], t[4]) for t in got if t[5] == 1} == {
        (k, "insert") for k in range(30)
    }
    # v2 (property flip) and the no-op restatement emit nothing
    assert not {t for t in got if t[5] == 2}
    assert not {t for t in got if t[0] == 4 and t[5] == 3}
    # v3 sidecar: 3 update pairs + 2 inserts
    v3 = {t for t in got if t[5] == 3}
    assert {(t[0], t[2], t[4]) for t in v3} == {
        (1, 1.0, "update_preimage"), (1, 100.0, "update_postimage"),
        (2, 2.0, "update_preimage"), (2, 200.0, "update_postimage"),
        (3, 3.0, "update_preimage"), (3, 300.0, "update_postimage"),
        (100, 100.0, "insert"), (101, 101.0, "insert"),
    }
    # v4 sidecar: the two deleted rows at their pre-delete values
    v4 = {t for t in got if t[5] == 4}
    assert {(t[0], t[2], t[4]) for t in v4} == {
        (5, 5.0, "delete"), (100, 100.0, "delete"),
    }
    # stream ≡ batch feed per rewriting commit
    for v in (3, 4):
        batch_feed = {
            (r["k"], r["s"], r["x"], r["seq"], r["change_type"], v)
            for r in read_manifest_changes(
                spark, root, v - 1, v, keys=["k"]
            ).collect()
        }
        assert {t for t in got if t[5] == v} == batch_feed
    # exactly-once resume across a further sidecar commit
    merge_upsert_manifest(
        spark,
        spark.createDataFrame([(0, "v0", -1.0, 2)],
                              "k long, s string, x double, seq long"),
        root, keys=["k"], order_col="seq", n_buckets=8,
    )                                                                # v5
    _run_cdf(spark, root, sink, ckpt)
    got2 = _rows(spark, sink)
    assert got2 - got == {
        (0, "v0", 0.0, 0, "update_preimage", 5),
        (0, "v0", -1.0, 2, "update_postimage", 5),
    }


def test_property_lifecycle_and_disabled_table_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 10), root, keys=["k"], order_col="seq",
        n_buckets=4,
    )
    # without the property, a rewriting merge still breaks the stream
    merge_upsert_manifest(
        spark, _df(spark, 0, 3, seq=1), root, keys=["k"],
        order_col="seq", n_buckets=4,
    )
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck0"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="enable_change_feed"):
        q.awaitTermination(120)
        raise AssertionError("stream survived a sidecar-less merge")
    # the property survives a full replace (table property) and
    # row-preserving maintenance
    enable_change_feed(spark, root)
    publish_files(spark, _df(spark, 0, 20), root)
    assert describe_manifest(spark, root)["change_feed"] is True
    compact_manifest(spark, root)
    assert describe_manifest(spark, root)["change_feed"] is True
    # disable stops recording
    disable_change_feed(spark, root)
    assert describe_manifest(spark, root)["change_feed"] is False
    merge_upsert_manifest(
        spark, _df(spark, 0, 2, seq=2), root, keys=["k"],
        order_col="seq", n_buckets=4,
    )
    assert describe_manifest(spark, root)["cdf"] is None


def test_vacuum_keeps_retained_cdf_sidecars(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 12), root, keys=["k"], order_col="seq",
        n_buckets=4,
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    merge_upsert_manifest(
        spark, _df(spark, 0, 2, seq=1).withColumn("x", F.lit(9.0)),
        root, keys=["k"], order_col="seq", n_buckets=4,
    )                                                                # v3
    vacuum_manifest(spark, root, keep_versions=2, grace_seconds=0)
    # the retained head version's sidecar survives: a stream starting
    # at the enabling version still reads the merge's changes
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt, starting=2)
    got = _rows(spark, sink)
    assert {(t[0], t[4]) for t in got} == {
        (0, "update_preimage"), (0, "update_postimage"),
        (1, "update_preimage"), (1, "update_postimage"),
    }
    assert read_manifest(spark, root).count() == 12


def test_sidecar_carries_evolved_columns(spark, tmp_path):
    """A schema-evolving merge's sidecar must carry the NEW column:
    preimages read NULL for it, postimages/inserts carry the values —
    intersecting the schemas would silently drop it from the feed."""
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 10), root, keys=["k"], order_col="seq",
        n_buckets=4,
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    evolved = spark.createDataFrame(
        [(1, "v1", 50.0, 1, "tagged"), (200, "v200", 200.0, 1, "new")],
        "k long, s string, x double, seq long, tag string",
    )
    merge_upsert_manifest(
        spark, evolved, root, keys=["k"], order_col="seq", n_buckets=4,
    )                                                                # v3
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt, starting=2)
    got = {
        (r["k"], r["change_type"], r["tag"], r["x"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        (1, "update_preimage", None, 1.0),
        (1, "update_postimage", "tagged", 50.0),
        (200, "insert", "new", 200.0),
    }


def test_retention_sweep_records_and_streams_expired_rows(spark, tmp_path):
    """X153 x retention: with the property on, the nightly TTL sweep's
    expired rows land in the commit's sidecar — whole dropped files
    plus the expired slice of the boundary straddler, DV-applied,
    NULL-col rows never emitted — and the change-feed stream flows
    across the sweep, agreeing with the batch feed."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        retention_delete,
    )

    root = str(tmp_path / "t")
    rows = [(k, float(k), k % 9) for k in range(40)]
    rows.append((100, None, 1))  # NULL ts: never expired
    df = spark.createDataFrame(rows, "k long, ts double, g long")
    publish_files(
        spark, df.repartitionByRange(8, "ts"), root, stats_cols=["ts"]
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    out = retention_delete(spark, root, "ts", 17.0)                  # v3
    assert out["dropped"] >= 1 and out["rewritten"] >= 1
    assert describe_manifest(spark, root)["cdf"] == {"rows": 17}
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf_generic = _run_cdf  # same runner; table has its own cols
    spark.dataSource.register(ManifestStreamDataSource)
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["k"], r["change_type"], r["commit_version"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(k, "delete", 3) for k in range(17)}
    # NULL-ts row survived and never appeared in the feed
    assert read_manifest(spark, root).filter("k = 100").count() == 1
    # stream ≡ batch feed for the sweep
    batch = {
        (r["k"], r["change_type"], 3)
        for r in read_manifest_changes(
            spark, root, 2, 3, keys=["k"]
        ).collect()
    }
    assert got == batch
