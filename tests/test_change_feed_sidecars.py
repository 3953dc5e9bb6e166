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


def test_null_key_rows_cancel_in_the_shared_emitter(spark, tmp_path):
    """r16 advice: a plain name-list full-outer join never matches NULL
    key values, so an unchanged null-key row carried through a rewrite
    emitted a spurious delete+insert pair. The shared emitter joins
    keys null-safely — agreeing with dedup_keep_last's
    Window.partitionBy, which groups NULL keys — so null-key rows
    cancel when unchanged and pair up as update pre/post when changed.
    Exercised at BOTH call sites: _change_rows directly (the write-time
    sidecar path) and read_manifest_changes across a compaction (the
    batch-feed path)."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _change_rows,
        append_files,
        compact_manifest,
    )

    schema = "k long, s string, x double"
    old = spark.createDataFrame(
        [(None, "a", 1.0), (None, "b", 2.0), (1, "c", 3.0)], schema
    )
    new = spark.createDataFrame(
        [(None, "a", 1.0), (None, "b", 20.0), (1, "c", 3.0)], schema
    )
    # BUT: two distinct null-key rows ("a" and "b") must not cross-pair;
    # with a single NULL key on both sides the join explodes 2x2 — the
    # emitter's contract (like dedup_keep_last's) is that NULL forms ONE
    # key group, so this fixture keys on (k, s) to stay row-identified.
    got = {
        tuple(r)
        for r in _change_rows(old, new, ["k", "s"]).collect()
    }
    assert got == {
        (None, "b", 2.0, "update_preimage"),
        (None, "b", 20.0, "update_postimage"),
    }

    # batch feed across a pure rewrite: null-key rows carried unchanged
    # through compaction emit nothing
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(None, "a", 1.0), (None, "b", 2.0), (7, "c", 3.0)], schema
    )
    publish_files(spark, df.repartition(3), root)                    # v1
    compact_manifest(spark, root)                                    # v2
    feed = read_manifest_changes(spark, root, v_from=1, v_to=2,
                                 keys=["k", "s"])
    assert feed.count() == 0


def test_large_change_set_writes_multi_part_sidecar(
    spark, tmp_path, monkeypatch
):
    """r16 advice: _write_cdf_sidecar forced coalesce(1), so a
    backfill-sized MERGE's change set serialized through one task. The
    writer now fans out above _CDF_ROWS_PER_FILE rows; the stream
    reader already consumes the sidecar DIRECTORY, so a multi-part
    sidecar feeds identically."""
    import os

    from stock_market_data_pipeline_spark.sinks import manifest_lake as ml

    monkeypatch.setattr(ml, "_CDF_ROWS_PER_FILE", 100)
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 300), root, keys=["k"], order_col="seq",
        n_buckets=4,
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    merge_upsert_manifest(
        spark,
        _df(spark, 0, 300, seq=1).withColumn("x", F.col("x") + 1000.0),
        root, keys=["k"], order_col="seq", n_buckets=4,
    )                                                                # v3
    d = describe_manifest(spark, root)
    assert d["cdf"] == {"rows": 600}  # 300 pre + 300 post images
    scs = [
        f for f in os.listdir(f"{root}/stats") if f.startswith("cdf-")
    ]
    assert len(scs) == 1
    parts = [
        f for f in os.listdir(f"{root}/stats/{scs[0]}")
        if f.endswith(".parquet")
    ]
    assert len(parts) >= 6  # 600 rows / 100-row cap

    # the stream consumes the multi-part sidecar exactly like a
    # single-part one
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt, starting=2)
    got = spark.read.parquet(sink)
    assert got.count() == 600
    assert set(
        r[0] for r in got.select("change_type").distinct().collect()
    ) == {"update_preimage", "update_postimage"}


def test_replace_where_records_uncancelled_sidecar_and_streams(
    spark, tmp_path
):
    """r16 verdict item 2 — the last general write mode the change feed
    refused. With the property on, replace_where_manifest records
    Delta's replaceWhere CDF semantics: ALL matched old rows as
    `delete` ∪ ALL incoming rows as `insert`, UNCANCELLED — a row
    restated with identical values still emits a delete+insert pair
    (replaceWhere has no key contract to cancel on). A readChangeFeed
    stream flows across the backfill and feeds exactly the sidecar;
    the keyed batch feed (read_manifest_changes) keeps its no-op
    cancellation — the divergence is deliberate and asserted here."""
    import os

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        replace_where_manifest,
    )

    root = str(tmp_path / "t")
    schema = "d long, s string, x double"
    base = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(1, 21)], schema
    )
    publish_files(spark, base.repartition(4), root)                  # v1
    enable_change_feed(spark, root)                                  # v2
    # restate [1, 10]: row d=1 is IDENTICAL to its old self (the
    # uncancelled-semantics probe), d=2..5 change value, d=6..10
    # disappear, d=101..103 are new rows inside the predicate? no —
    # the predicate is on d, so new rows must satisfy d in [1,10]:
    # use d=6..8 with new s values instead.
    incoming = spark.createDataFrame(
        [(1, "s1", 1.0)]
        + [(i, f"r{i}", float(i) * 10) for i in range(2, 6)]
        + [(i, f"n{i}", float(i) * 100) for i in range(6, 9)],
        schema,
    )
    res = replace_where_manifest(spark, incoming, root, "d", 1, 10)  # v3
    assert res["version"] == 3
    d = describe_manifest(spark, root)
    # 10 matched old rows (d=1..10) + 8 incoming rows
    assert d["cdf"] == {"rows": 18}

    # the stream feeds exactly the sidecar — uncancelled
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt, starting=2)
    got = spark.read.parquet(sink)
    assert got.count() == 18
    by_type = {
        (r["change_type"], r["d"], r["s"], r["x"])
        for r in got.collect()
    }
    # the identical restatement of d=1 emits BOTH images
    assert ("delete", 1, "s1", 1.0) in by_type
    assert ("insert", 1, "s1", 1.0) in by_type
    # vanished rows emit deletes; new values emit inserts
    assert ("delete", 10, "s10", 10.0) in by_type
    assert ("insert", 2, "r2", 20.0) in by_type
    assert all(r["commit_version"] == 3 for r in got.collect())
    # untouched rows (d=11..20) never appear
    assert got.filter(F.col("d") > 10).count() == 0

    # deliberate divergence: the KEYED batch feed cancels the
    # identical restatement of d=1 (update pre/post for d=2..5,
    # delete for 6..10 minus reinserted 6..8 which changed, insert
    # for nothing new outside the key set)
    feed = read_manifest_changes(spark, root, v_from=2, v_to=3,
                                 keys=["d"])
    assert feed.filter(F.col("d") == 1).count() == 0


def test_replace_where_sidecar_evolved_column_and_off_property(
    spark, tmp_path
):
    """A schema-evolving replaceWhere NULL-fills the new column in its
    delete images (full post-commit schema, same contract as the merge
    sidecar); with the property OFF no sidecar is recorded and the
    stream keeps its documented raise."""
    import os

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        replace_where_manifest,
    )

    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "d long, x double"
    )
    publish_files(spark, base, root)                                 # v1
    enable_change_feed(spark, root)                                  # v2
    evolved = spark.createDataFrame(
        [(1, 100.0, "new")], "d long, x double, tag string"
    )
    replace_where_manifest(spark, evolved, root, "d", 1, 5)          # v3
    scs = [f for f in os.listdir(f"{root}/stats") if f.startswith("cdf-")]
    assert len(scs) == 1
    rows = spark.read.parquet(f"{root}/stats/{scs[0]}")
    assert rows.count() == 6  # 5 deletes + 1 insert
    dels = rows.filter(F.col("change_type") == "delete")
    assert dels.count() == 5
    assert dels.filter(F.col("tag").isNull()).count() == 5
    ins = rows.filter(F.col("change_type") == "insert").collect()
    assert [(r["d"], r["x"], r["tag"]) for r in ins] == [(1, 100.0, "new")]

    # property off: no sidecar, stream raises across the rewrite
    root2 = str(tmp_path / "t2")
    publish_files(spark, base, root2)                                # v1
    replace_where_manifest(
        spark,
        spark.createDataFrame([(1, 50.0)], "d long, x double"),
        root2, "d", 1, 5,
    )                                                                # v2
    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    with pytest.raises(Exception, match="change-data sidecar"):
        _run_cdf(spark, root2, sink2, ckpt2, starting=1)
