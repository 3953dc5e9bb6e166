"""Manifest-committed (versioned) lake tables: marker-file commit protocol,
crash-injection recovery, reader completeness, GC retention — the
no-rename-window replacement for the directory-swap publish (r5 verdict #7).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.lake import (
    _HadoopFS,
    compact_versioned,
    merge_upsert_versioned,
    publish_version,
    read_versioned,
    resolve_version,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, updated long")


def test_publish_and_resolve(spark, tmp_path):
    root = str(tmp_path / "t")
    assert resolve_version(spark, root) is None
    publish_version(spark, _kv(spark, [(1, 1.0, 0)]), root)
    assert resolve_version(spark, root).endswith("/v00000001")
    assert read_versioned(spark, root).count() == 1
    publish_version(spark, _kv(spark, [(1, 1.0, 0), (2, 2.0, 0)]), root)
    assert resolve_version(spark, root).endswith("/v00000002")
    assert read_versioned(spark, root).count() == 2


def test_crash_before_marker_is_invisible_and_self_heals(spark, tmp_path):
    """Kill between data write and commit: readers stay on the previous
    complete version; the next publish GCs the orphan automatically."""
    root = str(tmp_path / "t")
    publish_version(spark, _kv(spark, [(1, 1.0, 0)]), root)

    # crash injection: a full data directory for v2 but NO commit marker
    orphan = f"{root}/v00000002"
    _kv(spark, [(9, 9.0, 9)]).write.parquet(orphan)
    assert resolve_version(spark, root).endswith("/v00000001")
    assert [r.k for r in read_versioned(spark, root).collect()] == [1]

    # recovery needs no operator action: next publish skips past the orphan
    # (max known + 1 = v3), commits, and deletes the crashed dir
    publish_version(spark, _kv(spark, [(1, 1.0, 0), (2, 2.0, 0)]), root)
    fs = _HadoopFS(spark, root)
    assert resolve_version(spark, root).endswith("/v00000003")
    assert not fs.exists(orphan)
    assert read_versioned(spark, root).count() == 2


def test_reader_always_sees_complete_version_across_publishes(spark, tmp_path):
    """The invariant the rename swap could not give: at every observable
    point (including mid-'crash'), resolve_version returns a directory whose
    contents are a complete, readable dataset."""
    root = str(tmp_path / "t")
    for i in range(1, 5):
        publish_version(
            spark, _kv(spark, [(k, float(k), i) for k in range(i)]), root
        )
        path = resolve_version(spark, root)
        assert path is not None
        # the resolved dir has a _SUCCESS (Spark's own job commit) and reads
        # back the full expected row count — never a partial write
        fs = _HadoopFS(spark, root)
        assert fs.exists(f"{path}/_SUCCESS")
        assert read_versioned(spark, root).count() == i
        # inject a crashed publish between every committed one
        _kv(spark, [(99, 99.0, 99)]).write.parquet(
            f"{root}/v{i * 10 + 5:08d}"
        )
        assert read_versioned(spark, root).count() == i  # still the committed one


def test_gc_keeps_retention_window(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(1, 6):
        publish_version(
            spark, _kv(spark, [(1, float(i), i)]), root, keep_versions=2
        )
    fs = _HadoopFS(spark, root)
    names = sorted(n for n in fs.child_names(root) if not n.endswith("._COMMITTED"))
    assert names == ["v00000004", "v00000005"]  # newest + one rollback target
    assert resolve_version(spark, root).endswith("/v00000005")


def test_merge_upsert_versioned_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_versioned(
        spark,
        _kv(spark, [(1, 1.0, 0), (2, 2.0, 0)]),
        root,
        keys=["k"],
        order_col="updated",
    )
    merge_upsert_versioned(
        spark,
        _kv(spark, [(2, 22.0, 1), (3, 3.0, 1)]),
        root,
        keys=["k"],
        order_col="updated",
    )
    got = {r.k: r.v for r in read_versioned(spark, root).collect()}
    assert got == {1: 1.0, 2: 22.0, 3: 3.0}

    # idempotent replay: same batch again changes nothing but the version
    merge_upsert_versioned(
        spark,
        _kv(spark, [(2, 22.0, 1), (3, 3.0, 1)]),
        root,
        keys=["k"],
        order_col="updated",
    )
    assert {r.k: r.v for r in read_versioned(spark, root).collect()} == got


def test_compact_versioned_no_missing_instant(spark, tmp_path):
    root = str(tmp_path / "t")
    # many small files: one per publish-partition
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.lit(0).alias("updated"),
    ).repartition(16)
    publish_version(spark, df, root)
    before = resolve_version(spark, root)
    stats = compact_versioned(spark, root, target_file_bytes=1 << 30)
    assert stats["files_before"] == 16 and stats["files_after"] == 1
    after = resolve_version(spark, root)
    assert after != before
    assert read_versioned(spark, root).count() == 1000
    # old version retained as rollback target (keep_versions=2 default)
    fs = _HadoopFS(spark, root)
    assert fs.exists(before)


def test_compact_versioned_requires_committed_version(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_versioned(spark, str(tmp_path / "missing"))


def test_time_travel_and_rollback(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.lake import (
        committed_versions,
        rollback_version,
    )

    root = str(tmp_path / "t")
    publish_version(spark, _kv(spark, [(1, 1.0, 0)]), root, keep_versions=3)
    publish_version(
        spark, _kv(spark, [(1, 2.0, 1), (2, 2.0, 1)]), root, keep_versions=3
    )
    publish_version(spark, _kv(spark, [(1, 3.0, 2)]), root, keep_versions=3)
    assert committed_versions(spark, root) == [1, 2, 3]

    # time travel: each committed version reads back its own state
    assert read_versioned(spark, root, version=1).count() == 1
    assert read_versioned(spark, root, version=2).count() == 2
    assert {r.v for r in read_versioned(spark, root, version=3).collect()} == {3.0}
    # latest (no version) is v3
    assert {r.v for r in read_versioned(spark, root).collect()} == {3.0}

    # GC'd / never-committed versions are unreachable with a clear error
    with pytest.raises(KeyError, match="available"):
        read_versioned(spark, root, version=9)

    # rollback = copy-forward re-publish: history stays linear (v4), the
    # restored state equals v2, and v3 remains inspectable
    rollback_version(spark, root, 2)
    assert committed_versions(spark, root)[-1] == 4
    assert {(r.k, r.v) for r in read_versioned(spark, root).collect()} == {
        (1, 2.0),
        (2, 2.0),
    }
    assert read_versioned(spark, root, version=3).count() == 1


def test_stale_marker_without_dir_is_gcd_and_rollback_errors_cleanly(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.lake import rollback_version

    root = str(tmp_path / "t")
    publish_version(spark, _kv(spark, [(1, 1.0, 0)]), root)
    fs = _HadoopFS(spark, root)
    # out-of-band incident: marker survives, data dir deleted
    fs.write_text(f"{root}/v00000002._COMMITTED", "v00000002")
    assert resolve_version(spark, root).endswith("/v00000001")  # never resolves to it
    publish_version(spark, _kv(spark, [(1, 2.0, 1)]), root)
    # the stale marker is gone after one publish (self-healing holds)
    assert not fs.exists(f"{root}/v00000002._COMMITTED")
    # rollback on an empty root errors with intent, not a Py4J crash
    with pytest.raises(FileNotFoundError, match="nothing to roll back"):
        rollback_version(spark, str(tmp_path / "empty"), 1)
