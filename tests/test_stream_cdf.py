"""Streaming change feed (X151, streaming/manifest_source.py
readChangeFeed): the manifest stream source emits row-level changes —
insert / delete / update_preimage / update_postimage + commit_version —
planned per commit from metadata (added files, DV-sidecar position
deltas), matching the batch feed (read_manifest_changes) fold exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    append_files,
    compact_manifest,
    delete_where_dv,
    publish_files,
    read_manifest_changes,
    update_where_dv,
)
from stock_market_data_pipeline_spark.streaming.manifest_source import (
    ManifestStreamDataSource,
)


def _df(spark, lo, hi):
    rows = [(k, k % 5, float(k)) for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, g long, x double")


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
        (r["k"], r["g"], r["x"], r["change_type"], r["commit_version"])
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_cdf_matches_batch_feed_fold(spark, tmp_path):
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    publish_files(spark, _df(spark, 0, 20), root)                    # v1
    append_files(spark, _df(spark, 100, 110), root)                  # v2
    up = update_where_dv(spark, root, {"x": "x + 0.5"}, "g = 2")     # v3
    dl = delete_where_dv(spark, root, "g = 3")                       # v4
    assert up["version"] == 3 and dl["version"] == 4

    _run_cdf(spark, root, sink, ckpt)
    got = _rows(spark, sink)

    # full-history first batch: v1+v2 rows are inserts at their commit
    inserts = {t for t in got if t[3] == "insert"}
    assert {(t[0], t[4]) for t in inserts} == {
        (k, 1) for k in range(20)
    } | {(k, 2) for k in range(100, 110)}
    # the update emits matched rows as pre+post at v3 with old/new x
    pre = {t for t in got if t[3] == "update_preimage"}
    post = {t for t in got if t[3] == "update_postimage"}
    matched = [k for k in list(range(20)) + list(range(100, 110))
               if k % 5 == 2]
    assert {(t[0], t[2], t[4]) for t in pre} == {
        (k, float(k), 3) for k in matched
    }
    assert {(t[0], t[2], t[4]) for t in post} == {
        (k, k + 0.5, 3) for k in matched
    }
    # the DV delete emits the deleted rows at v4 (g=3 rows, still
    # un-updated values; updated g=2 rows don't match g=3)
    dels = {t for t in got if t[3] == "delete"}
    assert {(t[0], t[4]) for t in dels} == {
        (k, 4)
        for k in list(range(20)) + list(range(100, 110))
        if k % 5 == 3
    }
    assert len(got) == len(inserts | pre | post | dels)

    # parity with the BATCH feed, step by step
    batch = set()
    for v in (2, 3, 4):
        step = read_manifest_changes(spark, root, v - 1, v, keys=["k"])
        batch |= {
            (r["k"], r["g"], r["x"], r["change_type"], v)
            for r in step.collect()
        }
    stream_after_v1 = {t for t in got if t[4] > 1}
    assert stream_after_v1 == batch

    # exactly-once: a further delete yields ONLY its rows on resume
    delete_where_dv(spark, root, "k = 0")                            # v5
    _run_cdf(spark, root, sink, ckpt)
    got2 = _rows(spark, sink)
    assert got2 - got == {(0, 0, 0.0, "delete", 5)}


def test_stream_cdf_skips_compaction_and_refuses_rewrites(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10).repartition(3), root)     # v1
    append_files(spark, _df(spark, 10, 15), root)                    # v2
    compact_manifest(spark, root)                      # v3
    append_files(spark, _df(spark, 20, 22), root)                    # v4
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt)
    got = _rows(spark, sink)
    # compaction moved every row into new files yet emitted NOTHING
    assert {t[4] for t in got} == {1, 2, 4}
    assert all(t[3] == "insert" for t in got)
    assert len(got) == 17
    # a full replace is not reconstructible row-level from metadata
    publish_files(spark, _df(spark, 0, 3), root)                     # v5
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="read_manifest_changes"):
        q.awaitTermination(120)
        raise AssertionError("CDF stream survived a history rewrite")


def test_stream_cdf_flows_across_replace_and_restore(spark, tmp_path):
    """X156: with the property on, a full REPLACE and a RESTORE record
    cdf- sidecars at commit time, and the readChangeFeed stream plans
    them as those commits' authoritative change sets — flowing
    continuously where it previously raised toward the batch API.
    Stream rows ≡ the per-commit batch feed exactly."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        enable_change_feed,
        read_manifest_table_changes,
        rollback_manifest,
    )

    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    publish_files(spark, _df(spark, 0, 10), root)                    # v1
    enable_change_feed(spark, root)                                  # v2
    append_files(spark, _df(spark, 10, 15), root)                    # v3
    publish_files(spark, _df(spark, 100, 104), root)                 # v4 REPLACE
    rollback_manifest(spark, root, 3)                                # v5 RESTORE
    _run_cdf(spark, root, sink, ckpt)
    got = _rows(spark, sink)
    batch = {
        (r["k"], r["g"], r["x"], r["change_type"], r["commit_version"])
        for r in read_manifest_table_changes(
            spark, root, v_from=0
        ).collect()
    }
    assert got == batch
    # replace: uncancelled delete-all ∪ insert-all
    assert {(t[0], t[3]) for t in got if t[4] == 4} == {
        (k, "delete") for k in range(15)
    } | {(k, "insert") for k in range(100, 104)}
    # restore: file-granular diff (v4's files out, v3's files back)
    assert {(t[0], t[3]) for t in got if t[4] == 5} == {
        (k, "delete") for k in range(100, 104)
    } | {(k, "insert") for k in range(15)}


def test_stream_cdf_option_guards(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 5), root)
    spark.dataSource.register(ManifestStreamDataSource)
    # readChangeFeed × ignoreChanges refused
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.readStream.format("manifest_stream")
            .option("path", root)
            .option("readChangeFeed", "true")
            .option("ignoreChanges", "true")
            .load()
            .writeStream.format("noop")
            .option(
                "checkpointLocation", str(tmp_path / "ck")
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    # a table column colliding with the feed metadata column refused
    root2 = str(tmp_path / "t2")
    publish_files(
        spark,
        spark.createDataFrame([(1, "i")], "k long, change_type string"),
        root2,
    )
    with pytest.raises(Exception, match="collides"):
        (
            spark.readStream.format("manifest_stream")
            .option("path", root2)
            .option("readChangeFeed", "true")
            .load()
        )


def test_stream_cdf_starting_version_and_update_only_table(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 30), root)                    # v1
    update_where_dv(spark, root, {"g": "g + 100"}, "k < 3")          # v2
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_cdf(spark, root, sink, ckpt, starting=1)
    got = _rows(spark, sink)
    # startingVersion=1 skips the v1 snapshot: only the update flows
    assert {t[3] for t in got} == {"update_preimage", "update_postimage"}
    assert {(t[0], t[1], t[3]) for t in got} == (
        {(k, k % 5, "update_preimage") for k in range(3)}
        | {(k, k % 5 + 100, "update_postimage") for k in range(3)}
    )


def test_stream_source_offset_resolution_uses_pointer(spark, tmp_path):
    """r20: the streaming source's offset resolution (latestOffset per
    trigger poll) reads the advisory `_latest` pointer — O(1) stats
    instead of an O(history) directory listing — with the listing kept
    as the fallback, and per-batch CDF step planning probes only the
    batch's own version span."""
    import json as _j
    import os as _os

    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        append_files,
        publish_files,
    )
    from stock_market_data_pipeline_spark.streaming import (
        manifest_source as MS,
    )

    root = str(tmp_path / "t")
    df = spark.range(20).select(F.col("id"), (F.col("id") % 3).alias("k"))
    publish_files(spark, df, root)
    append_files(spark, df, root)
    assert MS._latest_committed_version(root) == 2
    assert MS._committed_in_range(root, 0, 2) == [1, 2]
    assert MS._committed_in_range(root, 1, 2) == [2]

    ptr = f"{root}/mf/_latest"
    # stale pointer: forward probe heals
    with open(ptr, "w") as fh:
        _j.dump({"committed": 1, "known": 1}, fh)
    assert MS._latest_committed_version(root) == 2
    # corrupt pointer: listing fallback
    with open(ptr, "w") as fh:
        fh.write("{nope")
    assert MS._latest_committed_version(root) == 2
    # missing pointer: listing fallback
    _os.unlink(ptr)
    assert MS._latest_committed_version(root) == 2
    # empty table
    assert MS._latest_committed_version(str(tmp_path / "none")) is None
