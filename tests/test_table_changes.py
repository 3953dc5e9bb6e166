"""Per-commit batch change feed (X155, read_manifest_table_changes —
Delta's ``table_changes(start, end)`` contract): every committed
version in (v_from, v_to] contributes its own change rows tagged
commit_version. Sidecars are authoritative where recorded; everything
else reconstructs as a single-step keyed diff through the shared
emitter — including history written BEFORE enable_change_feed, which
the stream refuses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    compact_manifest,
    delete_keys_manifest,
    enable_change_feed,
    merge_upsert_manifest,
    publish_files,
    read_manifest,
    read_manifest_table_changes,
    replace_where_manifest,
)
from stock_market_data_pipeline_spark.streaming.cdc_replicate import (
    apply_changefeed_batch,
)


def _df(spark, lo, hi, seq=0, x_add=0.0):
    rows = [(k, f"s{k}", float(k) + x_add, seq) for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, s string, x double, seq long")


def _rows(df):
    return {
        (r["k"], r["s"], r["x"], r["seq"], r["change_type"],
         r["commit_version"])
        for r in df.collect()
    }


def test_per_commit_feed_mixes_keyed_diffs_and_sidecars(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 20), root, keys=["k"], order_col="seq",
        n_buckets=4,
    )                                                                # v1
    # PRE-property rewrite: the stream would refuse this commit; the
    # per-commit batch walk reconstructs it as a keyed diff
    merge_upsert_manifest(
        spark, _df(spark, 0, 3, seq=1, x_add=100.0), root, keys=["k"],
        order_col="seq", n_buckets=4,
    )                                                                # v2
    enable_change_feed(spark, root)                                  # v3
    merge_upsert_manifest(
        spark, _df(spark, 5, 8, seq=2, x_add=200.0), root, keys=["k"],
        order_col="seq", n_buckets=4,
    )                                                                # v4 (sidecar)
    delete_keys_manifest(
        spark, spark.createDataFrame([(10,), (11,)], "k long"), root,
        keys=["k"], n_buckets=4,
    )                                                                # v5 (sidecar)
    compact_manifest(spark, root)                                    # v6 (skipped)

    feed = read_manifest_table_changes(spark, root, v_from=1, keys=["k"])
    got = _rows(feed)
    expect = set()
    for k in range(0, 3):  # v2 keyed diff: update pairs
        expect.add((k, f"s{k}", float(k), 0, "update_preimage", 2))
        expect.add((k, f"s{k}", float(k) + 100.0, 1, "update_postimage", 2))
    for k in range(5, 8):  # v4 sidecar: update pairs
        expect.add((k, f"s{k}", float(k), 0, "update_preimage", 4))
        expect.add((k, f"s{k}", float(k) + 200.0, 2, "update_postimage", 4))
    for k in (10, 11):  # v5 sidecar: deletes at current values
        expect.add((k, f"s{k}", float(k), 0, "delete", 5))
    assert got == expect

    # intermediate states visible (unlike the endpoint diff): a key
    # restated at v2 appears under commit_version 2 even though later
    # commits exist
    assert feed.filter(
        (F.col("k") == 0) & (F.col("commit_version") == 2)
    ).count() == 2

    # include_preimage=False drops exactly the preimages
    post = read_manifest_table_changes(
        spark, root, v_from=1, keys=["k"], include_preimage=False
    )
    assert _rows(post) == {
        t for t in expect if t[4] != "update_preimage"
    }

    # an empty range types correctly and returns nothing
    empty = read_manifest_table_changes(spark, root, v_from=6, keys=["k"])
    assert empty.count() == 0
    assert "commit_version" in empty.columns


def test_replace_where_contributes_uncancelled_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)                    # v1
    enable_change_feed(spark, root)                                  # v2
    # k=0 restated IDENTICAL: the per-commit feed carries the sidecar's
    # uncancelled delete+insert pair verbatim
    incoming = _df(spark, 0, 5).withColumn(
        "x",
        F.when(F.col("k") == 0, F.col("x")).otherwise(F.col("x") + 9.0),
    )
    replace_where_manifest(spark, incoming, root, "k", 0, 6)         # v3
    feed = read_manifest_table_changes(spark, root, v_from=2, keys=["k"])
    k0 = {(r["change_type"], r["x"]) for r in feed.filter("k = 0").collect()}
    assert k0 == {("delete", 0.0), ("insert", 0.0)}
    assert feed.count() == 7 + 5  # 7 matched deletes + 5 inserts


def test_sidecarless_rewrite_without_keys_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 10), root, keys=["k"], order_col="seq",
        n_buckets=2,
    )                                                                # v1
    merge_upsert_manifest(
        spark, _df(spark, 0, 2, seq=1, x_add=1.0), root, keys=["k"],
        order_col="seq", n_buckets=2,
    )                                                                # v2
    with pytest.raises(ValueError, match="needs keys"):
        read_manifest_table_changes(spark, root, v_from=1)


def test_backfill_feed_reconstructs_a_replica(spark, tmp_path):
    """The user story the endpoint diff cannot serve: seed a replica
    with the v1 snapshot, then apply the per-commit feed (which
    carries commit_version) through apply_changefeed_batch — the
    replica converges to the source exactly, including across a
    pre-property rewrite and a post-property delete."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    merge_upsert_manifest(
        spark, _df(spark, 0, 30), src, keys=["k"], order_col="seq",
        n_buckets=4,
    )                                                                # v1
    merge_upsert_manifest(
        spark, _df(spark, 0, 4, seq=1, x_add=50.0), src, keys=["k"],
        order_col="seq", n_buckets=4,
    )                                                                # v2 pre-property
    enable_change_feed(spark, src)                                   # v3
    delete_keys_manifest(
        spark, spark.createDataFrame([(20,), (21,)], "k long"), src,
        keys=["k"], n_buckets=4,
    )                                                                # v4 sidecar

    seed = read_manifest(spark, src, version=1).withColumn(
        "_cdc_version", F.lit(1).cast("long")
    )
    merge_upsert_manifest(
        spark, seed, dst, keys=["k"], order_col="_cdc_version",
        n_buckets=4,
    )
    feed = read_manifest_table_changes(spark, src, v_from=1, keys=["k"])
    apply_changefeed_batch(spark, feed, 0, dst, keys=["k"], n_buckets=4)

    src_rows = {
        (r["k"], r["s"], r["x"], r["seq"])
        for r in read_manifest(spark, src).collect()
    }
    dst_rows = {
        (r["k"], r["s"], r["x"], r["seq"])
        for r in read_manifest(spark, dst).drop("_cdc_version").collect()
    }
    assert dst_rows == src_rows
    assert len(dst_rows) == 28


def test_from_zero_keyless_appends_and_metadata_commits(spark, tmp_path):
    """v_from=0 walks the COMPLETE history (Delta table_changes(0, …));
    pure appends feed keylessly as inserts (the stream planner's
    treatment) and pure-metadata commits (property flips, constraints)
    contribute nothing — no keys required for any of them."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        add_table_constraint,
        append_files,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)                    # v1
    append_files(spark, _df(spark, 10, 15), root)                    # v2
    add_table_constraint(spark, root, "x_nonneg", "x >= 0")          # v3
    enable_change_feed(spark, root)                                  # v4
    # NO keys passed: publish-from-empty, append and the two metadata
    # commits all route keylessly
    feed = read_manifest_table_changes(spark, root, v_from=0)
    got = _rows(feed)
    expect = {
        (k, f"s{k}", float(k), 0, "insert", 1) for k in range(0, 10)
    } | {
        (k, f"s{k}", float(k), 0, "insert", 2) for k in range(10, 15)
    }
    assert got == expect


def test_schema_evolving_precdf_commit_keeps_new_column_values(
    spark, tmp_path
):
    """r17 review finding: the keyed-diff reconstruction projected
    through the column INTERSECTION, silently NULLing a newly added
    column's real values out of every change row. The diff now aligns
    both sides to the column UNION: preimages read NULL in the new
    column (the sidecar contract), postimages carry the REAL values —
    and the v_from=0 backfill converges bit-for-bit."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = spark.createDataFrame(
        [(k, f"s{k}", 0) for k in range(8)], "k long, s string, seq long"
    )
    merge_upsert_manifest(
        spark, base, src, keys=["k"], order_col="seq", n_buckets=2,
    )                                                                # v1
    evolved = spark.createDataFrame(
        [(k, f"e{k}", 1, float(k) * 2) for k in range(0, 3)],
        "k long, s string, seq long, x double",
    )
    merge_upsert_manifest(  # pre-property, schema-evolving
        spark, evolved, src, keys=["k"], order_col="seq", n_buckets=2,
    )                                                                # v2
    feed = read_manifest_table_changes(spark, src, v_from=0, keys=["k"])
    posts = {
        (r["k"], r["s"], r["x"])
        for r in feed.filter(
            F.col("change_type") == "update_postimage"
        ).collect()
    }
    assert posts == {(0, "e0", 0.0), (1, "e1", 2.0), (2, "e2", 4.0)}
    pres = feed.filter(F.col("change_type") == "update_preimage")
    assert pres.filter(F.col("x").isNull()).count() == 3

    apply_changefeed_batch(spark, feed, 0, dst, keys=["k"], n_buckets=2)
    src_rows = {
        tuple(r) for r in read_manifest(spark, src).collect()
    }
    dst_rows = {
        tuple(r)
        for r in read_manifest(spark, dst).drop("_cdc_version").collect()
    }
    assert dst_rows == src_rows


def test_reserved_output_columns_raise(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(
        spark,
        spark.createDataFrame(
            [(1, 5)], "k long, commit_version long"
        ),
        root,
    )
    with pytest.raises(ValueError, match="reserved"):
        read_manifest_table_changes(spark, root, v_from=0, keys=["k"])
