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


def test_replace_and_restore_record_sidecars(spark, tmp_path):
    """X156: with the property on, a full REPLACE records delete-all ∪
    insert-all and a RESTORE records the file-granular diff (rows of
    files only the clobbered latest holds as deletes, rows of files
    only the target holds as inserts) — both walk KEYLESSLY through
    the per-commit feed, and the no-seed v_from=0 backfill folds to
    the restored state."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        append_files,
        read_manifest,
        rollback_manifest,
    )

    src = str(tmp_path / "t")
    dst = str(tmp_path / "dst")
    publish_files(spark, _df(spark, 0, 10), src)                     # v1
    enable_change_feed(spark, src)                                   # v2
    append_files(spark, _df(spark, 10, 15), src)                     # v3
    publish_files(spark, _df(spark, 20, 25, x_add=7.0), src)         # v4 REPLACE
    rollback_manifest(spark, src, 3)                                 # v5 RESTORE

    feed = read_manifest_table_changes(spark, src, v_from=0)  # keyless
    pv = {
        (r["commit_version"], r["change_type"]): r["n"]
        for r in feed.groupBy("commit_version", "change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert pv == {
        (1, "insert"): 10,
        (3, "insert"): 5,
        (4, "delete"): 15,  # uncancelled: every prior visible row
        (4, "insert"): 5,
        (5, "delete"): 5,   # only-in-v4 files
        (5, "insert"): 15,  # only-in-v3 files (the restored set)
    }
    # the no-seed backfill converges to the restored state
    apply_changefeed_batch(spark, feed, 0, dst, keys=["k"], n_buckets=2)
    src_rows = {tuple(r) for r in read_manifest(spark, src).collect()}
    dst_rows = {
        tuple(r)
        for r in read_manifest(spark, dst).drop("_cdc_version").collect()
    }
    assert dst_rows == src_rows and len(src_rows) == 15


def test_narrowing_replace_keeps_wide_sidecar_columns(spark, tmp_path):
    """r18 advice (mergeSchema-skip unsoundness): a schema-NARROWING
    REPLACE writes a sidecar that unions the old (wide) and new
    (narrow) schemas, while the commit records only the narrow one.
    If a later sidecar commit records the SAME narrow table schema,
    a table-schema-keyed mergeSchema skip would read both sidecar
    dirs through one arbitrary footer and could silently NULL the
    wide sidecar's extra column in the replace's preimages. The cdf
    ref now fingerprints the sidecar's OWN schema, so the walk merges
    exactly when the actual sidecar schemas differ."""
    root = str(tmp_path / "t")
    wide = _df(spark, 0, 6).withColumn("extra", F.col("k") * 100)
    publish_files(spark, wide, root)                                 # v1
    enable_change_feed(spark, root)                                  # v2
    # narrowing REPLACE: sidecar = deletes (wide) ∪ inserts (narrow)
    publish_files(spark, _df(spark, 10, 13), root)                   # v3
    # second sidecar commit whose RECORDED schema equals v3's narrow
    # one — pre-fix this collapsed the schema-key set to 1
    publish_files(spark, _df(spark, 20, 23, x_add=1.0), root)        # v4

    feed = read_manifest_table_changes(spark, root, v_from=2)
    assert "extra" in feed.columns
    dels = feed.filter(
        (F.col("commit_version") == 3)
        & (F.col("change_type") == "delete")
    )
    got = {(r["k"], r["extra"]) for r in dels.select("k", "extra").collect()}
    assert got == {(k, k * 100) for k in range(6)}
    # schema_fp rides the ref; same-schema sidecars share one fp
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _resolve_manifest,
    )
    from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS

    fs = _HadoopFS(spark, root)
    fp3 = _resolve_manifest(fs, root, 3)[1]["cdf"]["schema_fp"]
    fp4 = _resolve_manifest(fs, root, 4)[1]["cdf"]["schema_fp"]
    assert fp3 and fp4 and fp3 != fp4  # wide-union vs narrow-only


def test_restore_across_dv_emits_both_sides_of_changed_files(
    spark, tmp_path
):
    """A restore whose endpoint file sets are IDENTICAL but whose DV
    positions differ must still emit change rows — the DV-changed
    files contribute both sides (uncancelled, file-granular), so a
    replica folding the feed resurrects exactly the rows the restore
    brought back."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        delete_where_dv,
        read_manifest,
        rollback_manifest,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10).repartition(1), root)     # v1
    enable_change_feed(spark, root)                                  # v2
    delete_where_dv(spark, root, "k < 3")                            # v3
    rollback_manifest(spark, root, 2)                                # v4
    feed = read_manifest_table_changes(spark, root, v_from=3)
    got = {(r["k"], r["change_type"]) for r in feed.collect()}
    assert got == {(k, "delete") for k in range(3, 10)} | {
        (k, "insert") for k in range(0, 10)
    }
    assert read_manifest(spark, root).count() == 10


def test_restore_keeps_change_feed_property_monotone(spark, tmp_path):
    """Restoring to a PRE-property version must not silently stop
    recording (a running readChangeFeed stream was promised
    continuity) — the property follows the identity rule: monotone
    across a restore, with disable_change_feed as the explicit off
    switch."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _resolve_manifest,
        rollback_manifest,
    )
    from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 5), root)                     # v1
    enable_change_feed(spark, root)                                  # v2
    rollback_manifest(spark, root, 1)                                # v3
    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root)
    assert meta.get("change_feed") is True
    # and the restore itself recorded its (here empty-diff) sidecar ref
    assert "cdf" in meta
    # a later keyed rewrite keeps recording: the feed walks it keylessly
    replace_where_manifest(spark, _df(spark, 0, 2, x_add=5.0), root, "k", 0, 1)
    feed = read_manifest_table_changes(spark, root, v_from=3)
    assert feed.filter("change_type = 'insert'").count() == 2


def test_deep_history_walk_batches_scans(spark, tmp_path):
    """r18 (closing the r17 scale finding): the v_from=0 backfill this
    API advertises walks a micro-batch-ingested table — tens of
    thousands of commits. Pre-r18 the feed assembled one DataFrame arm
    per commit (an O(commits) unionByName chain whose Catalyst
    analysis blew up before a byte of data was read). Now every
    recorded sidecar lands in ONE multi-path scan, appends batch per
    schema group into ONE _load_table_files scan, and manifests
    batch-read executor-parallel — plan size stays O(1) in history
    depth. 220 REAL manifest commits (files staged once, committed
    through the real _commit path), walked keylessly."""
    import time as _time

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _carry_extensions,
        _commit,
        _resolve_manifest,
        _stage_files,
        enable_change_feed,
    )
    from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)                    # v1
    enable_change_feed(spark, root)                                  # v2
    fs = _HadoopFS(spark, root)
    cur, meta = _resolve_manifest(fs, root)
    n_rows = 210
    big = spark.createDataFrame(
        [(100 + i, f"a{i}", float(i), 0) for i in range(n_rows)],
        "k long, s string, x double, seq long",
    ).repartitionByRange(n_rows, "k")
    staged = _stage_files(spark, big, root, "parquet", None)
    # range partitioning of 210 distinct keys leaves few partitions
    # empty (no file written); the walk depth is however many files
    # materialized — at or past the 200-commit bar
    n_appends = len(staged)
    assert n_appends >= 200
    entries = list(meta.get("files") or [])
    carry = _carry_extensions(meta) or {}
    schema_json = meta["schema"]
    append_versions = []
    for e in staged:
        entries.append(e)
        cur = _commit(
            spark, root, list(entries), "parquet", expected_prev=cur,
            schema_json=schema_json, extra_meta=dict(carry),
            operation="APPEND",
        )
        append_versions.append(cur)
    # two sidecar-recorded rewrites on top (property is on)
    replace_where_manifest(
        spark, _df(spark, 0, 3, seq=9, x_add=1.0), root, "k", 0, 2
    )
    rw1 = cur + 1
    replace_where_manifest(
        spark, _df(spark, 3, 6, seq=9, x_add=1.0), root, "k", 3, 5
    )
    rw2 = cur + 2

    t0 = _time.monotonic()
    feed = read_manifest_table_changes(spark, root, v_from=0)
    build_s = _time.monotonic() - t0
    # plan-shape receipt: scans don't scale with walked commits — one
    # sidecar scan + the append-group scans (publish v1 may schema-key
    # apart from the _commit appends) + two broadcast maps, NOT 224
    # union arms. The analyzed plan would carry one Relation per arm
    # pre-r18.
    plan = feed._jdf.queryExecution().analyzed().toString()
    assert plan.count("Relation") <= 12, plan.count("Relation")
    # Plan-relation count above is the real O(1)-shape receipt; the
    # wall-clock canary stays only as a very loose backstop (r18 advice:
    # a tight bound flakes on loaded CI hosts).
    assert build_s < 120.0, build_s
    per_version = {
        r["commit_version"]: r["n"]
        for r in feed.groupBy("commit_version").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert per_version[1] == 10  # publish-from-empty: keyless inserts
    assert all(per_version[v] >= 1 for v in append_versions)
    assert sum(per_version[v] for v in append_versions) == n_rows
    # replaceWhere sidecars: uncancelled delete-all ∪ insert-all
    assert per_version[rw1] == 3 + 3
    assert per_version[rw2] == 3 + 3
    assert sum(per_version.values()) == 10 + n_rows + 12
    # re-attribution spot-check: the rows physically inside staged
    # file i carry append version i's commit_version, for the first,
    # a middle, and the last commit of the batched scan — one feed
    # pass over the union of the three files' keys
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _data_dir,
    )

    probe = (0, n_appends // 2, n_appends - 1)
    want = {}
    for i in probe:
        for r in spark.read.parquet(
            f"{_data_dir(root)}/{staged[i]['name']}"
        ).collect():
            want[r["k"]] = append_versions[i]
    got = {
        r["k"]: r["commit_version"]
        for r in feed.filter(F.col("k").isin(*want)).select(
            "k", "commit_version"
        ).collect()
    }
    assert got == want


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


def test_reserved_column_in_historical_schema_raises(spark, tmp_path):
    """r18 advice: the guard checked only v_to's schema — a table that
    carried commit_version historically and DROPPED it before v_to
    passed, and that step's rows got their real values clobbered by
    the feed's tag column. The guard now validates every walked
    version's schema."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        drop_column,
    )

    root = str(tmp_path / "t")
    publish_files(
        spark,
        spark.createDataFrame([(1, 5)], "k long, commit_version long"),
        root,
    )                                                                # v1
    drop_column(spark, root, "commit_version")                       # v2
    with pytest.raises(ValueError, match="v1 .* reserved"):
        read_manifest_table_changes(spark, root, v_from=0, keys=["k"])


def test_readded_file_attributes_to_both_commits_once(spark, tmp_path):
    """r18 review: the same FILE can be appended by two walked commits
    (a whole-file retention drop, then a sidecar-less restore re-adds
    it). The batched append scan must read it ONCE and attribute its
    rows to both versions exactly once each — listing the path twice
    would scan the rows twice and double every insert."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        retention_delete,
        rollback_manifest,
    )

    root = str(tmp_path / "t")
    publish_files(
        spark, _df(spark, 0, 10).repartitionByRange(2, "k"), root,
        stats_cols=["k"],
    )                                                                # v1
    retention_delete(spark, root, "k", 100)   # v2: whole-file drops
    rollback_manifest(spark, root, 1)         # v3: re-adds v1's files
    feed = read_manifest_table_changes(spark, root, v_from=0, keys=["k"])
    pv = {
        (r["commit_version"], r["change_type"]): r["n"]
        for r in feed.groupBy("commit_version", "change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert pv == {
        (1, "insert"): 10,
        (2, "delete"): 10,
        (3, "insert"): 10,
    }


def test_schema_less_appends_group_per_commit(spark, tmp_path):
    """r18 review: pre-round-8 manifests record no schema; grouping
    them into one unprojected scan would infer the schema from a
    SUBSET of files and silently NULL another commit's evolved
    column. Schema-less metas stay their own group — per-commit
    inference, the pre-rework behavior."""
    import json as _j

    from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        _mf_dir,
        _mf_name,
        append_files,
    )

    root = str(tmp_path / "t")
    publish_files(
        spark, spark.createDataFrame([(1, 1.0)], "k long, x double"), root
    )                                                                # v1
    append_files(
        spark,
        spark.createDataFrame(
            [(2, 2.0, "y2")], "k long, x double, y string"
        ),
        root,
    )                                                                # v2
    fs = _HadoopFS(spark, root)
    for v in (1, 2):  # simulate a legacy schema-less history
        p = f"{_mf_dir(root)}/{_mf_name(v)}"
        meta = _j.loads(fs.read_text(p))
        meta.pop("schema")
        fs.write_text(p, _j.dumps(meta, default=str))
    feed = read_manifest_table_changes(spark, root, v_from=0)
    rows = {
        (r["k"], r["y"], r["commit_version"]) for r in feed.collect()
    }
    assert rows == {(1, None, 1), (2, "y2", 2)}


def test_internal_tag_column_collision_raises(spark, tmp_path):
    """r18 review: __cdf_dir/__cdf_file are the one-scan walk's
    internal tag columns — a real table column of either name would be
    silently overwritten and dropped (the _cdc_rank defect class);
    both now raise with the reserved names."""
    root = str(tmp_path / "t")
    publish_files(
        spark,
        spark.createDataFrame([(1, "d")], "k long, `__cdf_dir` string"),
        root,
    )
    with pytest.raises(ValueError, match="__cdf_dir"):
        read_manifest_table_changes(spark, root, v_from=0, keys=["k"])


def test_schema_evolving_sidecars_union_in_one_scan(spark, tmp_path):
    """Two sidecar-recorded commits whose table schemas DIFFER (an
    evolving merge between them) still land in the one multi-path
    scan: the walk turns mergeSchema on exactly when the recorded
    schemas disagree, and the older sidecar's rows NULL-fill the new
    column."""
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 6), root, keys=["k"], order_col="seq",
        n_buckets=2,
    )                                                                # v1
    enable_change_feed(spark, root)                                  # v2
    merge_upsert_manifest(
        spark, _df(spark, 0, 2, seq=1, x_add=1.0), root, keys=["k"],
        order_col="seq", n_buckets=2,
    )                                                                # v3 sidecar (old schema)
    evolved = spark.createDataFrame(
        [(3, "e3", 9.0, 2, 42.0)],
        "k long, s string, x double, seq long, extra double",
    )
    merge_upsert_manifest(
        spark, evolved, root, keys=["k"], order_col="seq", n_buckets=2,
    )                                                                # v4 sidecar (evolved)
    feed = read_manifest_table_changes(spark, root, v_from=2, keys=["k"])
    rows = {
        (r["k"], r["change_type"], r["commit_version"], r["extra"])
        for r in feed.collect()
    }
    assert (3, "update_postimage", 4, 42.0) in rows
    # v3's sidecar predates the column: NULL-filled in the union
    assert all(t[3] is None for t in rows if t[2] == 3)
    assert {t[2] for t in rows} == {3, 4}


def test_append_after_dv_delete_batches_with_tag(spark, tmp_path):
    """A pure append on a DV-carrying table batches through the tagged
    _load_table_files path with the version's DV subtraction in the
    plan (a no-op on the appended files by construction — a
    pre-existing DV cannot reference them): covers the tag column
    riding through the DV anti-join."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        append_files,
        delete_where_dv,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10).repartition(1), root)     # v1
    delete_where_dv(spark, root, "k < 3")                            # v2 DV
    append_files(spark, _df(spark, 10, 14), root)                    # v3
    feed = read_manifest_table_changes(spark, root, v_from=0, keys=["k"])
    pv = {
        (r["commit_version"], r["change_type"]): r["n"]
        for r in feed.groupBy("commit_version", "change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert pv == {
        (1, "insert"): 10,
        (2, "delete"): 3,
        (3, "insert"): 4,
    }
