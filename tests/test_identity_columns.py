"""Identity columns (X149, sinks/manifest_lake.py add_identity_column /
_apply_identity): engine-assigned surrogate keys — contiguous within a
batch, unique across batches, atomic with the commit, ALWAYS semantics,
merge refused.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    IdentityAssignmentError,
    add_identity_column,
    append_files,
    describe_manifest,
    publish_files,
    read_manifest,
)


def _empty_with_schema(spark, root):
    empty = spark.createDataFrame([], "id long, payload string")
    publish_files(spark, empty, root)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload")
    )


def test_identity_assigns_contiguous_unique_across_batches(spark, tmp_path):
    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id", start=100, step=1)
    # multi-partition batch: ids contiguous despite parallel write
    append_files(spark, _batch(spark, 0, 57).repartition(7), root)
    got1 = sorted(r[0] for r in read_manifest(spark, root).select("id").collect())
    assert got1 == list(range(100, 157))
    # second batch continues from the committed high-water mark
    append_files(spark, _batch(spark, 0, 10).repartition(3), root)
    got2 = sorted(r[0] for r in read_manifest(spark, root).select("id").collect())
    assert got2 == list(range(100, 167))
    # each payload got exactly one id (assignment didn't duplicate rows)
    assert read_manifest(spark, root).count() == 67
    d = describe_manifest(spark, root)
    assert d["identity"] == {"id": {"start": 100, "step": 1, "next": 167}}


def test_identity_step_and_always_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id", start=0, step=10)
    append_files(spark, _batch(spark, 0, 5), root)
    got = sorted(r[0] for r in read_manifest(spark, root).select("id").collect())
    assert got == [0, 10, 20, 30, 40]
    # ALWAYS: supplying the column is refused before any commit
    with pytest.raises(IdentityAssignmentError):
        append_files(
            spark,
            spark.createDataFrame([(999, "x")], "id long, payload string"),
            root,
        )
    assert read_manifest(spark, root).count() == 5


def test_identity_declaration_guards(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        add_generated_column,
    )

    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    with pytest.raises(KeyError):
        add_identity_column(spark, root, "nope")
    with pytest.raises(ValueError, match="non-zero"):
        add_identity_column(spark, root, "id", step=0)
    add_identity_column(spark, root, "id")
    with pytest.raises(ValueError, match="already an identity"):
        add_identity_column(spark, root, "id")
    # non-empty table refuses declaration
    root2 = str(tmp_path / "u")
    publish_files(
        spark,
        spark.createDataFrame([(1, "x")], "id long, payload string"),
        root2,
    )
    with pytest.raises(ValueError, match="not empty"):
        add_identity_column(spark, root2, "id")


def test_identity_refused_on_merge_and_survives_replace(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id")
    append_files(spark, _batch(spark, 0, 8), root)
    with pytest.raises(ValueError, match="identity"):
        merge_upsert_manifest(
            spark, _batch(spark, 0, 3), root, keys=["payload"],
            order_col="payload", n_buckets=4,
        )
    # full replace: the rule AND the high-water mark survive (a replace
    # must not recycle ids an old version's rows still hold)
    publish_files(spark, _batch(spark, 0, 4), root)
    got = sorted(r[0] for r in read_manifest(spark, root).select("id").collect())
    assert got == [9, 10, 11, 12]


def test_identity_rebase_conflict_refuses_staged_range(spark, tmp_path):
    """Two appends racing on an identity table: the loser's staged files
    carry ids allocated from the SAME high-water mark the winner
    consumed — recommitting them would duplicate ids, so the rebase
    refuses instead (unlike a plain blind append, which auto-rebases)."""
    from stock_market_data_pipeline_spark.sinks import manifest_lake as ml

    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id")

    real_commit = ml._commit
    raced = {"done": False}

    def commit_with_rival(spark_, root_, entries, fmt, *a, **kw):
        # first APPEND commit attempt: sneak a rival append in first
        if not raced["done"] and kw.get("operation") == "APPEND":
            raced["done"] = True
            append_files(spark, _batch(spark, 100, 105), root)
        return real_commit(spark_, root_, entries, fmt, *a, **kw)

    ml._commit = commit_with_rival
    try:
        with pytest.raises(ml.ManifestConflictError, match="identity"):
            append_files(spark, _batch(spark, 0, 5), root)
    finally:
        ml._commit = real_commit
    # the rival's rows are intact and hold the range; re-running the
    # refused append restages with fresh ids — no duplicates
    append_files(spark, _batch(spark, 0, 5), root)
    ids = [r[0] for r in read_manifest(spark, root).select("id").collect()]
    assert len(ids) == len(set(ids)) == 10


def test_identity_column_guards_against_drop_and_generated(spark, tmp_path):
    """Self-review r15: dropping an identity column would orphan the
    allocation rule behind a resurrection tombstone (every later append
    would break); a generated rule on an identity column would create
    two competing fills. Both refuse."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        add_generated_column,
        drop_column,
    )

    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id")
    with pytest.raises(ValueError, match="IDENTITY"):
        drop_column(spark, root, "id")
    with pytest.raises(ValueError, match="IDENTITY"):
        add_generated_column(spark, root, "id", "1")
    append_files(spark, _batch(spark, 0, 3), root)
    assert read_manifest(spark, root).count() == 3


def test_restore_preserves_identity_high_water_mark(spark, tmp_path):
    """Self-review r15: RESTORE must not rewind the identity allocator —
    a restored table re-issuing ids that post-target (still
    time-travelable) versions hold would corrupt every downstream join.
    Delta documents the same preservation."""
    import time

    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        rollback_manifest,
        rollback_manifest_as_of,
    )

    root = str(tmp_path / "t")
    _empty_with_schema(spark, root)
    add_identity_column(spark, root, "id")
    append_files(spark, _batch(spark, 0, 5), root)       # ids 1..5
    v_target = describe_manifest(spark, root)["version"]
    ts_after_target = int(time.time() * 1000)
    time.sleep(0.05)
    append_files(spark, _batch(spark, 100, 110), root)   # ids 6..15
    rollback_manifest(spark, root, v_target)
    assert read_manifest(spark, root).count() == 5
    # the mark did NOT rewind: new ids continue past BOTH versions
    append_files(spark, _batch(spark, 200, 203), root)
    ids = sorted(r[0] for r in read_manifest(spark, root).select("id").collect())
    assert ids == [1, 2, 3, 4, 5, 16, 17, 18]
    d = describe_manifest(spark, root)
    assert d["identity"]["id"]["next"] == 19
    # timestamp-based restore composes the same way
    root2 = str(tmp_path / "u")
    _empty_with_schema(spark, root2)
    add_identity_column(spark, root2, "id")
    append_files(spark, _batch(spark, 0, 3), root2)
    ts_mid = int(time.time() * 1000)
    time.sleep(0.05)
    append_files(spark, _batch(spark, 10, 14), root2)
    rollback_manifest_as_of(spark, root2, ts_mid)
    assert read_manifest(spark, root2).count() == 3
    append_files(spark, _batch(spark, 20, 22), root2)
    ids2 = sorted(
        r[0] for r in read_manifest(spark, root2).select("id").collect()
    )
    assert ids2 == [1, 2, 3, 8, 9]
