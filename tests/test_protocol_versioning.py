"""Manifest protocol versioning (X157 — Delta's minReader/WriterVersion
+ table features, Iceberg's format-version): every commit records the
format version and the reader/writer feature lists a consumer must
implement; a build that doesn't implement them refuses LOUDLY instead of
silently misreading (ignored DV subtraction resurrects deleted rows,
ignored segment refs miss files). Tables written before the field exist
read as version 1 with no features.
"""

from __future__ import annotations

import json

import pytest

import stock_market_data_pipeline_spark.sinks.manifest_lake as ml
from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS
from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    append_files,
    delete_where_dv,
    drop_column,
    enable_change_feed,
    merge_upsert_manifest,
    publish_files,
    read_manifest,
)


def _df(spark, lo, hi):
    rows = [(k, f"s{k}", 0) for k in range(lo, hi)]
    return spark.createDataFrame(rows, "k long, s string, seq long")


def _meta(spark, root, version=None):
    fs = _HadoopFS(spark, root)
    _, meta = ml._resolve_manifest(fs, root, version)
    return meta


def _edit_manifest(spark, root, version, fn):
    fs = _HadoopFS(spark, root)
    p = f"{ml._mf_dir(root)}/{ml._mf_name(version)}"
    meta = json.loads(fs.read_text(p))
    fn(meta)
    fs.write_text(p, json.dumps(meta, default=str))


def test_commits_record_format_and_features(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)                    # v1
    fmt = _meta(spark, root)["format"]
    assert fmt["version"] == 1
    assert fmt["reader_features"] == []
    delete_where_dv(spark, root, "k < 2")                            # v2
    fmt = _meta(spark, root)["format"]
    assert "deletion-vectors" in fmt["reader_features"]
    drop_column(spark, root, "seq")                                  # v3
    fmt = _meta(spark, root)["format"]
    assert "column-tombstones" in fmt["reader_features"]
    assert "deletion-vectors" in fmt["reader_features"]  # monotone
    enable_change_feed(spark, root)                                  # v4
    fmt = _meta(spark, root)["format"]
    assert "change-data-feed" in fmt["writer_features"]


def test_bucketed_merge_records_writer_feature(spark, tmp_path):
    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 10), root, keys=["k"], order_col="seq",
        n_buckets=2,
    )
    fmt = _meta(spark, root)["format"]
    assert "bucketed-layout" in fmt["writer_features"]


def test_stripped_reader_refuses_dv_table(spark, tmp_path, monkeypatch):
    """The defect this closes: a reader build predating deletion
    vectors would silently resurrect deleted rows. With the feature
    recorded it refuses instead."""
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)
    delete_where_dv(spark, root, "k < 3")
    assert read_manifest(spark, root).count() == 7  # this build: fine
    monkeypatch.setattr(
        ml, "_READER_FEATURES", ml._READER_FEATURES - {"deletion-vectors"}
    )
    with pytest.raises(ValueError, match="deletion-vectors"):
        read_manifest(spark, root).count()


def test_stripped_writer_refuses_but_still_reads(spark, tmp_path,
                                                 monkeypatch):
    """Delta's contract: an unknown WRITER feature blocks writes (the
    build would commit rows violating the table's write rules) but
    never pure reads."""
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 5), root)
    enable_change_feed(spark, root)
    monkeypatch.setattr(
        ml,
        "_WRITER_FEATURES",
        ml._WRITER_FEATURES - {"change-data-feed"},
    )
    assert read_manifest(spark, root).count() == 5  # reads fine
    with pytest.raises(ValueError, match="change-data-feed"):
        append_files(spark, _df(spark, 5, 8), root)


def test_future_format_version_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 3), root)
    _edit_manifest(
        spark, root, 1, lambda m: m.__setitem__("format", {"version": 99})
    )
    with pytest.raises(ValueError, match="format version 99"):
        read_manifest(spark, root).count()


def test_unknown_future_feature_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 3), root)
    _edit_manifest(
        spark,
        root,
        1,
        lambda m: m.__setitem__(
            "format", {"version": 1, "reader_features": ["row-lineage"]}
        ),
    )
    with pytest.raises(ValueError, match="row-lineage"):
        read_manifest(spark, root).count()


def test_preversioning_table_reads_as_v1(spark, tmp_path):
    """Tables written before r18 carry no format key — they read as
    version 1 with no features (nothing they contain needs one)."""
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 4), root)
    _edit_manifest(spark, root, 1, lambda m: m.pop("format"))
    assert read_manifest(spark, root).count() == 4
    # and remain writable: the next commit starts recording again
    append_files(spark, _df(spark, 4, 6), root)
    assert _meta(spark, root)["format"]["version"] == 1


def test_feature_survives_maintenance_monotone(spark, tmp_path):
    """A DV purge retires the sidecar but the feature stays declared
    (Delta's protocol is monotone; downgrade is explicit) — a stale
    reader keeps refusing rather than guessing whether any retained
    version still needs it."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        purge_deletion_vectors,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 10), root)
    delete_where_dv(spark, root, "k < 3")
    purge_deletion_vectors(spark, root)
    meta = _meta(spark, root)
    assert not meta.get("dv")
    assert "deletion-vectors" in meta["format"]["reader_features"]


def test_restore_gates_current_writer_features_and_unions_format(
    spark, tmp_path, monkeypatch
):
    """r18 review: a restore commits a version DERIVED from the
    current state (txns, change_feed, the CDF delete frame), so it
    must writer-gate the CURRENT manifest — not only the target the
    carry reads — and the restored version's protocol lists must
    UNION both sides (carrying only the target's would silently
    downgrade features the clobbered latest declared)."""
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        rollback_manifest,
    )

    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 5), root)                     # v1
    enable_change_feed(spark, root)                                  # v2
    rollback_manifest(spark, root, 1)                                # v3
    fmt = _meta(spark, root)["format"]
    assert "change-data-feed" in fmt["writer_features"]  # monotone
    monkeypatch.setattr(
        ml,
        "_WRITER_FEATURES",
        ml._WRITER_FEATURES - {"change-data-feed"},
    )
    with pytest.raises(ValueError, match="change-data-feed"):
        rollback_manifest(spark, root, 1)
