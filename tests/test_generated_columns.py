"""Generated columns (X148, sinks/manifest_lake.py
add_generated_column / _apply_generated): GENERATED ALWAYS AS rules fill
omitted columns at the write, validate supplied ones, survive every
write mode and a full replace, and compose with pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.manifest_lake import (
    GeneratedColumnViolationError,
    add_generated_column,
    append_files,
    describe_manifest,
    drop_generated_column_rule,
    publish_files,
    read_manifest,
    read_manifest_pruned,
)


def _df(spark, lo, hi, with_day=True):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.to_timestamp(
            F.concat(
                F.lit("2026-01-0"),
                (F.col("id") % 5 + 1).cast("string"),
                F.lit(" 12:00:00"),
            )
        ).alias("ts"),
    )
    if with_day:
        df = df.withColumn("day", F.col("ts").cast("date"))
    return df


def test_generated_fill_validate_and_history_gate(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 50), root, stats_cols=["day"])
    v = add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    assert describe_manifest(spark, root)["generated_cols"] == {
        "day": "CAST(ts AS DATE)"
    }
    # a batch OMITTING the column gets it computed engine-side
    append_files(spark, _df(spark, 50, 60, with_day=False), root)
    got = read_manifest(spark, root)
    assert got.filter("day is null or day <> CAST(ts AS DATE)").count() == 0
    assert got.count() == 60
    # a batch SUPPLYING correct values passes
    append_files(spark, _df(spark, 60, 65), root)
    # a batch SUPPLYING wrong values is refused before any commit
    bad = _df(spark, 65, 70, with_day=False).withColumn(
        "day", F.lit("1999-01-01").cast("date")
    )
    with pytest.raises(GeneratedColumnViolationError):
        append_files(spark, bad, root)
    assert read_manifest(spark, root).count() == 65
    # declaring a rule history violates is refused (a self-referencing
    # rule like "k + 1" is refused even earlier — see
    # test_generated_rule_may_not_reference_generated_column)
    with pytest.raises(GeneratedColumnViolationError):
        add_generated_column(spark, root, "k", "CAST(0 AS BIGINT)")
    assert v == 2


def test_generated_survives_full_replace_and_feeds_pruning(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 40), root, stats_cols=["day"])
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    # full replace: rules are table properties and survive
    publish_files(
        spark,
        _df(spark, 0, 100, with_day=False).repartitionByRange(5, "ts"),
        root,
        stats_cols=["day"],
    )
    assert describe_manifest(spark, root)["generated_cols"] != {}
    got = read_manifest(spark, root)
    assert "day" in got.columns
    assert got.filter("day <> CAST(ts AS DATE)").count() == 0
    # the generated column carries per-file stats: day-pruned reads skip
    import datetime as dt

    pruned = read_manifest_pruned(
        spark, root, "day", dt.date(2026, 1, 2), dt.date(2026, 1, 2)
    )
    assert 0 < len(pruned.inputFiles()) < 5
    assert pruned.count() == 20


def test_generated_on_merge_and_drop_interplay(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.manifest_lake import (
        drop_column,
        merge_upsert_manifest,
    )

    root = str(tmp_path / "t")
    merge_upsert_manifest(
        spark, _df(spark, 0, 30), root, keys=["k"], order_col="ts",
        n_buckets=4,
    )
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    merge_upsert_manifest(
        spark, _df(spark, 30, 40, with_day=False), root, keys=["k"],
        order_col="ts", n_buckets=4,
    )
    got = read_manifest(spark, root)
    assert got.count() == 40
    assert got.filter("day is null").count() == 0
    # dropping the SOURCE column of a rule refuses; dropping the
    # generated column itself retires its rule
    with pytest.raises(ValueError, match="feeds generated"):
        drop_column(spark, root, "ts")
    drop_column(spark, root, "day")
    assert describe_manifest(spark, root)["generated_cols"] == {}
    # rule management
    publish_files(spark, _df(spark, 0, 10), str(tmp_path / "u"))
    with pytest.raises(KeyError):
        drop_generated_column_rule(spark, str(tmp_path / "u"), "day")


def test_generated_rule_lifecycle(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_files(spark, _df(spark, 0, 20), root)
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    with pytest.raises(ValueError, match="already generated"):
        add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    with pytest.raises(KeyError):
        add_generated_column(spark, root, "nope", "1")
    drop_generated_column_rule(spark, root, "day")
    # rule gone: arbitrary values accepted again
    weird = _df(spark, 20, 25, with_day=False).withColumn(
        "day", F.lit("1999-01-01").cast("date")
    )
    append_files(spark, weird, root)
    assert read_manifest(spark, root).filter(
        "day = DATE '1999-01-01'"
    ).count() == 5


def test_generated_rule_may_not_reference_generated_column(spark, tmp_path):
    """round-16 advice: _apply_generated fills omitted rules in
    sorted-name order, so a rule reading another generated column sees
    it missing whenever a batch omits both — refused at declaration
    (Delta documents the same restriction), in BOTH directions, plus
    self-reference. A string literal containing the name is NOT a
    reference."""
    root = str(tmp_path / "t")
    df = _df(spark, 0, 20).withColumn(
        "day2", F.col("ts").cast("date")
    ).withColumn("tag", F.concat(F.lit("day:"), F.col("k")))
    publish_files(spark, df, root)
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    # forward: new rule reads an existing generated column
    with pytest.raises(ValueError, match="references generated column"):
        add_generated_column(spark, root, "day2", "day")
    # reverse: an existing rule reads the would-be generated column
    drop_generated_column_rule(spark, root, "day")
    add_generated_column(spark, root, "day2", "CAST(day AS DATE)")
    with pytest.raises(ValueError, match="references 'day'"):
        add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    drop_generated_column_rule(spark, root, "day2")
    # self-reference refused
    with pytest.raises(ValueError, match="references itself"):
        add_generated_column(spark, root, "day", "date_add(day, 0)")
    # a name inside a string literal is not a reference
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    add_generated_column(
        spark, root, "tag", "concat('day:', CAST(k AS STRING))"
    )


def test_generated_reference_guard_sees_through_quoting_and_case(
    spark, tmp_path
):
    """r16 review: the rule-over-rule guard must catch backtick-quoted
    and case-differing references (Spark resolves columns
    case-insensitively) and must NOT flag a FUNCTION named like a
    column."""
    root = str(tmp_path / "t")
    df = _df(spark, 0, 10).withColumn("day2", F.col("ts").cast("date"))
    publish_files(spark, df, root)
    add_generated_column(spark, root, "day", "CAST(ts AS DATE)")
    with pytest.raises(ValueError, match="references generated column"):
        add_generated_column(spark, root, "day2", "CAST(`day` AS DATE)")
    with pytest.raises(ValueError, match="references generated column"):
        add_generated_column(spark, root, "day2", "CAST(DAY AS DATE)")
    # day(ts) is the SQL function, not the generated column
    add_generated_column(spark, root, "day2", "make_date(2026, 1, day(ts))")
