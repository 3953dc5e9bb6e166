"""The local verification mirror must be representation-strict, not just
==-equal (r4 verdict What's-wrong #3): the driver hashes the rendered pandas
representation, where int64 ``1`` != float64 ``1.0`` and ``-0.0`` != ``0.0``,
and it crashes outright on unhashable array cells. A Python-equality mirror
(``1 == 1.0``, ``hash(1) == hash(1.0)``) let a 280-test green suite coexist
with a red driver row. These tests re-introduce each failure mode and demand
the mirror catches it.
"""

from __future__ import annotations

import pytest

from tests.conftest import assert_frames_match, assert_frames_strict


def test_int64_vs_float64_must_fail(spark, duck):
    # The exact r4 event_sessionization bug: DuckDB HUGEINT (windowed sum)
    # reaches pandas as float64 while Spark emits int64. Values are ==-equal;
    # the representation is not, and the driver hash fails.
    sdf = spark.createDataFrame([(2,), (2,)], "x: long")
    sql = "SELECT sum(x) OVER () AS x FROM (VALUES (1), (1)) t(x)"
    with pytest.raises(AssertionError, match="representation-strict"):
        assert_frames_match(sdf, duck, sql, query_name="int_vs_float")


def test_negative_zero_must_fail(spark, duck):
    sdf = spark.createDataFrame([(-0.0,)], "x: double")
    sql = "SELECT 0.0::DOUBLE AS x"
    with pytest.raises(AssertionError, match="representation-strict"):
        assert_frames_strict(sdf, duck, sql, query_name="neg_zero")


def test_array_column_must_crash_like_driver(spark, duck):
    # The r4 quantize_embeddings err: pandas sort_values cannot factorize
    # list cells. The mirror must blow up the same way instead of silently
    # comparing by Python equality.
    # Multi-column frame: pandas lexsort factorizes each key column, which is
    # where unhashable list cells blow up (single-column sorts take a
    # different argsort path and would mask the bug).
    sdf = spark.createDataFrame(
        [(1, [1, 2]), (2, [3, 4])], "id: int, q: array<int>"
    )
    sql = "SELECT 1 AS id, [1, 2] AS q UNION ALL SELECT 2, [3, 4]"
    with pytest.raises((TypeError, AssertionError)):
        assert_frames_strict(sdf, duck, sql, query_name="array_col")


def test_date_rendering_is_compatible(spark, duck):
    # Spark DateType reaches pandas as object datetime.date; DuckDB DATE as
    # an all-midnight datetime64. astype(str) renders both "YYYY-MM-DD", so
    # legitimate date columns keep passing under the strict mirror.
    sdf = spark.sql("SELECT DATE'2024-01-02' AS d, 'a' AS k")
    sql = "SELECT DATE '2024-01-02' AS d, 'a' AS k"
    assert_frames_match(sdf, duck, sql, query_name="date_compat")


def test_timestamp_and_null_rendering_compatible(spark, duck):
    sdf = spark.sql(
        "SELECT TIMESTAMP'2024-01-02 03:04:05' AS ts,"
        " CAST(NULL AS DOUBLE) AS f, CAST(NULL AS STRING) AS s, 1L AS n"
    )
    sql = (
        "SELECT TIMESTAMP '2024-01-02 03:04:05' AS ts,"
        " NULL::DOUBLE AS f, NULL::VARCHAR AS s, 1::BIGINT AS n"
    )
    assert_frames_match(sdf, duck, sql, query_name="ts_null_compat")
