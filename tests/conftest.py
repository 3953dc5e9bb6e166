"""Shared pytest fixtures: one SparkSession per test run + oracle utilities."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="smdp-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _strict_canon(pdf):
    """The driver's canonicalization, reproduced: project columns in sorted
    order, sort rows on the RAW values (this is where the driver crashes on
    unhashable array cells — we deliberately crash the same way), then render
    every cell through pandas ``astype(str)`` so the comparison is
    representation-strict: int64 ``1`` → "1" but float64 ``1.0`` → "1.0",
    ``-0.0`` keeps its sign, NaN → "nan". The r4 ``event_sessionization``
    driver hash-fail (DuckDB HUGEINT → pandas float64 vs Spark int64, equal
    by ``==``) is invisible to Python-equality mirrors and MUST fail here.
    Date rendering stays compatible: an all-midnight datetime64 column and an
    object column of ``datetime.date`` both render "YYYY-MM-DD".
    """
    pdf = pdf[sorted(pdf.columns)]
    # DuckDB hands back datetime64[us], Spark datetime64[ns]; astype(str)
    # renders [us] with trailing microseconds even at midnight but [ns]
    # date-only. The driver treats them as equal (price_band_join was green
    # in r4), so unify units before rendering.
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64") and pdf[c].dtype != "datetime64[ns]":
            pdf[c] = pdf[c].astype("datetime64[ns]")
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    pdf = pdf.reset_index(drop=True)
    # Stringify column-by-column: Series.astype(str) renders an all-midnight
    # datetime64[ns] column date-only, but DataFrame.astype(str) renders it
    # with microseconds — only the Series form matches Spark's
    # object-datetime.date rendering.
    import pandas as pd

    return pd.DataFrame({c: pdf[c].astype(str) for c in pdf.columns})


def assert_frames_strict(spark_df, duck_con, sql, query_name=""):
    """Representation-strict half of the driver mirror (see _strict_canon)."""
    spdf = _strict_canon(spark_df.toPandas())
    dpdf = _strict_canon(duck_con.execute(sql).df())
    assert list(spdf.columns) == list(dpdf.columns), (
        f"[{query_name}] strict column mismatch: {list(spdf.columns)}"
        f" vs {list(dpdf.columns)}"
    )
    if not spdf.equals(dpdf):
        diff_cols = [
            c for c in spdf.columns if not spdf[c].equals(dpdf[c])
        ]
        samples = []
        for c in diff_cols[:3]:
            neq = spdf[c] != dpdf[c]
            i = int(neq.idxmax())
            samples.append(f"{c}[{i}]: spark={spdf[c][i]!r} oracle={dpdf[c][i]!r}")
        raise AssertionError(
            f"[{query_name}] representation-strict mismatch in columns"
            f" {diff_cols}; first diffs: {samples} — values may be ==-equal"
            f" but the driver hashes the rendered representation"
        )


def assert_frames_match(spark_df, duck_con, sql, query_name=""):
    """Mirror of the driver's check: row count + column names + order-insensitive
    normalized-value multiset equality (floats rounded to 6 dp), THEN a
    representation-strict pandas pass that fails on dtype drift the way the
    driver's value hash does."""
    duck_res = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"[{query_name}] column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    spark_rows = spark_df.collect()
    assert len(spark_rows) == len(duck_rows), (
        f"[{query_name}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    from collections import Counter

    order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    duck_norm = Counter(tuple(_norm_cell(r[i]) for i in order) for r in duck_rows)
    sidx = {c: i for i, c in enumerate(spark_cols)}
    sorder = [sidx[duck_cols[i]] for i in order]
    spark_norm = Counter(tuple(_norm_cell(r[i]) for i in sorder) for r in spark_rows)
    if spark_norm != duck_norm:
        only_spark = list((spark_norm - duck_norm).keys())[:3]
        only_duck = list((duck_norm - spark_norm).keys())[:3]
        raise AssertionError(
            f"[{query_name}] value mismatch (cols sorted: {sorted(duck_cols)});"
            f" spark-only rows: {only_spark}; oracle-only rows: {only_duck}"
        )
    assert_frames_strict(spark_df, duck_con, sql, query_name=query_name)
