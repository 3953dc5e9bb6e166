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


def assert_frames_match(spark_df, duck_con, sql, query_name=""):
    """Mirror of the driver's check: row count + column names + order-insensitive
    normalized-value multiset equality (floats rounded to 6 dp)."""
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
