"""Behavioral tests for the data-quality expectations operator: budget
semantics, uniqueness, null-predicate handling, and the gate form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.expectations import (
    accepted_values,
    custom,
    fail_on_violations,
    in_range,
    not_null,
    run_expectations,
    unique,
)


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "b", None),     # null price
        (4, "zz", 5.0),     # bad symbol
        (4, "a", 7.0),      # duplicate id
    ]
    return spark.createDataFrame(rows, "id long, sym string, price double")


def test_report_counts_and_budgets(spark):
    df = _df(spark)
    report = {
        r.check: r
        for r in run_expectations(
            df,
            [
                not_null("price"),  # 1 violation, strict -> fails
                accepted_values("sym", ["a", "b"]),
                in_range("price", 0.0, 15.0),
                unique(["id"]),
            ],
        ).collect()
    }
    strict = report["not_null(price)"]
    assert (strict.violations, strict.total, strict.passed) == (1, 5, 0)
    # budgeted variant: 1 violation <= round(0.25 * 5) -> passes
    rows = run_expectations(
        df, [not_null("price", max_null_frac=0.25)]
    ).collect()
    assert rows[0].passed == 1
    assert report["accepted_values(sym)"].violations == 1
    # in_range: 20.0 out of range + NULL counts as violation = 2
    assert report["in_range(price,0.0,15.0)"].violations == 2
    u = report["unique(id)"]
    assert (u.violations, u.total, u.passed) == (1, 4, 0)


def test_custom_null_predicate_counts_as_violation(spark):
    df = _df(spark)
    rows = run_expectations(
        df, [custom("price_gt_1", ~(F.col("price") > 1.0))]
    ).collect()
    # price NULL -> predicate NULL -> counted as violation (conservative)
    assert rows[0].violations == 1


def test_gate_raises_with_detail(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match=r"unique\(id\): 1/4"):
        fail_on_violations(df, [unique(["id"])])
    # passing suite does not raise
    fail_on_violations(df, [not_null("id")])


def test_single_pass_plan(spark):
    """All row checks fold into ONE aggregate over one scan (the reference
    ran a count() action per check)."""
    df = _df(spark)
    rep = run_expectations(
        df,
        [not_null("price"), in_range("price", 0, 100), accepted_values("sym", ["a", "b"])],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") + plan.count("FileScan") <= 2  # local scan x1 (existing + none extra)
