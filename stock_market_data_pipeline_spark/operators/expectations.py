"""Declarative data-quality expectations — the production generalization of
the reference's ``validate_stock_data`` checklist (required columns,
``price <= 0`` count, future timestamps — `/root/reference/README.md:676-694`)
and its count-validation guards (SURVEY P4/A7).

A suite of named checks compiles to ONE conditional-aggregation pass over the
frame (the reference ran one ``count()`` action per check — a full scan each
at 100 TB), plus one extra group-pass per uniqueness check. The result is a
small report frame (one row per check), suitable for gating a pipeline stage
(`fail_on_violations`) or landing in a QA table.

Check types:

* ``not_null(col, max_null_frac=0.0)`` — null fraction at most the budget
* ``in_range(col, lo, hi)``            — no value outside [lo, hi]
* ``accepted_values(col, values)``     — every value ∈ values (nulls fail)
* ``unique(cols)``                     — no duplicate key combination
* ``custom(name, predicate)``          — rows violating an arbitrary Column
  predicate (predicate = True means VIOLATION)

All scale-safe: conditional sums partial-aggregate map-side; ``unique`` is a
count-distinct-vs-count comparison (one extra shuffle keyed on the checked
columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    kind: str
    violation: Column | None = None  # rows where this is True violate
    cols: list[str] = field(default_factory=list)
    budget_frac: float = 0.0  # allowed violation fraction (0 = strict)


def not_null(col: str, max_null_frac: float = 0.0) -> Expectation:
    return Expectation(
        name=f"not_null({col})",
        kind="row",
        violation=F.col(col).isNull(),
        budget_frac=max_null_frac,
    )


def in_range(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        name=f"in_range({col},{lo},{hi})",
        kind="row",
        violation=~F.col(col).between(lo, hi) | F.col(col).isNull(),
    )


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        name=f"accepted_values({col})",
        kind="row",
        violation=~F.col(col).isin(values) | F.col(col).isNull(),
    )


def unique(cols: list[str]) -> Expectation:
    return Expectation(
        name=f"unique({','.join(cols)})", kind="unique", cols=list(cols)
    )


def custom(name: str, predicate: Column) -> Expectation:
    return Expectation(name=name, kind="row", violation=predicate)


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Evaluate all checks; return one report row per check:
    ``check``, ``violations`` (long), ``total`` (long), ``passed`` (0/1 —
    violations within the check's budget fraction)."""
    row_checks = [c for c in checks if c.kind == "row"]
    agg_exprs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.coalesce(c.violation.cast("long"), F.lit(1))).alias(f"_v{i}")
        for i, c in enumerate(row_checks)
    ]
    base = df.agg(*agg_exprs)
    reports: list[DataFrame] = []
    if row_checks:
        selects = []
        for i, c in enumerate(row_checks):
            selects.append(
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"_v{i}").alias("violations"),
                    F.col("_total").alias("total"),
                    (
                        F.col(f"_v{i}")
                        <= F.round(F.lit(c.budget_frac) * F.col("_total"), 0)
                    )
                    .cast("int")
                    .alias("passed"),
                ).alias(f"_s{i}")
            )
        packed = base.select(
            F.explode(F.array(*selects)).alias("r")
        ).select("r.check", "r.violations", "r.total", "r.passed")
        reports.append(packed)
    for c in checks:
        if c.kind != "unique":
            continue
        rep = (
            df.groupBy(*c.cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.lit(c.name).alias("check"),
                F.sum((F.col("_n") > 1).cast("long")).alias("violations"),
                F.count(F.lit(1)).alias("total"),
                (F.sum((F.col("_n") > 1).cast("long")) == 0)
                .cast("int")
                .alias("passed"),
            )
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def fail_on_violations(df: DataFrame, checks: list[Expectation]) -> None:
    """Gate form: raise ValueError listing every failed check (pipeline
    stage guard, the O1/O2 orchestration pattern applied to content)."""
    failed = [
        r for r in run_expectations(df, checks).collect() if r.passed == 0
    ]
    if failed:
        detail = "; ".join(
            f"{r.check}: {r.violations}/{r.total}" for r in failed
        )
        raise ValueError(f"data-quality expectations failed: {detail}")
