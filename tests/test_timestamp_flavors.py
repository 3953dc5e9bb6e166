"""Timestamp-flavor robustness: ts-arithmetic operators must produce the
SAME results whether the input column is TIMESTAMP_NTZ (how the lake reads
under ``inferTimestampNTZ``) or TIMESTAMP_LTZ (classic flavor).

This is the round-3 bug class: ``sessionize`` used a bare ``cast("long")``
which is legal on LTZ but raises ``DATATYPE_MISMATCH`` on NTZ, so the
operator worked in ad-hoc LTZ tests and crashed on the real lake. With the
session timezone pinned to UTC (session.py) the two flavors denote the same
instants, so every operator must be flavor-blind.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.events import (
    last_touch_attribution,
    retention_cohorts,
    scd2_history,
    session_stats,
    sessionize,
)
from stock_market_data_pipeline_spark.operators.gapfill import gapfill_forward_fill
from stock_market_data_pipeline_spark.operators.joins import as_of_join
from stock_market_data_pipeline_spark.operators.windows import (
    session_windows,
    sliding_metrics,
)

PKG = Path(__file__).resolve().parents[1] / "stock_market_data_pipeline_spark"


def _events(spark, sf_dir, flavor):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    if flavor == "ntz":
        # inferTimestampNTZ is on in the session factory; assert, don't assume.
        assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
        return ev
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def _norm(rows, cols):
    out = set()
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            vals.append(v.isoformat() if hasattr(v, "isoformat") else v)
        out.add(tuple(vals))
    return out


def _both(spark, sf_dir, fn):
    a = fn(_events(spark, sf_dir, "ntz"))
    b = fn(_events(spark, sf_dir, "ltz"))
    cols = a.columns
    assert cols == b.columns
    ra, rb = _norm(a.collect(), cols), _norm(b.collect(), cols)
    assert ra == rb, f"flavor mismatch: {len(ra ^ rb)} differing rows"
    assert len(ra) > 0


@pytest.mark.parametrize(
    "name,fn",
    [
        ("sessionize", lambda ev: sessionize(ev, key="user_id", ts="ts")),
        (
            "session_stats",
            lambda ev: session_stats(ev, key="user_id", ts="ts", value="value"),
        ),
        ("retention_cohorts", lambda ev: retention_cohorts(ev)),
        ("scd2_history", lambda ev: scd2_history(ev)),
        (
            "last_touch_attribution",
            lambda ev: last_touch_attribution(ev),
        ),
        (
            "session_windows",
            lambda ev: session_windows(
                ev.select("user_id", "ts"), key="user_id", ts="ts"
            ),
        ),
        (
            "sliding_metrics",
            lambda ev: sliding_metrics(
                ev.select(
                    F.col("event_type").alias("symbol"),
                    F.col("ts").alias("timestamp"),
                    F.col("value").alias("price"),
                    F.lit(100).alias("volume"),
                ),
                "15 minutes",
                "5 minutes",
                "15m",
            ),
        ),
        (
            "gapfill",
            lambda ev: gapfill_forward_fill(
                ev.select(
                    F.col("event_type").alias("symbol"),
                    F.col("ts").alias("timestamp"),
                    F.col("value").alias("price"),
                    F.lit(100).alias("volume"),
                    "event_id",
                ),
                step_minutes=15,
                tiebreak="event_id",
            ),
        ),
        (
            "as_of_join",
            lambda ev: as_of_join(
                ev.filter(F.col("event_type") == "purchase").select(
                    "user_id", F.col("ts").alias("pts"), "event_id"
                ),
                ev.filter(F.col("event_type") == "click").select(
                    "user_id", F.col("ts").alias("cts"), F.col("value").alias("v")
                ),
                key="user_id",
                left_ts="pts",
                right_ts="cts",
            ),
        ),
    ],
)
def test_operator_is_timestamp_flavor_blind(spark, sf_dir, name, fn):
    _both(spark, sf_dir, fn)


def test_no_bare_long_cast_on_timestamp_columns():
    """Grep-able ban on the bug pattern: ``F.col(<ts>).cast("long")`` applied
    straight to a timestamp column. NTZ-safe arithmetic goes through
    ``utils.to_epoch_seconds`` (or ``unix_timestamp``), never a bare cast."""
    pat = re.compile(
        r"F\.col\((?:ts|left_ts|right_ts|ts_col|\"ts\"|'ts'|\"timestamp\"|'timestamp')\)"
        r"(?:\s*\.cast\(\s*[\"']long[\"']\s*\))"
    )
    offenders = [
        str(p)
        for p in PKG.rglob("*.py")
        if pat.search(p.read_text(encoding="utf-8"))
    ]
    assert offenders == [], f"bare cast('long') on ts columns in: {offenders}"
