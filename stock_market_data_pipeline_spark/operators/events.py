"""Event-stream product analytics: sessionization, funnels, retention cohorts.

The reference treats its event stream as an append-only log consumed by batch
jobs (`/root/reference/src/spark/jobs/spark_batch_processor.py` aggregates per
symbol/time-bucket); these operators add the behavioral-analytics layer any
large-scale event pipeline needs, expressed as pure DataFrame plans:

* ``sessionize``        — row-level session ids (gap rule), one shuffle on key
* ``session_stats``     — per-session rollup of the sessionized stream
* ``funnel``            — strictly-ordered multi-stage conversion funnel;
                          each stage is a co-partitioned equi-join on the user
                          key and the candidate set shrinks monotonically
* ``retention_cohorts`` — classic cohort-week × week-offset retention matrix

100 TB posture: every operator shuffles on the user key only (high
cardinality, naturally balanced); no collects, no cartesian products, no
Python UDFs. The funnel's per-stage join chain re-uses the same hash
partitioning, so AQE coalesces the exchanges between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from stock_market_data_pipeline_spark.utils import to_epoch_seconds


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-key ordinal ``session_id`` using the idle-gap rule.

    A new session starts when the gap to the previous event of the same key
    is >= ``gap_minutes``. One shuffle (hash on ``key``) + one per-key sort;
    the cumulative-sum window is rows-unbounded-preceding, which Spark
    evaluates streamingly within each partition — no buffering of the whole
    key group beyond the sort.
    """
    w_ord = Window.partitionBy(key).orderBy(ts)
    epoch = to_epoch_seconds(ts)  # NTZ-safe: bare cast("long") crashes on NTZ
    gap_expr = epoch - F.lag(epoch).over(w_ord)
    new_session = F.when(
        gap_expr.isNull() | (gap_expr >= gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count, value sum.

    Composes ``sessionize`` with a groupBy on (key, session_id) — the groupBy
    reuses the sessionize shuffle's partitioning (same leading key), so
    Catalyst plans a partial aggregation with no second exchange.
    """
    s = sessionize(df, key=key, ts=ts, gap_minutes=gap_minutes)
    return s.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(to_epoch_seconds(ts)) - F.min(to_epoch_seconds(ts))).alias(
            "duration_sec"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value).alias("value_sum"),
    )


def funnel(
    df: DataFrame,
    stages: list[str],
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered conversion funnel over an event log.

    A user reaches stage *i* iff they performed ``stages[i]`` at a timestamp
    strictly after their (earliest-completion) timestamp for stage *i-1* —
    the standard "first matching path" funnel semantics.

    Plan: stage 0 is a filtered aggregate; each later stage is an equi-join
    on the user key against the (shrinking) survivor set followed by a
    min-aggregate. All joins are shuffle-hash/sort-merge on the same key, so
    the exchange is reused; survivor sets only shrink, never grow. The final
    result is one row per stage (stage name, users reached, conversion from
    stage 0) — a driver-sized output.
    """
    if not stages:
        raise ValueError("funnel requires at least one stage")
    ev = df.select(F.col(user), F.col(ts), F.col(type_col))
    cur = (
        ev.filter(F.col(type_col) == stages[0])
        .groupBy(user)
        .agg(F.min(ts).alias("t0"))
    )
    levels = [cur]
    for i, stage in enumerate(stages[1:], start=1):
        nxt = ev.filter(F.col(type_col) == stage).select(user, ts)
        prev_cols = [f"t{j}" for j in range(i)]
        cur = (
            nxt.join(levels[-1], on=user)
            .filter(F.col(ts) > F.col(f"t{i - 1}"))
            .groupBy(user, *prev_cols)
            .agg(F.min(ts).alias(f"t{i}"))
        )
        levels.append(cur)
    counts = None
    for i, (stage, lvl) in enumerate(zip(stages, levels)):
        c = lvl.agg(F.count(F.lit(1)).alias("users_reached")).select(
            F.lit(i).alias("stage_index"),
            F.lit(stage).alias("stage"),
            F.col("users_reached"),
        )
        counts = c if counts is None else counts.unionByName(c)
    base = F.first(
        F.when(F.col("stage_index") == 0, F.col("users_reached"))
    ).over(Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    ))
    return counts.withColumn(
        "pct_of_top",
        F.round(F.col("users_reached") * 100.0 / base, 2),
    )


def retention_cohorts(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Cohort-week × week-offset retention counts.

    cohort_week(u) = Monday-truncated week of u's first event; a user is
    retained at offset k if they have any event in cohort_week + k weeks.

    Plan: one aggregate for first-events (shuffle on user), one equi-join
    back (same key — exchange reuse), then a distinct-aggregate on
    (cohort_week, offset, user) followed by the count per cell. The matrix
    itself is tiny (#weeks² cells) regardless of input size.
    """
    firsts = df.groupBy(user).agg(
        F.to_date(F.date_trunc("week", F.min(ts))).alias("cohort_week")
    )
    joined = df.select(user, ts).join(firsts, on=user)
    cells = joined.select(
        F.col("cohort_week"),
        (
            F.datediff(F.to_date(F.date_trunc("week", F.col(ts))), F.col("cohort_week"))
            / 7
        )
        .cast("int")
        .alias("week_offset"),
        F.col(user),
    ).distinct()
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
