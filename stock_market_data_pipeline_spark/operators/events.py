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

from stock_market_data_pipeline_spark.utils import (
    round_det,
    to_epoch_micros,
    to_epoch_seconds,
)


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-key ordinal ``session_id`` using the idle-gap rule.

    A new session starts when the gap to the previous event of the same key
    is STRICTLY greater than ``gap_minutes``; a gap of exactly the
    threshold stays in the session, matching Spark's native
    ``session_window`` (whose merge test is inclusive: an event landing
    exactly at ``last + gap`` extends the session — pinned by
    tests/test_stream_merge.py::test_subsecond_gap_boundary_batch_stream_agree). One shuffle (hash on ``key``) + one per-key sort;
    the cumulative-sum window is rows-unbounded-preceding, which Spark
    evaluates streamingly within each partition — no buffering of the whole
    key group beyond the sort.

    The gap compares MICROsecond epochs: Spark's native ``session_window``
    (the streaming twin, ``stream_session_stats``) is sub-second-precise,
    and flooring to seconds splits a session the native window merges
    whenever the true gap lands within 1 s below the threshold — a real
    event pair at sf0.1 (gap 1799.337 s → floored 1800) caught exactly
    this, so the precision is part of the parity contract, not pedantry.
    """
    w_ord = Window.partitionBy(key).orderBy(ts)
    micros = to_epoch_micros(ts)  # NTZ-safe + sub-second (see utils)
    gap_expr = micros - F.lag(micros).over(w_ord)
    new_session = F.when(
        gap_expr.isNull() | (gap_expr > gap_minutes * 60_000_000), F.lit(1)
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
    max_gap_minutes: int | None = None,
) -> DataFrame:
    """Strictly-ordered conversion funnel over an event log.

    A user reaches stage *i* iff they performed ``stages[i]`` at a timestamp
    strictly after their (earliest-completion) timestamp for stage *i-1* —
    the standard "first matching path" funnel semantics. With
    ``max_gap_minutes`` set, each stage must additionally land within that
    deadline of the previous stage's completion (the "converted within N
    days" product question); the bound is an extra residual predicate on the
    same equi-join, so the plan shape is unchanged.

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
        cond = F.col(ts) > F.col(f"t{i - 1}")
        if max_gap_minutes is not None:
            cond = cond & (
                to_epoch_seconds(ts) - to_epoch_seconds(F.col(f"t{i - 1}"))
                <= max_gap_minutes * 60
            )
        cur = (
            nxt.join(levels[-1], on=user)
            .filter(cond)
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
        round_det(
            F.col("users_reached") * 100.0
            / F.nullif(base.cast("double"), F.lit(0.0)),
            2,
        ),
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


def last_touch_attribution(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    value: str = "value",
    conversion: str = "purchase",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is credited
    to the user's most recent PRECEDING non-conversion event type (their
    last marketing touch); conversions with no prior touch credit
    ``'direct'``. Output: one row per source with conversion count and
    value — the report a growth team reads daily.

    Plan: one window over (user, ts, tiebreak) carrying the last non-null
    touch (``last(..., ignorenulls)`` over an unbounded-preceding-to--1
    frame — evaluated streamingly within each key after the one shuffle on
    the user key), then a filter to conversions and a tiny groupBy on the
    source label. Same single-shuffle shape as ``sessionize``; the
    ``tiebreak`` column makes ordering total so results are identical under
    any partitioning.
    """
    w = (
        Window.partitionBy(user)
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.withColumn("attributed_source", F.coalesce(touch, F.lit("direct")))
        .filter(F.col(type_col) == conversion)
        .groupBy("attributed_source")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            round_det(F.sum(value), 6).alias("value_sum"),
        )
    )


def scd2_history(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Derive a type-2 slowly-changing-dimension history from a change log:
    collapse consecutive rows where ``attr`` is unchanged, emit one validity
    interval per run — (key, attr, effective_from, effective_to, is_current),
    ``effective_to`` NULL on the open current row. This is the
    warehouse-side dimension-history derivation (the reference loads
    dimensions with blind full-refresh,
    `/root/reference/src/snowflake/scripts/load_to_snowflake.py` — no
    history; SCD2 is what a real warehouse keeps).

    Plan: one shuffle on the key; two windows over the SAME (key, ts,
    tiebreak) sort — change detection via lag, interval close via lead on
    the change rows (a filter, so the second window reuses the sort and
    partitioning). Output is O(#changes), not O(#events).
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    marked = df.select(
        F.col(key), F.col(ts), F.col(attr), F.col(tiebreak)
    ).withColumn(
        "_chg",
        (
            F.lag(attr).over(w).isNull()
            | (F.col(attr) != F.lag(attr).over(w))
        ).cast("int"),
    )
    changes = marked.filter(F.col("_chg") == 1)
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return changes.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("effective_from"),
        F.lead(ts).over(w2).alias("effective_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def event_transition_matrix(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over the event stream: for each
    user, count consecutive (from_type → to_type) steps, then aggregate
    globally with each from-state's transition probability — the navigation
    /behavior matrix product analytics reads (and a quick anomaly signal:
    improbable transitions).

    Plan: one shuffle on the user key, one lag window, then a tiny groupBy
    on (from, to) — |types|² output rows. The probability denominator
    reuses a window over the from-state of the aggregated frame
    (driver-sized), not a second pass over the data.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    steps = (
        df.select(F.col(key), F.col(ts), F.col(type_col), F.col(tiebreak))
        .withColumn("from_type", F.lag(type_col).over(w))
        .filter(F.col("from_type").isNotNull())
        .select("from_type", F.col(type_col).alias("to_type"))
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        round_det(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_from).cast("double"),
            6,
        ).alias("p_transition"),
    )


def merge_intervals(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Merge overlapping/touching intervals per key into disjoint coverage
    segments — the classic sweep-line union (uptime stitching, ad-exposure
    coverage, maintenance-window consolidation). Segments are maximal runs
    where each interval starts at or before the running max end of its
    predecessors; adjacent intervals (start == previous end) merge.

    Output: one row per (key, segment) — ``seg_start``, ``seg_end``,
    ``n_merged`` (intervals folded into the segment).

    Plan: ONE shuffle on the key, two window passes over the same sort
    (running max end → segment id via a conditional running count), one
    groupBy on (key, seg_id). No self-join — the naive "overlapping pairs"
    formulation is O(n²) per key; the sweep is O(n log n) and scales to
    billions of intervals as long as single keys fit a partition (the same
    envelope sessionize already documents).
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_seg = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
    ).otherwise(0)
    seg_id = F.sum(new_seg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_seg", seg_id)
        .groupBy(key, "_seg")
        .agg(
            F.min(start).alias("seg_start"),
            F.max(end).alias("seg_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_seg")
    )
