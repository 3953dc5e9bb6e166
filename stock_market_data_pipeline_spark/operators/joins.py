"""Joins (SURVEY J1) + the as-of join extension.

Reference parity: J1 — inner equi-join of the 15-minute sliding aggregates to
the 1-hour sliding aggregates on the composite key (symbol, window_start)
(``spark_stream_batch_processor.py:175-193``). Because 15-min windows slide
every 5 min and 1-h windows every 10 min, window_start equality only matches
at 10-minute-aligned starts — the join keeps every other 15-min window; that
semantic is preserved exactly (SURVEY §2.3 note).

The *streaming* variant in the reference joins two windowed streaming
aggregations — an illegal Structured Streaming plan
(``spark_stream_processor.py:216-234``). The engine's legal equivalent runs
this batch join inside ``foreachBatch`` (streaming/pipeline.py).

Scale notes: both sides arrive pre-aggregated (cardinality ≈ #symbols ×
#windows — tiny next to the tick table), so Catalyst/AQE picks broadcast-hash
automatically when one side fits; at 100 TB of ticks both agg outputs are
still small and the join never touches raw-tick volume. ``broadcast_right``
forces the hint for planners without fresh stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_windowed_metrics(
    left: DataFrame,
    right: DataFrame,
    key: str = "symbol",
    window_start: str = "window_start",
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1: equi-join two windowed-metric tables on (key, window_start).

    Uses the USING-style join (list of names) so the key columns appear once
    in the output — the reference instead selects ``df_15min["symbol"]`` to
    drop the duplicate (``spark_stream_processor.py:224``).
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=[key, window_start], how=how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (finance extension, not in the reference — SURVEY §2.3):
    for each left row, attach the latest right row with right_ts <= left_ts
    (``direction="backward"``, the default) or the EARLIEST right row with
    right_ts >= left_ts (``direction="forward"`` — next-quote-after-trade
    semantics). Both directions are the same single key-shuffle union +
    carry-forward window; forward simply reverses the time ordering.

    Implemented as union + last-value window (single shuffle on key) rather
    than a range join: tag both sides, union by name, and carry the most
    recent right-side values forward with ``last(ignorenulls=True)`` over
    (key ORDER BY ts). This scales as one sort-shuffle on the key — no
    O(n×m) range-join explosion — and is the standard Spark formulation.

    ``tolerance`` (e.g. "15 minutes") drops matches older than the interval.

    Determinism: when multiple right rows share the same (key, right_ts),
    the carried-value columns themselves are appended to the window ordering,
    so the matched row is the one with the greatest value tuple — a stable
    choice across runs and engines. (DuckDB's native ASOF JOIN picks an
    arbitrary duplicate; oracle comparisons need right (key, ts) unique or
    must reduce duplicates first.)
    """
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Right rows sort before left rows at equal ts (_is_left ascending) so a
    # right row at exactly left_ts matches — in either direction.
    ts_ord = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    # Tiebreak among right rows at equal (key, ts): order by the carried
    # value columns so last() lands on a deterministic row, not whichever
    # one the shuffle happened to deliver later.
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_ord, F.col("_is_left"), *[F.col(c) for c in rcols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    # ALL carried columns come from ONE right row: the window carries a
    # single struct of every rcol (non-null for every right row, even when
    # individual fields are NULL) and unpacks it after. Per-column
    # last(ignorenulls=True) — the previous form — skipped PAST the winning
    # right row whenever it held NULL in one of several value columns,
    # stitching that column from an older row into a combination that
    # exists on no input row (round-6 review + round-7 ADVICE catch).
    # A when(_is_left == 0, ...) guard keeps left rows out of the carry:
    # their struct is NULL, so ignorenulls walks back to the latest right
    # row only.
    rstruct = F.last(
        F.when(
            F.col("_is_left") == 0, F.struct(*[F.col(c) for c in rcols])
        ),
        ignorenulls=True,
    ).over(w)
    unioned = unioned.select(
        "_k",
        "_ts",
        "_is_left",
        *[F.col(c) for c in lcols],
        *[rstruct.getField(c).alias(c) for c in rcols],
        F.last(
            F.when(F.col("_is_left") == 0, F.col("_ts")), ignorenulls=True
        ).over(w).alias("_rts"),
    )
    out = unioned.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        if direction == "backward":
            keep = F.col("_rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            keep = F.col("_rts") <= F.col("_ts") + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            "*", *[]
        ).withColumns({c: F.when(keep, F.col(c)) for c in rcols})
    return out.select(
        F.col("_k").alias(key), F.col("_ts").alias(left_ts), *lcols, *rcols
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a huge skewed fact table against a small dim
    table without broadcast: each fact row gets a uniform salt in
    [0, buckets); the dim side is replicated once per salt value; the join
    key becomes (key, salt). A hot key's rows then spread across ``buckets``
    tasks instead of concentrating the whole key in one sort-merge partition.

    Decision order at scale: (1) ``broadcast(dim)`` when dim fits in memory —
    no shuffle at all; (2) AQE skew-join splitting (on by default in the
    session factory) for runtime-detected moderate skew; (3) this explicit
    salting when the hot key is known and extreme or broadcast is impossible.
    The dim side is replicated ×buckets, so keep buckets modest (16-64).

    Row-level semantics are unchanged for inner/left joins: every fact row
    carries exactly one salt, and its key's dim row exists at every salt.
    """
    fact_s = fact.withColumn("_salt", (F.rand(seed=7) * buckets).cast("int"))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return fact_s.join(dim_s, on=[key, "_salt"], how=how).drop("_salt")


def band_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Range/band join done the way it scales: equi-join on the shared
    prefix keys, range containment (``lo <= value <= hi``) as a residual
    post-join filter.

    A naive range join (``ON l.v BETWEEN r.lo AND r.hi`` with no equi key)
    degenerates to a broadcast nested loop — O(|L|·|R|) comparisons. When
    the bands carry natural partition keys (symbol, date, tenant, …), keying
    the join on them turns the plan into an ordinary shuffled/broadcast hash
    join whose per-group fanout is bounded by bands-per-key; Catalyst
    evaluates the band predicate as a cheap residual on the matched rows.
    This is the standard interval-join decomposition (cf. interval joins in
    stream processors and range-join optimizations in warehouse engines).
    """
    l, r = left.alias("_bj_l"), right.alias("_bj_r")
    cond = None
    for k in equi_keys:
        c = F.col(f"_bj_l.{k}") == F.col(f"_bj_r.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(f"_bj_l.{value_col}") >= F.col(f"_bj_r.{lo_col}"))
        & (F.col(f"_bj_l.{value_col}") <= F.col(f"_bj_r.{hi_col}"))
    )
    return l.join(r, cond, how).drop(*[F.col(f"_bj_r.{k}") for k in equi_keys])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 900,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join via bin decomposition — the range-join
    optimization warehouse engines (and Databricks' range-join hint) apply,
    spelled out as DataFrame ops so the plan is an EQUI join.

    Semantics: closed intervals at one-second granularity — rows pair iff
    ``l_start <= r_end AND r_start <= l_end`` (plus any ``equi_keys``
    equality). A zero-length interval (start == end, e.g. a single-event
    session) still matches windows containing that instant.

    Why not write the predicate directly? A bare inequality join has no
    equi key, so Catalyst plans BroadcastNestedLoop — O(|L|·|R|)
    comparisons, a scale-killer the moment neither side is tiny. Instead
    both sides explode to the 1-second-granularity time bins they cover
    (``sequence(floor(start/W), floor(end/W))``), the join runs as an
    ordinary hash join on ``(equi_keys..., bin)``, and the true overlap
    predicate is a residual filter on the matched rows. Each pair can share
    many bins, so duplicate emission is suppressed arithmetically — only the
    FIRST bin both intervals cover (``greatest(floor(l_start/W),
    floor(r_start/W))``) emits the pair; no distinct needed, no second
    shuffle. Replication factor is interval_len/W per side: pick
    ``bin_seconds`` near the typical interval length so fan-out stays O(1)
    per row while bins spread hot time ranges across the cluster.

    Adds ``overlap_sec`` = seconds both intervals share (0 when they touch
    at a point). Column names must not collide across the two sides apart
    from ``equi_keys`` (which are coalesced into single output columns).
    """
    from stock_market_data_pipeline_spark.utils import to_epoch_seconds

    keys = list(equi_keys or [])
    w = int(bin_seconds)
    # The bin decomposition adds helper columns via withColumn; an input
    # that already carries one of these names would be silently overwritten
    # and join on garbage — fail loudly instead.
    reserved = {"_bin", "_ls", "_le", "_rs", "_re"}
    clashes = reserved & (set(left.columns) | set(right.columns))
    if clashes:
        raise ValueError(
            f"interval_join reserves column names {sorted(reserved)}; "
            f"rename input columns {sorted(clashes)} first"
        )

    def binned(df: DataFrame, start: str, end: str, tag: str) -> DataFrame:
        s, e = to_epoch_seconds(start), to_epoch_seconds(end)
        return df.withColumn(f"_{tag}s", s).withColumn(f"_{tag}e", e).withColumn(
            "_bin",
            F.explode(
                F.sequence(F.floor(s / w), F.floor(e / w))
            ),
        )
    l = binned(left, l_start, l_end, "l").alias("_ij_l")
    r = binned(right, r_start, r_end, "r").alias("_ij_r")
    cond = F.col("_ij_l._bin") == F.col("_ij_r._bin")
    for k in keys:
        cond = cond & (F.col(f"_ij_l.{k}") == F.col(f"_ij_r.{k}"))
    ls, le = F.col("_ij_l._ls"), F.col("_ij_l._le")
    rs, re_ = F.col("_ij_r._rs"), F.col("_ij_r._re")
    overlap = (ls <= re_) & (rs <= le)
    first_shared_bin = F.floor(F.greatest(ls, rs) / w) == F.col("_ij_l._bin")
    out = l.join(r, cond & overlap & first_shared_bin, "inner")
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    return out.select(
        *[F.col(f"_ij_l.{k}").alias(k) for k in keys],
        *[F.col(f"_ij_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_ij_r.{c}").alias(c) for c in rcols],
        (F.least(le, re_) - F.greatest(ls, rs)).alias("overlap_sec"),
    )
