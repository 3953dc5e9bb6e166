"""Row-frame rolling analytics (SURVEY W1-W5).

Reference parity: ``calculate_moving_averages``
(``dags/scripts/spark_stream_batch_processor.py:121-140``) —
``Window.partitionBy("symbol").orderBy("timestamp").rowsBetween(-N, 0)`` with
N ∈ {4, 14, 29}: price MAs (W1-W3), rolling price stddev 5/15 (W4), rolling
volume MA 5/15 (W5).

Determinism fix: the reference orders only by timestamp; equal timestamps make
frame contents non-deterministic. The engine requires a total order — pass a
unique ``tiebreak`` column (event id) appended to the ORDER BY.

Scale notes: one shuffle+sort per distinct (partition, order) spec; all five
frames share the same spec so Catalyst computes them in a single Window
physical node (one sort, no extra exchanges — verify via ``.explain``:
exactly one Exchange + one Sort feeding one Window). Per-key data must fit a
partition's sort spill budget — fine for per-symbol market data (even years
of ticks per symbol spill gracefully; keys are not megaskewed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_market_data_pipeline_spark.utils import round_det


def with_ewma(
    df: DataFrame,
    key: str = "symbol",
    order: str = "timestamp",
    price: str = "price",
    tiebreak: str | None = None,
    alpha: float = 0.1,
    lookback: int = 50,
) -> DataFrame:
    """Windowed EWMA (finance extension): exponentially weighted mean of the
    trailing ``lookback`` rows, newest weighted ``1``, decaying by
    ``(1-alpha)`` per step back; normalized by the present weights.

    Truncating at ``lookback`` bounds state ((1-α)^50 ≈ 0.5% at α=0.1) and
    keeps it expressible as a frame aggregation: collect the bounded frame
    and Horner-fold it — ``acc·d + x`` left-to-right over
    [oldest … newest] IS the weighted sum Σ xᵢ·d^(n-i) with the newest
    weighted 1, so the numerator needs zero ``pow`` calls and no
    zip_with/sequence scratch arrays (the round-1 form paid a transcendental
    per element plus two array allocations per row). All JVM-side;
    O(lookback) per row; no shuffle beyond the shared sort. The DuckDB
    oracle folds the identical list with ``list_reduce`` — its no-init fold
    seeds with the first element, which equals the zero-init fold exactly
    (IEEE: 0·d + x₁ = x₁), so results stay bit-identical cross-engine.
    """
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-(lookback - 1), 0)
    )
    xs = F.collect_list(price).over(w)
    n = F.size(xs)
    decay = 1.0 - alpha

    num = F.aggregate(
        xs, F.lit(0.0), lambda acc, x: acc * F.lit(decay) + x
    )
    # Geometric-series denominator in closed form: Σ_{j=0}^{n-1} d^j =
    # (1 - d^n) / (1 - d) — one pow instead of an O(n) fold per row. (The
    # oracle uses the identical expression, so IEEE results match exactly.)
    den = (F.lit(1.0) - F.pow(F.lit(decay), n.cast("double"))) / F.lit(1.0 - decay)
    return df.withColumn("ewma", num / den)


def with_rolling_metrics(
    df: DataFrame,
    key: str = "symbol",
    order: str = "timestamp",
    price: str = "price",
    volume: str = "volume",
    tiebreak: str | None = None,
    frames: tuple[int, ...] = (5, 15, 30),
) -> DataFrame:
    """Append ma_<n>, and for the two shortest frames rolling stddev +
    volume MA, over trailing row frames of the given sizes."""
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])

    # Deterministic frame means: accumulate fixed-precision prices as integer
    # cents (exact, associative, cheap) and divide by the frame row count as
    # the trailing double ops. A double `avg` differs in the last ulps
    # between engines/algorithms (sequential vs segment-tree summation), and
    # means of 2-dp prices land on exact .5 rounding boundaries often enough
    # to flap any rounded comparison.
    def _frame_avg(col: str, w: Window) -> F.Column:
        cents = F.round(F.col(col) * 100, 0).cast("long")
        return (
            F.sum(cents).over(w).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1)).over(w)
        )

    out = df
    for n in frames:
        w = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
        out = out.withColumn(f"ma_{n}", _frame_avg(price, w))
    for n in frames[:2]:
        w = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
        out = out.withColumn(f"price_volatility_{n}", F.stddev(price).over(w))
        out = out.withColumn(
            f"volume_ma_{n}",
            F.sum(volume).over(w).cast("double") / F.count(F.lit(1)).over(w),
        )
    return out


def with_technical_indicators(
    df: DataFrame,
    key: str = "symbol",
    order: str = "timestamp",
    price: str = "price",
    tiebreak: str | None = None,
    rsi_n: int = 14,
    boll_n: int = 20,
    boll_k: float = 2.0,
) -> DataFrame:
    """Classic technical indicators over trailing row frames — the analysis
    the reference's stock consumers layer on next (RSI, Bollinger bands),
    shapes chosen for exact cross-engine determinism:

    * ``rsi`` — cutoff (SMA) RSI: 100·avgGain/(avgGain+avgLoss) over the
      last ``rsi_n`` price changes. The textbook Wilder smoothing is an
      infinite recursion (state from the first row forever); the SMA form
      is frame-local, side-steps the 100/(1+RS) division-by-zero at
      zero-loss frames (algebraically identical, defined everywhere unless
      the frame is flat → NULL), and is what a bounded-state engine should
      compute. First ``rsi_n`` rows per key emit NULL (warm-up).
    * ``boll_mid/up/dn`` — Bollinger: cents-exact frame mean ±
      ``boll_k``·stddev_samp over ``boll_n`` rows (same decimal-cents trick
      as :func:`with_rolling_metrics`; single-row frames → NULL stddev →
      NULL bands).

    One sort per key serves every indicator (shared window ordering); all
    expressions are codegen window aggregates — no UDF, no state store.
    """
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w1 = Window.partitionBy(key).orderBy(*order_cols)
    cents = F.round(F.col(price) * 100, 0).cast("long")
    chg = cents - F.lag(cents).over(w1)  # integer cents: gains/losses exact

    w_rsi = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(rsi_n - 1), 0)
    gains = F.sum(F.when(chg > 0, chg).otherwise(F.lit(0))).over(w_rsi)
    losses = F.sum(F.when(chg < 0, -chg).otherwise(F.lit(0))).over(w_rsi)
    n_chg = F.count(chg).over(w_rsi)  # counts non-null changes only
    rsi = F.when(
        (n_chg >= rsi_n) & ((gains + losses) > 0),
        F.lit(100.0) * gains.cast("double") / (gains + losses).cast("double"),
    )

    w_boll = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(-(boll_n - 1), 0)
    mid = F.sum(cents).over(w_boll).cast("double") / F.lit(100.0) / F.count(
        F.lit(1)
    ).over(w_boll)
    sd = F.stddev(F.col(price)).over(w_boll)
    return (
        df.withColumn("rsi", rsi)
        .withColumn("boll_mid", mid)
        .withColumn("boll_up", mid + F.lit(boll_k) * sd)
        .withColumn("boll_dn", mid - F.lit(boll_k) * sd)
    )


def with_macd(
    df: DataFrame,
    key: str = "symbol",
    order: str = "timestamp",
    price: str = "price",
    tiebreak: str | None = None,
    fast: int = 12,
    slow: int = 26,
    lookback: int = 50,
) -> DataFrame:
    """MACD line (truncated form): EMA(fast) − EMA(slow), both as
    ``lookback``-row windowed EWMAs with α = 2/(n+1) — the same
    bounded-frame Horner fold as :func:`with_ewma`, sharing ONE
    ``collect_list`` frame for both decay rates (two folds over the same
    array, one window sort).

    Truncation note: the textbook MACD recursion carries state from the
    first bar forever; at 50 rows the oldest term's weight is (1-α)^50 ≤
    2.1% (slow EMA) — inside normal indicator tolerance, and the bounded
    frame is what keeps this a stateless window expression any engine can
    verify. The signal line (EMA of MACD) needs a second pass over derived
    values; compose ``with_macd`` then ``with_ewma`` on ``macd`` if needed.
    """
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-(lookback - 1), 0)
    )
    xs = F.collect_list(price).over(w)
    f_alpha, s_alpha = 2.0 / (fast + 1), 2.0 / (slow + 1)
    # materialize the frame once as a column; both folds reference it
    # (lambda exprs get no subexpression elimination — an inline `xs` would
    # re-collect the frame per fold)
    out = df.withColumn("_xs", xs)
    xs_col = F.col("_xs")

    def ema_on(col: F.Column, alpha: float) -> F.Column:
        d = 1.0 - alpha
        num = F.aggregate(col, F.lit(0.0), lambda acc, x: acc * F.lit(d) + x)
        den = (
            F.lit(1.0) - F.pow(F.lit(d), F.size(col).cast("double"))
        ) / F.lit(1.0 - d)
        return num / den

    return (
        out.withColumn("ema_fast", ema_on(xs_col, f_alpha))
        .withColumn("ema_slow", ema_on(xs_col, s_alpha))
        .withColumn("macd", F.col("ema_fast") - F.col("ema_slow"))
        .drop("_xs")
    )


def with_macd_signal(
    df: DataFrame,
    key: str = "symbol",
    order: str = "timestamp",
    price: str = "price",
    tiebreak: str | None = None,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    lookback: int = 50,
) -> DataFrame:
    """MACD signal line + histogram: the second pass the :func:`with_macd`
    docstring sketches — ``macd_signal`` = truncated EMA(``signal``) of the
    MACD line, ``macd_hist`` = macd − signal (the crossover indicator traders
    actually chart).

    Plan shape: the signal EMA is a second Window over the SAME
    (partition, order) spec, collecting the *materialized* ``macd`` column
    — Catalyst stacks both Window nodes on one Exchange + one Sort (window
    expressions are subexpression barriers, so each macd value is folded
    once by the first window and merely collected by the second; no
    recompute). Asserted by the plan-shape test: one sort total.
    """
    out = with_macd(df, key, order, price, tiebreak, fast, slow, lookback)
    order_cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-(lookback - 1), 0)
    )
    d = 1.0 - 2.0 / (signal + 1)
    out = out.withColumn("_sx", F.collect_list("macd").over(w))
    sx = F.col("_sx")
    num = F.aggregate(sx, F.lit(0.0), lambda acc, x: acc * F.lit(d) + x)
    den = (
        F.lit(1.0) - F.pow(F.lit(d), F.size(sx).cast("double"))
    ) / F.lit(1.0 - d)
    return (
        out.withColumn("macd_signal", num / den)
        .withColumn("macd_hist", F.col("macd") - F.col("macd_signal"))
        .drop("_sx")
    )


def return_correlation(
    ticks: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
) -> DataFrame:
    """Pairwise Pearson correlation of daily close-over-close returns — the
    classic cross-asset co-movement matrix (pairs trading / portfolio risk),
    a cross-SERIES statistic the reference's per-symbol jobs never compute.

    Built on ``daily_ohlcv`` closes: per-symbol daily return r_t =
    close_t / close_{t-1} - 1, then corr(r_a, r_b) over the dates both
    symbols traded, one row per unordered pair (a < b).

    100 TB posture: the tick→daily rollup does the data-sized work (one
    map-side-combined aggregate, output |symbols|×|days| rows — tiny). The
    pair join is a self-equi-join on the DATE key of that rolled-up frame
    and corr is algebraic (one pass, partial-combined); S symbols give
    S·(S-1)/2 output rows from |days|·S² joined rows — never data-sized.
    """
    from stock_market_data_pipeline_spark.operators.ohlcv import daily_ohlcv

    # nonpositive prints excluded: a 0 close would divide the next day's
    # return by zero (zero prices exist in the sf0.1 lake)
    daily = daily_ohlcv(
        ticks.filter(F.col(price) > 0), key=key, ts=ts, price=price,
        change_mode="intraday",
    ).select(key, "date", "daily_close")
    w = Window.partitionBy(key).orderBy("date")
    rets = daily.select(
        F.col(key),
        F.col("date"),
        (
            F.col("daily_close") / F.lag("daily_close").over(w) - F.lit(1.0)
        ).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    a = rets.select(
        F.col(key).alias("symbol_a"), "date", F.col("ret").alias("ret_a")
    )
    b = rets.select(
        F.col(key).alias("symbol_b"), "date", F.col("ret").alias("ret_b")
    )
    return (
        a.join(b, "date")
        .filter(F.col("symbol_a") < F.col("symbol_b"))
        .groupBy("symbol_a", "symbol_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            round_det(F.corr("ret_a", "ret_b"), 4).alias("return_corr"),
        )
    )


def market_beta(
    ticks: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
) -> DataFrame:
    """Per-symbol market beta: covar(r_s, r_m) / var(r_m) over daily
    close-over-close returns, with the market return defined as the
    equal-weight mean of all symbols' returns per date (index-free CAPM
    beta — the risk decomposition every portfolio report carries).

    Plan: same tick→daily rollup as ``return_correlation`` does the only
    data-sized work; the market series is one tiny aggregate of the daily
    frame joined back on the date key; covar/var are algebraic one-pass
    aggregates. Dates where any symbol lacks a return simply contribute the
    symbols that do have one (mean over present symbols).
    """
    from stock_market_data_pipeline_spark.operators.ohlcv import daily_ohlcv
    from stock_market_data_pipeline_spark.utils import round_det

    daily = daily_ohlcv(
        ticks.filter(F.col(price) > 0), key=key, ts=ts, price=price,
        change_mode="intraday",
    ).select(key, "date", "daily_close")
    w = Window.partitionBy(key).orderBy("date")
    rets = daily.select(
        F.col(key),
        F.col("date"),
        (
            F.col("daily_close") / F.lag("daily_close").over(w) - F.lit(1.0)
        ).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    market = rets.groupBy("date").agg(F.avg("ret").alias("mkt_ret"))
    joined = rets.join(market, "date")
    return joined.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_days"),
        round_det(
            F.covar_samp("ret", "mkt_ret")
            / F.nullif(F.var_samp("mkt_ret"), F.lit(0.0)),
            4,
        ).alias("beta"),
        round_det(F.avg("ret") * 252.0, 4).alias("annualized_return"),
    )


def with_time_range_metrics(
    df: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    price: str = "price",
    seconds: int = 900,
) -> DataFrame:
    """Trailing TIME-range rolling metrics: mean/min/max/count of
    ``price`` over the last ``seconds`` of EVENT time per key — the
    range-frame twin of the row-frame rollers (``with_rolling_metrics``).
    Row frames answer "last N ticks"; at irregular tick spacing the
    questions diverge, and SLAs are phrased in time ("15-minute trailing
    average"), so both belong in the library.

    Implementation: a window with ``rangeBetween(-seconds·10⁶, 0)`` over
    the epoch-MICROseconds order key — Spark evaluates the frame with a
    sliding range over ONE per-key sort, same single-shuffle shape as
    every roller here. Micros, not floored seconds: truncating the order
    key moves frame boundaries by up to ~1 s, the exact boundary-bug
    class the r6 mirror caught in sessionize. Ties on the order key
    share a frame by definition of RANGE (both engines agree, which is
    what makes the oracle exact).
    """
    from stock_market_data_pipeline_spark.utils import to_epoch_micros

    # Materialize the order key as ONE named column and emit all four
    # aggregates in ONE select: chained withColumn calls each mint a
    # fresh `_w0` projection of the order expression, so CollapseWindow
    # can't merge them and the plan pays four Window execs + four sorts
    # over the same data (measured; one is enough).
    ordered = df.withColumn("_ord_us", to_epoch_micros(ts))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ord_us"))
        .rangeBetween(-seconds * 1_000_000, 0)
    )
    return ordered.select(
        *df.columns,
        F.count(F.lit(1)).over(w).alias("trail_n"),
        round_det(F.avg(price).over(w), 6).alias("trail_avg"),
        F.min(price).over(w).alias("trail_min"),
        F.max(price).over(w).alias("trail_max"),
    )
