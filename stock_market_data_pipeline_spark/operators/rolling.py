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
