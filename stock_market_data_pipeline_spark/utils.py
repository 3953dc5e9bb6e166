"""Small shared helpers for the query/oracle contract."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Rounding-boundary bias. Engines round EXACT half-decimals differently
# (Spark: BigDecimal of the double's shortest repr, HALF_UP; DuckDB: scaled
# multiply) — and means of fixed-precision prices over power-of-two counts
# land on exact halves systematically. Nudging every value off the boundary
# by +1e-9 BEFORE rounding (identically on both engines — the oracle applies
# the same bias, see oracles._bias_rounds) makes rounding deterministic; the
# bias only changes values that sat exactly on a .5*10^-scale boundary.
ROUND_BIAS = 1e-9


def round_det(col: Column, scale: int = 6) -> Column:
    """Deterministic cross-engine rounding: bias off boundaries, then round."""
    return F.round(col + F.lit(ROUND_BIAS), scale)


def to_epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds from a timestamp of EITHER flavor (LTZ or NTZ).

    ``cast("long")`` directly on TIMESTAMP_NTZ raises
    ``DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION`` (the lake stores
    TIMESTAMP_MICROS with isAdjustedToUTC=0, read as NTZ under
    ``spark.sql.parquet.inferTimestampNTZ.enabled=true``). NTZ→TIMESTAMP is a
    legal cast and the session timezone is pinned to UTC (session.py), so the
    wall-clock value — and therefore the epoch count — is unchanged; the
    second cast to long is then legal for both flavors. Every operator doing
    timestamp arithmetic MUST use this instead of a bare ``cast("long")``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def to_epoch_micros(col: Column | str) -> Column:
    """Epoch MICROseconds from a timestamp of either flavor (LTZ or NTZ).

    The sub-second-precise sibling of :func:`to_epoch_seconds` — required
    wherever a comparison must agree with Spark's native event-time
    machinery (session_window, watermarks), which works at microsecond
    precision. Flooring to seconds first moves gap comparisons by up to
    ~1 s, which is exactly the boundary bug the r6 sf0.1 mirror caught in
    ``sessionize`` (a 1799.34 s gap truncated to 1800 and split a session
    the native session_window merges).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def round_doubles(df: DataFrame, scale: int = 6, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Round every DoubleType column to ``scale`` decimals (biased — see
    ROUND_BIAS).

    Floating-point aggregates differ in the last ulps between engines (Spark's
    distributed partial aggregation sums in a different order than a
    single-threaded oracle); rounding both sides to the same scale makes
    value-hash comparison deterministic. Applied only in the query registry —
    core operators stay exact.
    """
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, DoubleType) and f.name not in exclude:
            cols.append(round_det(F.col(f.name), scale).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
