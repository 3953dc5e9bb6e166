"""Small shared helpers for the query/oracle contract."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def round_doubles(df: DataFrame, scale: int = 6, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Round every DoubleType column to ``scale`` decimals.

    Floating-point aggregates differ in the last ulps between engines (Spark's
    distributed partial aggregation sums in a different order than a
    single-threaded oracle); rounding both sides to the same scale makes
    value-hash comparison deterministic. Applied only in the query registry —
    core operators stay exact.
    """
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, DoubleType) and f.name not in exclude:
            cols.append(F.round(F.col(f.name), scale).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
