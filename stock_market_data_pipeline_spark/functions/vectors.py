"""Vector column expressions: dot product, norms, cosine — JVM-side.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside Catalyst (no
Python), with strict left-to-right accumulation so results are reproducible
across engines and partitionings. Inputs are cast to double once; float→
double is exact, and all downstream IEEE ops are then deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def weighted_dot(a: Column, weights: list[float]) -> Column:
    """Dot of a vector column with a Python-constant weight vector (used for
    LSH hyperplane projections — the planes are plain literals, so any
    engine reproduces the projection exactly)."""
    w = F.array(*[F.lit(x) for x in weights])
    return dot(a, w)
