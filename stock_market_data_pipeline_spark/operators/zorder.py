"""Z-order (Morton) multi-dimensional clustering — the 2-D generalization
of the sorted-write data-skipping layout (``sinks/lake.py:write_clustered``,
SURVEY X71).

A 1-D sort gives tight parquet row-group min/max stats on ONE column; a
filter on any other column skips nothing. Interleaving the bits of two
normalized dimensions into a single Morton code and sorting by it bounds
each row group to a small rectangle of the 2-D value space, so selective
filters on EITHER dimension (or both) skip most row groups — the same
layout Delta's OPTIMIZE ZORDER BY builds (public algorithm: Morton codes,
cf. the classic z-order curve literature).

Everything is plain integer arithmetic on JVM expressions (shifts, masks,
ors — whole-stage codegen), so the z-value is also DuckDB-reproducible and
the registry query is oracle-gated bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bins(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by fixed-range binning.

    ``floor((x - lo) / (hi - lo) * 2^bits)`` clamped to the top bin (the
    max value would otherwise land one past the end). Degenerate range
    (hi == lo) maps everything to bin 0. Fixed-range (not quantile)
    binning keeps the code deterministic and oracle-reproducible; skewed
    dimensions trade some balance for that determinism.
    """
    n = 1 << bits
    scaled = F.floor(
        (col.cast("double") - lo) / F.nullif(hi - lo, F.lit(0.0)) * n
    )
    return F.least(
        F.greatest(F.coalesce(scaled, F.lit(0)), F.lit(0)), F.lit(n - 1)
    ).cast("long")


def interleave_bits_n(cols: list[Column], bits: int) -> Column:
    """k-dimensional Morton code: bit i of ``cols[j]`` → bit ``i·k + j``
    (round-robin bit interleave — the 2-D z-curve generalized).

    Unrolled shift/mask/or expression tree (k·bits terms) — stays inside
    whole-stage codegen. ``k·bits`` must fit a signed long (≤ 63).
    """
    k = len(cols)
    if k < 1:
        raise ValueError("interleave_bits_n needs at least one column")
    if k * bits > 63:
        raise ValueError(
            f"{k} cols × {bits} bits = {k * bits} interleaved bits "
            f"overflows a signed long (max 63); lower bits"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return z


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """2-D Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1
    (the ``k=2`` case of :func:`interleave_bits_n`, kept as the
    oracle-gated public name)."""
    return interleave_bits_n([x, y], bits)


def with_zvalue_n(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """Append the k-dimensional Morton code of ``cols``, each normalized to
    ``bits`` bins over its exact global [min, max].

    The min/max pass is ONE tiny aggregate over all k columns broadcast
    back as a scalar frame — at 100 TB that is a single extra scan-light
    job (or, better, supplied from table-level stats); the z-value
    computation itself is a pure projection.
    """
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo{i}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi{i}"))
    bounds = df.agg(*aggs)
    withb = df.join(F.broadcast(bounds))
    bins = [
        normalize_to_bins(F.col(c), F.col(f"_lo{i}"), F.col(f"_hi{i}"), bits)
        for i, c in enumerate(cols)
    ]
    helper = [f"_lo{i}" for i in range(len(cols))] + [
        f"_hi{i}" for i in range(len(cols))
    ]
    return withb.withColumn(out_col, interleave_bits_n(bins, bits)).drop(
        *helper
    )


def with_zvalue(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """2-D convenience wrapper over :func:`with_zvalue_n` (the oracle-gated
    registry query binds this name)."""
    return with_zvalue_n(df, [col_x, col_y], bits=bits, out_col=out_col)


def write_zorder(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Z-order-clustered lake write: range-partition + sort by the Morton
    code of k ≥ 2 columns, then drop the helper column. Same write-side
    cost as the 1-D ``write_clustered`` (one range shuffle, one in-file
    sort) — but row-group stats are tight on EVERY clustered dimension,
    verified by the parquet-footer audit in tests (2-D and 3-D).
    """
    z = with_zvalue_n(df, list(cols), bits=bits)
    out = z.repartitionByRange(n_files, F.col("zval")).sortWithinPartitions(
        "zval"
    ).drop("zval")
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
