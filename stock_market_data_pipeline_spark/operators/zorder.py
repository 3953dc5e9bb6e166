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


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1.

    Unrolled shift/mask/or expression tree (2·bits terms) — stays inside
    whole-stage codegen; at bits=16 the z-value spans 32 bits.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def with_zvalue(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """Append the Morton code of (col_x, col_y), normalized to ``bits`` bins
    per dimension over each column's exact global [min, max].

    The min/max pass is one tiny aggregate broadcast back as a scalar
    frame — at 100 TB that is a single extra scan-light job (or, better,
    supplied from table-level stats); the z-value computation itself is a
    pure projection.
    """
    bounds = df.agg(
        F.min(F.col(col_x).cast("double")).alias("_xlo"),
        F.max(F.col(col_x).cast("double")).alias("_xhi"),
        F.min(F.col(col_y).cast("double")).alias("_ylo"),
        F.max(F.col(col_y).cast("double")).alias("_yhi"),
    )
    withb = df.join(F.broadcast(bounds))
    bx = normalize_to_bins(F.col(col_x), F.col("_xlo"), F.col("_xhi"), bits)
    by = normalize_to_bins(F.col(col_y), F.col("_ylo"), F.col("_yhi"), bits)
    return withb.withColumn(out_col, interleave_bits(bx, by, bits)).drop(
        "_xlo", "_xhi", "_ylo", "_yhi"
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Z-order-clustered lake write: range-partition + sort by the Morton
    code of two columns, then drop the helper column. Same write-side cost
    as the 1-D ``write_clustered`` (one range shuffle, one in-file sort) —
    but row-group stats are tight on BOTH dimensions, verified by the
    parquet-footer audit in tests.
    """
    z = with_zvalue(df, cols[0], cols[1], bits=bits)
    out = z.repartitionByRange(n_files, F.col("zval")).sortWithinPartitions(
        "zval"
    ).drop("zval")
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
