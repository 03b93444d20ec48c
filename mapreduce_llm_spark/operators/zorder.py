"""Z-order (Morton-curve) clustering for file-level data skipping.

The third leg of the storage-layout story (after directory-level
partition pruning — queries/analytics_r5c.q_partition_prune — and
shuffle-free bucketed joins — q_bucket_join): interleaving the bits of
two (or more) columns produces a single sort key whose contiguous
ranges are small RECTANGLES in the original attribute space. Files
written in z-key order therefore have tight min/max footprints on
EVERY interleaved dimension, so a reader consulting per-file min/max
statistics (parquet footers, Delta/Iceberg manifests) skips most files
for selective predicates on ANY of those dimensions — where a linear
sort gives tight footprints on the leading column only.

Everything here is JVM-side column arithmetic (shifts, masks, adds —
whole-stage codegen), no UDFs: the z-value of a row is a pure
expression, clustering is `repartitionByRange(z)` at write time, and
the skipping model (which files a range predicate must touch) is an
ordinary aggregation over the z-bucketed data. At 100 TB the same
expressions drive the layout job; the only local-mode simplification
is modelling "file" as a fixed-width z-range bucket instead of a
physical parquet file (deterministic, and exactly the footprint the
writer would produce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Affine-map ``col`` from [lo, hi] onto the integer grid
    [0, 2**bits - 1] (long arithmetic, clamped at both ends so values
    at/inbounds of the range survive float rounding). Column bounds may
    be broadcast scalars from a stats pass or fixed domain constants —
    fixed constants keep the z-value STABLE under appends, which is
    what an incremental clustering job wants."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    top = F.lit((1 << bits) - 1)
    scaled = F.floor(
        (col.cast("double") - lo_c) / (hi_c - lo_c + F.lit(1e-300)) * (top + 1)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(top, scaled))


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two ``bits``-wide non-negative longs:
    bit i of x lands at position 2i, bit i of y at 2i+1. Built as a
    static sum of shift/mask terms — one codegen'd JVM expression per
    row, no UDF, no loop at runtime. 2·bits ≤ 62 keeps the result in a
    signed long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_repartition(
    df: DataFrame, x: Column, y: Column, *, bits: int = 16, num_files: int = 64
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-value into
    ``num_files`` partitions (→ one file each on write) and sort within
    partitions so row groups inherit the locality too. This is the
    layout job a nightly OPTIMIZE runs; the write itself is the
    caller's ordinary ``.write.parquet(...)``."""
    z = z_value(x, y, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
    )


def file_footprints(
    df: DataFrame, x: Column, y: Column, file_col: Column
) -> DataFrame:
    """Per-file min/max statistics for the two clustered dimensions —
    the model of what a parquet footer / table-format manifest stores.
    ``file_col`` identifies the file a row belongs to (input_file_name()
    for physical data, a z-range bucket for the deterministic model).
    One aggregation: #files output rows."""
    return (
        df.select(
            file_col.alias("file_id"), x.alias("_x"), y.alias("_y")
        )
        .groupBy("file_id")
        .agg(
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
            F.count("*").alias("n_rows"),
        )
    )


def files_touched(
    footprints: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> Column:
    """Aggregate column: how many files a reader must open for the
    rectangle predicate ``x ∈ [x_lo, x_hi] AND y ∈ [y_lo, y_hi]``,
    i.e. whose [min,max] footprint intersects it on BOTH axes. Use in
    ``footprints.agg(...)``. The complement (skipped files) is the
    data-skipping win."""
    hit = (
        (F.col("x_max") >= x_lo)
        & (F.col("x_min") <= x_hi)
        & (F.col("y_max") >= y_lo)
        & (F.col("y_min") <= y_hi)
    )
    return F.sum(hit.cast("long"))
