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
expression and the skipping model (which files a range predicate must
touch) is an ordinary aggregation over the z-bucketed data. The
PHYSICAL write path already exists in sinks.write_zordered_parquet
(same Morton curve via the shared magic-mask spread;
repartitionByRange + sortWithinPartitions + parquet); this module
adds the measurable-skipping side: explicit grid scaling with
stable-under-append fixed bounds, per-file footprints, and the
files-touched predicate model. At 100 TB the same expressions drive
the layout job; the only local-mode simplification is modelling
"file" as a fixed-width z-range bucket instead of a physical parquet
file (deterministic, and exactly the footprint the writer would
produce).
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
    bit i of x lands at position 2i, bit i of y at 2i+1. Reuses the
    magic-mask bit spread from the physical write path
    (sinks._spread_bits — five codegen'd bitwise ops per operand, no
    UDF, no per-bit terms); 2·bits ≤ 42 stays comfortably inside a
    signed long. The WRITE-side counterpart is
    sinks.write_zordered_parquet (same curve, physical files); this
    expression form feeds the skipping model below and the staged
    DuckDB oracle twin."""
    from mapreduce_llm_spark.sinks import _spread_bits

    if not 1 <= bits <= 21:
        raise ValueError(f"bits must be in [1, 21], got {bits}")
    mask = F.lit((1 << bits) - 1)
    return _spread_bits(x.bitwiseAND(mask)).bitwiseOR(
        F.shiftleft(_spread_bits(y.bitwiseAND(mask)), 1)
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
