"""Small-file compaction planning — the remaining storage-maintenance
op beside partition pruning, bucketing, z-ordering, and snapshot
vacuum: streaming ingests and over-partitioned writes leave thousands
of KB-sized files whose per-file open/footer cost dominates scans; a
nightly compaction job rewrites them into target-sized files.

The PLAN is the operator: given a (path, bytes) listing — a table
format's manifest, or a filesystem listing — assign each file to a
rewrite bin so bins approach ``target_bytes``. Assignment is next-fit
over the path-ordered cumulative size: bin = floor((cumsum − size) /
target). That cumsum is the ONLY global state, and it goes through
operators/ranking.global_prefix_sum (range-partition + broadcast
per-partition offsets), so planning a 10-million-file manifest never
funnels through a single-partition window. Path order (not
size-sorted first-fit-decreasing) deliberately preserves locality:
neighbors in path order are usually neighbors in partition/time, so
compacted files keep their min/max stats tight — the same reasoning
as z-ordering.

Applying a plan is ordinary Spark: per bin,
``spark.read.parquet(*files).coalesce(1).write...`` — embarrassingly
parallel across bins, one output file each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_llm_spark.operators.ranking import global_prefix_sum


def compaction_plan(files: DataFrame, target_bytes: int) -> DataFrame:
    """Assign each file (columns ``path``, ``bytes``) to a rewrite bin
    approaching ``target_bytes``; returns per-bin (bin, n_files,
    total_bytes, first_path, last_path). A bin is a target-width
    window of the cumulative size, holding the files that START in it:
    the tiny-file tail packs densely toward the target, and a file
    larger than the target overshoots only the bin it starts in —
    every later file lands in a later bin (its span consumed the
    intervening windows), so one jumbo never drags neighbors with it.
    Exact-size bins for unsplittable oversized files are impossible in
    any planner that doesn't rewrite file contents; the overshoot bin
    is the standard next-fit answer."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    cum = global_prefix_sum(
        files.select("path", "bytes"),
        [F.col("path")],
        "bytes",
        alias="cum_bytes",
    )
    binned = cum.withColumn(
        "bin",
        F.floor((F.col("cum_bytes") - F.col("bytes")) / F.lit(target_bytes)).cast(
            "long"
        ),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
            F.min("path").alias("first_path"),
            F.max("path").alias("last_path"),
        )
        .orderBy("bin")
    )
