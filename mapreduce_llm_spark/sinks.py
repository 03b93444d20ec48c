"""Table sinks designed for 100 TB layouts.

The reference's only sink is a single concatenated text file
(`internal/cli/mapreduce.go:139-146` — mirrored by
``operators.pipeline.write_text_sink``). A general engine needs layouts
that make the NEXT query cheap; each writer here exists for one
specific downstream saving:

- **partitioned parquet** → partition pruning: a date/flag filter skips
  whole directories before any I/O.
- **bucketed table** → shuffle-free joins/aggregations: two tables
  bucketed on the same key join without an Exchange, which at 100 TB is
  usually the single largest cost in the plan.
- **range-sorted parquet** → row-group skipping: parquet min/max stats
  prune within files for range predicates on the sort column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style directory partitioning.

    Partition columns must be low-cardinality (date, region, flag — not
    a key): each distinct combination is a directory, and small-file
    explosion is the classic failure mode. With the session's dynamic
    partitionOverwriteMode, ``overwrite`` replaces only the partitions
    present in ``df`` — idempotent incremental loads.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table.

    Joins/aggregations between tables co-bucketed on the same key and
    bucket count run with zero shuffle — the scan itself satisfies the
    distribution requirement. Bucketing requires the catalog (metastore
    keeps the bucket spec), hence ``saveAsTable`` not ``parquet(path)``.
    Pick ``n_buckets`` so one bucket ≈ 100-200 MB at target scale.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_range_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally range-partition then sort within files on ``sort_cols``.

    Every parquet row group then covers a narrow ``sort_cols`` range,
    so min/max statistics answer range predicates without decoding —
    the poor man's clustered index. Use for the one column the workload
    filters on most (``l_shipdate``, ``events.ts``).
    """
    parts = df.repartitionByRange(*sort_cols) if n_files is None else df.repartitionByRange(
        n_files, *sort_cols
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves the bucket spec for shuffle elision."""
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 512,
    sort_within_by: list[str] | None = None,
) -> int:
    """Compact a fragmented parquet directory to ~``target_file_mb``
    files; returns the new file count.

    The small-files problem is the classic long-running-pipeline decay
    mode: streaming/incremental writers leave thousands of KB-sized
    files, and at 100 TB the NameNode/listing and per-file open costs
    dominate scans. Sizing uses the CURRENT on-disk bytes (already
    compressed), so the output files land near the target without
    guessing a compression ratio. ``sort_within_by`` re-sorts rows
    within each output file to restore row-group min/max skipping
    (see write_range_sorted_parquet).

    Writes to a sibling temp dir then atomically swaps, so a reader
    never sees a half-compacted directory.
    """
    import math
    import os
    import shutil

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    writer = df.repartition(n_files)
    if sort_within_by:
        writer = writer.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "._compacting"
    writer.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._pre_compact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (Spark's built-in second columnar format). Same
    pushdown/pruning properties as parquet (min/max stripe stats,
    predicate pushdown, column projection); useful when a downstream
    consumer is Hive/Trino-standardized on ORC. Prefer parquet
    elsewhere in this engine — it is the testdata's native format."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source. Schema comes from the ORC footer (self-describing,
    no inference scan — unlike CSV/JSON, an explicit schema is not
    required for a single-pass read)."""
    return spark.read.orc(path)
