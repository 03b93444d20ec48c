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
