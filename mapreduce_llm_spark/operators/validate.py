"""Data-validation operators: table diff (reconciliation) and
order-independent content checksums.

The two checks every 100 TB migration, backfill, or CDC pipeline runs
before switching readers over:

- ``table_diff``: keyed full-outer comparison of two table versions →
  one status row per key (added / removed / changed / unchanged).
  Both sides are projected to (key, fingerprint) BEFORE the join, so
  the shuffle carries ~16 bytes per row regardless of row width —
  never the row bodies. This is the relational form of the
  reference's memoization identity check (content hash decides reuse,
  reference internal/cache/cache.go) applied across whole tables.

- ``group_checksum``: an order-independent fingerprint per group —
  the SUM of per-row 40-bit fingerprints. Summation commutes, so the
  checksum is invariant under partitioning, shuffle order, and file
  layout (what makes it usable to compare a table with its re-sorted,
  re-bucketed, or engine-migrated copy), while any single changed
  cell shifts the group's sum with probability 1 − 2⁻⁴⁰ per row.
  40-bit terms keep 2^20-row groups exact in a signed 64-bit sum
  under ANSI arithmetic; for bigger groups checksum the sub-group
  level you shard by (the sums then roll up associatively — the same
  mergeable-partial shape as q_rollup_incremental).

Fingerprints are md5-based (not xxhash) so an independent engine can
recompute them byte-for-byte — the DuckDB oracle twin is
``CAST(('0x' || substr(md5(...), 1, 10)) AS BIGINT)`` over the same
null-tagged concatenation. Everything is JVM expression arithmetic;
no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[str | Column]) -> Column:
    """40-bit content fingerprint of the given columns: md5 over a
    null-tagged, unit-separated concatenation (NULL and the string
    'null' hash differently; the \\x1f separator keeps ('ab','c') and
    ('a','bc') apart), then the first 10 hex digits as a BIGINT.
    Deterministic across engines, partitions, and runs."""
    tagged = [
        F.coalesce(
            F.concat(F.lit("v:"), F.col(c).cast("string") if isinstance(c, str) else c.cast("string")),
            F.lit("null"),
        )
        for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *tagged)), 1, 10), 16, 10
    ).cast("long")


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff of two table versions: one row per key present in
    either side, with ``status`` ∈ added (right only) / removed (left
    only) / changed (both, fingerprints differ) / unchanged. Each side
    collapses to (keys…, fingerprint) before the full-outer join — the
    only shuffle is on the key columns and moves fingerprints, not row
    bodies. At 100 TB run it per partition-predicate slice and the
    status counts roll up.

    ``keys`` must uniquely identify a row on EACH side (the premise of
    any keyed reconciliation) — duplicate keys would multiply through
    the full-outer join; compact with a keep-latest pass
    (q_dedup_latest pattern) first if the source is an un-compacted
    changelog."""
    lf = left.select(*keys, row_fingerprint(compare_cols).alias("_fp_l"))
    rf = right.select(*keys, row_fingerprint(compare_cols).alias("_fp_r"))
    joined = lf.join(rf, keys, "full_outer")
    status = (
        F.when(F.col("_fp_l").isNull(), F.lit("added"))
        .when(F.col("_fp_r").isNull(), F.lit("removed"))
        .when(F.col("_fp_l") == F.col("_fp_r"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def group_checksum(
    df: DataFrame, group_cols: list[str], cols: list[str]
) -> DataFrame:
    """Order-independent checksum per group: sum of 40-bit row
    fingerprints plus the row count (the count disambiguates the
    empty-vs-cancelling edge and gives the reconciler the cardinality
    for free). Map-side combinable like any sum."""
    return (
        df.select(*group_cols, row_fingerprint(cols).alias("_fp"))
        .groupBy(*group_cols)
        .agg(
            F.sum("_fp").alias("checksum"),
            F.count("*").alias("n_rows"),
        )
    )
