"""Upsert (MERGE) as a pure DataFrame composition.

Incremental pipelines refresh a large snapshot with a small batch of
changed + new rows. Without a table format that supports MERGE INTO
(Delta/Iceberg), the semantics compose from two primitives:

    merged = updates ∪ (base ⟕anti updates on key)

i.e. every key present in ``updates`` takes the update row; every other
base row passes through. At scale the anti-join broadcasts when the
update batch is small (the common case — daily deltas vs a 100 TB
snapshot), so the snapshot never shuffles; the rewrite target is then
``sinks.write_partitioned_parquet`` with dynamic overwrite so only the
partitions containing changed keys rewrite.

Oracle-checked by ``q_merge_upsert``: the composed result hash-matches
a CASE/UNION formulation of the same merge in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Return ``base`` with rows matching ``updates`` on ``keys``
    replaced and non-matching update rows appended.

    Both inputs must share a schema (enforced by ``unionByName``).
    With ``broadcast_updates`` (the daily-delta-vs-snapshot case) the
    anti-join broadcasts the update keys and the snapshot never
    shuffles. Pass ``False`` when the update batch can be arbitrarily
    large (e.g. a backlog replay through a streaming sink) — a forced
    broadcast there would hit Spark's broadcast size limit or OOM the
    driver; Catalyst/AQE then picks the join strategy from actual
    sizes.
    """
    update_keys = updates.select(*keys)
    if broadcast_updates:
        update_keys = F.broadcast(update_keys)
    surviving_base = base.join(update_keys, keys, "left_anti")
    return updates.unionByName(surviving_base)
