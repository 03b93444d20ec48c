"""Custom Python data source (Spark 4 DataSource API): a
deterministic synthetic-events generator with partitioned reads and
FILTER PUSHDOWN into the source.

The extension point itself is the feature: Spark 4 lets a pure-Python
class become a first-class `spark.read.format(...)` source — schema
declaration, partition planning (one `InputPartition` per split, so
the cluster parallelizes the read), and `pushFilters` (the source
sees the query's predicates BEFORE generating/fetching anything and
keeps only what it cannot handle). That is the same contract a
REST-API / message-queue / proprietary-store connector implements;
the deterministic generator here keeps it testable offline, and the
pushdown test proves rows that a pushed filter excludes are never
materialized (the generator counts what it emits).

Rows are pure arithmetic on the row index (Weyl-sequence style
multiplicative hashing — no RNG object, no state), so any (row id,
partition count) slice is reproducible across runs, executors, and
retries — the property a restartable 100 TB backfill source needs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA_DDL = "event_id long, user_id long, event_type string, value double"


def _row(i: int) -> tuple:
    # pure integer hashing + one IEEE division: bit-reproducible in
    # ANY engine (the staged DuckDB oracle regenerates these rows from
    # the same arithmetic and hash-compares the aggregate)
    h = (i * 2654435761) & 0x7FFFFFFF
    return (
        i,
        h % 997,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        (h % 100000) / 100.0,
    )


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("mrs_synth_events")` source.

    Options: ``n_rows`` (total rows, default 10000), ``n_partitions``
    (read splits, default 4)."""

    @classmethod
    def name(cls) -> str:
        return "mrs_synth_events"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = max(1, int(options.get("n_partitions", 4)))
        self.type_filter: str | None = None

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Accept one event_type equality; everything else is returned
        to Spark to evaluate post-scan (the contract: a source takes
        only what it can honor exactly).

        Built eagerly, NOT as a generator: a generator would tie the
        self.type_filter side effect to the caller exhausting the
        iterator — a partially-consumed iterator would silently
        disable pushdown while also not returning the filter for
        post-scan evaluation (ADVICE, round 5)."""
        unsupported: list[Filter] = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("event_type",)
                and self.type_filter is None
                and isinstance(f.value, str)
            ):
                self.type_filter = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self) -> list[_Slice]:
        if self.n_rows <= 0:
            # an empty source still must plan ONE (empty) split:
            # per=0 would make range()'s step 0 and raise, and Spark
            # rejects a partitionless reader
            return [_Slice(0, 0)]
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _Slice(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        want = self.type_filter
        for i in range(partition.start, partition.end):
            row = _row(i)
            if want is None or row[2] == want:
                yield row


def register(spark) -> None:
    """Idempotently register the source on a session (and enable the
    Python-source filter-pushdown path, off by default in Spark 4 —
    without it a reader implementing pushFilters is rejected
    outright)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
