"""Versioned snapshot store: atomic publish, time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.snapshots import (
    latest_version,
    read_snapshot,
    vacuum,
    write_snapshot,
)
from tests.conftest import SMOKE_SF_DIR


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_publish_and_time_travel(spark, table):
    n1 = load_table(spark, SMOKE_SF_DIR, "nation")
    v1 = write_snapshot(n1, table)
    v2 = write_snapshot(n1.filter(F.col("n_regionkey") == 0), table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    assert read_snapshot(spark, table).count() == 5  # latest = filtered
    assert read_snapshot(spark, table, version=1).count() == 25  # time travel


def test_unpublished_table_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table)


def test_crashed_write_leaves_previous_published(spark, table):
    n = load_table(spark, SMOKE_SF_DIR, "nation")
    write_snapshot(n, table)
    # simulate a crash: v=2 data written but pointer never moved
    n.limit(1).write.mode("overwrite").parquet(os.path.join(table, "v=2"))
    assert latest_version(table) == 1
    assert read_snapshot(spark, table).count() == 25
    # the next successful write must NOT collide with the orphan
    v = write_snapshot(n.limit(3), table)
    assert v == 3 and read_snapshot(spark, table).count() == 3


def test_vacuum_keeps_published_and_bounds_history(spark, table):
    n = load_table(spark, SMOKE_SF_DIR, "nation")
    for k in (25, 10, 5, 3):
        write_snapshot(n.limit(k), table)
    # fresh directories are within the grace period — protected even
    # below the pointer (they could be another writer's in-flight
    # version; vacuum cannot tell from listing alone)
    assert vacuum(table, keep_last=2) == []
    old = 1e9
    for v in (1, 2):
        _age_tree(os.path.join(table, f"v={v}"), old)
    removed = vacuum(table, keep_last=2)
    assert removed == [1, 2]
    assert read_snapshot(spark, table).count() == 3
    assert read_snapshot(spark, table, version=3).count() == 5
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table, version=1)


def _age_tree(path: str, mtime: float) -> None:
    for root, _dirs, files in os.walk(path):
        os.utime(root, (mtime, mtime))
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_vacuum_spares_inflight_version_below_pointer(spark, table):
    """Writer A allocates v=1 and is still writing when writer B
    publishes v=2 and expired-history vacuum runs: A's fresh directory
    sits BELOW the pointer yet must survive (the torn-table race from
    the round-4 advice) — only aged below-pointer history is reaped."""
    n = load_table(spark, SMOKE_SF_DIR, "nation")
    inflight = os.path.join(table, "v=1")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("in-flight")
    write_snapshot(n.limit(5), table)   # B's v=2... actually allocates v=2
    write_snapshot(n.limit(3), table)   # v=3 (published)
    assert vacuum(table, keep_last=1) == []  # v=1 fresh: protected
    assert os.path.isdir(inflight)
    _age_tree(inflight, 1e9)
    assert 1 in vacuum(table, keep_last=1)  # aged out: reaped
    assert not os.path.isdir(inflight)


def test_vacuum_spares_recent_orphans_reaps_aged_ones(spark, table):
    """A directory above the published pointer may be another writer's
    in-flight version: vacuum must leave it alone until it has been
    untouched for the grace period, then reap it as crash debris."""
    n = load_table(spark, SMOKE_SF_DIR, "nation")
    write_snapshot(n, table)
    orphan = os.path.join(table, "v=9")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("in-flight")
    assert vacuum(table, keep_last=1) == []  # fresh: possibly in-flight
    assert os.path.isdir(orphan)
    old = 1e9  # epoch 2001 — far past any grace period
    os.utime(orphan, (old, old))
    os.utime(os.path.join(orphan, "part-0.parquet"), (old, old))
    assert vacuum(table, keep_last=1) == [9]
    assert not os.path.isdir(orphan)
    assert read_snapshot(spark, table).count() == 25  # published untouched


def test_vacuum_orphans_do_not_evict_retained_history(spark, table):
    """keep_last counts PUBLISHED versions: debris occupying the top
    version numbers must not shrink the retained history window."""
    n = load_table(spark, SMOKE_SF_DIR, "nation")
    write_snapshot(n.limit(10), table)  # v=1
    write_snapshot(n.limit(5), table)   # v=2 (published)
    os.makedirs(os.path.join(table, "v=3"))  # fresh orphan above pointer
    assert vacuum(table, keep_last=2) == []
    assert read_snapshot(spark, table, version=1).count() == 10  # retained
    assert read_snapshot(spark, table, version=2).count() == 5
