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
    removed = vacuum(table, keep_last=2)
    assert removed == [1, 2]
    assert read_snapshot(spark, table).count() == 3
    assert read_snapshot(spark, table, version=3).count() == 5
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table, version=1)
