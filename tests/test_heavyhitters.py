"""Misra–Gries heavy hitters (operators/heavyhitters.py): the
per-partition bound and containment guarantees on adversarial
streams, the cancelled-counters sentinel path, and the declared
query's theorem output."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.operators.heavyhitters import misra_gries_summaries
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def _summaries(spark, items, k, parts=2):
    df = spark.createDataFrame([(x,) for x in items], "w string")
    return misra_gries_summaries(df, "w", k=k, num_partitions=parts).collect()


def test_bounds_hold_on_skewed_stream(spark):
    # 300 of 'hot', 120 of 'warm', 200 distinct one-off 'cold's: with
    # k=8 counters the guarantees must sandwich every true count
    items = ["hot"] * 300 + ["warm"] * 120 + [f"cold{i}" for i in range(200)]
    rows = _summaries(spark, items, k=8)
    true = {"hot": 300, "warm": 120}
    per_pid = {}
    for r in rows:
        per_pid.setdefault(r["pid"], r["part_dec"])
    total_dec = sum(per_pid.values())
    est = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    for w, t in true.items():
        if t > total_dec:
            assert w in est, f"{w} (count {t} > dec {total_dec}) missing"
        if w in est:
            assert est[w] <= t <= est[w] + total_dec


def test_counter_memory_is_bounded(spark):
    items = [f"w{i}" for i in range(5000)]
    rows = _summaries(spark, items, k=16, parts=2)
    per_pid: dict = {}
    for r in rows:
        if r["item"] is not None:
            per_pid.setdefault(r["pid"], 0)
            per_pid[r["pid"]] += 1
    for pid, n in per_pid.items():
        assert n <= 16, f"partition {pid} kept {n} counters"


def test_cancelled_partition_still_reports_decrements(spark):
    # k=1 with an alternating stream cancels every counter repeatedly;
    # decrement totals must survive even if the summary ends empty
    items = ["a", "b"] * 50
    rows = _summaries(spark, items, k=1, parts=1)
    assert rows, "summary vanished entirely"
    assert rows[0]["part_n"] == 100
    assert sum({r["pid"]: r["part_dec"] for r in rows}.values()) > 0


def test_rejects_nonpositive_k(spark):
    with pytest.raises(ValueError):
        misra_gries_summaries(
            spark.createDataFrame([("a",)], "w string"), "w", k=0
        )


def test_q_heavy_hitters_theorem_booleans(spark):
    rows = QUERIES["q_heavy_hitters"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["containment_ok"] for r in rows)
    assert all(r["bounds_ok"] for r in rows)
    counts = [r["exact_n"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_null_items_are_skipped_not_counted(spark):
    # NULLs are not stream elements: counting them under a None key
    # would collide with the cancelled-counters sentinel and be
    # dropped by the merge's item IS NOT NULL filter (ADVICE, round 5)
    items = ["a"] * 30 + [None] * 25 + ["b"] * 10
    df = spark.createDataFrame([(x,) for x in items], "w string")
    rows = misra_gries_summaries(df, "w", k=4, num_partitions=1).collect()
    assert sum(r["part_n"] for r in {r["pid"]: r for r in rows}.values()) == 40
    est = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    assert est.get("a") == 30 and est.get("b") == 10
    # no NULL row carries a positive estimate (sentinel est is 0)
    assert all(r["est"] == 0 for r in rows if r["item"] is None)
