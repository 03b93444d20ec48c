"""Compaction planner (operators/compaction.py): conservation
identities, bin-size discipline, locality ordering, and the declared
query's structural contract."""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.operators.compaction import compaction_plan
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def _plan(spark, sizes, target):
    files = spark.createDataFrame(
        [(f"part-{i:05d}.parquet", s) for i, s in enumerate(sizes)],
        "path string, bytes long",
    )
    return compaction_plan(files, target).collect()


def test_plan_conserves_files_and_bytes(spark):
    sizes = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    rows = _plan(spark, sizes, target=120)
    assert sum(r["n_files"] for r in rows) == len(sizes)
    assert sum(r["total_bytes"] for r in rows) == sum(sizes)


def test_small_files_pack_and_jumbo_never_drags_followers(spark):
    # 8 tiny files, one jumbo, then more tiny files: the tiny head
    # packs toward the target; the jumbo overshoots only the bin it
    # starts in, and every file AFTER it lands in a strictly later bin
    # (the jumbo's span consumed the intervening windows)
    sizes = [10] * 8 + [1000] + [10] * 4
    rows = _plan(spark, sizes, target=50)
    assert sum(r["n_files"] for r in rows) == 13
    by_bin = sorted(rows, key=lambda r: r["bin"])
    # head: files 0-4 fill window 0 exactly (50 bytes)
    assert by_bin[0]["n_files"] == 5 and by_bin[0]["total_bytes"] == 50
    jumbo_bin = next(r for r in rows if r["last_path"] == "part-00008.parquet")
    followers = [r for r in rows if r["first_path"] >= "part-00009"]
    assert followers and all(r["bin"] > jumbo_bin["bin"] for r in followers)
    # followers re-pack densely (4 tiny files across at most 2 bins —
    # the global windows restart where the jumbo's span left off, so a
    # window boundary may fall inside the follower run)
    assert sum(r["n_files"] for r in followers) == 4
    assert len(followers) <= 2


def test_bins_preserve_path_order(spark):
    sizes = [30] * 12
    rows = _plan(spark, sizes, target=90)
    ordered = sorted(rows, key=lambda r: r["bin"])
    last = ""
    for r in ordered:
        assert r["first_path"] > last
        assert r["first_path"] <= r["last_path"]
        last = r["last_path"]


def test_rejects_nonpositive_target(spark):
    with pytest.raises(ValueError):
        _plan(spark, [1], 0)


def test_q_compaction_plan_contract(spark):
    rows = QUERIES["q_compaction_plan"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) >= 2  # 64 small files at 4x-mean target -> ~16 bins
    assert sum(r["n_files"] for r in rows) == 64
    assert all(r["total_bytes"] > 0 for r in rows)
    # deterministic across invocations in one process (memoized fixture)
    again = QUERIES["q_compaction_plan"](spark, SMOKE_SF_DIR).collect()
    assert rows == again
