"""Semantic invariants for the round-7 third batch — properties the
DuckDB hash gate cannot express (it proves Spark ≡ oracle, not that
both implement the CLAIMED algorithm). Each check here is an
algebraic law of the intended semantics, evaluated on real testdata.
"""

from __future__ import annotations

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r7c import _FAIR_BUDGET_CENTS
from tests.conftest import SF_DIR

registry.load_all()


def test_fair_allocation_waterfill_laws(spark):
    rows = registry.QUERIES["q_fair_allocation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # never allocate more than the budget
        assert r["allocated_cents"] <= _FAIR_BUDGET_CENTS
        assert 0 <= r["n_capped"] <= r["n_suppliers"]
        # waterline exists iff someone is uncapped; when everyone is
        # capped the budget may be underspent, otherwise the integer
        # remainder after the waterline split is < n_uncapped
        uncapped = r["n_suppliers"] - r["n_capped"]
        if uncapped == 0:
            assert r["waterline_cents"] is None
        else:
            assert r["waterline_cents"] is not None
            leftover = _FAIR_BUDGET_CENTS - r["allocated_cents"]
            assert 0 <= leftover < uncapped


def test_cdc_apply_conserves_keys(spark):
    from mapreduce_llm_spark.io import load_table

    rows = registry.QUERIES["q_cdc_apply"](spark, SF_DIR).collect()
    got = {r["o_orderstatus"]: (r["n_live"], r["n_deleted"]) for r in rows}
    base = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # every key ends exactly once: live or deleted
    assert set(got) == set(base)
    for st, (live, deleted) in got.items():
        assert live + deleted == base[st]


def test_negative_sample_never_collides_with_positives(spark):
    from mapreduce_llm_spark.io import load_table

    neg = registry.QUERIES["q_negative_sample"](spark, SF_DIR)
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    clash = neg.join(
        pos,
        (neg["o_custkey"] == pos["o_custkey"])
        & (neg["partkey"] == pos["l_partkey"]),
        "inner",
    ).count()
    assert clash == 0
    # at most 4 negatives per customer, ranks 1..k contiguous
    per = {}
    for r in neg.collect():
        per.setdefault(r["o_custkey"], []).append(r["neg_rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4


def test_merkle_tree_levels_are_consistent(spark):
    rows = registry.QUERIES["q_merkle_tree"](spark, SF_DIR).collect()
    leaves = [r for r in rows if r["level"] == "leaf"]
    nodes = [r for r in rows if r["level"] == "node"]
    roots = [r for r in rows if r["level"] == "root"]
    assert len(roots) == 1
    # row counts roll up exactly at every level
    assert sum(r["n_rows"] for r in leaves) == roots[0]["n_rows"]
    assert sum(r["n_rows"] for r in nodes) == roots[0]["n_rows"]
    per_nation = {}
    for r in leaves:
        per_nation[r["n_name"]] = per_nation.get(r["n_name"], 0) + r["n_rows"]
    assert {r["n_name"]: r["n_rows"] for r in nodes} == per_nation


def test_bucket_skew_shares_sum_to_one(spark):
    rows = registry.QUERIES["q_bucket_skew"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 32
    total = sum(r["cnt"] for r in rows)
    share = sum(r["share_e4"] for r in rows)
    # floor shares: within 32 basis-point floors of exactly 10000
    assert 10000 - 32 < share <= 10000
    assert total > 0
