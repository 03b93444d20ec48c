"""Semantic laws for the round-9 seed tranche — the properties the
hash gate can't express: the watermark tradeoff curve is monotone and
its zero-delay point IS the disorder audit's late count; the churn
label never leaks outcome information into the observation window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.queries.analytics_r9_staged import STAGED_R9
from tests.conftest import SF_DIR


def _run(spark, name):
    fn, _sql = STAGED_R9[name]
    return [r.asDict() for r in fn(spark, SF_DIR).collect()]


def test_disorder_audit_accounting(spark):
    rows = _run(spark, "q_disorder_audit")
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_events"]
        assert 0 <= r["late_bp"] <= 10000
        assert 0 <= r["mean_late_us"] <= r["max_late_us"]


def test_watermark_yield_is_monotone_and_anchored(spark):
    rows = sorted(_run(spark, "q_watermark_yield"), key=lambda r: r["delay_s"])
    assert [r["delay_s"] for r in rows] == [0, 60, 300, 900, 3600]
    n_events = load_table(spark, SF_DIR, "events").count()
    for r in rows:
        assert r["n_total"] == n_events
        assert 0 <= r["n_dropped"] <= r["n_total"]
    # a longer allowed delay never drops MORE events
    drops = [r["n_dropped"] for r in rows]
    assert drops == sorted(drops, reverse=True)
    # the zero-delay point of the curve IS the disorder audit's late count
    n_late = sum(r["n_late"] for r in _run(spark, "q_disorder_audit"))
    assert drops[0] == n_late


def test_churn_label_never_leaks_the_outcome_window(spark):
    rows = _run(spark, "q_churn_label")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    cutoff = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("c")
    ).collect()[0]["c"]
    sampled = o.where(F.col("o_custkey") % 10 == 0)
    pre = {
        r["o_custkey"]
        for r in sampled.where(F.col("o_orderdate") <= F.lit(cutoff))
        .select("o_custkey").distinct().collect()
    }
    post = {
        r["o_custkey"]
        for r in sampled.where(F.col("o_orderdate") > F.lit(cutoff))
        .select("o_custkey").distinct().collect()
    }
    # one row per customer with >= 1 observation-window order
    assert {r["o_custkey"] for r in rows} == pre
    for r in rows:
        # the label is derived STRICTLY from the outcome window
        assert r["churned"] == (0 if r["o_custkey"] in post else 1)
        assert r["days_inactive"] >= 0
        assert r["n_orders_obs"] >= 1
