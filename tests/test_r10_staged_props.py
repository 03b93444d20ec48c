"""Semantic laws for the round-10 seed tranche — properties the hash
gate can't express, plus the plan lint the round-10 flip will inherit.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.queries.analytics_r10_staged import STAGED_R10
from tests.conftest import SF_DIR, SMOKE_SF_DIR

# Broadcast grid/scalar legs by design — copy into NLJ_OK on the
# round-10 flip.
STAGED_NLJ_OK: set[str] = set()

PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def _run(spark, name):
    fn, _sql = STAGED_R10[name]
    return [r.asDict() for r in fn(spark, SF_DIR).collect()]


@pytest.mark.parametrize("name", sorted(STAGED_R10))
def test_staged_plan_lint(spark, name):
    fn, _sql = STAGED_R10[name]
    df = fn(spark, SMOKE_SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in STAGED_NLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join — add to STAGED_NLJ_OK with reason"
        )
    for marker in PY_MARKERS:
        assert marker not in plan, f"{name}: Python crossing ({marker})"


def test_percentile_ci_brackets_the_point_estimate(spark):
    rows = _run(spark, "q_percentile_ci")
    assert rows
    n_lines = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == n_lines
    for r in rows:
        assert r["ci_lo_days"] <= r["p90_days"] <= r["ci_hi_days"]


def test_forecast_backtest_bounds(spark):
    rows = _run(spark, "q_forecast_backtest")
    assert rows
    for r in rows:
        assert r["mape_e4"] >= 0
        assert r["n_days_eval"] >= 1
        # bias is a signed share of actuals: within ±10000 means the
        # totals differ by at most 100% — seasonal naive on stationary
        # synthetic traffic must satisfy this easily
        assert -10000 <= r["bias_e4"] <= 10000


def test_embed_drift_accounts_for_every_vector(spark):
    rows = _run(spark, "q_embed_drift")
    assert rows
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["na"] + r["nb"] for r in rows) == n_vecs
    for r in rows:
        assert r["shift_norm"] >= 0.0
        assert int(r["d2_str"]) >= 0


def test_band_tuning_curve_laws(spark):
    rows = _run(spark, "q_minhash_band_tuning")
    assert len(rows) == 30  # 3 configs × 10 buckets
    by = {(r["r"], r["b"], r["bucket"]): r for r in rows}
    for bucket in range(10):
        # more, smaller bands collide more at every similarity level
        assert (
            by[(2, 8, bucket)]["p_collide_e4"]
            >= by[(4, 4, bucket)]["p_collide_e4"]
            >= by[(8, 2, bucket)]["p_collide_e4"]
        )
    for cfg in [(2, 8), (4, 4), (8, 2)]:
        ps = [by[(cfg[0], cfg[1], k)]["p_collide_e4"] for k in range(10)]
        assert ps == sorted(ps)  # s-curves are monotone in similarity
    for r in rows:
        assert r["exp_collisions_e4"] == r["n_pairs"] * r["p_collide_e4"]
    # the measured histogram is shared across configs
    h0 = [by[(2, 8, k)]["n_pairs"] for k in range(10)]
    for cfg in [(4, 4), (8, 2)]:
        assert [by[(cfg[0], cfg[1], k)]["n_pairs"] for k in range(10)] == h0
