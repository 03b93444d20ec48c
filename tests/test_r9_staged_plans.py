"""Plan lint over the round-9 STAGED surface (analytics_r9_staged.py)
— the same sweep tests/test_plan_lint.py runs over registered queries,
applied BEFORE the flip so the round-9 registration inherits a known
NLJ_OK set instead of discovering it in CI (q_source_overlap's grid
leg was missed by the round-7 pre-flight checklist and only caught by
the registered lint — this test closes that gap for round 9).
"""

from __future__ import annotations

import pytest

from mapreduce_llm_spark.queries.analytics_r9_staged import STAGED_R9
from tests.conftest import SMOKE_SF_DIR

# Broadcast scalar/grid legs by design — copy these into
# tests/test_plan_lint.py::NLJ_OK when the round-9 flip registers them.
STAGED_NLJ_OK = {
    "q_ab_power",  # broadcast 3-row MDE grid × 1-row moments leg
    "q_assoc_rules",  # broadcast 1-row basket-count leg
    "q_bloom_sizing",  # broadcast 1-row NDV leg × 3-row bits grid
    "q_churn_label",  # broadcast 1-row horizon-cutoff leg
    "q_cosine_threshold_curve",  # broadcast 5-row threshold grid
    "q_fk_coverage",  # broadcast 1-row parent-coverage legs per relation
    "q_pr_curve",  # broadcast 6-row threshold grid
    "q_profile_drift",  # broadcast 1-row half-profile leg
    "q_retention_sweep",  # per-table 1-row horizon leg × 3-row age grid
    "q_simpson_reversal",  # broadcast 1-row pooled-moments leg
    "q_sla_attainment",  # broadcast 3-row SLA grid
    "q_text_burstiness",  # broadcast 1-row corpus-doc-count leg
    "q_watermark_yield",  # broadcast 5-row delay grid
    "q_woe_iv",  # broadcast 1-row good/bad totals leg
}

PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_plan_lint(spark, name):
    fn, _sql = STAGED_R9[name]
    df = fn(spark, SMOKE_SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(jmode)

    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in STAGED_NLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join — broadcast-leg by design? add it "
            "to STAGED_NLJ_OK with the reason"
        )
    for marker in PY_MARKERS:
        assert marker not in plan, f"{name}: Python crossing ({marker})"


def test_staged_nlj_allowlist_is_tight():
    """Every allowlisted name must still be staged — a stale entry
    means the allowlist drifted from the surface."""
    stale = STAGED_NLJ_OK - set(STAGED_R9)
    assert not stale, f"allowlisted but not staged: {sorted(stale)}"
