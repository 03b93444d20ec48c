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
STAGED_NLJ_OK: set[str] = {
    "q_order_status_flow",  # broadcast 1-row horizon leg
    "q_power_user_share",  # broadcast 1-row totals leg × 3-row pct grid
    "q_markov_attribution",  # crosses of 1-row overall-conversion legs
    "q_lm_generalization_gap",  # broadcast 1-row train-vocab leg
    "q_vocab_coverage_curve",  # broadcast 1-row totals leg × 3-row k grid
    "q_last_digit_uniformity",  # broadcast 1-row chi-square totals leg
    "q_leakage_scan",  # broadcast 1-row horizon-cutoff leg
}

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


def test_error_budget_burn_is_cumulative(spark):
    rows = sorted(_run(spark, "q_error_budget_burn"), key=lambda r: r["day_s"])
    assert rows
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["n_errors"] <= r["n_events"]
        assert r["exhausted"] == (r["cum_used_bp"] > 10000)


def test_open_orders_curve_conserves(spark):
    """The curve must never go negative, and the total of all deltas
    is zero except for orders still open past the horizon (every +1
    eventually gets its −1, possibly beyond the last emitted day)."""
    rows = sorted(_run(spark, "q_open_orders_curve"), key=lambda r: r["day_s"])
    assert rows
    n_orders = load_table(spark, SF_DIR, "orders").count()
    running = 0
    peak = 0
    for r in rows:
        running += r["delta"]
        assert running == r["n_open"]
        assert 0 <= r["n_open"] <= n_orders
        peak = max(peak, r["n_open"])
    assert peak > 0
    # the final open count equals orders whose close day+1 exceeds the
    # last delta day — bounded by total orders
    assert 0 <= rows[-1]["n_open"] <= n_orders


def test_order_status_flow_shares_account(spark):
    rows = _run(spark, "q_order_status_flow")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    by_bucket: dict[int, int] = {}
    for r in rows:
        by_bucket[r["age_bucket"]] = by_bucket.get(r["age_bucket"], 0) + r["share_bp"]
    for bucket, total in by_bucket.items():
        assert total <= 10000  # integer floors never overshoot


def test_split_leakage_bounds(spark):
    rows = _run(spark, "q_split_leakage")
    assert rows
    for r in rows:
        assert 0 <= r["n_cross"] <= r["n_pairs"]
        assert 0 <= r["leak_bp"] <= 10000
        # each crossed pair names at most one distinct test doc
        assert r["n_leaky_test_docs"] <= max(r["n_cross"], 0) or r["n_cross"] == 0


def test_margin_waterfall_identities(spark):
    rows = _run(spark, "q_margin_waterfall")
    assert rows
    for r in rows:
        assert r["invoice_cents"] - r["net_cents"] == r["discount_cents"]
        assert r["discount_cents"] >= 0 and r["tax_cents"] >= 0
        assert r["realization_bp"] > 0


def test_order_consolidation_bounds(spark):
    rows = _run(spark, "q_order_consolidation")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert 1 <= r["n_shipments"] <= r["n_orders"]
        assert r["n_saved"] == r["n_orders"] - r["n_shipments"]


def test_otif_accounts_for_orders_with_lines(spark):
    rows = _run(spark, "q_otif")
    n_with_lines = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == n_with_lines
    for r in rows:
        assert 0 <= r["n_otif"] <= r["n_orders"]


def test_price_band_migration_accounts_for_both_year_parts(spark):
    rows = _run(spark, "q_price_band_migration")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", F.year(F.col("l_shipdate").cast("date")).alias("y")
    )
    y0, y1 = li.agg(F.min("y"), F.max("y")).collect()[0]
    both = (
        li.where(F.col("y") == y0)
        .select("l_partkey")
        .distinct()
        .join(
            li.where(F.col("y") == y1).select("l_partkey").distinct(),
            "l_partkey",
        )
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == both


def test_dup_transitivity_bounds(spark):
    rows = _run(spark, "q_dup_transitivity")
    for r in rows:
        assert 0 <= r["n_closed"] <= r["n_wedges"]
        assert 0 <= r["closure_bp"] <= 10000


def test_power_user_share_is_monotone(spark):
    rows = sorted(_run(spark, "q_power_user_share"), key=lambda r: r["pct"])
    assert [r["pct"] for r in rows] == [1, 5, 10]
    shares = [r["share_bp"] for r in rows]
    assert shares == sorted(shares)  # a wider head owns at least as much
    for r in rows:
        assert r["top_events"] <= r["n_events"]
        assert r["share_bp"] >= r["pct"] * 100  # head outperforms uniform


def test_session_conversion_accounts_for_every_session(spark):
    rows = _run(spark, "q_session_conversion")
    total = sum(r["n_sessions"] for r in rows)
    # recount sessions independently via the entry/exit matrix total
    from mapreduce_llm_spark import registry

    ee = registry.QUERIES["q_entry_exit_matrix"](spark, SF_DIR).collect()
    assert total == sum(r["n_sessions"] for r in ee)
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_sessions"]


def test_markov_attribution_matches_absorption_and_is_nonnegative(spark):
    """Cross-query law: the base chain IS q_absorption_prob — its
    weighted per-state vector must reproduce p_base_e9 exactly; and
    removing a channel can never INCREASE conversion."""
    rows = _run(spark, "q_markov_attribution")
    assert len(rows) == 4
    base = {r["p_base_e9"] for r in rows}
    assert len(base) == 1
    for r in rows:
        assert r["effect_e9"] == r["p_base_e9"] - r["p_removed_e9"]
        assert r["effect_e9"] >= 0
    # recompute the weighted base from the staged absorption query
    from pyspark.sql import Window
    from mapreduce_llm_spark import registry

    absorb = {
        r["state"]: r["p_convert_e9"]
        for r in registry.QUERIES["q_absorption_prob"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wts = {
        r["s"]: r["w"]
        for r in ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .where((F.col("rn") == 1) & (F.col("event_type") != "purchase"))
        .groupBy(F.col("event_type").alias("s"))
        .agg(F.count("*").alias("w"))
        .collect()
    }
    expected = sum(wts[s] * absorb.get(s, 0) for s in wts) // sum(wts.values())
    assert base.pop() == expected


def test_lm_generalization_gap_direction(spark):
    rows = {r["split"]: r for r in _run(spark, "q_lm_generalization_gap")}
    assert set(rows) == {"train", "heldout"}
    for r in rows.values():
        assert r["mean_nll"] > 0
    # the model memorizes its own half: held-out NLL is never better
    assert rows["heldout"]["mean_nll"] >= rows["train"]["mean_nll"]


def test_vocab_coverage_curve_is_monotone(spark):
    rows = sorted(_run(spark, "q_vocab_coverage_curve"), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    covs = [r["coverage_bp"] for r in rows]
    assert covs == sorted(covs)
    for r in rows:
        assert r["covered_tokens"] <= r["total_tokens"]
        if r["k"] >= r["vocab_size"]:
            assert r["coverage_bp"] == 10000


def test_embed_isotropy_bounds(spark):
    rows = _run(spark, "q_embed_isotropy")
    assert rows
    for r in rows:
        # Cauchy-Schwarz: ||sum x||^2 <= n * sum ||x||^2
        assert 0 <= r["anisotropy_e6"] <= 1_000_000


def test_last_digit_uniformity_identity(spark):
    rows = _run(spark, "q_last_digit_uniformity")
    assert len(rows) == 10
    n_orders = load_table(spark, SF_DIR, "orders").count()
    counts = [r["n_orders"] for r in rows]
    assert sum(counts) == n_orders
    # recompute the integer chi-square identity
    chi2 = (10 * sum(c * c for c in counts) - n_orders * n_orders) * 10000 // n_orders
    assert all(r["chi2_e4"] == chi2 for r in rows)
    assert all(r["biased"] == (chi2 > 169190) for r in rows)


def test_returner_screen_thresholds(spark):
    rows = _run(spark, "q_returner_screen")
    for r in rows:
        assert r["n_lines"] >= 8
        assert r["return_bp"] >= 5000
        assert r["n_returned"] <= r["n_lines"]


def test_dup_lines_bounds(spark):
    rows = _run(spark, "q_dup_lines")
    assert rows
    for r in rows:
        assert r["n_lines"] >= 2
        assert 1 <= r["n_suppliers"] <= r["n_lines"]
        assert r["same_supplier_dup"] == (r["n_suppliers"] < r["n_lines"])


def test_quarter_linearity_shares_account(spark):
    rows = _run(spark, "q_quarter_linearity")
    assert rows
    for r in rows:
        s = r["m1_bp"] + r["m2_bp"] + r["m3_bp"]
        assert 10000 - 3 <= s <= 10000  # three integer floors
        assert r["hockeystick"] == (r["m3_bp"] > 4000)


def test_nzv_screen_row_accounting(spark):
    rows = _run(spark, "q_nzv_screen")
    assert len(rows) == 5
    n = load_table(spark, SF_DIR, "lineitem").count()
    for r in rows:
        assert r["n_rows"] == n
        assert 1 <= r["ndv"]
        assert r["near_zero_var"] == (
            r["ndv"] == 1 or r["mode_bp"] >= 9500
        )


def test_leakage_scan_directions(spark):
    rows = {r["feature"]: r for r in _run(spark, "q_leakage_scan")}
    assert set(rows) == {"n_orders_obs", "spend_cents", "days_inactive"}
    for r in rows.values():
        assert -1.0 <= r["corr_label"] <= 1.0
        assert r["suspicious"] == (abs(r["corr_label"]) >= 0.8)
    # the synthetic order stream is memoryless, so no feature may
    # show leakage-grade correlation — the scan coming back clean IS
    # the expected answer here (a directional sign assertion would be
    # a data property, not a law: measured corr ~ -0.02)
    assert not any(r["suspicious"] for r in rows.values())


def test_user_diversity_accounts(spark):
    rows = _run(spark, "q_user_diversity")
    eligible = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 5)
        .count()
    )
    assert sum(r["n_users"] for r in rows) == eligible
    for r in rows:
        assert 0 <= r["mean_simpson_e4"] <= 10000


def test_price_fairness_bounds(spark):
    rows = _run(spark, "q_price_fairness")
    assert rows
    for r in rows:
        assert 0 <= r["n_multi"] <= r["n_part_days"]
        assert r["max_spread_e2"] >= 0


def test_supplier_variability_thresholds(spark):
    rows = _run(spark, "q_supplier_variability")
    assert len(rows) <= 10
    for r in rows:
        assert r["n_lines"] >= 20
        assert r["cv2_e4"] >= 0


def test_knn_label_purity_accounts(spark):
    rows = _run(spark, "q_knn_label_purity")
    sampled = (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") % 50 == 0)
        .count()
    )
    assert sum(r["n_sampled"] for r in rows) == sampled
    for r in rows:
        assert 0 <= r["n_pure"] <= r["n_sampled"]


def test_user_growth_accounting_identity(spark):
    rows = {r["wk"]: r for r in _run(spark, "q_user_growth_accounting")}
    assert rows
    weekly = {
        r["wk"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000"
                " AS BIGINT)"
            ).alias("wk"),
        )
        .distinct()
        .groupBy("wk")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(weekly)
    for wk, r in rows.items():
        assert (
            r["n_new"] + r["n_retained"] + r["n_resurrected"] == weekly[wk]
        ), (wk, r)
