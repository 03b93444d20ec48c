"""Semantic invariants for the round-10 query batch (registered in
queries/analytics_r10.py since the round-10 flip executed in round 11)
— algebraic laws of the claimed algorithms that the DuckDB hash gate
cannot express (it proves Spark ≡ oracle, not that both implement the
CLAIMED semantics). Evaluated on real testdata at SF_DIR. The staged
plan lint this file carried pre-flip is now the blanket sweep in
tests/test_plan_lint.py (NLJ allowlist carried verbatim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark, name):
    return [r.asDict() for r in registry.QUERIES[name](spark, SF_DIR).collect()]


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


# ---------------------------------------------------------------------------
# Laws for the sixth/seventh seed batches (authored in round 9).
# ---------------------------------------------------------------------------


def test_gopher_rules_counts_are_consistent(spark):
    rows = _run(spark, "q_gopher_rules")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        passes = [r["pass_count"], r["pass_wordlen"], r["pass_topshare"],
                  r["pass_distinct"], r["pass_stop"]]
        for p in passes:
            assert 0 <= p <= r["n_docs"]
        # the conjunction can never beat its weakest conjunct
        assert r["pass_all"] <= min(passes)
        assert 0 <= r["pass_all_bp"] <= 10000


def test_length_filter_yield_accounts_every_doc_and_char(spark):
    rows = _run(spark, "q_length_filter_yield")
    d = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    kept = d.filter("n_chars BETWEEN 150 AND 450").count()
    assert sum(r["kept_docs"] for r in rows) == kept
    for r in rows:
        assert r["kept_docs"] <= r["n_docs"]
        assert r["kept_chars"] <= r["total_chars"]
        assert 0 <= r["kept_bp"] <= 10000


def test_vocab_drift_is_bounded_by_the_top_k(spark):
    rows = _run(spark, "q_vocab_drift")
    assert rows
    for r in rows:
        assert r["top_k"] == 10
        assert 0 <= r["n_common"] <= 10
        assert 0 <= r["jaccard_bp"] <= 10000
        if r["n_common"]:
            # ranks live in [1, 10] so a shift can't exceed 9.00
            assert 0 <= r["mean_rank_shift_e2"] <= 900


def test_dedup_prefix_family_arithmetic(spark):
    rows = _run(spark, "q_dedup_prefix")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        # every dup family holds >= 2 docs
        assert r["docs_in_dup_families"] >= 2 * r["n_dup_families"]
        assert r["max_family"] <= r["n_docs"]
        assert 0 <= r["dup_bp"] <= 10000


def test_trigram_novelty_recounts_the_trigrams(spark):
    rows = _run(spark, "q_trigram_novelty")
    d = load_table(spark, SF_DIR, "documents")
    expected = (
        d.select(
            F.greatest(
                F.size(F.filter(F.split(F.lower("text"), "[^a-z]+"),
                                lambda w: w != F.lit(""))) - 2,
                F.lit(0),
            ).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert sum(r["total_trigrams"] for r in rows) == expected
    for r in rows:
        assert 1 <= r["distinct_trigrams"] <= r["total_trigrams"]
        assert 0 <= r["novelty_bp"] <= 10000
        assert r["top_share_bp"] >= 10000 // r["distinct_trigrams"]


def test_markov_entropy_bounds_and_weights(spark):
    import math

    rows = _run(spark, "q_markov_entropy")
    assert rows
    total = sum(r["n_out"] for r in rows)
    for r in rows:
        # 0 <= H <= ln(support); round(,4) tolerance
        assert -1e-4 <= r["entropy"] <= math.log(r["n_next_states"]) + 1e-4
        assert r["top_share_bp"] >= 10000 // r["n_next_states"]
        assert r["weight_bp"] == r["n_out"] * 10000 // total


def test_seasonality_strength_shares_nest(spark):
    rows = _run(spark, "q_seasonality_strength")
    n = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n
    for r in rows:
        assert 0 <= r["peak_hour"] <= 23
        assert r["peak_share_bp"] <= r["top4_share_bp"] <= 10000
        assert r["top4_share_bp"] <= 4 * r["peak_share_bp"]
        assert r["chi2_uniform_e4"] >= 0


def test_event_dup_burst_accounting(spark):
    rows = _run(spark, "q_event_dup_burst")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r["n_bursts"] <= r["n_events"]
        assert r["n_affected_users"] <= min(n_users, r["n_bursts"])


def test_stickiness_is_a_share(spark):
    rows = _run(spark, "q_stickiness")
    assert rows
    for r in rows:
        assert 1 <= r["n_days"] <= 7
        # every daily active user is a weekly active user
        assert r["sum_dau"] <= r["n_days"] * r["wau"]
        assert r["stickiness_e4"] <= 10000
        assert r["wau"] <= r["sum_dau"]  # each WAU is active >= 1 day


def test_partition_advisor_recomputes_byte_mass(spark):
    rows = _run(spark, "q_partition_advisor")
    d = load_table(spark, SF_DIR, "documents")
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_bytes"] for r in rows) == total
    for r in rows:
        assert r["rec_partitions"] >= 1
        assert r["mean_doc_bytes"] <= r["max_doc_bytes"]
        assert 0 < r["max_doc_share_bp"] <= 10000


def test_reorder_cadence_gap_count_and_order(spark):
    rows = _run(spark, "q_reorder_cadence")
    o = load_table(spark, SF_DIR, "orders")
    n_orders = o.count()
    n_customers = o.select("o_custkey").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_orders - n_customers
    for r in rows:
        assert 0 <= r["median_gap_days"] <= r["p90_gap_days"]


def test_price_index_base_month_is_parity(spark):
    rows = _run(spark, "q_price_index")
    assert rows
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r["brand"], []).append(r)
    for brand, rs in by_brand.items():
        base = min(rs, key=lambda r: r["m"])
        # the fixed-shape double can land one ulp under exact parity
        assert base["index_e4"] in (9999, 10000), (brand, base)
        for r in rs:
            assert r["index_e4"] > 0


def test_return_by_delay_partitions_the_fact(spark):
    rows = _run(spark, "q_return_by_delay")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    n_r = li.filter("l_returnflag = 'R'").count()
    assert sum(r["n_returned"] for r in rows) == n_r
    for r in rows:
        assert r["band_lo_days"] == r["band"] * 30
        assert 0 <= r["return_bp"] <= 10000


def test_supplier_price_dispersion_is_a_sorted_top20(spark):
    rows = _run(spark, "q_supplier_price_dispersion")
    assert len(rows) == 20
    spreads = [r["spread_bp"] for r in rows]
    assert spreads == sorted(spreads, reverse=True)
    for r in rows:
        assert r["n_suppliers"] >= 3
        assert 0 < r["min_unit_cents"] <= r["max_unit_cents"]


def test_slow_movers_covers_every_sold_part(spark):
    rows = _run(spark, "q_slow_movers")
    li = load_table(spark, SF_DIR, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    for r in rows:
        assert 0 <= r["n_stale"] <= r["n_parts"]
        assert 0 <= r["stale_qty_share_bp"] <= 10000


def test_nation_trade_balance_identity(spark):
    rows = _run(spark, "q_nation_trade_balance")
    assert len(rows) == 25
    for r in rows:
        assert r["balance_cents"] == r["supply_cents"] - r["demand_cents"]
    li = load_table(spark, SF_DIR, "lineitem")
    total = li.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).cast("long")
    ).collect()[0][0]
    assert sum(r["supply_cents"] for r in rows) == total
    assert abs(sum(r["supply_share_bp"] for r in rows) - 10000) <= 25


def test_tail_index_inverse_identity(spark):
    rows = _run(spark, "q_tail_index")
    assert rows
    for r in rows:
        assert r["k"] == 100
        assert r["mean_log_excess"] > 0
        assert r["hill_alpha"] > 0
        # alpha = 1 / mean_log_excess up to the two round(,4)s
        assert abs(r["hill_alpha"] * r["mean_log_excess"] - 1) < 0.01


def test_lsh_bucket_skew_capacity_laws(spark):
    rows = _run(spark, "q_lsh_bucket_skew")
    assert [r["n_bits"] for r in rows] == [4, 8, 12]
    n_vecs = {r["n_vecs"] for r in rows}
    assert len(n_vecs) == 1  # every view covers every vector
    for r in rows:
        assert 1 <= r["buckets_used"] <= (1 << r["n_bits"])
        # the max bucket can never undershoot the uniform ideal
        assert r["max_over_uniform_e4"] >= 9999
        assert 0 <= r["empty_bp"] < 10000


def test_embed_centroid_sim_is_the_full_pair_set(spark):
    rows = _run(spark, "q_embed_centroid_sim")
    n_labels = (
        load_table(spark, SF_DIR, "embeddings")
        .select("label").distinct().count()
    )
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["band_e1"] in (-1, 0, 5, 7, 9)
        assert (r["band_e1"] == -1) == (r["dot_sign"] <= 0)


def test_embed_quantile_clip_orders_its_bounds(spark):
    rows = _run(spark, "q_embed_quantile_clip")
    emb = load_table(spark, SF_DIR, "embeddings")
    width = emb.select(F.size("embedding")).first()[0]
    assert len(rows) == width
    n = emb.count()
    for r in rows:
        assert r["n_vals"] == n
        assert r["min_e6"] <= r["p1_e6"] <= r["p99_e6"] <= r["max_e6"]
        assert 0 <= r["sat_bp"] <= 10000
