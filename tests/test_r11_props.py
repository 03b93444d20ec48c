"""Semantic invariants for the round-11 query batch (registered in
queries/analytics_r11.py since the round-11 flip executed in round 12)
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


def test_filter_length_bias_agrees_with_the_rule_matrix(spark):
    """Cross-query law: n_pass per source must equal q_gopher_rules'
    pass_all (the audit examines exactly that filter)."""
    rows = {r["source"]: r for r in _run(spark, "q_filter_length_bias")}
    gopher = registry.QUERIES["q_gopher_rules"](spark, SF_DIR).collect()
    for g in gopher:
        r = rows[g["source"]]
        assert r["n_pass"] == g["pass_all"]
        assert r["n_pass"] + r["n_fail"] == g["n_docs"]
    for r in rows.values():
        assert 0 <= r["char_mass_pass_bp"] <= 10000


def test_sample_size_planner_peaks_at_half(spark):
    rows = _run(spark, "q_sample_size_planner")
    assert rows
    for r in rows:
        assert 0 <= r["p_bp"] <= 10000
        # n = z^2 p(1-p)/w^2 maxes at p=1/2: 38416*5000*5000/1e8 = 9604
        assert 0 <= r["n_req_pm100bp"] <= 9604
        assert r["sufficient"] == (r["n_req_pm100bp"] <= r["n_avail"])
        # recompute the integer formula independently
        assert (
            r["n_req_pm100bp"]
            == 38416 * r["p_bp"] * (10000 - r["p_bp"]) // 100000000
        )


def test_data_budget_conserves_the_corpus(spark):
    rows = _run(spark, "q_data_budget")
    assert len(rows) == 20  # one per source
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert r["budget_per_source"] == total * 10 // 20
        assert r["repeats_e2"] == r["budget_per_source"] * 100 // r["n_tokens"]
        assert r["over_4_epochs"] == (r["repeats_e2"] > 400)
    assert abs(sum(r["mix_bp"] for r in rows) - 10000) <= 20


def test_token_fertility_identities(spark):
    rows = _run(spark, "q_token_fertility")
    d = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        # a word plus its separator is at least 2 chars of mass
        assert r["chars_per_word_e2"] >= 100
        assert r["words_per_kib"] >= 1
        assert r["words_per_doc_e2"] == r["n_words"] * 100 // r["n_docs"]


def test_peak_load_bounds(spark):
    rows = _run(spark, "q_peak_load")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    lo, hi = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).collect()[0]
    for r in rows:
        assert 1 <= r["peak_hour_load"] <= r["n_events"]
        assert lo <= r["peak_at_us"] <= hi
        assert 0 < r["peak_share_bp"] <= 10000


def test_trade_locality_is_a_partition(spark):
    rows = _run(spark, "q_trade_locality")
    assert len(rows) == 25
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["local_cents"] <= r["total_cents"]
        assert 0 <= r["local_bp"] <= 10000


def test_discount_consistency_nests(spark):
    rows = _run(spark, "q_discount_consistency")
    assert rows
    for r in rows:
        assert 0 <= r["n_inconsistent"] <= r["n_comparable"] <= r["n_part_months"]
        assert 0 <= r["worst_spread_pct"] <= 100
        if r["n_inconsistent"]:
            assert r["worst_spread_pct"] >= 5


def test_class_weights_balance(spark):
    rows = _run(spark, "q_class_weights")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n"] for r in rows) == emb.count()
    k = len(rows)
    for r in rows:
        assert r["max_ratio_e4"] >= 10000  # max class vs itself = 1.0
        # inverse-frequency weights average ~1 across classes
        assert r["inv_freq_e4"] > 0
    mean_w = sum(r["inv_freq_e4"] for r in rows) / k
    assert mean_w >= 9800  # floors only shave, never inflate


# ---------------------------------------------------------------------------
# Laws for the second r11 seed batch.
# ---------------------------------------------------------------------------


def test_sequential_test_cumulative_monotone(spark):
    rows = sorted(_run(spark, "q_sequential_test"), key=lambda r: r["day"])
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    assert rows[-1]["n0"] + rows[-1]["n1"] == ev.count()
    prev = None
    for r in rows:
        assert 0 <= r["c0"] <= r["n0"] and 0 <= r["c1"] <= r["n1"]
        assert r["z2_e4"] >= 0
        assert r["crossed"] == (r["z2_e4"] >= 58226)
        if prev:
            # cumulative counts never decrease
            assert r["n0"] >= prev["n0"] and r["n1"] >= prev["n1"]
            assert r["c0"] >= prev["c0"] and r["c1"] >= prev["c1"]
        prev = r


def test_attribution_window_sweep_is_monotone(spark):
    rows = sorted(_run(spark, "q_attribution_window_sweep"),
                  key=lambda r: r["w_s"])
    assert [r["w_s"] for r in rows] == [3600, 86400, 604800]
    n_purchases = {r["n_purchases"] for r in rows}
    assert len(n_purchases) == 1  # the purchase set is window-invariant
    att = [r["n_attributed"] for r in rows]
    assert att == sorted(att)  # a longer window never credits fewer
    for r in rows:
        assert 0 <= r["n_attributed"] <= r["n_purchases"]


def test_brand_loyalty_bounds(spark):
    rows = _run(spark, "q_brand_loyalty")
    assert rows
    for r in rows:
        assert 0 <= r["n_repeat"] <= r["n_customers"]
        assert 0 <= r["n_exclusive"] <= r["n_customers"]
        assert 0 <= r["repeat_bp"] <= 10000
        assert 0 <= r["exclusive_bp"] <= 10000


def test_cents_audit_covers_the_money_columns(spark):
    rows = {r["col_name"]: r for r in _run(spark, "q_cents_audit")}
    assert set(rows) == {
        "lineitem.l_extendedprice", "orders.o_totalprice",
        "customer.c_acctbal", "supplier.s_acctbal",
    }
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    assert rows["lineitem.l_extendedprice"]["n_vals"] == li_n
    for r in rows.values():
        assert 0 <= r["n_noncents"] <= r["n_vals"]
        assert 0 <= r["noncents_bp"] <= 10000
    # the engine-wide cents convention REQUIRES these fixtures be
    # cent-exact — a nonzero count here invalidates the convention
    assert rows["lineitem.l_extendedprice"]["n_noncents"] == 0
    assert rows["orders.o_totalprice"]["n_noncents"] == 0


def test_embed_norm_bias_orders_quantiles(spark):
    rows = _run(spark, "q_embed_norm_bias")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert (
            r["min_q2_e6"] <= r["p50_q2_e6"] <= r["p90_q2_e6"]
            <= r["max_q2_e6"]
        )
        assert r["min_q2_e6"] >= 0  # squared norms


# ---------------------------------------------------------------------------
# Laws for the third r11 seed batch.
# ---------------------------------------------------------------------------


def test_fulfillment_span_percentiles_order(spark):
    rows = _run(spark, "q_fulfillment_span")
    assert rows
    for r in rows:
        assert (
            0 <= r["median_span_days"] <= r["p90_span_days"]
            <= r["max_span_days"]
        )
        assert r["n_orders"] >= 1


def test_returns_value_nests_and_recounts(spark):
    rows = _run(spark, "q_returns_value")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    total = li.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).cast("long")
    ).collect()[0][0]
    assert sum(r["total_cents"] for r in rows) == total
    for r in rows:
        assert 0 <= r["returned_cents"] <= r["total_cents"]
        assert 0 <= r["returned_value_bp"] <= 10000
        assert 0 <= r["returned_lines_bp"] <= 10000


def test_lang_mix_entropy_bounds(spark):
    import math

    rows = _run(spark, "q_lang_mix_entropy")
    d = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert -1e-4 <= r["lang_entropy"] <= math.log(r["n_langs"]) + 1e-4
        assert r["top_lang_bp"] >= 10000 // r["n_langs"]


def test_quantization_error_is_bounded_by_the_grid(spark):
    rows = _run(spark, "q_quantization_error")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    width = emb.select(F.size("embedding")).first()[0]
    for r in rows:
        # each residual is in (-1000, 1000) so r^2 < 1e6 per dim
        assert 0 <= r["mean_sq_err_per_dim_e12"] < 1_000_000
        assert r["max_vec_sq_err_e12"] < width * 1_000_000
        assert r["total_sq_err_e12"] >= r["max_vec_sq_err_e12"]


# ---------------------------------------------------------------------------
# Laws for the fourth r11 seed batch.
# ---------------------------------------------------------------------------


def test_dow_stability_accounts_every_order(spark):
    rows = _run(spark, "q_dow_stability")
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["max_dev_bp"] <= 10000
        assert r["unstable"] == (r["max_dev_bp"] > 200)


def test_split_balance_recounts_and_bounds(spark):
    rows = _run(spark, "q_split_balance")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n"] for r in rows) == emb.count()
    total_test = sum(r["n_test"] for r in rows)
    corpus_bp = total_test * 10000 // emb.count()
    # the md5 % 5 == 0 rule targets ~20%
    assert 1000 <= corpus_bp <= 3000
    for r in rows:
        assert 0 <= r["n_test"] <= r["n"]
        assert r["dev_bp"] == abs(r["test_bp"] - corpus_bp)


def test_shingle_df_profile_conserves_postings(spark):
    rows = _run(spark, "q_shingle_df_profile")
    assert rows
    # posting mass equals the distinct (doc, shingle) pair count
    d = load_table(spark, SF_DIR, "documents")
    words = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda w: w != F.lit("")
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(words) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(words, i),
                        F.element_at(words, i + 1),
                        F.element_at(words, i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("s"),
    )
    expected = sh.distinct().count()
    assert sum(r["posting_mass"] for r in rows) == expected
    bands = [r["band"] for r in rows]
    assert bands == sorted(bands)
    assert abs(sum(r["mass_bp"] for r in rows) - 10000) <= len(rows)


# ---------------------------------------------------------------------------
# Laws for the fifth r11 seed batch.
# ---------------------------------------------------------------------------


def test_monthly_seasonality_index_averages_to_parity(spark):
    rows = _run(spark, "q_monthly_seasonality")
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["seg"], []).append(r)
        flag = 1 if r["seasonal_index_e4"] > 11000 else (
            -1 if r["seasonal_index_e4"] < 9000 else 0
        )
        assert r["season_flag"] == flag
    for seg, rs in by_seg.items():
        assert len(rs) == 12
        # indexes sum to ~12 * 10000 (floors shave at most 1 bp each)
        assert 120000 - 12 <= sum(r["seasonal_index_e4"] for r in rs) <= 120000


def test_trigram_exclusivity_bounds(spark):
    rows = _run(spark, "q_trigram_exclusivity")
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_exclusive"] <= r["n_trigrams"]
        assert 0 <= r["exclusive_bp"] <= 10000


def test_activity_span_percentiles_order(spark):
    rows = _run(spark, "q_activity_span")
    assert rows
    for r in rows:
        assert (
            0 <= r["p10_span_days"] <= r["median_span_days"]
            <= r["p90_span_days"]
        )
        assert r["n_customers"] >= 1


def test_value_vs_delay_partitions_the_fact(spark):
    rows = _run(spark, "q_value_vs_delay")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["median_delay_days"] <= r["p90_delay_days"]


# ---------------------------------------------------------------------------
# Laws for the sixth r11 seed batch.
# ---------------------------------------------------------------------------


def test_prefix_length_curve_is_monotone(spark):
    rows = sorted(_run(spark, "q_prefix_length_curve"),
                  key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2, 4, 8]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    drops = [r["n_dropped"] for r in rows]
    keys = [r["n_keys"] for r in rows]
    # a longer prefix is a refinement: it never merges MORE docs
    assert drops == sorted(drops, reverse=True)
    assert keys == sorted(keys)
    for r in rows:
        assert r["n_docs"] == n_docs
        assert r["n_dropped"] == r["n_docs"] - r["n_keys"]
        assert r["max_family"] <= r["n_docs"]


def test_first_touch_profile_partitions_users(spark):
    rows = _run(spark, "q_first_touch_profile")
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["n_converted_7d"] <= r["n_users"]
        assert 0 <= r["conv_7d_bp"] <= 10000


def test_linenumber_lag_anchors_at_line_zero(spark):
    rows = _run(spark, "q_linenumber_lag")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["median_lag_days"] <= r["p90_lag_days"]
    # the minimum line number of an order ships at lag >= 0 and some
    # line in every order defines the first shipment, so the global
    # minimum median must be >= 0 (already pinned) and the smallest
    # position's median lag should not exceed the largest position's
    # p90 (sequential flow sanity)
    first = min(rows, key=lambda r: r["l_linenumber"])
    last = max(rows, key=lambda r: r["l_linenumber"])
    assert first["median_lag_days"] <= last["p90_lag_days"]


# ---------------------------------------------------------------------------
# Laws for the seventh r11 seed batch.
# ---------------------------------------------------------------------------


def test_balance_activity_deciles_partition_customers(spark):
    rows = sorted(_run(spark, "q_balance_activity"),
                  key=lambda r: r["decile"])
    c = load_table(spark, SF_DIR, "customer")
    assert sum(r["n_customers"] for r in rows) == c.count()
    assert [r["decile"] for r in rows] == list(range(10))
    mins = [r["min_bal_cents"] for r in rows]
    assert mins == sorted(mins)  # deciles ascend in balance
    for r in rows:
        assert r["orders_per_cust_e2"] >= 0


def test_ingest_mix_drift_shares_account(spark):
    rows = _run(spark, "q_ingest_mix_drift")
    assert len(rows) == 20
    early = sum(r["early_bp"] or 0 for r in rows)
    late = sum(r["late_bp"] or 0 for r in rows)
    assert 10000 - 20 <= early <= 10000
    assert 10000 - 20 <= late <= 10000
    for r in rows:
        assert r["drift_bp"] == abs((r["late_bp"] or 0) - (r["early_bp"] or 0))


def test_supplier_balance_risk_nests(spark):
    rows = _run(spark, "q_supplier_balance_risk")
    assert len(rows) == 25
    s = load_table(spark, SF_DIR, "supplier")
    assert sum(r["n_suppliers"] for r in rows) == s.count()
    for r in rows:
        assert 0 <= r["n_negative"] <= r["n_suppliers"]
        assert 0 <= r["at_risk_cents"] <= r["total_cents"]
        assert 0 <= r["at_risk_bp"] <= 10000


# ---------------------------------------------------------------------------
# Laws for the eighth batch (event-stream science, authored in round 11).
# ---------------------------------------------------------------------------


def test_fano_factor_accounts_and_is_nonnegative(spark):
    rows = _run(spark, "q_fano_factor")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert 1 <= r["n_units"] <= r["n_events"]
        # every observed unit holds >= 1 event
        assert r["mean_per_unit_e4"] >= 10000
        # variance identity keeps the Fano factor nonnegative
        assert r["fano_e4"] >= 0


def test_early_signal_bounds(spark):
    rows = _run(spark, "q_early_signal")
    assert rows
    for r in rows:
        assert r["n_users"] >= 5
        # the first event IS inside the week-1 window, so x >= 1
        assert r["mean_x_e2"] >= 100
        assert r["mean_y_e2"] >= 0
        assert -1.0001 <= r["corr_xy"] <= 1.0001


def test_value_tail_share_dominates_uniform(spark):
    rows = _run(spark, "q_value_tail_share")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert 1 <= r["k_top"] <= r["n_events"]
        assert 0 <= r["tail_cents"] <= r["total_cents"]
        # the top k BY VALUE can never carry less than a uniform slice
        assert r["tail_share_bp"] >= r["k_top"] * 10000 // r["n_events"]
        assert r["tail_share_bp"] <= 10000


def test_transition_lift_margins(spark):
    rows = _run(spark, "q_transition_lift")
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user contributes (events - 1) consecutive pairs
    assert sum(r["n_trans"] for r in rows) == n_events - n_users
    assert all(r["lift_e4"] >= 0 for r in rows)
    # the count-weighted mean lift is 1 by construction (up to floors):
    # sum over cells of n * (n T / rs cs) / T = sum_cells n^2 T/(rs cs T)
    total = sum(r["n_trans"] for r in rows)
    wmean = sum(r["n_trans"] * r["lift_e4"] for r in rows) / total
    assert 9000 <= wmean <= 11000


def test_traffic_calendar_residuals_account(spark):
    rows = _run(spark, "q_traffic_calendar")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert 1 <= r["dow"] <= 7
        assert 0 <= r["hr"] <= 23
        assert r["resid_e2"] == r["n_events"] * 100 - r["exp_e2"]
    # independence expectations can only undershoot via per-cell floors
    # (every (dow, hr) cell is populated at this SF)
    total_resid = sum(r["resid_e2"] for r in rows)
    assert 0 <= total_resid <= len(rows)


# ---------------------------------------------------------------------------
# Laws for the ninth batch (fulfilment/pricing time series, round 11).
# ---------------------------------------------------------------------------


def test_latency_trend_accounts_and_orders(spark):
    rows = _run(spark, "q_latency_trend")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    slopes = {r["slope_e4"] for r in rows}
    assert len(slopes) == 1  # one corpus-level regression, repeated
    for r in rows:
        # delays are bounded by the corpus's ~7-year date span; the
        # synthetic stream DOES contain ship-before-order lines, so the
        # mean is signed (and emitted via double floor, never integer
        # division of a negative sum — the CLAUDE.md sign rule)
        assert -250000 <= r["mean_delay_e2"] <= 250000
        assert r["p90_days"] * 100 >= r["mean_delay_e2"]


def test_price_jumps_bounds(spark):
    rows = _run(spark, "q_price_jumps")
    p = load_table(spark, SF_DIR, "part")
    assert len(rows) == p.select("p_brand").distinct().count()
    for r in rows:
        assert r["n_months"] >= 1
        # n_jumps counts strictly-over-10% moves among n_months - 1 lags
        assert 0 <= r["n_jumps"] <= r["n_months"] - 1 or r["n_months"] == 1
        assert r["max_jump_bp"] >= 0
        if r["n_jumps"]:
            assert r["max_jump_bp"] > 1000


def test_return_seasonality_partitions(spark):
    rows = _run(spark, "q_return_seasonality")
    assert len(rows) == 12
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    n_r = li.filter("l_returnflag = 'R'").count()
    assert sum(r["n_returned"] for r in rows) == n_r
    for r in rows:
        assert 1 <= r["mon"] <= 12
        assert 0 <= r["return_bp"] <= 10000
        assert r["lift_e4"] >= 0


def test_quantile_drift_orders_its_quantiles(spark):
    rows = sorted(_run(spark, "q_quantile_drift"), key=lambda r: r["m"])
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert rows[0]["p50_mom_bp"] is None  # no predecessor month
    for r in rows:
        assert 0 < r["p50_cents"] <= r["p90_cents"]
    for prev, cur in zip(rows, rows[1:]):
        # recompute the signed MoM move
        import math

        expect = math.floor(
            (cur["p50_cents"] - prev["p50_cents"]) * 10000.0
            / prev["p50_cents"]
        )
        assert cur["p50_mom_bp"] == expect


def test_discount_yield_ledger_balances(spark):
    rows = _run(spark, "q_discount_yield")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["disc_pct"] <= 10
        assert r["net_cents"] == r["gross_cents"] - r["give_cents"]
        assert 0 <= r["give_cents"] <= r["gross_cents"]
        if r["disc_pct"] == 0:
            assert r["give_cents"] == 0
    assert 10000 - len(rows) <= sum(r["qty_share_bp"] for r in rows) <= 10000
    assert 10000 - len(rows) <= sum(r["net_share_bp"] for r in rows) <= 10000


# ---------------------------------------------------------------------------
# Laws for the tenth batch (embedding geometry + catalog/mix, round 11).
# ---------------------------------------------------------------------------


def test_embed_participation_bounds(spark):
    rows = _run(spark, "q_embed_participation")
    emb = load_table(spark, SF_DIR, "embeddings")
    width = emb.select(F.size("embedding")).first()[0]
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        # 1 <= PR <= D by Cauchy-Schwarz
        assert 100 <= r["pr_e2"] <= width * 100
        assert 1 <= r["top_dim"] <= width
        # the dominant axis can never hold less than the uniform share
        assert r["top_share_e4"] >= 10000 // width
        assert r["top_share_e4"] <= 10000


def test_embed_centroid_accuracy_accounts(spark):
    rows = _run(spark, "q_embed_centroid_accuracy")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_vecs"]
        assert 0 <= r["acc_bp"] <= 10000


def test_embed_separation_nonnegative(spark):
    rows = _run(spark, "q_embed_separation")
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        # within-distance to the FLOORED centroid is still >= the true
        # minimum-variance value, hence strictly positive here
        assert r["within_mean_e2"] > 0
        assert r["between_sq"] >= 0
        assert r["sep_e4"] >= 0


def test_catalog_name_dup_accounts(spark):
    rows = _run(spark, "q_catalog_name_dup")
    p = load_table(spark, SF_DIR, "part")
    assert sum(r["n_parts"] for r in rows) == p.count()
    # recount duplicate-named parts independently
    dup_total = (
        p.groupBy("p_name")
        .count()
        .where(F.col("count") >= 2)
        .agg(F.sum("count"))
        .collect()[0][0]
        or 0
    )
    assert sum(r["n_dup_named"] for r in rows) == dup_total
    for r in rows:
        # a cross-brand collision is in particular a name collision
        assert 0 <= r["n_cross_brand"] <= r["n_dup_named"]
        assert 0 <= r["dup_bp"] <= 10000


def test_segment_mix_shift_baseline_is_zeroish(spark):
    rows = sorted(_run(spark, "q_segment_mix_shift"), key=lambda r: r["m"])
    assert rows
    # month 0 IS the baseline for every segment present in it; segments
    # absent from month 0 baseline at their own first month, so the
    # first row's drift is exactly 0
    assert rows[0]["l1_drift_bp"] == 0
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    for r in rows:
        assert 0 <= r["l1_drift_bp"] <= 20000
        assert r["n_buyers"] >= 1
    # monthly distinct-buyer totals recount
    expected = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
            .alias("m"),
            "o_custkey",
        )
        .distinct()
        .groupBy("m")
        .count()
        .collect()
    )
    exp = {r["m"]: r["count"] for r in expected}
    got = {r["m"]: r["n_buyers"] for r in rows}
    assert got == exp


# ---------------------------------------------------------------------------
# Laws for the eleventh batch (window close at 50, round 11).
# ---------------------------------------------------------------------------


def test_nation_specialization_bounds(spark):
    rows = _run(spark, "q_nation_specialization")
    assert len(rows) == 25
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 1 <= r["n_types"] <= 6
        # HHI of a mix over k types lives in [1e4/k - floors, 1e4]
        assert 10000 // r["n_types"] - r["n_types"] <= r["hhi_e4"] <= 10000
        assert 0 <= r["l1_e4"] <= 20000


def test_assortment_drift_set_arithmetic(spark):
    rows = _run(spark, "q_assortment_drift")
    assert rows
    for r in rows:
        assert 1 <= r["n_h1"] <= 10 and 1 <= r["n_h2"] <= 10
        assert 0 <= r["n_common"] <= min(r["n_h1"], r["n_h2"])
        assert 0 <= r["jaccard_bp"] <= 10000
        # two length-<=10 rank lists can shift by at most 9 on average
        assert 0 <= r["mean_rank_shift_e2"] <= 900
        if r["n_common"] == min(r["n_h1"], r["n_h2"]) == 10:
            assert r["jaccard_bp"] == 10000


def test_position_bias_distribution_laws(spark):
    rows = _run(spark, "q_position_bias")
    assert rows
    for r in rows:
        assert 1 <= r["first_vocab"] <= r["vocab"]
        # L1 between two (floored) distributions is < 2.0
        assert 0 <= r["l1_e4"] <= 20000
        # the top first-word share can't undershoot uniform over the
        # observed first-vocab
        assert r["top_first_e4"] >= 10000 // max(r["first_vocab"], 1) - 1


def test_tax_discount_grid_margins(spark):
    rows = _run(spark, "q_tax_discount_grid")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["disc_pct"] <= 10
        assert 0 <= r["tax_pct"] <= 8
        assert r["resid_e2"] == r["n_lines"] * 100 - r["exp_e2"]
    total_resid = sum(r["resid_e2"] for r in rows)
    assert 0 <= total_resid <= len(rows)


def test_audience_overlap_set_bounds(spark):
    rows = _run(spark, "q_audience_overlap")
    ev = load_table(spark, SF_DIR, "events")
    k = ev.select("event_type").distinct().count()
    assert len(rows) == k * (k - 1) // 2
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert max(r["n_a"], r["n_b"]) <= n_users
        # inclusion-exclusion keeps the union within the population
        assert r["n_a"] + r["n_b"] - r["n_both"] <= n_users
        assert 0 <= r["jaccard_bp"] <= 10000
