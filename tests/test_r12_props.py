"""Semantic invariants for the round-12 query batch (registered in
queries/analytics_r12.py since the round-12 flip executed in round 13)
— algebraic laws of the claimed algorithms that the DuckDB hash gate
cannot express (it proves Spark ≡ oracle, not that both implement the
CLAIMED semantics). Evaluated on real testdata at SF_DIR. The staged
plan lint this file carried pre-flip is now the blanket sweep in
tests/test_plan_lint.py (NLJ allowlist carried verbatim).
"""

from __future__ import annotations

import math

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark, name):
    return [r.asDict() for r in registry.QUERIES[name](spark, SF_DIR).collect()]


# ---------------------------------------------------------------------------
# Laws for the first r12 seed batch (point-process / series shape).
# ---------------------------------------------------------------------------


def test_interarrival_hazard_laws(spark):
    rows = _run(spark, "q_interarrival_hazard")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    type_counts = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    by_type: dict[str, list[dict]] = {}
    for r in rows:
        assert 0 <= r["hazard_e4"] <= 10000
        assert 1 <= r["n_gaps"] <= r["n_at_risk"]
        by_type.setdefault(r["event_type"], []).append(r)
    for t, trs in by_type.items():
        trs.sort(key=lambda r: r["bucket"])
        # every gap is at risk in the lowest bucket: n-1 gaps per type
        assert trs[0]["n_at_risk"] == type_counts[t] - 1
        # the at-risk population shrinks as the bucket ascends, and the
        # terminal bucket's hazard is exactly 1 (all survivors fail)
        for a, b in zip(trs, trs[1:]):
            assert a["n_at_risk"] > b["n_at_risk"]
            assert b["n_at_risk"] == a["n_at_risk"] - a["n_gaps"]
        assert trs[-1]["hazard_e4"] == 10000


def test_type_cooccurrence_laws(spark):
    rows = _run(spark, "q_type_cooccurrence")
    assert rows
    seen = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert (r["type_a"], r["type_b"]) not in seen
        seen.add((r["type_a"], r["type_b"]))
        assert r["n_both"] >= 1
        assert 0 <= r["jaccard_e4"] <= 10000
        assert r["lift_e4"] >= 0


def test_drawdown_laws(spark):
    rows = _run(spark, "q_drawdown")
    assert rows
    for r in rows:
        assert r["min_daily"] <= r["max_daily"]
        # a drawdown is a drop from a running peak: bounded by the
        # total range of the daily series
        assert 0 <= r["max_drawdown"] <= r["max_daily"] - r["min_daily"]
        assert r["n_days"] >= 1
        # trough day is a real epoch day in the corpus's modern range
        assert 10000 <= r["trough_epoch_day"] <= 40000


def test_gap_entropy_laws(spark):
    rows = _run(spark, "q_gap_entropy")
    assert rows
    for r in rows:
        # 0 <= H <= ln(k), with rounding slack
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_buckets"]) + 1e-4


def test_wow_volatility_laws(spark):
    rows = _run(spark, "q_wow_volatility")
    assert rows
    for r in rows:
        assert r["n_changes"] >= 1
        assert 0 <= r["mean_abs_wow_bp"] <= r["max_abs_wow_bp"]
        # net is the signed sum of per-week changes, each of magnitude
        # <= max_abs: |net| <= n_changes * max_abs
        assert abs(r["net_wow_bp"]) <= r["n_changes"] * r["max_abs_wow_bp"]


# ---------------------------------------------------------------------------
# Laws for the second r12 batch (per-user behavioral structure).
# ---------------------------------------------------------------------------


def test_session_depth_laws(spark):
    rows = _run(spark, "q_session_depth")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    # every event lands in exactly one session
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert sum(r["share_bp"] for r in rows) <= 10000
    for r in rows:
        assert 1 <= r["depth_bucket"] <= 20
        if r["depth_bucket"] < 20:
            # an uncapped bucket holds sessions of exactly that depth
            assert r["n_events"] == r["depth_bucket"] * r["n_sessions"]
        else:
            assert r["n_events"] >= 20 * r["n_sessions"]


def test_alternation_rate_laws(spark):
    rows = _run(spark, "q_alternation_rate")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    multi = (
        ev.groupBy("user_id").count().where("count >= 2").count()
    )
    assert sum(r["n_users"] for r in rows) == multi
    for r in rows:
        assert 0 <= r["switch_decile"] <= 9
        assert 0 <= r["pooled_switch_bp"] <= 10000


def test_monotone_runs_laws(spark):
    rows = _run(spark, "q_monotone_runs")
    assert rows
    for r in rows:
        assert 0 <= r["longest_up_steps"] <= 60
        assert 0 <= r["longest_down_steps"] <= 60


def test_user_hour_hhi_laws(spark):
    rows = _run(spark, "q_user_hour_hhi")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["hhi_band"] <= 9
        # HHI of a 24-cell mix is at least 1/24 and at most 1
        assert 10000 // 24 <= r["mean_hhi_e4"] <= 10000
        assert 1 <= r["mean_active_hours"] <= 24


def test_gap_dominance_laws(spark):
    rows = _run(spark, "q_gap_dominance")
    assert rows
    for r in rows:
        assert 1 <= r["dominance_ratio"] <= 10
        # per user g1 >= g2, so the bucket means preserve the order
        assert r["mean_top_gap_s"] >= r["mean_second_gap_s"]
        assert r["n_users"] >= 1


# ---------------------------------------------------------------------------
# Laws for the third r12 batch (retail / fulfilment audits).
# ---------------------------------------------------------------------------


def test_priority_inversion_laws(spark):
    rows = _run(spark, "q_priority_inversion")
    assert rows
    for r in rows:
        # 5 priority classes -> at most C(5,2) = 10 inverted pairs
        assert 0 <= r["n_inversions"] <= 10
        assert r["max_inversion_gap_days"] >= 0.0
        if r["n_inversions"] == 0:
            assert r["max_inversion_gap_days"] == 0.0


def test_balance_sign_mix_laws(spark):
    rows = _run(spark, "q_balance_sign_mix")
    assert rows
    cust = load_table(spark, SF_DIR, "customer")
    assert sum(r["n_neg"] + r["n_pos"] for r in rows) == cust.count()
    for r in rows:
        assert 0 <= r["neg_share_bp"] <= 10000
        if r["n_neg"]:
            assert r["mean_neg_debt_cents"] > 0
        if r["n_pos"]:
            assert r["mean_pos_bal_cents"] >= 0


def test_part_token_price_laws(spark):
    rows = _run(spark, "q_part_token_price")
    # the synthetic catalog vocabulary is small (16 tokens at sf0.01)
    # so the LIMIT 20 may not bind — but it must never be exceeded
    assert 1 <= len(rows) <= 20
    counts = [r["n_parts"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["min_cents"] <= r["mean_cents"] <= r["max_cents"]


def test_multi_supplier_orders_laws(spark):
    rows = _run(spark, "q_multi_supplier_orders")
    for r in rows:
        assert r["n_supp"] >= 2
        assert 0 <= r["mean_spread_cents"] <= r["max_spread_cents"]


def test_tax_by_value_band_laws(spark):
    rows = _run(spark, "q_tax_by_value_band")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    # every order with lineitems lands in exactly one band
    assert sum(r["n_orders"] for r in rows) <= o.count()
    for r in rows:
        assert 0 <= r["value_band"] <= 9
        # tax rates are drawn from {0%..8%}
        assert 0 <= r["eff_tax_e4"] <= 800


# ---------------------------------------------------------------------------
# Laws for the fourth r12 batch (corpus statistics).
# ---------------------------------------------------------------------------


def test_hapax_rate_laws(spark):
    rows = _run(spark, "q_hapax_rate")
    assert rows
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["vocab_size"] <= r["n_tokens"]
        assert 0 <= r["hapax_share_bp"] <= 10000


def test_cramers_v_laws(spark):
    rows = _run(spark, "q_cramers_v")
    assert len(rows) == 1
    r = rows[0]
    docs = load_table(spark, SF_DIR, "documents")
    assert r["n_docs"] == docs.count()
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0
    # independent recomputation of the FULL chi2 (including zero
    # cells) from the contingency table
    import itertools
    cells = {
        (c["lang"], c["source"]): c["count"]
        for c in docs.groupBy("lang", "source").count().collect()
    }
    langs = sorted({k[0] for k in cells})
    sources = sorted({k[1] for k in cells})
    n = sum(cells.values())
    row_t = {l: sum(v for (a, _), v in cells.items() if a == l) for l in langs}
    col_t = {s: sum(v for (_, b), v in cells.items() if b == s) for s in sources}
    chi2 = 0.0
    for l, s in itertools.product(langs, sources):
        e = row_t[l] * col_t[s] / n
        o = cells.get((l, s), 0)
        chi2 += (o - e) ** 2 / e
    assert abs(chi2 - r["chi2"]) < 0.01


def test_bits_per_char_laws(spark):
    rows = _run(spark, "q_bits_per_char")
    assert rows
    for r in rows:
        assert r["n_distinct_bigrams"] <= r["n_bigrams"]
        # conditional entropy of a 27-symbol alphabet is in [0, log2 27]
        assert -1e-9 <= r["cond_entropy_bits"] <= math.log2(27) + 1e-4


def test_cohens_kappa_laws(spark):
    rows = _run(spark, "q_cohens_kappa")
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(
        r["n11"] + r["n10"] + r["n01"] + r["n00"] for r in rows
    ) == docs.count()
    for r in rows:
        assert -1.0 <= r["kappa"] <= 1.0


def test_filter_parity_laws(spark):
    rows = _run(spark, "q_filter_parity")
    assert rows
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert 0 <= r["pass_bp"] <= 10000
        assert r["gap_bp"] == r["pass_bp"] - r["corpus_bp"]
    # the corpus rate is shared by construction
    assert len({r["corpus_bp"] for r in rows}) == 1
    # gaps bracket zero: some language is above the pooled rate and
    # some below, unless all rates are exactly equal
    gaps = [r["gap_bp"] for r in rows]
    assert min(gaps) <= 0 <= max(gaps) + 60  # floor slack on small langs


# ---------------------------------------------------------------------------
# Laws for the fifth r12 batch (text-prep geometry).
# ---------------------------------------------------------------------------


def test_vocab_gini_laws(spark):
    rows = _run(spark, "q_vocab_gini")
    assert rows
    for r in rows:
        assert 0 <= r["gini_e4"] <= 10000
        assert 1 <= r["vocab_size"] <= r["n_tokens"]


def test_word_stutter_laws(spark):
    rows = _run(spark, "q_word_stutter")
    assert rows
    for r in rows:
        assert 0 <= r["n_stutters"] <= r["n_adjacent_pairs"]
        assert 0 <= r["stutter_bp"] <= 10000
        assert 0 <= r["n_docs_affected"] <= r["n_docs"]


def test_word_position_bias_laws(spark):
    rows = _run(spark, "q_word_position_bias")
    assert 1 <= len(rows) <= 10
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 <= r["mean_pos_e4"] <= 10000


def test_chunk_boundary_loss_laws(spark):
    rows = _run(spark, "q_chunk_boundary_loss")
    assert rows
    for r in rows:
        assert 0 <= r["n_midword"] <= r["n_cuts"]
        assert 0 <= r["midword_bp"] <= 10000
        # every doc counted has at least one cut (length > 200)
        assert r["n_cuts"] >= r["n_docs"]


def test_context_fit_laws(spark):
    rows = _run(spark, "q_context_fit")
    assert rows
    by_source: dict[str, list[dict]] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, srs in by_source.items():
        srs.sort(key=lambda r: r["budget"])
        assert [r["budget"] for r in srs] == [16, 32, 64, 128]
        # fit share is monotone in the budget; doc count is constant
        assert len({r["n_docs"] for r in srs}) == 1
        fits = [r["n_fit"] for r in srs]
        assert fits == sorted(fits)
        for r in srs:
            assert 0 <= r["fit_bp"] <= 10000


# ---------------------------------------------------------------------------
# Laws for the sixth r12 batch (nonparametric statistics).
# ---------------------------------------------------------------------------


def test_mood_median_laws(spark):
    rows = _run(spark, "q_mood_median")
    assert rows
    total = sum(r["n"] for r in rows)
    above = sum(r["n_above"] for r in rows)
    # by definition of the median, at most half the orders lie above
    assert above * 2 <= total + 1
    for r in rows:
        assert 0 <= r["n_above"] <= r["n"]
        assert r["chi2_cell"] >= 0.0


def test_mann_kendall_laws(spark):
    rows = _run(spark, "q_mann_kendall")
    assert rows
    for r in rows:
        n = r["n_days"]
        max_s = n * (n - 1) // 2
        assert -max_s <= r["s_stat"] <= max_s
        assert r["var_s"] > 0
        # |z| can't exceed |S|/sqrt(var) and matches its sign
        if r["s_stat"] > 0:
            assert r["z_score"] >= 0
        elif r["s_stat"] < 0:
            assert r["z_score"] <= 0
        else:
            assert r["z_score"] == 0.0


def test_theil_sen_laws(spark):
    rows = _run(spark, "q_theil_sen")
    assert rows
    for r in rows:
        n_days_implied = (1 + (1 + 8 * r["n_pairs"]) ** 0.5) / 2
        assert abs(n_days_implied - round(n_days_implied)) < 1e-9, (
            "pair count must be triangular: C(n,2)"
        )


def test_spearman_laws(spark):
    rows = _run(spark, "q_spearman")
    assert len(rows) == 1
    r = rows[0]
    assert -1.0 <= r["spearman_rho"] <= 1.0
    li = load_table(spark, SF_DIR, "lineitem")
    assert r["n"] == li.count()


def test_xcorr_lag_laws(spark):
    rows = _run(spark, "q_xcorr_lag")
    assert len(rows) == 7
    assert sorted(r["lag"] for r in rows) == [-3, -2, -1, 0, 1, 2, 3]
    for r in rows:
        assert -1.0 <= r["xcorr"] <= 1.0
        # overlap shrinks by |lag| days
        assert r["n_days"] >= 1
    by_lag = {r["lag"]: r["n_days"] for r in rows}
    assert by_lag[0] >= by_lag[3]
    assert by_lag[0] >= by_lag[-3]


# ---------------------------------------------------------------------------
# Laws for the seventh r12 batch (calendar effects / drift).
# ---------------------------------------------------------------------------


def test_month_end_load_laws(spark):
    rows = _run(spark, "q_month_end_load")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["n_tail"] <= r["n_orders"]
        assert 0 <= r["tail_orders_bp"] <= 10000
        assert 0 <= r["tail_value_bp"] <= 10000
        # ~3/30.4 days: a calendar-uniform generator sits near 986 bp;
        # sanity-bound generously
        assert 200 <= r["tail_orders_bp"] <= 3000


def test_isoweek_rollover_laws(spark):
    rows = _run(spark, "q_isoweek_rollover")
    assert rows
    for r in rows:
        # rollover rows exist only in a year's first/last ISO week:
        # at most 6 calendar days -> a small fraction of the year
        assert 0 <= r["n_december_next_isoyear"] <= r["n_orders"] // 10
        assert 0 <= r["n_january_prior_isoyear"] <= r["n_orders"] // 10


def test_quarter_end_push_laws(spark):
    rows = _run(spark, "q_quarter_end_push")
    assert rows
    last_quarter = max(r["quarter"] for r in rows)
    for r in rows:
        assert 0 <= r["push_orders_bp"] <= 10000
        assert 0 <= r["push_value_bp"] <= 10000
        # 14 of ~91 days: uniform sits near 1538 bp — except the final
        # quarter, which the corpus truncates mid-quarter (its last 14
        # days may hold no data at all)
        if r["quarter"] != last_quarter:
            assert 500 <= r["push_orders_bp"] <= 4000


def test_psi_drift_laws(spark):
    rows = _run(spark, "q_psi_drift")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_first"] + r["n_second"] for r in rows) == o.count()
    # both eras populated (the split year is inside the date range)
    assert sum(r["n_first"] for r in rows) > 0
    assert sum(r["n_second"] for r in rows) > 0
    # every PSI term is nonneg up to rounding: (p1-p2) and ln(p1/p2)
    # always share a sign
    for r in rows:
        assert r["psi_term"] >= -1e-9


def test_benford_second_laws(spark):
    rows = _run(spark, "q_benford_second")
    assert len(rows) == 10
    assert sorted(r["d2"] for r in rows) == list(range(10))
    total_obs = sum(r["obs_e6"] for r in rows)
    # floors lose at most 1 each
    assert 1000000 - 10 <= total_obs <= 1000000
    for r in rows:
        assert r["dev_e6"] == r["obs_e6"] - r["exp_e6"]


# ---------------------------------------------------------------------------
# Laws for the eighth r12 batch (catalog / supplier dynamics).
# ---------------------------------------------------------------------------


def test_new_item_ramp_laws(spark):
    rows = _run(spark, "q_new_item_ramp")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    n_parts_sold = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts_sold
    for r in rows:
        assert 0 < r["mean_lines_90d"] or r["mean_lines_90d"] == 0
        assert r["mean_lines_90d"] <= r["mean_lines_total"]
        assert 0 <= r["ramp_share_bp"] <= 10000


def test_cheapest_supplier_churn_laws(spark):
    rows = _run(spark, "q_cheapest_supplier_churn")
    assert rows
    for r in rows:
        assert 0 <= r["n_changed"] <= r["n_parts_with_history"]
        assert 0 <= r["churn_bp"] <= 10000


def test_supplier_reach_laws(spark):
    rows = _run(spark, "q_supplier_reach")
    assert rows
    sup = load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey"
    ).distinct().count()
    assert sum(r["n_suppliers"] for r in rows) == sup
    for r in rows:
        assert 0 <= r["reach_band"] <= 9
        assert r["mean_customers"] <= r["mean_lines"] or (
            # a supplier can serve a customer across many lines, so
            # lines >= customers per supplier and means preserve it
            False
        )


def test_unit_price_consistency_laws(spark):
    rows = _run(spark, "q_unit_price_consistency")
    assert rows
    for r in rows:
        assert (
            r["min_ratio_e4"]
            <= r["mean_ratio_e4"]
            <= r["max_ratio_e4"]
        )
        assert r["min_ratio_e4"] >= 0


def test_daily_mix_entropy_laws(spark):
    rows = _run(spark, "q_daily_mix_entropy")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_types"]) + 1e-4


# ---------------------------------------------------------------------------
# Laws for the ninth r12 batch (embedding geometry / engine surface).
# ---------------------------------------------------------------------------


def test_embed_signbits_laws(spark):
    rows = _run(spark, "q_embed_signbits")
    assert rows
    emb = load_table(spark, SF_DIR, "embeddings")
    # every vector lands in exactly one bucket
    assert sum(
        r["bucket_size"] * r["n_buckets"] for r in rows
    ) == emb.count()
    # at most 256 distinct 8-bit signatures
    assert sum(r["n_buckets"] for r in rows) <= 256


def test_embed_axis_dominance_laws(spark):
    rows = _run(spark, "q_embed_axis_dominance")
    assert rows
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert 1 <= r["top_axis"] <= 64
        assert 1 <= r["n_distinct_axes"] <= 64
        assert 0 < r["top_axis_share_bp"] <= 10000


def test_pivot_two_measures_laws(spark):
    rows = _run(spark, "q_pivot_two_measures")
    assert len(rows) == 5
    o = load_table(spark, SF_DIR, "orders")
    assert sum(
        r["f_cnt"] + r["o_cnt"] + r["p_cnt"] for r in rows
    ) == o.count()
    for r in rows:
        for s in "fop":
            if r[f"{s}_cnt"] == 0:
                assert r[f"{s}_cents"] == 0


def test_win_exclude_current_laws(spark):
    rows = _run(spark, "q_win_exclude_current")
    assert rows
    for r in rows:
        assert 0 <= r["n_above_loo"] <= r["n_events"]
        # roughly half of a continuous group sits above its LOO mean;
        # bound loosely
        assert 2000 <= r["above_loo_bp"] <= 8000


def test_forecast_mase_laws(spark):
    rows = _run(spark, "q_forecast_mase")
    assert rows
    for r in rows:
        assert r["n_seasonal_points"] >= 1
        assert r["mae_seasonal_e4"] >= 0
        assert r["mae_naive_e4"] >= 0
        # the emitted ratio is consistent with its components up to
        # the two floors
        if r["mae_naive_e4"] > 0:
            implied = r["mae_seasonal_e4"] / r["mae_naive_e4"]
            assert abs(implied - r["mase_e4"] / 10000) < 0.01


# ---------------------------------------------------------------------------
# Laws for the tenth r12 batch (window close).
# ---------------------------------------------------------------------------


def test_brand_return_wilson_laws(spark):
    rows = _run(spark, "q_brand_return_wilson")
    assert rows
    for r in rows:
        assert 0 <= r["n_returns"] <= r["n_lines"]
        # the Wilson lower bound never exceeds the point estimate and
        # never leaves [0, 1]
        assert 0.0 <= r["wilson_lb"] <= r["return_bp"] / 10000 + 1e-4


def test_price_staleness_laws(spark):
    rows = _run(spark, "q_price_staleness")
    assert rows
    for r in rows:
        assert 0 <= r["n_stale"] <= r["n_parts"]
        assert 0 <= r["stale_bp"] <= 10000
        assert r["mean_price_changes"] >= 0


def test_mktseg_priority_mix_laws(spark):
    rows = _run(spark, "q_mktseg_priority_mix")
    assert rows
    by_seg: dict[str, list[dict]] = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
        assert 0 <= r["share_bp"] <= 10000
        assert -10000 <= r["dev_bp"] <= 10000
    for seg, srs in by_seg.items():
        # each segment's priority shares sum to ~1 (floor losses)
        tot = sum(r["share_bp"] for r in srs)
        assert 10000 - len(srs) <= tot <= 10000


def test_value_half_life_laws(spark):
    rows = _run(spark, "q_value_half_life")
    assert rows
    for r in rows:
        assert 1 <= r["half_day_idx"] <= r["n_days"]
        assert 0 < r["half_point_bp"] <= 10000


def test_discount_by_quantity_laws(spark):
    rows = _run(spark, "q_discount_by_quantity")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["qty_band"] <= 4
        # discounts are drawn from {0%..10%}
        assert 0 <= r["mean_disc_bp"] <= 1000
        assert 0 <= r["weighted_disc_bp"] <= 1000
