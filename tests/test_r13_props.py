"""Semantic invariants for the round-13 query batch (registered in
queries/analytics_r13.py since the round-13 flip executed in round 14)
— algebraic laws of the claimed algorithms that the DuckDB hash gate
cannot express (it proves Spark ≡ oracle, not that both implement the
CLAIMED semantics). Evaluated on real testdata at SF_DIR. The staged
plan lint this file carried pre-flip is now the blanket sweep in
tests/test_plan_lint.py (the r13 staged NLJ allowlist was empty —
nothing to carry).
"""

from __future__ import annotations

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark, name):
    return [r.asDict() for r in registry.QUERIES[name](spark, SF_DIR).collect()]

# ---------------------------------------------------------------------------
# Laws for the r13 seed tranche.
# ---------------------------------------------------------------------------


def test_peak_to_mean_laws(spark):
    rows = _run(spark, "q_peak_to_mean")
    assert rows
    for r in rows:
        assert r["mean_hour_events"] <= r["peak_hour_events"]
        # peak/mean >= 1 by definition
        assert r["peak_to_mean_e4"] >= 10000


def test_burst_ratio_laws(spark):
    rows = _run(spark, "q_burst_ratio")
    assert rows
    for r in rows:
        assert r["burst_peak"] >= 1
        assert r["median_window"] >= 1.0
        assert r["burst_ratio_e4"] >= 10000


def test_dormancy_survival_laws(spark):
    rows = _run(spark, "q_dormancy_survival")
    assert len(rows) == 3
    assert [r["threshold_days"] for r in rows] == [1, 3, 7]
    # survival is monotone nonincreasing in the threshold
    dormant = [r["n_dormant"] for r in rows]
    assert dormant == sorted(dormant, reverse=True)
    assert len({r["n_users"] for r in rows}) == 1
    for r in rows:
        assert 0 <= r["dormant_bp"] <= 10000


def test_value_by_depth_laws(spark):
    rows = _run(spark, "q_value_by_depth")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    counts = {r["depth"]: r["n_events"] for r in rows}
    # depth-k population can't exceed depth-(k-1): each user passes
    # through every position once (the capped bucket 10 accumulates)
    for k in range(2, 10):
        if k in counts and k - 1 in counts:
            assert counts[k] <= counts[k - 1]
    for r in rows:
        assert 0 <= r["mean_value_e4"] <= r["max_value_e4"]


def test_order_overlap_laws(spark):
    rows = _run(spark, "q_order_overlap")
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["n_overlap"] <= r["n_consecutive_pairs"]
    assert 0 <= r["overlap_bp"] <= 10000


def test_span_by_size_laws(spark):
    rows = _run(spark, "q_span_by_size")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_orders"] for r in rows) == li.select(
        "l_orderkey"
    ).distinct().count()
    for r in rows:
        assert 1 <= r["n_lines"] <= 7
        assert 0 <= r["mean_span_days"] <= r["max_span_days"]
        if r["n_lines"] == 1:
            # a single line ships on one day by definition
            assert r["mean_span_days"] == 0
            assert r["single_day_bp"] == 10000


def test_discount_seasonality_laws(spark):
    rows = _run(spark, "q_discount_seasonality")
    assert len(rows) == 12
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 1 <= r["mo"] <= 12
        assert 0 <= r["mean_disc_bp"] <= 1000
        assert r["discount_given_cents"] >= 0


def test_brand_breadth_laws(spark):
    rows = _run(spark, "q_brand_breadth")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    buying = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == buying
    assert sum(r["share_bp"] for r in rows) <= 10000
    for r in rows:
        assert 1 <= r["brand_band"] <= 10


def test_word_len_by_position_laws(spark):
    rows = _run(spark, "q_word_len_by_position")
    assert rows
    by_lang: dict[str, list[dict]] = {}
    for r in rows:
        assert r["third"] in (0, 1, 2)
        assert 100 <= r["mean_word_len_e2"] <= 2000
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, lrs in by_lang.items():
        assert len(lrs) == 3, f"{lang}: missing a third"
        # thirds split ~equally: no third may dwarf another by 2x
        ns = [r["n_words"] for r in lrs]
        assert max(ns) <= 2 * min(ns)


def test_head_mass_laws(spark):
    rows = _run(spark, "q_head_mass")
    assert rows
    for r in rows:
        assert 0 <= r["head_tokens"] <= r["n_tokens"]
        assert 0 <= r["head_mass_bp"] <= 10000
        # ten words can't carry less mass than 10/vocab of the tokens
        # (they are the MOST frequent ten)
        if r["vocab_size"] >= 10:
            assert r["head_tokens"] * r["vocab_size"] >= 10 * r["n_tokens"]


# ---------------------------------------------------------------------------
# Laws for the second r13 seed batch (pricing structure / tail risk).
# ---------------------------------------------------------------------------


def test_size_price_slope_laws(spark):
    rows = _run(spark, "q_size_price_slope")
    assert rows
    for r in rows:
        assert r["n"] >= 1
        assert r["mean_price_cents"] > 0
    # at least one type has size variance and thus a real slope
    assert any(r["slope_cents_per_size_e2"] is not None for r in rows)


def test_iqr_outliers_laws(spark):
    rows = _run(spark, "q_iqr_outliers")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r["n_high"] + r["n_low"] <= r["n_events"]
        # Tukey fences at 1.5 IQR cap the outlier share well below
        # 25% by construction (both fences sit outside the quartiles)
        assert 0 <= r["outlier_bp"] <= 2500


def test_delay_tail_risk_laws(spark):
    rows = _run(spark, "q_delay_tail_risk")
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["over_90d_bp"] <= r["over_60d_bp"] <= 10000
        assert r["n_over_60d"] <= r["n_lines"]


def test_dom_profile_laws(spark):
    rows = _run(spark, "q_dom_profile")
    assert 28 <= len(rows) <= 31
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert sum(r["share_bp"] for r in rows) <= 10000
    # days 29-31 occur in fewer months: their share must not exceed
    # a full day's uniform share
    by_dom = {r["dom"]: r["share_bp"] for r in rows}
    if 31 in by_dom and 15 in by_dom:
        assert by_dom[31] < by_dom[15]


def test_brand_quantity_mix_laws(spark):
    rows = _run(spark, "q_brand_quantity_mix")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        # quantities are 1..50
        assert 100 <= r["mean_qty_e2"] <= 5000
        assert 0 <= r["bulk_line_bp"] <= 10000


# ---------------------------------------------------------------------------
# Laws for the third r13 seed batch (temporal correlation / cohorts).
# ---------------------------------------------------------------------------


def test_gap_autocorr_laws(spark):
    rows = _run(spark, "q_gap_autocorr")
    assert rows
    for r in rows:
        assert -1.0 <= r["gap_autocorr"] <= 1.0
        assert r["n_pairs"] >= 2


def test_tenure_value_laws(spark):
    rows = _run(spark, "q_tenure_value")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_customers"] for r in rows) == o.select(
        "o_custkey"
    ).distinct().count()
    for r in rows:
        assert 0 <= r["tenure_years"] <= 6
        assert r["mean_orders_e2"] >= 100
        assert r["mean_spend_cents"] > 0


def test_ttr_by_length_laws(spark):
    rows = _run(spark, "q_ttr_by_length")
    assert rows
    for r in rows:
        assert 0 < r["pooled_ttr_e4"] <= 10000
    # Heaps' law: pooled TTR falls as documents get longer
    rows.sort(key=lambda r: r["length_band"])
    if len(rows) >= 2:
        assert rows[0]["pooled_ttr_e4"] >= rows[-1]["pooled_ttr_e4"]


def test_rank_stability_laws(spark):
    rows = _run(spark, "q_rank_stability")
    assert rows
    k = len(rows)
    for r in rows:
        # ranks live in [1, k]
        assert 100 <= r["mean_rank_e2"] <= 100 * k
        # a rank can move at most k-1 places
        assert 0 <= r["mean_abs_rank_change_e2"] <= 100 * (k - 1)


def test_session_value_laws(spark):
    rows = _run(spark, "q_session_value")
    assert rows
    for r in rows:
        assert 0 <= r["value_band"] <= 9
        assert r["n_sessions"] >= 1
        assert r["mean_depth_e2"] >= 100
        assert r["mean_value_e4"] >= 0


# ---------------------------------------------------------------------------
# Laws for the fourth r13 seed batch (loyalty / dependency / continuity).
# ---------------------------------------------------------------------------


def test_first_basket_effect_laws(spark):
    rows = _run(spark, "q_first_basket_effect")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_customers"] for r in rows) == o.select(
        "o_custkey"
    ).distinct().count()
    for r in rows:
        assert 0 <= r["first_value_band"] <= 4
        assert r["mean_orders_e2"] >= 100
        assert 0 <= r["repeat_bp"] <= 10000


def test_basket_size_trend_laws(spark):
    rows = _run(spark, "q_basket_size_trend")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_orders"] for r in rows) == li.select(
        "l_orderkey"
    ).distinct().count()
    for r in rows:
        # an order has 1..7 lines in this corpus shape
        assert 100 <= r["mean_lines_e2"] <= 700
        assert 100 <= r["mean_parts_e2"] <= r["mean_lines_e2"]


def test_supplier_dependency_laws(spark):
    rows = _run(spark, "q_supplier_dependency")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_parts"] for r in rows) == li.select(
        "l_partkey"
    ).distinct().count()
    for r in rows:
        assert 0 <= r["dependency_band"] <= 4
        # the top supplier carries at least 1/|suppliers-per-part| of
        # the volume; bp is always positive
        assert 0 < r["mean_dependency_bp"] <= 10000


def test_source_lang_purity_laws(spark):
    rows = _run(spark, "q_source_lang_purity")
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r["n_langs"] <= 5
        # the dominant language carries at least 1/n_langs of the mass
        assert r["top_lang_bp"] * r["n_langs"] >= 10000 - r["n_langs"]
        assert r["top_lang"]


def test_part_continuity_laws(spark):
    rows = _run(spark, "q_part_continuity")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_parts"] for r in rows) == li.select(
        "l_partkey"
    ).distinct().count()
    for r in rows:
        assert 0 <= r["continuity_band"] <= 4
        assert 0 < r["mean_continuity_bp"] <= 10000
        assert r["mean_span_months_e2"] >= 100


# ---------------------------------------------------------------------------
# Laws for the fifth r13 seed batch (regularity / universality / parity).
# ---------------------------------------------------------------------------


def test_reorder_regularity_laws(spark):
    rows = _run(spark, "q_reorder_regularity")
    assert rows
    for r in rows:
        assert 0 <= r["regularity_band"] <= 4
        # mean gap <= max gap always
        assert 0 < r["mean_regularity_bp"] <= 10000


def test_cross_segment_parts_laws(spark):
    rows = _run(spark, "q_cross_segment_parts")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_parts"] for r in rows) == li.select(
        "l_partkey"
    ).distinct().count()
    for r in rows:
        assert 1 <= r["n_segments"] <= 5
        # a part needs at least one line per segment it reaches
        assert r["mean_lines"] >= r["n_segments"] - 1


def test_discount_return_link_laws(spark):
    rows = _run(spark, "q_discount_return_link")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["disc_e2"] <= 10
        assert 0 <= r["return_bp"] <= 10000


def test_region_price_parity_laws(spark):
    rows = _run(spark, "q_region_price_parity")
    assert 1 <= len(rows) <= 5
    # signed gaps to a weighted mean bracket zero
    gaps = [r["parity_gap_e4"] for r in rows]
    assert min(gaps) <= 0
    for r in rows:
        assert r["mean_ratio_e4"] > 0
        assert r["parity_gap_e4"] == r["mean_ratio_e4"] - (
            sum(x["mean_ratio_e4"] * x["n_lines"] for x in rows)
            // sum(x["n_lines"] for x in rows)
        )


def test_brand_seasonal_peak_laws(spark):
    rows = _run(spark, "q_brand_seasonal_peak")
    assert rows
    for r in rows:
        assert 1 <= r["peak_month"] <= 12
        # the peak month carries at least 1/12 of the lines
        assert r["peak_month_bp"] * 12 >= 10000 - 12


# ---------------------------------------------------------------------------
# Laws for the sixth r13 seed batch (priority economics / text signals).
# ---------------------------------------------------------------------------


def test_priority_value_profile_laws(spark):
    rows = _run(spark, "q_priority_value_profile")
    assert len(rows) == 5
    assert sum(r["revenue_share_bp"] for r in rows) <= 10000
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert r["mean_cents"] > 0
        assert r["median_cents"] > 0


def test_vowel_profile_laws(spark):
    rows = _run(spark, "q_vowel_profile")
    assert rows
    for r in rows:
        # vowels are a proper subset of letters in every language here
        assert 0 < r["vowel_bp"] < 10000
        assert 0 <= r["space_bp"] < 10000


def test_basket_unit_price_laws(spark):
    rows = _run(spark, "q_basket_unit_price")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 1 <= r["size_band"] <= 7
        assert r["mean_ratio_e4"] > 0


def test_priority_mix_trend_laws(spark):
    rows = _run(spark, "q_priority_mix_trend")
    assert rows
    by_year: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["share_bp"] <= 10000
        by_year[r["yr"]] = by_year.get(r["yr"], 0) + r["share_bp"]
    for yr, tot in by_year.items():
        assert 10000 - 5 <= tot <= 10000, f"{yr}: shares must sum to ~1"


def test_value_trend_ols_laws(spark):
    rows = _run(spark, "q_value_trend_ols")
    assert rows
    for r in rows:
        assert r["n_days"] >= 2
        assert r["mean_daily_value_e4"] > 0
        assert r["slope_ve4_per_day"] is not None
        # a slope can't exceed the whole mean level per day here
        # (sanity bound: series are bounded positive)
        assert abs(r["slope_ve4_per_day"]) < 10 * r["mean_daily_value_e4"]


# ---------------------------------------------------------------------------
# Laws for tranches 7-9 (the round-12 window fill).
# ---------------------------------------------------------------------------


def test_line_position_profile_covers_every_line(spark):
    rows = _run(spark, "q_line_position_profile")
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    assert [r["l_linenumber"] for r in rows] == sorted(
        r["l_linenumber"] for r in rows
    )
    for r in rows:
        assert 0 <= r["return_share_bp"] <= 10000
        assert 0 <= r["mean_discount_bp"] <= 10000
        assert r["mean_price_cents"] > 0


def test_status_priority_mix_shares_sum_to_one(spark):
    rows = _run(spark, "q_status_priority_mix")
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    by_status: dict = {}
    by_priority: dict = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r["status_share_bp"])
        by_priority.setdefault(r["priority"], []).append(
            r["priority_share_bp"]
        )
    # integer-floor shares: each margin sums to 10000 minus < |cells|
    for shares in by_status.values():
        assert 10000 - len(shares) <= sum(shares) <= 10000
    for shares in by_priority.values():
        assert 10000 - len(shares) <= sum(shares) <= 10000


def test_order_gap_value_link_buckets(spark):
    rows = _run(spark, "q_order_gap_value_link")
    assert rows
    buckets = [r["gap_weeks"] for r in rows]
    assert all(0 <= b <= 8 for b in buckets)
    assert len(set(buckets)) == len(buckets)
    # every non-first order contributes exactly one gap
    from pyspark.sql import functions as F

    o = load_table(spark, SF_DIR, "orders")
    n_custs = o.select("o_custkey").distinct().count()
    assert sum(r["n_orders"] for r in rows) == o.count() - n_custs


def test_acctbal_order_link_conserves_customers_and_orders(spark):
    rows = _run(spark, "q_acctbal_order_link")
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_customers"] for r in rows) == c.count()
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        # schema range [-999.99, 9999.99] => bands 0..5
        assert 0 <= r["bal_band"] <= 5
        assert r["orders_per_cust_e2"] == r["n_orders"] * 100 // r["n_customers"]


def test_brand_discount_policy_bounds(spark):
    rows = _run(spark, "q_brand_discount_policy")
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == li_n
    for r in rows:
        assert 0 <= r["discounted_share_bp"] <= 10000
        # mean depth cannot exceed the max schema discount (10%)
        assert 0 <= r["mean_discount_bp"] <= 1000
        # a brand with any discounting must show positive mean depth
        if r["discounted_share_bp"] > 0:
            assert r["mean_discount_bp"] >= 0


def test_value_momentum_accounts_for_every_event(spark):
    rows = _run(spark, "q_value_momentum")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_early"] + r["n_late"] for r in rows) == ev.count()
    for r in rows:
        # the early half INCLUDES the min-ts event by construction
        assert r["n_early"] >= 1
        assert r["early_mean_e4"] >= 0 and r["late_mean_e4"] >= 0


def test_hour_value_premium_is_centered(spark):
    rows = _run(spark, "q_hour_value_premium")
    assert len(rows) == 24
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    # premiums are deviations around the corpus mean: the event-count-
    # weighted average must straddle zero within floor slack
    weighted = sum(r["premium_bp"] * r["n_events"] for r in rows)
    total = sum(r["n_events"] for r in rows)
    assert -2 * 10000 <= weighted // total <= 10000 // 24


def test_user_week_curve_week0_holds_every_user(spark):
    rows = _run(spark, "q_user_week_curve")
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    week0 = next(r for r in rows if r["wk"] == 0)
    # every user's first event lands in their own week 0
    assert week0["active_users"] == n_users
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["events_per_active_e2"] >= 100  # active => >= 1 event


def test_props_payload_matches_raw_extraction(spark):
    from pyspark.sql import functions as F

    rows = _run(spark, "q_props_payload")
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    raw_max = ev.agg(
        F.max(F.regexp_extract("props", "[0-9]+", 0).cast("long"))
    ).first()[0]
    assert max(r["max_payload"] for r in rows) == raw_max
    for r in rows:
        assert r["n_distinct_payloads"] <= r["max_payload"] + 1


def test_user_type_affinity_partitions_users(spark):
    rows = _run(spark, "q_user_type_affinity")
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    # rank-1 window: every user has exactly one modal type
    assert sum(r["n_dominated_users"] for r in rows) == n_users
    for r in rows:
        # the modal share of k types is at least ceil(1/k) of events
        assert r["mean_affinity_bp"] >= 10000 // 5
        assert 0 <= r["majority_share_bp"] <= 10000


def test_region_size_mix_conserves_lines(spark):
    rows = _run(spark, "q_region_size_mix")
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    assert len(rows) == 5
    assert sum(r["n_lines"] for r in rows) == li_n
    for r in rows:
        # p_size is 1..50 by schema
        assert 100 <= r["mean_size_e2"] <= 5000
        assert 0 <= r["large_share_bp"] <= 10000


def test_embed_sign_balance_conserves_components(spark):
    from pyspark.sql import functions as F

    rows = _run(spark, "q_embed_sign_balance")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_comp = emb.select(F.sum(F.size("embedding"))).first()[0]
    assert sum(r["n_components"] for r in rows) == n_comp
    for r in rows:
        assert 0 <= r["pos_share_bp"] <= 10000
        assert r["mean_abs_e6"] >= 0


def test_nation_customer_value_rank_is_a_permutation(spark):
    rows = _run(spark, "q_nation_customer_value")
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r["n_customers"] for r in rows) == c.count()
    assert sum(r["n_orders"] for r in rows) == o.count()
    ranks = [r["value_rank"] for r in rows]
    assert sorted(ranks) == list(range(1, len(rows) + 1))
    totals = [r["total_cents"] for r in sorted(rows, key=lambda x: x["value_rank"])]
    assert totals == sorted(totals, reverse=True)


def test_order_value_concentration_bounds(spark):
    rows = _run(spark, "q_order_value_concentration")
    assert rows
    for r in rows:
        assert r["n_lines"] >= 2
        # the top line of an n-line order carries between 1/n and all
        assert 10000 // r["n_lines"] - 1 <= r["mean_top_share_bp"] <= 10000
    # concentration must fall as baskets widen; only assert between
    # well-populated adjacent buckets (the 12-13-line tail is sparse)
    by_n = sorted(rows, key=lambda r: r["n_lines"])
    for a, b in zip(by_n, by_n[1:]):
        if a["n_orders"] >= 50 and b["n_orders"] >= 50:
            assert b["mean_top_share_bp"] <= a["mean_top_share_bp"] + 100


def test_brand_price_range_bounds(spark):
    rows = _run(spark, "q_brand_price_range")
    p = load_table(spark, SF_DIR, "part")
    assert sum(r["n_parts"] for r in rows) == p.count()
    for r in rows:
        assert r["min_cents"] <= r["max_cents"]
        assert r["range_vs_mean_bp"] >= 0
        if r["n_parts"] == 1:
            assert r["range_vs_mean_bp"] == 0
