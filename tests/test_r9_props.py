"""Semantic invariants for the round-9 query batch (registered in
queries/analytics_r9.py since the round-9 flip) — algebraic laws of
the claimed algorithms that the DuckDB hash gate cannot express (it
proves Spark ≡ oracle, not that both implement the CLAIMED
semantics). Evaluated on real testdata at SF_DIR.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark, name):
    return [r.asDict() for r in registry.QUERIES[name](spark, SF_DIR).collect()]


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


# ---- round-8-authored tranches: laws the hash gate can't express ----


def test_attribution_credit_conserves_per_journey(spark):
    """Every converting user's journey credit must sum to EXACTLY
    10000 e4 (= one conversion), whatever the integer-div remainder
    handling — recomputed per user, not per event type."""
    from pyspark.sql import Window

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    wp = Window.partitionBy("user_id").orderBy("tus", "event_id")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn("prk", F.row_number().over(wp))
        .where(F.col("prk") == 1)
        .select("user_id", F.col("tus").alias("ptus"), F.col("event_id").alias("peid"))
    )
    tp = (
        ev.join(p, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (
                (F.col("tus") < F.col("ptus"))
                | ((F.col("tus") == F.col("ptus")) & (F.col("event_id") < F.col("peid")))
            )
        )
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    wn = Window.partitionBy("user_id")
    per_user = (
        tp.select(
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .select(
            "user_id",
            F.expr(
                "CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000"
                " WHEN rn = 1 OR rn = n THEN 4000"
                " ELSE 2000 div (n - 2) + CASE WHEN rn = 2"
                " THEN 2000 - (2000 div (n - 2)) * (n - 2) ELSE 0 END END"
            ).alias("credit"),
        )
        .groupBy("user_id")
        .agg(F.sum("credit").alias("total"))
        .collect()
    )
    assert per_user
    for r in per_user:
        assert r["total"] == 10000, r
    # and the query's aggregate equals the sum of journey credits
    rows = _run(spark, "q_attribution_position")
    assert sum(r["credit_e4"] for r in rows) == 10000 * len(per_user)


def test_price_volume_mix_bridge_closes(spark):
    """pe + ve + residual must equal the revenue delta EXACTLY for
    every brand — the accounting identity the decomposition exists
    to satisfy."""
    rows = _run(spark, "q_price_volume_mix")
    assert rows
    for r in rows:
        assert (
            r["price_effect_cents"]
            + r["volume_effect_cents"]
            + r["residual_cents"]
            == r["r1"] - r["r0"]
        ), r


def test_interval_union_bounds(spark):
    """Covered time is sandwiched: at least one interval's length,
    at most the user's full span + one interval, and never more than
    n_events × interval length."""
    rows = _run(spark, "q_interval_union")
    assert rows
    iv = 1_800_000_000
    spans = {
        r["user_id"]: (r["mn"], r["mx"], r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("mn"), F.max("t").alias("mx"), F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        mn, mx, n = spans[r["user_id"]]
        assert iv <= r["covered_us"] <= (mx - mn) + iv
        assert r["covered_us"] <= n * iv
        assert 1 <= r["n_islands"] <= n


def test_pr_curve_is_monotone_and_consistent(spark):
    """tp+fn (the positive count) is threshold-invariant; tp and fp
    never increase as the threshold rises."""
    rows = sorted(_run(spark, "q_pr_curve"), key=lambda r: r["thr"])
    assert len(rows) == 6
    pos = {r["tp"] + r["fn"] for r in rows}
    assert len(pos) == 1
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)


def test_cosine_threshold_curve_is_monotone(spark):
    """A stricter cosine threshold can only merge FEWER pairs, and
    the candidate-pair count is threshold-invariant."""
    rows = sorted(_run(spark, "q_cosine_threshold_curve"), key=lambda r: r["thr_e4"])
    assert len(rows) == 5
    assert len({r["n_pairs"] for r in rows}) == 1
    dups = [r["n_dup"] for r in rows]
    assert dups == sorted(dups, reverse=True)


def test_srm_check_accounts_for_every_customer(spark):
    rows = _run(spark, "q_srm_check")
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_customers
    for r in rows:
        assert r["srm_flag"] == (r["chi2_e4"] > 38410)


def test_sortneighbor_candidate_bound(spark):
    """SNM's whole point: candidates are Θ(w·n), never quadratic —
    with w=2 forward neighbors, pairs per block are at most 2n−3."""
    rows = _run(spark, "q_dedup_sortneighbor")
    assert rows
    for r in rows:
        assert r["n_pairs"] <= max(2 * r["n_docs"] - 3, 0)
        assert 0 <= r["n_matches"] <= r["n_pairs"]


def test_header_detail_recon_accounts_for_every_order(spark):
    rows = _run(spark, "q_header_detail_recon")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert -99 == r["band"] or -15 <= r["band"] <= 15


def test_absorption_prob_dominates_direct_transition(spark):
    """P(convert within 8 steps | s) is a probability in e9 and at
    least the DIRECT s→purchase probability (one step is a subset of
    eight)."""
    from pyspark.sql import Window

    rows = {r["state"]: r for r in _run(spark, "q_absorption_prob")}
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    direct = {
        r["s"]: r["p"]
        for r in ev.select(
            F.col("event_type").alias("s"),
            F.lead("event_type").over(w).alias("t"),
        )
        .where(F.col("t").isNotNull() & (F.col("s") != "purchase"))
        .groupBy("s")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)"
                " * 1000000000 div count(*) AS BIGINT)"
            ).alias("p")
        )
        .collect()
    }
    for s, r in rows.items():
        assert 0 <= r["p_convert_e9"] <= 1_000_000_000
        assert r["p_convert_e9"] >= direct[s]


def test_assoc_rules_counts_are_consistent(spark):
    rows = _run(spark, "q_assoc_rules")
    assert rows
    for r in rows:
        assert r["n_ab"] <= min(r["n_a"], r["n_c"])
        assert 0 <= r["conf_bp"] <= 10000


def test_fk_coverage_is_internally_consistent(spark):
    rows = {r["relation"]: r for r in _run(spark, "q_fk_coverage")}
    assert set(rows) == {
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
    }
    li = load_table(spark, SF_DIR, "lineitem").count()
    assert rows["lineitem->orders"]["n_child"] == li
    for r in rows.values():
        assert 0 <= r["n_orphans"] <= r["n_child"]
        assert 0 <= r["n_unused"] <= r["n_parents"]


def test_snippet_window_bounds(spark):
    rows = _run(spark, "q_snippet_window")
    assert rows
    for r in rows:
        assert 1 <= r["best_hits"] <= 10
        assert 1 <= r["best_start"] <= r["n_words"]


def test_word_len_hist_shares_account(spark):
    rows = _run(spark, "q_word_len_hist")
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_words"]
        assert 0 <= r["share_bp"] <= 10000
    counts = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(
            "lang",
            F.size(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda w: w != F.lit(""),
                )
            ).alias("nw"),
        )
        .groupBy("lang")
        .agg(F.sum("nw").alias("n"))
        .collect()
    }
    assert by_lang == counts


def test_growth_accounting_identity(spark):
    """new + retained + resurrected must equal the month's total
    spend EXACTLY — the accounting identity the report exists for."""
    rows = {r["month_s"]: r for r in _run(spark, "q_growth_accounting")}
    assert rows
    totals = {
        r["m"]: r["cents"]
        for r in load_table(spark, SF_DIR, "orders")
        .select(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("m"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c"),
        )
        .groupBy("m")
        .agg(F.sum("c").alias("cents"))
        .collect()
    }
    assert set(rows) == set(totals)
    for m, r in rows.items():
        assert (
            r["new_cents"] + r["retained_cents"] + r["resurrected_cents"]
            == totals[m]
        ), (m, r)


def test_gap_percentiles_are_ordered_and_account(spark):
    rows = _run(spark, "q_gap_percentiles")
    assert rows
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    j = o.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "o_custkey",
    )
    per_seg = {
        r["segment"]: (r["n_orders"], r["n_custs"])
        for r in j.groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .collect()
    }
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]
        n_orders, n_custs = per_seg[r["segment"]]
        # each customer's first order has no gap
        assert r["n_gaps"] == n_orders - n_custs


def test_quantile_treatment_accounts_for_every_order(spark):
    rows = _run(spark, "q_quantile_treatment")
    assert [r["decile"] for r in rows] == list(range(10))
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_orders


def test_entry_exit_matrix_accounts_for_every_session(spark):
    rows = _run(spark, "q_entry_exit_matrix")
    assert rows
    total = sum(r["n_sessions"] for r in rows)
    # recompute the session count independently
    from pyspark.sql import Window

    e = load_table(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    n_sessions = (
        e.select(
            F.when(
                (F.col("tus") - F.lag("tus").over(w) > 1800000000)
                | F.lag("tus").over(w).isNull(),
                1,
            )
            .otherwise(0)
            .alias("ns")
        )
        .agg(F.sum("ns").alias("n"))
        .collect()[0]["n"]
    )
    assert total == n_sessions
    share = sum(r["share_bp"] for r in rows)
    assert share <= 10000  # integer floors never overshoot


def test_lang_vocab_overlap_bounds(spark):
    rows = _run(spark, "q_lang_vocab_overlap")
    assert len(rows) == 10  # C(5 langs, 2)
    for r in rows:
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["jaccard_e4"] <= 10000


def test_single_source_risk_accounts_for_every_part(spark):
    rows = _run(spark, "q_single_source_risk")
    n_parts = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    for r in rows:
        assert r["n_single_source"] <= r["n_parts"]


def test_weekend_effect_accounts_for_every_order(spark):
    rows = _run(spark, "q_weekend_effect")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["wd_orders"] + r["we_orders"] for r in rows) == n_orders


def test_hhi_trend_bounds(spark):
    rows = _run(spark, "q_hhi_trend")
    assert rows
    for r in rows:
        # HHI in [1/n, 1] scaled e8
        assert 100000000 // r["n_suppliers"] <= r["hhi_e8"] <= 100000000


def test_brand_cannibalization_corr_in_range(spark):
    rows = _run(spark, "q_brand_cannibalization")
    assert len(rows) == 10
    for r in rows:
        assert -1.0 <= r["corr_qty"] <= 1.0
        assert r["n_months"] >= 12
