"""Semantic invariants for the round-8 query batch (registered in
queries/analytics_r8.py since the round-8 flip) — algebraic laws of
the claimed algorithms that the DuckDB hash gate cannot express (it
proves Spark ≡ oracle, not that both implement the CLAIMED
semantics). Evaluated on real testdata at SF_DIR.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark, name):
    return registry.QUERIES[name](spark, SF_DIR).collect()


def test_countmin_never_undercounts(spark):
    rows = _run(spark, "q_countmin_err")
    assert len(rows) == 20
    total = sum(r["true_n"] for r in rows)
    for r in rows:
        # the one-sided CMS guarantee: estimate >= truth, always
        assert r["est_n"] >= r["true_n"]
        assert r["overcount"] == r["est_n"] - r["true_n"]
        assert r["overcount"] >= 0


def test_bloom_has_no_false_negatives(spark):
    rows = _run(spark, "q_bloom_prefilter")
    assert rows
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_customers
    for r in rows:
        # a Bloom filter may overshoot, never undershoot
        assert r["n_bloom_pass"] >= r["n_in_orders"]
        assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_in_orders"]
        assert r["n_false_pos"] >= 0


def test_skew_audit_accounts_for_every_row(spark):
    rows = {r["family"]: r for r in _run(spark, "q_skew_audit")}
    li = load_table(spark, SF_DIR, "lineitem")
    expected = {
        "lineitem.l_partkey": li.count(),
        "lineitem.l_suppkey": li.count(),
        "orders.o_custkey": load_table(spark, SF_DIR, "orders").count(),
        "events.user_id": load_table(spark, SF_DIR, "events").count(),
    }
    assert set(rows) == set(expected)
    for fam, r in rows.items():
        assert r["n_rows"] == expected[fam]
        # the hottest key is at least the mean
        assert r["max_cnt"] * r["n_keys"] >= r["n_rows"]
        assert r["max_share_bp"] == r["max_cnt"] * 10000 // r["n_rows"]
    # spot-check the argmax leg on one family
    top = rows["orders.o_custkey"]
    cnt = (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .count()
        .where(F.col("o_custkey") == top["top_key"])
        .collect()[0]["count"]
    )
    assert cnt == top["max_cnt"]


def test_minhash_candidates_share_a_full_band(spark):
    rows = _run(spark, "q_minhash_eval")
    assert rows
    for r in rows:
        # band equality (3 bands x 4 rows) implies >= 4 of 12 matching
        # signature components, so the estimate is >= 4/12 by law
        assert r["est_jaccard_e4"] >= 4 * 10000 // 12
        assert 0 <= r["jaccard_e4"] <= 10000
        assert r["doc_a"] < r["doc_b"]


def test_simhash_pairs_respect_threshold_and_order(spark):
    rows = _run(spark, "q_simhash_pairs")
    assert rows
    seen = set()
    for r in rows:
        assert 0 <= r["hamming"] <= 2
        assert r["doc_a"] < r["doc_b"]
        key = (r["doc_a"], r["doc_b"])
        assert key not in seen
        seen.add(key)


def test_cuped_theta_is_pooled_and_users_partition(spark):
    rows = _run(spark, "q_cuped_adjust")
    assert len(rows) == 2
    # theta is computed on the pooled population: identical in both rows
    assert rows[0]["theta_e6"] == rows[1]["theta_e6"]
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users


def test_did_identity_and_order_accounting(spark):
    rows = _run(spark, "q_did_estimator")
    assert rows
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        # did is floored from the exact chain, the cell means from
        # their own chains: recomposition agrees within floor slack
        recomposed = (
            r["mean_treat_post_e2"]
            - r["mean_treat_pre_e2"]
            - (r["mean_ctrl_post_e2"] - r["mean_ctrl_pre_e2"])
        )
        assert abs(recomposed - r["did_e2"]) <= 4


def test_lag_features_are_leakage_safe(spark):
    rows = _run(spark, "q_lag_features")
    assert rows
    # the window orders by (o_orderdate, o_orderkey); recover that
    # order from the source table to replay the lag chain
    date_of = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_table(spark, SF_DIR, "orders")
        .where(F.col("o_custkey") % 50 == 0)
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: (date_of[r["o_orderkey"]], r["o_orderkey"]))
        # output is ordered; the first order has no history features
        assert rs[0]["lag1_cents"] is None
        assert rs[0]["prev3_avg_e2c"] is None
        for prev, cur in zip(rs, rs[1:]):
            # lag1 is exactly the previous row's value, by construction
            assert cur["lag1_cents"] == prev["cents"]
            if cur["days_since_prev"] is not None:
                assert cur["days_since_prev"] >= 0
        for r in rs:
            # history features exist together or not at all
            assert (r["lag1_cents"] is None) == (r["prev3_avg_e2c"] is None)


def test_stream_left_join_emits_unmatched_exactly_once(spark):
    rows = {r["a_type"]: r for r in _run(spark, "q_stream_left_join")}
    assert rows
    # a null-extended row is one per unmatched purchase: never duplicated
    if "(none)" in rows:
        none = rows["(none)"]
        assert none["n_pairs"] == none["n_purchases"]
    # purchase events can't be attributed to other purchases
    assert "purchase" not in rows


def test_join_card_audit_is_exact_on_a_real_join(spark):
    rows = {r["join_id"]: r for r in _run(spark, "q_join_card_audit")}
    # FK law: every lineitem matches exactly one order
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    fk = rows["lineitem*orders/orderkey"]
    assert fk["exact_card"] == li_n
    # the histogram prediction equals the executed join, no execution
    # needed for the audit itself — execute once here to prove it
    oc = rows["orders*customer/custkey"]
    executed = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert oc["exact_card"] == executed


def test_compress_advisory_run_bounds(spark):
    rows = _run(spark, "q_compress_advisory")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert {r["col"] for r in rows} == {
        "o_orderstatus", "o_orderpriority", "o_custkey"
    }
    for r in rows:
        assert r["n_rows"] == n_orders
        # every distinct value starts at least one run; runs never
        # exceed rows
        assert r["n_distinct"] <= r["n_runs"] <= r["n_rows"]
        assert r["advisory"] in ("RLE", "DICT", "PLAIN")


def test_topk_overlap_set_algebra(spark):
    rows = _run(spark, "q_topk_overlap")
    assert [r["k"] for r in rows] == [5, 10, 20]
    for r in rows:
        assert 0 <= r["n_common"] <= r["k"]
        assert r["jaccard_e4"] == r["n_common"] * 10000 // (
            2 * r["k"] - r["n_common"]
        )
        if r["n_common"]:
            # both ranks of a common member are within [1, k]
            assert 0 <= r["max_displacement"] <= r["k"] - 1


def test_inverted_positions_df_cf_laws(spark):
    rows = _run(spark, "q_inverted_positions")
    assert len(rows) == 25
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert 1 <= r["df"] <= r["cf"]


def test_delta_encode_accounts_for_every_gap(spark):
    rows = _run(spark, "q_delta_encode")
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_deltas"] for r in rows) == n_events - n_users
    for r in rows:
        assert 1 <= r["n_bits"] <= 64
        assert r["saved_bits"] == 64 * r["n_deltas"] - r["sum_bits"]


def test_hourly_profile_partitions_traffic(spark):
    rows = _run(spark, "q_hourly_profile")
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        peak = max(r["n_events"] for r in rs)
        for r in rs:
            assert r["is_peak"] == (1 if r["n_events"] == peak else 0)


def test_pq_distortion_lower_bounds_kmeans_inertia(spark):
    """Per-subspace independent code choice can only do better than the
    joint full-vector assignment built from the same seeds."""
    km = _run(spark, "q_kmeans_step")
    pq = _run(spark, "q_embed_pq")
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_assigned"] for r in km) == n_vecs
    assert sum(r["n_assigned"] for r in pq) == 4 * n_vecs
    km_inertia = sum(r["inertia_before"] for r in km)
    pq_distortion = sum(r["distortion"] for r in pq)
    assert 0 <= pq_distortion <= km_inertia


# --- tranches 1-3 (previously hash-gated only) ---------------------------


def test_stratified_kfold_partitions_the_corpus(spark):
    rows = _run(spark, "q_stratified_kfold")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["fold"] for r in rows} <= set(range(5))
    by_lang: dict[str, int] = {}
    for r in rows:
        assert 0 <= r["share_of_lang_e4"] <= 10000
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["share_of_lang_e4"]
    for lang, s in by_lang.items():
        # 5 integer floors lose at most 5 bp of the 10000
        assert 10000 - 5 <= s <= 10000


def test_source_overlap_is_the_full_zero_filled_grid(spark):
    rows = _run(spark, "q_source_overlap")
    n_sources = (
        load_table(spark, SF_DIR, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert r["overlap_e4"] == r["n_shared"] * 10000 // min(
            r["n_a"], r["n_b"]
        )


def test_ks_and_auc_and_silhouette_bounds(spark):
    for r in _run(spark, "q_ks_test"):
        assert 0 <= r["d_e4"] <= 10000
    for r in _run(spark, "q_auc_mannwhitney"):
        assert 0 <= r["auc_e6"] <= 1_000_000
        assert r["n_pos"] > 0 and r["n_neg"] > 0
    for r in _run(spark, "q_silhouette_lite"):
        assert -1.0 <= r["mean_silhouette_r4"] <= 1.0


def test_jsd_pairs_bounded_by_ln2(spark):
    rows = _run(spark, "q_jsd_sources")
    n_sources = (
        load_table(spark, SF_DIR, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert 0.0 <= r["jsd_r4"] <= 0.6932


def test_retrieval_and_perplexity_metric_ranges(spark):
    (r,) = _run(spark, "q_retrieval_eval")
    assert 0 <= r["p_at10_e4"] <= 10000
    assert 0 <= r["mrr_e4"] <= 10000
    assert 0.0 <= r["ndcg10_r4"] <= 1.0
    for row in _run(spark, "q_bigram_perplexity"):
        # add-1 smoothed negative log-likelihood is nonnegative
        assert row["mean_nll_r4"] >= 0.0
    scores = [row["score_r4"] for row in _run(spark, "q_bm25_search")]
    assert scores == sorted(scores, reverse=True)


def test_calibration_bins_account(spark):
    rows = _run(spark, "q_calibration_ece")
    for r in rows:
        assert 0 <= r["pos"] <= r["n"]
        assert 0 <= r["conf_e6"] <= 1_000_000
        assert 0 <= r["acc_e6"] <= 1_000_000


def test_histogram_equidepth_buckets_are_ordered(spark):
    rows = _run(spark, "q_histogram_equidepth")
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n_rows"] for r in rows) == li_n
    by_rf: dict[str, list] = {}
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        by_rf.setdefault(r["rf"], []).append(r)
    for rf, rs in by_rf.items():
        rs.sort(key=lambda r: r["bucket"])
        for prev, cur in zip(rs, rs[1:]):
            assert prev["hi_cents"] <= cur["lo_cents"]


def test_langid_confusion_accounts_for_every_doc(spark):
    rows = _run(spark, "q_langid_confusion")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_graph_staged_structural_laws(spark):
    for r in _run(spark, "q_graph_linkpred"):
        assert r["u"] != r["v"]
        assert r["common"] >= 1
        assert 0 <= r["jaccard_e4"] <= 10000
    for r in _run(spark, "q_graph_labelprop"):
        assert r["n_members"] >= 1
    for r in _run(spark, "q_graph_twohop"):
        assert 0 <= r["min_reach"] <= r["max_reach"]


def test_pca_project_and_stl_and_erasure_accounting(spark):
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vectors"] for r in _run(spark, "q_pca_project")) == n_vecs
    for r in _run(spark, "q_stl_outliers"):
        assert 0 <= r["n_outliers"] <= r["n_days"]
    counts = {
        "customer": load_table(spark, SF_DIR, "customer").count(),
        "orders": load_table(spark, SF_DIR, "orders").count(),
        "lineitem": load_table(spark, SF_DIR, "lineitem").count(),
    }
    for r in _run(spark, "q_erasure_cascade"):
        assert r["n_deleted"] + r["n_remaining"] == counts[r["tbl"]]


def test_quantile_normalize_rank_bounds(spark):
    rows = _run(spark, "q_quantile_normalize")
    for r in rows:
        assert 0 <= r["qrank_e4"] <= 10000
        assert 0 <= r["decile"] <= 9
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["qrank_e4"])
        for prev, cur in zip(rs, rs[1:]):
            # decile is monotone in the quantile rank
            assert prev["decile"] <= cur["decile"]


def test_staged_results_are_partitioning_invariant(spark):
    """Deterministic queries must not depend on the shuffle layout:
    re-running under a different spark.sql.shuffle.partitions must
    produce the identical ordered result (catches accidental
    order-dependent folds and non-associative accumulations)."""
    names = ("q_minhash_eval", "q_kmeans_step", "q_inverted_positions")
    baseline = {
        n: [tuple(r) for r in _run(spark, n)] for n in names
    }
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        for n in names:
            again = [tuple(r) for r in _run(spark, n)]
            assert again == baseline[n], f"{n} depends on partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


# --- tranche 6 ------------------------------------------------------------


def test_containment_dominates_jaccard(spark):
    rows = _run(spark, "q_shingle_containment")
    assert rows
    for r in rows:
        # containment >= jaccard always (same numerator, smaller denom)
        assert max(r["contain_a_e4"], r["contain_b_e4"]) >= 5000
        assert r["jaccard_e4"] <= r["contain_a_e4"]
        assert r["jaccard_e4"] <= r["contain_b_e4"]
        assert r["contain_a_e4"] <= 10000 and r["contain_b_e4"] <= 10000


def test_float_downcast_quantifies_known_lossy_columns(spark):
    rows = {r["col"]: r for r in _run(spark, "q_float_downcast_audit")}
    assert set(rows) == {
        "l_extendedprice", "l_discount", "l_quantity", "o_totalprice"
    }
    for r in rows.values():
        assert 0 <= r["n_lossy"] <= r["n_rows"]
        assert r["max_abs_err_e8"] >= 0
    # money in the 1e2..1e5 range cannot fit float32's 24-bit mantissa
    assert rows["l_extendedprice"]["n_lossy"] > 0
    # integral quantities (1..50) are exactly representable
    assert rows["l_quantity"]["n_lossy"] == 0


def test_kanonymity_monotone_in_k(spark):
    rows = sorted(_run(spark, "q_kanonymity"), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [2, 5, 10]
    for prev, cur in zip(rows, rows[1:]):
        # raising k can only expose more groups/rows
        assert prev["n_small_groups"] <= cur["n_small_groups"]
        assert prev["n_exposed_rows"] <= cur["n_exposed_rows"]
        assert prev["n_groups"] == cur["n_groups"]
        assert prev["min_group_size"] == cur["min_group_size"]


def test_histogram_equidepth_beats_equiwidth_on_balance(spark):
    rows = {r["method"]: r for r in _run(spark, "q_histogram_error")}
    assert set(rows) == {"equi_width", "equi_depth"}
    n = load_table(spark, SF_DIR, "lineitem").count()
    # equi-depth buckets are balanced by construction: ceil(n/16)
    assert rows["equi_depth"]["max_bucket_rows"] <= (n + 15) // 16 + 1
    assert rows["equi_depth"]["n_buckets"] == 16
    for r in rows.values():
        assert r["sse_e_minus6"] >= 0


# --- tranche 7 ------------------------------------------------------------


def test_asof_tolerance_never_serves_stale_features(spark):
    rows = _run(spark, "q_asof_tolerance")
    assert rows
    n_purchases = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    # one output row per purchase, no duplication, no loss
    assert len(rows) == n_purchases
    assert len({r["p_id"] for r in rows}) == n_purchases
    for r in rows:
        if r["fresh"] == 1:
            assert r["c_id"] is not None
            assert 0 <= r["gap_us"] <= 30 * 60 * 1_000_000
        else:
            # a stale feature is NULLed, never served
            assert r["c_id"] is None and r["gap_us"] is None


def test_sample_bias_audit_accounting(spark):
    rows = _run(spark, "q_sample_bias_audit")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_pop"] for r in rows) == n_orders
    for r in rows:
        assert 0 <= r["n_smp"] <= r["n_pop"]
        if r["bias_bp"] is not None:
            assert r["bias_bp"] >= 0


def test_dedup_savings_conservation(spark):
    rows = _run(spark, "q_dedup_savings")
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["chars_saved"] for r in rows) <= total_chars
    for r in rows:
        assert r["n_redundant"] == r["n_docs"] - r["n_unique"]
        assert 0 <= r["saved_bp"] <= 10000
        # no redundancy -> no savings; redundancy -> some savings unless
        # every duplicate is a zero-length doc
        if r["n_redundant"] == 0:
            assert r["chars_saved"] == 0
