"""Property tests for the round-4b sequence-analytics queries —
invariants that hold by construction and that the DuckDB oracle (a
same-shape SQL twin) cannot independently establish:

- fuzzy-join blocking completeness vs a Python brute force,
- Markov rows are probability distributions,
- EWMA is a convex combination of its 8-term support,
- TWA is bounded by the contributing per-user values,
- islands partition each user's stream and alternate state,
- weighted sample is a fixed-size, duplicate-free, ordered prefix,
- PSI is non-negative term-by-term.
"""

from __future__ import annotations

from mapreduce_llm_spark import registry
from tests.conftest import SF_DIR, SMOKE_SF_DIR

registry.load_all()


def test_fuzzy_join_matches_python_brute_force(spark):
    """The pigeonhole blocking must be lossless: every levenshtein≤1
    pair the naive quadratic scan finds, the blocked join finds too
    (and nothing extra). Brute force in Python over the sf0.001 subset
    — an oracle independent of BOTH engines' SQL."""
    import itertools

    rows = (
        registry.QUERIES["q_fuzzy_join"](spark, SMOKE_SF_DIR)
        .select("partkey_a", "partkey_b", "edit_dist")
        .collect()
    )
    got = {(r.partkey_a, r.partkey_b): r.edit_dist for r in rows}

    import duckdb  # only for reading parquet; the distance is Python

    parts = duckdb.sql(
        f"SELECT p_partkey, p_name FROM '{SMOKE_SF_DIR}/part.parquet' "
        "WHERE p_partkey % 7 = 0 ORDER BY p_partkey"
    ).fetchall()

    def lev(a: str, b: str) -> int:
        if a == b:
            return 0
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {}
    for (ka, na), (kb, nb) in itertools.combinations(parts, 2):
        d = lev(na, nb)
        if d <= 1:
            want[(min(ka, kb), max(ka, kb))] = d
    assert got == want


def test_markov_rows_are_distributions(spark):
    df = registry.QUERIES["q_markov_transitions"](spark, SMOKE_SF_DIR).toPandas()
    sums = df.groupby("prev_type")["p_trans"].sum()
    # p_trans is rounded to 4dp per row, so row sums land within k*5e-5
    assert ((sums - 1.0).abs() < 1e-3).all(), sums
    assert (df["n_trans"] > 0).all()


def test_ewma_is_convex_combination_of_support(spark):
    """Each EWMA value must lie within [min, max] of the 8 observations
    it averages (weights are positive and normalized)."""
    import pandas as pd

    events = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")[
        ["user_id", "event_id", "ts", "value"]
    ]
    out = registry.QUERIES["q_ewma"](spark, SMOKE_SF_DIR).toPandas()
    assert len(out) > 0
    by_user = {
        uid: g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for uid, g in events.groupby("user_id")
    }
    sample = out.sample(n=min(50, len(out)), random_state=7)
    for row in sample.itertuples():
        g = by_user[row.user_id]
        pos = g.index[g["event_id"] == row.event_id][0]
        support = g["value"].iloc[pos - 7 : pos + 1]
        assert len(support) == 8
        assert support.min() - 1e-4 <= row.ewma_value <= support.max() + 1e-4


def test_time_weighted_avg_bounded_by_values(spark):
    import pandas as pd

    events = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    out = registry.QUERIES["q_time_weighted_avg"](spark, SMOKE_SF_DIR).toPandas()
    bounds = events.groupby("user_id")["value"].agg(["min", "max"])
    merged = out.merge(bounds, left_on="user_id", right_index=True)
    assert (merged["twa_value"] >= merged["min"] - 1e-4).all()
    assert (merged["twa_value"] <= merged["max"] + 1e-4).all()
    assert (merged["span_us"] > 0).all()


def test_runs_islands_partition_stream_and_alternate(spark):
    import pandas as pd

    events = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    out = registry.QUERIES["q_runs_islands"](spark, SMOKE_SF_DIR).toPandas()
    # run lengths partition each user's events exactly
    per_user = out.groupby("user_id")["run_len"].sum()
    truth = events.groupby("user_id").size()
    assert per_user.sort_index().equals(truth.sort_index().astype(per_user.dtype))
    # adjacent islands must change state (else they'd be one island)
    for _, g in out.groupby("user_id"):
        seq = g.sort_values("run_id")["event_type"].tolist()
        assert all(a != b for a, b in zip(seq, seq[1:])), seq


def test_weighted_sample_is_fixed_ordered_prefix(spark):
    out = registry.QUERIES["q_weighted_sample"](spark, SF_DIR).toPandas()
    assert len(out) == 100
    assert out["o_orderkey"].is_unique
    pr = out["priority_ppm"].tolist()
    assert all(a >= b for a, b in zip(pr, pr[1:])), "not ordered by priority"


def test_dist_drift_psi_nonnegative(spark):
    """(q-p)·ln(q/p) is non-negative term-by-term (both factors share
    sign), so every source's PSI must be ≥ 0 even over truncated
    support and with smoothing."""
    out = registry.QUERIES["q_dist_drift"](spark, SMOKE_SF_DIR).toPandas()
    assert len(out) > 0
    assert (out["psi"] >= -1e-9).all()
    assert (out["n_vocab_tokens"] > 0).all()


def test_embed_dim_stats_covers_every_dim_uniformly(spark):
    import pandas as pd

    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    out = registry.QUERIES["q_embed_dim_stats"](spark, SMOKE_SF_DIR).toPandas()
    width = len(emb["embedding"].iloc[0])
    assert sorted(out["dim"]) == list(range(1, width + 1))
    assert (out["n_vals"] == len(emb)).all()
    assert (out["min_val"] <= out["mean_val"]).all()
    assert (out["mean_val"] <= out["max_val"]).all()


def test_hierarchy_depth_matches_closed_form(spark):
    """Pointer doubling must converge to the analytic depth of the
    parent(k)=k//2 tree: depth(k) = floor(log2(k)) + 1 for k >= 1,
    0 for the root — computed independently in Python."""
    from collections import Counter

    import duckdb

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT p_partkey FROM '{SMOKE_SF_DIR}/part.parquet'"
        ).fetchall()
    ]
    root = min(keys)

    def depth(k: int) -> int:
        d = 0
        while k > root:
            k = max(k // 2, root)
            d += 1
        return d

    want = Counter(depth(k) for k in keys)
    out = registry.QUERIES["q_hierarchy_depth"](spark, SMOKE_SF_DIR).collect()
    got = {r.depth: r.n_parts for r in out}
    assert got == dict(want)
    for r in out:
        assert r.min_partkey <= r.max_partkey


def test_fuzzy_hot_block_cap_bounds_candidates(spark):
    """A degenerate hot block (every name sharing one 4-char prefix)
    must produce ZERO candidates from that block once max_block_size
    caps it — the sub-quadratic guarantee the knob exists for — while
    pairs anchored in still-small suffix blocks survive."""
    from mapreduce_llm_spark.queries.analytics_r4b import fuzzy_pair_candidates

    # 60 names share the "aaaa" prefix but have 60 distinct suffixes;
    # two of them are also edit-distance-1 via a shared suffix block.
    names = [(i, f"aaaa name {i:03d}") for i in range(60)]
    df = spark.createDataFrame(names, ["p_partkey", "p_name"])

    uncapped = fuzzy_pair_candidates(df).count()
    assert uncapped == 60 * 59 // 2  # prefix block is quadratic

    capped = fuzzy_pair_candidates(df, max_block_size=50)
    # the hot prefix block (60 > 50) is dropped; suffix blocks are all
    # singletons, so no candidates remain
    assert capped.count() == 0

    # a small block under the cap is untouched: identical suffixes
    df2 = spark.createDataFrame(
        [(1, "xxxx common end"), (2, "yyyy common end")],
        ["p_partkey", "p_name"],
    )
    assert fuzzy_pair_candidates(df2, max_block_size=50).count() == 1


def test_basket_pair_expansion_drops_mega_baskets(spark):
    """One adversarial mega-basket (k items → C(k,2) pairs in a single
    task) must be dropped by the cap while normal baskets expand
    exactly; TPC-H orders (≤7 lines) never hit the cap, so the
    declared query's oracle needs no matching filter."""
    from mapreduce_llm_spark.queries.analytics_r4 import basket_pair_counts

    rows = [(1, i) for i in range(1000)]  # mega-basket: 499500 pairs
    rows += [(2, 10), (2, 11), (2, 12)]  # normal basket: 3 pairs
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])

    pairs = basket_pair_counts(df, "l_orderkey", "l_partkey").collect()
    assert len(pairs) == 3
    assert {(r.part_a, r.part_b) for r in pairs} == {(10, 11), (10, 12), (11, 12)}

    # raising the cap re-admits the mega-basket
    n = basket_pair_counts(
        df, "l_orderkey", "l_partkey", max_basket_items=1000
    ).count()
    assert n == 1000 * 999 // 2 + 3
