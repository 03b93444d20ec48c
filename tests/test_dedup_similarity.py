"""Semantic checks for the rows-only dedup/similarity operators —
the oracle harness only proves they *run*; these prove they find the
duplicates that were deterministically injected."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.operators.similarity import cosine_topk
from tests.conftest import SF_DIR

registry.load_all()

N_DOCS = 500  # documents rows at sf0.01
OFFSET = 1_000_000


def test_minhash_finds_injected_neardups(spark):
    """Precision is exact by construction (LSH candidates are verified
    with true Jaccard); recall is checked against the HIGH-similarity
    planted pairs — short docs legitimately fall under the 0.5
    threshold (they lose 5 of ~8 shingles), so 100% of 500 is not the
    ground truth. At j≥0.8, banding (32 hashes, 8×4) catches ≥98%."""
    pairs = registry.QUERIES["q_dedup_fuzzy"](spark, SF_DIR).collect()
    injected = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] == r["id_a"] + OFFSET}
    high_sim = [r for r in pairs if r["jaccard_sim"] >= 0.8]
    assert len(injected) >= int(0.7 * N_DOCS), f"recall too low: {len(injected)}/{N_DOCS}"
    assert len(high_sim) >= 100
    for r in pairs:
        assert r["jaccard_sim"] >= 0.5  # verify stage enforces threshold


def test_simhash_finds_injected_neardups(spark):
    pairs = registry.QUERIES["q_dedup_simhash"](spark, SF_DIR).collect()
    injected = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] == r["id_a"] + OFFSET}
    # truncating 5 of 10-99 words legitimately flips >3 bits for many
    # docs; a meaningful fraction must still land within hamming ≤ 3
    assert len(injected) >= int(0.3 * N_DOCS), f"recall too low: {len(injected)}/{N_DOCS}"
    for r in pairs:
        assert r["hamming"] <= 3


def test_ngram_jaccard_matches_python_bruteforce(spark):
    """The inverted-index Jaccard must emit exactly the pairs a
    brute-force Python set computation finds — thresholds, blocking,
    ties, short-doc whole-text shingles and all. Three seeded random
    corpora (40-word vocab → heavy shingle sharing, the adversarial
    case for an inverted index)."""
    import random

    from mapreduce_llm_spark.operators.dedup import ngram_jaccard_pairs

    vocab = [f"w{i}" for i in range(40)]
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        docs = []
        for i in range(60):
            n = rng.randint(1, 30)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n)), f"b{i % 3}"))
        # duplicate some docs with a word dropped → guaranteed high-jaccard
        for i, (did, text, blk) in enumerate(docs[:10]):
            docs.append((100 + did, " ".join(text.split()[:-1]) or text, blk))

        def shingles(text: str) -> set[str]:
            ws = text.lower().strip().split()
            if len(ws) < 3:
                return {" ".join(ws)}
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

        expected = {}
        for a in range(len(docs)):
            for b in range(len(docs)):
                ia, ta, ba = docs[a]
                ib, tb, bb = docs[b]
                if ia < ib and ba == bb:
                    sa, sb = shingles(ta), shingles(tb)
                    j = len(sa & sb) / len(sa | sb)
                    if j >= 0.5:
                        expected[(ia, ib)] = round(j, 4)

        df = spark.createDataFrame(docs, ["doc_id", "text", "block"])
        got = {
            (r["id_a"], r["id_b"]): r["jaccard_sim"]
            for r in ngram_jaccard_pairs(
                df, "text", "doc_id", ["block"], threshold=0.5
            ).collect()
        }
        assert got == expected, f"seed {seed}: {got.keys() ^ expected.keys()}"


def test_incremental_near_dup_filter_all_cases(spark):
    """One synthetic frame exercises every drop rule: replayed seen
    text → dropped; intra-batch near-dup pair → larger id dropped,
    smaller kept; new doc below a seen doc's id that near-dups it →
    still dropped (id order must not decide frame membership); a
    distinct doc survives."""
    from mapreduce_llm_spark.operators.dedup import incremental_near_dup_filter

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    seen = spark.createDataFrame(
        [(100, base), (101, "totally different corpus text here entirely now yes")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (50, base),  # near-dups seen id=100 despite smaller id → drop
            (200, base + " lambda"),  # near-dups seen id=100 → drop
            (201, other),  # batch survivor (smallest of the intra pair)
            (202, other + " eleven"),  # intra-batch dup of 201 → drop
            (203, "completely unrelated words nothing shared at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_near_dup_filter(
            new, seen, "text", "doc_id", threshold=0.5
        ).collect()
    )
    assert kept == [201, 203]


def test_ivf_index_persist_probe_and_prune(spark, tmp_path):
    """Build-once/query-many IVF index: (1) probing ALL cells of the
    persisted index reproduces exact brute-force top-k; (2) a partial
    probe's scan is partition-pruned — the _cell IN filter lands in
    PartitionFilters, not a post-scan Filter."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, n_cells=8, seed=42)

    exact = cosine_topk(e, qvec, k=10).collect()
    full_probe = query_ivf_index(spark, path, qvec, k=10, n_probe=8).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in full_probe] == [
        (r["vec_id"], r["cosine_sim"]) for r in exact
    ]

    partial = query_ivf_index(spark, path, qvec, k=10, n_probe=2)
    plan = partial._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "_cell" in plan.split("PartitionFilters: [", 1)[1]
    assert len(partial.collect()) == 10


def test_simhash_identical_docs_hamming_zero(spark):
    """Exact copies must produce identical fingerprints (hamming 0) and
    always be caught — SimHash's defining property."""
    from mapreduce_llm_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, f"some shared words plus unique token{i} end") for i in range(20)]
        + [(i + 100, f"some shared words plus unique token{i} end") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=0).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert all((i, i + 100) in found for i in range(20))
    assert all(r["hamming"] == 0 for r in pairs if r["id_b"] == r["id_a"] + 100)


def test_exact_dedup_collapses_all_pairs(spark):
    out = registry.QUERIES["q_dedup_exact"](spark, SF_DIR).collect()
    assert len(out) == N_DOCS
    assert all(r["n_copies"] == 2 and r["survivor_id"] < OFFSET for r in out)


def test_sim_search_self_match_first(spark):
    res = registry.QUERIES["q_sim_search"](spark, SF_DIR).collect()
    assert res[0]["vec_id"] == 0 and res[0]["cosine_sim"] == 1.0
    sims = [r["cosine_sim"] for r in res]
    assert sims == sorted(sims, reverse=True)


def test_ann_topk_subset_of_bucket_scores_match_exact(spark):
    """ANN results must agree with exact scores for the ids it returns."""
    from mapreduce_llm_spark.io import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {r["vec_id"]: r["cosine_sim"] for r in cosine_topk(e, qvec, k=500).collect()}
    ann = registry.QUERIES["q_sim_ann_topk"](spark, SF_DIR).collect()
    assert ann[0]["vec_id"] == 0  # query vector is in its own bucket
    for r in ann:
        assert exact[r["vec_id"]] == r["cosine_sim"]


def test_ivf_full_probe_equals_brute_force(spark):
    """IVF with n_probe = n_cells scans every cell → must reproduce the
    exact brute-force top-k (the graceful-degradation guarantee)."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import ann_topk_ivf, cosine_topk
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = cosine_topk(e, qvec, k=10).collect()
    full_probe = ann_topk_ivf(e, qvec, k=10, n_cells=8, n_probe=8, seed=42).collect()
    assert [r["vec_id"] for r in full_probe] == [r["vec_id"] for r in exact]


def test_ivf_partial_probe_has_high_recall(spark):
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import ann_topk_ivf, cosine_topk
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {r["vec_id"] for r in cosine_topk(e, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_topk_ivf(e, qvec, k=10, n_cells=16, n_probe=4, seed=42).collect()
    }
    assert len(exact & approx) >= 5


def test_numpy_scorer_matches_jvm_scorer(spark):
    """The BLAS-vectorized scorer must rank identically to the JVM
    higher-order-function scorer (same rounding, same tie-break)."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import cosine_topk, cosine_topk_np
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    jvm = cosine_topk(e, qvec, k=10).collect()
    nump = cosine_topk_np(e, qvec, k=10).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in nump] == [
        (r["vec_id"], r["cosine_sim"]) for r in jvm
    ]


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    """With a tiny cap every bucket is dropped → zero candidates; with
    the default cap the injected near-dups are still found (the cap
    only removes pathological buckets, not signal)."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.dedup import minhash_near_dup_pairs
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents")
    capped_out = minhash_near_dup_pairs(
        d, "text", "doc_id", threshold=0.5, max_bucket_size=0
    )
    assert capped_out.count() == 0
    normal = minhash_near_dup_pairs(d, "text", "doc_id", threshold=0.5)
    assert normal.count() > 0


def test_dedup_survivors_collapse_clusters(spark):
    """Chained pairs (a-b, b-c) must collapse to ONE survivor (min id),
    and untouched docs must all survive."""
    from mapreduce_llm_spark.operators.dedup import dedup_survivors_from_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           dedup_survivors_from_pairs(pairs, ids).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[99] == (99, True)


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Probing hamming-≤1 buckets must recover at least the single-
    probe results and strictly improve (or tie) recall@10 vs exact —
    the multiprobe recall-lever claim, observed."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import ann_topk_lsh, cosine_topk

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {r["vec_id"] for r in cosine_topk(e, qvec, k=10).collect()}
    single = {r["vec_id"] for r in ann_topk_lsh(e, qvec, k=10).collect()}
    multi = {
        r["vec_id"]
        for r in ann_topk_lsh(e, qvec, k=10, n_probe_bits=1).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 5  # hamming-1 probe finds most of top-10

    # full probe (all 2^4 buckets) degrades to exact — same guarantee
    # the IVF variant pins
    all_probe = {
        r["vec_id"]
        for r in ann_topk_lsh(e, qvec, k=10, n_probe_bits=2).collect()
    }
    assert len(all_probe & exact) >= len(multi & exact)


def test_word_shingles_matches_python_reference(spark):
    """The bind-words-once rewrite of word_shingles must be
    semantics-preserving: compare against a direct Python reference on
    edge cases (empty, short, whitespace runs, duplicate shingles) and
    seeded random texts — one Spark job for the whole batch."""
    import random
    import re

    from mapreduce_llm_spark.operators.dedup import word_shingles

    def ref(text: str, k: int = 3) -> list[str]:
        norm = re.sub(r"\s+", " ", text.lower().strip())
        words = [w for w in norm.split(" ") if w]
        if len(words) < k:
            return [" ".join(words)]
        return list(
            dict.fromkeys(
                " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
            )
        )

    rng = random.Random(11)
    vocab = ["spark", "Data", "ROW", "x1", "agg", "join"]
    texts = ["", " ", "one", "one two", "a  b\tc", "a a a a a a"] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: list(r["sh"])
        for r in df.select(
            "id", word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (i, t, got[i], ref(t))


def test_blocked_all_pairs_matches_collect_baseline(spark):
    """cosine_self_pairs_blocked (distributed, no driver collect) must
    emit exactly the pairs of the collect-and-broadcast baseline — the
    blocking is a partitioning of the pair space, not an approximation."""
    from mapreduce_llm_spark.io import load_table
    from mapreduce_llm_spark.operators.similarity import (
        cosine_self_pairs_blocked,
        cosine_self_pairs_np,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    blocked = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in cosine_self_pairs_blocked(e, threshold=0.4, n_blocks=5).collect()
    }
    baseline = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in cosine_self_pairs_np(e, threshold=0.4).collect()
    }
    assert blocked == baseline
    assert len(blocked) > 0


def test_blocked_all_pairs_is_lazy_no_driver_jobs(spark):
    """Building the q_dedup_embed plan must run ZERO Spark jobs — the
    old implementation collect()ed the corpus at plan-build time (a
    driver OOM at scale); the blocked one is a pure lazy plan."""
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    df = registry.QUERIES["q_dedup_embed"](spark, SF_DIR)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    # one metadata job is the parquet file listing from load_table; a
    # driver-side collect would add at least two more (count + collect)
    assert len(after) - len(before) <= 1, "plan construction triggered Spark jobs"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the block-pair scorer


def test_sim_recall_query_invariants(spark):
    """q_sim_recall's one-row output must be internally consistent
    (recall = n_hits/k, 0 ≤ recall ≤ 1) and the multiprobe recall it
    reports must dominate the single-probe configuration — the same
    ordering test_lsh_multiprobe_recall_dominates_single_probe pins at
    the operator level, re-checked through the public query surface."""
    from mapreduce_llm_spark.operators.similarity import ann_topk_lsh
    from mapreduce_llm_spark.io import load_table

    row = registry.QUERIES["q_sim_recall"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r["k"] == 10 and 0 <= r["n_hits"] <= r["k"]
    assert abs(r["recall"] - round(r["n_hits"] / r["k"], 4)) < 1e-9

    e = load_table(spark, SF_DIR, "embeddings")
    qvec = list(
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    exact_ids = {
        x["vec_id"] for x in cosine_topk(e, qvec, k=10).collect()
    }
    single = {
        x["vec_id"]
        for x in ann_topk_lsh(
            e, qvec, k=10, n_planes=4, seed=42, n_probe_bits=0
        ).collect()
    }
    assert r["n_hits"] >= len(exact_ids & single)
