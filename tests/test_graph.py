"""Connected-components correctness on arbitrary random graphs —
the oracle query (q_graph_components) proves the session graph; this
proves general topologies (chains, stars, cycles, forests) against an
in-test union-find."""

from __future__ import annotations

import random

import pytest

from mapreduce_llm_spark.operators.graph import connected_components


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of each set
    comp = {}
    for n in nodes:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_cc_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n_nodes, n_edges = 120, 90  # sparse → many nontrivial components
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(range(n_nodes), edges)

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, checkpoint_every=5).collect()
    }
    # operator omits isolated nodes by contract; compare on edge-touched nodes
    touched = {a for a, _ in edges} | {b for _, b in edges}
    assert got == {n: expected[n] for n in touched}


def test_cc_long_chain_converges_fast(spark):
    """A 64-node path needs ~log2(64) pointer-jump rounds, far under
    max_iter — the O(log diameter) claim, observed."""
    edges = [(i, i + 1) for i in range(63)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(edf, max_iter=12).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 64
