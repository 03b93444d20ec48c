"""Round-15 flip rehearsal — prove the round-16 registration is a pure
formality before it happens (the round-8..14 playbook: each prior
rehearsal pinned its flip one window ahead and the flip landed exactly
as simulated).

Round 16's plan: flip the 50 ``STAGED_R15`` (fn, oracle) pairs into
``@query(oracle=...)`` declarations and install the pre-drafted
``ROUND15_WINDOW`` as DRIVER_PRIORITY (FUTURE_ORACLES is empty — no
graduations remain, so the whole window is new surface). These tests
simulate that end state WITHOUT touching the live registry: if they
pass, the flip cannot create a name collision, an over/underfull
window, or a reopened external-verification backlog. The same
derivation as tools/gen_inventory.verification_backlog is replayed
against the post-flip registry plus TWO simulated driver records —
CORRECTNESS_r14 (the live DRIVER_PRIORITY, the flipped ROUND13_WINDOW,
goes green at round-14 end) and CORRECTNESS_r15 (round 15 flips
STAGED_R14 and verifies ROUND14_WINDOW) — and must show the round-16
backlog to be exactly the 50 STAGED_R15 names and nothing else.
"""

from __future__ import annotations

import json
import os
import re

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r14_staged import (
    ROUND14_WINDOW,
    STAGED_R14,
)
from mapreduce_llm_spark.queries.analytics_r15_staged import (
    ROUND15_WINDOW,
    STAGED_R15,
)
from mapreduce_llm_spark.queries.future_oracles import FUTURE_ORACLES

registry.load_all()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def test_flip_fills_the_round15_window_exactly():
    assert len(STAGED_R15) == WINDOW


def test_predrafted_window_is_exactly_the_flip_set():
    assert len(ROUND15_WINDOW) == WINDOW
    assert len(set(ROUND15_WINDOW)) == WINDOW, "duplicate window entry"
    assert set(ROUND15_WINDOW) == set(STAGED_R15)
    # definition order is the window order — the tranche narrative in
    # the module is the verification order the driver will walk
    assert ROUND15_WINDOW == list(STAGED_R15)


def test_staged_names_do_not_collide():
    for name in STAGED_R15:
        assert name not in registry.QUERIES, f"{name} already registered"
        assert name not in STAGED_R14, (
            f"{name} staged in both r14 and r15 — the r15 flip would "
            "collide with the r16 one"
        )
        fn, sql = STAGED_R15[name]
        assert callable(fn) and sql.strip(), name


def _records_before(round_no: int) -> dict[str, list[dict]]:
    records: dict[str, list[dict]] = {}
    for fname in sorted(os.listdir(REPO_ROOT)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m or int(m.group(1)) >= round_no:
            continue
        with open(os.path.join(REPO_ROOT, fname)) as fh:
            for name, rec in json.load(fh).items():
                records.setdefault(name, []).append(rec)
    return records


def test_post_flip_backlog_is_exactly_the_flipped_window():
    # simulate the two driver records between now and the r16 flip:
    # round 14 verifies the live DRIVER_PRIORITY (the flipped round-13
    # window), round 15 flips STAGED_R14 and verifies ROUND14_WINDOW
    records = _records_before(16)
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    for name in list(registry.QUERIES)[:WINDOW]:
        records.setdefault(name, []).append(dict(green))
    for name in ROUND14_WINDOW:
        records.setdefault(name, []).append(dict(green))

    post_oracle = dict(registry.ORACLE)
    post_oracle.update(FUTURE_ORACLES)
    post_oracle.update({n: sql for n, (_fn, sql) in STAGED_R14.items()})
    post_oracle.update({n: sql for n, (_fn, sql) in STAGED_R15.items()})
    post_queries = (
        list(registry.QUERIES) + list(STAGED_R14) + list(STAGED_R15)
    )

    def verified(name: str) -> bool:
        recs = records.get(name, [])
        if name in post_oracle:
            return any(r.get("hash_match") is True for r in recs)
        return bool(recs)

    unverified = {n for n in post_queries if not verified(n)}
    assert unverified == set(STAGED_R15), (
        "the round-15 flip would reopen the external book beyond its "
        f"own window: extra={sorted(unverified - set(STAGED_R15))} "
        f"missing={sorted(set(STAGED_R15) - unverified)}"
    )
