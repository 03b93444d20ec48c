"""Round-14 flip rehearsal — prove the round-15 registration is a pure
formality before it happens (the round-8..13 playbook: each prior
rehearsal pinned its flip one window ahead and the flip landed exactly
as simulated).

Round 15's plan: flip the 50 ``STAGED_R14`` (fn, oracle) pairs into
``@query(oracle=...)`` declarations and install the pre-drafted
``ROUND14_WINDOW`` as DRIVER_PRIORITY (FUTURE_ORACLES is empty — no
graduations remain, so the whole window is new surface). These tests
simulate that end state WITHOUT touching the live registry: if they
pass, the flip cannot create a name collision, an over/underfull
window, or a reopened external-verification backlog. The same
derivation as tools/gen_inventory.verification_backlog is replayed
against the post-flip registry plus ONE simulated driver record —
CORRECTNESS_r14 (the current DRIVER_PRIORITY, the flipped
ROUND13_WINDOW, goes green at round-14 end; the round-13 flip has
executed) — and must show the round-15 backlog to be exactly the 50
flipped names and nothing else.
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
from mapreduce_llm_spark.queries.analytics_r15_staged import STAGED_R15
from mapreduce_llm_spark.queries.future_oracles import FUTURE_ORACLES

registry.load_all()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def test_flip_fills_the_round14_window_exactly():
    assert len(STAGED_R14) == WINDOW


def test_predrafted_window_is_exactly_the_flip_set():
    assert len(ROUND14_WINDOW) == WINDOW
    assert len(set(ROUND14_WINDOW)) == WINDOW, "duplicate window entry"
    assert set(ROUND14_WINDOW) == set(STAGED_R14)
    # definition order is the window order — the tranche narrative in
    # the module is the verification order the driver will walk
    assert ROUND14_WINDOW == list(STAGED_R14)


def test_staged_names_do_not_collide():
    for name in STAGED_R14:
        assert name not in registry.QUERIES, f"{name} already registered"
        assert name not in STAGED_R15, (
            f"{name} staged in both r14 and r15 — the r15 flip would "
            "collide with the r16 one"
        )
        fn, sql = STAGED_R14[name]
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
    # simulate the one driver record between now and the r15 flip:
    # round 14 verifies the live DRIVER_PRIORITY (the flipped
    # round-13 window)
    records = _records_before(15)
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    for name in list(registry.QUERIES)[:WINDOW]:
        records.setdefault(name, []).append(dict(green))

    post_oracle = dict(registry.ORACLE)
    post_oracle.update(FUTURE_ORACLES)
    post_oracle.update({n: sql for n, (_fn, sql) in STAGED_R14.items()})
    post_queries = list(registry.QUERIES) + list(STAGED_R14)

    def verified(name: str) -> bool:
        recs = records.get(name, [])
        if name in post_oracle:
            return any(r.get("hash_match") is True for r in recs)
        return bool(recs)

    unverified = {n for n in post_queries if not verified(n)}
    assert unverified == set(STAGED_R14), (
        "the round-14 flip would reopen the external book beyond its "
        f"own window: extra={sorted(unverified - set(STAGED_R14))} "
        f"missing={sorted(set(STAGED_R14) - unverified)}"
    )
