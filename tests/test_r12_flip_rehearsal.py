"""Round-12 flip rehearsal — prove the round-13 registration is a pure
formality before it happens (the round-8..11 playbook: each prior
rehearsal pinned its flip one window ahead and the flip landed exactly
as simulated).

Round 13's plan: flip the 50 ``STAGED_R12`` (fn, oracle) pairs into
``@query(oracle=...)`` declarations and install the pre-drafted
``ROUND12_WINDOW`` as DRIVER_PRIORITY (FUTURE_ORACLES is empty — no
graduations remain, so the whole window is new surface). These tests
simulate that end state WITHOUT touching the live registry: if they
pass, the flip cannot create a name collision, an over/underfull
window, or a reopened external-verification backlog. The same
derivation as tools/gen_inventory.verification_backlog is replayed
against the post-flip registry plus a simulated CORRECTNESS_r12 (every
current window entry green at declared strength — what the driver
records if round 12 lands as designed, the round-11 flip having
executed), and must show the round-13 backlog to be exactly the 50
flipped names and nothing else.
"""

from __future__ import annotations

import json
import os
import re

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r12_staged import (
    ROUND12_WINDOW,
    STAGED_R12,
)
from mapreduce_llm_spark.queries.future_oracles import FUTURE_ORACLES

registry.load_all()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def test_flip_fills_the_round12_window_exactly():
    assert len(STAGED_R12) + len(FUTURE_ORACLES) == WINDOW


def test_predrafted_window_is_exactly_the_flip_set():
    assert len(ROUND12_WINDOW) == WINDOW
    assert len(set(ROUND12_WINDOW)) == WINDOW, "duplicate window entry"
    assert set(ROUND12_WINDOW) == set(STAGED_R12) | set(FUTURE_ORACLES)
    # definition order is the window order — the tranche narrative in
    # the module is the verification order the driver will walk
    assert ROUND12_WINDOW == list(STAGED_R12)


def test_staged_names_do_not_collide():
    for name in STAGED_R12:
        assert name not in registry.QUERIES, f"{name} already registered"
        fn, sql = STAGED_R12[name]
        assert callable(fn) and sql.strip(), name
    for name, sql in FUTURE_ORACLES.items():
        assert name in registry.QUERIES, f"{name} is not a registered query"
        assert name not in registry.ORACLE, (
            f"{name} already has a live oracle — FUTURE_ORACLES must only "
            "stage flips for rows-only entries"
        )
        assert sql.strip()


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
    # the driver record round 12 produces if the round lands as
    # designed: every current-window entry green at declared strength
    # (the round-11 flip executed, so the live window IS ROUND11_WINDOW)
    records = _records_before(12)
    for name in list(registry.QUERIES)[:WINDOW]:
        records.setdefault(name, []).append(
            {"rows_match": True, "schema_match": True, "hash_match": True}
        )

    post_oracle = dict(registry.ORACLE)
    post_oracle.update(FUTURE_ORACLES)
    post_oracle.update({n: sql for n, (_fn, sql) in STAGED_R12.items()})
    post_queries = list(registry.QUERIES) + list(STAGED_R12)

    def verified(name: str) -> bool:
        recs = records.get(name, [])
        if name in post_oracle:
            return any(r.get("hash_match") is True for r in recs)
        return bool(recs)

    unverified = {n for n in post_queries if not verified(n)}
    assert unverified == set(STAGED_R12) | set(FUTURE_ORACLES), (
        "the round-12 flip would reopen the external book beyond its own "
        f"window: extra={sorted(unverified - set(STAGED_R12) - set(FUTURE_ORACLES))} "
        f"missing={sorted((set(STAGED_R12) | set(FUTURE_ORACLES)) - unverified)}"
    )
