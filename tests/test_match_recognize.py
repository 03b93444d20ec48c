"""Property tests for operators/match_recognize.py: the Catalyst
bracket-encoding position walk must agree with a pure-Python
re.finditer reference on seeded random symbol sequences, including
multi-match keys, zero-match keys, and greedy AFTER-MATCH-SKIP
semantics; plus the documented guard rejections."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from mapreduce_llm_spark.operators.match_recognize import match_recognize


def _reference(sym_string: str, pattern: str) -> list[tuple[int, int]]:
    """(start_pos 1-based, match_len) via Java-equivalent replace-all
    semantics: left-to-right, non-overlapping, greedy."""
    return [
        (m.start() + 1, m.end() - m.start())
        for m in re.finditer(pattern, sym_string)
    ]


def _reference_overlap(sym_string: str, pattern: str) -> list[tuple[int, int]]:
    """(start_pos 1-based, match_len) under SKIP TO NEXT ROW: the
    anchored greedy match retried from EVERY position."""
    out = []
    for i in range(len(sym_string)):
        m = re.match(pattern, sym_string[i:])
        if m and m.end() > 0:
            out.append((i + 1, m.end()))
    return out


def _run(spark, rows, pattern, symbols=None, after_match="skip_past_last_row"):
    """rows: list of (key, seq, event_type, value)."""
    df = spark.createDataFrame(
        rows, schema="key string, seq int, event_type string, value double"
    )
    out = match_recognize(
        df,
        partition_by=["key"],
        order_by=["seq"],
        symbols=symbols
        or [
            ("v", F.col("event_type") == "view"),
            ("c", F.col("event_type") == "click"),
            ("p", F.col("event_type") == "purchase"),
        ],
        pattern=pattern,
        after_match=after_match,
    )
    return out


def test_matches_reference_on_seeded_random_sequences(spark):
    rng = random.Random(42)
    kinds = ["view", "click", "purchase", "scroll"]
    rows = []
    expected = {}
    for k in range(40):
        key = f"u{k:02d}"
        seq_kinds = [rng.choice(kinds) for _ in range(rng.randint(0, 30))]
        rows.extend(
            (key, i, kind, float(i)) for i, kind in enumerate(seq_kinds)
        )
        s = "".join(
            {"view": "v", "click": "c", "purchase": "p", "scroll": "x"}[kk]
            for kk in seq_kinds
        )
        expected[key] = _reference(s, "vc+p")
    got = {
        key: [] for key in expected
    }
    out = _run(spark, rows, "vc+p").collect()
    for r in out:
        got.setdefault(r.key, []).append((r.match_no, r.start_pos, r.match_len))
    for key, matches in expected.items():
        want = [(i + 1, s, l) for i, (s, l) in enumerate(matches)]
        assert got.get(key, []) == want, key


def test_overlap_mode_matches_anchored_reference(spark):
    """SKIP TO NEXT ROW must equal the anchored greedy re.match probe
    at every position — including overlapping matches the default
    mode cannot emit (e.g. 'vvcp' yields a match at 1? no — at 2;
    'vcvcp' yields matches at both 1 and 3 only in overlap mode when
    the pattern spans them)."""
    rng = random.Random(7)
    kinds = ["view", "click", "purchase", "scroll"]
    rows = []
    expected = {}
    for k in range(40):
        key = f"u{k:02d}"
        seq_kinds = [rng.choice(kinds) for _ in range(rng.randint(0, 25))]
        rows.extend((key, i, kind, float(i)) for i, kind in enumerate(seq_kinds))
        s = "".join(
            {"view": "v", "click": "c", "purchase": "p", "scroll": "x"}[kk]
            for kk in seq_kinds
        )
        expected[key] = _reference_overlap(s, "vc+p|v[cx]+p")
    out = _run(spark, rows, "vc+p|v[cx]+p", after_match="skip_to_next_row").collect()
    got = {key: [] for key in expected}
    for r in out:
        got.setdefault(r.key, []).append((r.match_no, r.start_pos, r.match_len))
    for key, matches in expected.items():
        want = [(i + 1, s, l) for i, (s, l) in enumerate(matches)]
        assert got.get(key, []) == want, key


def test_overlap_mode_match_rows_overlap(spark):
    """Two overlapping matches share rows: 'v c p' where the click
    also begins... use pattern 'vc+p' on 'vcvcp': default mode finds
    only [1..5]? no — greedy at 1 is 'vc' then needs p… actual:
    anchored at 1 'vc' fails (needs p after c+, c+ eats 'c', next is
    'v' not p) — so both modes differ on richer strings; here we pin
    the overlap-specific case 'vccp' with pattern 'c+p' ∪ 'vc+p':
    matches at 1 (vccp) AND 2 (ccp) AND 3 (cp)."""
    rows = [
        ("u1", 0, "view", 1.0),
        ("u1", 1, "click", 2.0),
        ("u1", 2, "click", 3.0),
        ("u1", 3, "purchase", 4.0),
    ]
    out = _run(spark, rows, "(?:v?c+p)", after_match="skip_to_next_row").collect()
    got = sorted((r.start_pos, r.match_len) for r in out)
    assert got == [(1, 4), (2, 3), (3, 2)]
    # the shared purchase row appears in every match's slice
    for r in out:
        assert r.match_rows[-1]["event_type"] == "purchase"


def test_bad_after_match_mode_rejected(spark):
    with pytest.raises(ValueError, match="after_match"):
        _run(spark, [("u1", 0, "view", 1.0)], "v", after_match="skip_to_mars")


def test_match_rows_carry_the_matched_slice_in_order(spark):
    rows = [
        ("u1", 0, "view", 1.0),
        ("u1", 1, "click", 2.0),
        ("u1", 2, "click", 3.0),
        ("u1", 3, "purchase", 4.0),
        ("u1", 4, "view", 5.0),   # second match begins
        ("u1", 5, "click", 6.0),
        ("u1", 6, "purchase", 7.0),
        ("u1", 7, "click", 8.0),  # trailing non-match
    ]
    out = _run(spark, rows, "vc+p").orderBy("match_no").collect()
    assert [(r.match_no, r.start_pos, r.match_len) for r in out] == [
        (1, 1, 4),
        (2, 5, 3),
    ]
    assert [row["value"] for row in out[0].match_rows] == [1.0, 2.0, 3.0, 4.0]
    assert [row["seq"] for row in out[1].match_rows] == [4, 5, 6]


def test_greedy_skip_past_last_row_no_overlap(spark):
    # vcvcp: greedy 'v.*p' would swallow everything in one match;
    # overlapping re-scan would also find the inner vcp — replace-all
    # must yield exactly the single greedy non-overlapping match.
    rows = [
        ("u1", 0, "view", 0.0),
        ("u1", 1, "click", 0.0),
        ("u1", 2, "view", 0.0),
        ("u1", 3, "click", 0.0),
        ("u1", 4, "purchase", 0.0),
    ]
    out = _run(spark, rows, "v.*p").collect()
    assert [(r.start_pos, r.match_len) for r in out] == [(1, 5)]


def test_zero_match_keys_emit_nothing(spark):
    rows = [("u1", 0, "click", 0.0), ("u2", 0, "scroll", 0.0)]
    assert _run(spark, rows, "vc+p").count() == 0


def test_guards_reject_bad_symbols_and_empty_pattern(spark):
    df = spark.createDataFrame(
        [("u1", 0, "view", 0.0)],
        schema="key string, seq int, event_type string, value double",
    )
    with pytest.raises(ValueError, match="single non-reserved char"):
        match_recognize(
            df, ["key"], ["seq"], [("vv", F.lit(True))], "v"
        )
    with pytest.raises(ValueError, match="reserved"):
        match_recognize(
            df, ["key"], ["seq"], [("v", F.lit(True))], "v<"
        )
    with pytest.raises(ValueError, match="empty string"):
        match_recognize(
            df, ["key"], ["seq"], [("v", F.lit(True))], "v*"
        )


def test_single_shuffle_plan(spark):
    """Scale pin: the whole operator is one hashpartitioning exchange
    on the partition key (classify/encode map-side, the match and
    position walk post-aggregation) and never crosses into Python."""
    df = spark.createDataFrame(
        [("u1", 0, "view", 0.0)],
        schema="key string, seq int, event_type string, value double",
    )
    out = match_recognize(
        df,
        ["key"],
        ["seq"],
        [("v", F.col("event_type") == "view")],
        "v",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
