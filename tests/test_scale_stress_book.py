"""The scale-stress book must be written incrementally and atomically
(VERDICT r13 item 5): the round-13 assortativity crash aborted a
multi-query sweep mid-batch and lost every completed row, needing a
manual re-measure commit (aec0d81). These tests pin merge_rows — the
per-query write path — without running any Spark."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.scale_stress import merge_rows, row_key  # noqa: E402


def _read(path):
    with open(path) as fh:
        return json.load(fh)


def test_each_write_preserves_prior_rows(tmp_path):
    book = str(tmp_path / "book.json")
    # query 1 lands, then the "crash" happens before query 2 — the
    # book must already hold query 1
    merge_rows([{"query": "q_a", "sf01_s": 1.0, "sf1_s": 9.0,
                 "exponent": 0.954}], book)
    assert [r["query"] for r in _read(book)["rows"]] == ["q_a"]
    merge_rows([{"query": "q_b", "decade": "1-10", "small_s": 2.0,
                 "big_s": 18.0, "exponent": 0.954}], book)
    rows = _read(book)["rows"]
    assert [r["query"] for r in rows] == ["q_a", "q_b"]


def test_remeasure_replaces_by_key_without_duplicating(tmp_path):
    book = str(tmp_path / "book.json")
    merge_rows([{"query": "q_a", "sf01_s": 1.0, "sf1_s": 9.0,
                 "exponent": 0.954}], book)
    merge_rows([{"query": "q_a", "sf01_s": 1.1, "sf1_s": 8.0,
                 "exponent": 0.862}], book)
    rows = _read(book)["rows"]
    assert len(rows) == 1 and rows[0]["exponent"] == 0.862
    # a different decade/fixture for the same query is a NEW row, not a
    # replacement — the book keeps confounded and corrected exponents
    merge_rows([{"query": "q_a", "decade": "1-10", "small_s": 9.0,
                 "big_s": 80.0, "exponent": 0.949}], book)
    merge_rows([{"query": "q_a", "decade": "1-10",
                 "fixture": "density-preserving", "small_s": 9.0,
                 "big_s": 40.0, "exponent": 0.648}], book)
    rows = _read(book)["rows"]
    assert len(rows) == 3
    assert len({row_key(r) for r in rows}) == 3


def test_write_is_atomic_no_tmp_left_behind(tmp_path):
    book = str(tmp_path / "book.json")
    merge_rows([{"query": "q_a", "sf01_s": 1.0, "sf1_s": 9.0,
                 "exponent": 0.954}], book)
    # tmp+rename: the scratch file must not survive a successful write,
    # and the book itself must be complete valid JSON
    assert not os.path.exists(book + ".tmp")
    assert _read(book)["rows"]


def test_book_matches_live_schema():
    """The real committed book parses with the same merge key the tool
    uses — a schema drift in merge_rows would corrupt the next sweep's
    merge instead of extending it."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALE_STRESS.json")
    rows = _read(path)["rows"]
    assert rows, "committed book is empty"
    keys = [row_key(r) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (query, decade, fixture)"
