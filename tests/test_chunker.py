"""Chunker tests — the reference's own invariants
(reference internal/cli/mapreduce_test.go:357-451) as property tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_llm_spark.functions.tokens import count_tokens_str
from mapreduce_llm_spark.operators.chunker import chunk_documents, chunk_text

WORDS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=12
)
LINES = st.lists(WORDS, min_size=0, max_size=20).map(" ".join)
DOCS = st.lists(LINES, min_size=0, max_size=30).map("\n".join)


def words_of(s: str) -> list[str]:
    return s.split()


@given(DOCS, st.integers(min_value=3, max_value=200))
@settings(max_examples=200, deadline=None)
def test_recombination_preserves_words(doc, budget):
    """Rejoined chunks preserve the original word sequence
    (reference mapreduce_test.go:420-436)."""
    chunks = chunk_text(doc, budget)
    rejoined = [w for c in chunks for w in words_of(c)]
    assert rejoined == words_of(doc)


@given(DOCS, st.integers(min_value=3, max_value=200))
@settings(max_examples=200, deadline=None)
def test_chunks_within_budget_tolerance(doc, budget):
    """Every chunk ≤ 2× token budget (reference mapreduce_test.go:413-417)."""
    for c in chunk_text(doc, budget):
        assert count_tokens_str(c) <= 2 * budget


@given(DOCS)
@settings(max_examples=100, deadline=None)
def test_lines_preserved_when_under_budget(doc):
    """Line boundaries survive when every line fits the budget."""
    budget = 10_000
    chunks = chunk_text(doc, budget)
    if doc:
        assert "\n".join(chunks) == doc


def test_empty_input():
    """Empty file → no chunks (reference mapreduce_test.go:441-451)."""
    assert chunk_text("", 100) == []


def test_multi_chunk_split():
    """'word ' ×1000 at budget 100 → 10-25 chunks
    (reference mapreduce_test.go:381-385)."""
    doc = " ".join(["word"] * 1000)
    chunks = chunk_text(doc, 100)
    assert 5 <= len(chunks) <= 25
    assert [w for c in chunks for w in c.split()] == ["word"] * 1000


def test_overlong_line_word_fallback():
    """A single line over budget falls back to word packing
    (reference mapreduce.go:228-254, test :387-392)."""
    doc = " ".join(["word"] * 50)  # one line, ~50 tokens
    chunks = chunk_text(doc, 3)
    assert len(chunks) > 1
    assert [w for c in chunks for w in c.split()] == ["word"] * 50


def test_chunk_documents_distributed(spark):
    """The DataFrame operator assigns consecutive per-doc chunk ids."""
    docs = spark.createDataFrame(
        [(1, "\n".join(["alpha beta"] * 30)), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=10).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_id"])
    assert sorted(by_doc[1]) == list(range(len(by_doc[1]))) and len(by_doc[1]) > 1
    assert by_doc[2] == [0]
    assert 3 not in by_doc  # empty doc yields no chunks
