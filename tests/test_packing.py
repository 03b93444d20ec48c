"""Sequence-packing invariants (operators/packing.py) — the properties
that make packed output safe to train on: exactly-once docs, budget
respected except for single overlong docs, consecutive positions,
and partitioning-independent determinism."""

from __future__ import annotations

import pandas as pd

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.packing import pack_sequences
from tests.conftest import SMOKE_SF_DIR

BUDGET = 256


def _packed(spark):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    return pack_sequences(docs, budget=BUDGET).toPandas(), docs.count()


def test_every_doc_packed_exactly_once(spark):
    pdf, n_docs = _packed(spark)
    assert len(pdf) == n_docs
    assert pdf["doc_id"].nunique() == n_docs


def test_budget_respected_unless_singleton(spark):
    pdf, _ = _packed(spark)
    per_seq = pdf.groupby("seq_id").agg(
        n=("doc_id", "size"), tokens=("n_tokens", "sum")
    )
    over = per_seq[per_seq["tokens"] > BUDGET]
    assert (over["n"] == 1).all(), "multi-doc sequence over budget"


def test_seq_pos_consecutive_from_zero(spark):
    pdf, _ = _packed(spark)
    for _, grp in pdf.groupby("seq_id"):
        pos = sorted(grp["seq_pos"])
        assert pos == list(range(len(pos)))


def test_packing_deterministic_across_input_partitioning(spark):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    a = pack_sequences(docs, budget=BUDGET).toPandas()
    b = pack_sequences(docs.repartition(7), budget=BUDGET).toPandas()
    key = ["doc_id", "seq_id", "seq_pos", "n_tokens"]
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True)[key],
        b.sort_values("doc_id").reset_index(drop=True)[key],
    )


def test_overlong_doc_gets_own_sequence(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 5), (2, "x " * 4000), (3, "y " * 5)],
        "doc_id long, text string",
    )
    pdf = pack_sequences(docs, budget=64).toPandas()
    big_seq = pdf.loc[pdf["doc_id"] == 2, "seq_id"].iloc[0]
    assert (pdf["seq_id"] == big_seq).sum() == 1  # nothing packed with it
