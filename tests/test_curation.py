"""Invariants of the composed curation pipeline (operators/curation.py)
— the stages are individually tested; these pin the composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.curation import curate_corpus
from mapreduce_llm_spark.operators.dedup import normalize_text
from tests.conftest import SF_DIR


def test_curation_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = curate_corpus(docs, min_quality=0.3, min_words=5, max_tokens_per_chunk=256)
    out.cache()
    try:
        rows = out.count()
        assert rows > 0

        # every surviving chunk respects the reference's own tolerance
        # (≤ 2× budget, reference mapreduce_test.go:413-417)
        assert out.filter(F.col("n_tokens") > 2 * 256).count() == 0

        # quality floor holds
        assert out.filter(F.col("quality") < 0.3).count() == 0

        # dedup: no two surviving documents share normalized content
        survivors = (
            out.select("doc_id").distinct().join(docs, "doc_id")
            .select(normalize_text(F.col("text")).alias("norm"))
        )
        assert survivors.count() == survivors.distinct().count()

        # chunk ids are consecutive from 0 per document
        per_doc = out.groupBy("doc_id").agg(
            F.min("chunk_id").alias("lo"),
            F.max("chunk_id").alias("hi"),
            F.count("*").alias("n"),
        )
        bad = per_doc.filter(
            (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
        ).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_curation_drops_known_duplicates(spark):
    """The sf corpus contains injected exact duplicates (doc_id >=
    1_000_000 mirrors a base doc); curation must keep one copy."""
    docs = load_table(spark, SF_DIR, "documents")
    base = docs.select(normalize_text(F.col("text")).alias("norm"))
    n_distinct = base.distinct().count()
    out = curate_corpus(docs, min_quality=0.0, min_words=0, max_tokens_per_chunk=256)
    assert out.select("doc_id").distinct().count() == n_distinct


def test_curation_custom_id_col(spark):
    """id_col plumbing: the chunker keeps the caller's id column name
    and carry columns, so non-default ids work end-to-end."""
    docs = load_table(spark, SF_DIR, "documents").withColumnRenamed("doc_id", "page_id")
    out = curate_corpus(
        docs, id_col="page_id", min_quality=0.0, min_words=0, max_tokens_per_chunk=256
    )
    assert {"page_id", "chunk_id", "chunk_text", "n_tokens", "quality", "lang"} <= set(
        out.columns
    )
    assert out.count() > 0
