"""Data-validation operators (operators/validate.py): exact diff
semantics, fingerprint discrimination, checksum layout-invariance and
sensitivity, and the declared queries' accounting identities."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.validate import (
    group_checksum,
    row_fingerprint,
    table_diff,
)
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def test_table_diff_statuses_exact(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, v string"
    )
    right = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d"), (5, "e")], "k int, v string"
    )
    got = {
        r["k"]: r["status"]
        for r in table_diff(left, right, ["k"], ["v"]).collect()
    }
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }


def test_fingerprint_discriminates_null_and_boundaries(spark):
    df = spark.createDataFrame(
        [
            ("null", "x"),  # literal string 'null'
            (None, "x"),  # real NULL
            ("ab", "c"),  # boundary split one way…
            ("a", "bc"),  # …and the other
        ],
        "a string, b string",
    ).select(row_fingerprint(["a", "b"]).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert len(set(fps)) == 4, fps


def test_group_checksum_is_layout_invariant_and_sensitive(spark):
    d = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = {
        r["lang"]: (r["checksum"], r["n_rows"])
        for r in group_checksum(d, ["lang"], ["doc_id", "n_chars"]).collect()
    }
    reshuffled = {
        r["lang"]: (r["checksum"], r["n_rows"])
        for r in group_checksum(
            d.repartition(13).sortWithinPartitions(F.col("n_chars").desc()),
            ["lang"],
            ["doc_id", "n_chars"],
        ).collect()
    }
    assert base == reshuffled
    # flip one cell -> that group's checksum moves, count doesn't
    first_id, first_lang = (
        d.orderBy("doc_id").select("doc_id", "lang").first()
    )
    tweaked = d.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == first_id, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    after = {
        r["lang"]: (r["checksum"], r["n_rows"])
        for r in group_checksum(tweaked, ["lang"], ["doc_id", "n_chars"]).collect()
    }
    assert after[first_lang][0] != base[first_lang][0]
    assert after[first_lang][1] == base[first_lang][1]
    for lang in base:
        if lang != first_lang:
            assert after[lang] == base[lang]


def test_q_table_diff_accounts_for_every_key(spark):
    rows = {r["status"]: r for r in QUERIES["q_table_diff"](spark, SMOKE_SF_DIR).collect()}
    d = load_table(spark, SMOKE_SF_DIR, "documents")
    n = d.count()
    n_removed = d.where(F.col("doc_id") % 17 == 0).count()
    n_added = d.where(F.col("doc_id") % 29 == 0).count()
    n_changed = d.where(
        (F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 13 == 0)
    ).count()
    assert rows["removed"]["n_keys"] == n_removed
    assert rows["added"]["n_keys"] == n_added
    assert rows["changed"]["n_keys"] == n_changed
    assert rows["unchanged"]["n_keys"] == n - n_removed - n_changed
    total_keys = sum(r["n_keys"] for r in rows.values())
    assert total_keys == n + n_added


def test_q_group_checksum_stable_flag_true(spark):
    for r in QUERIES["q_group_checksum"](spark, SMOKE_SF_DIR).collect():
        assert r["stable_under_repartition"] is True
        assert r["n_rows"] > 0
