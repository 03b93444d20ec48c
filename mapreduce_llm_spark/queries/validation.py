"""Data-validation surface: table reconciliation and layout-invariant
checksums (operators/validate.py) as declared queries.

Both are deterministic md5 integer arithmetic, so the DuckDB oracle
twins (identical null-tagged concat + substr(md5) conversion,
GRADUATED_ORACLES) verify them externally since round 6; the
semantics are also pinned exactly in tests/test_validate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.validate import group_checksum, table_diff
from mapreduce_llm_spark.registry import query
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES


@query("q_table_diff", oracle=GRADUATED_ORACLES["q_table_diff"])
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed reconciliation of two table versions — the pre-cutover
    check of every migration/backfill: v2 is derived from documents by
    deterministic arithmetic (doc_id ≡ 0 mod 17 removed, ≡ 0 mod 13
    changed via n_chars+1, ≡ 0 mod 29 re-keyed +10M as additions), and
    the diff must account for every key as added / removed / changed /
    unchanged. Both sides collapse to (key, 40-bit fingerprint) before
    the full-outer join, so the shuffle moves ~16 B/row no matter how
    wide the rows are; output is the 4-row status profile plus a
    checksum of member keys (sum of key mod 2^40 — order-independent)
    so the hash would pin WHICH keys, not just how many."""
    v1 = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = v1.where(F.col("doc_id") % 17 != 0)
    changed = base.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 13 == 0, F.col("n_chars") + 1
        ).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    added = v1.where(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "lang", "n_chars"
    )
    v2 = changed.unionByName(added)
    return (
        table_diff(v1, v2, ["doc_id"], ["lang", "n_chars"])
        .groupBy("status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(F.pmod(F.col("doc_id"), F.lit(1 << 40))).alias("key_checksum"),
        )
        .orderBy("status")
    )


@query("q_group_checksum", oracle=GRADUATED_ORACLES["q_group_checksum"])
def q_group_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-language content checksum of the document
    corpus, computed twice — once over the table as scanned, once over
    a 7-way repartitioned copy — with the equality emitted per group:
    the layout-invariance that lets two differently-partitioned (or
    differently-engined) copies of 100 TB be compared without sorting
    either. Sum-of-fingerprints is map-side combinable; 40-bit terms
    keep the signed-64 sum exact under ANSI arithmetic."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    cs = group_checksum(d, ["lang"], ["doc_id", "source", "n_chars"])
    cs_shuffled = group_checksum(
        d.repartition(7, "doc_id"), ["lang"], ["doc_id", "source", "n_chars"]
    ).select(
        F.col("lang").alias("lang2"),
        F.col("checksum").alias("checksum2"),
    )
    return (
        cs.join(cs_shuffled, cs["lang"] == cs_shuffled["lang2"])
        .select(
            "lang",
            "checksum",
            "n_rows",
            (F.col("checksum") == F.col("checksum2")).alias(
                "stable_under_repartition"
            ),
        )
        .orderBy("lang")
    )
