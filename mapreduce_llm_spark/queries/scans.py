"""Scan / projection / filter queries (SURVEY.md §2C "Scans" and
"Projections / filters / predicates").

Generalizes the reference's only source — a whole-file text read
(reference internal/cli/mapreduce.go:33-38) — to columnar parquet scans
with Catalyst pushdown. Every query here is written so the filter and
the column list reach the parquet reader (verified via
.explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare projection — column pruning: ReadSchema carries exactly the
    three columns; at 100 TB this is the difference between reading
    ~20% of the table bytes and all of them."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey", "l_quantity")


@query(
    "q_text_lines",
    oracle="""
    SELECT
        source,
        count(*)                  AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS total_chars,
        min(length(text))         AS min_chars,
        max(length(text))         AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/doc-oriented scan stats — the typed analogue of the
    reference's byte/line accounting on its text input
    (reference internal/cli/estimation.go:24-26)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min(F.length("text")).alias("min_chars"),
            F.max(F.length("text")).alias("max_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate, l_returnflag
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20)
      AND l_discount >= 0.04
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND (l_linenumber = 1 OR l_linenumber = 3)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, BETWEEN, IN — all simple
    comparisons so every conjunct lands in PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") >= 0.04)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & ((F.col("l_linenumber") == 1) | (F.col("l_linenumber") == 3))
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate", "l_returnflag"
    )


@query(
    "q_filter_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%ol%'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_brand IS NOT NULL
    """,
)
def q_filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / IS NOT NULL predicates (StringContains and
    StartsWith push down to the parquet reader)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%ol%")
        & ~F.col("p_type").like("STANDARD%")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "q_proj_expr",
    oracle="""
    SELECT
        o_orderkey,
        CAST(floor(o_totalprice) AS BIGINT)                     AS price_int,
        round(o_totalprice * 1.1, 4)                            AS price_taxed,
        CASE
            WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small'
        END                                                     AS size_class,
        upper(o_orderstatus)                                    AS status_uc,
        o_custkey % 7                                           AS cust_bucket
    FROM orders
    """,
)
def q_proj_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: CASE WHEN, cast, arithmetic, modulo — all
    whole-stage-codegen expressions, no Python in the hot path."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").alias("price_int"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("price_taxed"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.upper("o_orderstatus").alias("status_uc"),
        (F.col("o_custkey") % 7).alias("cust_bucket"),
    )
