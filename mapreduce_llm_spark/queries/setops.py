"""Set-operation queries (SURVEY.md §2C "Set operations").

UNION/INTERSECT/EXCEPT with DuckDB-matching distinct semantics
(intersect/except are distinct in both engines; exceptAll/intersectAll
deliberately avoided for oracle-checked queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_union_all",
    oracle="""
    SELECT key_id, name, kind FROM (
        SELECT c_custkey AS key_id, c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS key_id, s_name AS name, 'supplier' AS kind FROM supplier
    )
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — no shuffle at all (narrow)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
    )
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — hash-agg dedup after the narrow union."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, matching DuckDB)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics — Spark's subtract/exceptAll would
    keep duplicates, so plain except via DataFrame.exceptAll is wrong
    here; DataFrame.subtract IS distinct, matching DuckDB)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@query(
    "q_setop_all",
    oracle="""
    SELECT nk, count(*) AS n FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
        INTERSECT ALL
        SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
    ) GROUP BY nk
    ORDER BY nk
    """,
)
def q_setop_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — each duplicate pairs off once,
    min(multiplicity) per side, unlike the distinct INTERSECT of
    q_intersect). Spark's intersectAll implements it as a count-keyed
    join, so the shuffle carries (value, count) pairs, not row copies —
    the multiplicity compression is what survives scale. Counted per
    key in the output so the bag multiplicities are what's hashed."""
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("nk"))
    bldg = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nk")
    )
    return (
        rich.intersectAll(bldg)
        .groupBy("nk")
        .agg(F.count("*").alias("n"))
        .orderBy("nk")
    )
