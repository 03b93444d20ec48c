"""Sort / limit / top-k queries (SURVEY.md §2C "Sorts / limits / top-k").

Order is semantic in the reference (chunk-index-ordered reduce,
reference internal/cli/mapreduce.go:131-137); here it generalizes to
typed sorts. Spark executes orderBy+limit as TakeOrdered (per-partition
top-k then a k-sized driver merge) — no global sort materialization, so
top-k is cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 by price, ties broken by key for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("price"), "o_orderdate"
        )
        .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT
        c_custkey,
        c_mktsegment,
        c_nationkey,
        round(c_acctbal, 4) AS bal,
        row_number() OVER (
            ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
        ) AS sort_pos
    FROM customer
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort correctness made hash-checkable: the sort position
    is projected as a global row number so the (order-insensitive)
    value hash still proves the ordering.

    Computed with the distributed two-phase ranking
    (operators/ranking.py) — range partition + local rank + offset —
    NOT an unpartitioned window, which would move every row to one
    task; hash-matching the oracle's plain row_number() OVER proves the
    two forms identical."""
    from mapreduce_llm_spark.operators.ranking import global_row_number

    c = load_table(spark, sf_dir, "customer")
    order = [
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    ]
    return global_row_number(c, order, alias="sort_pos").select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.round("c_acctbal", 4).alias("bal"),
        "sort_pos",
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 4) AS bal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    )
    WHERE rn <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per segment — the canonical window top-k; one shuffle on
    the group key, per-partition sort only."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 4).alias("bal"))
    )
