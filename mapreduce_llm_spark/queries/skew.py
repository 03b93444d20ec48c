"""Skew-mitigation queries — salting rewrites proven row-identical to
their naive forms via the DuckDB oracle.

The oracle SQL is deliberately the PLAIN (unsalted) query: the whole
point of a skew rewrite is that it changes the physical shuffle layout
without changing the result, so hash-matching the naive SQL is exactly
the correctness claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.skew import salted_join, skew_spread_count_distinct
from mapreduce_llm_spark.registry import query


@query(
    "q_join_salted",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join through the salted path (8-way key spread).

    lineitem⋈orders is the engine's biggest shuffle; at 100 TB a hot
    order key would pin a partition to one executor. The salted plan is
    hash-checked against the plain SQL join — same rows, skew-proof
    layout.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, o, on=["l_orderkey"], how="inner", n_salts=8)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_salted_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) per low-cardinality key — the worst-case skew
    shape (3 groups → 3 reducers naively) — via the two-phase
    dedup-then-count rewrite that spreads each group over the whole
    cluster in phase 1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = skew_spread_count_distinct(li, ["l_returnflag"], "l_partkey", "n_parts")
    supps = skew_spread_count_distinct(li, ["l_returnflag"], "l_suppkey", "n_supps")
    return parts.join(supps, "l_returnflag").orderBy("l_returnflag")
