"""The spark.sql entry point as a declared surface — users of the
engine can register the tables as views and run ANSI SQL directly;
Catalyst plans it identically to the DataFrame API.

The parity demo is maximal here: the ORACLE STRING IS THE SPARK QUERY
— one dialect-neutral SQL text executed by both engines and
hash-compared, proving the SQL front door end-to-end (views, CTE,
3-dim star join, agg, order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query

_SQL = """
WITH rev AS (
    SELECT o_custkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey
)
SELECT r_name,
       round(sum(revenue), 4) AS region_revenue,
       count(*) AS n_customers
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@query("q_sql_interface", oracle=_SQL)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register tables as temp views, run the oracle SQL verbatim
    through spark.sql — the CTE aggregates the fact tables down to
    per-customer rows before the dimension chain joins (broadcast)."""
    for t in ("orders", "lineitem", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL)


_LATERAL_SQL = """
SELECT c_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
WHERE c_custkey < 1000
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@query("q_sql_lateral", oracle=_LATERAL_SQL)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (each
    customer's two largest orders) — the dialect-neutral SQL runs
    verbatim on both engines. DuckDB executes the lateral as a
    dependent join; Catalyst DECORRELATES it (DecorrelateInnerQuery)
    into a window rank over orders plus one equi-join — no per-row
    re-execution, which is what makes the construct usable at 100 TB
    (the naive interpretation is a correlated scan per outer row).
    The unique-key tie-break on the LIMIT keeps the top-2 set
    deterministic per the repo's ties rule."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)
