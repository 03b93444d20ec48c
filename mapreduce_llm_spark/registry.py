"""Query registry — the single source of truth for the driver contract.

Every operator the engine claims (SURVEY.md §2) registers here: a named
callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL twin. The driver hash-compares
the two at sf0.01; rows-only entries omit the oracle.

Column-name discipline: the driver sorts columns by name before hashing,
so every computed column is aliased identically in the Spark code and the
oracle SQL. Float aggregates are rounded to 4 decimals on BOTH sides to
dodge summation-order divergence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from mapreduce_llm_spark.queries import (  # noqa: F401
        aggregations,
        embedding_stats,
        events,
        functions_queries,
        joins,
        llm_pipeline,
        relational_extra,
        scans,
        setops,
        skew,
        sorts,
        sql_api,
        textprep,
        tpch_macro,
        udfs,
        windows,
    )
