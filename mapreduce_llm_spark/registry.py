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

# The driver's CORRECTNESS gate hash-checks only the FIRST 50 entries of
# queries() per round, in dict order. Round 1 spent those slots on
# queries that are also covered by the identical local harness; this
# list rotates the window so each round submits 50 queries the driver
# has not yet externally verified (plus any fixed regressions, first).
# Round 2 = the q_evt_sessionize fix + 49 oracle-backed queries absent
# from CORRECTNESS_r01.json. Update per round as coverage accumulates.
DRIVER_PRIORITY: list[str] = [
    "q_evt_sessionize",
    "q_dedup_ngram", "q_dedup_embed", "q_sim_search", "q_sim_rerank",
    "q_text_stats", "q_text_quality", "q_cost_estimate", "q_text_tfidf",
    "q_pivot", "q_unpivot", "q_subquery_scalar", "q_subquery_in",
    "q_cte_reuse", "q_having", "q_lateral_posexplode",
    "q_subquery_correlated", "q_merge_upsert", "q_scan_project",
    "q_text_lines", "q_filter_pred", "q_filter_like_null", "q_proj_expr",
    "q_union_all", "q_union_distinct", "q_intersect", "q_except",
    "q_join_salted", "q_agg_salted_distinct", "q_topk", "q_sort_multi",
    "q_topk_per_group", "q_sql_interface", "q_split_train_test",
    "q_tokenize_ids", "q_text_langid", "q_text_ngrams",
    "q_text_repetition", "q_pii_redact", "q_clip_outliers",
    "q_decontaminate", "q_mix_weights", "q_tpch_q3_shape",
    "q_tpch_q5_shape", "q_tpch_q10_shape", "q_tpch_q18_shape",
    "q_tpch_q12_shape", "q_tpch_q14_shape", "q_tpch_q19_shape",
    "q_udf_scalar",
]


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
    """Import every query module so registration side effects run, then
    reorder QUERIES so DRIVER_PRIORITY names come first (the driver
    hash-checks the first 50 in dict order)."""
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

    front = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    reordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(reordered)
