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
# queries() per round, in dict order. This list rotates the window so
# each round submits queries the driver has not yet externally verified,
# with any fixed regressions first. Round 3 = the two round-2 fixes
# (q_evt_sessionize crashed on the new timestamp[us] events encoding;
# q_tokenize_ids' array column broke the driver's pandas canonicalizer),
# then the 11 oracle-backed queries absent from CORRECTNESS_r01/r02,
# then this round's new oracle-backed queries, then the rows-only
# entries (weaker check). Update per round as coverage accumulates.
DRIVER_PRIORITY: list[str] = [
    # round-2 regressions, fixed this round
    "q_evt_sessionize", "q_tokenize_ids",
    # oracle-backed, never driver-checked
    "q_text_collocations", "q_udaf_grouped", "q_udtf_flatmap",
    "q_udtf_native", "q_win_rank", "q_win_agg", "q_win_leadlag",
    "q_win_ntile", "q_win_range", "q_win_pctrank", "q_win_ignorenulls",
    # round-3 additions (oracle-backed)
    "q_tpch_q1_shape", "q_tpch_q4_shape", "q_tpch_q6_shape",
    "q_tpch_q7_shape", "q_tpch_q8_shape", "q_tpch_q9_shape",
    "q_tpch_q11_shape", "q_tpch_q13_shape", "q_tpch_q15_shape",
    "q_tpch_q16_shape", "q_tpch_q17_shape", "q_tpch_q20_shape",
    "q_tpch_q21_shape", "q_tpch_q22_shape",
    "q_join_range", "q_join_band_interval", "q_win_cume_sum",
    "q_agg_corr", "q_agg_percentile_exact", "q_fn_regex", "q_fn_url",
    "q_fn_trig", "q_dedup_window", "q_text_readability",
    "q_text_stopword_ratio", "q_doc_windows", "q_sessionize_orders",
    "q_orders_running_share", "q_part_price_band", "q_setop_all",
    "q_agg_filter", "q_ts_gapfill", "q_tpch_q21_onepass",
    "q_scd2_build", "q_agg_decimal_exact", "q_scd2_lookup", "q_dq_checks",
    "q_fn_levenshtein", "q_agg_moments", "q_agg_bitops", "q_fn_encoding",
    "q_join_nullsafe", "q_explode_outer", "q_fn_variant", "q_fn_date_arith",
    "q_tpch_q2_shape",
    # rows-only, never driver-checked (weaker rows-only gate)
    "q_graph_pagerank", "q_agg_sketch_union", "q_dedup_simhash", "q_sim_join", "q_sim_ann_topk",
    "q_text_fingerprint", "q_chunk_assign", "q_llm_map",
    "q_mm_features", "q_sim_ivf", "q_pipeline_curate", "q_mm_frames",
    "q_mm_audio", "q_sample_stratified", "q_sample", "q_pack_sequences",
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
        analytics_extra,
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
        tpch_extra,
        tpch_macro,
        udfs,
        windows,
    )

    front = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    reordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(reordered)
