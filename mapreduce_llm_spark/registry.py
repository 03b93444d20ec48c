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
# with any fixed regressions first. The surface now holds more
# never-externally-seen queries than the window fits, so slots are
# triaged by signal strength: every never-hash-checked ORACLE-BACKED
# query goes in first (the strong {rows,schema,hash} gate), the
# remaining slots take never-run rows-only entries (weaker rows-count
# gate), and the rows-only remainder rolls to the round-5 window.
# Round-4 window (in order):
#   1. q_agg_decimal_exact — the r3 red cell (pandas Decimal-vs-float64
#      rendering), fixed by string-casting the sums on both sides.
#   2. q_evt_session — gained a real oracle in round 2 (commit 30799ee)
#      but its only external record is r1's no_oracle row.
#   3. The 9 oracle-backed queries that have never been inside a
#      driver window (r3's entries 51-59).
#   4. New round-4 oracle-backed queries (batches r4/r4b/r4c+corpus).
#   5. Rows-only entries never driver-run, as many as fit.
# Rollover to round 5: the rows-only entries that didn't fit —
# q_agg_sketch_union, q_sim_join, q_text_fingerprint, q_sim_ivf,
# q_mm_frames, q_sample_stratified, q_sample, q_pack_sequences,
# q_sim_recall, q_sim_ann_topk, q_dedup_simhash, q_graph_pagerank,
# plus the late round-4 rows-only additions q_stream_ewma,
# q_stream_dedup, q_snapshot_timetravel, and the evicted
# q_pipeline_curate. Invariants are asserted, not narrated — see
# tests/test_plans.py::test_driver_priority_round4_window.
DRIVER_PRIORITY: list[str] = [
    # (1) the round-3 regression, fixed this round
    "q_agg_decimal_exact",
    # (2) oracle added in r2, never externally hash-checked
    "q_evt_session",
    # (3) oracle-backed, never inside a driver window
    "q_fn_levenshtein", "q_agg_moments", "q_agg_bitops", "q_fn_encoding",
    "q_join_nullsafe", "q_explode_outer", "q_fn_variant", "q_fn_date_arith",
    "q_tpch_q2_shape",
    # (4) round-4 additions (oracle-backed)
    "q_pivot_status", "q_unpivot_metrics", "q_agg_mode",
    "q_agg_string_agg", "q_ts_ohlc", "q_cohort_retention",
    "q_funnel_conversion", "q_basket_pairs", "q_agg_mad",
    "q_join_asof_fwd",
    "q_markov_transitions", "q_time_weighted_avg", "q_ewma",
    "q_weighted_sample", "q_embed_dim_stats", "q_runs_islands",
    "q_fuzzy_join", "q_dist_drift",
    "q_rollup_incremental", "q_graph_triangles", "q_hierarchy_depth",
    "q_interval_concurrency",
    "q_agg_entropy", "q_chi_square", "q_win_median", "q_win_distinct",
    "q_skyline", "q_graph_bfs", "q_text_bm25", "q_shuffle_shards",
    "q_length_buckets", "q_join_incremental", "q_sql_lateral",
    "q_stream_tumbling", "q_win_running_distinct",
    # (5) rows-only, never driver-run (weaker rows-only gate); the
    #     reference-surface operators (chunker, LLM map, multimodal)
    #     first — q_pipeline_curate (a composition of individually
    #     verified parts) yields its slot to the oracle-backed
    #     running-distinct proof and rolls to round 5
    "q_chunk_assign", "q_llm_map", "q_mm_features", "q_mm_audio",
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
        analytics_r4,
        analytics_r4b,
        analytics_r4c,
        corpus_ops,
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
        streaming_queries,
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
