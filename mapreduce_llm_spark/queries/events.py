"""Event-time analytics over the ``events`` table (SURVEY.md §2C
"Streaming-shaped ops") — batch twins of the streaming pipeline in
``mapreduce_llm_spark/streaming/``; the DuckDB oracle can only check
batch output.

All aggregations key on (bucket, type) or user_id, so they shuffle once
and scale linearly; sessionization is a per-user window cumsum — the
same running-sum shape as the reference's chunker (reference
internal/cli/mapreduce.go:199-263) applied to time gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES
from mapreduce_llm_spark.registry import query


@query(
    "q_evt_tumbling",
    oracle="""
    SELECT
        time_bucket(INTERVAL '1 hour', ts)   AS bucket_start,
        event_type,
        count(*)                             AS n_events,
        round(sum(value), 4)                 AS sum_value,
        count(DISTINCT user_id)              AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_evt_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type via F.window (epoch-aligned
    in both engines for whole-hour widths)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
        .orderBy("bucket_start", "event_type")
    )


@query(
    "q_evt_sliding",
    oracle="""
    SELECT
        time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS win_start,
        count(*)             AS n_events,
        round(sum(value), 4) AS sum_value
    FROM events, unnest([0, 1, 2, 3]) AS t(k)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_evt_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h width, 15 min slide): each event lands in 4
    overlapping windows. Spark's window() generates them natively; the
    oracle expands them via unnest of the 4 offsets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
        .orderBy("win_start")
    )


@query(
    "q_evt_sessionize",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_seq
        FROM gapped
    )
    SELECT
        user_id,
        session_seq,
        min(ts)              AS session_start,
        max(ts)              AS session_end,
        count(*)             AS n_events,
        round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q_evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session id → per-session agg. One shuffle on
    user_id; the batch-deterministic twin of session_window
    (q_evt_session is the rows-only session_window variant)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Microsecond-precision gap: cast("long") would truncate to whole
    # seconds while the oracle compares full intervals, so a gap within
    # 1 s of the 30-min boundary would split sessions differently.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sessions = (
        e.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn("session_seq", F.sum("is_new").over(wsum))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "q_evt_session",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS seq
        FROM gapped
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL '30 minutes'  AS session_end,
           count(*)                         AS n_events,
           round(sum(value), 4)             AS sum_value
    FROM sessions
    GROUP BY user_id, seq
    ORDER BY user_id, session_start
    """,
)
def q_evt_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap). Oracle: Spark merges
    sessions whose [ts, ts+gap) windows overlap OR touch — an exact
    30-min gap still merges (pinned empirically), which is precisely
    the cumsum rule `new session iff gap > 30 min`; the window end is
    last event + gap. So the gap-based CTE with
    session_end = max(ts) + 30 min reproduces session_window
    bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_evt_funnel",
    oracle="""
    SELECT
        user_id,
        count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        count(*) FILTER (WHERE event_type = 'error')    AS n_error,
        round(sum(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clauses) — one pass, no joins."""
    e = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return (
        e.groupBy("user_id")
        .agg(
            cnt("signup").alias("n_signup"),
            cnt("purchase").alias("n_purchase"),
            cnt("error").alias("n_error"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 4
            ).alias("purchase_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q_evt_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
               AS week_offset,
           count(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each later week they return.

    Three shuffles, all on user_id or the (cohort, offset) pair: the
    per-user min, the distinct (user, week) activity set, and the final
    count — each with map-side partial aggregation, so it scales with
    distinct users, not raw events.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_evt_anomaly",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               avg(value)         AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, round(e.value, 4) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.sigma > 0 AND abs(round((e.value - s.mu) / s.sigma, 4)) > 2.5
    """,
)
def q_evt_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly detection: events more than 2.5 standard
    deviations from the user's mean. Aggregate-then-join (the stats
    side is one row per user — AQE broadcasts it when it fits; no
    forced hint, since user cardinality is unbounded at scale) rather
    than a window over every event — at 100 TB the window form sorts
    the world; this form is one partial-aggregated shuffle plus a join
    sized at runtime. The threshold compares the ROUNDED z-score so
    row membership can't flip on last-bit float-summation differences
    between engines."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("user_id").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        e.join(stats, "user_id")
        .filter((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            z.alias("zscore"),
        )
    )


@query(
    "q_graph_components",
    oracle="""
    WITH gapped AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT event_id, user_id,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM gapped
    )
    SELECT event_id AS node,
           min(event_id) OVER (PARTITION BY user_id, seq) AS component
    FROM sessions
    ORDER BY node
    """,
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components (operators/graph.py) on the
    consecutive-event graph (successive events of a user ≤ 30 min
    apart). On this graph components ARE the gap sessions, so the
    oracle computes the same labels with a closed-form window cumsum —
    hash-matching proves the distributed iterative algorithm converges
    to the exact transitive closure."""
    from mapreduce_llm_spark.operators.graph import connected_components

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-precision gap to match the oracle's full-interval comparison
    # (see q_evt_sessionize).
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    edges = (
        e.withColumn("prev_id", F.lag("event_id").over(w))
        .withColumn("gap", gap)
        .filter(F.col("gap").isNotNull() & (F.col("gap") <= 30 * 60 * 1_000_000))
        .select(F.col("prev_id").alias("src"), F.col("event_id").alias("dst"))
    )
    comp = connected_components(edges)
    # isolated events (no qualifying neighbor) are their own component
    all_nodes = e.select(F.col("event_id").alias("node"))
    isolated = all_nodes.join(comp, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return comp.unionByName(isolated).orderBy("node")


@query("q_graph_pagerank", oracle=GRADUATED_ORACLES["q_graph_pagerank"])
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite supplier→part supply graph (edges =
    distinct (l_suppkey, l_partkey) pairs): 10 damped power iterations,
    one shuffle join + one aggregation each, dangling mass
    redistributed so ranks sum to exactly 1 (operators/graph.py:
    pagerank). Oracle-backed since round 8: the fixed-iteration
    recursion is unrolled into 10 MATERIALIZED CTE triples in the
    DuckDB twin (GRADUATED_ORACLES — a recursive CTE cannot aggregate
    over its own previous level); correctness is ALSO pinned to a
    numpy dense power-iteration reference at 1e-9 per node
    (tests/test_graph.py::test_pagerank_matches_numpy_power_iteration).
    Top-20 by rank, node id as tie-break."""
    from mapreduce_llm_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 100000).alias("dst"),
    ).distinct()
    ranks = pagerank(edges, iterations=10, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
    )
