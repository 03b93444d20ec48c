"""Window-function queries (SURVEY.md §2C "Window functions").

Load-bearing for the reference's own semantics: its chunker is a
running token sum over ordered lines (reference
internal/cli/mapreduce.go:199-263), i.e. a window cumsum. All windows
here partition by a key so the sort is per-partition after one hash
shuffle — no global sort, which is what keeps them viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT *
    FROM (
        SELECT
            o_custkey,
            o_orderkey,
            round(o_totalprice, 4) AS price,
            row_number()  OVER w AS rn,
            rank()        OVER w AS rnk,
            dense_rank()  OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number/rank/dense_rank.
    Ties broken by o_orderkey so the result is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_agg",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
        round(avg(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
    FROM orders
    """,
)
def q_win_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average with explicit frames."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@query(
    "q_win_leadlag",
    oracle="""
    SELECT
        user_id,
        event_id,
        ts,
        lag(ts)  OVER w                           AS prev_ts,
        lead(ts) OVER w                           AS next_ts,
        first_value(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
        last_value(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)  AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag/first/last per user over event time — the primitive
    under sessionization (q_evt_sessionize)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.first("event_type").over(wfull).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT
        ntile_bucket,
        count(*)                       AS n_customers,
        round(min(c_acctbal), 4)       AS min_bal,
        round(max(c_acctbal), 4)       AS max_bal
    FROM (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS ntile_bucket
        FROM customer
    )
    GROUP BY ntile_bucket
    ORDER BY ntile_bucket
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing with window-ntile semantics but a distributed
    plan: global rank via two-phase range ranking
    (operators/ranking.py), then the exact ntile bucket formula from
    (rank, total) — no unpartitioned window anywhere. Hash-matching the
    oracle's plain ntile(10) OVER proves the rewrite."""
    from mapreduce_llm_spark.operators.ranking import global_row_number, ntile_from_rank

    c = load_table(spark, sf_dir, "customer")
    # lazy scalar total: a broadcast single-row cross join, not a
    # driver-side count() at plan-build time
    total_df = F.broadcast(c.agg(F.count("*").alias("_total")))
    ranked = global_row_number(
        c.select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        alias="rank",
    ).crossJoin(total_df)
    return (
        ranked.select(
            "c_acctbal",
            ntile_from_rank(F.col("rank"), F.col("_total"), 10).alias("ntile_bucket"),
        )
        .groupBy("ntile_bucket")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("ntile_bucket")
    )


@query(
    "q_win_range",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey
            ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS trailing_30d
    FROM orders
    """,
)
def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame: per-customer trailing-30-day revenue.

    RANGE frames bound by *value* distance, not row count — the frame
    for two orders on the same day is identical regardless of row
    order, which ROWS frames cannot express. Ordered on an integer day
    index (identical expression in the oracle) because RANGE needs a
    numeric/interval ordering key in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("trailing_30d"),
    )


@query(
    "q_win_pctrank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (percent_rank / cume_dist)
    per market segment — partitioned, so one bounded shuffle."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_ignorenulls",
    oracle="""
    SELECT user_id, event_id,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS last_seen_value
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    ORDER BY user_id, event_id
    """,
)
def q_win_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with IGNORE NULLS (last-observation-carried-forward)
    — the telemetry repair primitive: error events null their value and
    inherit the user's most recent healthy reading. One window shuffle
    on user_id; rows before any healthy reading stay NULL."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    return (
        e.withColumn("v", v)
        .select(
            "user_id",
            "event_id",
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias(
                "last_seen_value"
            ),
        )
        .orderBy("user_id", "event_id")
    )
