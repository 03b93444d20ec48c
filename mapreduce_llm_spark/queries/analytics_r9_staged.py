"""Round-9 STAGED surface — seed tranche.

Same contract as queries/analytics_r8_staged.py, one window further
out: the round-8 window is already fully allocated (47 staged + 3
FUTURE_ORACLES flips = 50), so surface built after that point stages
HERE and flips in round 9. Every entry is a complete (query fn,
DuckDB oracle) pair hash-proven NOW at sf0.01 and the sf0.1 sweep env
by tests/test_r9_staged.py through the same harness the driver gate
uses. NOT imported by registry.load_all — importing this module must
stay registry-side-effect free (pinned by the staging test).

The seed theme is the two pipeline seams the first 385 queries never
covered:

- **Watermark tuning** (q_disorder_audit, q_watermark_yield): the
  out-of-orderness of event time relative to arrival order is THE
  input to every `withWatermark` delay choice, and the engine that
  ships streaming operators owes its users the audit that measures
  it. Arrival order is the monotone ingest id (event_id); lateness
  is measured against the per-user running max event time over
  strictly earlier arrivals — exact integer microseconds, keyed
  windows only.
- **Leakage-safe label generation** (q_churn_label): the supervised
  twin of q_feature_matrix's feature rows — features strictly before
  a cutoff, the label strictly after it, the cutoff derived from the
  data's own horizon. The train/serve leakage this op exists to
  prevent is the label analogue of q_asof_tolerance's staleness
  bound.

Round-9 flip checklist so far: q_watermark_yield and q_churn_label
carry a BroadcastNestedLoopJoin from broadcast scalar/grid legs
(5-row delay grid; 1-row cutoff leg) and need NLJ_OK entries on
registration; q_disorder_audit is plain keyed-window + aggregate.

Determinism discipline: identical to the r8 staging — exact integer
microsecond/cents arithmetic, bp/e4 floors via integer div, no float
anywhere, nullif/CASE guards on every data-dependent denominator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, DuckDB oracle SQL); round 9 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R9: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R9:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R9[name] = (fn, oracle)
        return fn

    return deco


@_staged(
    "q_disorder_audit",
    oracle="""
    WITH e AS (
        SELECT event_type, user_id, event_id, epoch_us(ts) AS tus
        FROM events
    ),
    lat AS (
        SELECT event_type,
               greatest(coalesce(max(tus) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - tus, 0), 0) AS late_us
        FROM e
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS late_bp,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           CAST(sum(late_us) // count(*) AS BIGINT) AS mean_late_us
    FROM lat
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time out-of-orderness audit — the measurement behind
    every `withWatermark` delay choice: per event type, how many
    events arrive (in ingest order = the monotone event_id) with an
    event time EARLIER than a same-user event already seen, and by
    how much (exact integer µs: late share in basis points, max and
    mean lateness). An event with late_us = 0 would be accepted by a
    zero-delay watermark; max_late_us is the delay that loses
    nothing. Scale: one keyed window (user) + one aggregate — the
    prefix max never leaves the key's partition, and no global
    ordering exists anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = e.select(
        "event_type",
        F.greatest(
            F.coalesce(F.max("tus").over(w) - F.col("tus"), F.lit(0)),
            F.lit(0),
        ).alias("late_us"),
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.expr(
                "CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000"
                " div count(*) AS BIGINT)"
            ).alias("late_bp"),
            F.max("late_us").cast("long").alias("max_late_us"),
            F.expr("CAST(sum(late_us) div count(*) AS BIGINT)").alias(
                "mean_late_us"
            ),
        )
        .orderBy("event_type")
    )


@_staged(
    "q_watermark_yield",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
    ),
    lat AS (
        SELECT greatest(coalesce(max(tus) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - tus, 0), 0) AS late_us
        FROM e
    ),
    grid AS (
        SELECT * FROM (VALUES (0, 0), (60, 60000000),
                              (300, 300000000), (900, 900000000),
                              (3600, 3600000000)) AS g(delay_s, delay_us)
    )
    SELECT delay_s,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS dropped_bp
    FROM lat, grid
    GROUP BY delay_s
    ORDER BY delay_s
    """,
)
def q_watermark_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-delay tradeoff curve: for each candidate
    `withWatermark` delay (0 s, 1 m, 5 m, 15 m, 1 h), how many events
    a streaming job with that delay would DROP as too-late — the
    n_dropped column is exactly what q_disorder_audit's lateness
    distribution buys you, evaluated on the delay grid an operator
    would actually choose from. A per-user keyed window computes each
    event's lateness once; the 5-row delay grid broadcasts over it
    (the allowlisted broadcast-grid BNLJ — 5× row fan-out, constant
    memory), and one aggregate emits the curve. Exact integer µs
    everywhere; dropped share in basis points via integer div."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = e.select(
        F.greatest(
            F.coalesce(F.max("tus").over(w) - F.col("tus"), F.lit(0)),
            F.lit(0),
        ).alias("late_us")
    )
    grid = spark.createDataFrame(
        [(0, 0), (60, 60_000_000), (300, 300_000_000),
         (900, 900_000_000), (3600, 3_600_000_000)],
        "delay_s INT, delay_us BIGINT",
    )
    return (
        lat.crossJoin(F.broadcast(grid))
        .groupBy("delay_s")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.when(F.col("late_us") > F.col("delay_us"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.expr(
                "CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("dropped_bp"),
        )
        .orderBy("delay_s")
    )


@_staged(
    "q_churn_label",
    oracle="""
    WITH horizon AS (
        SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff FROM orders
    ),
    obs AS (
        SELECT o.o_custkey,
               count(*) AS n_orders_obs,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                   AS spend_obs_cents,
               max(CAST(o.o_orderdate AS DATE)) AS last_obs_d
        FROM orders o, horizon h
        WHERE o.o_custkey % 10 = 0 AND o.o_orderdate <= h.cutoff
        GROUP BY o.o_custkey
    ),
    fut AS (
        SELECT DISTINCT o.o_custkey
        FROM orders o, horizon h
        WHERE o.o_custkey % 10 = 0 AND o.o_orderdate > h.cutoff
    )
    SELECT obs.o_custkey,
           CAST(n_orders_obs AS BIGINT) AS n_orders_obs,
           CAST(spend_obs_cents AS BIGINT) AS spend_obs_cents,
           CAST(date_diff('day', last_obs_d, CAST(h.cutoff AS DATE))
                AS BIGINT) AS days_inactive,
           CASE WHEN fut.o_custkey IS NULL THEN 1 ELSE 0 END AS churned
    FROM obs CROSS JOIN horizon h
    LEFT JOIN fut ON fut.o_custkey = obs.o_custkey
    ORDER BY obs.o_custkey
    """,
)
def q_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn-label generation — the supervised twin of
    q_feature_matrix: the cutoff is the data's own horizon minus 90
    days; observation features (order count, spend, days inactive at
    cutoff) come STRICTLY from orders at-or-before the cutoff, and
    the label (churned = placed no order after it) strictly from
    after — the wall that keeps outcome information out of the
    training features. The %10 customer sample prunes at the scan;
    the cutoff is a broadcast 1-row leg (allowlisted scalar BNLJ);
    the label is one anti-join-shaped left join on the customer key.
    Exact integers: cents spend, day counts; no float anywhere."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    horizon = load_table(spark, sf_dir, "orders").agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("cutoff")
    )
    oc = o.crossJoin(F.broadcast(horizon))
    obs = (
        oc.where(F.col("o_orderdate") <= F.col("cutoff"))
        .groupBy("o_custkey", "cutoff")
        .agg(
            F.count("*").cast("long").alias("n_orders_obs"),
            F.sum("cents").cast("long").alias("spend_obs_cents"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_obs_d"),
        )
    )
    fut = (
        oc.where(F.col("o_orderdate") > F.col("cutoff"))
        .select("o_custkey")
        .distinct()
        .withColumn("has_future", F.lit(1))
    )
    return (
        obs.join(fut, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_orders_obs",
            "spend_obs_cents",
            F.datediff(F.col("cutoff").cast("date"), F.col("last_obs_d"))
            .cast("long")
            .alias("days_inactive"),
            F.when(F.col("has_future").isNull(), 1).otherwise(0).alias(
                "churned"
            ),
        )
        .orderBy("o_custkey")
    )
