"""Round-12 STAGED surface — seed tranche.

Same staged-tranche contract the round-9/10/11 batches followed before
their flips (analytics_r10_staged → queries/analytics_r10.py in
round 11; analytics_r11_staged flips in round 12): the round-11 window
is fully allocated (50 pre-drafted pairs in ROUND11_WINDOW), so surface
built beyond that point stages HERE and flips in round 13. Every entry
is a complete (query fn, DuckDB oracle) pair hash-proven NOW at sf0.01
and the sf0.1 sweep env by tests/test_r12_staged.py through the same
harness the driver gate uses. NOT imported by registry.load_all —
importing this module must stay registry-side-effect free (pinned by
the staging test).

Seed themes — decision seams the first 535 queries leave open:

- **Point-process structure** (q_interarrival_hazard, q_gap_entropy):
  the discrete hazard and bucket-entropy of inter-event gaps — the
  memorylessness check behind every arrival-rate capacity model.
- **Behavioral co-occurrence** (q_type_cooccurrence): user-level lift
  and Jaccard between event types — which behaviors travel together.
- **Series shape** (q_drawdown, q_wow_volatility): worst running loss
  of the daily series, and week-over-week movement magnitudes — the
  traffic-health counterpart of the finance drawdown report.

Determinism discipline: identical to the r9/r10/r11 staging — exact
integer counts and e4/bp floors via nonneg integer division (abs +
CASE re-sign for anything that can cross zero, the CLAUDE.md
q_header_detail_recon rule), round(,4) only on the allowed
log/sqrt/corr class, nullif/CASE guards on data-dependent
denominators, packed nonneg-integer argmax instead of struct argmin
(the q_kmeans_step rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, DuckDB oracle SQL); round 13 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R12: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R12:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R12[name] = (fn, oracle)
        return fn

    return deco


def _r12_words(col):
    """Lowercased alpha word array — the shared tokenization of the
    text queries (the _r11_words twin, kept module-local so the staged
    modules stay import-independent)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda w: w != F.lit("")
    )


# ---------------------------------------------------------------------------
# Tranche 1 — point-process / series-shape event science.
# ---------------------------------------------------------------------------


@_staged(
    "q_interarrival_hazard",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id))
                   // 1000000 AS gap_s
        FROM events
    ),
    bucketed AS (
        SELECT event_type,
               least(gap_s // 600, CAST(12 AS BIGINT)) AS bucket,
               CAST(count(*) AS BIGINT) AS n_gaps
        FROM gaps
        WHERE gap_s IS NOT NULL
        GROUP BY event_type, least(gap_s // 600, CAST(12 AS BIGINT))
    )
    SELECT event_type, bucket, n_gaps,
           CAST(sum(n_gaps) OVER (
                PARTITION BY event_type ORDER BY bucket DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_at_risk,
           CAST(n_gaps * 10000 // sum(n_gaps) OVER (
                PARTITION BY event_type ORDER BY bucket DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hazard_e4
    FROM bucketed
    ORDER BY event_type, bucket
    """,
)
def q_interarrival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete hazard of inter-event gaps per event type: bucket the
    per-type inter-arrival gaps into 10-minute cells (capped at 2 h),
    then hazard(b) = P(gap in b | gap ≥ b) = n_b / Σ_{b'≥b} n_b' — a
    flat hazard is the memoryless (Poisson) signature, a rising one
    means overdue events get MORE likely (queue flush), a falling one
    means bursts. This is the arrival-model check behind every
    capacity plan built on the events stream. Exact integers
    throughout: whole-second gaps by integer µs division, e4 hazard by
    nonneg integer division; the at-risk denominator is a reverse
    cumulative window, never a self-join."""
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) OVER ("
            "PARTITION BY event_type ORDER BY ts, event_id))"
            " div 1000000"
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    bucketed = (
        gaps.select(
            "event_type",
            F.least(F.expr("gap_s div 600"), F.lit(12).cast("long")).alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("n_gaps"))
    )
    rev = (
        Window.partitionBy("event_type")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.select(
        "event_type",
        "bucket",
        "n_gaps",
        F.sum("n_gaps").over(rev).cast("long").alias("n_at_risk"),
        F.expr(
            "CAST(n_gaps * 10000 div (sum(n_gaps) OVER ("
            "PARTITION BY event_type ORDER BY bucket DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
            " AS BIGINT)"
        ).alias("hazard_e4"),
    ).orderBy("event_type", "bucket")


@_staged(
    "q_type_cooccurrence",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    tc AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM ut GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
        FROM events
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_both,
           CAST(p.n_both * t.n_total * 10000
                // (ca.n_users * cb.n_users) AS BIGINT) AS lift_e4,
           CAST(p.n_both * 10000
                // (ca.n_users + cb.n_users - p.n_both) AS BIGINT)
               AS jaccard_e4
    FROM pairs p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    CROSS JOIN tot t
    ORDER BY p.type_a, p.type_b
    """,
)
def q_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level co-occurrence of event types: for every unordered
    type pair, the number of users exhibiting both, the lift
    n_both·N/(n_a·n_b) and the Jaccard overlap — which behaviors
    travel together (do purchasers also hit errors?). The pair
    candidate set is the self-join of the DISTINCT (user, type)
    projection — at most |types| rows per user, so the join is
    |users|·k², never |events|²; per-type totals and the one-row
    user-count leg are tiny aggregate legs (the latter a documented
    broadcast scalar). Exact integer lift/Jaccard in e4 by nonneg
    integer division."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tc = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users")
    )
    tot = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_total")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    return (
        pairs.join(
            tc.select(
                F.col("event_type").alias("type_a"),
                F.col("n_users").alias("na"),
            ),
            "type_a",
        )
        .join(
            tc.select(
                F.col("event_type").alias("type_b"),
                F.col("n_users").alias("nb"),
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.expr(
                "CAST(n_both * n_total * 10000 div (na * nb) AS BIGINT)"
            ).alias("lift_e4"),
            F.expr(
                "CAST(n_both * 10000 div (na + nb - n_both) AS BIGINT)"
            ).alias("jaccard_e4"),
        )
        .orderBy("type_a", "type_b")
    )


@_staged(
    "q_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP))
                   // 86400000000 AS epoch_day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
    ),
    dd AS (
        SELECT event_type, epoch_day, cnt,
               max(cnt) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt AS drawdown
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(cnt) AS BIGINT) AS max_daily,
           CAST(min(cnt) AS BIGINT) AS min_daily,
           CAST(max(drawdown * 10000000 + (9999999 - epoch_day))
                // 10000000 AS BIGINT) AS max_drawdown,
           CAST(9999999 - (max(drawdown * 10000000
                                + (9999999 - epoch_day)) % 10000000)
               AS BIGINT) AS trough_epoch_day
    FROM dd
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily event-count series per type: the
    deepest drop from a running peak, and the (earliest) day it
    bottomed — the traffic-health counterpart of the finance drawdown
    report (a big drawdown on 'purchase' is an incident; on 'error'
    it's a fix). Running peak is a cumulative window (no self-join);
    the argmax day rides the packed nonneg-integer key
    drawdown·10⁷ + (10⁷−1−epoch_day) — maximizing it maximizes
    drawdown then breaks ties toward the EARLIEST day, and both packed
    terms are nonneg with epoch_day < 10⁷, so unpacking by integer
    div/mod is exact on both engines (the q_kmeans_step packing rule;
    drawdown ≤ max daily count keeps the product far below 2⁶³)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    daily = daily.withColumn(
        "epoch_day", F.expr("unix_micros(day) div 86400000000")
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.withColumn(
        "drawdown", F.max("cnt").over(cum) - F.col("cnt")
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.max("cnt").cast("long").alias("max_daily"),
            F.min("cnt").cast("long").alias("min_daily"),
            F.expr(
                "CAST(max(drawdown * 10000000 + (9999999 - epoch_day))"
                " div 10000000 AS BIGINT)"
            ).alias("max_drawdown"),
            F.expr(
                "CAST(9999999 - (max(drawdown * 10000000"
                " + (9999999 - epoch_day)) % 10000000) AS BIGINT)"
            ).alias("trough_epoch_day"),
        )
        .orderBy("event_type")
    )


@_staged(
    "q_gap_entropy",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id))
                   // 1000000 AS gap_s
        FROM events
    ),
    bucketed AS (
        SELECT event_type,
               least(gap_s // 600, CAST(12 AS BIGINT)) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM gaps
        WHERE gap_s IS NOT NULL
        GROUP BY event_type, least(gap_s // 600, CAST(12 AS BIGINT))
    ),
    withp AS (
        SELECT event_type, n,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                   PARTITION BY event_type) AS DOUBLE) AS p
        FROM bucketed
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_gaps,
           round(-sum(p * ln(p)) + 0.0, 4) AS entropy_nats
    FROM withp
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_gap_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the inter-arrival gap-bucket
    distribution per event type — the one-number spread summary of the
    hazard table (q_interarrival_hazard): max-entropy means gaps are
    uniform over the 10-minute cells, near-zero means one dominant
    rhythm. ln() is the allowed round(,4) class (CLAUDE.md); the
    bucket mass p enters as one int64→double divide, identical in both
    engines, and the `+ 0.0` normalizes a potential -0.0 when a type
    has a single bucket (the CLAUDE.md negative-zero rule)."""
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) OVER ("
            "PARTITION BY event_type ORDER BY ts, event_id))"
            " div 1000000"
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    bucketed = (
        gaps.select(
            "event_type",
            F.least(F.expr("gap_s div 600"), F.lit(12).cast("long")).alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = Window.partitionBy("event_type")
    p = F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
    bucketed = bucketed.withColumn("plnp", p * F.log(p))
    return (
        bucketed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_gaps"),
            F.round(-F.sum("plnp") + F.lit(0.0), 4).alias("entropy_nats"),
        )
        .orderBy("event_type")
    )


@_staged(
    "q_wow_volatility",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY event_type, date_trunc('week', ts)
    ),
    changes AS (
        SELECT event_type, cnt,
               lag(cnt) OVER (
                   PARTITION BY event_type ORDER BY week) AS prev
        FROM weekly
    ),
    signed AS (
        SELECT event_type,
               abs(cnt - prev) * 10000 // prev AS mag_bp,
               CASE WHEN cnt >= prev
                    THEN abs(cnt - prev) * 10000 // prev
                    ELSE -(abs(cnt - prev) * 10000 // prev)
               END AS change_bp
        FROM changes
        WHERE prev IS NOT NULL AND prev > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_changes,
           CAST(max(mag_bp) AS BIGINT) AS max_abs_wow_bp,
           CAST(sum(mag_bp) // count(*) AS BIGINT) AS mean_abs_wow_bp,
           CAST(sum(change_bp) AS BIGINT) AS net_wow_bp
    FROM signed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_wow_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movement of the weekly event-count series per
    type: largest and mean absolute WoW change plus the signed net, in
    basis points of the prior week — the volatility line of a traffic
    report (a healthy stream moves tens of bp; hundreds is a launch or
    an outage). The WoW change can cross zero, so the bp floor runs on
    the ABSOLUTE delta and the sign is re-applied by CASE — never
    integer-divide a negative numerator (DuckDB floors, Spark
    truncates; the CLAUDE.md q_header_detail_recon rule). Weeks are
    date_trunc('week') Mondays, identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("week")
    changes = weekly.withColumn("prev", F.lag("cnt").over(w)).where(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    )
    signed = changes.select(
        "event_type",
        F.expr("abs(cnt - prev) * 10000 div prev").alias("mag_bp"),
        F.expr(
            "CASE WHEN cnt >= prev THEN abs(cnt - prev) * 10000 div prev"
            " ELSE -(abs(cnt - prev) * 10000 div prev) END"
        ).alias("change_bp"),
    )
    return (
        signed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_changes"),
            F.max("mag_bp").cast("long").alias("max_abs_wow_bp"),
            F.expr(
                "CAST(sum(mag_bp) div count(*) AS BIGINT)"
            ).alias("mean_abs_wow_bp"),
            F.sum("change_bp").cast("long").alias("net_wow_bp"),
        )
        .orderBy("event_type")
    )
