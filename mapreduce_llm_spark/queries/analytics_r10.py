"""Round-10 registered surface — 50 oracle-backed analytics queries,
staged (as queries/analytics_r10_staged.py) and hash-proven through
the driver-gate harness at sf0.01 AND the sf0.1 sweep env in rounds
8–9, flipped into live ``@query(oracle=...)`` declarations in round 11
(the round-10 driver window re-verified the round-9 batch instead —
VERDICT r10 finding #1 — so the rehearsed flip executes one round
late, byte-identical to the rehearsal: no collisions, exactly 50
slots, no FUTURE_ORACLES graduations remaining, backlog closure by
construction, pinned at the time by tests/test_r10_flip_rehearsal.py).

Tranche themes — the measurement seams the first 435 queries leave open:

- **Uncertainty on order statistics** (q_percentile_ci): a p90 SLA
  number without a confidence interval invites overfitting to noise;
  the exact binomial-rank CI is the standard remedy and is pure
  integer/rank machinery.
- **Forecast backtesting** (q_forecast_backtest): q_forecast_naive
  EMITS a forecast; nothing yet SCORES one. Walk-forward seasonal-
  naive MAPE/bias is the baseline every real forecast must beat.
- **Embedding drift** (q_embed_drift): q_profile_drift watches scalar
  profiles; embedding centroid movement between snapshot halves is
  the train/serve-skew alarm for vector features.
- **LSH parameter tuning** (q_minhash_band_tuning): the (r, b)
  s-curve evaluated against the corpus's MEASURED pair-similarity
  histogram — the actual decision input for picking MinHash bands,
  with the curve values inlined as precomputed integer literals so
  no cross-engine pow() is ever trusted.

Determinism discipline: identical to the r9 batch — exact integer
cents/e4 floors via integer div, round(,4) only on sqrt/ln-class
outputs, sign-safe division (never integer-div a negative numerator),
HUGEINT/DECIMAL(38,0) wherever a square can pass int64.

Plan-lint status (pre-flighted at sf0.001 by the staged plan lint,
tests/test_r10_staged_props.py at the time): no cartesian products,
no Python crossings; the BroadcastNestedLoopJoin hits are all
allowlisted broadcast scalar/grid legs carried verbatim into
tests/test_plan_lint.py::NLJ_OK — q_order_status_flow,
q_power_user_share, q_markov_attribution, q_lm_generalization_gap,
q_vocab_coverage_curve, q_last_digit_uniformity, q_leakage_scan,
q_slow_movers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query

QueryFn = Callable[[SparkSession, str], DataFrame]


@query(
    "q_percentile_ci",
    oracle="""
    WITH d AS (
        SELECT o.o_orderpriority AS priority, l.l_orderkey, l.l_linenumber,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
        SELECT priority, delay_days,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY delay_days, l_orderkey,
                                           l_linenumber) AS rk,
               count(*) OVER (PARTITION BY priority) AS n
        FROM d
    ),
    b AS (
        SELECT priority, delay_days, rk, n,
               greatest(1, least(n, CAST(ceil(
                   n * 0.9 - 1.959964 * sqrt(n * 0.9 * 0.1)) AS BIGINT)))
                   AS lo_rk,
               greatest(1, least(n, CAST(ceil(
                   n * 0.9 + 1.959964 * sqrt(n * 0.9 * 0.1)) AS BIGINT)))
                   AS hi_rk,
               (n * 90 + 99) // 100 AS p_rk
        FROM r
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_lines,
           CAST(max(CASE WHEN rk = p_rk THEN delay_days END) AS BIGINT)
               AS p90_days,
           CAST(max(CASE WHEN rk = lo_rk THEN delay_days END) AS BIGINT)
               AS ci_lo_days,
           CAST(max(CASE WHEN rk = hi_rk THEN delay_days END) AS BIGINT)
               AS ci_hi_days
    FROM b
    GROUP BY priority
    ORDER BY priority
    """,
)
def q_percentile_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p90 ship delay per priority WITH its 95% confidence interval —
    the binomial-rank CI (ranks n·p ± z·√(n·p·(1−p)), the
    distribution-free interval for an order statistic): an SLA
    dashboard that moves 2 days inside its own CI hasn't moved.
    Ranks from operators/ranking.partitioned_row_number; the CI rank
    indices use ceil on an IEEE chain that both engines evaluate
    identically (sqrt/multiply on int-derived doubles), clamped to
    [1, n]; the point estimate stays the exact integer nearest-rank.
    """
    from mapreduce_llm_spark.operators.ranking import partitioned_row_number

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    d = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "priority",
            "l_orderkey",
            "l_linenumber",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("delay_days"),
        )
    )
    r = partitioned_row_number(
        d,
        ["priority"],
        [F.col("delay_days"), F.col("l_orderkey"), F.col("l_linenumber")],
        alias="rk",
    )
    n = r.groupBy("priority").agg(F.count("*").alias("n"))
    b = r.join(F.broadcast(n), "priority").select(
        "priority",
        "delay_days",
        "rk",
        "n",
        F.expr(
            "greatest(1, least(n, CAST(ceil("
            "n * 0.9 - 1.959964 * sqrt(n * 0.9 * 0.1)) AS BIGINT)))"
        ).alias("lo_rk"),
        F.expr(
            "greatest(1, least(n, CAST(ceil("
            "n * 0.9 + 1.959964 * sqrt(n * 0.9 * 0.1)) AS BIGINT)))"
        ).alias("hi_rk"),
        F.expr("(n * 90 + 99) div 100").alias("p_rk"),
    )
    return (
        b.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_lines"),
            F.max(F.expr("CASE WHEN rk = p_rk THEN delay_days END"))
            .cast("long")
            .alias("p90_days"),
            F.max(F.expr("CASE WHEN rk = lo_rk THEN delay_days END"))
            .cast("long")
            .alias("ci_lo_days"),
            F.max(F.expr("CASE WHEN rk = hi_rk THEN delay_days END"))
            .cast("long")
            .alias("ci_hi_days"),
        )
        .orderBy("priority")
    )


@query(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, d
    ),
    j AS (
        SELECT a.event_type, a.n AS actual, f.n AS forecast
        FROM daily a JOIN daily f
          ON a.event_type = f.event_type
         AND f.d = a.d - to_days(7)
        WHERE a.n > 0
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days_eval,
               CAST(sum(abs(actual - forecast) * 10000 // actual)
                    AS BIGINT) AS sum_ape_e4,
               CAST(sum(actual) AS BIGINT) AS sum_actual,
               CAST(sum(forecast) AS BIGINT) AS sum_forecast
        FROM j GROUP BY event_type
    )
    SELECT event_type, n_days_eval,
           CAST(sum_ape_e4 // n_days_eval AS BIGINT) AS mape_e4,
           CAST(CASE WHEN sum_forecast >= sum_actual THEN 1 ELSE -1 END
                * (abs(sum_forecast - sum_actual) * 10000 // sum_actual)
                AS BIGINT) AS bias_e4
    FROM m
    ORDER BY event_type
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the seasonal-naive forecast (ŷ_t =
    y_{t−7d}) on daily event counts: per event type, MAPE and signed
    bias — the scoreboard a real forecasting model must beat
    (q_forecast_naive emits the forecast; this is the missing
    evaluation loop). APE per day is integer e4 (abs first, so the
    integer division never sees a negative numerator — the
    floor-vs-truncate divergence class); bias re-signs an
    absolute-value quotient the same way. One self-equi-join on
    (type, d−7), two aggregates."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    f = daily.select(
        "event_type",
        F.date_add(F.col("d"), 7).alias("d"),
        F.col("n").alias("forecast"),
    )
    j = (
        daily.select("event_type", "d", F.col("n").alias("actual"))
        .join(f, ["event_type", "d"])
        .where(F.col("actual") > 0)
    )
    m = j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days_eval"),
        F.sum(
            F.expr("abs(actual - forecast) * 10000 div actual")
        )
        .cast("long")
        .alias("sum_ape_e4"),
        F.sum("actual").cast("long").alias("sum_actual"),
        F.sum("forecast").cast("long").alias("sum_forecast"),
    )
    return m.select(
        "event_type",
        "n_days_eval",
        F.expr("CAST(sum_ape_e4 div n_days_eval AS BIGINT)").alias("mape_e4"),
        F.expr(
            "CAST(CASE WHEN sum_forecast >= sum_actual THEN 1 ELSE -1 END"
            " * (abs(sum_forecast - sum_actual) * 10000 div sum_actual)"
            " AS BIGINT)"
        ).alias("bias_e4"),
    ).orderBy("event_type")


@query(
    "q_embed_drift",
    oracle="""
    WITH q AS (
        SELECT vec_id, label, vec_id % 2 AS half, dim, qv
        FROM (
            SELECT vec_id, label,
                   unnest(generate_series(1, len(embedding))) AS dim,
                   unnest(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                       AS qv
            FROM embeddings
        )
    ),
    s AS (
        SELECT label, dim,
               CAST(sum(CASE WHEN half = 0 THEN qv ELSE 0 END) AS BIGINT)
                   AS sa,
               CAST(sum(CASE WHEN half = 1 THEN qv ELSE 0 END) AS BIGINT)
                   AS sb,
               CAST(count(DISTINCT CASE WHEN half = 0 THEN vec_id END)
                    AS BIGINT) AS na,
               CAST(count(DISTINCT CASE WHEN half = 1 THEN vec_id END)
                    AS BIGINT) AS nb
        FROM q GROUP BY label, dim
    ),
    d AS (
        SELECT label, max(na) AS na, max(nb) AS nb,
               sum(CAST(nb * sa - na * sb AS HUGEINT)
                   * (nb * sa - na * sb)) AS d2
        FROM s GROUP BY label
    )
    SELECT CAST(label AS INT) AS label,
           CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           CAST(d2 AS VARCHAR) AS d2_str,
           round(sqrt(CAST(d2 AS DOUBLE))
                 / (CAST(na AS DOUBLE) * nb * 1000.0), 4) + 0.0
               AS shift_norm
    FROM d
    ORDER BY label
    """,
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between vec_id-parity
    halves (the stand-in for yesterday's vs today's embedding
    snapshot) — the vector-feature train/serve-skew alarm
    (q_profile_drift watches scalar profiles; a centroid that moved
    means the upstream encoder or the population changed). The
    mean-free exactness trick of q_embed_outlier generalized to TWO
    cohorts: ‖c_a − c_b‖² scaled by (na·nb)² is
    Σ_d (nb·Sa_d − na·Sb_d)², integer-exact — the per-dim term fits
    int64, its square accumulates on HUGEINT/DECIMAL(38,0) and is
    emitted as a digit string (decimal columns can't cross the
    driver's pandas materialization — CLAUDE.md). The human-readable
    norm divides out (na·nb·1000) under round(,4), the sqrt-class
    output."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "vec_id",
        "label",
        "half",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1000).cast("long").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("qv")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("qv")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.countDistinct(
            F.when(F.col("half") == 0, F.col("vec_id"))
        )
        .cast("long")
        .alias("na"),
        F.countDistinct(
            F.when(F.col("half") == 1, F.col("vec_id"))
        )
        .cast("long")
        .alias("nb"),
    )
    d = s.groupBy("label").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(
            F.expr(
                "CAST(nb * sa - na * sb AS DECIMAL(38,0))"
                " * (nb * sa - na * sb)"
            )
        ).alias("d2"),
    )
    return d.select(
        F.col("label").cast("int").alias("label"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.col("d2").cast("decimal(38,0)").cast("string").alias("d2_str"),
        F.expr(
            "round(sqrt(CAST(d2 AS DOUBLE))"
            " / (CAST(na AS DOUBLE) * nb * 1000.0), 4) + 0.0"
        ).alias("shift_norm"),
    ).orderBy("label")


# s-curve P(collide | jaccard=s; r rows, b bands) = 1 − (1 − s^r)^b,
# PRECOMPUTED on the driver at e4 for decile midpoints s = 0.05..0.95
# and inlined as literals in BOTH engines: cross-engine pow() is a
# libm 1-ulp minefield (CLAUDE.md round-boundary class), and the
# curve is a pure function of literals anyway.
_SCURVE_E4: dict[tuple[int, int], list[int]] = {
    (2, 8): [198, 1664, 4032, 6484, 8363, 9439, 9876, 9986, 9999, 9999],
    (4, 4): [0, 20, 155, 586, 1542, 3187, 5445, 7816, 9477, 9988],
    (8, 2): [0, 0, 0, 4, 33, 166, 627, 1902, 4707, 8867],
}


def _scurve_rows() -> list[tuple[int, int, int, int]]:
    return [
        (r, b, k, p)
        for (r, b), ps in _SCURVE_E4.items()
        for k, p in enumerate(ps)
    ]


def _scurve_values_sql() -> str:
    return ", ".join(
        f"({r}, {b}, {k}, {p})" for r, b, k, p in _scurve_rows()
    )


@query(
    "q_minhash_band_tuning",
    oracle=f"""
    WITH ws AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
               || words[i+3] AS sh
        FROM ws, unnest(generate_series(1, greatest(len(words) - 3, 0)))
             AS u(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
    df AS (
        SELECT sh FROM (SELECT sh, count(*) AS nd FROM sh GROUP BY sh)
        WHERE nd BETWEEN 2 AND 20
    ),
    capped AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh)),
    pair AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(count(*) AS BIGINT) AS inter
        FROM capped a JOIN capped b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY da, db
    ),
    jac AS (
        SELECT least(p.inter * 10000
                     // (sa.ns + sb.ns - p.inter) // 1000, 9) AS bucket
        FROM pair p
        JOIN sizes sa ON p.da = sa.doc_id
        JOIN sizes sb ON p.db = sb.doc_id
    ),
    hist AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs
        FROM jac GROUP BY bucket
    ),
    curve AS (
        SELECT * FROM (VALUES {_scurve_values_sql()})
            AS t(r, b, bucket, p_collide_e4)
    )
    SELECT CAST(c.r AS INT) AS r, CAST(c.b AS INT) AS b,
           CAST(c.bucket AS INT) AS bucket,
           coalesce(h.n_pairs, 0) AS n_pairs,
           CAST(c.p_collide_e4 AS BIGINT) AS p_collide_e4,
           CAST(coalesce(h.n_pairs, 0) * c.p_collide_e4 AS BIGINT)
               AS exp_collisions_e4
    FROM curve c LEFT JOIN hist h ON c.bucket = h.bucket
    ORDER BY r, b, bucket
    """,
)
def q_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash band tuning against the corpus's OWN similarity
    distribution: the (r, b) s-curve P = 1−(1−s^r)^b evaluated per
    measured Jaccard decile of the df-capped candidate pairs — the
    decision table that picks banding (steep curve past your dup
    threshold, flat below it) with EXPECTED collisions per bucket,
    not textbook defaults. Pair similarities come from the
    q_doc_knn inverted-index discipline (df cap 2..20 — boilerplate
    shingles never enter the self-join); the curve values are
    driver-precomputed integer literals on BOTH engines, so no
    cross-engine pow() is trusted anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda w: w != F.lit("")
    )
    with_ws = docs.select("doc_id", words.alias("ws"))
    sh = (
        with_ws.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("ws") >= 4,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - 3),
                        lambda i: F.array_join(F.slice("ws", i, 4), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("sh"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("ns"))
    dfc = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("nd"))
        .where((F.col("nd") >= 2) & (F.col("nd") <= 20))
        .select("sh")
    )
    capped = sh.join(dfc, "sh")
    a = capped.select(F.col("doc_id").alias("da"), "sh")
    b = capped.select(F.col("doc_id").alias("db"), "sh")
    pair = (
        a.join(b, "sh")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("ns").alias("nsa"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("ns").alias("nsb"))
    jac = (
        pair.join(sa, "da")
        .join(sb, "db")
        .select(
            F.expr(
                "least(inter * 10000 div (nsa + nsb - inter) div 1000, 9)"
            ).alias("bucket")
        )
    )
    hist = jac.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    curve = spark.createDataFrame(
        _scurve_rows(), "r INT, b INT, bucket INT, p_collide_e4 INT"
    )
    return (
        curve.join(F.broadcast(hist), "bucket", "left")
        .select(
            "r",
            "b",
            "bucket",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.col("p_collide_e4").cast("long").alias("p_collide_e4"),
            F.expr(
                "CAST(coalesce(n_pairs, 0) * p_collide_e4 AS BIGINT)"
            ).alias("exp_collisions_e4"),
        )
        .orderBy("r", "b", "bucket")
    )


# ---------------------------------------------------------------------------
# Second r10 seed batch: SRE/ops observability + training-split
# hygiene. Flip checklist additions (NLJ_OK): q_order_status_flow
# (1-row horizon leg); q_error_budget_burn / q_open_orders_curve use
# post-aggregation day-grain windows (the survival_km discipline —
# bounded by the calendar, not the data volume).
# ---------------------------------------------------------------------------


@query(
    "q_error_budget_burn",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM events GROUP BY d
    ),
    c AS (
        SELECT d, n_events, n_errors,
               CAST(n_errors * 10000 // n_events AS BIGINT) AS day_burn_bp,
               sum(n_errors) OVER w AS cum_err,
               sum(n_events) OVER w AS cum_n
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day_s, n_events, n_errors,
           day_burn_bp,
           CAST(cum_err * 10000 // greatest(cum_n * 2 // 100, 1)
                AS BIGINT) AS cum_used_bp,
           cum_err * 10000 // greatest(cum_n * 2 // 100, 1) > 10000
               AS exhausted
    FROM c
    ORDER BY day_s
    """,
)
def q_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-down against a 2% SLO: per day, the
    error share and the share of the CUMULATIVE budget consumed —
    the page-the-team trigger is the exhausted flag, and the curve's
    slope is the burn rate an alerting policy keys on. One day-grain
    aggregate; the running sums are post-aggregation windows over
    calendar-bounded rows (the survival_km discipline); every number
    is exact integer basis points."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
        )
    )
    w = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)) * 0)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.select(
        "d",
        "n_events",
        "n_errors",
        F.expr("CAST(n_errors * 10000 div n_events AS BIGINT)").alias(
            "day_burn_bp"
        ),
        F.sum("n_errors").over(w).alias("cum_err"),
        F.sum("n_events").over(w).alias("cum_n"),
    )
    return c.select(
        F.date_format("d", "yyyy-MM-dd").alias("day_s"),
        "n_events",
        "n_errors",
        "day_burn_bp",
        F.expr(
            "CAST(cum_err * 10000 div greatest(cum_n * 2 div 100, 1)"
            " AS BIGINT)"
        ).alias("cum_used_bp"),
        F.expr(
            "cum_err * 10000 div greatest(cum_n * 2 div 100, 1) > 10000"
        ).alias("exhausted"),
    ).orderBy("day_s")


@query(
    "q_open_orders_curve",
    oracle="""
    WITH close_d AS (
        SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS cd
        FROM lineitem GROUP BY l_orderkey
    ),
    spans AS (
        SELECT CAST(o.o_orderdate AS DATE) AS od,
               coalesce(c.cd, CAST(o.o_orderdate AS DATE)) AS cd
        FROM orders o LEFT JOIN close_d c ON o.o_orderkey = c.l_orderkey
    ),
    deltas AS (
        SELECT od AS d, CAST(count(*) AS BIGINT) AS delta
        FROM spans GROUP BY od
        UNION ALL
        SELECT cd + to_days(1) AS d, CAST(-count(*) AS BIGINT)
        FROM spans GROUP BY cd
    ),
    byday AS (
        SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM deltas GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day_s, delta,
           CAST(sum(delta) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
    FROM byday
    ORDER BY day_s
    """,
)
def q_open_orders_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-in-progress curve: how many orders are OPEN (placed,
    not yet fully shipped) on each calendar day — the operational
    backlog q_backlog_aging snapshots once, unrolled into its full
    history via the classic +1/−1 boundary sweep: orders contribute
    +1 on the order date, −1 the day after their last line ships,
    and the running sum IS the open count. Boundary events aggregate
    to day grain first, so the prefix sum runs over calendar-bounded
    rows (post-aggregation window), never over orders."""
    close_d = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("cd"))
    )
    spans = (
        load_table(spark, sf_dir, "orders")
        .join(close_d, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            F.col("o_orderdate").cast("date").alias("od"),
            F.coalesce(
                F.col("cd"), F.col("o_orderdate").cast("date")
            ).alias("cd"),
        )
    )
    opens = spans.groupBy(F.col("od").alias("d")).agg(
        F.count("*").cast("long").alias("delta")
    )
    closes = spans.groupBy(F.date_add(F.col("cd"), 1).alias("d")).agg(
        (-F.count("*")).cast("long").alias("delta")
    )
    byday = (
        opens.unionByName(closes)
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    w = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)) * 0)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return byday.select(
        F.date_format("d", "yyyy-MM-dd").alias("day_s"),
        "delta",
        F.sum("delta").over(w).cast("long").alias("n_open"),
    ).orderBy("day_s")


@query(
    "q_order_status_flow",
    oracle="""
    WITH h AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
    b AS (
        SELECT date_diff('day', CAST(o.o_orderdate AS DATE), h.hz) // 90
                   AS age_bucket,
               o.o_orderstatus AS status
        FROM orders o, h
    )
    SELECT CAST(age_bucket AS BIGINT) AS age_bucket, status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) * 10000 //
                sum(count(*)) OVER (PARTITION BY age_bucket) AS BIGINT)
               AS share_bp
    FROM b
    GROUP BY age_bucket, status
    ORDER BY age_bucket, status
    """,
)
def q_order_status_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status mix by order age — the aging-to-completion profile: in
    each 90-day age bucket (measured back from the data's horizon),
    what share of orders is still Open vs Partial vs Finished. A
    monotone F-share by age is the healthy pattern; old buckets with
    stuck 'O' shares are the fulfillment pathology this surfaces.
    One aggregate, a share window over the |buckets × 3| cells, and
    the allowlisted 1-row horizon leg."""
    h = load_table(spark, sf_dir, "orders").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("hz")
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .crossJoin(F.broadcast(h))
        .select(
            F.expr(
                "CAST(datediff(hz, CAST(o_orderdate AS DATE)) div 90"
                " AS BIGINT)"
            ).alias("age_bucket"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    c = b.groupBy("age_bucket", "status").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    return c.select(
        "age_bucket",
        "status",
        "n_orders",
        F.expr(
            "CAST(n_orders * 10000 div sum(n_orders)"
            " OVER (PARTITION BY age_bucket) AS BIGINT)"
        ).alias("share_bp"),
    ).orderBy("age_bucket", "status")


@query(
    "q_split_leakage",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN CAST(('0x' || substr(md5('tt:'
                    || CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) % 10 < 8
                    THEN 'train' ELSE 'test' END AS split,
               substr(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                      1, 40) AS key
        FROM documents
    ),
    p AS (
        SELECT a.lang,
               CASE WHEN a.split <> b.split THEN 1 ELSE 0 END AS crossed,
               CASE WHEN a.split = 'test' THEN a.doc_id
                    WHEN b.split = 'test' THEN b.doc_id END AS test_doc
        FROM d a JOIN d b
          ON a.key = b.key AND a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(crossed) AS BIGINT) AS n_cross,
           CAST(sum(crossed) * 10000 // count(*) AS BIGINT) AS leak_bp,
           CAST(count(DISTINCT CASE WHEN crossed = 1 THEN test_doc END)
                AS BIGINT) AS n_leaky_test_docs
    FROM p
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split contamination audit: near-identical document
    pairs (same 40-char normalized prefix, the sortneighbor key)
    that STRADDLE an md5 80/20 split — each one is a test document
    whose twin sits in training, silently inflating eval scores
    (q_decontaminate removes known test strings; this measures how
    leaky a HASH split is against near-duplication). Pairs exist only
    through the (lang, key) equi-join — blocked, never all-pairs;
    the leak rate and distinct leaky test docs are exact integers."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("tt:"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    10,
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 8,
            "train",
        )
        .otherwise("test")
        .alias("split"),
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""), 1, 40
        ).alias("key"),
    )
    a = d.select(
        "lang", "key", F.col("doc_id").alias("da"), F.col("split").alias("sa")
    )
    b = d.select(
        "lang", "key", F.col("doc_id").alias("db"), F.col("split").alias("sb")
    )
    p = (
        a.join(b, ["lang", "key"])
        .where(F.col("da") < F.col("db"))
        .select(
            "lang",
            F.when(F.col("sa") != F.col("sb"), 1).otherwise(0).alias(
                "crossed"
            ),
            F.when(F.col("sa") == "test", F.col("da"))
            .when(F.col("sb") == "test", F.col("db"))
            .alias("test_doc"),
        )
    )
    return (
        p.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("crossed").cast("long").alias("n_cross"),
            F.expr(
                "CAST(sum(crossed) * 10000 div count(*) AS BIGINT)"
            ).alias("leak_bp"),
            F.countDistinct(
                F.when(F.col("crossed") == 1, F.col("test_doc"))
            )
            .cast("long")
            .alias("n_leaky_test_docs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Third r10 seed batch: finance bridges, fulfilment, marketing
# science, dedup-quality and concentration audits. Flip checklist
# additions (NLJ_OK): q_price_band_migration (1-row year-bounds leg),
# q_power_user_share (1-row totals leg x 3-row pct grid),
# q_markov_attribution (broadcast tiny model legs are equi-joins).
# ---------------------------------------------------------------------------


@query(
    "q_margin_waterfall",
    oracle="""
    WITH l AS (
        SELECT p.p_brand AS brand,
               CAST(floor(l.l_quantity + 0.5) AS BIGINT)
                   * CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                   AS list_cents,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS invoice_cents,
               CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS net_cents,
               CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                          * (1.0 + l.l_tax) * 100 + 0.5) AS BIGINT)
                   AS gross_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT brand,
           CAST(sum(list_cents) AS BIGINT) AS list_cents,
           CAST(sum(invoice_cents) AS BIGINT) AS invoice_cents,
           CAST(sum(invoice_cents) - sum(net_cents) AS BIGINT)
               AS discount_cents,
           CAST(sum(net_cents) AS BIGINT) AS net_cents,
           CAST(sum(gross_cents) - sum(net_cents) AS BIGINT) AS tax_cents,
           CAST(sum(invoice_cents) * 10000 // sum(list_cents) AS BIGINT)
               AS realization_bp
    FROM l
    GROUP BY brand
    ORDER BY brand
    """,
)
def q_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall per brand — list price → invoiced → after
    discount → tax on top: the gross-to-net bridge every CFO deck
    opens with, with the price-realization rate (invoiced/list) that
    flags systematic under-pricing. Discounts and tax are DERIVED as
    exact differences of independently-floored money legs (never
    floor(ext·disc·…) separately — the identity invoice − net =
    discount then holds to the cent by construction). One join, one
    aggregate."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("long")
        .alias("retail_cents"),
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "brand",
            (
                F.floor(F.col("l_quantity") + 0.5).cast("long")
                * F.col("retail_cents")
            ).alias("list_cents"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("invoice_cents"),
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * 100
                + 0.5
            )
            .cast("long")
            .alias("net_cents"),
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
                * 100
                + 0.5
            )
            .cast("long")
            .alias("gross_cents"),
        )
    )
    return (
        l.groupBy("brand")
        .agg(
            F.sum("list_cents").cast("long").alias("list_cents"),
            F.sum("invoice_cents").cast("long").alias("invoice_cents"),
            (F.sum("invoice_cents") - F.sum("net_cents"))
            .cast("long")
            .alias("discount_cents"),
            F.sum("net_cents").cast("long").alias("net_cents"),
            (F.sum("gross_cents") - F.sum("net_cents"))
            .cast("long")
            .alias("tax_cents"),
            F.expr(
                "CAST(sum(invoice_cents) * 10000 div sum(list_cents)"
                " AS BIGINT)"
            ).alias("realization_bp"),
        )
        .orderBy("brand")
    )


@query(
    "q_order_consolidation",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(o.o_orderdate AS DATE) AS d, o.o_orderkey,
               lag(CAST(o.o_orderdate AS DATE)) OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY o.o_orderdate, o.o_orderkey) AS prev_d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    m AS (
        SELECT segment,
               CASE WHEN prev_d IS NULL
                    OR date_diff('day', prev_d, d) > 7
                    THEN 1 ELSE 0 END AS new_shipment
        FROM o
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(new_shipment) AS BIGINT) AS n_shipments,
           CAST(count(*) - sum(new_shipment) AS BIGINT) AS n_saved,
           CAST((count(*) - sum(new_shipment)) * 10000 // count(*)
                AS BIGINT) AS saved_bp
    FROM m
    GROUP BY segment
    ORDER BY segment
    """,
)
def q_order_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-consolidation opportunity: orders within 7 days of a
    customer's previous order could ride the same shipment — chained
    islands per customer (a new shipment starts when the gap from the
    PREVIOUS order exceeds 7 days), so saved = orders − shipments is
    the consolidation headroom logistics quotes against. One keyed
    lag window, one aggregate per segment, exact counts."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .join(c, "o_custkey")
        .select(
            "segment",
            F.col("o_orderdate").cast("date").alias("d"),
            F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_d"),
        )
    )
    m = o.select(
        "segment",
        F.when(
            F.col("prev_d").isNull()
            | (F.datediff(F.col("d"), F.col("prev_d")) > 7),
            1,
        )
        .otherwise(0)
        .alias("new_shipment"),
    )
    return (
        m.groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("new_shipment").cast("long").alias("n_shipments"),
            (F.count("*") - F.sum("new_shipment"))
            .cast("long")
            .alias("n_saved"),
            F.expr(
                "CAST((count(*) - sum(new_shipment)) * 10000 div count(*)"
                " AS BIGINT)"
            ).alias("saved_bp"),
        )
        .orderBy("segment")
    )


@query(
    "q_otif",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderpriority AS priority,
               max(date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))) AS worst_delay
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, priority
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN worst_delay <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_otif,
           CAST(sum(CASE WHEN worst_delay <= 30 THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS otif_bp
    FROM per_order
    GROUP BY priority
    ORDER BY priority
    """,
)
def q_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-in-full: the share of ORDERS whose every line shipped
    within 30 days — the order-level promise (q_sla_attainment scores
    lines; a customer with 9 of 10 lines on time still calls the
    ORDER late, which is why OTIF is the metric supply contracts
    actually write down). The all-lines condition is a per-order max
    delay, one keyed aggregate, then a per-priority rollup."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "priority")
        .agg(
            F.max(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            ).alias("worst_delay")
        )
    )
    return (
        per_order.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.when(F.col("worst_delay") <= 30, 1).otherwise(0))
            .cast("long")
            .alias("n_otif"),
            F.expr(
                "CAST(sum(CASE WHEN worst_delay <= 30 THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("otif_bp"),
        )
        .orderBy("priority")
    )


@query(
    "q_price_band_migration",
    oracle="""
    WITH yrs AS (
        SELECT min(year(CAST(l_shipdate AS DATE))) AS y0,
               max(year(CAST(l_shipdate AS DATE))) AS y1
        FROM lineitem
    ),
    py AS (
        SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS y,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem GROUP BY l_partkey, y
    ),
    b AS (
        SELECT l_partkey, y,
               least(cents // qty // 50000, 9) AS band
        FROM py WHERE qty > 0
    ),
    j AS (
        SELECT a.band AS band_from, c.band AS band_to
        FROM b a JOIN b c ON a.l_partkey = c.l_partkey
        CROSS JOIN yrs
        WHERE a.y = yrs.y0 AND c.y = yrs.y1
    )
    SELECT CAST(band_from AS BIGINT) AS band_from,
           CAST(band_to AS BIGINT) AS band_to,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM j
    GROUP BY band_from, band_to
    ORDER BY band_from, band_to
    """,
)
def q_price_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized-unit-price band migration matrix: for each part sold
    in both the first and last shipping year, which $500 price band
    it moved between — the q_customer_migration shape applied to
    PRICING (off-diagonal mass = repricing; downward drift = margin
    erosion). Unit price never exists as a float: band =
    (Σcents // Σqty) // 50000, all integer division. One part-year
    aggregate, a self equi-join on the part key, and the allowlisted
    1-row year-bounds leg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year(F.col("l_shipdate").cast("date")).alias("y"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
    )
    yrs = li.agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
    py = li.groupBy("l_partkey", "y").agg(
        F.sum("cents").cast("long").alias("cents"),
        F.sum("qty").cast("long").alias("qty"),
    )
    b = py.where(F.col("qty") > 0).select(
        "l_partkey",
        "y",
        F.expr("least(cents div qty div 50000, 9)").alias("band"),
    )
    a = b.select(
        "l_partkey", F.col("y").alias("ya"), F.col("band").alias("band_from")
    )
    c = b.select(
        F.col("l_partkey").alias("pk_b"),
        F.col("y").alias("yb"),
        F.col("band").alias("band_to"),
    )
    j = (
        a.join(c, F.col("l_partkey") == F.col("pk_b"))
        .crossJoin(F.broadcast(yrs))
        .where((F.col("ya") == F.col("y0")) & (F.col("yb") == F.col("y1")))
    )
    return (
        j.groupBy("band_from", "band_to")
        .agg(F.count("*").cast("long").alias("n_parts"))
        .select(
            F.col("band_from").cast("long").alias("band_from"),
            F.col("band_to").cast("long").alias("band_to"),
            "n_parts",
        )
        .orderBy("band_from", "band_to")
    )


@query(
    "q_dup_transitivity",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, n_chars // 100 AS bucket,
               substr(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                      1, 40) AS key
        FROM documents
    ),
    n AS (
        SELECT doc_id, lang, bucket, key,
               lead(doc_id, 1) OVER w AS d1, lead(key, 1) OVER w AS k1,
               lead(doc_id, 2) OVER w AS d2, lead(key, 2) OVER w AS k2
        FROM d
        WINDOW w AS (PARTITION BY lang, bucket ORDER BY key, doc_id)
    ),
    e AS (
        SELECT lang, least(doc_id, d1) AS u, greatest(doc_id, d1) AS v
        FROM n WHERE d1 IS NOT NULL AND levenshtein(key, k1) <= 5
        UNION
        SELECT lang, least(doc_id, d2), greatest(doc_id, d2)
        FROM n WHERE d2 IS NOT NULL AND levenshtein(key, k2) <= 5
    ),
    sym AS (
        SELECT lang, u AS a, v AS m FROM e
        UNION ALL
        SELECT lang, v, u FROM e
    ),
    w AS (
        SELECT x.lang, x.a AS u, x.m, y.a AS w
        FROM sym x JOIN sym y
          ON x.lang = y.lang AND x.m = y.m AND x.a < y.a
    )
    SELECT w.lang,
           CAST((SELECT count(*) FROM e WHERE e.lang = w.lang) AS BIGINT)
               AS n_edges,
           CAST(count(*) AS BIGINT) AS n_wedges,
           CAST(sum(CASE WHEN c.u IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_closed,
           CAST(sum(CASE WHEN c.u IS NULL THEN 0 ELSE 1 END) * 10000
                // count(*) AS BIGINT) AS closure_bp
    FROM w
    LEFT JOIN e c ON c.lang = w.lang AND c.u = w.u AND c.v = w.w
    GROUP BY w.lang
    ORDER BY w.lang
    """,
)
def q_dup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the sorted-neighborhood match graph: if
    a~b and b~c, how often does a~c also match? Low closure means the
    blocking threshold chains UNLIKE documents through intermediates
    — exactly the failure mode that makes a dedup cluster swallow
    half the corpus (q_dedup_clusters computes the clusters; this
    measures whether transitive closure was JUSTIFIED). Edges are the
    SNM w=2 matches; wedges come from one self equi-join on the
    shared middle node; closure is one more equi-join against the
    edge set. All joins keyed; everything integer."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("CAST(n_chars div 100 AS BIGINT)").alias("bucket"),
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""), 1, 40
        ).alias("key"),
    )
    w = Window.partitionBy("lang", "bucket").orderBy("key", "doc_id")
    n = d.select(
        "doc_id",
        "lang",
        "key",
        F.lead("doc_id", 1).over(w).alias("d1"),
        F.lead("key", 1).over(w).alias("k1"),
        F.lead("doc_id", 2).over(w).alias("d2"),
        F.lead("key", 2).over(w).alias("k2"),
    )
    e1 = n.where(
        F.col("d1").isNotNull() & (F.levenshtein("key", "k1") <= 5)
    ).select(
        "lang",
        F.least("doc_id", "d1").alias("u"),
        F.greatest("doc_id", "d1").alias("v"),
    )
    e2 = n.where(
        F.col("d2").isNotNull() & (F.levenshtein("key", "k2") <= 5)
    ).select(
        "lang",
        F.least("doc_id", "d2").alias("u"),
        F.greatest("doc_id", "d2").alias("v"),
    )
    e = e1.unionByName(e2).distinct()
    sym = e.select("lang", F.col("u").alias("a"), F.col("v").alias("m")).unionByName(
        e.select("lang", F.col("v").alias("a"), F.col("u").alias("m"))
    )
    x = sym.select("lang", "m", F.col("a").alias("wu"))
    y = sym.select("lang", "m", F.col("a").alias("ww"))
    wedges = (
        x.join(y, ["lang", "m"])
        .where(F.col("wu") < F.col("ww"))
        .select("lang", "wu", "ww")
    )
    ne = e.groupBy("lang").agg(F.count("*").cast("long").alias("n_edges"))
    closed = e.select(
        "lang", F.col("u").alias("wu"), F.col("v").alias("ww"),
        F.lit(1).alias("is_edge"),
    )
    jw = wedges.join(closed, ["lang", "wu", "ww"], "left")
    stats = jw.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_wedges"),
        F.sum(F.coalesce("is_edge", F.lit(0))).cast("long").alias("n_closed"),
        F.expr(
            "CAST(sum(coalesce(is_edge, 0)) * 10000 div count(*) AS BIGINT)"
        ).alias("closure_bp"),
    )
    return (
        stats.join(F.broadcast(ne), "lang")
        .select("lang", "n_edges", "n_wedges", "n_closed", "closure_bp")
        .orderBy("lang")
    )


@query(
    "q_power_user_share",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM u
    ),
    r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rk
        FROM u
    ),
    grid AS (SELECT unnest([1, 5, 10]) AS pct)
    SELECT CAST(g.pct AS INT) AS pct,
           t.n_users,
           CAST((t.n_users * g.pct + 99) // 100 AS BIGINT) AS top_users,
           CAST(sum(CASE WHEN r.rk <= (t.n_users * g.pct + 99) // 100
                    THEN r.n ELSE 0 END) AS BIGINT) AS top_events,
           t.n_events,
           CAST(sum(CASE WHEN r.rk <= (t.n_users * g.pct + 99) // 100
                    THEN r.n ELSE 0 END) * 10000 // t.n_events AS BIGINT)
               AS share_bp
    FROM r, t, grid g
    GROUP BY g.pct, t.n_users, t.n_events
    ORDER BY pct
    """,
)
def q_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: what share of all events the top
    1% / 5% / 10% most-active users generate — the power-user curve
    that decides whether per-user rate limits, skew salting, and
    cohort sampling are worth building (q_skew_audit finds the single
    hottest key; this measures the whole head). Users rank through
    operators/ranking.global_row_number (range partition + offsets);
    the cut ranks are exact integer ceilings; shares exact bp. The
    totals are the allowlisted 1-row leg crossed with the pct grid."""
    from mapreduce_llm_spark.operators.ranking import global_row_number

    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    r = global_row_number(
        u, [(-F.col("n")).asc(), F.col("user_id").asc()], alias="rk"
    )
    # totals off the operator's materialized output — not a second
    # events scan + per-user rollup (round-14 optimization)
    t = r.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )
    grid = spark.createDataFrame([(1,), (5,), (10,)], "pct INT")
    return (
        r.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(grid))
        .groupBy("pct", "n_users", "n_events")
        .agg(
            F.expr("CAST((n_users * pct + 99) div 100 AS BIGINT)").alias(
                "top_users"
            ),
            F.sum(
                F.when(
                    F.expr("rk <= (n_users * pct + 99) div 100"), F.col("n")
                ).otherwise(0)
            )
            .cast("long")
            .alias("top_events"),
            F.expr(
                "CAST(sum(CASE WHEN rk <= (n_users * pct + 99) div 100"
                " THEN n ELSE 0 END) * 10000 div n_events AS BIGINT)"
            ).alias("share_bp"),
        )
        .select(
            "pct", "n_users", "top_users", "top_events", "n_events",
            "share_bp",
        )
        .orderBy("pct")
    )


@query(
    "q_session_conversion",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        FROM events
    ),
    s AS (
        SELECT user_id, event_type, tus, event_id,
               CASE WHEN tus - lag(tus) OVER w > 1800000000
                    OR lag(tus) OVER w IS NULL THEN 1 ELSE 0 END AS ns
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    sid AS (
        SELECT user_id, event_type,
               sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_no
        FROM s
    ),
    sess AS (
        SELECT user_id, session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM sid GROUP BY user_id, session_no
    ),
    b AS (
        SELECT CASE WHEN n_events = 1 THEN '1'
                    WHEN n_events <= 3 THEN '2-3'
                    WHEN n_events <= 7 THEN '4-7'
                    ELSE '8+' END AS band,
               converted
        FROM sess
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) * 10000 // count(*) AS BIGINT) AS conv_bp
    FROM b
    GROUP BY band
    ORDER BY band
    """,
)
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session depth — do longer sessions convert
    better, or is depth just lostness? The banded curve (1 / 2-3 /
    4-7 / 8+ events) is the product-analytics answer
    (q_entry_exit_matrix shows WHERE sessions end; this shows what
    depth BUYS). Same prefix-sum sessionization, one keyed aggregate
    per session, one 4-cell rollup — exact integers."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = e.select(
        "user_id",
        "event_type",
        "tus",
        "event_id",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > 1800000000)
            | F.lag("tus").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("ns"),
    )
    sid = s.select(
        "user_id",
        "event_type",
        F.sum("ns").over(wc).alias("session_no"),
    )
    sess = sid.groupBy("user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    b = sess.select(
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 7, "4-7")
        .otherwise("8+")
        .alias("band"),
        "converted",
    )
    return (
        b.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.expr(
                "CAST(sum(converted) * 10000 div count(*) AS BIGINT)"
            ).alias("conv_bp"),
        )
        .orderBy("band")
    )


_MATTR_CHANNELS = ["click", "error", "signup", "view"]


def _mattr_sql(steps: int = 8) -> str:
    """Unrolled DuckDB replay of the Markov removal-effect recursion:
    one MATERIALIZED CTE chain per scenario (base + each removed
    channel) — every v{k} is referenced twice per level, so default
    CTE inlining would re-execute exponentially (the pagerank
    lesson). All arithmetic is the e9 fixed-point of
    q_absorption_prob; removal = the state vanishes from the chain
    (no outflow, inflow mass dies)."""
    ctes = [
        """pairs AS MATERIALIZED (
        SELECT user_id, event_type AS s, ts, event_id,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS t
        FROM events)""",
        """tr AS MATERIALIZED (
        SELECT s, t, CAST(count(*) AS BIGINT) AS n
        FROM pairs WHERE t IS NOT NULL AND s <> 'purchase'
        GROUP BY s, t)""",
        """cs AS MATERIALIZED (
        SELECT s, CAST(sum(n) AS BIGINT) AS n_out FROM tr GROUP BY s)""",
        """p AS MATERIALIZED (
        SELECT tr.s, tr.t, tr.n * 1000000000 // cs.n_out AS p_e9
        FROM tr JOIN cs ON tr.s = cs.s)""",
        """fr AS MATERIALIZED (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)""",
        """wts AS MATERIALIZED (
        SELECT event_type AS s, CAST(count(*) AS BIGINT) AS w
        FROM fr WHERE rn = 1 AND event_type <> 'purchase'
        GROUP BY s)""",
    ]
    scenarios = [("base", None)] + [(c, c) for c in _MATTR_CHANNELS]
    for tag, removed in scenarios:
        excl = f"AND s <> '{removed}' AND t <> '{removed}'" if removed else ""
        excl_s = f"WHERE cs.s <> '{removed}'" if removed else ""
        ctes.append(
            f"""p_{tag} AS MATERIALIZED (
        SELECT s, t, p_e9 FROM p WHERE TRUE {excl})"""
        )
        ctes.append(
            f"""pa_{tag} AS MATERIALIZED (
        SELECT cs.s, coalesce(ab.p_e9, 0) AS p_abs_e9
        FROM cs LEFT JOIN (SELECT s, p_e9 FROM p_{tag}
                           WHERE t = 'purchase') ab ON cs.s = ab.s
        {excl_s})"""
        )
        ctes.append(
            f"v_{tag}_0 AS MATERIALIZED (SELECT s, CAST(0 AS BIGINT) AS v"
            f" FROM pa_{tag})"
        )
        for k in range(steps):
            ctes.append(
                f"""v_{tag}_{k + 1} AS MATERIALIZED (
        SELECT pa.s, pa.p_abs_e9 + coalesce(t.acc, 0) AS v
        FROM pa_{tag} pa LEFT JOIN (
            SELECT p.s, sum(p.p_e9 * vv.v) // 1000000000 AS acc
            FROM p_{tag} p JOIN v_{tag}_{k} vv ON p.t = vv.s
            WHERE p.t <> 'purchase'
            GROUP BY p.s) t ON pa.s = t.s)"""
            )
        ctes.append(
            f"""ov_{tag} AS MATERIALIZED (
        SELECT CAST(sum(wts.w * coalesce(vv.v, 0)) // sum(wts.w)
                    AS BIGINT) AS pov
        FROM wts LEFT JOIN v_{tag}_{steps} vv ON wts.s = vv.s)"""
        )
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS removed_state, ob.pov AS p_base_e9,"
        f" oc.pov AS p_removed_e9, ob.pov - oc.pov AS effect_e9"
        f" FROM ov_base ob, ov_{c} oc"
        for c in _MATTR_CHANNELS
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    {arms}
    ORDER BY removed_state
    """
    )


@query("q_markov_attribution", oracle=_mattr_sql())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven
    alternative to positional credit (q_attribution_position): a
    channel's worth is how much overall 8-step conversion DROPS when
    every journey touching it dies there (remove the state; inflow
    mass converts to nothing). Overall conversion is the
    start-state-weighted absorption probability (weights = each
    user's first event type). Every scenario reuses
    q_absorption_prob's e9 fixed-point recursion — bit-identical
    integer arithmetic on both engines, 5 tiny chains (base + 4
    removals) of broadcast-scale joins; the DuckDB twin unrolls all
    5 × 8 MATERIALIZED CTE levels. Law pinned cross-query: the base
    chain's per-state vector equals q_absorption_prob exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    )
    tr = (
        pairs.where(F.col("t").isNotNull() & (F.col("s") != "purchase"))
        .groupBy("s", "t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    cs = tr.groupBy("s").agg(F.sum("n").cast("long").alias("n_out"))
    p_all = (
        tr.join(cs, "s")
        .select("s", "t", F.expr("n * 1000000000 div n_out").alias("p_e9"))
        .localCheckpoint(eager=True)
    )
    cs = cs.localCheckpoint(eager=True)
    wts = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where((F.col("rn") == 1) & (F.col("event_type") != "purchase"))
        .groupBy(F.col("event_type").alias("s"))
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )

    def overall(removed: str | None) -> DataFrame:
        p = p_all
        states = cs.select("s")
        if removed is not None:
            p = p.where((F.col("s") != removed) & (F.col("t") != removed))
            states = states.where(F.col("s") != removed)
        pa = (
            states.join(
                p.where(F.col("t") == "purchase").select(
                    "s", F.col("p_e9").alias("p_abs_e9")
                ),
                "s",
                "left",
            )
            .select("s", F.coalesce("p_abs_e9", F.lit(0)).alias("p_abs_e9"))
            .localCheckpoint(eager=True)
        )
        pn = p.where(F.col("t") != "purchase").localCheckpoint(eager=True)
        v = pa.select("s", F.lit(0).cast("long").alias("v"))
        for _ in range(8):
            acc = (
                pn.join(
                    v.select(F.col("s").alias("t"), F.col("v").alias("vt")),
                    "t",
                )
                .groupBy("s")
                .agg(F.expr("sum(p_e9 * vt) div 1000000000").alias("acc"))
            )
            v = pa.join(F.broadcast(acc), "s", "left").select(
                "s",
                (F.col("p_abs_e9") + F.coalesce("acc", F.lit(0))).alias("v"),
            )
        return (
            wts.join(v, "s", "left")
            .agg(
                F.expr(
                    "CAST(sum(w * coalesce(v, 0)) div sum(w) AS BIGINT)"
                ).alias("pov")
            )
            .localCheckpoint(eager=True)
        )

    base = overall(None)
    arms = None
    for c in _MATTR_CHANNELS:
        arm = (
            base.crossJoin(overall(c).select(F.col("pov").alias("pov_r")))
            .select(
                F.lit(c).alias("removed_state"),
                F.col("pov").alias("p_base_e9"),
                F.col("pov_r").alias("p_removed_e9"),
                (F.col("pov") - F.col("pov_r")).alias("effect_e9"),
            )
        )
        arms = arm if arms is None else arms.unionByName(arm)
    return arms.orderBy("removed_state")


# ---------------------------------------------------------------------------
# Fourth r10 seed batch: LM-eval generalization, tokenizer-prep
# coverage, vector-geometry QA, forensic digit audits, returns abuse,
# duplicate lines, quarter-end linearity. Flip checklist additions
# (NLJ_OK): q_vocab_coverage_curve (1-row totals leg x 3-row k grid),
# q_lm_generalization_gap (1-row train-vocab leg),
# q_last_digit_uniformity (1-row chi-square totals leg),
# q_embed_isotropy (1-row corpus-moments leg).
# ---------------------------------------------------------------------------


@query(
    "q_lm_generalization_gap",
    oracle="""
    WITH ws AS (
        SELECT doc_id, doc_id % 2 AS half,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    bg AS (
        SELECT half, words[i] AS a, words[i + 1] AS b
        FROM ws, unnest(generate_series(1, greatest(len(words) - 1, 0)))
             AS u(i)
    ),
    c2 AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n2
        FROM bg WHERE half = 0 GROUP BY a, b
    ),
    c1 AS (
        SELECT a, CAST(count(*) AS BIGINT) AS n1
        FROM bg WHERE half = 0 GROUP BY a
    ),
    vv AS (
        SELECT CAST(count(DISTINCT a) AS BIGINT) AS v
        FROM bg WHERE half = 0
    ),
    scored AS (
        SELECT bg.half,
               ln((coalesce(c2.n2, 0) + 1.0)
                  / (coalesce(c1.n1, 0) + vv.v + 1.0)) AS logp
        FROM bg
        LEFT JOIN c2 ON bg.a = c2.a AND bg.b = c2.b
        LEFT JOIN c1 ON bg.a = c1.a
        CROSS JOIN vv
    )
    SELECT CASE WHEN half = 0 THEN 'train' ELSE 'heldout' END AS split,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-sum(logp) / count(*), 4) + 0.0 AS mean_nll
    FROM scored
    GROUP BY split
    ORDER BY split
    """,
)
def q_lm_generalization_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model generalization gap: an add-1 bigram LM trained
    on the doc-parity 'train' half, scored on BOTH halves — heldout
    mean NLL minus train mean NLL is the memorization-vs-
    generalization number every data-mixture decision watches
    (q_bigram_perplexity scores the corpus on itself; without a
    held-out split that number only measures memorization). The
    model is two count aggregates + a 1-row vocab leg; scoring is
    two broadcast-able equi-joins; the mean NLL is the round4-safe
    ln class."""
    ws = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("half"),
        _r10_words(F.col("text")).alias("words"),
    )
    bg = ws.select(
        "half",
        F.posexplode(
            F.when(
                F.size("words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.struct(
                        F.element_at("words", i).alias("a"),
                        F.element_at("words", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("pos", "p"),
    ).select("half", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    train = bg.where(F.col("half") == 0)
    c2 = train.groupBy("a", "b").agg(F.count("*").cast("long").alias("n2"))
    c1 = train.groupBy("a").agg(F.count("*").cast("long").alias("n1"))
    vv = train.agg(F.countDistinct("a").cast("long").alias("v"))
    scored = (
        bg.join(c2, ["a", "b"], "left")
        .join(c1, "a", "left")
        .crossJoin(F.broadcast(vv))
        .select(
            "half",
            F.expr(
                "ln((coalesce(n2, 0) + 1.0)"
                " / (coalesce(n1, 0) + v + 1.0))"
            ).alias("logp"),
        )
    )
    return (
        scored.groupBy(
            F.when(F.col("half") == 0, "train")
            .otherwise("heldout")
            .alias("split")
        )
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("round(-sum(logp) / count(*), 4) + 0.0").alias(
                "mean_nll"
            ),
        )
        .orderBy("split")
    )


@query(
    "q_vocab_coverage_curve",
    oracle="""
    WITH toks AS (
        SELECT w
        FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
                  AS w FROM documents)
        WHERE w <> ''
    ),
    vc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY w),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(n) AS BIGINT) AS total_tokens
        FROM vc
    ),
    r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rk FROM vc
    ),
    grid AS (SELECT unnest([100, 1000, 10000]) AS k)
    SELECT CAST(g.k AS INT) AS k, t.vocab_size, t.total_tokens,
           CAST(sum(CASE WHEN r.rk <= g.k THEN r.n ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(sum(CASE WHEN r.rk <= g.k THEN r.n ELSE 0 END) * 10000
                // t.total_tokens AS BIGINT) AS coverage_bp
    FROM r, t, grid g
    GROUP BY g.k, t.vocab_size, t.total_tokens
    ORDER BY k
    """,
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — what share of all tokens a
    top-100 / top-1000 / top-10000 word vocabulary covers: THE
    sizing input for tokenizer vocab budgets and OOV-rate estimates
    (q_vocab_coverage checks one fixed vocabulary; this sweeps the
    budget). Word ranks go through
    operators/ranking.global_row_number over the vocab aggregate
    (vocabulary-sized, but at web scale still too wide for one
    task); the totals are the allowlisted 1-row leg crossed with the
    3-row budget grid."""
    from mapreduce_llm_spark.operators.ranking import global_row_number

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(_r10_words(F.col("text"))).alias("w")
    )
    vc = toks.groupBy("w").agg(F.count("*").cast("long").alias("n"))
    r = global_row_number(
        vc, [(-F.col("n")).asc(), F.col("w").asc()], alias="rk"
    )
    # totals off the operator's materialized output — not a second
    # tokenize + vocab rollup pass (round-14 optimization)
    t = r.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum("n").cast("long").alias("total_tokens"),
    )
    grid = spark.createDataFrame([(100,), (1000,), (10000,)], "k INT")
    return (
        r.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(grid))
        .groupBy("k", "vocab_size", "total_tokens")
        .agg(
            F.sum(
                F.when(F.col("rk") <= F.col("k"), F.col("n")).otherwise(0)
            )
            .cast("long")
            .alias("covered_tokens"),
            F.expr(
                "CAST(sum(CASE WHEN rk <= k THEN n ELSE 0 END) * 10000"
                " div total_tokens AS BIGINT)"
            ).alias("coverage_bp"),
        )
        .select(
            "k", "vocab_size", "total_tokens", "covered_tokens",
            "coverage_bp",
        )
        .orderBy("k")
    )


@query(
    "q_embed_isotropy",
    oracle="""
    WITH q AS (
        SELECT vec_id, label, dim, qv
        FROM (
            SELECT vec_id, label,
                   unnest(generate_series(1, len(embedding))) AS dim,
                   unnest(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                       AS qv
            FROM embeddings
        )
    ),
    per_label AS (
        SELECT label, dim,
               CAST(sum(qv) AS BIGINT) AS s,
               CAST(sum(qv * qv) AS BIGINT) AS s2,
               CAST(count(DISTINCT vec_id) AS BIGINT) AS n
        FROM q GROUP BY label, dim
    ),
    m AS (
        SELECT label, max(n) AS n,
               sum(CAST(s AS HUGEINT) * s) AS mean2_num,
               CAST(sum(s2) AS BIGINT) AS sum_norm2
        FROM per_label GROUP BY label
    )
    SELECT CAST(label AS INT) AS label, CAST(n AS BIGINT) AS n_vecs,
           CAST(mean2_num * 1000000 // (n * sum_norm2) AS BIGINT)
               AS anisotropy_e6
    FROM m
    ORDER BY label
    """,
)
def q_embed_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy per label — ‖Σx‖²/(n·Σ‖x‖²) in exact e6:
    0 means the cloud is centered (cosine similarity is
    discriminative), → 1e6 means every vector points the same way
    (the 'anisotropy problem' that makes cosine search return
    everything; the standard fix is mean-centering, and THIS is the
    number that says whether you need it). Integer-exact end to end:
    per-dim sums in int64, the squared-sum accumulation on
    HUGEINT/DECIMAL(38,0), one 128-bit integer division."""
    q = _r9_qdims_local(spark, sf_dir)
    per_label = q.groupBy("label", "dim").agg(
        F.sum("qv").cast("long").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("s2"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    m = per_label.groupBy("label").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s")).alias("mean2_num"),
        F.sum("s2").cast("long").alias("sum_norm2"),
    )
    return m.select(
        F.col("label").cast("int").alias("label"),
        F.col("n").cast("long").alias("n_vecs"),
        F.expr(
            "CAST(mean2_num * 1000000 div (n * sum_norm2) AS BIGINT)"
        ).alias("anisotropy_e6"),
    ).orderBy("label")


def _r9_qdims_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3-quantized (vec_id, label, dim, qv) — the q_kmeans_step idiom."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1000).cast("long").alias("qv"),
    )


@query(
    "q_last_digit_uniformity",
    oracle="""
    WITH d AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 10
                   AS digit
        FROM orders
    ),
    c AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
        FROM d GROUP BY digit
    ),
    t AS (
        SELECT CAST(sum(n_orders) AS BIGINT) AS total,
               CAST((10 * sum(n_orders * n_orders)
                     - sum(n_orders) * sum(n_orders)) * 10000
                    // sum(n_orders) AS BIGINT) AS chi2_e4
        FROM c
    )
    SELECT CAST(c.digit AS INT) AS digit, c.n_orders,
           CAST(c.n_orders * 10000 // t.total AS BIGINT) AS share_bp,
           t.chi2_e4,
           t.chi2_e4 > 169190 AS biased
    FROM c, t
    ORDER BY digit
    """,
)
def q_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity — the forensic companion to q_benford:
    first digits follow Benford, but LAST digits of genuine amounts
    are uniform, and humans inventing numbers can't fake that
    (Nigrini's digit tests). χ² against uniform collapses to the
    integer identity (k·Σn² − N²)/N, emitted e4 and compared to the
    df=9, α=0.05 critical value 16.919 as a pure integer — no float
    anywhere. One aggregate + the allowlisted 1-row totals leg."""
    d = load_table(spark, sf_dir, "orders").select(
        (F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") % 10).alias(
            "digit"
        )
    )
    c = d.groupBy("digit").agg(F.count("*").cast("long").alias("n_orders"))
    t = c.agg(
        F.sum("n_orders").cast("long").alias("total"),
        F.expr(
            "CAST((10 * sum(n_orders * n_orders)"
            " - sum(n_orders) * sum(n_orders)) * 10000"
            " div sum(n_orders) AS BIGINT)"
        ).alias("chi2_e4"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("digit").cast("int").alias("digit"),
            "n_orders",
            F.expr("CAST(n_orders * 10000 div total AS BIGINT)").alias(
                "share_bp"
            ),
            "chi2_e4",
            (F.col("chi2_e4") > 169190).alias("biased"),
        )
        .orderBy("digit")
    )


@query(
    "q_returner_screen",
    oracle="""
    WITH per_cust AS (
        SELECT o.o_custkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned,
               CAST(sum(CASE WHEN l.l_returnflag = 'R'
                        THEN CAST(floor(l.l_extendedprice
                             * (1.0 - l.l_discount) * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS returned_cents
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey
    )
    SELECT o_custkey, n_lines, n_returned,
           CAST(n_returned * 10000 // n_lines AS BIGINT) AS return_bp,
           returned_cents
    FROM per_cust
    WHERE n_lines >= 8 AND n_returned * 10000 // n_lines >= 5000
    ORDER BY return_bp DESC, returned_cents DESC, o_custkey
    LIMIT 25
    """,
)
def q_returner_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serial-returner screen: customers at volume (8+ lines) whose
    return share exceeds 50%, ranked by rate then refunded value —
    the refund-abuse triage queue (q_return_affinity measures the
    corpus rate; abuse is a PER-ACTOR tail phenomenon). One join,
    one keyed aggregate, an integer filter, TakeOrdered top-25 with
    full tie-break."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        load_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.floor(
                        F.col("l_extendedprice")
                        * (F.lit(1.0) - F.col("l_discount"))
                        * 100
                        + 0.5
                    ).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("returned_cents"),
        )
    )
    return (
        per_cust.where(
            (F.col("n_lines") >= 8)
            & (F.expr("n_returned * 10000 div n_lines >= 5000"))
        )
        .select(
            "o_custkey",
            "n_lines",
            "n_returned",
            F.expr("CAST(n_returned * 10000 div n_lines AS BIGINT)").alias(
                "return_bp"
            ),
            "returned_cents",
        )
        .orderBy(
            F.col("return_bp").desc(),
            F.col("returned_cents").desc(),
            "o_custkey",
        )
        .limit(25)
    )


@query(
    "q_dup_lines",
    oracle="""
    WITH g AS (
        SELECT l_orderkey, l_partkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_qty,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        FROM lineitem
        GROUP BY l_orderkey, l_partkey
        HAVING count(*) > 1
    )
    SELECT l_orderkey, l_partkey, n_lines, total_qty, n_suppliers,
           n_suppliers < n_lines AS same_supplier_dup
    FROM g
    ORDER BY l_orderkey, l_partkey
    """,
)
def q_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-line audit: orders carrying the SAME part on
    multiple lines — legitimate when split across suppliers,
    suspicious when the same supplier appears twice (double-keyed
    entry, the AP-side twin of q_dup_invoice's double payment). One
    keyed aggregate with HAVING; the same-supplier flag is a
    distinct-count comparison, all integer."""
    g = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long"))
            .cast("long")
            .alias("total_qty"),
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        )
        .where(F.col("n_lines") > 1)
    )
    return g.select(
        "l_orderkey",
        "l_partkey",
        "n_lines",
        "total_qty",
        "n_suppliers",
        (F.col("n_suppliers") < F.col("n_lines")).alias("same_supplier_dup"),
    ).orderBy("l_orderkey", "l_partkey")


@query(
    "q_quarter_linearity",
    oracle="""
    WITH m AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS y,
               quarter(CAST(o_orderdate AS DATE)) AS q,
               (month(CAST(o_orderdate AS DATE)) - 1) % 3 + 1 AS moq,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY y, q, moq
    ),
    p AS (
        SELECT y, q,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN moq = 1 THEN cents ELSE 0 END) * 10000
                    // sum(cents) AS BIGINT) AS m1_bp,
               CAST(sum(CASE WHEN moq = 2 THEN cents ELSE 0 END) * 10000
                    // sum(cents) AS BIGINT) AS m2_bp,
               CAST(sum(CASE WHEN moq = 3 THEN cents ELSE 0 END) * 10000
                    // sum(cents) AS BIGINT) AS m3_bp
        FROM m GROUP BY y, q
    )
    SELECT CAST(y AS INT) || '-Q' || CAST(q AS VARCHAR) AS yq,
           total_cents, m1_bp, m2_bp, m3_bp,
           m3_bp > 4000 AS hockeystick
    FROM p
    ORDER BY yq
    """,
)
def q_quarter_linearity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-end linearity audit: each quarter's revenue split
    across its three months — a persistent month-3 spike past 40% is
    the 'hockeystick' pattern auditors read as pull-forward /
    channel stuffing (the revenue-recognition risk flag). One
    month-grain aggregate rolled to quarters; shares in exact basis
    points."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y"),
            F.quarter(F.col("o_orderdate").cast("date")).alias("q"),
            (
                (F.month(F.col("o_orderdate").cast("date")) - 1) % 3 + 1
            ).alias("moq"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    p = m.groupBy("y", "q").agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr(
            "CAST(sum(CASE WHEN moq = 1 THEN cents ELSE 0 END) * 10000"
            " div sum(cents) AS BIGINT)"
        ).alias("m1_bp"),
        F.expr(
            "CAST(sum(CASE WHEN moq = 2 THEN cents ELSE 0 END) * 10000"
            " div sum(cents) AS BIGINT)"
        ).alias("m2_bp"),
        F.expr(
            "CAST(sum(CASE WHEN moq = 3 THEN cents ELSE 0 END) * 10000"
            " div sum(cents) AS BIGINT)"
        ).alias("m3_bp"),
    )
    return p.select(
        F.concat(
            F.col("y").cast("string"), F.lit("-Q"), F.col("q").cast("string")
        ).alias("yq"),
        "total_cents",
        "m1_bp",
        "m2_bp",
        "m3_bp",
        (F.col("m3_bp") > 4000).alias("hockeystick"),
    ).orderBy("yq")


def _r10_words(col):
    """Lowercased alpha word array — the shared tokenization of the
    text queries (resolved at call time, used by the batch above)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda w: w != F.lit("")
    )


# ---------------------------------------------------------------------------
# Fifth r10 seed batch: feature screening, embedding-quality purity,
# behavioral diversity, pricing fairness, supplier variability, and
# user-level growth accounting. Flip checklist additions (NLJ_OK):
# q_leakage_scan (1-row cutoff + totals legs), q_user_diversity
# (none), q_knn_label_purity (pairs are dim-blocked over a 1-in-50
# sample — the documented capped brute-force class).
# ---------------------------------------------------------------------------


@query(
    "q_nzv_screen",
    oracle="""
    WITH vals AS (
        SELECT 'l_quantity' AS col_name, CAST(l_quantity AS VARCHAR) AS v
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(l_tax AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', l_returnflag FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', l_linestatus FROM lineitem
    ),
    c AS (
        SELECT col_name, v, CAST(count(*) AS BIGINT) AS n
        FROM vals GROUP BY col_name, v
    ),
    s AS (
        SELECT col_name,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS ndv,
               CAST(max(n) AS BIGINT) AS mode_n
        FROM c GROUP BY col_name
    )
    SELECT col_name, n_rows, ndv,
           CAST(mode_n * 10000 // n_rows AS BIGINT) AS mode_bp,
           ndv = 1 OR mode_n * 10000 // n_rows >= 9500 AS near_zero_var
    FROM s
    ORDER BY col_name
    """,
)
def q_nzv_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-zero-variance feature screen (caret's nearZeroVar): per
    candidate feature column, cardinality and the modal value's share
    — a column that is one value 95% of the time carries almost no
    signal and breaks CV folds, and this is the screen that drops it
    before any model sees it. Columns stack into a value-level
    unpivot; one (col, value) aggregate and one per-column rollup,
    all integer."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.expr(
            "stack(5,"
            " 'l_quantity', CAST(l_quantity AS STRING),"
            " 'l_discount', CAST(l_discount AS STRING),"
            " 'l_tax', CAST(l_tax AS STRING),"
            " 'l_returnflag', l_returnflag,"
            " 'l_linestatus', l_linestatus) AS (col_name, v)"
        )
    )
    c = vals.groupBy("col_name", "v").agg(F.count("*").cast("long").alias("n"))
    s = c.groupBy("col_name").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("ndv"),
        F.max("n").cast("long").alias("mode_n"),
    )
    return s.select(
        "col_name",
        "n_rows",
        "ndv",
        F.expr("CAST(mode_n * 10000 div n_rows AS BIGINT)").alias("mode_bp"),
        F.expr(
            "ndv = 1 OR mode_n * 10000 div n_rows >= 9500"
        ).alias("near_zero_var"),
    ).orderBy("col_name")


@query(
    "q_leakage_scan",
    oracle="""
    WITH horizon AS (
        SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff FROM orders
    ),
    obs AS (
        SELECT o.o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders_obs,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS spend_cents,
               CAST(date_diff('day', max(CAST(o.o_orderdate AS DATE)),
                              CAST(h.cutoff AS DATE)) AS BIGINT)
                   AS days_inactive
        FROM orders o, horizon h
        WHERE o.o_custkey % 10 = 0 AND o.o_orderdate <= h.cutoff
        GROUP BY o.o_custkey, h.cutoff
    ),
    lab AS (
        SELECT obs.*,
               CASE WHEN f.o_custkey IS NULL THEN 1 ELSE 0 END AS churned
        FROM obs LEFT JOIN (
            SELECT DISTINCT o.o_custkey FROM orders o, horizon h
            WHERE o.o_custkey % 10 = 0 AND o.o_orderdate > h.cutoff) f
          ON obs.o_custkey = f.o_custkey
    ),
    feats AS (
        SELECT 'n_orders_obs' AS feature, n_orders_obs AS x, churned AS y
        FROM lab
        UNION ALL SELECT 'spend_cents', spend_cents, churned FROM lab
        UNION ALL SELECT 'days_inactive', days_inactive, churned FROM lab
    ),
    m AS (
        SELECT feature,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sx2,
               CAST(sum(y * y) AS BIGINT) AS sy2
        FROM feats GROUP BY feature
    )
    SELECT feature, n AS n_customers,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                               - CAST(sx AS DOUBLE) * sx)
                          * sqrt(CAST(n AS DOUBLE) * sy2
                                 - CAST(sy AS DOUBLE) * sy), 0.0), 4)
               + 0.0 AS corr_label,
           abs(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                               - CAST(sx AS DOUBLE) * sx)
                          * sqrt(CAST(n AS DOUBLE) * sy2
                                 - CAST(sy AS DOUBLE) * sy), 0.0), 4))
               >= 0.8 AS suspicious
    FROM m
    ORDER BY feature
    """,
)
def q_leakage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-leakage scan over the churn-label feature set: the
    point-biserial correlation of each observation-window feature
    with the outcome label — a feature correlating ≥ 0.8 with a
    label it is supposed to PREDICT almost always means outcome
    information leaked into the feature window (q_churn_label builds
    the wall; this checks nothing climbed over it). Integer moments
    (Σx² on HUGEINT — spend cents square), one round4 corr chain per
    feature, suspicious flagged on the ROUNDED value so the flag is
    hash-stable."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("cutoff")
    )
    oc = (
        o.where(F.col("o_custkey") % 10 == 0)
        .crossJoin(F.broadcast(horizon))
    )
    obs = (
        oc.where(F.col("o_orderdate") <= F.col("cutoff"))
        .groupBy("o_custkey", "cutoff")
        .agg(
            F.count("*").cast("long").alias("n_orders_obs"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("spend_cents"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
        .select(
            "o_custkey",
            "n_orders_obs",
            "spend_cents",
            F.datediff(F.col("cutoff").cast("date"), F.col("last_d"))
            .cast("long")
            .alias("days_inactive"),
        )
    )
    fut = (
        oc.where(F.col("o_orderdate") > F.col("cutoff"))
        .select("o_custkey")
        .distinct()
        .withColumn("hf", F.lit(1))
    )
    lab = obs.join(fut, "o_custkey", "left").withColumn(
        "churned", F.when(F.col("hf").isNull(), 1).otherwise(0)
    )
    feats = lab.select(
        F.expr(
            "stack(3,"
            " 'n_orders_obs', n_orders_obs,"
            " 'spend_cents', spend_cents,"
            " 'days_inactive', days_inactive) AS (feature, x)"
        ),
        F.col("churned").alias("y"),
    )
    m = feats.groupBy("feature").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    corr = (
        "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * sx)"
        " * sqrt(CAST(n AS DOUBLE) * sy2"
        " - CAST(sy AS DOUBLE) * sy), 0.0), 4) + 0.0"
    )
    return m.select(
        "feature",
        F.col("n").alias("n_customers"),
        F.expr(corr).alias("corr_label"),
        F.expr(f"abs({corr}) >= 0.8").alias("suspicious"),
    ).orderBy("feature")


@query(
    "q_user_diversity",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ),
    d AS (
        SELECT user_id,
               CAST(sum(n) AS BIGINT) AS total,
               CAST(sum(n * (n - 1)) * 10000
                    // (sum(n) * (sum(n) - 1)) AS BIGINT) AS simpson_e4
        FROM c GROUP BY user_id
        HAVING sum(n) >= 5
    ),
    b AS (
        SELECT CASE WHEN simpson_e4 >= 7500 THEN 'concentrated'
                    WHEN simpson_e4 >= 2500 THEN 'mixed'
                    ELSE 'diverse' END AS band,
               simpson_e4
        FROM d
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(simpson_e4) // count(*) AS BIGINT) AS mean_simpson_e4
    FROM b
    GROUP BY band
    ORDER BY band
    """,
)
def q_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user — Simpson concentration of each
    user's event-type mix (Σnᵢ(nᵢ−1)/(n(n−1)), integer-exact e4),
    banded into diverse / mixed / concentrated: single-action users
    (concentrated) are automation candidates and personalization
    dead-ends, the user-level twin of q_doc_simpson's corpus view.
    Two keyed aggregates; the n ≥ 5 volume floor keeps the statistic
    defined."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    d = (
        c.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("total"),
            F.expr(
                "CAST(sum(n * (n - 1)) * 10000"
                " div (sum(n) * (sum(n) - 1)) AS BIGINT)"
            ).alias("simpson_e4"),
        )
        .where(F.col("total") >= 5)
    )
    b = d.select(
        F.when(F.col("simpson_e4") >= 7500, "concentrated")
        .when(F.col("simpson_e4") >= 2500, "mixed")
        .otherwise("diverse")
        .alias("band"),
        "simpson_e4",
    )
    return (
        b.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.expr("CAST(sum(simpson_e4) div count(*) AS BIGINT)").alias(
                "mean_simpson_e4"
            ),
        )
        .orderBy("band")
    )


@query(
    "q_price_fairness",
    oracle="""
    WITH g AS (
        SELECT l.l_partkey,
               CAST(l.l_shipdate AS DATE) AS d,
               CAST(count(DISTINCT CAST(floor(l.l_discount * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS n_discounts,
               CAST(max(CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                    - min(CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS spread_e2
        FROM lineitem l
        GROUP BY l.l_partkey, d
    )
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_part_days,
           CAST(sum(CASE WHEN g.n_discounts > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_multi,
           CAST(sum(CASE WHEN g.n_discounts > 1 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS multi_bp,
           CAST(max(g.spread_e2) AS BIGINT) AS max_spread_e2
    FROM g JOIN part p ON g.l_partkey = p.p_partkey
    GROUP BY brand
    ORDER BY brand
    """,
)
def q_price_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-fairness audit: the same part, the same shipping day,
    DIFFERENT discounts — the inconsistent-pricing pattern that
    triggers most-favored-customer clause violations and churn when
    customers compare notes. Per brand: the share of part-days with
    more than one distinct discount and the worst same-day spread in
    exact e2 points. One (part, day) aggregate, one brand rollup."""
    g = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.col("l_shipdate").cast("date").alias("d"),
            F.floor(F.col("l_discount") * 100 + 0.5)
            .cast("long")
            .alias("disc_e2"),
        )
        .groupBy("l_partkey", "d")
        .agg(
            F.countDistinct("disc_e2").cast("long").alias("n_discounts"),
            (F.max("disc_e2") - F.min("disc_e2"))
            .cast("long")
            .alias("spread_e2"),
        )
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    return (
        g.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_part_days"),
            F.sum(F.when(F.col("n_discounts") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_multi"),
            F.expr(
                "CAST(sum(CASE WHEN n_discounts > 1 THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("multi_bp"),
            F.max("spread_e2").cast("long").alias("max_spread_e2"),
        )
        .orderBy("brand")
    )


@query(
    "q_supplier_variability",
    oracle="""
    WITH d AS (
        SELECT l.l_suppkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    m AS (
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(delay) AS BIGINT) AS sd,
               CAST(sum(delay * delay) AS BIGINT) AS sd2
        FROM d GROUP BY l_suppkey
        HAVING count(*) >= 20 AND sum(delay) > 0
    )
    SELECT l_suppkey, n_lines,
           CAST(sd // n_lines AS BIGINT) AS mean_delay_days,
           CAST((n_lines * sd2 - sd * sd) * 10000 // (sd * sd) AS BIGINT)
               AS cv2_e4
    FROM m
    ORDER BY cv2_e4 DESC, l_suppkey
    LIMIT 10
    """,
)
def q_supplier_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time VARIABILITY ranking — procurement's risk
    metric is not the mean delay (q_otif scores that) but its
    squared coefficient of variation: an erratic supplier forces
    safety stock even when fast on average. Day-grain integer
    moments keep cv²_e4 pure int64 (the q_subscription_detect
    arithmetic); top-10 most erratic at volume, TakeOrdered with key
    tie-break."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_suppkey",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("delay"),
        )
    )
    m = (
        d.groupBy("l_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("delay").cast("long").alias("sd"),
            F.sum(F.col("delay") * F.col("delay")).cast("long").alias("sd2"),
        )
        .where((F.col("n_lines") >= 20) & (F.col("sd") > 0))
    )
    return (
        m.select(
            "l_suppkey",
            "n_lines",
            F.expr("CAST(sd div n_lines AS BIGINT)").alias("mean_delay_days"),
            F.expr(
                "CAST((n_lines * sd2 - sd * sd) * 10000 div (sd * sd)"
                " AS BIGINT)"
            ).alias("cv2_e4"),
        )
        .orderBy(F.col("cv2_e4").desc(), "l_suppkey")
        .limit(10)
    )


@query(
    "q_knn_label_purity",
    oracle="""
    WITH q AS (
        SELECT vec_id, label, dim, qv
        FROM (
            SELECT vec_id, label,
                   unnest(generate_series(1, len(embedding))) AS dim,
                   unnest(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                       AS qv
            FROM embeddings
        )
        WHERE vec_id % 50 = 0
    ),
    p AS (
        SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb,
               b.label AS lb,
               CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dist
        FROM q a JOIN q b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        GROUP BY va, la, vb, lb
    ),
    nn AS (
        SELECT va, la,
               min(dist * 10000000 + vb * 10 + lb) AS pack
        FROM p GROUP BY va, la
    )
    SELECT CAST(la AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN pack % 10 = la THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pure,
           CAST(sum(CASE WHEN pack % 10 = la THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS purity_bp
    FROM nn
    GROUP BY la
    ORDER BY label
    """,
)
def q_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN label purity — the classifier-free embedding quality
    score: for each sampled vector, does its exact nearest neighbor
    share its label? (High purity ⇒ the space separates the classes
    ⇒ cosine retrieval and clustering will work; q_silhouette_lite
    measures cluster geometry, this measures LABEL geometry.) The
    1-in-50 sample bounds the brute-force pair set (the documented
    capped-brute-force class of operators/similarity); distances are
    exact integer L2 on e3 components, and the argmin packs
    (dist, neighbor, LABEL) into one int64 (dist ≤ 2.4e9 · 1e7
    headroom) so the neighbor's label decodes as pack % 10 — no
    struct argmin, no second join."""
    q = _r9_qdims_local(spark, sf_dir).where(F.col("vec_id") % 50 == 0)
    a = q.select(
        "dim", F.col("vec_id").alias("va"), F.col("label").alias("la"),
        F.col("qv").alias("qa"),
    )
    b = q.select(
        "dim", F.col("vec_id").alias("vb"), F.col("label").alias("lb"),
        F.col("qv").alias("qb"),
    )
    p = (
        a.join(b, "dim")
        .where(F.col("va") != F.col("vb"))
        .groupBy("va", "la", "vb", "lb")
        .agg(
            F.sum(
                (F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb"))
            )
            .cast("long")
            .alias("dist")
        )
    )
    nn = p.groupBy("va", "la").agg(
        F.min(
            F.col("dist") * 10000000 + F.col("vb") * 10 + F.col("lb")
        ).alias("pack")
    )
    return (
        nn.groupBy("la")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum(
                F.when(F.col("pack") % 10 == F.col("la"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pure"),
            F.expr(
                "CAST(sum(CASE WHEN pack % 10 = la THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("purity_bp"),
        )
        .select(
            F.col("la").cast("int").alias("label"),
            "n_sampled",
            "n_pure",
            "purity_bp",
        )
        .orderBy("label")
    )


@query(
    "q_user_growth_accounting",
    oracle="""
    WITH aw AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 604800000000 AS wk
        FROM events
    ),
    firsts AS (
        SELECT user_id, min(wk) AS first_wk FROM aw GROUP BY user_id
    ),
    cur AS (
        SELECT aw.user_id, aw.wk, f.first_wk,
               p.user_id AS prev_active
        FROM aw
        JOIN firsts f ON aw.user_id = f.user_id
        LEFT JOIN aw p ON aw.user_id = p.user_id AND p.wk = aw.wk - 1
    ),
    inflow AS (
        SELECT wk,
               CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN wk > first_wk
                        AND prev_active IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN wk > first_wk AND prev_active IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM cur GROUP BY wk
    ),
    churn AS (
        SELECT a.wk + 1 AS wk,
               CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_churned
        FROM aw a LEFT JOIN aw b
          ON a.user_id = b.user_id AND b.wk = a.wk + 1
        GROUP BY a.wk + 1
    )
    SELECT CAST(i.wk AS BIGINT) AS wk,
           i.n_new, i.n_retained, i.n_resurrected,
           coalesce(c.n_churned, 0) AS n_churned,
           CAST((i.n_new + i.n_resurrected) * 10000
                // nullif(coalesce(c.n_churned, 0), 0) AS BIGINT)
               AS quick_ratio_e4
    FROM inflow i LEFT JOIN churn c ON i.wk = c.wk
    ORDER BY wk
    """,
)
def q_user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly USER growth accounting — new / retained / resurrected /
    churned actives plus the quick ratio ((new+resurrected)/churned,
    the one-number growth-health gauge): q_growth_accounting
    decomposes REVENUE; investor dashboards decompose USERS, and the
    two disagree exactly when whales churn. Weeks are absolute epoch
    bins (µs // 604800e6 — pure integer, no calendar algebra);
    'previous week' is an equi-join; the identity
    new+retained+resurrected = weekly actives holds by construction
    (the property test pins it)."""
    aw = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000"
                " AS BIGINT)"
            ).alias("wk"),
        )
        .distinct()
    )
    firsts = aw.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = aw.select(
        "user_id", (F.col("wk") + 1).alias("wk"), F.lit(1).alias("pa")
    )
    cur = aw.join(firsts, "user_id").join(prev, ["user_id", "wk"], "left")
    inflow = cur.groupBy("wk").agg(
        F.sum(F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(
            F.when(
                (F.col("wk") > F.col("first_wk")) & F.col("pa").isNotNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("wk") > F.col("first_wk")) & F.col("pa").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    nxt = aw.select(
        "user_id", (F.col("wk") - 1).alias("wk"), F.lit(1).alias("nx")
    )
    churn = (
        aw.join(nxt, ["user_id", "wk"], "left")
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(
            F.sum(F.when(F.col("nx").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_churned")
        )
    )
    return (
        inflow.join(churn, "wk", "left")
        .select(
            F.col("wk").cast("long").alias("wk"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
            F.expr(
                "CAST((n_new + n_resurrected) * 10000"
                " div nullif(coalesce(n_churned, 0), 0) AS BIGINT)"
            ).alias("quick_ratio_e4"),
        )
        .orderBy("wk")
    )


# ---------------------------------------------------------------------------
# Sixth r10 seed batch (authored in round 9): corpus curation pass-rate
# audits (Gopher-rule matrix, length-filter yield, prefix-dup families,
# trigram novelty, split-half vocabulary drift), event-stream health
# (transition entropy, hour-of-day seasonality, telemetry double-fire,
# weekly stickiness), and the ingest partition advisor. Flip checklist
# additions (NLJ_OK): none — every query is keyed aggregation/window
# over its own aggregates; the only tiny-window sums run over
# post-aggregation rows (≤24 per group).
# ---------------------------------------------------------------------------


@query(
    "q_gopher_rules",
    oracle="""
    WITH wc AS (
        SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT doc_id, source,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> x <> '')) AS w
            FROM documents
        )
        GROUP BY doc_id, source, w
    ),
    per_doc AS (
        SELECT doc_id, source,
               sum(n) AS n_words,
               sum(n * length(w)) AS sum_len,
               max(n) AS top_n,
               count(*) AS n_distinct,
               sum(CASE WHEN w IN ('the', 'a', 'and', 'of', 'in')
                        THEN n ELSE 0 END) AS n_stop
        FROM wc
        GROUP BY doc_id, source
    ),
    flags AS (
        SELECT source,
               CASE WHEN n_words >= 50 THEN 1 ELSE 0 END AS r_count,
               CASE WHEN 3 * n_words <= sum_len
                     AND sum_len <= 10 * n_words THEN 1 ELSE 0 END
                   AS r_wordlen,
               CASE WHEN top_n * 5 <= n_words THEN 1 ELSE 0 END
                   AS r_topshare,
               CASE WHEN 2 * n_distinct >= n_words THEN 1 ELSE 0 END
                   AS r_distinct,
               CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
        FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r_count) AS BIGINT) AS pass_count,
           CAST(sum(r_wordlen) AS BIGINT) AS pass_wordlen,
           CAST(sum(r_topshare) AS BIGINT) AS pass_topshare,
           CAST(sum(r_distinct) AS BIGINT) AS pass_distinct,
           CAST(sum(r_stop) AS BIGINT) AS pass_stop,
           CAST(sum(r_count * r_wordlen * r_topshare * r_distinct * r_stop)
                AS BIGINT) AS pass_all,
           CAST(sum(r_count * r_wordlen * r_topshare * r_distinct * r_stop)
                * 10000 // count(*) AS BIGINT) AS pass_all_bp
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule pass matrix per source (Rae et al.
    2021 §A1.1 reformulated for this corpus): five independent rules —
    minimum word count, mean word length in [3, 10] (decided as the
    integer cross-product 3n ≤ Σlen ≤ 10n, no division), top-word
    share ≤ 20% (top·5 ≤ n), distinct-word ratio ≥ 50% (2·distinct ≥
    n), and ≥ 2 stopword hits — reported per rule, not as one blended
    score (q_text_quality blends; a curation run needs to know WHICH
    rule gates). One explode → per-doc aggregate → per-source
    aggregate; the shuffle carries (doc, word) partial counts, and no
    row ever holds more than one doc's words."""
    wc = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "source",
            F.explode(_r10_words(F.col("text"))).alias("w"),
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    per_doc = wc.groupBy("doc_id", "source").agg(
        F.sum("n").alias("n_words"),
        F.sum(F.col("n") * F.length("w")).alias("sum_len"),
        F.max("n").alias("top_n"),
        F.count("*").alias("n_distinct"),
        F.sum(
            F.when(
                F.col("w").isin("the", "a", "and", "of", "in"), F.col("n")
            ).otherwise(0)
        ).alias("n_stop"),
    )
    flags = per_doc.select(
        "source",
        F.when(F.col("n_words") >= 50, 1).otherwise(0).alias("r_count"),
        F.when(
            (3 * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("r_wordlen"),
        F.when(F.col("top_n") * 5 <= F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_topshare"),
        F.when(2 * F.col("n_distinct") >= F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_distinct"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r_stop"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("r_count").cast("long").alias("pass_count"),
            F.sum("r_wordlen").cast("long").alias("pass_wordlen"),
            F.sum("r_topshare").cast("long").alias("pass_topshare"),
            F.sum("r_distinct").cast("long").alias("pass_distinct"),
            F.sum("r_stop").cast("long").alias("pass_stop"),
            F.sum(
                F.col("r_count") * F.col("r_wordlen") * F.col("r_topshare")
                * F.col("r_distinct") * F.col("r_stop")
            )
            .cast("long")
            .alias("pass_all"),
            F.expr(
                "CAST(sum(r_count * r_wordlen * r_topshare * r_distinct"
                " * r_stop) * 10000 div count(*) AS BIGINT)"
            ).alias("pass_all_bp"),
        )
        .orderBy("source")
    )


@query(
    "q_length_filter_yield",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450
                         THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
               AS kept_bp,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450
                         THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
           CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450
                         THEN n_chars ELSE 0 END) * 10000
                // sum(n_chars) AS BIGINT) AS chars_kept_bp
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_length_filter_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yield pre-flight for a [150, 450]-char length filter, per
    language: how many documents AND how much character mass survive.
    Every curation run starts with this number — a filter that drops
    40% of one language and 5% of another silently reshapes the
    training mix (the q_mix_weights input). Pure single-pass grouped
    aggregation on the typed n_chars column; nothing leaves the
    scan-side combine but 5 language rows."""
    d = load_table(spark, sf_dir, "documents")
    keep = F.col("n_chars").between(150, 450)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("kept_docs"),
            F.expr(
                "CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450 THEN 1"
                " ELSE 0 END) * 10000 div count(*) AS BIGINT)"
            ).alias("kept_bp"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
            F.expr(
                "CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450 THEN n_chars"
                " ELSE 0 END) * 10000 div sum(n_chars) AS BIGINT)"
            ).alias("chars_kept_bp"),
        )
        .orderBy("lang")
    )


@query(
    "q_vocab_drift",
    oracle="""
    WITH wc AS (
        SELECT lang, doc_id % 2 AS half, w, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT lang, doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> x <> '')) AS w
            FROM documents
        )
        GROUP BY lang, doc_id % 2, w
    ),
    rk AS (
        SELECT lang, half, w,
               row_number() OVER (PARTITION BY lang, half
                                  ORDER BY n DESC, w) AS rk
        FROM wc
    ),
    top0 AS (SELECT lang, w, rk FROM rk WHERE half = 0 AND rk <= 10),
    top1 AS (SELECT lang, w, rk FROM rk WHERE half = 1 AND rk <= 10),
    j AS (
        SELECT coalesce(top0.lang, top1.lang) AS lang,
               top0.rk AS rk0, top1.rk AS rk1
        FROM top0
        FULL OUTER JOIN top1
          ON top0.lang = top1.lang AND top0.w = top1.w
    )
    SELECT lang,
           CAST(10 AS BIGINT) AS top_k,
           CAST(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           CAST(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT NULL
                         THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS jaccard_bp,
           CAST(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT NULL
                         THEN abs(rk0 - rk1) ELSE 0 END) * 100
                // nullif(sum(CASE WHEN rk0 IS NOT NULL
                                    AND rk1 IS NOT NULL
                                   THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS mean_rank_shift_e2
    FROM j
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half vocabulary stability per language: rank the top-10
    words in each doc-parity half and measure the overlap (Jaccard of
    the two top sets, in bp of their union) and the mean absolute rank
    shift among common words. A stable corpus scores near 10000 / 0;
    drift between snapshot halves is the lexical analogue of
    q_profile_drift's numeric alarm and the cheap pre-check before
    retraining a tokenizer. Ranks are windows over per-(lang, half)
    VOCABULARIES (31 words here, ≤ a few million at web scale — never
    raw token rows); the halves join on (lang, word) top sets of 10
    rows each."""
    wc = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            (F.col("doc_id") % 2).alias("half"),
            F.explode(_r10_words(F.col("text"))).alias("w"),
        )
        .groupBy("lang", "half", "w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rk = wc.select(
        "lang", "half", "w",
        F.row_number()
        .over(
            Window.partitionBy("lang", "half").orderBy(
                F.col("n").desc(), F.col("w")
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") <= 10)
    top0 = rk.filter(F.col("half") == 0).select(
        "lang", "w", F.col("rk").alias("rk0")
    )
    top1 = rk.filter(F.col("half") == 1).select(
        F.col("lang").alias("lang1"), F.col("w").alias("w1"),
        F.col("rk").alias("rk1"),
    )
    j = top0.join(
        top1,
        (top0.lang == top1.lang1) & (top0.w == top1.w1),
        "full_outer",
    ).select(
        F.coalesce("lang", "lang1").alias("lang"), "rk0", "rk1"
    )
    both = F.col("rk0").isNotNull() & F.col("rk1").isNotNull()
    return (
        j.groupBy("lang")
        .agg(
            F.lit(10).cast("long").alias("top_k"),
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_common"),
            F.expr(
                "CAST(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT NULL"
                " THEN 1 ELSE 0 END) * 10000 div count(*) AS BIGINT)"
            ).alias("jaccard_bp"),
            F.expr(
                "CAST(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT NULL"
                " THEN abs(rk0 - rk1) ELSE 0 END) * 100"
                " div nullif(sum(CASE WHEN rk0 IS NOT NULL AND rk1 IS NOT"
                " NULL THEN 1 ELSE 0 END), 0) AS BIGINT)"
            ).alias("mean_rank_shift_e2"),
        )
        .orderBy("lang")
    )


@query(
    "q_dedup_prefix",
    oracle="""
    WITH p AS (
        SELECT source,
               md5(array_to_string(
                   (list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                x -> x <> ''))[1:2], ' ')) AS pk
        FROM documents
    ),
    fam AS (
        SELECT source, pk, CAST(count(*) AS BIGINT) AS c
        FROM p GROUP BY source, pk
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_families,
           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
               AS docs_in_dup_families,
           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 10000
                // sum(c) AS BIGINT) AS dup_bp,
           CAST(max(c) AS BIGINT) AS max_family
    FROM fam
    GROUP BY source
    ORDER BY source
    """,
)
def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate families per source — the truncation-dup
    detector exact dedup misses (crawl artifacts: the same page
    captured at different cut-offs shares its head but not its sha2).
    Keys on the md5 of the first 2 words; family sizes aggregate per
    source. The digest group-by is the only shuffle and carries one
    40-char key per doc — at 100 TB this is the cheapest of the dedup
    family (cf. operators/dedup.py's content-hash exact pass, which
    this complements at the head instead of the whole body)."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        "source",
        F.md5(
            F.array_join(F.slice(_r10_words(F.col("text")), 1, 2), " ")
        ).alias("pk"),
    )
    fam = p.groupBy("source", "pk").agg(F.count("*").cast("long").alias("c"))
    dup = F.col("c") >= 2
    return (
        fam.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum(F.when(dup, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_families"),
            F.sum(F.when(dup, F.col("c")).otherwise(0))
            .cast("long")
            .alias("docs_in_dup_families"),
            F.expr(
                "CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 10000"
                " div sum(c) AS BIGINT)"
            ).alias("dup_bp"),
            F.max("c").cast("long").alias("max_family"),
        )
        .orderBy("source")
    )


@query(
    "q_trigram_novelty",
    oracle="""
    WITH ws AS (
        SELECT source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> x <> '') AS words
        FROM documents
    ),
    tri AS (
        SELECT source,
               words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS t
        FROM ws, unnest(generate_series(1, greatest(len(words) - 2, 0)))
             AS u(i)
    ),
    tc AS (
        SELECT source, t, CAST(count(*) AS BIGINT) AS n
        FROM tri GROUP BY source, t
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS total_trigrams,
           CAST(count(*) AS BIGINT) AS distinct_trigrams,
           CAST(count(*) * 10000 // sum(n) AS BIGINT) AS novelty_bp,
           CAST(max(n) * 10000 // sum(n) AS BIGINT) AS top_share_bp
    FROM tc
    GROUP BY source
    ORDER BY source
    """,
)
def q_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty per source — distinct-to-total 3-gram ratio
    (compressibility proxy) plus the single most repeated trigram's
    mass share. Low novelty or a fat top trigram flags templated /
    machine-generated text that per-doc repetition checks
    (q_text_repetition) miss because the repetition spans documents.
    The guarded sequence (F.when(size >= 3, ...)) is the CLAUDE.md
    short-array rule: Spark's sequence(1, 0) DESCENDS where DuckDB's
    generate_series is empty."""
    ws = load_table(spark, sf_dir, "documents").select(
        "source", _r10_words(F.col("text")).alias("words")
    )
    tri = ws.select(
        "source",
        F.explode(
            F.when(
                F.size("words") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("words"), i),
                        F.element_at(F.col("words"), i + 1),
                        F.element_at(F.col("words"), i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("t"),
    )
    tc = tri.groupBy("source", "t").agg(F.count("*").cast("long").alias("n"))
    return (
        tc.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("total_trigrams"),
            F.count("*").cast("long").alias("distinct_trigrams"),
            F.expr(
                "CAST(count(*) * 10000 div sum(n) AS BIGINT)"
            ).alias("novelty_bp"),
            F.expr(
                "CAST(max(n) * 10000 div sum(n) AS BIGINT)"
            ).alias("top_share_bp"),
        )
        .orderBy("source")
    )


@query(
    "q_markov_entropy",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
                   AS nx
        FROM events
    ),
    c2 AS (
        SELECT event_type AS state, nx, CAST(count(*) AS BIGINT) AS n_ab
        FROM e WHERE nx IS NOT NULL
        GROUP BY event_type, nx
    ),
    scored AS (
        SELECT state, n_ab,
               CAST(n_ab AS DOUBLE) / sum(n_ab) OVER (PARTITION BY state)
                   AS p
        FROM c2
    ),
    per_state AS (
        SELECT state,
               CAST(sum(n_ab) AS BIGINT) AS n_out,
               CAST(count(*) AS BIGINT) AS n_next_states,
               CAST(max(n_ab) * 10000 // sum(n_ab) AS BIGINT)
                   AS top_share_bp,
               round(-sum(p * ln(p)), 4) + 0.0 AS entropy
        FROM scored
        GROUP BY state
    )
    SELECT state, n_out, n_next_states, top_share_bp, entropy,
           CAST(n_out * 10000 // sum(n_out) OVER () AS BIGINT) AS weight_bp
    FROM per_state
    ORDER BY state
    """,
)
def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition entropy of the event-type Markov chain: per state,
    the Shannon entropy of its next-event distribution (how
    predictable the next action is), the top transition's share, and
    the state's weight in the chain. The predictability complement of
    q_markov_transitions' raw matrix and q_markov_loglik's scoring —
    entropy ≈ 0 states are funnel stages, entropy ≈ ln(5) states are
    browsing. ln outputs are round(,4) (the CLAUDE.md-sanctioned
    class); every ratio under the ln is a per-row double from int64
    counts, and the 5-term entropy sums run over the 5×5 transition
    AGGREGATE, never raw events."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    pairs = e.select(
        F.col("event_type").alias("state"),
        F.lead("event_type").over(w).alias("nx"),
    ).filter(F.col("nx").isNotNull())
    c2 = pairs.groupBy("state", "nx").agg(
        F.count("*").cast("long").alias("n_ab")
    )
    ws = Window.partitionBy("state")
    scored = c2.select(
        "state", "n_ab",
        (F.col("n_ab").cast("double") / F.sum("n_ab").over(ws)).alias("p"),
    )
    per_state = scored.groupBy("state").agg(
        F.sum("n_ab").cast("long").alias("n_out"),
        F.count("*").cast("long").alias("n_next_states"),
        F.expr("CAST(max(n_ab) * 10000 div sum(n_ab) AS BIGINT)").alias(
            "top_share_bp"
        ),
        (F.round(-F.sum(F.col("p") * F.log("p")), 4) + 0.0).alias("entropy"),
    )
    return per_state.select(
        "state", "n_out", "n_next_states", "top_share_bp", "entropy",
        F.expr(
            "CAST(n_out * 10000 div sum(n_out) OVER () AS BIGINT)"
        ).alias("weight_bp"),
    ).orderBy("state")


@query(
    "q_seasonality_strength",
    oracle="""
    WITH h AS (
        SELECT event_type, hour(ts) AS hr, CAST(count(*) AS BIGINT) AS n_h
        FROM events
        GROUP BY event_type, hour(ts)
    ),
    r AS (
        SELECT event_type, hr, n_h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n_h DESC, hr) AS rk,
               sum(n_h) OVER (PARTITION BY event_type) AS n_t,
               count(*) OVER (PARTITION BY event_type) AS present
        FROM h
    )
    SELECT event_type,
           CAST(sum(n_h) AS BIGINT) AS n_events,
           CAST(23 - (max(n_h * 100 + (23 - hr)) % 100) AS BIGINT)
               AS peak_hour,
           CAST(max(n_h) * 10000 // sum(n_h) AS BIGINT) AS peak_share_bp,
           CAST(sum(CASE WHEN rk <= 4 THEN n_h ELSE 0 END) * 10000
                // sum(n_h) AS BIGINT) AS top4_share_bp,
           CAST(floor(CAST(sum((24 * n_h - n_t) * (24 * n_h - n_t))
                           + (24 - max(present)) * max(n_t) * max(n_t)
                           AS DOUBLE)
                      * 10000.0
                      / CAST(24 * max(n_t) AS DOUBLE)) AS BIGINT)
               AS chi2_uniform_e4
    FROM r
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type: peak hour (ties broken
    to the earliest via the packed-integer argmax — no struct argmin,
    the CLAUDE.md q_kmeans_step rule), peak and top-4-hour mass
    shares, and a χ² statistic against the uniform 24-hour profile.
    Missing hours enter the χ² algebraically — Σ over absent cells of
    (0 − N/24)² collapses to (24 − present)·N²/24² — so no zero-fill
    grid (and no NLJ) is needed. The χ² e4 value is ONE double
    floor((ss·10⁴)/(24N)) from int64 sums — the q_bot_score
    cross-engine class. Everything runs over the |types|×24 aggregate."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("hr"))
        .agg(F.count("*").cast("long").alias("n_h"))
    )
    r = h.select(
        "event_type", "hr", "n_h",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.col("n_h").desc(), F.col("hr")
            )
        )
        .alias("rk"),
    )
    wt = Window.partitionBy("event_type")
    r = r.withColumn("n_t", F.sum("n_h").over(wt)).withColumn(
        "present", F.count("*").over(wt)
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.sum("n_h").cast("long").alias("n_events"),
            (23 - (F.max(F.col("n_h") * 100 + (23 - F.col("hr"))) % 100))
            .cast("long")
            .alias("peak_hour"),
            F.expr(
                "CAST(max(n_h) * 10000 div sum(n_h) AS BIGINT)"
            ).alias("peak_share_bp"),
            F.expr(
                "CAST(sum(CASE WHEN rk <= 4 THEN n_h ELSE 0 END) * 10000"
                " div sum(n_h) AS BIGINT)"
            ).alias("top4_share_bp"),
            F.expr(
                "CAST(floor(CAST(sum((24 * n_h - n_t) * (24 * n_h - n_t))"
                " + (24 - max(present)) * max(n_t) * max(n_t) AS DOUBLE)"
                " * 10000.0 / CAST(24 * max(n_t) AS DOUBLE)) AS BIGINT)"
            ).alias("chi2_uniform_e4"),
        )
        .orderBy("event_type")
    )


@query(
    "q_event_dup_burst",
    oracle="""
    WITH e AS (
        SELECT event_type, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
           CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
                         THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
               AS burst_bp,
           CAST(count(DISTINCT CASE WHEN gap_us IS NOT NULL
                                     AND gap_us <= 300000000
                                    THEN user_id END) AS BIGINT)
               AS n_affected_users
    FROM e
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_event_dup_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-fire telemetry screen: events arriving within 300 s of
    the same user's previous event (any type), attributed to the
    follow-up event's type. High burst shares on one type flag
    double-fire instrumentation or scripted traffic — the
    event-stream analogue of q_dup_invoice, and an input to
    q_bot_score triage. One keyed lag window (user-partitioned,
    exact integer µs), then a grouped aggregate."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    g = e.select(
        "event_type", "user_id",
        (F.col("tus") - F.lag("tus").over(w)).alias("gap_us"),
    )
    burst = F.col("gap_us").isNotNull() & (F.col("gap_us") <= 300_000_000)
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(burst, 1).otherwise(0))
            .cast("long")
            .alias("n_bursts"),
            F.expr(
                "CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <="
                " 300000000 THEN 1 ELSE 0 END) * 10000 div count(*)"
                " AS BIGINT)"
            ).alias("burst_bp"),
            F.countDistinct(F.when(burst, F.col("user_id")))
            .cast("long")
            .alias("n_affected_users"),
        )
        .orderBy("event_type")
    )


@query(
    "q_stickiness",
    oracle="""
    WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               (epoch_us(ts) // 86400000000) // 7 AS wk,
               user_id
        FROM events
    ),
    dau AS (
        SELECT wk, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM d GROUP BY wk, day
    ),
    daily AS (
        SELECT wk, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(dau) AS BIGINT) AS sum_dau
        FROM dau GROUP BY wk
    ),
    weekly AS (
        SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM d GROUP BY wk
    )
    SELECT daily.wk AS wk, n_days, wau, sum_dau,
           CAST(sum_dau * 10000 // (n_days * wau) AS BIGINT)
               AS stickiness_e4
    FROM daily JOIN weekly ON daily.wk = weekly.wk
    ORDER BY wk
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly DAU/WAU stickiness — mean daily active share of the
    week's active users (the growth metric q_user_growth_accounting's
    adds/churn decomposition doesn't give). Day and week indexes are
    exact integer epoch-µs divisions; partial calendar weeks divide
    by the days actually present, not 7. Two distinct-aggregates
    keyed on (week[, day]) joined on week — both shuffles carry
    (key, user) pairs only."""
    d = load_table(spark, sf_dir, "events").select(
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000) div 7"
        ).alias("wk"),
        "user_id",
    )
    dau = d.groupBy("wk", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    daily = dau.groupBy("wk").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    weekly = d.groupBy("wk").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        daily.join(weekly, "wk")
        .select(
            F.col("wk").cast("long").alias("wk"),
            "n_days", "wau", "sum_dau",
            F.expr(
                "CAST(sum_dau * 10000 div (n_days * wau) AS BIGINT)"
            ).alias("stickiness_e4"),
        )
        .orderBy("wk")
    )


@query(
    "q_partition_advisor",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           CAST(max(n_chars) AS BIGINT) AS max_doc_bytes,
           CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_doc_bytes,
           CAST((sum(n_chars) + 134217727) // 134217728 AS BIGINT)
               AS rec_partitions,
           CAST(max(n_chars) * 10000 // sum(n_chars) AS BIGINT)
               AS max_doc_share_bp
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest partition advisor per source: byte mass, recommended
    partition count at the 128 MiB spark.sql.files.maxPartitionBytes
    default (ceiling division as exact integers), and the largest
    single document's mass share — the straggler predictor, since one
    doc can't split across tasks in a text pipeline. Companion to
    q_compress_advisory (storage) and q_sortkey_advisor (layout) on
    the ingest side; one grouped aggregate over the typed n_chars
    column."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            F.max("n_chars").cast("long").alias("max_doc_bytes"),
            F.expr(
                "CAST(sum(n_chars) div count(*) AS BIGINT)"
            ).alias("mean_doc_bytes"),
            F.expr(
                "CAST((sum(n_chars) + 134217727) div 134217728 AS BIGINT)"
            ).alias("rec_partitions"),
            F.expr(
                "CAST(max(n_chars) * 10000 div sum(n_chars) AS BIGINT)"
            ).alias("max_doc_share_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Seventh r10 seed batch (authored in round 9): purchase-cadence and
# pricing science (reorder gaps, fixed-base price index, cross-supplier
# dispersion, return-rate by fulfilment delay, slow movers, nation trade
# balance, Hill tail index) and embedding-infrastructure QA (sign-LSH
# bucket skew, label-centroid confusability bands, int8 clip calibration).
# Flip checklist additions (NLJ_OK): q_slow_movers (broadcast 1-row
# corpus-horizon leg, the q_recency_topk class).
# ---------------------------------------------------------------------------


@query(
    "q_reorder_cadence",
    oracle="""
    WITH o AS (
        SELECT c_mktsegment AS seg, o_custkey, o_orderkey,
               datediff('day',
                        lag(CAST(o_orderdate AS DATE)) OVER (
                            PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                        CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (
        SELECT seg, gap_days, o_custkey, o_orderkey
        FROM o WHERE gap_days IS NOT NULL
    ),
    r AS (
        SELECT seg, gap_days,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY gap_days, o_custkey, o_orderkey)
                   AS rk,
               count(*) OVER (PARTITION BY seg) AS n,
               sum(gap_days) OVER (PARTITION BY seg) AS s
        FROM g
    )
    SELECT seg,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(max(s) // max(n) AS BIGINT) AS mean_gap_days,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN gap_days END)
                AS BIGINT) AS median_gap_days,
           CAST(max(CASE WHEN rk = (n * 90 + 99) // 100 THEN gap_days END)
                AS BIGINT) AS p90_gap_days
    FROM r
    GROUP BY seg
    ORDER BY seg
    """,
)
def q_reorder_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder cadence per market segment: exact median and p90 of
    the days between a customer's consecutive orders — the
    replenishment clock behind churn-horizon choices (q_churn_label's
    cutoff) and campaign timing. Gaps are exact integer days from a
    per-customer lag window; the percentile ranks use the
    q_percentile_ci binomial-rank arithmetic over a per-segment
    ranking (5 partitions; the rank window's tie-break
    (gap, custkey, orderkey) is a total order)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"), "o_custkey", "o_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    ws = Window.partitionBy("seg")
    r = g.select(
        "seg", "gap_days",
        F.row_number()
        .over(ws.orderBy("gap_days", "o_custkey", "o_orderkey"))
        .alias("rk"),
        F.count("*").over(ws).alias("n"),
        F.sum("gap_days").over(ws).alias("s"),
    )
    return (
        r.groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.expr("CAST(max(s) div max(n) AS BIGINT)").alias(
                "mean_gap_days"
            ),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(n + 1) div 2"), F.col("gap_days")
                )
            )
            .cast("long")
            .alias("median_gap_days"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(n * 90 + 99) div 100"),
                    F.col("gap_days"),
                )
            )
            .cast("long")
            .alias("p90_gap_days"),
        )
        .orderBy("seg")
    )


@query(
    "q_price_index",
    oracle="""
    WITH lm AS (
        SELECT p_brand AS brand,
               year(l_shipdate) * 100 + month(l_shipdate) AS m,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, year(l_shipdate) * 100 + month(l_shipdate)
    ),
    base AS (
        SELECT brand, m AS m0, cents AS cents0, qty AS qty0
        FROM (
            SELECT brand, m, cents, qty,
                   row_number() OVER (PARTITION BY brand ORDER BY m) AS rk
            FROM lm
        ) WHERE rk = 1
    )
    SELECT lm.brand AS brand, CAST(lm.m AS BIGINT) AS m,
           lm.cents AS cents, lm.qty AS qty,
           CAST(floor(CAST(lm.cents AS DOUBLE) * CAST(base.qty0 AS DOUBLE)
                      * 10000.0
                      / (CAST(lm.qty AS DOUBLE)
                         * CAST(base.cents0 AS DOUBLE))) AS BIGINT)
               AS index_e4
    FROM lm JOIN base ON lm.brand = base.brand
    ORDER BY brand, m
    """,
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-base unit-value price index per brand-month: realized
    price per unit relative to the brand's first month (100× e4 ⇒
    10000 = parity) — the inflation ledger behind
    q_price_band_migration's distributional view. Money enters as
    exact integer cents, quantities as integers; the index is ONE
    fixed-shape double expression (two int64→double products divided)
    — every IEEE multiply/divide is exactly rounded, so both engines
    produce bit-identical doubles before the floor (the q_bot_score /
    q_hhi_trend cross-engine class; only libm pow/exp are banned in a
    floor). The base month joins back equi-keyed on brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    lm = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("m"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
            .cast("long")
            .alias("cents"),
            F.sum(F.floor(F.col("l_quantity") + 0.5))
            .cast("long")
            .alias("qty"),
        )
    )
    base = (
        lm.select(
            "brand",
            F.col("cents").alias("cents0"),
            F.col("qty").alias("qty0"),
            F.row_number()
            .over(Window.partitionBy("brand").orderBy("m"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        lm.join(base, "brand")
        .select(
            "brand",
            F.col("m").cast("long").alias("m"),
            "cents", "qty",
            F.expr(
                "CAST(floor(CAST(cents AS DOUBLE) * CAST(qty0 AS DOUBLE)"
                " * 10000.0 / (CAST(qty AS DOUBLE)"
                " * CAST(cents0 AS DOUBLE))) AS BIGINT)"
            ).alias("index_e4"),
        )
        .orderBy("brand", "m")
    )


@query(
    "q_return_by_delay",
    oracle="""
    WITH d AS (
        SELECT datediff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) // 30 AS band,
               l_returnflag
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(band * 30 AS BIGINT) AS band_lo_days,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS return_bp
    FROM d
    GROUP BY band
    ORDER BY band
    """,
)
def q_return_by_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate by fulfilment-delay band (order→ship days, 30-day
    buckets): the does-slow-shipping-cause-returns curve — the causal
    question behind q_otif's compliance number. Integer day bands via
    integer division (both engines floor nonnegative delays
    identically); one fact join on orderkey, then a grouped count."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr(
            "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"
            " div 30"
        ).alias("band"),
        "l_returnflag",
    )
    return (
        d.groupBy("band")
        .agg(
            (F.col("band") * 30).cast("long").alias("band_lo_days"),
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
            F.expr(
                "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("return_bp"),
        )
        .select(
            F.col("band").cast("long").alias("band"), "band_lo_days",
            "n_lines", "n_returned", "return_bp",
        )
        .orderBy("band")
    )


@query(
    "q_supplier_price_dispersion",
    oracle="""
    WITH u AS (
        SELECT l_partkey, l_suppkey,
               CAST(min(CAST(floor(l_extendedprice * 100.0 / l_quantity
                                   + 0.5) AS BIGINT)) AS BIGINT) AS unit_cents
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    s AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(min(unit_cents) AS BIGINT) AS min_unit_cents,
               CAST(max(unit_cents) AS BIGINT) AS max_unit_cents,
               CAST((max(unit_cents) - min(unit_cents)) * 10000
                    // min(unit_cents) AS BIGINT) AS spread_bp
        FROM u
        GROUP BY l_partkey
        HAVING count(*) >= 3
    )
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_suppliers,
           min_unit_cents, max_unit_cents, spread_bp
    FROM s
    ORDER BY spread_bp DESC, l_partkey
    LIMIT 20
    """,
)
def q_supplier_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-supplier price dispersion: for every part sold by ≥ 3
    suppliers, the spread between the cheapest and dearest supplier's
    unit price (each supplier's floor taken as their best realized
    unit price), top-20 by relative spread — the procurement
    arbitrage report. Unit cents are ONE double multiply/divide
    floored to an integer (deterministic IEEE on both engines); the
    top-20 sort has the unique partkey tie-break (the CLAUDE.md limit
    rule) and runs as TakeOrdered over the part-level aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    u = (
        li.select(
            "l_partkey", "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * 100.0 / F.col("l_quantity") + 0.5
            ).alias("uc"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").cast("long").alias("unit_cents"))
    )
    s = (
        u.groupBy("l_partkey")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.min("unit_cents").cast("long").alias("min_unit_cents"),
            F.max("unit_cents").cast("long").alias("max_unit_cents"),
            F.expr(
                "CAST((max(unit_cents) - min(unit_cents)) * 10000"
                " div min(unit_cents) AS BIGINT)"
            ).alias("spread_bp"),
        )
        .filter(F.col("n_suppliers") >= 3)
    )
    return (
        s.select(
            F.col("l_partkey").cast("long").alias("l_partkey"),
            "n_suppliers", "min_unit_cents", "max_unit_cents", "spread_bp",
        )
        .orderBy(F.col("spread_bp").desc(), "l_partkey")
        .limit(20)
    )


@query(
    "q_slow_movers",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               max(CAST(l_shipdate AS DATE)) AS last_ship,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem
        GROUP BY l_partkey
    ),
    hz AS (SELECT max(CAST(l_shipdate AS DATE)) AS horizon FROM lineitem)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN datediff('day', last_ship, horizon) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
           CAST(sum(CASE WHEN datediff('day', last_ship, horizon) > 90
                         THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
               AS stale_bp,
           CAST(sum(CASE WHEN datediff('day', last_ship, horizon) > 90
                         THEN qty ELSE 0 END) * 10000
                // sum(qty) AS BIGINT) AS stale_qty_share_bp
    FROM pv
    JOIN part ON l_partkey = p_partkey
    CROSS JOIN hz
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_slow_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slow-mover screen per brand: parts whose last shipment is
    more than 90 days behind the corpus horizon, with their share of
    the brand's unit volume — the inventory-rot report that drives
    clearance and delisting. The horizon is the allowlisted broadcast
    1-row max-shipdate leg (the q_recency_topk / q_backlog_aging
    class); everything else is part-keyed aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pv = li.groupBy("l_partkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
        F.sum(F.floor(F.col("l_quantity") + 0.5)).cast("long").alias("qty"),
    )
    hz = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("horizon"))
    stale = F.expr("datediff(horizon, last_ship) > 90")
    return (
        pv.join(p, pv.l_partkey == p.p_partkey)
        .crossJoin(F.broadcast(hz))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.when(stale, 1).otherwise(0)).cast("long").alias("n_stale"),
            F.expr(
                "CAST(sum(CASE WHEN datediff(horizon, last_ship) > 90"
                " THEN 1 ELSE 0 END) * 10000 div count(*) AS BIGINT)"
            ).alias("stale_bp"),
            F.expr(
                "CAST(sum(CASE WHEN datediff(horizon, last_ship) > 90"
                " THEN qty ELSE 0 END) * 10000 div sum(qty) AS BIGINT)"
            ).alias("stale_qty_share_bp"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_nation_trade_balance",
    oracle="""
    WITH sup AS (
        SELECT s_nationkey AS nk,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS supply_cents
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    ),
    dem AS (
        SELECT c_nationkey AS nk,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS demand_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    )
    SELECT n_name,
           coalesce(supply_cents, 0) AS supply_cents,
           coalesce(demand_cents, 0) AS demand_cents,
           coalesce(supply_cents, 0) - coalesce(demand_cents, 0)
               AS balance_cents,
           CAST(coalesce(supply_cents, 0) * 10000
                // sum(coalesce(supply_cents, 0)) OVER () AS BIGINT)
               AS supply_share_bp
    FROM nation
    LEFT JOIN sup ON n_nationkey = sup.nk
    LEFT JOIN dem ON n_nationkey = dem.nk
    ORDER BY n_name
    """,
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: supplied line-item value (via the
    nation's suppliers) against demanded order value (via its
    customers), in exact integer cents, with each nation's supply
    share. Two independent fact aggregations collapse to 25-row legs
    BEFORE joining the nation dimension (broadcast hash joins); the
    share is a window over the 25-row result, not a scalar cross."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sup = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
            .cast("long")
            .alias("supply_cents")
        )
    )
    dem = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk2"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("demand_cents")
        )
    )
    j = (
        n.join(F.broadcast(sup), n.n_nationkey == sup.nk, "left")
        .join(F.broadcast(dem), n.n_nationkey == dem.nk2, "left")
        .select(
            "n_name",
            F.coalesce("supply_cents", F.lit(0)).alias("supply_cents"),
            F.coalesce("demand_cents", F.lit(0)).alias("demand_cents"),
        )
    )
    return j.select(
        "n_name", "supply_cents", "demand_cents",
        (F.col("supply_cents") - F.col("demand_cents")).alias(
            "balance_cents"
        ),
        F.expr(
            "CAST(supply_cents * 10000 div sum(supply_cents) OVER ()"
            " AS BIGINT)"
        ).alias("supply_share_bp"),
    ).orderBy("n_name")


@query(
    "q_tail_index",
    oracle="""
    WITH o AS (
        SELECT c_mktsegment AS seg, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    r AS (
        SELECT seg, cents,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY cents DESC, o_orderkey) AS rk
        FROM o
    ),
    thr AS (SELECT seg, cents AS x_k1 FROM r WHERE rk = 101),
    top AS (
        SELECT r.seg, r.cents, thr.x_k1
        FROM r JOIN thr ON r.seg = thr.seg
        WHERE r.rk <= 100
    )
    SELECT seg,
           CAST(100 AS BIGINT) AS k,
           CAST(max(x_k1) AS BIGINT) AS threshold_cents,
           round(avg(ln(CAST(cents AS DOUBLE) / CAST(x_k1 AS DOUBLE))), 4)
               AS mean_log_excess,
           round(100.0 / sum(ln(CAST(cents AS DOUBLE)
                                / CAST(x_k1 AS DOUBLE))), 4) AS hill_alpha
    FROM top
    GROUP BY seg
    ORDER BY seg
    """,
)
def q_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate of the order-value distribution per
    segment (k = 100 top order statistics): α ≈ 2–4 means a heavy
    Pareto tail where mean-based SLAs and revenue forecasts mislead —
    the statistical justification gate for q_pareto_front / q_gini
    style concentration reporting. The rank filter rk ≤ 101 compiles
    to Spark's WindowGroupLimit pushdown (top-101 per segment, no
    full-partition materialization); ln outputs are the sanctioned
    round(,4) class (ratios of exact integer cents under the ln)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    r = base.select(
        "seg", "cents",
        F.row_number()
        .over(
            Window.partitionBy("seg").orderBy(
                F.col("cents").desc(), F.col("o_orderkey")
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") <= 101)
    thr = r.filter(F.col("rk") == 101).select(
        F.col("seg").alias("seg_t"), F.col("cents").alias("x_k1")
    )
    top = r.filter(F.col("rk") <= 100).join(
        F.broadcast(thr), F.col("seg") == F.col("seg_t")
    )
    return (
        top.groupBy("seg")
        .agg(
            F.lit(100).cast("long").alias("k"),
            F.max("x_k1").cast("long").alias("threshold_cents"),
            F.round(
                F.avg(
                    F.log(F.col("cents").cast("double") / F.col("x_k1"))
                ),
                4,
            ).alias("mean_log_excess"),
            F.round(
                100.0
                / F.sum(
                    F.log(F.col("cents").cast("double") / F.col("x_k1"))
                ),
                4,
            ).alias("hill_alpha"),
        )
        .orderBy("seg")
    )


@query(
    "q_lsh_bucket_skew",
    oracle="""
    WITH v AS (
        SELECT (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
             + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
             + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
             + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
             + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END)
             + (CASE WHEN embedding[9] > 0 THEN 256 ELSE 0 END)
             + (CASE WHEN embedding[10] > 0 THEN 512 ELSE 0 END)
             + (CASE WHEN embedding[11] > 0 THEN 1024 ELSE 0 END)
             + (CASE WHEN embedding[12] > 0 THEN 2048 ELSE 0 END)
               AS bucket12
        FROM embeddings
    ),
    g AS (
        SELECT b, bucket12 % (1 << b) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM v, unnest([4, 8, 12]) AS t(b)
        GROUP BY b, bucket12 % (1 << b)
    )
    SELECT CAST(b AS BIGINT) AS n_bits,
           CAST(sum(n) AS BIGINT) AS n_vecs,
           CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(max(n) * (1 << b) * 10000 // sum(n) AS BIGINT)
               AS max_over_uniform_e4,
           CAST(((1 << b) - count(*)) * 10000 // (1 << b) AS BIGINT)
               AS empty_bp
    FROM g
    GROUP BY b
    ORDER BY n_bits
    """,
)
def q_lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket-occupancy audit at 4 / 8 / 12 hyperplane bits
    (coordinate signs as the hash — the capacity-planning input for
    q_sim_ann_topk's bucketed search): bucket skew relative to the
    uniform ideal and the empty-bucket share. A max/uniform ratio ≫ 1
    means LSH candidate lists concentrate — the 100 TB failure mode
    where one bucket holds half the corpus. One pass computes the
    12-bit key per vector; the 4/8-bit views are modular prefixes of
    the SAME key (an explode over three literals, not three scans)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket12 = None
    for i in range(12):
        term = F.when(
            F.element_at("embedding", i + 1) > 0, F.lit(1 << i)
        ).otherwise(0)
        bucket12 = term if bucket12 is None else bucket12 + term
    v = emb.select(bucket12.alias("bucket12"))
    g = (
        v.select(
            "bucket12",
            F.explode(F.array(F.lit(4), F.lit(8), F.lit(12))).alias("b"),
        )
        .select("b", F.expr("bucket12 % shiftleft(1, b)").alias("bucket"))
        .groupBy("b", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        g.groupBy("b")
        .agg(
            F.sum("n").cast("long").alias("n_vecs"),
            F.count("*").cast("long").alias("buckets_used"),
            F.max("n").cast("long").alias("max_bucket"),
            F.expr(
                "CAST(max(n) * shiftleft(1, b) * 10000 div sum(n)"
                " AS BIGINT)"
            ).alias("max_over_uniform_e4"),
            F.expr(
                "CAST((shiftleft(1, b) - count(*)) * 10000"
                " div shiftleft(1, b) AS BIGINT)"
            ).alias("empty_bp"),
        )
        .select(
            F.col("b").cast("long").alias("n_bits"), "n_vecs",
            "buckets_used", "max_bucket", "max_over_uniform_e4", "empty_bp",
        )
        .orderBy("n_bits")
    )


@query(
    "q_embed_centroid_sim",
    oracle="""
    WITH sd AS (
        SELECT label, i AS dim,
               CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                             AS BIGINT)) AS BIGINT) AS s
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i
    ),
    q AS (
        SELECT label, CAST(sum(s * s) AS BIGINT) AS qq
        FROM sd GROUP BY label
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(sum(a.s * b.s) AS BIGINT) AS dot
        FROM sd a JOIN sd b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT CAST(label_a AS BIGINT) AS label_a,
           CAST(label_b AS BIGINT) AS label_b,
           CAST(CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS dot_sign,
           CAST(CASE
                WHEN dot <= 0 THEN -1
                WHEN CAST(dot AS HUGEINT) * dot * 10000
                     >= CAST(8100 AS HUGEINT) * qa.qq * qb.qq THEN 9
                WHEN CAST(dot AS HUGEINT) * dot * 10000
                     >= CAST(4900 AS HUGEINT) * qa.qq * qb.qq THEN 7
                WHEN CAST(dot AS HUGEINT) * dot * 10000
                     >= CAST(2500 AS HUGEINT) * qa.qq * qb.qq THEN 5
                ELSE 0 END AS BIGINT) AS band_e1
    FROM pairs
    JOIN q qa ON pairs.label_a = qa.label
    JOIN q qb ON pairs.label_b = qb.label
    ORDER BY label_a, label_b
    """,
)
def q_embed_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid confusability bands: the cosine similarity
    between every pair of label centroids, reported as the highest
    threshold band passed (0.5 / 0.7 / 0.9, encoded ×10) — the
    which-classes-will-an-ANN-confuse matrix complementing
    q_silhouette_lite's cluster-quality score. Counts cancel out of
    the cosine (cos(Ā, B̄) = S_A·S_B / (‖S_A‖‖S_B‖)), so the whole
    decision runs on e3-quantized integer coordinate SUMS: cos ≥ t is
    decided as dot > 0 ∧ dot²·10⁴ ≥ t²e4·q_a·q_b in 128-bit integers
    (the q_cosine_threshold_curve rule — no cross-engine sqrt in a
    comparison). The pair join is equi-keyed on dim over the
    |labels|×|dims| aggregate, never over raw vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    sd = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .select(
            "label", (F.col("pos") + 1).alias("dim"),
            F.floor(F.col("x").cast("double") * 1000).alias("xq"),
        )
        .groupBy("label", "dim")
        .agg(F.sum("xq").cast("long").alias("s"))
    )
    q = sd.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("qq")
    )
    a = sd.select(
        F.col("label").alias("label_a"), "dim", F.col("s").alias("sa")
    )
    b = sd.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("s").alias("sb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    qa = q.select(F.col("label").alias("la"), F.col("qq").alias("qa"))
    qb = q.select(F.col("label").alias("lb"), F.col("qq").alias("qb"))
    j = pairs.join(F.broadcast(qa), pairs.label_a == qa.la).join(
        F.broadcast(qb), pairs.label_b == qb.lb
    )
    dec = (
        "CAST(dot AS DECIMAL(19,0)) * CAST(dot AS DECIMAL(19,0)) * 10000"
    )
    rhs = "CAST({t} AS DECIMAL(19,0)) * CAST(qa AS DECIMAL(19,0)) * CAST(qb AS DECIMAL(19,0))"
    return j.select(
        F.col("label_a").cast("long").alias("label_a"),
        F.col("label_b").cast("long").alias("label_b"),
        F.expr(
            "CAST(CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("dot_sign"),
        F.expr(
            "CAST(CASE WHEN dot <= 0 THEN -1 "
            f"WHEN {dec} >= {rhs.format(t=8100)} THEN 9 "
            f"WHEN {dec} >= {rhs.format(t=4900)} THEN 7 "
            f"WHEN {dec} >= {rhs.format(t=2500)} THEN 5 "
            "ELSE 0 END AS BIGINT)"
        ).alias("band_e1"),
    ).orderBy("label_a", "label_b")


@query(
    "q_embed_quantile_clip",
    oracle="""
    WITH f AS (
        SELECT vec_id, i AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    r AS (
        SELECT dim, qv,
               row_number() OVER (PARTITION BY dim ORDER BY qv, vec_id)
                   AS rk,
               count(*) OVER (PARTITION BY dim) AS n
        FROM f
    ),
    b AS (
        SELECT dim,
               CAST(max(n) AS BIGINT) AS n_vals,
               CAST(max(CASE WHEN rk = (n + 99) // 100 THEN qv END)
                    AS BIGINT) AS p1_e6,
               CAST(max(CASE WHEN rk = (n * 99 + 99) // 100 THEN qv END)
                    AS BIGINT) AS p99_e6,
               CAST(min(qv) AS BIGINT) AS min_e6,
               CAST(max(qv) AS BIGINT) AS max_e6
        FROM r
        GROUP BY dim
    )
    SELECT CAST(b.dim AS BIGINT) AS dim, n_vals, p1_e6, p99_e6,
           min_e6, max_e6,
           CAST(sum(CASE WHEN abs(f.qv) > greatest(abs(p1_e6), abs(p99_e6))
                         THEN 1 ELSE 0 END) * 10000 // max(n_vals)
                AS BIGINT) AS sat_bp
    FROM f JOIN b ON f.dim = b.dim
    GROUP BY b.dim, n_vals, p1_e6, p99_e6, min_e6, max_e6
    ORDER BY dim
    """,
)
def q_embed_quantile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 clip-calibration table per embedding dimension: exact p1
    and p99 coordinate values (e6 integers, binomial ranks with the
    vec_id tie-break) plus the saturation share if the symmetric clip
    range is set to max(|p1|, |p99|) — the table a quantized ANN
    index loads before casting float32 → int8. Ranks run per
    dimension (64 partitions, each holding one coordinate per vector);
    the bounds join back equi-keyed on dim."""
    emb = load_table(spark, sf_dir, "embeddings")
    f = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000).alias("qv"),
    )
    wd = Window.partitionBy("dim")
    r = f.select(
        "dim", "qv",
        F.row_number().over(wd.orderBy("qv", "vec_id")).alias("rk"),
        F.count("*").over(wd).alias("n"),
    )
    b = r.groupBy("dim").agg(
        F.max("n").cast("long").alias("n_vals"),
        F.max(F.when(F.col("rk") == F.expr("(n + 99) div 100"), F.col("qv")))
        .cast("long")
        .alias("p1_e6"),
        F.max(
            F.when(F.col("rk") == F.expr("(n * 99 + 99) div 100"), F.col("qv"))
        )
        .cast("long")
        .alias("p99_e6"),
        F.min("qv").cast("long").alias("min_e6"),
        F.max("qv").cast("long").alias("max_e6"),
    )
    return (
        f.join(b.withColumnRenamed("dim", "dim_b"), F.col("dim") == F.col("dim_b"))
        .groupBy("dim_b", "n_vals", "p1_e6", "p99_e6", "min_e6", "max_e6")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN abs(qv) > greatest(abs(p1_e6),"
                " abs(p99_e6)) THEN 1 ELSE 0 END) * 10000 div max(n_vals)"
                " AS BIGINT)"
            ).alias("sat_bp")
        )
        .select(
            F.col("dim_b").cast("long").alias("dim"), "n_vals", "p1_e6",
            "p99_e6", "min_e6", "max_e6", "sat_bp",
        )
        .orderBy("dim")
    )
