"""Round-10 STAGED surface — seed tranche.

Same staged-tranche contract as queries/analytics_r9_staged.py, one
window further out: the round-9 window is fully allocated (50 staged
pairs, ROUND9_WINDOW), so surface built beyond that point stages HERE
and flips in round 10. Every entry is a complete (query fn, DuckDB
oracle) pair hash-proven NOW at sf0.01 and the sf0.1 sweep env by
tests/test_r10_staged.py through the same harness the driver gate
uses. NOT imported by registry.load_all — importing this module must
stay registry-side-effect free (pinned by the staging test).

Seed themes — the measurement seams the first 435 queries leave open:

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

Determinism discipline: identical to the r9 staging — exact integer
cents/e4 floors via integer div, round(,4) only on sqrt/ln-class
outputs, sign-safe division (never integer-div a negative numerator),
HUGEINT/DECIMAL(38,0) wherever a square can pass int64.

Flip checklist so far (NLJ_OK on registration): q_percentile_ci
(1-row per-priority rank-bound legs are equi-joined — no NLJ);
q_minhash_band_tuning carries the broadcast 30-row curve grid;
q_embed_drift a 1-row-per-label moments leg (equi-join, no NLJ).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, DuckDB oracle SQL); round 10 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R10: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R10:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R10[name] = (fn, oracle)
        return fn

    return deco


@_staged(
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


@_staged(
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


@_staged(
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


@_staged(
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


@_staged(
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


@_staged(
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


@_staged(
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


@_staged(
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
