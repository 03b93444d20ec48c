"""Round-4 surface widening: reshaping (pivot/unpivot), deterministic
mode, ordered string aggregation, OHLC resampling, cohort retention,
funnel conversion, market-basket co-occurrence, robust statistics
(MAD), and the forward as-of join variant.

Every query here follows the repo's oracle discipline (identical
aliases both sides, 4-decimal rounding on float aggregates, BIGINT
casts where DuckDB would widen, deterministic tie-breaks on every
first/last/top-k) and the scale rules (single-shuffle aggregations,
broadcast for tiny dimensions, TakeOrdered for top-k, no driver-side
loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
           round(avg(o_totalprice), 4)                                 AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an EXPLICIT value list: counts per order
    status fanned into columns, one per status. Passing the values to
    ``pivot()`` matters at scale — without them Spark runs an extra
    distinct-scan job just to discover the column set; with them the
    whole pivot is a single shuffled aggregation (each value becomes a
    conditional aggregate, exactly what the oracle's FILTER clauses
    express). Missing combinations are coalesced to 0 on both sides."""
    o = load_table(spark, sf_dir, "orders")
    counted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    avg = o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )
    return (
        counted.join(avg, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
            "avg_price",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_unpivot_metrics",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 4)      AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(sum(l_discount), 4)      AS sum_disc
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): per-flag aggregates melted to (metric,
    value) rows with Spark's native ``unpivot`` — a zero-shuffle
    projection (each input row fans to k output rows in place), so the
    only shuffle in the plan is the upstream aggregation. The oracle's
    UNION-of-selects over a shared CTE is the relational spelling of
    the same reshape."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "metric",
        "value",
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_mode,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY count(*) DESC, o_orderstatus
               ) AS rn
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, n_mode
    FROM counted WHERE rn = 1
    ORDER BY o_orderpriority
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode. Built-in ``mode()`` (both engines)
    is free to return EITHER value on a tie — a hash-gate landmine —
    so the mode is spelled as count + rank with an explicit tie-break
    (highest count, then smallest value). Two shuffles (count by
    (group, value), then rank within group), both on small aggregated
    data; at 100 TB the first shuffle moves one row per distinct
    (group, value), not per input row, thanks to partial aggregation."""
    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_mode")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n_mode").desc(), F.col("o_orderstatus")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "n_mode",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_string_agg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           count(*)                                    AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): nations per region as a
    deterministic comma-joined list. Spark spells the ordering as
    ``array_sort(collect_list(...))`` — sort INSIDE each group's
    collected array, not a global orderBy, so the plan is one shuffled
    aggregation. The scalar string output keeps the driver comparator
    happy (no array columns, per the repo rule). collect_list buffers
    a group in memory — fine for bounded groups like dimension
    rollups; unbounded-group concatenation is an anti-pattern at scale
    regardless of engine."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "q_ts_ohlc",
    oracle="""
    WITH ranked AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
               value,
               row_number() OVER (
                   PARTITION BY time_bucket(INTERVAL '15 minutes', ts)
                   ORDER BY ts, event_id
               ) AS rn_first,
               row_number() OVER (
                   PARTITION BY time_bucket(INTERVAL '15 minutes', ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_last
        FROM events
    )
    SELECT bucket_start,
           round(max(CASE WHEN rn_first = 1 THEN value END), 4) AS open,
           round(max(value), 4)                                 AS high,
           round(min(value), 4)                                 AS low,
           round(max(CASE WHEN rn_last = 1 THEN value END), 4)  AS close,
           count(*)                                             AS n_ticks
    FROM ranked
    GROUP BY bucket_start
    ORDER BY bucket_start
    """,
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to 15-minute OHLC bars. Open/close are
    ``min_by``/``max_by`` over the composite (ts, event_id) order key —
    tie-broken deterministically, computed in the SAME single shuffled
    aggregation as high/low/count (no window pass, no second shuffle).
    The oracle spells first/last with rank windows, the portable
    equivalent. This is the hypertable-rollup shape: at 100 TB the
    partial aggregation reduces each scan partition to one row per
    bucket before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .select(F.col("w.start").alias("bucket_start"), "open", "high", "low", "close", "n_ticks")
        .orderBy("bucket_start")
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH w AS (
        SELECT user_id, ts,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    )
    SELECT CAST(date_trunc('week', first_ts) AS TIMESTAMP) AS cohort_week,
           CAST(floor(date_diff('day', CAST(first_ts AS DATE), CAST(ts AS DATE)) / 7)
                AS BIGINT)                                 AS weeks_since,
           count(DISTINCT user_id)                         AS n_users
    FROM w
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by the week of their first
    event, counted in each subsequent week they remain active — the
    canonical retention triangle. The per-user first timestamp is a
    window minimum, NOT a self-join back to a grouped min: one shuffle
    on user_id serves both the cohort assignment and the activity
    rows. The distinct-count then shuffles only (cohort, week, user)
    triples. Weeks (not months) because the corpus spans one month."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        e.select("user_id", "ts", F.min("ts").over(w).alias("first_ts"))
        .select(
            F.date_trunc("week", "first_ts").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7
            ).alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id
    ), conv AS (
        SELECT s.user_id, s.signup_ts,
               min(p.ts) AS first_purchase_ts
        FROM s LEFT JOIN events p
          ON p.user_id = s.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= s.signup_ts
        GROUP BY s.user_id, s.signup_ts
    )
    SELECT CAST(date_trunc('week', signup_ts) AS TIMESTAMP) AS signup_week,
           count(*)                                         AS n_signups,
           CAST(count(*) FILTER (
               WHERE first_purchase_ts IS NOT NULL
                 AND first_purchase_ts <= signup_ts + INTERVAL 7 DAY
           ) AS BIGINT)                                     AS n_converted
    FROM conv
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: of users who signed up, how many purchased
    within 7 days — grouped by signup week. Signups reduce to one row
    per user BEFORE the join (min-aggregate), so the join moves
    |users| rows against the purchase stream on the user_id key; the
    within-window test is a residual on the joined rows and the
    re-aggregation keeps only (user, first purchase). No event-level
    cross products anywhere — the shape that survives a 100 TB event
    log. Conversion is counted with a FILTER-style conditional."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(
            p,
            (s.user_id == p.p_user) & (p.p_ts >= s.signup_ts),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    converted = (
        F.col("first_purchase_ts").isNotNull()
        & (F.col("first_purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
    )
    return (
        conv.groupBy(F.date_trunc("week", "signup_ts").alias("signup_week"))
        .agg(
            F.count("*").alias("n_signups"),
            F.sum(F.when(converted, 1).otherwise(0)).cast("long").alias("n_converted"),
        )
        .orderBy("signup_week")
    )


def basket_pair_counts(items: DataFrame, basket_col: str, item_col: str,
                       *, max_basket_items: int = 256) -> DataFrame:
    """Co-occurrence pair counts via join-free per-basket expansion.

    Each basket's (deduped, sorted) item set is collected in one
    shuffle and the C(k,2) pairs expanded JVM-side — quadratic ONLY in
    items-per-basket. ``max_basket_items`` bounds that quadratic: one
    adversarial mega-basket (k=10⁶ → 5·10¹¹ struct pairs in a single
    task) would otherwise stall the stage at scale, the same
    degenerate-key blow-up operators/dedup.py caps in LSH buckets.
    Baskets over the cap are DROPPED (documented truncation — a basket
    with >256 distinct items carries no pairwise signal worth a
    quadratic task; same rationale as dropping oversized LSH buckets).
    """
    return (
        items.groupBy(basket_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("parts"))
        .where(F.size("parts") <= max_basket_items)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("pair")
        )
        .select("pair.part_a", "pair.part_b")
    )


@query(
    "q_basket_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often
    ordered together. NOT a self-join: each order's (deduped, sorted)
    item set is collected in one shuffle and the C(k,2) pairs are
    expanded JVM-side with array transforms — quadratic only in
    items-per-order, and the
    items table is shuffled ONCE instead of the 3-4 exchanges a
    distinct + self-join plan needs (measured 2.2 s → the join-free
    plan at sf0.1; the gap widens at cluster scale where the join
    can't broadcast). Degenerate mega-baskets are bounded by
    basket_pair_counts' 256-item cap (never hit on TPC-H's ≤7-line
    orders, so the oracle needs no matching filter — pinned by
    tests/test_r4b_props.py). sort_array over collect_set guarantees
    part_a < part_b without a filter. Top-k goes through
    orderBy+limit → TakeOrdered (per-partition heaps, no global
    sort), with (count, part_a, part_b) as the total tie-broken
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = basket_pair_counts(li, "l_orderkey", "l_partkey")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q_agg_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med_value
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(any_value(m.med_value), 4)                        AS median_value,
           round(quantile_cont(abs(e.value - m.med_value), 0.5), 4) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust-statistics
    twin of q_agg_stats' stddev (outlier-resistant spread, the right
    dispersion measure for heavy-tailed LLM-corpus metrics like
    document lengths). Necessarily two passes (the second median is
    over deviations from the first); the group-median table is tiny
    and broadcast back, so the second pass adds no extra shuffle of
    the fact rows beyond its own aggregation. Spark `percentile` ==
    DuckDB `quantile_cont` (both linear-interpolating, per
    q_agg_percentile_exact)."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy(F.col("event_type").alias("m_type")).agg(
        F.percentile("value", F.lit(0.5)).alias("med_value")
    )
    return (
        e.join(F.broadcast(med), e.event_type == med.m_type)
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med_value"), 4).alias("median_value"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med_value")), F.lit(0.5)),
                4,
            ).alias("mad"),
        )
        .orderBy("event_type")
    )


@query(
    "q_join_asof_fwd",
    oracle="""
    WITH tagged AS (
        SELECT o_orderkey AS order_key, o_custkey AS cust, o_orderdate AS odate,
               NULL::BIGINT AS eid, NULL::TIMESTAMP AS ets, 0 AS is_evt
        FROM orders
        UNION ALL
        SELECT NULL, user_id, ts, event_id, ts, 1
        FROM events
    ), filled AS (
        SELECT order_key, cust, odate,
               min(CASE WHEN is_evt = 1 THEN ets END) OVER (
                   PARTITION BY cust ORDER BY odate, is_evt, eid
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_ts,
               is_evt
        FROM tagged
    )
    SELECT order_key, cust AS o_custkey, odate AS o_orderdate, next_ts
    FROM filled
    WHERE is_evt = 0
    """,
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each order, the EARLIEST event of the
    same key at-or-after the order date — the mirror of q_join_asof
    (backward), completing the as-of pair every time-series engine
    ships. Same scalable shape: union both streams, one shuffle on
    the key, running min over the forward window — no candidate join,
    no per-key quadratic term. Orders sort before events at equal
    timestamps (is_evt ascending) so an exactly-coincident event
    qualifies."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("odate"),
        F.lit(None).cast("bigint").alias("eid"),
        F.lit(None).cast("timestamp").alias("ets"),
        F.lit(0).alias("is_evt"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit(None).cast("bigint").alias("order_key"),
        F.col("user_id").alias("cust"),
        F.col("ts").alias("odate"),
        F.col("event_id").alias("eid"),
        F.col("ts").alias("ets"),
        F.lit(1).alias("is_evt"),
    )
    w = (
        Window.partitionBy("cust")
        .orderBy("odate", "is_evt", "eid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        o.unionByName(e)
        .withColumn(
            "next_ts",
            F.min(F.when(F.col("is_evt") == 1, F.col("ets"))).over(w),
        )
        .filter(F.col("is_evt") == 0)
        .select("order_key", F.col("cust").alias("o_custkey"), F.col("odate").alias("o_orderdate"), "next_ts")
    )
