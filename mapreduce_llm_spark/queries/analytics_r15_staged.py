"""Round-15 STAGED surface — seed tranche.

Same staged-tranche contract the round-9..14 batches followed before
their flips (analytics_r13_staged → queries/analytics_r13.py in
round 14; analytics_r14_staged flips in round 15): the round-14 window
is fully allocated (50 pre-drafted pairs in ROUND14_WINDOW), so surface
built beyond that point stages HERE and flips in round 16. Every entry
is a complete (query fn, DuckDB oracle) pair hash-proven NOW at sf0.01
and the sf0.1 sweep env by tests/test_r15_staged.py through the same
harness the driver gate uses. NOT imported by registry.load_all —
importing this module must stay registry-side-effect free (pinned by
the staging test).

Determinism discipline: identical to the r9..r14 staging — exact
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

#: name -> (query fn, DuckDB oracle SQL); round 16 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R15: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R15:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R15[name] = (fn, oracle)
        return fn

    return deco


def _r15_words(col):
    """Lowercased alpha word array — the shared tokenization of the
    text queries (the _r14_words twin, kept module-local so the staged
    modules stay import-independent)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda w: w != F.lit("")
    )


# ---------------------------------------------------------------------------
# Tranche 1 — order-flow / queueing science. The order book is a queue
# (arrivals = o_orderdate, departures = last shipment); none of the 685
# existing queries audits it AS a queue: Little's law, first-ship
# latency (vs the registered first-to-last span), monthly flow
# conservation, value-weighted WIP, and the keyspace-density audit
# range partitioning starts from.
# ---------------------------------------------------------------------------


@_staged(
    "q_little_law",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS a,
               greatest(max(CAST(l_shipdate AS DATE)),
                        CAST(o_orderdate AS DATE)) AS c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
    ),
    arrivals AS (
        SELECT CAST(date_trunc('month', a) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS arrivals,
               CAST(sum(date_diff('day', a, c) + 1) AS BIGINT) AS span_sum
        FROM per_order GROUP BY 1
    ),
    open_days AS (
        SELECT month,
               CAST(sum(date_diff('day',
                   greatest(a, CAST(month AS DATE)),
                   least(c, CAST((month + INTERVAL 1 MONTH
                                  - INTERVAL 1 DAY) AS DATE))) + 1)
                   AS BIGINT) AS overlap_days
        FROM (
            SELECT a, c,
                   unnest(generate_series(
                       CAST(date_trunc('month', a) AS TIMESTAMP),
                       CAST(date_trunc('month', c) AS TIMESTAMP),
                       INTERVAL 1 MONTH)) AS month
            FROM per_order) x
        GROUP BY month
    )
    SELECT a.month, a.arrivals,
           CAST(a.span_sum * 10000 // a.arrivals AS BIGINT)
               AS w_mean_days_e4,
           CAST(coalesce(o.overlap_days, 0) * 10000
                // date_diff('day', CAST(a.month AS DATE),
                             CAST((a.month + INTERVAL 1 MONTH) AS DATE))
               AS BIGINT) AS l_avg_open_e4,
           CAST(coalesce(o.overlap_days, 0) * 10000 // a.span_sum
               AS BIGINT) AS littles_ratio_e4
    FROM arrivals a LEFT JOIN open_days o ON a.month = o.month
    ORDER BY a.month
    """,
)
def q_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law audit of the order book, month by month: L (average
    open orders, exact open-order-days within the month / days in
    month) against λ·W (arrivals × mean time-in-system of that month's
    arrivals). The two agree only in steady state, so littles_ratio_e4
    IS the boundary-effect/ramp fingerprint — the number a capacity
    planner checks before trusting any W-from-L inference. An order is
    open on [orderdate, last shipment] (clamped below by orderdate for
    ship-before-order anomalies — q_date_sanity counts those).

    Scale: one order-level aggregate (hash partial+final on orderkey),
    then a bounded month explode (spans are weeks-to-months, so ≤ a
    handful of rows per order — linear, never quadratic), then a
    by-month aggregate whose output is the calendar (≤ ~90 rows). All
    integer sums; e4 via nonneg integer division. No window, no join
    wider than the calendar."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("a"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("c_raw"))
        .select("a", F.greatest("c_raw", "a").alias("c"))
    )
    arrivals = per_order.groupBy(
        F.date_trunc("month", F.col("a").cast("timestamp")).alias("month")
    ).agg(
        F.count("*").cast("long").alias("arrivals"),
        F.sum(F.datediff("c", "a") + F.lit(1)).cast("long").alias("span_sum"),
    )
    open_days = (
        per_order.select(
            "a",
            "c",
            F.explode(
                F.sequence(
                    F.date_trunc("month", F.col("a").cast("timestamp")),
                    F.date_trunc("month", F.col("c").cast("timestamp")),
                    F.expr("interval 1 month"),
                )
            ).alias("month"),
        )
        .groupBy("month")
        .agg(
            F.sum(
                F.datediff(
                    F.least(F.col("c"), F.last_day(F.col("month"))),
                    F.greatest(F.col("a"), F.col("month").cast("date")),
                )
                + F.lit(1)
            )
            .cast("long")
            .alias("overlap_days")
        )
    )
    # integer `div` on both sides — `/` promotes to double and the
    # long-cast then truncates vs DuckDB's floor (the CLAUDE.md
    # q_histogram_error rule); every operand here is nonneg
    return (
        arrivals.join(open_days, "month", "left")
        .select(
            "month",
            "arrivals",
            F.expr("span_sum * 10000 div arrivals")
            .cast("long")
            .alias("w_mean_days_e4"),
            F.expr(
                "coalesce(overlap_days, 0) * 10000"
                " div datediff(add_months(cast(month as date), 1),"
                "              cast(month as date))"
            )
            .cast("long")
            .alias("l_avg_open_e4"),
            F.expr("coalesce(overlap_days, 0) * 10000 div span_sum")
            .cast("long")
            .alias("littles_ratio_e4"),
        )
        .orderBy("month")
    )


@_staged(
    "q_first_ship_latency",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey, o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         min(CAST(l_shipdate AS DATE))) AS lat_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE)
    ),
    r AS (
        SELECT o_orderpriority, lat_days,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY lat_days, o_orderkey) AS rk,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM per_order
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN lat_days END)
                AS BIGINT) AS median_latency_days,
           CAST(max(CASE WHEN rk = (n * 90 + 99) // 100 THEN lat_days END)
                AS BIGINT) AS p90_latency_days,
           CAST(min(lat_days) AS BIGINT) AS min_latency_days
    FROM r
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_first_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-FIRST-shipment latency per priority: exact median/p90
    of the days until the first line leaves the door — the customer's
    perceived responsiveness. The registered fulfilment family
    measures everything else (q_ship_delay raw per-line delays,
    q_fulfillment_span first-to-last stretch, q_sla_attainment
    within-K shares, q_otif order promises) but not the first-response
    clock; min_latency_days doubles as the ship-before-order floor
    (negative ⇔ the q_date_sanity anomaly). Same binomial-rank exact
    percentile construction as q_fulfillment_span: one order-level
    aggregate, then a 5-partition keyed window — never a global
    sort."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("a"),
        )
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("first_ship"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.datediff("first_ship", "a").alias("lat_days"),
        )
    )
    wp = Window.partitionBy("o_orderpriority")
    r = per_order.select(
        "o_orderpriority",
        "lat_days",
        F.row_number().over(wp.orderBy("lat_days", "o_orderkey")).alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.max(
                F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("lat_days"))
            )
            .cast("long")
            .alias("median_latency_days"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(n * 90 + 99) div 100"),
                    F.col("lat_days"),
                )
            )
            .cast("long")
            .alias("p90_latency_days"),
            F.min("lat_days").cast("long").alias("min_latency_days"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "q_ship_rate_balance",
    oracle="""
    WITH flows AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS ordered, CAST(0 AS BIGINT) AS shipped
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1
        UNION ALL
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
        FROM lineitem
        GROUP BY 1
    ),
    monthly AS (
        SELECT month, CAST(sum(ordered) AS BIGINT) AS lines_ordered,
               CAST(sum(shipped) AS BIGINT) AS lines_shipped
        FROM flows GROUP BY month
    )
    SELECT month, lines_ordered, lines_shipped,
           CASE WHEN lines_ordered = 0 THEN NULL
                ELSE CAST(lines_shipped * 10000 // lines_ordered AS BIGINT)
           END AS ship_ratio_e4,
           CAST(sum(lines_ordered - lines_shipped)
                OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS cum_backlog_lines
    FROM monthly
    ORDER BY month
    """,
)
def q_ship_rate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly flow conservation of the fulfilment queue: lines
    entering (their order booked this month) vs lines leaving
    (shipped this month), the in-month throughput ratio, and the
    cumulative backlog the imbalances integrate to — the flow-level
    companion to q_open_orders_curve's order-level WIP (a queue can
    hold few orders but many unshipped lines). The first/last horizon
    months are the ramp; cum_backlog_lines returning to ~0 at the
    horizon end is the conservation check.

    Scale: two independent fact aggregations (each partial+final,
    calendar-sized output) unioned BEFORE the monthly re-aggregate;
    the running sum then runs over the ~85-row aggregated calendar —
    the q_orders_running_share small-frame-window precedent, harmless
    at any input scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ordered = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").cast("long").alias("ordered"))
        .select("month", "ordered", F.lit(0).cast("long").alias("shipped"))
    )
    shipped = (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(F.count("*").cast("long").alias("shipped"))
        .select("month", F.lit(0).cast("long").alias("ordered"), "shipped")
    )
    monthly = (
        ordered.unionByName(shipped)
        .groupBy("month")
        .agg(
            F.sum("ordered").cast("long").alias("lines_ordered"),
            F.sum("shipped").cast("long").alias("lines_shipped"),
        )
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        monthly.select(
            "month",
            "lines_ordered",
            "lines_shipped",
            F.when(
                F.col("lines_ordered") != 0,
                F.expr("lines_shipped * 10000 div lines_ordered"),
            )
            .cast("long")
            .alias("ship_ratio_e4"),
            F.sum(F.col("lines_ordered") - F.col("lines_shipped"))
            .over(w)
            .cast("long")
            .alias("cum_backlog_lines"),
        )
        .orderBy("month")
    )


@_staged(
    "q_wip_value_days",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               date_diff('day', CAST(o_orderdate AS DATE),
                   greatest(max(CAST(l_shipdate AS DATE)),
                            CAST(o_orderdate AS DATE))) + 1 AS span_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderpriority, o_totalprice,
                 CAST(o_orderdate AS DATE)
    ),
    agg AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(cents * span_days AS HUGEINT)) AS wip,
               sum(CAST(cents AS HUGEINT)) AS cents_sum
        FROM per_order GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_orders,
           CAST(floor(CAST(wip AS DOUBLE) * 10000.0
                      / CAST(sum(wip) OVER () AS DOUBLE)) AS BIGINT)
               AS wip_share_e4,
           CAST(floor(CAST(wip AS DOUBLE) * 10000.0
                      / CAST(cents_sum AS DOUBLE)) AS BIGINT)
               AS value_weighted_days_e4
    FROM agg
    ORDER BY o_orderpriority
    """,
)
def q_wip_value_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-weighted work-in-progress per priority: each order
    contributes (order value in cents) × (days open), the classic
    inventory-carrying integral — q_open_orders_curve counts open
    ORDERS; this weights them by the capital parked in flight, and
    value_weighted_days_e4 is the capital-weighted mean residence
    time (a big slow order dominates a dozen quick small ones).

    Determinism: cents×days products stay int64 per order, but their
    SUM passes int64 near sf10 (~1e17) and ×10⁴ certainly does, so
    both engines accumulate on DECIMAL(38,0)/HUGEINT and the two e4
    ratios are computed as ONE double floor((num::double · 10⁴) /
    den::double) — the CLAUDE.md q_bot_score/q_hhi_trend rule (exact
    decimal sums, one IEEE divide, floor-pinned). The 5-row window
    total runs over the aggregated frame only."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("a"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("c_raw"))
        .select(
            "o_orderpriority",
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
            (F.datediff(F.greatest("c_raw", "a"), F.col("a")) + F.lit(1)).alias(
                "span_days"
            ),
        )
    )
    agg = per_order.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.expr("CAST(cents * span_days AS DECIMAL(38,0))")).alias("wip"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents_sum"),
    )
    wall = Window.partitionBy()
    return (
        agg.select(
            "o_orderpriority",
            "n_orders",
            F.floor(
                F.col("wip").cast("double")
                * 10000.0
                / F.sum("wip").over(wall).cast("double")
            )
            .cast("long")
            .alias("wip_share_e4"),
            F.floor(
                F.col("wip").cast("double")
                * 10000.0
                / F.col("cents_sum").cast("double")
            )
            .cast("long")
            .alias("value_weighted_days_e4"),
        )
        .orderBy("o_orderpriority")
    )


@_staged(
    "q_key_density",
    oracle="""
    WITH bounds AS (
        SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders
    ),
    bucketed AS (
        SELECT CAST((o_orderkey - mn) * 16 // (mx - mn + 1) AS BIGINT)
                   AS bucket,
               o_orderkey
        FROM orders, bounds
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(count(*) * 10000 // sum(count(*)) OVER () AS BIGINT)
               AS share_e4,
           CAST(min(o_orderkey) AS BIGINT) AS lo_key,
           CAST(max(o_orderkey) AS BIGINT) AS hi_key
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_key_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyspace-density audit: o_orderkey occupancy across 16
    equal-WIDTH slices of [min, max] — TPC-H deliberately uses only
    every 1-in-4 orderkey block, and any range partitioner (or
    BETWEEN-pruning reader) sized on uniform-keyspace assumptions
    inherits that skew. share_e4 far from 625 per bucket quantifies
    it; lo/hi_key expose the dead zones. Complements q_partition_advisor
    (row-count balance for hash layouts) with the RANGE-layout view.

    Scale: one 2-column scan aggregated twice (16-row output); the
    1-row bounds leg broadcasts (the allowlisted NLJ broadcast-scalar
    pattern); bucket arithmetic is nonneg integer division on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx")
    )
    bucketed = o.select("o_orderkey").crossJoin(F.broadcast(bounds))
    wall = Window.partitionBy()
    return (
        bucketed.select(
            F.expr("CAST((o_orderkey - mn) * 16 div (mx - mn + 1) AS BIGINT)")
            .alias("bucket"),
            "o_orderkey",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.min("o_orderkey").cast("long").alias("lo_key"),
            F.max("o_orderkey").cast("long").alias("hi_key"),
        )
        .select(
            "bucket",
            "n_keys",
            F.expr("n_keys * 10000")
            .cast("long")
            .alias("__num"),
            F.sum("n_keys").over(wall).cast("long").alias("__den"),
            "lo_key",
            "hi_key",
        )
        .select(
            "bucket",
            "n_keys",
            F.expr("__num div __den").cast("long").alias("share_e4"),
            "lo_key",
            "hi_key",
        )
    ).orderBy("bucket")
