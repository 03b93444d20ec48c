"""Join queries (SURVEY.md §2C "Joins").

The reference has no joins (its reduce is ordered concatenation,
reference internal/cli/mapreduce.go:131-137); these give the engine the
full join surface. Scale notes per flavor:

- Dimension tables (region/nation/supplier, and customer at most SFs)
  are broadcast — no shuffle of the fact side at any scale. Catalyst
  auto-broadcasts under the threshold; q_join_broadcast pins it with an
  explicit hint so the plan survives a 100× dim growth.
- Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew splitting. At 100 TB both sides would be bucketed on
  orderkey at rest, turning this into a zero-shuffle sort-merge join.
- The as-of join is expressed as window-over-union rather than a
  cross-product candidate join, so cost is O(n log n) per key, not
  O(n·m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT
        o.o_orderkey,
        o.o_orderdate,
        round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
        count(*) AS n_lines
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact⋈fact — Catalyst picks SMJ/SHJ; the filter on
    orders prunes before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_join_multi",
    oracle="""
    SELECT
        r.r_name,
        n.n_name,
        count(*)                         AS n_orders,
        round(sum(o.o_totalprice), 4)    AS sum_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star join. nation/region (fixed 25/5 rows) carry an
    explicit broadcast hint; customer SCALES with SF so its join is
    left AQE-decided — at bench SF the runtime size is under the
    broadcast threshold and AQE still picks BroadcastHashJoin, while at
    the 100-TB design point the same plan degrades gracefully to a
    shuffle join instead of forcing a multi-GB broadcast build
    (round-9 verdict finding #1; the kcore sf10 OOM lesson,
    operators/graph.py:190)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT
        n.n_name,
        count(*)                      AS n_suppliers,
        round(sum(s.s_acctbal), 4)    AS sum_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of a small dim — zero shuffle on the
    probe side regardless of its size."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("sum_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "q_join_left",
    oracle="""
    SELECT
        c.c_custkey,
        c.c_name,
        count(o.o_orderkey)                        AS n_orders,
        round(coalesce(sum(o.o_totalprice), 0), 4) AS sum_price
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (count=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 4).alias("sum_price"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS — emits each qualifying customer once,
    never multiplies rows; build side reduced by the predicate first."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS — customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT
        s.s_suppkey,
        c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey
     AND c.c_acctbal > s.s_acctbal
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/theta join: equi key (nationkey) plus a range predicate.
    The equi conjunct keeps it a hash join with a residual filter —
    never a cartesian product — so it scales linearly in matches."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal),
    ).select("s_suppkey", "c_custkey")


@query(
    "q_join_asof",
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
               max(CASE WHEN is_evt = 1 THEN ets END) OVER (
                   PARTITION BY cust ORDER BY odate, is_evt DESC, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS asof_ts,
               is_evt
        FROM tagged
    )
    SELECT order_key, cust AS o_custkey, odate AS o_orderdate, asof_ts
    FROM filled
    WHERE is_evt = 0
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the latest event timestamp of the
    same key at-or-before the order date.

    Implemented as union + running max over a window rather than a
    range-candidate join: one shuffle on the key, O(n log n) per key,
    no candidate blow-up — the scalable shape (a candidate join is
    quadratic on hot keys). The reference has no joins at all; this is
    the §2C generalization.
    """
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
        .orderBy(F.col("odate").asc(), F.col("is_evt").desc(), F.col("eid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = o.unionByName(e).withColumn(
        "asof_ts", F.max(F.when(F.col("is_evt") == 1, F.col("ets"))).over(w)
    )
    return u.filter(F.col("is_evt") == 0).select(
        "order_key",
        F.col("cust").alias("o_custkey"),
        F.col("odate").alias("o_orderdate"),
        "asof_ts",
    )


@query(
    "q_join_shufflehash",
    oracle="""
    SELECT p_brand,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 4) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_join_shufflehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit shuffle-hash join (SHUFFLE_HASH hint): builds a hash
    table per partition instead of sorting both sides — wins over
    sort-merge when one side is much smaller per key but too big to
    broadcast. The hint is a strategy override, not a semantics change:
    the oracle is the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand").hint(
        "shuffle_hash"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_join_full",
    oracle="""
    WITH big_cust AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) >= 20
    ),
    active AS (
        SELECT CAST(user_id AS BIGINT) AS user_id, count(*) AS n_events
        FROM events GROUP BY user_id HAVING count(*) >= 40
    )
    SELECT coalesce(o_custkey, user_id) AS entity_id,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events,
           CASE WHEN o_custkey IS NULL THEN 'events_only'
                WHEN user_id IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM big_cust
    FULL OUTER JOIN active ON o_custkey = user_id
    ORDER BY entity_id
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — both unmatched sides preserved, the reconcile
    shape (orders vs event activity per entity). Spark plans FO joins
    as SMJ (no broadcast variant exists for full outer on both sides);
    the coalesced key + presence class makes row provenance explicit
    and hash-checkable."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    big = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
    )
    act = (
        e.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= 40)
    )
    j = big.join(act, big.o_custkey == act.user_id, "full_outer")
    return j.select(
        F.coalesce("o_custkey", "user_id").alias("entity_id"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("o_custkey").isNull(), "events_only")
        .when(F.col("user_id").isNull(), "orders_only")
        .otherwise("both")
        .alias("presence"),
    ).orderBy("entity_id")
