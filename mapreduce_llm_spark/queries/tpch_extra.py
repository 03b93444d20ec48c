"""Remaining TPC-H-shaped macro queries (Q1/Q2/Q4/Q6/Q7/Q8/Q9/Q11/
Q13/Q15/Q16/Q17/Q20/Q21/Q22 shapes, plus the one-pass Q21 rewrite),
adapted to the synthetic schema.

Together with tpch_macro.py this completes all 22 TPC-H query shapes —
the composition stress-tests for Catalyst (decorrelation, join
reordering, broadcast selection, partial aggregation, semi/anti joins).

Schema adaptations (the synthetic tables lack some TPC-H columns):
- no partsupp table → lineitem is the part↔supplier bridge, and
  ``0.6 * p_retailprice`` (Q9/Q11/Q20) or the per-(part, supplier)
  average unit price (Q2) stands in for ps_supplycost.
- no l_commitdate / l_receiptdate → "late" means
  ``l_shipdate > o_orderdate + N days`` (Q4/Q21).
- no c_phone → ``c_nationkey`` stands in for the country code (Q22).
- no p_container → p_type/p_brand filters instead (Q16/Q17).

Correlated/EXISTS shapes deliberately go through ``spark.sql`` so
Catalyst's decorrelation (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery → semi/anti join) is what executes — the same
declarative plan a user would write, not a hand-lowered join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                     AS sum_qty,
           round(sum(l_extendedprice), 4)                                AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 4)             AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4)                                     AS avg_qty,
           round(avg(l_extendedprice), 4)                                AS avg_price,
           round(avg(l_discount), 4)                                     AS avg_disc,
           count(*)                                                      AS n_lines
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1): the canonical wide scan-aggregate.
    One pass over the fact, 8 aggregates, 6-group output — partial
    aggregation does nearly all the work map-side, so the shuffle
    carries ~6 rows per task regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape; late = shipped >60 days
    after order, standing in for commit<receipt). The EXISTS becomes a
    left-semi join on l_orderkey — the date-band filter prunes orders
    before the semi join, and the semi join short-circuits per key, so
    lineitem is never materialized per-order."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q_tpch_q6_shape",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue change (TPC-H Q6): pure scan-filter-aggregate,
    no join, no groups. All three predicates push to the parquet scan
    (shipdate band is a row-group pruner); the agg is a single global
    partial+final — the cheapest possible plan shape."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_tpch_q7_shape",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral volume shipping (TPC-H Q7): the two-nation disjunction
    across both ends of the supply chain. Both nation dims broadcast;
    the nation-pair disjunction is a join residual (it references both
    sides), evaluated after two broadcast joins — no shuffle beyond the
    fact-chain equi-joins."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8_shape",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): 8-table star, share-of-total
    ratio per year from ONE aggregation pass (conditional sum over
    total sum). Part/supplier/nation/region all broadcast after their
    filters; only the orders⋈lineitem fact join shuffles."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q9_shape",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape; ``0.6 * p_retailprice``
    stands in for ps_supplycost — no partsupp table). The LIKE filter
    prunes part before its broadcast; profit is computed inline in the
    aggregate, one fact pass."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@query(
    "q_tpch_q11_shape",
    oracle="""
    WITH stock AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey = 7
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 4) AS value
    FROM stock
    WHERE value > (SELECT 0.01 * sum(value) FROM stock)
    ORDER BY value DESC, l_partkey
    """,
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape; lineitem value
    per part stands in for partsupp availqty×supplycost). The shared
    subaggregate feeds both the per-part values and the global
    threshold; the static plan shows the CTE branch twice, but AQE
    reuses the aggregation exchange at runtime (pinned by
    test_q11_reuses_stock_exchange_at_runtime) so the base agg
    executes once, not twice."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH stock AS (
            SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey = 7
            GROUP BY l_partkey
        )
        SELECT l_partkey, round(value, 4) AS value
        FROM stock
        WHERE value > (SELECT 0.01 * sum(value) FROM stock)
        ORDER BY value DESC, l_partkey
        """
    )


@query(
    "q_tpch_q13_shape",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): left join keeps
    zero-order customers (count(o_orderkey) ignores their NULLs), then
    a second tiny aggregation histograms the counts. The join-side
    filter lives in the JOIN condition, not WHERE — moving it to WHERE
    would silently drop the zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q15_shape",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15): the view-plus-scalar-max shape. The
    max is a 1-row scalar subquery broadcast into the filter; supplier
    is a broadcast dim. Unlike Q11, the scalar subquery aggregates the
    CTE further (max over the agg), and Spark executes that subquery
    plan independently — the revenue agg runs twice here. At 100 TB
    you'd materialize the revenue view first (persist / temp table)
    and run both consumers against it; at a 100-supplier dim the
    duplicate agg is noise, so the query keeps the declarative form."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@query(
    "q_tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part group (TPC-H Q16 shape; lineitem is
    the part↔supplier bridge, negative-balance suppliers stand in for
    the complaints exclusion). NOT IN over a non-nullable key column
    lowers to an anti join; count(DISTINCT) expands per-group — both
    keys shuffle once."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@query(
    "q_tpch_q17_shape",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape; p_type filter
    stands in for p_container). The correlated avg decorrelates into a
    per-partkey aggregate joined back on the correlation key — one
    extra shuffle on l_partkey, not a per-row subquery."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND p_type = 'SMALL'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
        """
    )


@query(
    "q_tpch_q20_shape",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    ) AND s_nationkey = 5
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-inventory suppliers (TPC-H Q20 shape; shipped volume per
    supplier stands in for partsupp availqty). IN-subquery over a
    HAVING-filtered aggregate → aggregate first (tiny survivor set),
    then a broadcast left-semi join against the 100-row supplier dim."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%bolt%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100
        ) AND s_nationkey = 5
        ORDER BY s_suppkey
        """
    )


@query(
    "q_tpch_q21_shape",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape; late =
    shipped >90 days after order date, standing in for
    receipt>commit). The EXISTS/NOT EXISTS pair lowers to a left-semi
    plus a left-anti join on l_orderkey — the classic
    sole-late-supplier-in-a-multi-supplier-order identification, three
    scans of lineitem joined on one key."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


@query(
    "q_tpch_q22_shape",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS cntry,
           count(*) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9)
      AND c_acctbal > (
          SELECT avg(c_acctbal) FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape; c_nationkey stands in
    for the phone country code). Scalar-avg subquery broadcasts into
    the filter; NOT EXISTS lowers to a left-anti join against orders
    projected to its key column only."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT CAST(c_nationkey AS BIGINT) AS cntry,
               count(*) AS numcust,
               round(sum(c_acctbal), 4) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9)
          AND c_acctbal > (
              SELECT avg(c_acctbal) FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_nationkey
        ORDER BY cntry
        """
    )


@query(
    "q_tpch_q21_onepass",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 rewritten to ONE lineitem scan (vs q_tpch_q21_shape's three).

    The EXISTS/NOT-EXISTS formulation re-reads lineitem per predicate;
    at 100 TB the fact scan dominates, so the rewrite folds all three
    conditions into one per-order aggregation:
      - n_supp        = count(DISTINCT suppkey)        (≥2 ⇔ the EXISTS)
      - n_late_supp   = count(DISTINCT late suppkey)   (=1 ⇔ the NOT EXISTS)
      - late_suppkey  = max(late suppkey)              (well-defined when =1)
      - n_late_lines  = count(late lines)              (what Q21 counts)
    A surviving order contributes its n_late_lines to its sole late
    supplier. Same oracle as the EXISTS version — the rewrite is
    hash-proven equivalent, with a plan test pinning the single scan
    (test_q21_onepass_scans_lineitem_once).

    The distinct counts run as a CASCADED aggregation — per
    (order, supplier) first, then per order — NOT as two
    count(DISTINCT) in one agg: multi-distinct aggregates make
    Catalyst Expand every input row once per distinct column (3×
    shuffle volume on the joined fact, measurably slower than the
    3-scan plan at sf0.1). The cascade's first shuffle reduces to one
    row per (order, supplier) pair; the second reshuffles only those
    reduced rows on a prefix of the same key (no expand anywhere)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, F.lit(1))).alias("n_late_lines"))
    )
    is_late_supp = F.col("n_late_lines") > 0
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.count(F.when(is_late_supp, F.lit(1))).alias("n_late_supp"),
            F.max(F.when(is_late_supp, F.col("l_suppkey"))).alias("late_suppkey"),
            F.sum("n_late_lines").alias("n_late_lines"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(s, per_order.late_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@query(
    "q_tpch_q2_shape",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               round(avg(l_extendedprice / l_quantity), 4) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s_acctbal, 4) AS acctbal, s_name, n_name, p_partkey,
           unit_cost
    FROM part
    JOIN cost     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND unit_cost = (
          SELECT min(c2.unit_cost)
          FROM cost c2
          JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape — the last of the 22;
    per-(part, supplier) average lineitem unit price stands in for
    ps_supplycost). The correlated min subquery over the same
    region-filtered cost relation decorrelates into a per-part min
    aggregate joined back on p_partkey — Catalyst computes the cost
    CTE's shuffle once and the min branch reuses it at runtime (same
    AQE exchange-reuse behavior pinned for Q11). Four-level sort with
    the unique p_partkey as the final tie-break (CLAUDE.md tie rule)."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(
        """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   round(avg(l_extendedprice / l_quantity), 4) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT round(s_acctbal, 4) AS acctbal, s_name, n_name, p_partkey,
               unit_cost
        FROM part
        JOIN cost     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
          AND unit_cost = (
              SELECT min(c2.unit_cost)
              FROM cost c2
              JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
              JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
              WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )
