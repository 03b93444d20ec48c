"""Aggregation queries (SURVEY.md §2C "Aggregations").

The reference has no aggregation operators (its reduce is ordered string
concatenation, reference internal/cli/mapreduce.go:131-137); these
generalize the engine to typed relational data. All are plain
``groupBy().agg()`` so Catalyst plans partial (map-side) + final
aggregation automatically — at 100 TB the partial agg collapses the
shuffle to |groups| × |partitions| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_agg_basic",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 4)                                   AS sum_qty,
        round(sum(l_extendedprice), 4)                              AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        round(avg(l_quantity), 4)                                   AS avg_qty,
        round(avg(l_extendedprice), 4)                              AS avg_price,
        round(avg(l_discount), 4)                                   AS avg_disc,
        count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the flagship query.

    Scan → filter (pushed to parquet) → project → hash-agg → sort: the
    spine the rest of the engine hangs on. Filter and the 7-column
    projection reach the parquet reader; the groupBy keys are
    low-cardinality (≤6 groups) so the shuffle is trivially small after
    partial aggregation regardless of input scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT
        o_orderpriority,
        count(DISTINCT o_custkey)              AS n_custs,
        count(DISTINCT o_orderstatus)          AS n_statuses,
        round(sum(DISTINCT o_totalprice), 4)   AS sum_distinct_price,
        count(*)                               AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) / sum(distinct) — Catalyst expands to a two-phase
    expand+agg plan; distinct-by-key stays fully parallel."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            F.round(F.sum_distinct(F.col("o_totalprice")), 4).alias("sum_distinct_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 4) AS sum_qty,
        count(*)                  AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_extendedprice), 4) AS sum_price,
        count(*)                       AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q_agg_gsets",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        round(sum(o_totalprice), 4) AS sum_price,
        count(*)                    AS n_rows
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst Expand node as
    rollup/cube; one pass over the data regardless of set count)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
            o_orderstatus,
            o_orderpriority,
            round(sum(o_totalprice), 4) AS sum_price,
            count(*)                    AS n_rows
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query("q_agg_approx")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct — rows-only (estimator differs from
    DuckDB's). The exact twin q_agg_distinct is the hash-checked one.
    At 100 TB this is the right default for cardinality dashboards:
    fixed-size sketch, no distinct-shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT
        l_returnflag,
        round(stddev_samp(l_quantity), 4)               AS sd_qty,
        round(var_samp(l_extendedprice), 2)             AS var_price,
        round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        round(quantile_cont(l_discount, 0.5), 4)        AS median_disc,
        round(min(l_quantity), 4)                       AS min_qty,
        round(max(l_quantity), 4)                       AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; exact percentile (not approx) so the
    oracle twin (quantile_cont) matches bit-for-bit after rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.percentile(F.col("l_discount"), F.lit(0.5)), 4).alias("median_disc"),
            F.round(F.min("l_quantity"), 4).alias("min_qty"),
            F.round(F.max("l_quantity"), 4).alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           round(o_totalprice, 4) AS latest_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max via struct ordering: each customer's latest order in ONE
    hash aggregation — max(struct(date, key, payload)) — instead of the
    window+filter plan the oracle uses (sort + full shuffle of every
    row). At 100 TB the agg form ships one partial row per key per
    task; ties broken by o_orderkey inside the struct, so the result is
    deterministic and identical to the window form.
    """
    o = load_table(spark, sf_dir, "orders")
    latest = F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("s")
    return (
        o.groupBy("o_custkey")
        .agg(latest)
        .select(
            "o_custkey",
            F.col("s.o_orderkey").alias("latest_orderkey"),
            F.round(F.col("s.o_totalprice"), 4).alias("latest_price"),
        )
    )


@query(
    "q_agg_stringagg",
    oracle="""
    SELECT n_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
           count(*) AS n_customers
    FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey, c_mktsegment
        FROM customer
    )
    GROUP BY n_nationkey
    ORDER BY n_nationkey
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list → array_sort →
    array_join, which makes the concatenation deterministic under any
    partitioning (collect order is not — sorting inside the agg row is
    what makes this distributable AND hash-stable)."""
    c = load_table(spark, sf_dir, "customer")
    distinct_pairs = c.select(
        F.col("c_nationkey").alias("n_nationkey"), "c_mktsegment"
    ).distinct()
    return (
        distinct_pairs.groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias("segs"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("n_nationkey")
    )


@query("q_agg_approx_quantile")
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) per group —
    the constant-memory twin of q_agg_stats' exact percentile; sketch
    estimates are engine-specific, hence rows-only (the exact variant
    is the hash-checked one)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("q"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("q", 1), 2).alias("p25"),
            F.round(F.element_at("q", 2), 2).alias("p50"),
            F.round(F.element_at("q", 3), 2).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_orderstatus = 'F')   AS any_final,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) — flag rollups in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_final"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_histogram",
    oracle="""
    WITH bounds AS (
        SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        FROM lineitem
    )
    SELECT LEAST(CAST(floor((l_extendedprice - lo) / ((hi - lo) / 20) ) AS INTEGER), 19)
               AS bucket,
           count(*) AS n,
           round(min(l_extendedprice), 4) AS lo_val,
           round(max(l_extendedprice), 4) AS hi_val
    FROM lineitem CROSS JOIN bounds
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram: global min/max as a broadcast
    scalar pair, bucket assignment fused into the scan, one count
    aggregation — the distributed histogram primitive (two passes, no
    sort; a sort-based histogram would shuffle the world)."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = F.broadcast(
        li.agg(
            F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
        )
    )
    width = (F.col("hi") - F.col("lo")) / 20
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - F.col("lo")) / width).cast("int"),
        F.lit(19),
    )
    return (
        li.crossJoin(bounds)
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 4).alias("lo_val"),
            F.round(F.max("l_extendedprice"), 4).alias("hi_val"),
        )
        .orderBy("bucket")
    )


@query(
    "q_profile_table",
    oracle="""
    SELECT 'l_quantity' AS col,
           count(*) AS n_rows,
           count(l_quantity) AS n_nonnull,
           count(DISTINCT l_quantity) AS n_distinct,
           round(min(l_quantity), 4) AS min_val,
           round(max(l_quantity), 4) AS max_val,
           round(avg(l_quantity), 4) AS avg_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(l_discount),
           count(DISTINCT l_discount),
           round(min(l_discount), 4), round(max(l_discount), 4),
           round(avg(l_discount), 4)
    FROM lineitem
    ORDER BY col
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (row/null/distinct counts, min/max/mean) — the
    data-quality report a pipeline runs before training. One pass per
    profiled batch of columns; all aggregates partial+final. At 100 TB
    swap count(DISTINCT) for approx_count_distinct (q_agg_approx) —
    kept exact here for the oracle."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col), 4).alias("min_val"),
            F.round(F.max(col), 4).alias("max_val"),
            F.round(F.avg(col), 4).alias("avg_val"),
        )

    return profile("l_quantity").unionByName(profile("l_discount")).orderBy("col")


@query(
    "q_agg_filter",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                                AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 100000)           AS n_big,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4)
               AS rev_filled,
           round(avg(o_totalprice) FILTER (WHERE year(o_orderdate) = 1997), 4)
               AS avg_1997
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates — several differently-filtered measures
    from ONE scan pass (the alternative, one subquery per filter, scans
    the fact N times). Spark SQL supports the standard FILTER (WHERE)
    syntax directly; each conditional aggregate partial-aggregates
    map-side like any sum."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*)                                      AS n_orders,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4)
                   AS rev_filled,
               round(avg(o_totalprice) FILTER (WHERE year(o_orderdate) = 1997), 4)
                   AS avg_1997
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query("q_agg_sketch_union")
def q_agg_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct counting via mergeable HLL sketches: per-nation
    customer sketches union up to region estimates WITHOUT re-touching
    the base data — the pattern that makes 100 TB distinct counts
    feasible (pre-aggregate sketches per partition/day, merge any
    rollup later; exact distinct would re-shuffle raw keys every time).
    Spark's hll_sketch_agg/hll_union_agg are Apache DataSketches HLLs:
    partial-aggregatable map-side like any sum. No DuckDB oracle (its
    approx estimator differs by design); correctness is pinned by a ≤5%
    relative-error test against the exact twin at sf0.01
    (tests/test_sketches.py)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_regionkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    )
    return (
        per_nation.join(F.broadcast(r), per_nation.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_customers")
        )
        .orderBy("r_name")
    )
