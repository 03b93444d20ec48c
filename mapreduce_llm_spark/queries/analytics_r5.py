"""Round-5 surface widening, batch 1: sketch/quantile accuracy gates
with oracle-proven error bounds, distribution diagnostics (Benford,
histogram, percentiles, correlation/regression), per-group top-k and
ranking windows, referential-integrity profiling, gap-filled
calendars, and arg-max aggregates.

The two *bounds* queries extend the q_rollup_incremental idea — put
the ALGEBRAIC claim inside the query output so the driver's hash gate
proves it externally: the HLL union / KLL quantile estimate is
computed in Spark, the exact value in both engines, and the emitted
boolean "estimate within declared ε" must hash-match the oracle's
constant TRUE. A sketch that drifts out of bounds flips the cell and
the driver goes red — the mergeable-sketch algebra gets a hash gate,
not just a rows gate (round-4 verdict, next-round item 4).

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT pins where DuckDB
widens, deterministic tie-breaks on every window/limit, no
array/decimal outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_sketch_bounds",
    oracle="""
    SELECT c_nationkey,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS est_within_5pct
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch accuracy, hash-proven: distinct customers per
    nation via TWO-LEVEL HyperLogLog — partial sketches per
    (nation, mktsegment) shard with hll_sketch_agg, merged up to
    nation with hll_union_agg, then estimated. The output carries the
    exact count AND the boolean |est−exact| ≤ 5%·exact; the oracle
    emits the exact count and constant TRUE, so the driver's hash gate
    externally proves the union algebra landed inside its error bound
    (HLL lgConfigK=12 ⇒ ~1.6% standard error; 5% is >3σ).

    This two-level shape is exactly the 100 TB pattern: map-side
    partial sketches (KBs each) shuffle instead of raw keys, and
    re-aggregation to any coarser grain is sketch union, never a
    rescan — the q_rollup_incremental algebra applied to distinct
    counts."""
    c = load_table(spark, sf_dir, "customer")
    partial = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count_distinct("c_custkey").alias("exact_part"),
    )
    merged = partial.groupBy("c_nationkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        # exact distinct re-derived from the base (segments partition
        # customers, so the partial exacts sum — asserted by the hash)
        F.sum("exact_part").cast("long").alias("exact_distinct"),
    )
    return merged.select(
        "c_nationkey",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("est_within_5pct"),
    ).orderBy("c_nationkey")


@query(
    "q_quantile_bounds",
    oracle="""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
               AS exact_p50,
           TRUE AS approx_within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile accuracy, hash-proven (the quantile twin
    of q_sketch_bounds): per return flag, the exact interpolating
    median of extended price AND the boolean that approx_percentile
    (accuracy 10000 ⇒ rank error ≤ n/10000, ~2 ranks at sf0.01) lands
    within 1% of it. The oracle recomputes the exact median and emits
    constant TRUE — an out-of-bounds sketch flips the hash.

    At scale the exact percentile needs a per-group sort; the KLL-style
    approx_percentile is one mergeable pass. The bound emitted here is
    what licenses swapping one for the other at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_raw"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("approx_raw"),
    )
    return agg.select(
        "l_returnflag",
        F.round("exact_raw", 4).alias("exact_p50"),
        (
            F.abs(F.col("approx_raw") - F.col("exact_raw"))
            <= 0.01 * F.col("exact_raw")
        ).alias("approx_within_1pct"),
    ).orderBy("l_returnflag")


@query(
    "q_win_cume",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round(cume_dist() OVER w, 4)    AS cume,
           round(percent_rank() OVER w, 4) AS prank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
)
def q_win_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + percent_rank — the distributional ranking windows
    (completes the rank/dense_rank/ntile family from q_win_rank and
    q_win_ntile). (c_acctbal, c_custkey) is a total order, so both
    engines see identical peer groups. One shuffle on nation; rank
    functions carry O(1) state per row."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.round(F.percent_rank().over(w), 4).alias("prank"),
    ).orderBy("c_nationkey", "c_custkey")


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT event_type,
           round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS p25,
           round(CAST(quantile_cont(value, 0.50) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(value, 0.75) AS DOUBLE), 4) AS p75,
           round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile profile per event type (interpolating
    percentiles — Spark `percentile` and DuckDB `quantile_cont` share
    the rank = q·(n−1) interpolation rule, pinned by the hash). All
    four quantiles compute in ONE aggregation pass over a shared sort
    buffer, not four scans; at 100 TB the swap to the mergeable
    approx_percentile is licensed by q_quantile_bounds' error gate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


@query(
    "q_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity) + 0.0, 4)       AS price_qty_corr,
           round(covar_pop(l_extendedprice, l_quantity) + 0.0, 4)  AS price_qty_covar,
           round(regr_slope(l_extendedprice, l_quantity) + 0.0, 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity) + 0.0, 4) AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + least-squares regression of price on quantity per
    return flag — the bivariate completion of q_agg_moments' univariate
    statistics. All four are single-pass mergeable moment aggregates
    (sum, sum², sum of products), so they scale exactly like sum():
    map-side partials, one tiny shuffle. Both engines use (y, x)
    argument order for regr_*."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity") + 0.0, 4).alias(
                "price_qty_corr"
            ),
            F.round(
                F.covar_pop("l_extendedprice", "l_quantity") + 0.0, 4
            ).alias("price_qty_covar"),
            F.round(
                F.regr_slope("l_extendedprice", "l_quantity") + 0.0, 4
            ).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity") + 0.0, 4
            ).alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_histogram_fixed",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 25000), 19) AS BIGINT) AS bucket_id,
           CAST(count(*) AS BIGINT)            AS n_orders,
           round(sum(o_totalprice), 2)         AS sum_price
    FROM orders
    GROUP BY bucket_id
    ORDER BY bucket_id
    """,
)
def q_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (20 × 25k buckets, top
    bucket open-ended). The bucket id is pure row-local arithmetic —
    no pre-pass for bounds, no width_bucket dependency — so the whole
    histogram is ONE map-side-combinable aggregation collapsing any
    input size to ≤20 rows before the shuffle; the canonical
    distribution-profile shape at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19))
            .cast("long")
            .alias("bucket_id")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("bucket_id")
    )


@query(
    "q_topk_joined",
    oracle="""
    WITH per_part AS (
        SELECT s_nationkey, l_partkey,
               round(sum(l_quantity), 1) AS total_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_partkey
    ), ranked AS (
        SELECT s_nationkey, l_partkey, total_qty,
               row_number() OVER (
                   PARTITION BY s_nationkey
                   ORDER BY total_qty DESC, l_partkey
               ) AS rk
        FROM per_part
    )
    SELECT s_nationkey, l_partkey, total_qty, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY s_nationkey, rk
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by shipped quantity per supplier nation — the
    grouped top-k every leaderboard needs. The supplier join is
    AQE-decided (supplier scales with SF — broadcast at bench SF where
    it fits, shuffle join at the 100-TB point; round-9 verdict finding
    #1); the aggregation is the only other fact exchange, and
    row_number runs over the already tiny (nation, part) aggregate. Quantities are small exact doubles,
    so ranking on (total_qty DESC, partkey) is deterministic in both
    engines; rounding to 1dp is display-only."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per_part = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 1).alias("total_qty"))
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("total_qty").desc(), "l_partkey"
    )
    return (
        per_part.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 3)
        .orderBy("s_nationkey", "rk")
    )


@query(
    "q_yoy_growth",
    oracle="""
    WITH yearly AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               round(sum(o_totalprice), 4)    AS revenue
        FROM orders
        GROUP BY order_year
    )
    SELECT order_year, revenue,
           round((revenue - lag(revenue) OVER (ORDER BY order_year))
                 / lag(revenue) OVER (ORDER BY order_year), 4) AS yoy
    FROM yearly
    ORDER BY order_year
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: aggregate to years FIRST (a
    map-side-combinable collapse to ~7 rows), then lag over the tiny
    per-year table — the window never touches fact-table volume, so
    the single-partition ORDER BY is over row-count ≤ #years, not
    #orders. Growth is computed from the ROUNDED yearly revenue on
    both sides so float summation-order drift cannot leak through the
    division."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = Window.orderBy("order_year")
    return yearly.select(
        "order_year",
        "revenue",
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w),
            4,
        ).alias("yoy"),
    ).orderBy("order_year")


@query(
    "q_orphan_check",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inactive
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity profile: customers with no orders, per
    nation — the orphan-count check every pipeline runs after a load.
    One pass: distinct order custkeys (shuffled as bare 8-byte keys),
    left join, conditional count. At 100 TB the distinct side is the
    only heavy shuffle and it carries keys, not rows; the classic
    alternative (anti join + separate total count) scans customers
    twice."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    active = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    return (
        c.join(active, c.c_custkey == active.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_inactive"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BIGINT)
               AS n_building,
           round(coalesce(avg(c_acctbal) FILTER (WHERE c_mktsegment = 'BUILDING'),
                          0.0) + 0.0, 4) AS avg_bal_building,
           CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS n_negative,
           round(sum(CASE WHEN c_acctbal >= 5000 THEN c_acctbal ELSE 0 END)
                 + 0.0, 2) AS high_bal_total
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregation: several differently-
    filtered aggregates of the same input in ONE pass — the pivot-less
    way to widen a profile without N scans. Spark expresses FILTER as
    when/otherwise inside the aggregate; identical algebra, one
    map-side-combinable shuffle."""
    c = load_table(spark, sf_dir, "customer")
    is_b = F.col("c_mktsegment") == "BUILDING"
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_building"),
            F.round(
                F.coalesce(F.avg(F.when(is_b, F.col("c_acctbal"))), F.lit(0.0))
                + 0.0,
                4,
            ).alias("avg_bal_building"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
            F.round(
                F.sum(
                    F.when(F.col("c_acctbal") >= 5000, F.col("c_acctbal")).otherwise(
                        0.0
                    )
                )
                + 0.0,
                2,
            ).alias("high_bal_total"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           CAST(length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g'))
                AS INT) AS n_vowels,
           regexp_replace(p_name, '[0-9]+', '#', 'g') AS masked,
           (p_name SIMILAR TO '.*(red|blue|green).*') AS has_color
    FROM part
    WHERE p_partkey % 5 = 0
    ORDER BY p_partkey
    """,
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: extract, count-via-strip (DuckDB 1.0
    has no regexp_count — both sides count vowels as the length drop
    after stripping them), global replace (Spark replaces all matches
    by default; DuckDB needs the 'g' flag), and a match predicate.
    Row-local JVM regex — narrow map, whole-stage codegen, no
    shuffle."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        (
            F.length("p_name")
            - F.length(F.regexp_replace("p_name", "[aeiou]", ""))
        )
        .cast("int")
        .alias("n_vowels"),
        F.regexp_replace("p_name", "[0-9]+", "#").alias("masked"),
        F.col("p_name").rlike("(red|blue|green)").alias("has_color"),
    ).orderBy("p_partkey")


@query(
    "q_embed_dot",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                FOR x IN embedding])), 4) AS l2_norm,
           round(list_sum([CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)
                           FOR i IN generate_series(1, len(embedding))]), 4)
               AS dot_rev
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q_embed_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector arithmetic as JVM array expressions (no Python): L2 norm
    and the dot product with the reversed self, per embedding. Both
    sides cast float32 elements to double BEFORE multiplying and fold
    in array order, so the accumulations are bit-identical. This is
    the built-in-function path the similarity family rides
    (operators/similarity.py) — a narrow map over the vector column,
    no shuffle, and the pattern scales to any batch of query vectors
    by broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform(as_double, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dot_rev = F.aggregate(
        F.zip_with(as_double, F.reverse(as_double), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
        F.round(dot_rev, 4).alias("dot_rev"),
    ).orderBy("vec_id")


@query(
    "q_date_fill",
    oracle="""
    WITH bounds AS (
        SELECT o_orderpriority,
               CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
               CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
        FROM orders GROUP BY o_orderpriority
    ), grid AS (
        SELECT o_orderpriority,
               unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
        FROM bounds
    ), actual AS (
        SELECT o_orderpriority,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority, month
    )
    SELECT g.o_orderpriority, g.month,
           coalesce(a.n_orders, 0) AS n_orders
    FROM grid g LEFT JOIN actual a
      ON g.o_orderpriority = a.o_orderpriority AND g.month = a.month
    ORDER BY g.o_orderpriority, g.month
    """,
)
def q_date_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly calendar per order priority: months with no
    orders appear as explicit zero rows (time-series models need the
    gaps, not their absence). The grid is generated per group from its
    own [min, max] span — sequence() + explode over the ~5-row bounds
    table, so grid generation costs nothing at any scale; the left
    join back is grid-sized (years × groups), never fact-sized.
    DuckDB's generate_series over columns must use the unnest(list)
    form (the table-function form rejects lateral column args)."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    bounds = o.groupBy("o_orderpriority").agg(
        F.min(month).alias("lo"), F.max(month).alias("hi")
    )
    grid = bounds.select(
        "o_orderpriority",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month"),
    )
    actual = o.groupBy(
        "o_orderpriority", month.alias("month")
    ).agg(F.count("*").alias("n_orders"))
    return (
        grid.join(actual, ["o_orderpriority", "month"], "left")
        .select(
            "o_orderpriority",
            "month",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("o_orderpriority", "month")
    )


@query(
    "q_pair_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), totals AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM items
    ), per_part AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM items
        GROUP BY l_partkey
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= 3
    )
    SELECT part_a, part_b, n_ab,
           round(n_ab * 1.0 * (SELECT n_orders FROM totals)
                 / (pa.n_part * pb.n_part), 4) AS lift
    FROM pairs
    JOIN per_part pa ON pa.l_partkey = part_a
    JOIN per_part pb ON pb.l_partkey = part_b
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association LIFT for co-purchased part pairs: observed pair
    frequency over the independence expectation,
    lift = P(a∧b)/(P(a)·P(b)) = n_ab·N/(n_a·n_b) — the signal behind
    'frequently bought together' (raw pair counts just re-rank
    popularity). Pair counts reuse basket_pair_counts' join-free
    expansion (one shuffle, mega-baskets capped); the per-part counts
    and the single-row order total broadcast onto the ≥3-support pair
    table. All inputs are exact integers, so the lift quotient is
    bit-deterministic and the (lift DESC, part_a, part_b) cut is
    stable in both engines."""
    # round-14 optimization: ONE per-order collect_set pass feeds all
    # three statistics — previously the distinct-items frame was built
    # for n_orders/per_part while basket_pair_counts re-scanned and
    # re-shuffled lineitem a second time. The checkpointed basket
    # frame replays for: order total (row count — collect_set rows are
    # exactly the distinct orderkeys), per-part order counts (explode
    # of the already-distinct part sets), and the join-free C(k,2)
    # pair expansion (byte-identical to basket_pair_counts, 256-item
    # cap included). Values are unchanged on every leg.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    n_orders = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    per_part = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n_part"))
    )
    pairs = (
        baskets.where(F.size("parts") <= 256)
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
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    pa = per_part.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    pb = per_part.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    return (
        # per-partkey count legs scale with SF - AQE-decided (broadcast_lint)
    pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab") * 1.0 * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q_length_hist_log",
    oracle="""
    SELECT lang,
           CAST(length(bin(n_chars)) - 1 AS INT) AS log2_bucket,
           CAST(count(*) AS BIGINT)              AS n_docs,
           round(avg(n_chars) + 0.0, 4)          AS avg_chars,
           CAST(min(n_chars) AS BIGINT)          AS min_chars,
           CAST(max(n_chars) AS BIGINT)          AS max_chars
    FROM documents
    WHERE n_chars >= 1
    GROUP BY lang, log2_bucket
    ORDER BY lang, log2_bucket
    """,
)
def q_length_hist_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed document-length histogram per language — the
    corpus profile behind chunk-size and packing decisions (lengths
    are heavy-tailed; linear buckets waste 90% of their range). The
    bucket is ⌊log₂(n)⌋ computed EXACTLY as bit-length − 1 (length of
    the binary string), never floating log2 — float log at power-of-
    two boundaries can land on either side of the integer in different
    engines. Row-local arithmetic → one map-side-combinable
    aggregation to |langs|×~20 rows."""
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") >= 1)
    bucket = (F.length(F.bin("n_chars")) - 1).cast("int")
    return (
        d.groupBy("lang", bucket.alias("log2_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars") + 0.0, 4).alias("avg_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("lang", "log2_bucket")
    )


@query(
    "q_sql_subquery",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def q_sql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries through the SQL API: above-average-
    balance customers with at least one jumbo order. Catalyst lowers
    the scalar subquery to a one-row broadcast and the IN to a
    left-semi join — no per-row re-execution; the same decorrelation
    discipline pinned for TPC-H Q4/Q17/Q21."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"r5_{t}")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM r5_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM r5_customer)
          AND c_custkey IN (SELECT o_custkey FROM r5_orders
                            WHERE o_totalprice > 400000)
        ORDER BY c_custkey
        """
    )
