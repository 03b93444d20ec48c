"""Round-5 surface widening, batch 2: time-valued window frames,
keep-latest dedup, per-column profiling, Benford screening, weighted
medians, rolling active users, character n-grams, z-score outliers,
ratio-to-total shares, aggregate-gated semi joins, Gini concentration,
consecutive-dup compression, activity streaks, Pareto coverage,
inter-order gaps, and bidirectional nearest-event matching.

Scale discipline carried through: aggregates collapse BEFORE windows
or joins wherever algebra allows; the only unpartitioned windows run
over already-tiny aggregate tables (≤ #days/#digits/#quantiles rows —
noted per query); the one genuine global cumsum (q_pareto_front) goes
through operators/ranking.global_prefix_sum, never a single-partition
ORDER BY window over data-sized input.

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT pins, deterministic
tie-breaks, no array/decimal/timestamp-ntz surprises in output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(sum(value) OVER w, 4)     AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-valued RANGE frame: each event's count and value-sum over
    the trailing ONE HOUR of the same user's stream — the frame is
    bounded by the ORDER-BY VALUE (microseconds), not a row count, so
    sparse and bursty streams get the same wall-clock semantics.
    The frame key is integer epoch-micros on both sides (Spark
    unix_micros after LTZ cast ≡ DuckDB epoch_us under the UTC
    session), dodging float range keys entirely. One shuffle on
    user_id; Spark evaluates the sliding frame incrementally
    (add/evict at the frame edges), O(1) amortized per row."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "tus", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-3600 * 1000 * 1000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    ).orderBy("user_id", "event_id")


@query(
    "q_dedup_latest",
    oracle="""
    SELECT user_id, event_type, event_id, round(value, 4) AS value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rk
        FROM events
    ) WHERE rk = 1
    ORDER BY user_id, event_type
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup — the upsert-compaction every CDC /
    feature-store ingest runs: one survivor per (user, event_type),
    newest (ts, event_id) wins. row_number over a descending total
    order, filter rk=1: one shuffle on the key, per-key state is a
    single row. The deterministic event_id tie-break makes equal-ts
    duplicates resolve identically in both engines (the dedup twin of
    q_dedup_exact's content-hash semantics — here recency, not
    identity, picks the survivor)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.round("value", 4).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "q_profile_nulls",
    oracle="""
    WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(c_custkey) AS BIGINT)    AS nn1,
               CAST(count(DISTINCT c_custkey) AS BIGINT)    AS nd1,
               CAST(count(c_name) AS BIGINT)       AS nn2,
               CAST(count(DISTINCT c_name) AS BIGINT)       AS nd2,
               CAST(count(c_acctbal) AS BIGINT)    AS nn3,
               CAST(count(DISTINCT c_acctbal) AS BIGINT)    AS nd3,
               CAST(count(c_mktsegment) AS BIGINT) AS nn4,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS nd4
        FROM customer
    )
    SELECT col_name, n_rows, n_rows - n_nonnull AS n_null, n_distinct
    FROM (
        SELECT 'c_custkey' AS col_name, n_rows, nn1 AS n_nonnull, nd1 AS n_distinct FROM agg
        UNION ALL
        SELECT 'c_name', n_rows, nn2, nd2 FROM agg
        UNION ALL
        SELECT 'c_acctbal', n_rows, nn3, nd3 FROM agg
        UNION ALL
        SELECT 'c_mktsegment', n_rows, nn4, nd4 FROM agg
    )
    ORDER BY col_name
    """,
)
def q_profile_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (row count, null count,
    distinct count) in ONE scan: all per-column aggregates compute in
    a single aggregation pass, then the one-row result unpivots via
    stack() into the long profile shape — never N scans for N columns
    (the difference between one pass and a week at 100 TB). This is
    the schema-profiling step a curation pipeline runs before setting
    filter thresholds."""
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    aggs = [F.count("*").alias("n_rows")]
    for i, col in enumerate(cols):
        aggs.append(F.count(col).alias(f"nn{i}"))
        aggs.append(F.count_distinct(F.col(col)).alias(f"nd{i}"))
    one = c.agg(*aggs)
    stack_expr = ", ".join(
        f"'{col}', nn{i}, nd{i}" for i, col in enumerate(cols)
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack_expr}) AS (col_name, n_nonnull, n_distinct)"
            ),
        )
        .select(
            "col_name",
            "n_rows",
            (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
            "n_distinct",
        )
        .orderBy("col_name")
    )


@query(
    "q_benford",
    oracle="""
    WITH digits AS (
        SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice))))
                    AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY digit
    )
    SELECT digit, n,
           round(n * 1.0 / sum(n) OVER (), 4)        AS share,
           round(log10(1.0 + 1.0 / digit), 4)        AS benford,
           round(n * 1.0 / sum(n) OVER ()
                 - log10(1.0 + 1.0 / digit) + 0.0, 4) AS excess
    FROM digits
    ORDER BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order values: observed first-significant
    -digit shares vs the log10(1+1/d) expectation — the cheap fraud /
    synthetic-data smell test. The digit is row-local arithmetic, so
    the whole screen is one map-side-combinable aggregation to ≤9 rows;
    the share window runs over those 9 rows only (unpartitioned by
    construction, and harmless at any scale for that reason)."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    digits = o.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    share = F.col("n") / F.sum("n").over(w)
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return digits.select(
        "digit",
        "n",
        F.round(share, 4).alias("share"),
        F.round(benford, 4).alias("benford"),
        F.round(share - benford + 0.0, 4).alias("excess"),
    ).orderBy("digit")


@query(
    "q_weighted_median",
    oracle="""
    WITH wq AS (
        SELECT l_returnflag, l_quantity,
               round(sum(l_extendedprice), 2) AS w
        FROM lineitem
        GROUP BY l_returnflag, l_quantity
    ), cum AS (
        SELECT l_returnflag, l_quantity, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM wq
    )
    SELECT l_returnflag,
           round(min(l_quantity), 1)    AS weighted_median,
           round(any_value(tw), 2)      AS total_weight
    FROM cum
    WHERE cw >= tw / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-weighted median quantity per return flag via the
    cumulative-weight construction: collapse to (flag, quantity)
    weight cells FIRST (≤50 rows per flag — the aggregation eats the
    fact volume), round the cell weights so both engines cumsum the
    SAME doubles in the SAME order, then the weighted median is the
    first quantity whose cumulative weight crosses half the total.
    The windows run over the tiny cell table, not the fact table —
    the same collapse-then-window shape as q_agg_entropy."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = li.groupBy("l_returnflag", "l_quantity").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("w")
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    w_tot = Window.partitionBy("l_returnflag")
    cum = wq.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.where(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_quantity"), 1).alias("weighted_median"),
            F.round(F.any_value("tw"), 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_rolling_active",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, list(DISTINCT user_id) AS users
        FROM events GROUP BY d
    )
    SELECT CAST(d AS VARCHAR) AS day,
           CAST(len(users) AS INT) AS dau,
           CAST(len(list_distinct(flatten(list(users) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           )))) AS INT) AS active_7d
    FROM daily
    ORDER BY day
    """,
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + 7-day rolling actives — the engagement
    curve, with the rolling DISTINCT computed by merging per-day user
    SETS over the frame (distinct-over-window is not directly
    expressible in either engine). Collapse to one set per day first:
    the window then runs over #days rows carrying compact sets, not
    over events — at 100 TB the per-day sets become the mergeable
    sketch of q_sketch_bounds and the shape survives unchanged. The
    day window is unpartitioned but bounded by the calendar (#days),
    never by data volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.collect_set("user_id").alias("users")
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return daily.select(
        # ISO string, not DATE: pandas renders Spark DATE as date
        # objects but DuckDB DATE as datetime64 — class-drift the
        # driver's hash rejects (same family as the Decimal gotcha)
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.size("users").cast("int").alias("dau"),
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
        .cast("int")
        .alias("active_7d"),
    ).orderBy("day")


@query(
    "q_char_ngrams",
    oracle="""
    WITH grams AS (
        SELECT unnest([substr(p_name, i, 3)
                       FOR i IN generate_series(1, length(p_name) - 2)]) AS gram
        FROM part
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n
    FROM grams
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 20
    """,
)
def q_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 character trigrams across part names — the fingerprint
    alphabet document-dedup shingles ride on (operators/dedup.py
    hashes these; here they stay readable for inspection). Explode is
    linear in text size; the count collapses map-side before the
    shuffle, and top-k goes through TakeOrdered (per-partition heaps),
    with (n DESC, gram) the total tie-broken order."""
    p = load_table(spark, sf_dir, "part")
    grams = p.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(p_name) - 2, 0)),"
                " i -> substring(p_name, i, 3))"
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(20)
    )


@query(
    "q_zscore",
    oracle="""
    WITH stats AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
               (c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                   / stddev_pop(c_acctbal) OVER (PARTITION BY c_nationkey) AS z
        FROM customer
    )
    SELECT c_custkey, c_nationkey,
           round(c_acctbal, 2) AS acctbal,
           round(z + 0.0, 4)   AS zscore
    FROM stats
    ORDER BY round(abs(z), 4) DESC, c_custkey
    LIMIT 50
    """,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-nation z-score normalization, surfacing the 50 most
    anomalous balances — the univariate outlier screen run before
    clipping features. Mean and population stddev are window
    aggregates over the nation partition (one shuffle, no join-back);
    ordering uses the ROUNDED |z| with the custkey tie-break so float
    noise below 4dp cannot reorder the cut."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_pop(
        "c_acctbal"
    ).over(w)
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(z + 0.0, 4).alias("zscore"),
            F.round(F.abs(z), 4).alias("_absz"),
        )
        .orderBy(F.col("_absz").desc(), "c_custkey")
        .limit(50)
        .drop("_absz")
    )


@query(
    "q_ratio_to_total",
    oracle="""
    WITH cell AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY order_year, o_orderpriority
    )
    SELECT order_year, o_orderpriority, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY order_year), 4)
               AS share_of_year
    FROM cell
    ORDER BY order_year, o_orderpriority
    """,
)
def q_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total: each priority's share of its year's revenue.
    Collapse to (year, priority) cells first — the share window then
    divides ~35 tiny rows, so the 'total' never requires a second scan
    or a scalar collect. Shares divide the ROUNDED cell revenues on
    both sides, keeping float summation drift out of the quotient."""
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderpriority",
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("order_year")
    return cell.select(
        "order_year",
        "o_orderpriority",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 4).alias(
            "share_of_year"
        ),
    ).orderBy("order_year", "o_orderpriority")


@query(
    "q_exists_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           CAST(o.n_orders AS BIGINT) AS n_orders
    FROM customer c
    JOIN (SELECT o_custkey, count(*) AS n_orders
          FROM orders GROUP BY o_custkey HAVING count(*) >= 15) o
      ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
)
def q_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-gated membership: customers with ≥15 orders (the
    decorrelated form of EXISTS-with-HAVING). The order side collapses
    to (custkey, count) BEFORE the join — at 100 TB the join input is
    #qualifying-keys, not #orders, and the aggregate combines
    map-side. The count rides along, which a bare semi join can't
    carry."""
    c = load_table(spark, sf_dir, "customer")
    heavy = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 15)
    )
    return (
        c.join(heavy, c.c_custkey == heavy.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_gini",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey, o.o_custkey,
               round(sum(o.o_totalprice), 2) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ), ranked AS (
        SELECT c_nationkey, x,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY x, o_custkey
               ) AS i,
               count(*) OVER (PARTITION BY c_nationkey) AS n
        FROM spend
    )
    SELECT c_nationkey,
           CAST(any_value(n) AS BIGINT) AS n_customers,
           round((2.0 * sum(i * x) - (any_value(n) + 1.0) * sum(x))
                 / (any_value(n) * sum(x)) + 0.0, 4) AS gini
    FROM ranked
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the
    concentration index (0 = equal, →1 = one whale) that tells a
    sampling pipeline how skewed a source is before capping. Uses the
    sorted-rank identity G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx): one shuffle
    to (nation, customer) spend cells, a rank window over those cells,
    one fold — no pairwise |xᵢ−xⱼ| expansion (which is the quadratic
    trap). Ties in spend are ordered by custkey so both engines
    assign identical ranks."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("x"))
    )
    w_rank = Window.partitionBy("c_nationkey").orderBy("x", "o_custkey")
    w_n = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "x",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(w_n).alias("n"),
    )
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.any_value("n").cast("long").alias("n_customers"),
            F.round(
                (
                    2.0 * F.sum(F.col("i") * F.col("x"))
                    - (F.any_value("n") + 1.0) * F.sum("x")
                )
                / (F.any_value("n") * F.sum("x"))
                + 0.0,
                4,
            ).alias("gini"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_dedup_consecutive",
    oracle="""
    WITH flagged AS (
        SELECT user_id,
               CASE WHEN lag(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)    AS n_events,
           CAST(sum(is_new) AS BIGINT) AS n_after_dedup
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_dedup_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate compression (run-length dedup): how many
    events survive if repeats of the same event_type are collapsed per
    user — the noise-compression stat for clickstream curation (the
    streaming twin is q_stream_dedup's watermarked drop). One shuffle
    on user_id, lag carries O(1) state; IS DISTINCT FROM makes the
    first-row NULL lag count as a boundary identically in both
    engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_new").cast("long").alias("n_after_dedup"),
        )
        .orderBy("user_id")
    )


@query(
    "q_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), islands AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
        FROM days
    ), streaks AS (
        SELECT user_id, CAST(count(*) AS INT) AS streak
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           max(streak)                    AS longest_streak,
           CAST(sum(streak) AS INT)       AS n_active_days
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active DAYS per user — the retention
    streak metric, via the gaps-and-islands trick lifted from rows to
    calendar days: day_number − row_number is constant exactly within
    a consecutive-day run. Distinct (user, day) first collapses event
    volume to at most #users×#days; everything after runs on that
    small table with one user_id shuffle."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("int").alias("streak")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak").alias("longest_streak"),
            F.sum("streak").cast("int").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "q_pareto_front",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem GROUP BY l_partkey
    ), cum AS (
        SELECT qty,
               sum(qty) OVER (ORDER BY qty DESC, l_partkey) AS cq,
               sum(qty) OVER () AS total
        FROM per_part
    )
    SELECT CAST(count(*) FILTER (WHERE cq - qty < total * 0.8) AS BIGINT)
               AS n_parts_80,
           CAST(count(*) AS BIGINT) AS n_parts_total
    FROM cum
    """,
)
def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage: how many of the highest-volume parts it takes
    to cover 80% of total shipped quantity (the 80/20 curve that
    decides cache/priority tiers). Quantities are integral, so the
    per-part totals are cast to BIGINT and the running sum is EXACT —
    no float-boundary ambiguity at the 80% cut.

    The global cumulative sum goes through
    operators/ranking.global_prefix_sum (range-partition + broadcast
    per-partition offsets) — at 100 TB #parts is itself huge, and a
    bare ORDER-BY window would funnel it through one partition. The
    80% threshold comes from a 1-row aggregate broadcast (allowlisted
    scalar leg), not a collected driver constant."""
    from mapreduce_llm_spark.operators.ranking import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    cum = global_prefix_sum(
        per_part,
        [F.col("qty").desc(), F.col("l_partkey").asc()],
        "qty",
        alias="cq",
    )
    # total from the operator's checkpoint-backed output, not a second
    # lineitem scan+rollup (round-14 optimization; int sum is
    # order-invariant over the same multiset)
    total = cum.agg(F.sum("qty").alias("total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .agg(
            F.sum(
                F.when(
                    F.col("cq") - F.col("qty") < F.col("total") * 0.8, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_parts_80"),
            F.count("*").alias("n_parts_total"),
        )
    )


@query(
    "q_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap
        FROM orders
    )
    SELECT o_custkey,
           CAST(count(*) + 1 AS BIGINT) AS n_orders,
           CAST(max(gap) AS INT)        AS max_gap_days,
           round(avg(gap) + 0.0, 4)     AS avg_gap_days
    FROM gaps
    WHERE gap IS NOT NULL
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer (recency cadence — the
    feature behind churn scores): day gaps between consecutive orders
    via lag, then max/avg per customer. Customers with a single order
    have no gaps and drop out (count(*)+1 restores their order count
    for the survivors). One shuffle on custkey; lag is O(1) state.
    (o_orderdate, o_orderkey) totally orders same-day orders
    identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            (F.count("*") + 1).cast("long").alias("n_orders"),
            F.max("gap").cast("int").alias("max_gap_days"),
            F.round(F.avg("gap") + 0.0, 4).alias("avg_gap_days"),
        )
        .orderBy("o_custkey")
    )


@query(
    "q_nearest_event",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, epoch_us(ts) AS ptus FROM events
        WHERE event_type = 'purchase'
    ), back AS (
        SELECT c.event_id, c.user_id, c.tus, p.ptus AS prev_tus
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.tus >= p.ptus
    ), fwd AS (
        SELECT c.event_id, p.ptus AS next_tus
        FROM clicks c ASOF LEFT JOIN (SELECT user_id, -ptus AS nt, ptus
                                      FROM purch) p
          ON c.user_id = p.user_id AND -c.tus >= p.nt
    )
    SELECT b.event_id, b.user_id,
           CAST(least(coalesce(b.tus - b.prev_tus, 9223372036854775807),
                      coalesce(f.next_tus - b.tus, 9223372036854775807))
                AS BIGINT) AS nearest_gap_us,
           CASE WHEN coalesce(b.tus - b.prev_tus, 9223372036854775807)
                     <= coalesce(f.next_tus - b.tus, 9223372036854775807)
                THEN 'prev' ELSE 'next' END AS direction
    FROM back b JOIN fwd f ON b.event_id = f.event_id
    WHERE b.prev_tus IS NOT NULL OR f.next_tus IS NOT NULL
    ORDER BY b.event_id
    """,
)
def q_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-event match: for every click, the closest
    purchase by the same user in EITHER time direction (attribution
    windows need both; q_join_asof is backward-only). Spark side uses
    the union + conditional running-extreme rewrite (one shuffle,
    O(1) state per row, no candidate join); the ORACLE uses DuckDB's
    native ASOF JOIN twice (forward via negated time) — the hash
    match proves the window rewrite against an independently
    implemented as-of algorithm, not against itself. Ties at equal
    distance resolve to 'prev' on both sides; clicks with no purchase
    neighbor drop out."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    # purchases sort before clicks at equal tus so a same-instant
    # purchase counts as both prev and next with gap 0
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("tus", F.col("is_p").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("tus", F.col("is_p").desc(), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    big = F.lit(9223372036854775807)
    enriched = tagged.select(
        "event_id",
        "user_id",
        "tus",
        "is_p",
        F.max(F.when(F.col("is_p"), F.col("tus"))).over(w_prev).alias("prev_tus"),
        F.min(F.when(F.col("is_p"), F.col("tus"))).over(w_next).alias("next_tus"),
    )
    gap_prev = F.coalesce(F.col("tus") - F.col("prev_tus"), big)
    gap_next = F.coalesce(F.col("next_tus") - F.col("tus"), big)
    return (
        enriched.where(~F.col("is_p"))
        .where(F.col("prev_tus").isNotNull() | F.col("next_tus").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.least(gap_prev, gap_next).cast("long").alias("nearest_gap_us"),
            F.when(gap_prev <= gap_next, "prev")
            .otherwise("next")
            .alias("direction"),
        )
        .orderBy("event_id")
    )
