"""Round-3 analytics additions: banded range joins, interval self-join,
cumulative windows, correlation/percentile aggregates, regex/URL/trig
function surfaces, window-function dedup, order sessionization, and
document context-window generation for training feeds.

These widen the generalized-query surface (SURVEY.md §2C) past the
reference's own operators with the shapes a 100 TB curation/analytics
deployment actually runs. Every query is oracle-backed; scale notes are
inline per query (the recurring theme: turn range/interval predicates
into equi-join keys via banding so nothing degenerates to a nested
loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_join_range",
    oracle="""
    SELECT band_id,
           round(band_id * 50000.0, 4)        AS lo,
           round((band_id + 1) * 50000.0, 4)  AS hi,
           count(*)                            AS n_orders,
           round(avg(o_totalprice), 4)         AS avg_price
    FROM (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS band_id,
                 o_totalprice
          FROM orders)
    GROUP BY band_id
    ORDER BY band_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval) done scalably: orders against a
    table of uniform price bands [lo, hi). A naive range join is a
    BroadcastNestedLoopJoin — O(rows × bands) comparisons. Because the
    bands are uniform-width, the point side computes its band key with
    arithmetic (floor(price/width)) and the range join becomes an
    EQUI-join on band_id: hash join, no nested loop, works at any
    scale. The [lo, hi) residual check stays in the join condition as
    a correctness guard. (Non-uniform bands use the same trick at the
    resolution of the smallest band, one point → candidate bands.)

    The oracle computes the identical banding arithmetically — same
    result, which is the point: the join-side derivation must agree
    with the closed form. The band table's extent is derived from the
    data max (one 1-row aggregate, same pattern as q_ts_gapfill's
    spine bounds) rather than a hardcoded 10 bands: sf0.1's max price
    was 499993.18 — a 0.001% margin under the old [0, 500000) cap, and
    one order past it would silently drop on the Spark side only."""
    o = load_table(spark, sf_dir, "orders")
    max_price = o.agg(F.max("o_totalprice")).first()[0] or 0.0
    n_bands = int(max_price // 50000.0) + 1
    bands = spark.range(0, n_bands).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50000.0).alias("band_lo"),
        ((F.col("id") + 1) * 50000.0).alias("band_hi"),
    )
    keyed = o.withColumn(
        "band_id", F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    )
    return (
        keyed.join(
            F.broadcast(bands),
            (keyed.band_id == bands.band_id)
            & (keyed.o_totalprice >= bands.band_lo)
            & (keyed.o_totalprice < bands.band_hi),
        )
        .drop(bands.band_id)
        .groupBy("band_id")
        .agg(
            F.round(F.min("band_lo"), 4).alias("lo"),
            F.round(F.min("band_hi"), 4).alias("hi"),
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("band_id")
    )


@query(
    "q_join_band_interval",
    oracle="""
    SELECT a.user_id,
           count(*) AS n_pairs,
           round(avg(abs(epoch_us(a.ts) - epoch_us(b.ts)) / 1000000.0), 4)
               AS avg_gap_s
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
)
def q_join_band_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: pairs of events by the SAME user within 5
    minutes of each other. user_id is the equi-key, so the self-join is
    a hash/sort-merge join partitioned by user; the ±5-minute band and
    the event_id < ordering are cheap residuals evaluated within each
    matched key group — no cross product beyond a single user's events.
    Gap arithmetic is µs-precision (unix_micros) per the repo's
    sub-second-safety rule. At 100 TB, per-user event counts bound the
    quadratic term; a hot user would be handled by further banding on
    time bucket (bucket + adjacent-bucket join) before pairing."""
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.unix_micros("ts").alias("a_us"),
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.unix_micros("ts").alias("b_us"),
    )
    gap_us = F.abs(F.col("a_us") - F.col("b_us"))
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (a.a_id < b.b_id)
            & (gap_us <= 300_000_000),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg(gap_us / 1_000_000.0), 4).alias("avg_gap_s"),
        )
        .orderBy("user_id")
    )


@query(
    "q_win_cume_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS seq,
           round(sum(o_totalprice) OVER w, 4)  AS cum_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_cume_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend — the cumulative-sum window over a
    keyed partition. One shuffle on o_custkey; within-partition sort by
    (o_orderdate, o_orderkey) — the orderkey tie-break makes the
    running sum deterministic when a customer places two orders the
    same day (CLAUDE.md tie rule)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .cast("long")
        .alias("seq"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("cum_spend"),
    )


@query(
    "q_orders_running_share",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    )
    SELECT month,
           round(rev, 4) AS rev,
           round(sum(rev) OVER (ORDER BY month
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS cum_rev,
           round(sum(rev) OVER (ORDER BY month
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / sum(rev) OVER (), 4) AS share_of_total
    FROM monthly
    ORDER BY month
    """,
)
def q_orders_running_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share by month — the pareto/run-rate report.
    The heavy work is the monthly aggregation (partial+final, ~80
    output rows for a 7-year corpus); the unpartitioned windows then
    run over those few dozen AGGREGATED rows, not the fact table, so
    the single-partition window is harmless by construction at any
    input scale (same pattern as operators/ranking.py's offset step)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    return (
        monthly.select(
            "month",
            F.round("rev", 4).alias("rev"),
            F.round(F.sum("rev").over(w), 4).alias("cum_rev"),
            F.round(F.sum("rev").over(w) / F.sum("rev").over(wall), 4).alias(
                "share_of_total"
            ),
        )
        .orderBy("month")
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0      AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) + 0.0 AS covar_pop_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS covar_samp_qp,
           round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope_price_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS icept_price_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covariance / OLS slope+intercept)
    per group — single-pass distributive aggregates (sum of products /
    squares combine associatively), so they run as partial+final like
    any sum. The `+ 0.0` in the oracle normalizes DuckDB's -0.0
    (CLAUDE.md negative-zero rule) since correlations can round to
    zero from below."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(q, p), 4).alias("corr_qty_price"),
            F.round(F.covar_pop(q, p), 4).alias("covar_pop_qp"),
            F.round(F.covar_samp(q, p), 4).alias("covar_samp_qp"),
            F.round(F.regr_slope(p, q), 4).alias("slope_price_qty"),
            F.round(F.regr_intercept(p, q), 4).alias("icept_price_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear-interpolating). Exact
    percentiles buffer each group's values — the right tool up to
    millions of rows per group; beyond that the declared approx twin
    (q_agg_approx_quantile, t-digest-style sketch, mergeable) is the
    100 TB path. Both are part of the surface deliberately."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)              AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)   AS n_digits,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len,
           regexp_matches(text, '[a-z]+ing ')               AS has_gerund
    FROM documents
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface: extract / count / global-replace /
    match-test, all JVM-codegen expressions (no Python). Patterns stay
    within the char-class subset where Java regex and DuckDB's RE2
    agree — engine-portable patterns are part of the contract."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"([a-z]+)", 1).alias("first_word"),
        F.regexp_count(t, F.lit(r"[0-9]")).cast("long").alias("n_digits"),
        F.regexp_count(t, F.lit(r"[aeiou]+")).cast("long").alias("n_vowel_runs"),
        F.length(F.regexp_replace(t, r"[aeiou]", "")).alias("consonant_len"),
        t.rlike(r"[a-z]+ing ").alias("has_gerund"),
    )


@query(
    "q_fn_url",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1)    AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)            AS query_str,
           regexp_extract(url, 'lang=([a-z]+)', 1)       AS lang_param
    FROM (SELECT doc_id,
                 'https://corpus.example.com/' || source || '/doc-' || doc_id
                     || '?lang=' || lang AS url
          FROM documents)
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (web-corpus curation needs host/path/query
    splits for per-domain dedup and filtering). Spark side uses the
    dedicated parse_url expression; the oracle reproduces each
    component with regex — agreement pins parse_url's exact component
    boundaries (host without scheme, path with leading '/', query
    without '?')."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://corpus.example.com/"),
        F.col("source"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "q_fn_trig",
    oracle="""
    SELECT p_partkey,
           round(sin(p_size), 4) + 0.0                    AS sin_size,
           round(cos(p_size), 4) + 0.0                    AS cos_size,
           round(atan2(p_size, p_retailprice), 4) + 0.0   AS atan2_sp,
           round(radians(p_size), 4)                      AS rad_size,
           round(degrees(atan(p_size / 100.0)), 4)        AS deg_atan,
           round(sqrt(p_retailprice), 4)                  AS sqrt_price,
           round(cbrt(p_retailprice), 4)                  AS cbrt_price
    FROM part
    """,
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/root math surface — all JVM intrinsics inside
    whole-stage codegen; IEEE-754 doubles make both engines
    bit-identical before rounding. The `+ 0.0` normalizes -0.0 on the
    signed functions (sin/cos/atan2 can round to zero from below)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sin("p_size"), 4).alias("sin_size"),
        F.round(F.cos("p_size"), 4).alias("cos_size"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice")), 4).alias("atan2_sp"),
        F.round(F.radians("p_size"), 4).alias("rad_size"),
        F.round(F.degrees(F.atan(F.col("p_size") / 100.0)), 4).alias("deg_atan"),
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.cbrt("p_retailprice"), 4).alias("cbrt_price"),
    )


@query(
    "q_dedup_window",
    oracle="""
    SELECT user_id, event_type, event_id, ts, round(value, 4) AS value
    FROM (
        SELECT user_id, event_type, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup via row_number — the standard CDC/upsert
    compaction (latest record per key wins). One shuffle on the key
    pair; within-partition TOP-1 per key never materializes the full
    sort at the reducer (Spark's rank-limit pushdown). event_id breaks
    exact-timestamp ties deterministically."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id", "ts",
            F.round("value", 4).alias("value"),
        )
    )


@query(
    "q_sessionize_orders",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               CASE WHEN epoch_us(o_orderdate)
                         - lag(epoch_us(o_orderdate))
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                         > 7776000000000
                    OR lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey)
                       IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM orders
    ), numbered AS (
        SELECT o_custkey, o_orderdate, o_totalprice,
               CAST(sum(is_new) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT o_custkey, session_seq,
           min(o_orderdate)          AS session_start,
           max(o_orderdate)          AS session_end,
           count(*)                  AS n_orders,
           round(sum(o_totalprice), 4) AS session_spend
    FROM numbered
    GROUP BY o_custkey, session_seq
    """,
)
def q_sessionize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-burst sessionization: a customer's orders belong to one
    session while gaps stay ≤90 days. Same gap-and-cumsum construction
    as q_evt_sessionize, exercised on the date-granularity commerce
    domain: lag-gap flag → running sum = session id → per-session
    rollup. One shuffle on o_custkey serves all three windows and the
    final agg. µs-precision gap compare + o_orderkey tie-break + BIGINT
    cast on the running sum (all three round-1/2 oracle hazards,
    applied from the start)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # o_orderdate is TIMESTAMP_NTZ at rest; unix_micros needs LTZ. The
    # session TZ is pinned to UTC, so the cast is value-preserving.
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = o.withColumn(
        "is_new",
        F.when(
            (gap > 90 * 86400 * 1_000_000) | F.lag("o_orderdate").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn(
        "session_seq", F.sum("is_new").over(wsum).cast("long")
    )
    return numbered.groupBy("o_custkey", "session_seq").agg(
        F.min("o_orderdate").alias("session_start"),
        F.max("o_orderdate").alias("session_end"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("session_spend"),
    )


@query(
    "q_part_price_band",
    oracle="""
    SELECT CAST(floor(p_retailprice / 10.0) AS BIGINT) AS price_band,
           count(DISTINCT p_partkey)                    AS n_parts,
           count(*)                                     AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    GROUP BY 1
    ORDER BY price_band
    """,
)
def q_part_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue histogram by part price band: dimension-derived banding
    (floor(price/10)) carried through a fact join. The band expression
    is computed on the part side BEFORE the join, so the fact table
    never shuffles for the grouping. part scales with SF, so the join
    strategy is AQE-decided — broadcast when the runtime size allows
    (it does at bench SF), shuffle join at the 100-TB design point
    (round-9 verdict finding #1)."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "price_band", F.floor(F.col("p_retailprice") / 10.0).cast("long")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("price_band")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("price_band")
    )


@query(
    "q_doc_windows",
    oracle="""
    SELECT doc_id,
           CAST(start // 8 AS BIGINT) AS win_id,
           CAST(len(ws[start + 1 : start + 16]) AS BIGINT) AS n_win_tokens,
           md5(array_to_string(ws[start + 1 : start + 16], ' ')) AS win_hash
    FROM (
        SELECT doc_id,
               list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        FROM documents
    ), unnest(range(0, greatest(len(ws), 1), 8)) AS t(start)
    """,
)
def q_doc_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context windows over token streams — the
    document→training-window expansion every LLM data pipeline runs
    (window 16, stride 8, so each token lands in ≤2 windows). The
    expansion is explode(sequence(...)) + slice: a narrow per-row
    flatMap, zero shuffle at any corpus size. Windows are emitted as
    md5 fingerprints (scalar-safe for the driver comparator, and the
    realistic form — downstream dedup keys on the hash, not the
    text)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.trim(F.col("text")), " "), lambda w: w != "")
    # sequence(0, n-1, 8) (inclusive end) == range(0, n, 8) (exclusive):
    # same start points; greatest() keeps one empty window for empty docs.
    exploded = (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            "ws",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("ws") - 1, F.lit(0)),
                    F.lit(8),
                )
            ).alias("start"),
        )
    )
    win = F.slice(F.col("ws"), F.col("start") + 1, 16)
    return exploded.select(
        "doc_id",
        (F.col("start") / 8).cast("long").alias("win_id"),
        F.size(win).cast("long").alias("n_win_tokens"),
        F.md5(F.array_join(win, " ")).alias("win_hash"),
    )


@query(
    "q_text_readability",
    oracle="""
    SELECT doc_id,
           n_words,
           n_sentences,
           round(206.835 - 1.015 * (n_words / n_sentences)
                 - 84.6 * (n_syll / n_words), 4) AS flesch_score
    FROM (
        SELECT doc_id,
               CAST(greatest(len(regexp_extract_all(text, '[^ ]+')), 1) AS BIGINT)
                   AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT)
                   AS n_sentences,
               CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syll
        FROM documents
    )
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability scoring (vowel-run syllable proxy) —
    a standard text-quality feature for corpus filtering, next to
    q_text_quality's length/punct ratios. Three regexp_count passes in
    one codegen stage; a narrow map, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = F.greatest(F.regexp_count(t, F.lit(r"[^ ]+")), F.lit(1)).cast("long")
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]")), F.lit(1)).cast("long")
    n_syll = F.regexp_count(t, F.lit(r"[aeiouy]+")).cast("long")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        F.round(
            F.lit(206.835)
            - 1.015 * (n_words / n_sent)
            - 84.6 * (n_syll / n_words),
            4,
        ).alias("flesch_score"),
    )


@query(
    "q_text_stopword_ratio",
    oracle="""
    SELECT doc_id,
           n_words,
           n_stop,
           round(n_stop / greatest(n_words, 1), 4) AS stop_ratio
    FROM (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(list_filter(ws, w -> list_contains(
                   ['the','a','and','of','to','in','is','it','that','for'], w)))
                   AS BIGINT) AS n_stop
        FROM (SELECT doc_id,
                     list_filter(string_split(lower(trim(text)), ' '),
                                 w -> w <> '') AS ws
              FROM documents)
    )
    """,
)
def q_text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density quality signal (C4/Gopher-style: natural prose
    has a stable stopword ratio; boilerplate and tables don't). The
    stopword list is a 10-word literal array — a containment check per
    token inside codegen, no join, no Python, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in
                     ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")])
    ws = F.filter(F.split(F.lower(F.trim(F.col("text"))), " "), lambda w: w != "")
    n_words = F.size(ws).cast("long")
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop, w))).cast("long")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 4).alias("stop_ratio"),
    )


@query(
    "q_ts_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
               CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
        FROM orders
    ), seg AS (
        SELECT DISTINCT c_mktsegment AS segment FROM customer
    ), spine AS (
        SELECT segment,
               CAST(unnest(generate_series(bounds.lo, bounds.hi,
                                           INTERVAL 1 MONTH)) AS TIMESTAMP) AS month
        FROM seg, bounds
    ), rev AS (
        SELECT c_mktsegment AS segment,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               sum(o_totalprice) AS rev
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2
    )
    SELECT s.segment, s.month, round(coalesce(rev.rev, 0.0), 4) AS rev
    FROM spine s LEFT JOIN rev ON s.segment = rev.segment AND s.month = rev.month
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (resample-to-monthly with zero-fill):
    the dense month × segment spine is generated with
    sequence()+explode from a 1-row min/max aggregate — a broadcast
    scalar cross join (allowlisted, 1 row by construction) times the
    5-row segment list, so the spine costs nothing at any fact size.
    The fact side is aggregated BEFORE the left join, so the join
    matches ~|segments|×|months| rows, never raw orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    segs = c.select(F.col("c_mktsegment").alias("segment")).distinct()
    spine = segs.crossJoin(F.broadcast(bounds)).select(
        "segment",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 MONTH"))
        ).alias("month"),
    )
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return spine.join(rev, ["segment", "month"], "left").select(
        "segment",
        "month",
        F.round(F.coalesce("rev", F.lit(0.0)), 4).alias("rev"),
    )


@query(
    "q_scd2_build",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           ts                                  AS valid_from,
           lead(ts) OVER w                     AS valid_to,
           (lead(ts) OVER w IS NULL)           AS is_current,
           round(value, 4)                     AS value
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 interval build: each change
    record becomes a [valid_from, valid_to) row, valid_to = next
    change's timestamp (NULL = current version). One lead() window per
    key — a single shuffle on user_id regardless of history depth; the
    standard CDC→dimension materialization. event_id tie-break keeps
    simultaneous changes deterministic."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.round("value", 4).alias("value"),
    )


@query(
    "q_agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2)))
                AS VARCHAR)                                        AS sum_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(l_discount AS DECIMAL(18, 2)))
                AS VARCHAR)                                        AS sum_disc_amt,
           count(*)                                                AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact monetary arithmetic on DecimalType — no float rounding
    anywhere: both engines sum fixed-point decimals, so results match
    EXACTLY with no round() normalization (the contrast to every
    double-typed aggregate in this repo, which needs round-to-4 to
    absorb summation-order noise). Decimal sums are associative, so
    partial aggregation is unaffected; the cost is wider shuffle rows
    (128-bit values) — the right trade wherever money must reconcile
    to the cent at 100 TB.

    The sums are emitted as STRINGS on both sides: the comparison
    driver materializes results through pandas, which renders DuckDB
    wide DECIMALs as float64 but Spark decimals as ``Decimal`` objects
    — value-identical yet hash-different (the round-3 red cell).
    Spark sum(decimal(18,2)) carries scale 2 and the product sum scale
    4, matching DuckDB's DECIMAL(38,2)/(38,4) text rendering
    digit-for-digit, so the string cast preserves the exactness claim
    while hashing stably."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("string").alias("sum_price"),
            F.sum(price * disc).cast("string").alias("sum_disc_amt"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_scd2_lookup",
    oracle="""
    WITH dim AS (
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to
        FROM events
        WHERE event_type = 'signup'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p.event_id, p.user_id, d.version,
           round(p.value, 4) AS value
    FROM events p
    JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase joins the SCD2
    version that was valid AT ITS OWN timestamp — the correctness
    pattern that separates a dimensional warehouse from a
    latest-value join (which silently attributes old facts to new
    versions). user_id anchors the equi-join; the validity interval is
    a residual within the key group, so the plan is a plain hash/merge
    join at any scale (same banding argument as q_join_band_interval).
    Versions are ≤ a handful per user, so the residual scan is O(1)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("d_user"),
            F.row_number().over(w.partitionBy("user_id")).cast("long").alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w.partitionBy("user_id")).alias("valid_to"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase")
    return (
        p.join(
            dim,
            (p.user_id == dim.d_user)
            & (dim.valid_from <= p.ts)
            & (dim.valid_to.isNull() | (p.ts < dim.valid_to)),
        )
        .select(
            "event_id",
            "user_id",
            "version",
            F.round("value", 4).alias("value"),
        )
    )


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_bad,
           count(*) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
           count(*)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT),
           count(*)
    FROM lineitem
    ORDER BY check_name
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit as one query: null-key rate, key uniqueness,
    referential integrity (FK anti-match via left join), and a domain
    constraint — the pre-ingest gate a production pipeline runs before
    publishing a snapshot. Each check is a scan-local aggregate (the
    FK check joins ONCE); the union of 1-row results costs nothing.
    At 100 TB these run as a single pass per fact table plus one
    broadcast join — cheap enough to gate every load."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        o.agg(
            F.lit("orders_null_custkey").alias("check_name"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_bad"),
            F.count("*").alias("n_rows"),
        ),
        o.agg(
            F.lit("orders_dup_orderkey").alias("check_name"),
            (F.count("*") - F.countDistinct("o_orderkey")).alias("n_bad"),
            F.count("*").alias("n_rows"),
        ),
        o.join(c, o.o_custkey == c.c_custkey, "left").agg(
            F.lit("orders_fk_customer").alias("check_name"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_bad"),
            F.count("*").alias("n_rows"),
        ),
        li.agg(
            F.lit("lineitem_nonpositive_qty").alias("check_name"),
            F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("n_bad"),
            F.count("*").alias("n_rows"),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionAll(df)
    return out.orderBy("check_name")


@query(
    "q_fn_levenshtein",
    oracle="""
    SELECT a.doc_id,
           levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit_dist,
           CAST(greatest(length(substr(a.text, 1, 30)),
                         length(substr(b.text, 1, 30))) AS INTEGER) AS max_len
    FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance function surface (levenshtein over 30-char
    prefixes of consecutive documents) — the verify primitive for
    character-level fuzzy matching, complementing the token-level
    Jaccard/MinHash family. Levenshtein is O(len²) per pair, which is
    why the dedup operators only ever run it (or its cousins) on
    CANDIDATE pairs from banding/LSH, never all-pairs — this query's
    join is a cheap equi-join on adjacent ids, the same
    candidate-then-verify shape."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring("text", 1, 30).alias("a_pfx"))
    b = d.select(
        (F.col("doc_id") - 1).alias("b_join"), F.substring("text", 1, 30).alias("b_pfx")
    )
    return a.join(b, a.doc_id == b.b_join).select(
        "doc_id",
        F.levenshtein("a_pfx", "b_pfx").alias("edit_dist"),
        F.greatest(F.length("a_pfx"), F.length("b_pfx")).alias("max_len"),
    )


@query(
    "q_agg_moments",
    oracle="""
    SELECT l_returnflag,
           round(skewness(l_quantity), 4) + 0.0 AS skew_qty,
           round(kurtosis(l_quantity), 4) + 0.0 AS kurt_qty,
           round(stddev_samp(l_quantity), 4)    AS sd_qty,
           round(var_pop(l_quantity), 4)        AS varp_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments (skewness/kurtosis + both variance
    flavors) per group — like corr/covar these are single-pass
    distributive aggregates (running power sums combine associatively),
    so they partial-aggregate map-side. Spark and DuckDB agree on the
    estimator definitions; rounded to 4 decimals (the repo standard —
    6 decimals exposes parallel-summation-order noise in the power
    sums); `+ 0.0` normalizes -0.0 on the signed moments."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.skewness(q), 4).alias("skew_qty"),
            F.round(F.kurtosis(q), 4).alias("kurt_qty"),
            F.round(F.stddev_samp(q), 4).alias("sd_qty"),
            F.round(F.var_pop(q), 4).alias("varp_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_bitops",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS and_key,
           bit_or(o_orderkey)  AS or_key,
           bit_xor(o_orderkey) AS xor_key,
           count(*)            AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR fold over a key column) — the
    flag-mask rollup primitive (e.g. which permission bits are set
    anywhere / everywhere in a group). Associative+commutative, so
    they partial-aggregate like sums; XOR additionally gives a cheap
    order-insensitive set checksum used in replication diffs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("and_key"),
            F.bit_or("o_orderkey").alias("or_key"),
            F.bit_xor("o_orderkey").alias("xor_key"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_fn_encoding",
    oracle="""
    SELECT doc_id,
           to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS b64_prefix,
           hex(CAST(substr(text, 1, 6) AS BLOB))        AS hex_prefix,
           length(to_base64(CAST(substr(text, 1, 48) AS BLOB))) AS b64_len
    FROM documents
    """,
)
def q_fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding surface (base64 / hex over UTF-8 bytes) — the
    wire-format functions every ingest/egress boundary needs. Byte
    semantics pinned cross-engine: both sides encode the same UTF-8
    prefix, so padding and case conventions must agree exactly.
    Inputs stay under 57 bytes because Spark's base64 MIME-chunks
    longer outputs (a CRLF every 76 chars) while DuckDB never does —
    an engine-portability footgun worth documenting in an oracle."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.base64(F.substring(t, 1, 12).cast("binary")).alias("b64_prefix"),
        F.hex(F.substring(t, 1, 6).cast("binary")).alias("hex_prefix"),
        F.length(F.base64(F.substring(t, 1, 48).cast("binary"))).alias("b64_len"),
    )


@query(
    "q_join_nullsafe",
    oracle="""
    SELECT c.bucket, count(*) AS n_pairs
    FROM (SELECT nullif(c_nationkey % 5, 4) AS bucket FROM customer) c
    JOIN (SELECT nullif(s_nationkey % 5, 4) AS bucket FROM supplier) s
      ON c.bucket IS NOT DISTINCT FROM s.bucket
    GROUP BY c.bucket
    ORDER BY c.bucket NULLS FIRST
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics merge/dedup
    pipelines need when the business key is legitimately absent on
    both sides. Spark plans eqNullSafe as a HASH join key (NULL is
    just another key value), so unlike the OR-IS-NULL rewrite users
    reach for first, it never degenerates to a nested loop."""
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("c_bucket")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("s_bucket")
    )
    return (
        c.join(s, c.c_bucket.eqNullSafe(s.s_bucket))
        .groupBy(F.col("c_bucket").alias("bucket"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("bucket").asc_nulls_first())
    )


@query(
    "q_explode_outer",
    oracle="""
    SELECT d.doc_id, t.w AS long_word
    FROM (SELECT doc_id,
                 list_filter(string_split(lower(trim(text)), ' '),
                             x -> length(x) > 9) AS ws
          FROM documents) d
    LEFT JOIN LATERAL unnest(d.ws) AS t(w) ON true
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: documents with NO qualifying element
    (here: no word longer than 9 chars) survive as one NULL row
    instead of disappearing — the LEFT JOIN LATERAL of the array
    world. Plain explode silently drops such parents, which in a
    curation pipeline reads as data loss; the _outer variant is the
    audit-safe default. Narrow per-row expansion, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " "), lambda w: F.length(w) > 9
    )
    return d.select("doc_id", F.explode_outer(ws).alias("long_word"))


@query(
    "q_fn_variant",
    oracle="""
    SELECT doc_id,
           CAST(json_extract(j, '$.id') AS BIGINT)      AS id_field,
           json_extract_string(j, '$.lang')             AS lang_field,
           json_extract_string(j, '$.tags[1]')          AS second_tag,
           CAST(json_array_length(j, '$.tags') AS INTEGER) AS n_tags
    FROM (SELECT doc_id,
                 '{"id": ' || doc_id || ', "lang": "' || lang
                     || '", "tags": ["' || source || '", "' || lang || '"]}' AS j
          FROM documents)
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: parse_json
    once into the binary variant encoding, then typed variant_get path
    extraction — the engine-native path for JSON-heavy corpora (parse
    once, extract many, ~an order of magnitude over repeated
    get_json_object string re-parsing; same idea as DuckDB's JSON
    type, which the oracle uses). Shredded typed access, still fully
    codegen, no Python."""
    d = load_table(spark, sf_dir, "documents")
    j = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "lang": "'), F.col("lang"),
        F.lit('", "tags": ["'), F.col("source"),
        F.lit('", "'), F.col("lang"), F.lit('"]}'),
    )
    v = F.parse_json(j)
    return d.select(
        "doc_id",
        F.variant_get(v, "$.id", "long").alias("id_field"),
        F.variant_get(v, "$.lang", "string").alias("lang_field"),
        F.variant_get(v, "$.tags[1]", "string").alias("second_tag"),
        F.array_size(F.variant_get(v, "$.tags", "array<string>")).alias("n_tags"),
    )


@query(
    "q_fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)  AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP)   AS plus_45d,
           (year(o_orderdate) * 12 + month(o_orderdate))
             - (1995 * 12 + 1)                                AS months_since_epoch,
           CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 12, 31) AS TIMESTAMP)
               AS year_end
    FROM orders
    """,
)
def q_fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: month offsets (with month-end
    clamping — Jan 31 + 1 month = Feb 28/29 in both engines), last-day
    snapping, day offsets, integer month distance, and date
    construction. The month distance is written as explicit
    year*12+month arithmetic on BOTH engines rather than Spark's
    fractional months_between / DuckDB's boundary-counting date_diff,
    whose conventions differ — portable semantics beat convenient
    built-ins in cross-engine contracts."""
    d = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    months = (F.year(od) * 12 + F.month(od)) - (1995 * 12 + 1)
    return d.select(
        "o_orderkey",
        F.add_months(od, 3).cast("timestamp").alias("plus_3m"),
        F.last_day(od).cast("timestamp").alias("month_end"),
        F.date_add(od, 45).cast("timestamp").alias("plus_45d"),
        months.cast("long").alias("months_since_epoch"),
        F.make_date(F.year(od), F.lit(12), F.lit(31)).cast("timestamp").alias("year_end"),
    )
