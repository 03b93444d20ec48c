"""Round-5 surface widening, batch 3: ML-training-data preparation
(RFM segmentation, leave-one-out target encoding, min-max feature
scaling, label balance / inverse-frequency weights, vocabulary OOV
coverage, percentile-band corpus filtering, time-to-conversion) plus
behavioural analytics (last-touch attribution, day-of-week
seasonality, seasonal-naive forecast backtest, mutual information,
time-bounded window funnel) and two Spark-storage scale features the
engine had not yet demonstrated as declared surface: a bucketed
shuffle-free join and a partition-pruned scan.

The storage pair is the 100 TB headline: `q_bucket_join` writes both
join sides bucketed+sorted on the join key and the subsequent
sort-merge join runs with ZERO exchanges and ZERO sorts (pinned in
tests/test_plans.py) — the layout-for-reuse pattern that turns a
nightly fact-to-fact join from the dominant shuffle into a local
merge. `q_partition_prune` writes a partitioned copy and proves the
predicate prunes at the DIRECTORY level (PartitionFilters, pinned) —
the difference between scanning one partition and 100 TB.

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT pins where DuckDB
widens, deterministic tie-breaks on every top-k, DATE emitted as ISO
strings, no array/decimal outputs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES

# One written storage layout per (process, sf_dir) — the storage-pair
# queries (q_bucket_join, q_partition_prune) write tables as part of
# their contract, and repeated invocations in one process (plan lint +
# oracle gate + driver smoke in a single pytest session) would
# otherwise leak a fresh full-table copy into /tmp per call (the same
# leak class streaming_queries._publish_stream_source memoizes away).
_BUCKET_TABLES_SF: list[str] = []  # [sf_dir] the catalog tables hold
_PART_DIRS: dict[str, str] = {}  # sf_dir -> partitioned copy path


@query(
    "q_rfm",
    oracle="""
    WITH m AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                   AS rec,
               count(*)         AS freq,
               sum(o_totalprice) AS mon
        FROM orders GROUP BY o_custkey
    ),
    q AS (
        SELECT quantile_cont(rec,  [0.2, 0.4, 0.6, 0.8]) AS qr,
               quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
               quantile_cont(mon,  [0.2, 0.4, 0.6, 0.8]) AS qm
        FROM m
    )
    SELECT CAST(5 - (rec > qr[1])::INT - (rec > qr[2])::INT
                  - (rec > qr[3])::INT - (rec > qr[4])::INT AS INT) AS r_score,
           CAST(1 + (freq > qf[1])::INT + (freq > qf[2])::INT
                  + (freq > qf[3])::INT + (freq > qf[4])::INT AS INT) AS f_score,
           CAST(1 + (mon > qm[1])::INT + (mon > qm[2])::INT
                  + (mon > qm[3])::INT + (mon > qm[4])::INT AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(mon), 2)       AS sum_monetary
    FROM m, q
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic lifecycle-marketing
    cube, bucketed by exact quintile THRESHOLDS rather than ntile:
    an unpartitioned ntile window would drag every customer row into
    one task, while the threshold formulation is two ordinary
    aggregations plus two broadcast 1-row legs — fully parallel at any
    customer count. Recency scores invert (low days-since-last-order
    = 5); threshold comparison (strict >) is deterministic, so no
    tie-break column is needed. Spark's exact `percentile` and
    DuckDB's `quantile_cont` share the (n-1)p linear-interpolation
    definition."""
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    m = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count("*").alias("freq"),
            F.sum("o_totalprice").alias("mon"),
        )
        .join(F.broadcast(maxd))
        .select(
            F.datediff("maxd", "last_d").alias("rec"), "freq", "mon"
        )
    )
    q = m.agg(
        F.expr("percentile(rec,  array(0.2, 0.4, 0.6, 0.8))").alias("qr"),
        F.expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").alias("qf"),
        F.expr("percentile(mon,  array(0.2, 0.4, 0.6, 0.8))").alias("qm"),
    )

    def score(col: str, th: str, invert: bool) -> F.Column:
        hits = sum(
            F.when(F.col(col) > F.element_at(F.col(th), i), 1).otherwise(0)
            for i in range(1, 5)
        )
        return (F.lit(5) - hits if invert else F.lit(1) + hits).cast("int")

    return (
        m.join(F.broadcast(q))
        .select(
            score("rec", "qr", invert=True).alias("r_score"),
            score("freq", "qf", invert=False).alias("f_score"),
            score("mon", "qm", invert=False).alias("m_score"),
            "mon",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            # the monetary SUM at 2 dp, not the mean: a mean divides
            # by the bucket size and this data lands one bucket's
            # mean exactly on a 4-dp half-way boundary (….65375),
            # where the two engines' rounding of the SAME double
            # disagrees; the 2-dp sum sits ~1e-7 from its value with
            # a 0.005 boundary — unflippable — and the mean stays
            # derivable from (sum_monetary, n_customers)
            F.round(F.sum("mon"), 2).alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "q_attribution",
    oracle="""
    WITH attr AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT coalesce(touch, 'none')   AS attributed,
           CAST(count(*) AS BIGINT)  AS n_purchases,
           round(sum(value), 4)      AS revenue
    FROM attr
    WHERE event_type = 'purchase'
    GROUP BY attributed
    ORDER BY attributed
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding non-purchase event of the same user ('none' when
    the purchase opens the history). One window partitioned by user —
    state per task is a single last-seen value, and user_id
    partitioning scales with the key space; no self-join against the
    event history (the naive formulation shuffles events twice and
    re-sorts per probe)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.select("event_type", "value", touch.alias("touch"))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("attributed"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
        .orderBy("attributed")
    )


@query(
    "q_target_encode",
    oracle="""
    WITH t AS (
        SELECT p_brand, p_retailprice AS x,
               (sum(p_retailprice) OVER w - p_retailprice)
                   / (count(*) OVER w - 1) AS loo
        FROM part
        WINDOW w AS (PARTITION BY p_brand)
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT)                         AS n_parts,
           round(round(sum(x), 2) / count(*), 4)            AS mean_price,
           round(sqrt(avg((loo - x) * (loo - x))), 4)       AS loo_rmse
    FROM t
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature — the
    standard anti-leakage encoder for gradient-boosted training: each
    row's encoding is its group mean EXCLUDING itself, (S - x)/(n-1).
    Computed as one grouped aggregate broadcast-joined back (25 brand
    rows), never a per-row window over the fact table: group-stats +
    re-join is the formulation that survives a 100× part table. The
    emitted per-brand RMSE between encoding and target is the
    encoder-quality diagnostic (the plain LOO mean would telescope
    back to the group mean — algebraically content-free)."""
    p = load_table(spark, sf_dir, "part").select("p_brand", "p_retailprice")
    stats = p.groupBy("p_brand").agg(
        F.sum("p_retailprice").alias("s"), F.count("*").alias("n")
    )
    loo = (
        p.join(F.broadcast(stats), "p_brand")
        .select(
            "p_brand",
            F.col("p_retailprice").alias("x"),
            ((F.col("s") - F.col("p_retailprice")) / (F.col("n") - 1)).alias("loo"),
        )
    )
    return (
        loo.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            # cents-snap before dividing (see q_rfm): Brand#4's mean
            # lands exactly on 950.59375, a 4-dp half-way boundary
            F.round(F.round(F.sum("x"), 2) / F.count("*"), 4).alias("mean_price"),
            F.round(
                F.sqrt(F.avg((F.col("loo") - F.col("x")) * (F.col("loo") - F.col("x")))),
                4,
            ).alias("loo_rmse"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_minmax_scale",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               (l_extendedprice - min(l_extendedprice) OVER w)
                   / (max(l_extendedprice) OVER w
                      - min(l_extendedprice) OVER w) AS scaled
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag)
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(avg(scaled), 4)    AS avg_scaled,
           CAST(sum((scaled > 0.9)::INT) AS BIGINT) AS n_hot
    FROM t
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling — normalize-then-train prep.
    Group bounds come from one aggregate broadcast-joined back (3
    rows), not per-row analytic windows: the window formulation (the
    oracle's) re-shuffles the fact table per function, the group-join
    one shuffles bare group keys. Emits the scaled-distribution
    profile (mean position + hot-tail count above 0.9)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = l.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    scaled = l.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        ((F.col("l_extendedprice") - F.col("mn")) / (F.col("mx") - F.col("mn"))).alias(
            "scaled"
        ),
    )
    return (
        scaled.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.avg("scaled"), 4).alias("avg_scaled"),
            F.sum(F.when(F.col("scaled") > 0.9, 1).otherwise(0)).alias("n_hot"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_label_balance",
    oracle="""
    WITH l AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
         t AS (SELECT sum(n) AS tot, count(*) AS k FROM l)
    SELECT label,
           CAST(n AS BIGINT)        AS n_examples,
           round(n / tot, 4)        AS share,
           round(tot / (k * n), 4)  AS class_weight
    FROM l, t
    ORDER BY label
    """,
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balance + inverse-frequency loss weights for a labelled
    training set: weight(c) = N / (K * n_c), the sklearn 'balanced'
    convention (weights average to 1 across examples). One grouped
    count plus a broadcast 1-row totals leg — the totals cross join
    carries two scalars, allowlisted in test_plan_lint."""
    lab = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )
    tot = lab.agg(F.sum("n").alias("tot"), F.count("*").alias("k"))
    return (
        lab.join(F.broadcast(tot))
        .select(
            "label",
            F.col("n").alias("n_examples"),
            F.round(F.col("n") / F.col("tot"), 4).alias("share"),
            F.round(F.col("tot") / (F.col("k") * F.col("n")), 4).alias(
                "class_weight"
            ),
        )
        .orderBy("label")
    )


@query(
    "q_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
    ),
    vocab AS (
        SELECT w FROM toks GROUP BY w
        ORDER BY count(*) DESC, w LIMIT 20
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (w)
    GROUP BY source
    ORDER BY source
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against a corpus-derived
    top-k vocabulary — the coverage check run before committing to a
    tokenizer vocab. The vocabulary is a global top-k (count desc,
    word asc tie-break) taken with sort+limit — Spark executes it as
    TakeOrdered, never a single-partition rank window — and is
    broadcast back as a left join against the token stream. At 100 TB
    the token explode dominates and stays JVM-side (split + explode);
    the vocab side remains k rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(20)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                / F.count("*").cast("double"),
                4,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_doc_len_filter",
    oracle="""
    WITH b AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(n_chars) AS BIGINT) AS min_len,
           CAST(max(n_chars) AS BIGINT) AS max_len,
           round(avg(n_chars), 4)   AS avg_len
    FROM documents JOIN b USING (lang)
    WHERE n_chars >= lo AND n_chars <= hi
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_doc_len_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band corpus filter: keep documents inside each
    language's [p5, p95] length band — the outlier trim step of every
    pretraining-data recipe (drops boilerplate stubs and megadocs).
    Per-language bounds are one grouped exact-percentile aggregate
    (#langs rows) broadcast back; the fact side is filtered in the
    same stage it is scanned, so at corpus scale this is one pass +
    one tiny dim join."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    bounds = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n_chars").alias("min_len"),
            F.max("n_chars").alias("max_len"),
            F.round(F.avg("n_chars"), 4).alias("avg_len"),
        )
        .orderBy("lang")
    )


@query(
    "q_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum((event_type = 'view')::INT)     AS BIGINT) AS n_view,
           CAST(sum((event_type = 'click')::INT)    AS BIGINT) AS n_click,
           CAST(sum((event_type = 'purchase')::INT) AS BIGINT) AS n_purchase,
           CAST(sum((event_type = 'signup')::INT)   AS BIGINT) AS n_signup,
           CAST(sum((event_type = 'error')::INT)    AS BIGINT) AS n_error,
           round(sum((event_type = 'purchase')::INT)
                 / CAST(count(*) AS DOUBLE), 4) AS purchase_share
    FROM events
    GROUP BY dow
    ORDER BY dow
    """,
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week activity profile — the seasonality fingerprint
    (traffic mix + conversion share per weekday). A single grouped
    pass with conditional counts (map-side combinable to 7 rows);
    Spark's `weekday()+1` equals DuckDB's `isodow` (Monday=1)."""
    e = load_table(spark, sf_dir, "events")

    def n_of(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return (
        e.groupBy((F.weekday("ts") + 1).cast("int").alias("dow"))
        .agg(
            F.count("*").alias("n_total"),
            n_of("view"),
            n_of("click"),
            n_of("purchase"),
            n_of("signup"),
            n_of("error"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                / F.count("*").cast("double"),
                4,
            ).alias("purchase_share"),
        )
        .orderBy("dow")
    )


@query(
    "q_forecast_naive",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY event_type, d
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT)                          AS n_days,
           round(avg(abs(a.n - f.n)), 4)                     AS mae,
           round(avg(abs(a.n - f.n) / CAST(a.n AS DOUBLE)), 4) AS mape
    FROM daily a
    JOIN daily f
      ON a.event_type = f.event_type AND a.d = f.d + INTERVAL 7 DAY
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
)
def q_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event
    count with the count from 7 days earlier and score MAE/MAPE per
    type — the baseline every forecasting model must beat. The lag is
    a calendar-correct self-JOIN on (type, d = d+7), not `lag(7)`
    over row positions (which silently mis-aligns across gap days);
    both sides are the already-aggregated daily table (#types × #days
    rows), so the join is dim-sized at any event volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    a = daily.alias("a")
    f_ = daily.alias("f")
    joined = a.join(
        f_,
        (F.col("a.event_type") == F.col("f.event_type"))
        & (F.col("a.d") == F.date_add(F.col("f.d"), 7)),
    )
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg(F.abs(F.col("a.n") - F.col("f.n"))), 4).alias("mae"),
            F.round(
                F.avg(
                    F.abs(F.col("a.n") - F.col("f.n")) / F.col("a.n").cast("double")
                ),
                4,
            ).alias("mape"),
        )
        .orderBy("event_type")
    )


@query(
    "q_time_to_event",
    oracle="""
    WITH u AS (
        SELECT user_id,
               epoch_us(min(ts)) AS first_us,
               epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                   AS purch_us
        FROM events GROUP BY user_id
    )
    SELECT CAST((purch_us - first_us) // 86400000000 AS INT) AS days_bucket,
           CAST(count(*) AS BIGINT)                          AS n_users,
           round(avg((purch_us - first_us) / 3600000000.0), 4) AS avg_hours
    FROM u
    WHERE purch_us IS NOT NULL
    GROUP BY days_bucket
    ORDER BY days_bucket
    """,
)
def q_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion: per user, hours from first activity to
    first purchase, bucketed by whole days — the activation-latency
    histogram. One grouped pass with conditional min (no window, no
    self-join); arithmetic runs on exact microsecond longs (integer
    `DIV` for the bucket) so both engines bucket identically."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purch_us"),
    )
    diff = F.col("purch_us") - F.col("first_us")
    return (
        u.where(F.col("purch_us").isNotNull())
        .groupBy(
            F.expr("CAST((purch_us - first_us) DIV 86400000000 AS INT)").alias(
                "days_bucket"
            )
        )
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg(diff / F.lit(3600000000.0)), 4).alias("avg_hours"),
        )
        .orderBy("days_bucket")
    )


@query(
    "q_mutual_info",
    oracle="""
    WITH j AS (
        SELECT event_type, CAST(isodow(ts) AS INT) AS dow, count(*) AS n
        FROM events GROUP BY event_type, dow
    ),
    t AS (SELECT sum(n) AS big_n FROM j),
    px AS (SELECT event_type, sum(n) AS nx FROM j GROUP BY event_type),
    py AS (SELECT dow, sum(n) AS ny FROM j GROUP BY dow)
    SELECT round(sum((j.n / big_n)
                     * ln((j.n * big_n) / (px.nx * py.ny))), 4) AS mi_nats,
           CAST(max(big_n) AS BIGINT)  AS n_events,
           CAST(count(*) AS BIGINT)    AS n_cells
    FROM j JOIN px USING (event_type) JOIN py USING (dow), t
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week — the
    pairwise-dependence diagnostic next to q_agg_entropy (marginal)
    and q_chi_square (significance): MI in nats over the joint
    contingency table. Everything after the first grouped pass runs
    on the #types × #dows joint table (35 rows): marginals are
    re-aggregations of the joint counts (no second fact scan) and the
    1-row grand total is a broadcast cross leg, allowlisted."""
    e = load_table(spark, sf_dir, "events")
    j = e.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("int").alias("dow")
    ).agg(F.count("*").alias("n"))
    t = j.agg(F.sum("n").alias("big_n"))
    px = j.groupBy("event_type").agg(F.sum("n").alias("nx"))
    py = j.groupBy("dow").agg(F.sum("n").alias("ny"))
    full = (
        j.join(F.broadcast(px), "event_type")
        .join(F.broadcast(py), "dow")
        .join(F.broadcast(t))
    )
    term = (F.col("n") / F.col("big_n")) * F.log(
        (F.col("n") * F.col("big_n")) / (F.col("nx") * F.col("ny"))
    )
    return full.agg(
        F.round(F.sum(term), 4).alias("mi_nats"),
        F.max("big_n").alias("n_events"),
        F.count("*").alias("n_cells"),
    )


@query(
    "q_window_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 1 HOUR
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded window funnel (view → click ≤1h → purchase ≤1h),
    greedy earliest-qualifying semantics a la ClickHouse
    windowFunnel: anchor at each user's FIRST view, take the first
    click within the hour, then the first purchase within an hour of
    that click. Three sequential grouped mins, each joined on user_id
    (co-partitioned key joins, dim-sized after step 1) — linear in
    events, vs. the exponential blowup of per-user sequence scans or
    the quadratic correlated-EXISTS formulation. Stage counts emitted
    as one row via broadcast 1-row legs (allowlisted)."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    n_users = e.agg(F.countDistinct("user_id").alias("n_users"))
    n_v = v.agg(F.count("*").alias("n_view"))
    n_c = c.agg(F.count("*").alias("n_view_click"))
    n_p = p.agg(F.count("*").alias("n_full_funnel"))
    return (
        n_users.join(F.broadcast(n_v))
        .join(F.broadcast(n_c))
        .join(F.broadcast(n_p))
    )


@query(
    "q_bucket_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)  AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join over BUCKETED tables — the layout-for-reuse
    pattern that removes the dominant shuffle from a recurring 100 TB
    join: both sides are written `bucketBy(8, orderkey).sortBy(
    orderkey)`, so the sort-merge join reads co-bucketed files and
    runs with ZERO Exchange and ZERO Sort on either side (pinned in
    tests/test_plans.py::test_bucket_join_no_exchange). Amortized
    once at ingest, every subsequent orderkey join — joins, rollups,
    incremental merges — is shuffle-free. Only the join keys +
    aggregation columns are written (column pruning at layout time).
    The `merge` hint keeps the demonstration honest at test scale,
    where AQE would otherwise broadcast the small side. Revenue sums
    on DecimalType and emits a string: at sf0.1 the double sum
    (~1e10) flips in the 4th decimal with summation order — the
    multi-scale sweep caught exactly that, and exact fixed-point is
    summation-order-free (q_agg_decimal_exact pattern)."""
    # write-once per (process, sf_dir): the layout is the amortized
    # ingest-time artifact the query demonstrates — re-invocations
    # (plan lint, oracle gate, driver) reuse the catalog tables instead
    # of re-writing a /tmp copy per call
    if _BUCKET_TABLES_SF != [sf_dir] or not spark.catalog.tableExists(
        "mrs_bucket_orders"
    ):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        )
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        spark.sql("DROP TABLE IF EXISTS mrs_bucket_orders")
        spark.sql("DROP TABLE IF EXISTS mrs_bucket_lineitem")
        # repartition on the bucket key before writing: one write task
        # per bucket → ONE file per bucket, which is what lets the
        # reader trust the per-bucket sortBy order and elide the join
        # sorts entirely (multi-file buckets are concatenated on read
        # and lose the order)
        (
            o.repartition(8, "o_orderkey")
            .write.mode("overwrite")
            .option("path", tempfile.mkdtemp(prefix="mrs_bkt_o_"))
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("mrs_bucket_orders")
        )
        (
            l.repartition(8, "l_orderkey")
            .write.mode("overwrite")
            .option("path", tempfile.mkdtemp(prefix="mrs_bkt_l_"))
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("mrs_bucket_lineitem")
        )
        _BUCKET_TABLES_SF[:] = [sf_dir]
    # off by default since Spark 3.0 because it lists files at planning
    # time to PROVE one-file-per-bucket before trusting the sortBy
    # order; our repartition-by-key write guarantees that layout, and
    # with it the scan advertises sorted output and both join Sorts
    # are elided (planning cost scales with file count, fine here)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    bo = spark.table("mrs_bucket_orders")
    bl = spark.table("mrs_bucket_lineitem")
    j = bl.hint("merge").join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string")
            .alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


def bucket_join_plan_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation join of q_bucket_join, exposed for the plan
    pin: its physical plan must contain a SortMergeJoin with no
    Exchange and no Sort (bucketed+sorted layout satisfies both)."""
    q_bucket_join(spark, sf_dir)  # ensure tables exist/refresh
    bo = spark.table("mrs_bucket_orders")
    bl = spark.table("mrs_bucket_lineitem")
    return bl.hint("merge").join(bo, F.col("l_orderkey") == F.col("o_orderkey"))


@query(
    "q_partition_prune",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT)          AS n_purchases,
           round(sum(value), 4)              AS revenue
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY day
    ORDER BY day
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over a hive-partitioned copy of the
    events table: the data is written `partitionBy(event_type)` and
    the predicate prunes at the DIRECTORY level — the scan's
    PartitionFilters carries the event_type equality and the files of
    the other four partitions are never opened (pinned in
    tests/test_plans.py::test_partition_prune_scan). At 100 TB this
    is the difference between reading one partition and the whole
    table; the partition column also vanishes from the data files
    (it lives in the path), shrinking the layout."""
    r = _pruned_purchases(spark, sf_dir)
    return (
        r.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
        .orderBy("day")
    )


@query("q_zorder_skipping", oracle=GRADUATED_ORACLES["q_zorder_skipping"])
def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering vs linear sort, measured as FILE SKIPPING —
    the third storage-layout leg after q_partition_prune (directory
    pruning) and q_bucket_join (shuffle-free joins): orders are mapped
    onto a 2^14-wide (custkey × order-day) grid, Morton-interleaved
    (operators/zorder.py — pure JVM shift/mask expressions, no UDF),
    and chopped into 64 "files" two ways — by leading z-bits (the
    z-ordered layout) and by leading custkey-bits (the linear layout).
    For three probe rectangles (a date-only slice, a custkey-only
    slice, a small square) the query emits how many files each
    layout's min/max footprints force a reader to open, plus the
    selected row count (layout-invariant by construction). Z-order
    keeps BOTH dimensions' footprints tight, so the date-slice probe
    touches ~all linear files but few z-files — the emitted numbers
    ARE the data-skipping win, deterministically reproducible (buckets
    are fixed-width z-ranges, not sampled file splits).

    Oracle-backed since round 6: the Morton interleave is exact-tested
    against a Python bit-reference and the layout superiority is
    property-pinned (tests/test_zorder.py); the whole query is
    deterministic integer arithmetic, so the DuckDB bit-ops twin
    (GRADUATED_ORACLES) reproduces it bit-for-bit. The probe/footprint joins are 3-row and
    64-row broadcast legs (allowlisted); at 100 TB the footprint table
    IS the table-format manifest and stays #files-sized."""
    from mapreduce_llm_spark.operators.zorder import (
        file_footprints,
        scale_to_bits,
        z_value,
    )

    BITS = 14
    G = 1 << BITS
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    bounds = o.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min(F.col("o_orderdate").cast("date")).alias("d_lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("d_hi"),
    )
    g = (
        o.join(F.broadcast(bounds))
        .select(
            scale_to_bits(
                F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi"), BITS
            ).alias("xb"),
            scale_to_bits(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("d_lo")),
                F.lit(0),
                F.datediff(F.col("d_hi"), F.col("d_lo")),
                BITS,
            ).alias("yb"),
        )
        .withColumn("z", z_value(F.col("xb"), F.col("yb"), BITS))
    )
    # the grid feeds BOTH footprint legs and the rows-match leg; cache
    # it once instead of re-scanning orders three times, and release
    # the cache before returning (the output is eagerly materialized —
    # 6 rows — so nothing leaks into the session's cache manager; the
    # minhash_near_dup_pairs contract)
    g = g.persist()
    # 64 fixed-width "files" per layout: leading 6 bits of the sort key
    fp_z = file_footprints(
        g, F.col("xb"), F.col("yb"), F.shiftright("z", 2 * BITS - 6)
    )
    fp_lin = file_footprints(
        g, F.col("xb"), F.col("yb"), F.shiftright("xb", BITS - 6)
    )
    probes = spark.createDataFrame(
        [
            ("date_slice", 0, G - 1, int(0.40 * G), int(0.45 * G)),
            ("custkey_slice", int(0.40 * G), int(0.45 * G), 0, G - 1),
            ("square", int(0.25 * G), int(0.35 * G), int(0.25 * G), int(0.35 * G)),
        ],
        schema="probe string, x_lo long, x_hi long, y_lo long, y_hi long",
    )
    hit = (
        (F.col("x_max") >= F.col("x_lo"))
        & (F.col("x_min") <= F.col("x_hi"))
        & (F.col("y_max") >= F.col("y_lo"))
        & (F.col("y_min") <= F.col("y_hi"))
    )

    def touched(fp: DataFrame, layout: str) -> DataFrame:
        return (
            fp.crossJoin(F.broadcast(probes))
            .groupBy("probe")
            .agg(
                F.lit(layout).alias("layout"),
                F.sum(hit.cast("long")).alias("n_files_touched"),
                F.count("*").alias("n_files"),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).alias(
                    "n_rows_in_touched"
                ),
            )
        )

    rows_match = (
        g.crossJoin(F.broadcast(probes))
        .where(
            F.col("xb").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("yb").between(F.col("y_lo"), F.col("y_hi"))
        )
        .groupBy("probe")
        .agg(F.count("*").alias("n_rows_match"))
    )
    out = (
        touched(fp_z, "zorder")
        .unionByName(touched(fp_lin, "linear"))
        .join(F.broadcast(rows_match), "probe", "left")
        .select(
            "probe",
            "layout",
            "n_files_touched",
            "n_files",
            "n_rows_in_touched",
            F.coalesce("n_rows_match", F.lit(0)).alias("n_rows_match"),
        )
        .orderBy("probe", "layout")
    ).localCheckpoint(eager=True)
    g.unpersist()
    return out


def _pruned_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned copy (written once per process per sf_dir — see the
    module-level memo note) scanned with the pruning predicate."""
    pdir = _PART_DIRS.get(sf_dir)
    if pdir is None or not os.path.isdir(pdir):
        e = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value"
        )
        pdir = tempfile.mkdtemp(prefix="mrs_part_events_")
        e.write.mode("overwrite").partitionBy("event_type").parquet(pdir)
        _PART_DIRS[sf_dir] = pdir
    return spark.read.parquet(pdir).where(F.col("event_type") == "purchase")


def partition_prune_plan_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned scan of q_partition_prune, exposed for the plan pin:
    PartitionFilters must carry the event_type equality."""
    return _pruned_purchases(spark, sf_dir)


# One published small-files fixture per process (64-way split of
# events — the over-partitioned ingest shape a compaction job fixes),
# reused across invocations like the other storage artifacts above.
_SMALL_FILES_DIR: dict[str, str] = {}


@query("q_compaction_plan")
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/compaction.py) as
    declared surface — the storage-maintenance op that completes the
    layout family (prune / bucket / z-order / vacuum / compact): the
    event table is published as 64 deliberately-tiny files (the
    over-partitioned ingest shape), the file listing becomes a
    manifest DataFrame, and the planner packs path-ordered files into
    bins approaching 4× the mean file size via a distributed prefix
    sum (operators/ranking.global_prefix_sum — planning a 10M-file
    manifest never hits a single-partition window). Emits the per-bin
    profile plus the conservation identities a maintenance job checks
    before rewriting (all files binned, byte totals preserved —
    asserted structurally in tests/test_compaction.py). Rows-only:
    the driver's oracle views expose tables, not file listings."""
    from mapreduce_llm_spark.operators.compaction import compaction_plan

    src = _SMALL_FILES_DIR.get(sf_dir)
    if src is None or not os.path.isdir(src):
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value"
        )
        src = tempfile.mkdtemp(prefix="mrs_smallfiles_")
        e.repartition(64).write.mode("overwrite").parquet(src)
        _SMALL_FILES_DIR[sf_dir] = src
    listing = [
        (f, os.path.getsize(os.path.join(src, f)))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    ]
    files = spark.createDataFrame(listing, "path string, bytes long")
    target = max(1, 4 * sum(b for _, b in listing) // max(1, len(listing)))
    return compaction_plan(files, target).select(
        "bin",
        "n_files",
        "total_bytes",
        F.substring_index("first_path", "-", 2).alias("first_part"),
        F.substring_index("last_path", "-", 2).alias("last_part"),
    )
