"""Round-9 STAGED surface — seed tranche.

Same staged-tranche contract the round-8 batch followed before its
flip (staged in round 7 as analytics_r8_staged.py, registered in
round 8 as queries/analytics_r8.py): the round-8 window is fully
allocated, so surface built after that point stages HERE and flips
in round 9. Every entry is a complete (query fn,
DuckDB oracle) pair hash-proven NOW at sf0.01 and the sf0.1 sweep env
by tests/test_r9_staged.py through the same harness the driver gate
uses. NOT imported by registry.load_all — importing this module must
stay registry-side-effect free (pinned by the staging test).

The seed theme is the two pipeline seams the first 385 queries never
covered:

- **Watermark tuning** (q_disorder_audit, q_watermark_yield): the
  out-of-orderness of event time relative to arrival order is THE
  input to every `withWatermark` delay choice, and the engine that
  ships streaming operators owes its users the audit that measures
  it. Arrival order is the monotone ingest id (event_id); lateness
  is measured against the per-user running max event time over
  strictly earlier arrivals — exact integer microseconds, keyed
  windows only.
- **Leakage-safe label generation** (q_churn_label): the supervised
  twin of q_feature_matrix's feature rows — features strictly before
  a cutoff, the label strictly after it, the cutoff derived from the
  data's own horizon. The train/serve leakage this op exists to
  prevent is the label analogue of q_asof_tolerance's staleness
  bound.

Round-9 flip checklist so far: q_watermark_yield and q_churn_label
carry a BroadcastNestedLoopJoin from broadcast scalar/grid legs
(5-row delay grid; 1-row cutoff leg) and need NLJ_OK entries on
registration; q_disorder_audit is plain keyed-window + aggregate.

Determinism discipline: identical to the r8 staging — exact integer
microsecond/cents arithmetic, bp/e4 floors via integer div, no float
anywhere, nullif/CASE guards on every data-dependent denominator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, DuckDB oracle SQL); round 9 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R9: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R9:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R9[name] = (fn, oracle)
        return fn

    return deco


@_staged(
    "q_disorder_audit",
    oracle="""
    WITH e AS (
        SELECT event_type, user_id, event_id, epoch_us(ts) AS tus
        FROM events
    ),
    lat AS (
        SELECT event_type,
               greatest(coalesce(max(tus) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - tus, 0), 0) AS late_us
        FROM e
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS late_bp,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           CAST(sum(late_us) // count(*) AS BIGINT) AS mean_late_us
    FROM lat
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time out-of-orderness audit — the measurement behind
    every `withWatermark` delay choice: per event type, how many
    events arrive (in ingest order = the monotone event_id) with an
    event time EARLIER than a same-user event already seen, and by
    how much (exact integer µs: late share in basis points, max and
    mean lateness). An event with late_us = 0 would be accepted by a
    zero-delay watermark; max_late_us is the delay that loses
    nothing. Scale: one keyed window (user) + one aggregate — the
    prefix max never leaves the key's partition, and no global
    ordering exists anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = e.select(
        "event_type",
        F.greatest(
            F.coalesce(F.max("tus").over(w) - F.col("tus"), F.lit(0)),
            F.lit(0),
        ).alias("late_us"),
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.expr(
                "CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000"
                " div count(*) AS BIGINT)"
            ).alias("late_bp"),
            F.max("late_us").cast("long").alias("max_late_us"),
            F.expr("CAST(sum(late_us) div count(*) AS BIGINT)").alias(
                "mean_late_us"
            ),
        )
        .orderBy("event_type")
    )


@_staged(
    "q_watermark_yield",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
    ),
    lat AS (
        SELECT greatest(coalesce(max(tus) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - tus, 0), 0) AS late_us
        FROM e
    ),
    grid AS (
        SELECT * FROM (VALUES (0, 0), (60, 60000000),
                              (300, 300000000), (900, 900000000),
                              (3600, 3600000000)) AS g(delay_s, delay_us)
    )
    SELECT delay_s,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS dropped_bp
    FROM lat, grid
    GROUP BY delay_s
    ORDER BY delay_s
    """,
)
def q_watermark_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-delay tradeoff curve: for each candidate
    `withWatermark` delay (0 s, 1 m, 5 m, 15 m, 1 h), how many events
    a streaming job with that delay would DROP as too-late — the
    n_dropped column is exactly what q_disorder_audit's lateness
    distribution buys you, evaluated on the delay grid an operator
    would actually choose from. A per-user keyed window computes each
    event's lateness once; the 5-row delay grid broadcasts over it
    (the allowlisted broadcast-grid BNLJ — 5× row fan-out, constant
    memory), and one aggregate emits the curve. Exact integer µs
    everywhere; dropped share in basis points via integer div."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = e.select(
        F.greatest(
            F.coalesce(F.max("tus").over(w) - F.col("tus"), F.lit(0)),
            F.lit(0),
        ).alias("late_us")
    )
    grid = spark.createDataFrame(
        [(0, 0), (60, 60_000_000), (300, 300_000_000),
         (900, 900_000_000), (3600, 3_600_000_000)],
        "delay_s INT, delay_us BIGINT",
    )
    return (
        lat.crossJoin(F.broadcast(grid))
        .groupBy("delay_s")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.when(F.col("late_us") > F.col("delay_us"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.expr(
                "CAST(sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("dropped_bp"),
        )
        .orderBy("delay_s")
    )


@_staged(
    "q_churn_label",
    oracle="""
    WITH horizon AS (
        SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff FROM orders
    ),
    obs AS (
        SELECT o.o_custkey,
               count(*) AS n_orders_obs,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                   AS spend_obs_cents,
               max(CAST(o.o_orderdate AS DATE)) AS last_obs_d
        FROM orders o, horizon h
        WHERE o.o_custkey % 10 = 0 AND o.o_orderdate <= h.cutoff
        GROUP BY o.o_custkey
    ),
    fut AS (
        SELECT DISTINCT o.o_custkey
        FROM orders o, horizon h
        WHERE o.o_custkey % 10 = 0 AND o.o_orderdate > h.cutoff
    )
    SELECT obs.o_custkey,
           CAST(n_orders_obs AS BIGINT) AS n_orders_obs,
           CAST(spend_obs_cents AS BIGINT) AS spend_obs_cents,
           CAST(date_diff('day', last_obs_d, CAST(h.cutoff AS DATE))
                AS BIGINT) AS days_inactive,
           CASE WHEN fut.o_custkey IS NULL THEN 1 ELSE 0 END AS churned
    FROM obs CROSS JOIN horizon h
    LEFT JOIN fut ON fut.o_custkey = obs.o_custkey
    ORDER BY obs.o_custkey
    """,
)
def q_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn-label generation — the supervised twin of
    q_feature_matrix: the cutoff is the data's own horizon minus 90
    days; observation features (order count, spend, days inactive at
    cutoff) come STRICTLY from orders at-or-before the cutoff, and
    the label (churned = placed no order after it) strictly from
    after — the wall that keeps outcome information out of the
    training features. The %10 customer sample prunes at the scan;
    the cutoff is a broadcast 1-row leg (allowlisted scalar BNLJ);
    the label is one anti-join-shaped left join on the customer key.
    Exact integers: cents spend, day counts; no float anywhere."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    horizon = load_table(spark, sf_dir, "orders").agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("cutoff")
    )
    oc = o.crossJoin(F.broadcast(horizon))
    obs = (
        oc.where(F.col("o_orderdate") <= F.col("cutoff"))
        .groupBy("o_custkey", "cutoff")
        .agg(
            F.count("*").cast("long").alias("n_orders_obs"),
            F.sum("cents").cast("long").alias("spend_obs_cents"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_obs_d"),
        )
    )
    fut = (
        oc.where(F.col("o_orderdate") > F.col("cutoff"))
        .select("o_custkey")
        .distinct()
        .withColumn("has_future", F.lit(1))
    )
    return (
        obs.join(fut, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_orders_obs",
            "spend_obs_cents",
            F.datediff(F.col("cutoff").cast("date"), F.col("last_obs_d"))
            .cast("long")
            .alias("days_inactive"),
            F.when(F.col("has_future").isNull(), 1).otherwise(0).alias(
                "churned"
            ),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Round-8 tranche 1 of the round-9 staging (authored in round 8):
# training-data curation + finance-audit seams. Flip checklist
# additions: q_text_burstiness carries a broadcast 1-row n-docs leg
# (NLJ_OK on registration); everything else is keyed windows +
# equi-joins only.
# ---------------------------------------------------------------------------

_R9_TERMS = ("spark", "query", "join")


def _r9_words(col):
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda w: w != F.lit("")
    )


@_staged(
    "q_dedup_sortneighbor",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, n_chars // 100 AS bucket,
               substr(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                      1, 40) AS key
        FROM documents
    ),
    n AS (
        SELECT lang, bucket, key,
               lead(key, 1) OVER w AS k1,
               lead(key, 2) OVER w AS k2
        FROM d
        WINDOW w AS (PARTITION BY lang, bucket ORDER BY key, doc_id)
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(k1) + count(k2) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN levenshtein(key, k1) <= 5 THEN 1 ELSE 0 END)
                + sum(CASE WHEN levenshtein(key, k2) <= 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matches
    FROM n
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def q_dedup_sortneighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (the classic SNM family the
    MinHash/SimHash/n-gram trio doesn't cover): docs collapse to a
    40-char normalized key, sort WITHIN (lang, length-bucket) blocks,
    and only w=2 forward neighbors in sort order are candidate pairs —
    Θ(w·n) candidates by construction instead of the quadratic
    all-pairs, the property that makes SNM viable at 100 TB (the sort
    is a keyed window, never global). A pair matches when the keys are
    within levenshtein 5. Output is the per-block blocking audit:
    docs, candidate pairs, matches."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("CAST(n_chars div 100 AS BIGINT)").alias("bucket"),
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""), 1, 40
        ).alias("key"),
    )
    w = Window.partitionBy("lang", "bucket").orderBy("key", "doc_id")
    n = d.select(
        "lang",
        "bucket",
        "key",
        F.lead("key", 1).over(w).alias("k1"),
        F.lead("key", 2).over(w).alias("k2"),
    )
    m1 = F.when(F.levenshtein("key", "k1") <= 5, 1).otherwise(0)
    m2 = F.when(F.levenshtein("key", "k2") <= 5, 1).otherwise(0)
    return (
        n.groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.count("k1") + F.count("k2")).cast("long").alias("n_pairs"),
            (F.sum(m1) + F.sum(m2)).cast("long").alias("n_matches"),
        )
        .orderBy("lang", "bucket")
    )


@_staged(
    "q_norm_dedup_lift",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dup_raw,
           CAST(count(*) - count(DISTINCT trim(lower(text))) AS BIGINT)
               AS dup_casefold,
           CAST(count(*) - count(DISTINCT regexp_replace(lower(text),
                    '[^a-z0-9]', '', 'g')) AS BIGINT) AS dup_alnum
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_norm_dedup_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-lift dedup audit: how many MORE duplicates each
    normalization level exposes — raw bytes, casefold+trim, and
    alphanumeric-collapse. The delta between levels is the lift a
    normalizing exact-dedup pass buys before any fuzzy machinery runs
    (dup_alnum − dup_raw docs are invisible to byte-exact dedup).
    One hash aggregate per source; the three distinct counts expand
    map-side and never materialize pairwise anything."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.count("*") - F.countDistinct("text"))
            .cast("long")
            .alias("dup_raw"),
            (
                F.count("*")
                - F.countDistinct(F.trim(F.lower(F.col("text"))))
            )
            .cast("long")
            .alias("dup_casefold"),
            (
                F.count("*")
                - F.countDistinct(
                    F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
                )
            )
            .cast("long")
            .alias("dup_alnum"),
        )
        .orderBy("source")
    )


@_staged(
    "q_rank_fusion",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                   w -> w IN ('spark', 'query', 'join'))) AS tf,
               len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                   w -> w <> '')) AS nw
        FROM documents
    ),
    s AS (
        SELECT doc_id, tf,
               CASE WHEN nw > 0 THEN tf * 10000 // nw ELSE 0 END AS density_e4
        FROM d
    ),
    r AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY tf DESC, doc_id) AS rank_a,
               row_number() OVER (ORDER BY density_e4 DESC, doc_id) AS rank_b
        FROM s
    )
    SELECT doc_id,
           CAST(rank_a AS BIGINT) AS rank_a,
           CAST(rank_b AS BIGINT) AS rank_b,
           CAST(1000000000 // (60 + rank_a)
                + 1000000000 // (60 + rank_b) AS BIGINT) AS rrf_e9
    FROM r
    ORDER BY rrf_e9 DESC, doc_id
    LIMIT 10
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankers — raw term
    frequency vs length-normalized density for a fixed query — the
    standard way hybrid search merges lexical and semantic legs
    without score calibration. RRF(d) = Σ 1/(60+rank_i(d)); emitted as
    exact integer e9 floors (1e9 // (60+rank) — integer div, identical
    both engines), so the fusion is hash-provable. Both rankings run
    through operators/ranking.global_row_number (range partition +
    broadcast prefix-sum offsets — never a single-task global window);
    the final top-10 is a TakeOrdered."""
    from mapreduce_llm_spark.operators.ranking import global_row_number

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                _r9_words(F.col("text")),
                lambda w: w.isin(*_R9_TERMS),
            )
        ).alias("tf"),
        F.size(_r9_words(F.col("text"))).alias("nw"),
    )
    s = d.select(
        "doc_id",
        "tf",
        F.expr(
            "CASE WHEN nw > 0 THEN tf * 10000 div nw ELSE 0 END"
        ).alias("density_e4"),
    )
    ra = global_row_number(
        s, [(-F.col("tf")).asc(), F.col("doc_id").asc()], alias="rank_a"
    ).select("doc_id", "rank_a")
    rb = global_row_number(
        s,
        [(-F.col("density_e4")).asc(), F.col("doc_id").asc()],
        alias="rank_b",
    ).select("doc_id", "rank_b")
    return (
        ra.join(rb, "doc_id")
        .select(
            "doc_id",
            F.col("rank_a").cast("long").alias("rank_a"),
            F.col("rank_b").cast("long").alias("rank_b"),
            F.expr(
                "CAST(1000000000 div (60 + rank_a)"
                " + 1000000000 div (60 + rank_b) AS BIGINT)"
            ).alias("rrf_e9"),
        )
        .orderBy(F.col("rrf_e9").desc(), "doc_id")
        .limit(10)
    )


@_staged(
    "q_snippet_window",
    oracle="""
    WITH ws AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    t AS (
        SELECT doc_id, i, len(words) AS nw,
               CASE WHEN words[i] IN ('spark', 'query', 'join')
                    THEN 1 ELSE 0 END AS hit
        FROM ws, unnest(generate_series(1, len(words))) AS u(i)
    ),
    h AS (
        SELECT doc_id, nw, i,
               sum(hit) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)
                   AS hits10
        FROM t
    ),
    p AS (
        SELECT doc_id, max(nw) AS n_words,
               max(hits10 * 1000000 - i) AS pack
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST((pack + 999999) // 1000000 AS BIGINT) AS best_hits,
           CAST((pack + 999999) // 1000000 * 1000000 - pack AS BIGINT)
               AS best_start
    FROM p
    WHERE pack > 0
    ORDER BY doc_id
    """,
)
def q_snippet_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-snippet extraction: the 10-word window with the most query
    -term hits per document (earliest window wins ties) — the
    highlight a retrieval UI shows under each result. One keyed window
    computes every window's hit count; the per-doc argmax packs
    (hits, earliest-start) into ONE integer (hits·1e6 − start — the
    packed-argmin idiom from q_kmeans_step: DuckDB has no struct-key
    arg_max) so the aggregate is a plain max. Docs with zero hits
    (pack < 0) drop out. Everything stays keyed by doc_id — no global
    ordering, no pair expansion."""
    ws = load_table(spark, sf_dir, "documents").select(
        "doc_id", _r9_words(F.col("text")).alias("words")
    )
    t = ws.select(
        "doc_id",
        F.size("words").alias("nw"),
        F.posexplode("words").alias("pos", "w"),
    ).select(
        "doc_id",
        "nw",
        (F.col("pos") + 1).alias("i"),
        F.when(F.col("w").isin(*_R9_TERMS), 1).otherwise(0).alias("hit"),
    )
    w10 = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 9)
    )
    h = t.select(
        "doc_id",
        "nw",
        "i",
        F.sum("hit").over(w10).alias("hits10"),
    )
    p = h.groupBy("doc_id").agg(
        F.max("nw").alias("n_words"),
        F.max(F.col("hits10") * 1000000 - F.col("i")).alias("pack"),
    )
    return (
        p.where(F.col("pack") > 0)
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.expr("CAST((pack + 999999) div 1000000 AS BIGINT)").alias(
                "best_hits"
            ),
            F.expr(
                "CAST((pack + 999999) div 1000000 * 1000000 - pack"
                " AS BIGINT)"
            ).alias("best_start"),
        )
        .orderBy("doc_id")
    )


@_staged(
    "q_text_burstiness",
    oracle="""
    WITH toks AS (
        SELECT doc_id, w
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
                         AS w
              FROM documents)
        WHERE w <> ''
    ),
    per_doc AS (
        SELECT w, doc_id, count(*) AS x FROM toks GROUP BY w, doc_id
    ),
    totals AS (
        SELECT w, CAST(sum(x) AS BIGINT) AS total_n,
               CAST(count(*) AS BIGINT) AS n_docs_with,
               CAST(sum(x * x) AS BIGINT) AS sum_x2
        FROM per_doc GROUP BY w
        ORDER BY total_n DESC, w LIMIT 20
    ),
    nn AS (SELECT count(*) AS n FROM documents)
    SELECT w, total_n, n_docs_with,
           CAST((n * sum_x2 - total_n * total_n) * 10000
                // (n * total_n) AS BIGINT) AS fano_e4
    FROM totals, nn
    ORDER BY total_n DESC, w
    """,
)
def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Fano factor = variance/mean of per-document
    counts over ALL docs, zeros included) for the corpus's top-20
    terms — bursty terms (fano >> 1) are topical, evenly-spread terms
    are function words; the statistic behind stopword discovery and
    tf saturation tuning. Zero-doc inclusion needs no zero rows: with
    N docs, var/mean = (N·Σx² − (Σx)²)/(N·Σx) — one integer-exact e4
    division off three integer sums. The top-20 selection is a
    TakeOrdered over the term totals; the corpus doc count is the
    allowlisted broadcast 1-row leg."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_r9_words(F.col("text"))).alias("w"))
    )
    per_doc = toks.groupBy("w", "doc_id").agg(F.count("*").alias("x"))
    totals = (
        per_doc.groupBy("w")
        .agg(
            F.sum("x").cast("long").alias("total_n"),
            F.count("*").cast("long").alias("n_docs_with"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
        )
        .orderBy(F.col("total_n").desc(), "w")
        .limit(20)
    )
    nn = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n")
    )
    return (
        totals.crossJoin(F.broadcast(nn))
        .select(
            "w",
            "total_n",
            "n_docs_with",
            F.expr(
                "CAST((n * sum_x2 - total_n * total_n) * 10000"
                " div (n * total_n) AS BIGINT)"
            ).alias("fano_e4"),
        )
        .orderBy(F.col("total_n").desc(), "w")
    )


@_staged(
    "q_charclass_profile",
    oracle="""
    WITH d AS (
        SELECT source, length(text) AS total,
               length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
                   AS lower_n,
               length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                   AS upper_n,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                   AS digit_n,
               length(text) - length(replace(text, ' ', '')) AS space_n
        FROM documents
    ),
    s AS (
        SELECT source,
               CAST(sum(total) AS BIGINT) AS n_chars_total,
               CAST(sum(lower_n) AS BIGINT) AS lower_n,
               CAST(sum(upper_n) AS BIGINT) AS upper_n,
               CAST(sum(digit_n) AS BIGINT) AS digit_n,
               CAST(sum(space_n) AS BIGINT) AS space_n
        FROM d GROUP BY source
    )
    SELECT source, n_chars_total,
           CAST(lower_n * 10000 // n_chars_total AS BIGINT) AS lower_bp,
           CAST(upper_n * 10000 // n_chars_total AS BIGINT) AS upper_bp,
           CAST(digit_n * 10000 // n_chars_total AS BIGINT) AS digit_bp,
           CAST(space_n * 10000 // n_chars_total AS BIGINT) AS space_bp,
           CAST((n_chars_total - lower_n - upper_n - digit_n - space_n)
                * 10000 // n_chars_total AS BIGINT) AS other_bp
    FROM s
    ORDER BY source
    """,
)
def q_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class profile per source — the cheap screen that
    separates prose from code/tables/markup before any tokenizer runs
    (code-heavy sources spike digit/other shares; shouty crawl spam
    spikes upper). Class counts come from length deltas under
    class-stripping regex_replace (one scan, no explode); shares are
    exact basis points via integer div."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.length("text").alias("total"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[a-z]", ""))
        ).alias("lower_n"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[A-Z]", ""))
        ).alias("upper_n"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
        ).alias("digit_n"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        ).alias("space_n"),
    )
    s = d.groupBy("source").agg(
        F.sum("total").cast("long").alias("n_chars_total"),
        F.sum("lower_n").cast("long").alias("lower_n"),
        F.sum("upper_n").cast("long").alias("upper_n"),
        F.sum("digit_n").cast("long").alias("digit_n"),
        F.sum("space_n").cast("long").alias("space_n"),
    )
    bp = lambda c: F.expr(f"CAST({c} * 10000 div n_chars_total AS BIGINT)")
    return s.select(
        "source",
        "n_chars_total",
        bp("lower_n").alias("lower_bp"),
        bp("upper_n").alias("upper_bp"),
        bp("digit_n").alias("digit_bp"),
        bp("space_n").alias("space_bp"),
        F.expr(
            "CAST((n_chars_total - lower_n - upper_n - digit_n - space_n)"
            " * 10000 div n_chars_total AS BIGINT)"
        ).alias("other_bp"),
    ).orderBy("source")


@_staged(
    "q_dup_invoice",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day_s,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM orders
        GROUP BY o_custkey, day_s
        HAVING count(*) > 1
    )
    SELECT o_custkey, day_s,
           CAST(n_orders AS BIGINT) AS n_orders,
           total_cents, max_cents,
           total_cents - max_cents AS exposure_cents
    FROM g
    ORDER BY exposure_cents DESC, o_custkey, day_s
    """,
)
def q_dup_invoice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-day multi-order screen — the duplicate-payment audit every
    AP team runs: customers who placed MORE than one order on one
    calendar day, with the at-risk amount (everything beyond the
    largest order) in exact cents. One keyed aggregate; the HAVING
    prunes the grid before anything wide happens. Deterministic order:
    exposure desc with the (custkey, day) group key as tie-break."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
            "day_s"
        ),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    g = (
        o.groupBy("o_custkey", "day_s")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .where(F.col("n_orders") > 1)
    )
    return g.select(
        "o_custkey",
        "day_s",
        "n_orders",
        "total_cents",
        "max_cents",
        (F.col("total_cents") - F.col("max_cents")).alias("exposure_cents"),
    ).orderBy(F.col("exposure_cents").desc(), "o_custkey", "day_s")


@_staged(
    "q_header_detail_recon",
    oracle="""
    WITH l AS (
        SELECT l_orderkey,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * (1.0 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS line_cents
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS hc,
               l.line_cents AS lc
        FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    ),
    b AS (
        SELECT CASE WHEN lc IS NULL THEN -99
                    ELSE (CASE WHEN hc - lc < 0 THEN -1 ELSE 1 END)
                         * least(abs(hc - lc) * 10 // greatest(hc, 1), 15)
               END AS band,
               CASE WHEN lc IS NULL THEN hc ELSE abs(hc - lc) END
                   AS abs_diff
        FROM j
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(abs_diff) AS BIGINT) AS sum_abs_diff_cents
    FROM b
    GROUP BY band
    ORDER BY band
    """,
)
def q_header_detail_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation — does the order header's total
    match the sum of its line items (recomputed as
    extendedprice·(1−discount)·(1+tax), the TPC-H invariant)? The
    answer lands in signed decile bands of the header amount (−99 =
    header with no lines at all, the fully-unbacked case). Sign and
    magnitude are computed separately (mag = abs·10 // hc, then
    re-signed) because floor division on NEGATIVE numerators diverges
    cross-engine — DuckDB floors, Spark truncates (CLAUDE.md class).
    One aggregate per order then one 30-cell band aggregate; the
    money math is token-identical IEEE multiply + floor on both
    engines."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * (F.lit(1.0) + F.col("l_tax"))
                    * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("line_cents")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("hc"),
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey, "left").select(
        "hc", F.col("line_cents").alias("lc")
    )
    b = j.select(
        F.when(F.col("lc").isNull(), F.lit(-99))
        .otherwise(
            F.when(F.col("hc") - F.col("lc") < 0, -1).otherwise(1)
            * F.least(
                F.expr("abs(hc - lc) * 10 div greatest(hc, 1)"), F.lit(15)
            )
        )
        .cast("long")
        .alias("band"),
        F.when(F.col("lc").isNull(), F.col("hc"))
        .otherwise(F.abs(F.col("hc") - F.col("lc")))
        .alias("abs_diff"),
    )
    return (
        b.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("abs_diff").cast("long").alias("sum_abs_diff_cents"),
        )
        .orderBy("band")
    )
