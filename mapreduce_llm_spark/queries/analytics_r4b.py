"""Round-4b surface widening: sequence analytics (Markov transition
matrix, run-length islands), time-weighted aggregation, exponential
moving average, deterministic weighted sampling (Efraimidis–Spirakis),
and per-dimension embedding statistics.

These are the event-stream / curation shapes a training-data pipeline
runs after the basics: "what does a user do next" (transitions), "how
long do states persist" (islands), "what is the signal worth weighted
by exposure time" (TWA), "smooth the series" (EWMA), "sample the
corpus proportionally to quality weight" (weighted sample), and
"profile the embedding space per dimension" (dim stats).

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT casts where DuckDB
widens to HUGEINT, `+ 0.0` where a rounded value can hit -0.0,
deterministic tie-breaks on every window/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type,
           event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_trans,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 4)
               AS p_trans
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag() pairs each event with its predecessor, then one
    grouped count per (prev, next) plus a window-sum to normalize rows
    into probabilities. Two shuffles total — one on user_id for the
    sequence pairing, one on the (tiny) k×k transition key — and the
    normalizing window runs over ≤ k² rows, so at 100 TB the cost is
    the user_id shuffle, identical to sessionization."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    wnorm = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "p_trans",
            F.round(F.col("n_trans") / F.sum("n_trans").over(wnorm), 4),
        )
        .select("prev_type", "next_type", "n_trans", "p_trans")
        .orderBy("prev_type", "next_type")
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH step AS (
        SELECT user_id, value,
               date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   AS dur_us
        FROM events
    )
    SELECT user_id,
           round(sum(value * dur_us) / sum(dur_us), 4) AS twa_value,
           CAST(sum(dur_us) AS BIGINT)                 AS span_us
    FROM step
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (sensor/finance semantics): each reading
    holds until the next one, so its weight is the microsecond gap to
    the successor (lead), and the last reading of a stream carries no
    weight. One shuffle on user_id serves both the lead() window and
    the final aggregation (Catalyst reuses the partitioning), so the
    shape is a single-pass per-key scan at any scale. The oracle's
    HUGEINT sum of gaps is pinned back to BIGINT per the CLAUDE.md
    widening rule."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.withColumn(
        "dur_us",
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")),
    ).where(F.col("dur_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("twa_value"),
            F.sum("dur_us").alias("span_us"),
        )
        .orderBy("user_id")
    )


_EWMA_DECAY = 0.7
_EWMA_TERMS = 8
_EWMA_SQL_NUM = " + ".join(
    f"lag(value, {k}) OVER w * power(CAST({_EWMA_DECAY} AS DOUBLE), {k})"
    for k in range(_EWMA_TERMS)
)
_EWMA_SQL_DEN = " + ".join(
    f"power(CAST({_EWMA_DECAY} AS DOUBLE), {k})" for k in range(_EWMA_TERMS)
)


@query(
    "q_ewma",
    oracle=f"""
    WITH smoothed AS (
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               ({_EWMA_SQL_NUM}) / ({_EWMA_SQL_DEN}) AS ewma_raw
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, round(ewma_raw, 4) AS ewma_value
    FROM smoothed
    WHERE rn >= {_EWMA_TERMS}
    ORDER BY user_id, event_id
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average, truncated to the last 8
    observations (decay 0.7 ⇒ the dropped tail holds < 6% of the
    mass). The textbook recursive EWMA is order-dependent state; the
    truncated form is a finite weighted sum of lag() terms, which
    keeps it a pure window expression — ONE shuffle on user_id, no
    self-join, no per-key iteration, and numerically stable at any
    stream length (the closed-form pow(decay, -rn) cumsum trick
    overflows past ~2k rows; explicit lags never do). Rows before the
    window fills (rn < 8) are dropped so both engines aggregate over
    exactly 8 non-null terms."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = 0.0
    for k in range(_EWMA_TERMS):
        term = F.lag("value", k).over(w) * F.lit(_EWMA_DECAY) ** k
        num = term if num is None else num + term
        den += _EWMA_DECAY**k
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            (num / F.lit(den)).alias("ewma_raw"),
        )
        .where(F.col("rn") >= _EWMA_TERMS)
        .select("user_id", "event_id", F.round("ewma_raw", 4).alias("ewma_value"))
        .orderBy("user_id", "event_id")
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               ((o_orderkey * 2654435761) % 1000003 + 1) / 1000005.0 AS u
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           round(ln(u) / o_totalprice * 1000000, 4) + 0.0 AS priority_ppm
    FROM keyed
    ORDER BY ln(u) / o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): per-row priority ln(u)/w with weight w = o_totalprice, take
    the global top-k by priority. u is a DETERMINISTIC pseudo-uniform
    from Knuth multiplicative hashing of the key (pure integer
    arithmetic, bit-identical in both engines — rand() would be
    unverifiable), strictly inside (0,1) so ln() is finite. The ln(u)/w
    form is the numerically safe equivalent of u^(1/w), whose values
    collapse into 1-ulp-of-1.0 territory for large weights. Executes
    as TakeOrdered (per-partition top-100 → merge on the driver), no
    global sort — the canonical distributed-reservoir shape at 100 TB.
    Priority is reported ×1e6 (4-dp) since raw values are ~1e-5; the
    oracle's `+ 0.0` normalizes a possible -0.0 per CLAUDE.md."""
    o = load_table(spark, sf_dir, "orders")
    u = ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(1000003) + 1) / F.lit(
        1000005.0
    )
    pr = F.log(u) / F.col("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.round(pr * 1000000, 4).alias("priority_ppm"),
            pr.alias("_pr"),
        )
        .orderBy(F.col("_pr").desc(), "o_orderkey")
        .limit(100)
        .drop("_pr")
    )


@query(
    "q_embed_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT CAST(dim AS BIGINT)           AS dim,
           CAST(count(*) AS BIGINT)      AS n_vals,
           round(avg(val), 4) + 0.0      AS mean_val,
           round(stddev_samp(val), 4)    AS std_val,
           round(min(val), 4) + 0.0      AS min_val,
           round(max(val), 4) + 0.0      AS max_val
    FROM flat
    GROUP BY dim
    ORDER BY dim
    """,
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding space (mean/std/range per
    coordinate — the feature-drift report a pipeline runs before
    training): posexplode flattens vectors to (dim, val) rows, then one
    grouped aggregation keyed on dim. The group count equals the
    embedding width (tiny), so the shuffle moves only partial
    aggregates — map-side combine reduces N×width rows to
    partitions×width before the exchange. Float coordinates are
    widened to double identically on both sides before any math."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("pos", "fval")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    return (
        flat.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.round(F.avg("val"), 4).alias("mean_val"),
            F.round(F.stddev_samp("val"), 4).alias("std_val"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("dim")
    )


@query(
    "q_runs_islands",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN event_type = lag(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 0 ELSE 1 END AS brk
        FROM events
    ), grouped AS (
        SELECT user_id, event_type, ts,
               CAST(sum(brk) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS run_id
        FROM marked
    )
    SELECT user_id, run_id, event_type,
           CAST(count(*) AS BIGINT) AS run_len,
           min(ts)                  AS run_start
    FROM grouped
    GROUP BY user_id, run_id, event_type
    ORDER BY user_id, run_id
    """,
)
def q_runs_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of consecutive equal states per user (the
    gaps-and-islands problem, value-change flavor — q_evt_sessionize
    is the time-gap flavor): a lag() change detector feeds a running
    sum that numbers each island, then one grouped aggregation per
    (user, island). All three windows and the final groupBy share the
    user_id partitioning, so Catalyst plans ONE exchange for the whole
    query; per-user streams are processed in a single sorted pass
    regardless of total volume. NULL-vs-value lag comparisons fall to
    the ELSE branch (3-valued logic) identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.withColumn(
        "brk",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    grouped = marked.withColumn(
        "run_id", F.sum("brk").over(wsum).cast("long")
    )
    return (
        grouped.groupBy("user_id", "run_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("ts").alias("run_start"),
        )
        .orderBy("user_id", "run_id")
    )


def fuzzy_pair_candidates(
    p: DataFrame, *, max_block_size: int | None = None
) -> DataFrame:
    """Edit-distance-≤1 candidate pairs for (p_partkey, p_name) rows
    via pigeonhole prefix/suffix blocking; see q_fuzzy_join.

    ``max_block_size`` caps degenerate hot blocks (every name starting
    "alum" → one quadratic block) exactly like operators/dedup.py's
    LSH bucket cap: count per (side, blk), drop blocks over the cap
    from candidate generation. UNLIKE the LSH cap, dropping a block
    here CAN lose true pairs whose only shared segment is the hot one
    (pigeonhole gives each pair only two chances), so the declared
    query runs with the cap OFF (None = ∞) to keep its losslessness
    proof — the cap is the recall/robustness trade-off knob a 100 TB
    run sets after sizing its blocks."""
    keys = p.select(
        "p_partkey",
        "p_name",
        F.explode(
            F.array(
                F.struct(
                    F.lit("P").alias("side"),
                    F.substring("p_name", 1, 4).alias("blk"),
                ),
                F.struct(
                    F.lit("S").alias("side"),
                    F.expr("right(p_name, 4)").alias("blk"),
                ),
            )
        ).alias("k"),
    ).select("p_partkey", "p_name", "k.side", "k.blk")
    if max_block_size is not None:
        sizes = keys.groupBy("side", "blk").agg(F.count("*").alias("_blk_n"))
        keys = (
            keys.join(sizes, ["side", "blk"])
            .filter(F.col("_blk_n") <= max_block_size)
            .drop("_blk_n")
        )
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(b, ["side", "blk"])
        .where(F.col("a.p_partkey") < F.col("b.p_partkey"))
        # cheap length prefilter: |len diff| > 1 can never be dist <= 1
        .where(
            F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 1
        )
        .select(
            F.col("a.p_partkey").alias("partkey_a"),
            F.col("b.p_partkey").alias("partkey_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
        .distinct()
    )


@query(
    "q_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS partkey_a,
           b.p_partkey AS partkey_b,
           a.p_name    AS name_a,
           b.p_name    AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 1
    WHERE a.p_partkey % 7 = 0 AND b.p_partkey % 7 = 0
    ORDER BY partkey_a, partkey_b
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match self-join (edit distance ≤ 1) via PIGEONHOLE
    BLOCKING over DISTINCT NAMES: an edit at one position leaves
    either the first-4-char prefix or the last-4-char end-anchored
    suffix untouched (insertions and deletions before a segment shift
    but do not change it), so candidate NAME pairs are generated by
    TWO equi-joins — on (prefix) and on (suffix) — unioned via
    explode, deduped, then verified with ONE levenshtein() per
    distinct name pair. Matched name pairs are expanded back to key
    pairs with two equi-joins (keys ordered via least/greatest, names
    swapped alongside), plus one p_name self-equi-join for the
    identical-name (distance-0) pairs. NO all-pairs comparison: the
    oracle computes the naive quadratic ground truth, so the driver's
    hash check externally proves the scheme is LOSSLESS, not just
    that the arithmetic matches.

    The distinct-name collapse is the scale design (round-7
    scale-stress finding, SCALING.md): this corpus has 64 distinct
    names over 2.8k–28k %7-filtered rows, so blocking over raw rows
    made block sizes — and candidate count — grow quadratically with
    data volume (measured exponent 1.87 at the 10× step) even though
    the distinct-name set didn't grow at all. Collapsed, the blocking
    and levenshtein work is Θ(distinct names); only the expansion
    join still emits the output, which is ITSELF quadratic under
    duplicate-heavy data (63,952 → 6,381,405 true pairs at 10×) and
    therefore the irreducible floor for any lossless algorithm. At
    100 TB block-key selectivity is the knob (longer keys / more
    segments → smaller blocks); degenerate hot blocks can additionally
    be capped via fuzzy_pair_candidates' max_block_size (that helper
    remains the raw-row variant; capping can drop true pairs, and
    this query's contract is the losslessness proof — the cap's
    sub-quadratic behavior is pinned in tests/test_r4b_props.py). The
    %7 subset keeps the oracle's quadratic verification tractable at
    sf0.01."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 7 == 0)
        .select("p_partkey", "p_name")
    )
    names = p.select("p_name").distinct()
    blocks = names.select(
        "p_name",
        F.explode(
            F.array(
                F.struct(
                    F.lit("P").alias("side"),
                    F.substring("p_name", 1, 4).alias("blk"),
                ),
                F.struct(
                    F.lit("S").alias("side"),
                    F.expr("right(p_name, 4)").alias("blk"),
                ),
            )
        ).alias("k"),
    ).select("p_name", "k.side", "k.blk")
    a, b = blocks.alias("a"), blocks.alias("b")
    name_pairs = (
        a.join(b, ["side", "blk"])
        .where(F.col("a.p_name") < F.col("b.p_name"))
        .where(F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 1)
        .select(F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb"))
        .distinct()
        .withColumn("edit_dist", F.levenshtein("na", "nb").cast("long"))
        .where(F.col("edit_dist") <= 1)
    )
    left = p.select(F.col("p_partkey").alias("ka"), F.col("p_name").alias("na"))
    right = p.select(
        F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb")
    )
    cross = (
        left.join(name_pairs, "na")
        .join(right, "nb")
        .select(
            F.least("ka", "kb").alias("partkey_a"),
            F.greatest("ka", "kb").alias("partkey_b"),
            F.when(F.col("ka") < F.col("kb"), F.col("na"))
            .otherwise(F.col("nb"))
            .alias("name_a"),
            F.when(F.col("ka") < F.col("kb"), F.col("nb"))
            .otherwise(F.col("na"))
            .alias("name_b"),
            "edit_dist",
        )
    )
    same = (
        p.alias("x")
        .join(p.alias("y"), "p_name")
        .where(F.col("x.p_partkey") < F.col("y.p_partkey"))
        .select(
            F.col("x.p_partkey").alias("partkey_a"),
            F.col("y.p_partkey").alias("partkey_b"),
            F.col("p_name").alias("name_a"),
            F.col("p_name").alias("name_b"),
            F.lit(0).cast("long").alias("edit_dist"),
        )
    )
    return cross.unionByName(same).orderBy("partkey_a", "partkey_b")


_PSI_VOCAB = 50


@query(
    "q_dist_drift",
    oracle=f"""
    WITH words AS (
        SELECT source, w
        FROM documents,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
        WHERE w <> ''
    ), vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS g_cnt
        FROM words GROUP BY w
        ORDER BY count(*) DESC, w
        LIMIT {_PSI_VOCAB}
    ), base AS (
        SELECT w, g_cnt * 1.0 / (SELECT sum(g_cnt) FROM vocab) AS p
        FROM vocab
    ), grid AS (
        SELECT s.source, b.w, b.p, coalesce(c.cnt, 0) AS cnt
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN base b
        LEFT JOIN (
            SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
            FROM words WHERE w IN (SELECT w FROM vocab)
            GROUP BY source, w
        ) c ON c.source = s.source AND c.w = b.w
    ), smoothed AS (
        SELECT source, cnt, p,
               (cnt + 0.5) /
               (sum(cnt) OVER (PARTITION BY source) + 0.5 * {_PSI_VOCAB}) AS q
        FROM grid
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT)                    AS n_vocab_tokens,
           round(sum((q - p) * ln(q / p)), 4) + 0.0    AS psi
    FROM smoothed
    GROUP BY source
    ORDER BY source
    """,
)
def q_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: Population Stability Index of
    each source's word distribution against the corpus-wide
    distribution over the global top-50 vocabulary — the
    drift/contamination monitor a training pipeline runs on every
    ingest batch. Vocabulary selection is TakeOrdered (deterministic
    count-then-word tie-break, no global sort); the (source × vocab)
    grid that materializes zero counts is a broadcast cross of two
    tiny aggregates (≤ sources × 50 rows) — the only full-data pass is
    the word explode + one grouped count keyed on (source, word).
    Additive 0.5 smoothing keeps ln(q/p) finite for absent words;
    the oracle's `+ 0.0` normalizes -0.0 since truncated-support PSI
    can round to zero from below."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.col("w") != "")
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("g_cnt"))
        .orderBy(F.col("g_cnt").desc(), "w")
        .limit(_PSI_VOCAB)
    )
    total = vocab.agg(F.sum("g_cnt").alias("g_total"))
    base = vocab.crossJoin(F.broadcast(total)).select(
        "w", (F.col("g_cnt") * 1.0 / F.col("g_total")).alias("p")
    )
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(F.broadcast(base))
    counts = (
        words.join(F.broadcast(vocab.select("w")), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    filled = grid.join(counts, ["source", "w"], "left").select(
        "source", "w", "p", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    wsrc = Window.partitionBy("source")
    smoothed = filled.withColumn(
        "q",
        (F.col("cnt") + 0.5)
        / (F.sum("cnt").over(wsrc) + 0.5 * _PSI_VOCAB),
    )
    return (
        smoothed.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_vocab_tokens"),
            F.round(
                F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))),
                4,
            ).alias("psi"),
        )
        .orderBy("source")
    )


@query(
    "q_rollup_incremental",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)          AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS VARCHAR) AS sum_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
               / count(*)                    AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the Spark side NEVER aggregates
    the full table in one pass — it merges two independently computed
    partial rollups (a 'base' for orders before 1997-07-01 and a
    'delta' for the rest) by summing mergeable state (count, sum) and
    deriving avg at the end. The oracle aggregates the union directly,
    so the driver's hash gate externally proves the partial-merge
    algebra — the property that lets a 100 TB pipeline maintain
    rollups by folding in each day's delta instead of recomputing; the
    same decomposition `operators/merge.py` and the streaming
    running-totals sink rely on. Non-mergeable aggregates (avg) are
    carried as (sum, count) and derived only at read time.

    The merged sum runs on DecimalType (exact cents, emitted as a
    string): the multi-scale sweep showed the double sum (~7e9 at
    sf0.1) flipping in its 4th decimal with summation order — fatal
    for a query whose whole point is that merge order doesn't matter.
    avg derives from that exact sum cast to double (both engines then
    divide identical IEEE doubles by identical counts, so no rounding
    normalization is needed)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = "1997-07-01"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ps"),
        )

    base = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").alias("n_orders"),
            F.sum("ps").cast("string").alias("sum_price"),
            (F.sum("ps").cast("double") / F.sum("pn")).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_graph_triangles",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.pa = e1.pb
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ), deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT pa AS v FROM edges UNION ALL SELECT pb FROM edges)
        GROUP BY v
    ), wed AS (
        SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
               CAST(count(*) AS BIGINT)             AS n_vertices
        FROM deg
    ), edg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges
    )
    SELECT n_edges, n_vertices, n_wedges, n_triangles,
           round(3.0 * n_triangles / n_wedges, 4) AS clustering
    FROM tri, wed, edg
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient over the
    co-purchase graph (parts are vertices; an edge = two parts in the
    same order). Edges are ORIENTED a<b so each triangle is counted
    exactly once by the wedge join e1(a,b)⋈e2(b,c) closed by e3(a,c) —
    three hash equi-joins, no enumeration of unordered pairs. At
    cluster scale the orientation key becomes degree order (low-degree
    vertex first), which bounds the wedge intermediate at O(m^1.5)
    even on power-law graphs (the standard Cohen/GraphX construction);
    key-order orientation keeps this query oracle-verifiable since
    both engines derive the identical edge set. Wedge count is
    Σ d(d-1)/2 over the degree table — one aggregation, no join. The
    1-row stat legs combine via broadcast crosses.

    The edge list feeds FIVE consumers (e1/e2/e3, degrees, edge
    count); Catalyst does not reuse the build exchange across them
    (measured: 0 ReusedExchange, 5× recompute, 18 s → 6 s at sf0.1),
    so the query eagerly localCheckpoints the (small, 2-column) edge
    set once — the same materialize-once contract as
    operators/dedup.py. At cluster scale this is the point where a
    pipeline would publish the edge list as a bucketed table."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
        # SERIALIZED storage for the SF-scaling co-purchase pair set —
        # the exact frame class whose default deserialized-row
        # checkpoint hit the executor-storage wall at sf10 in
        # q_graph_bfs (round-12 diagnosis; MEMORY_AND_DISK is
        # serialized in PySpark, ~2-4x tighter, value-identical)
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    edg = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wed))
        .crossJoin(F.broadcast(edg))
        .select(
            "n_edges",
            "n_vertices",
            "n_wedges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 4).alias(
                "clustering"
            ),
        )
    )


@query(
    "q_hierarchy_depth",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT p_partkey AS k, p_partkey AS cur, 0 AS d FROM part
        UNION ALL
        SELECT k,
               greatest(cur // 2, (SELECT min(p_partkey) FROM part)),
               d + 1
        FROM walk
        WHERE cur > (SELECT min(p_partkey) FROM part)
    )
    SELECT CAST(depth AS BIGINT)     AS depth,
           CAST(count(*) AS BIGINT)  AS n_parts,
           min(k)                    AS min_partkey,
           max(k)                    AS max_partkey
    FROM (SELECT k, max(d) AS depth FROM walk GROUP BY k)
    GROUP BY depth
    ORDER BY depth
    """,
)
def q_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal — the recursive-CTE capability Spark lacks,
    re-expressed as POINTER DOUBLING: over the synthetic part tree
    parent(k) = max(k div 2, root), each round composes the
    ancestor map with itself (f_{i+1} = f_i∘f_i, depths add), so every
    node reaches the root in O(log depth) self-joins instead of the
    naive one-join-per-level walk — 4 rounds cover depth 16, where
    DuckDB's WITH RECURSIVE (the oracle) takes 16 iterations. This is
    the same log-round contraction as operators/graph.py's connected
    components; each round localCheckpoints to stop the doubling
    lineage (2^i joins otherwise). The root node carries (anc=root,
    d=0) so composition saturates there. Root and max key come from a
    1-row aggregate (drift-proof against non-zero-based or sparse key
    ranges at the top); depth distribution is the output so the result
    stays small at any corpus size."""
    import math

    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    root, mx = p.agg(F.min("k"), F.max("k")).first()
    max_depth = max(2, int(math.log2(max(2, mx - root + 1))) + 2)
    n_rounds = max(1, math.ceil(math.log2(max_depth)))

    # serialized storage for the per-part pointer-jumping state (one
    # row per part — SF-scaling; the q_graph_bfs round-12 storage rule)
    state = p.select(
        "k",
        F.greatest(F.expr("k div 2"), F.lit(root)).alias("anc"),
        F.when(F.col("k") == root, F.lit(0)).otherwise(F.lit(1)).alias("d"),
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    for _ in range(n_rounds):
        hop = state.select(
            F.col("k").alias("h_k"),
            F.col("anc").alias("h_anc"),
            F.col("d").alias("h_d"),
        )
        state = (
            state.join(hop, state["anc"] == hop["h_k"])
            .select("k", F.col("h_anc").alias("anc"), (F.col("d") + F.col("h_d")).alias("d"))
            .localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        )
    return (
        state.groupBy(F.col("d").cast("long").alias("depth"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("k").alias("min_partkey"),
            F.max("k").alias("max_partkey"),
        )
        .orderBy("depth")
    )


@query(
    "q_interval_concurrency",
    oracle="""
    WITH gapped AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sess AS (
        SELECT user_id,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_seq,
               ts
        FROM gapped
    ), intervals AS (
        SELECT min(ts) AS s, max(ts) AS e
        FROM sess GROUP BY user_id, session_seq
    ), deltas AS (
        SELECT t, CAST(sum(d) AS BIGINT) AS net
        FROM (SELECT s AS t, 1 AS d FROM intervals
              UNION ALL
              SELECT e AS t, -1 AS d FROM intervals)
        GROUP BY t
    ), run AS (
        SELECT t,
               CAST(sum(net) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS conc
        FROM deltas
    )
    SELECT conc AS peak_concurrency,
           t    AS peak_ts,
           (SELECT CAST(count(*) AS BIGINT) FROM run) AS n_points
    FROM run
    ORDER BY conc DESC, t
    LIMIT 1
    """,
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: peak number of simultaneously open user
    sessions. Sessions (30-min-gap sessionization, q_evt_sessionize's
    shape) become ±1 deltas at their endpoints, netted per distinct
    timestamp; the running total over TIME order is the concurrency
    curve, and the peak row falls out of a TakeOrdered.

    The running total is the scale-critical part: a naive
    `sum() OVER (ORDER BY t)` funnels every delta through ONE task.
    `operators/ranking.py:global_prefix_sum` keeps it distributed —
    range-partition by t, local running sums, then broadcast the
    prefix-summed per-partition totals (one row per partition) as
    offsets. A session ending exactly at t is not counted at t (net =
    starts − ends per instant), which makes the curve deterministic
    without row-level tie rules — the same convention on both sides."""
    from mapreduce_llm_spark.operators.ranking import global_prefix_sum

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        # µs-precision gap: cast("long") truncates to whole seconds and
        # can disagree with the oracle's INTERVAL test at the boundary
        # (see queries/events.py:123)
        e.withColumn(
            "is_new",
            F.when(
                (
                    F.unix_micros(F.col("ts"))
                    - F.lag(F.unix_micros(F.col("ts"))).over(w)
                    > 1800 * 1_000_000
                )
                | F.lag("ts").over(w).isNull(),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_seq", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    deltas = (
        sess.select(F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionAll(sess.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    run = global_prefix_sum(deltas, [F.col("t")], "net", alias="conc")
    # n_points counts the operator's checkpoint-backed output (same
    # rows as deltas) instead of re-running the whole sessionization +
    # delta pipeline a second time (round-14 optimization)
    n_points = run.agg(F.count(F.lit(1)).alias("n_points"))
    return (
        run.select(F.col("conc").alias("peak_concurrency"), F.col("t").alias("peak_ts"))
        .orderBy(F.col("peak_concurrency").desc(), "peak_ts")
        .limit(1)
        .crossJoin(F.broadcast(n_points))
        .select("peak_concurrency", "peak_ts", "n_points")
    )
