"""Round-5 late batch: time-series diagnostics (autocorrelation,
CUSUM changepoint) and the hashing-trick feature encoder.

All are deterministic (integer joins, order-pinned window cumsums,
md5 bucket arithmetic), so their DuckDB twins were staged and
hash-proven in round 5 (queries/future_oracles.py) and graduated to
registered ``@query(oracle=GRADUATED_ORACLES[...])`` declarations in
the round-6 rotation.

Scale discipline: every query collapses the event stream to daily /
token aggregates FIRST; windows and joins then run over
calendar-bounded or bucket-bounded tables, never fact volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES


@query("q_autocorr", oracle=GRADUATED_ORACLES["q_autocorr"])
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event counts at lags 1–7 per event
    type — the periodicity fingerprint that tells a forecaster which
    seasonal-naive lag to use (q_forecast_naive assumes 7; this
    measures it). The series is the DAILY aggregate (#days rows per
    type), the lagged pairing is a calendar-correct self-join on
    d = d + lag (never positional lag over gap days) with the 7 lags
    exploded from a literal array, and each (type, lag)'s Pearson
    correlation is a single-pass moment aggregate. Everything after
    the first grouped pass is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    shifted = daily.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
        F.col("d").alias("d0"),
        F.col("n").alias("n_lag"),
    ).select(
        "event_type", "lag", F.expr("date_add(d0, lag)").alias("d"), "n_lag"
    )
    return (
        daily.join(shifted, ["event_type", "d"])
        .groupBy("event_type", F.col("lag").cast("int").alias("lag"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.corr("n", "n_lag") + 0.0, 4).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@query("q_cusum_changepoint", oracle=GRADUATED_ORACLES["q_cusum_changepoint"])
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily volumes: per event type,
    the day where the cumulative deviation from the series mean peaks
    in magnitude — the classic level-shift locator (a stable series
    keeps its CUSUM near zero; a shifted one walks away fastest at the
    break). The cumsum window runs over the ~#days daily table per
    type in deterministic d-order, so the float accumulation is
    order-pinned (bit-identical across engines) and calendar-bounded;
    the argmax is a rank over the same tiny table with the day as
    tie-break. Emits the peak day, the peak |CUSUM|, and the series
    mean the deviations were taken against."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mean_n"), F.count("*").alias("n_days")
    )
    wsum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.sum(F.col("n") - F.col("mean_n")).over(wsum))
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "d"
    )
    return (
        cusum.withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.round(F.abs(F.col("cusum")), 4).alias("max_abs_cusum"),
            F.round("mean_n", 4).alias("mean_n"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


@query("q_feature_hash", oracle=GRADUATED_ORACLES["q_feature_hash"])
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: project an unbounded token vocabulary onto a
    FIXED 64-bucket feature space via md5 arithmetic — the encoder
    that needs no vocabulary pass, no fitting, and no driver state
    (the reason it scales to any corpus: bucket = hash(word) % 64 is a
    pure row expression). Emits the per-source bucket profile plus the
    collision diagnostic (distinct words per bucket) a practitioner
    checks before trusting the dimensionality. The md5→BIGINT bucket
    (same arithmetic as operators/validate.row_fingerprint) is
    engine-reproducible — the registered oracle recomputes it exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("w")), 1, 10), 16, 10).cast("long"),
        F.lit(64),
    ).cast("int")
    return (
        toks.groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("w").alias("n_distinct_words"),
        )
        .orderBy("source", "bucket")
    )


@query("q_seq_pattern", oracle=GRADUATED_ORACLES["q_seq_pattern"])
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event histories — the
    MATCH_RECOGNIZE shape: each user's time-ordered event types
    collapse to an initials string ('v' view, 'c' click, …) and
    regular expressions do the rest (here: the unbounded-time funnel
    v.*c.*p, and the count of DIRECT view→click adjacencies, which
    the time-bounded q_window_funnel cannot express). The history is
    capped at the first 1000 events per user IDENTICALLY on both
    engines (rank ≤ 1000 — the bound that keeps one hyperactive user
    from materializing an unbounded string at corpus scale; TPC-H-ish
    users are far below it, so the cap is inert on testdata). One
    shuffle on user_id; the regex runs once per user on a ≤1000-char
    string. Adjacency count is strip-and-measure ((len −
    len(replace(seq,'vc',''))) / 2) — DuckDB 1.0 has no regexp_count.
    The DuckDB twin (string_agg ORDER BY) is the registered oracle
    (GRADUATED_ORACLES)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = e.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 1000)
    seqs = (
        capped.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("rk", F.substring("event_type", 1, 1).alias("c"))
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("seq")
        )
    )
    n_vc = (
        F.length("seq") - F.length(F.regexp_replace("seq", "vc", ""))
    ) / 2
    return seqs.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        F.col("seq").rlike("v.*c.*p").alias("has_funnel"),
        n_vc.cast("int").alias("n_direct_vc"),
    ).orderBy("user_id")


@query("q_heavy_hitters", oracle=GRADUATED_ORACLES["q_heavy_hitters"])
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters with the error THEOREM in the output
    (the q_sketch_bounds pattern applied to frequency): the token
    stream folds into 8 bounded-memory summaries of 200 counters each
    (operators/heavyhitters.py — O(k) memory per partition however
    long the stream), and for each of the exact top-10 words the query
    emits the exact count plus two booleans the Misra–Gries guarantees
    force to TRUE: containment (a word with count above the summed
    decrement bound cannot be missing from its partition's summary)
    and the sandwich bound (summary estimate ≤ exact ≤ estimate +
    decrements). Raw estimates are deliberately NOT emitted — summary
    content is arrival-order-dependent (as in any streaming summary),
    the guarantees are not, so the output is deterministic and the
    registered oracle (exact counts + constant TRUEs) hash-gates the
    theorem. The exact side is the expensive full-shuffle pass the
    sketch exists to replace at 100 TB; here it is the gate. The
    1-row decrement-total leg is a broadcast cross (allowlisted)."""
    from mapreduce_llm_spark.operators.heavyhitters import misra_gries_summaries

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .where(F.col("w") != "")
    )
    summaries = misra_gries_summaries(toks, "w", k=200, num_partitions=8)
    totals = (
        summaries.groupBy("pid")
        .agg(F.first("part_dec").alias("dec"))
        .agg(F.sum("dec").alias("total_dec"))
    )
    merged = (
        summaries.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est_sum"))
    )
    exact = (
        toks.groupBy("w")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "w")
        .limit(10)
    )
    joined = (
        exact.join(merged, exact["w"] == merged["item"], "left")
        .crossJoin(F.broadcast(totals))
    )
    in_summary = F.col("est_sum").isNotNull()
    return joined.select(
        "w",
        "exact_n",
        (in_summary | (F.col("exact_n") <= F.col("total_dec"))).alias(
            "containment_ok"
        ),
        (
            ~in_summary
            | (
                (F.col("est_sum") <= F.col("exact_n"))
                & (F.col("exact_n") <= F.col("est_sum") + F.col("total_dec"))
            )
        ).alias("bounds_ok"),
    ).orderBy(F.col("exact_n").desc(), "w")


@query("q_ngram_novelty", oracle=GRADUATED_ORACLES["q_ngram_novelty"])
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram novelty — the diversity/contamination
    profile a corpus-mixing decision reads: per source, how many
    distinct word 3-grams it contributes and what fraction appear in
    NO other source (novelty 1.0 = fully distinct corpus; near 0 =
    this source re-treads the others — q_decontaminate's logic turned
    from a filter into a per-source measurement). Grams collapse to
    DISTINCT (source, gram) before anything else, the per-gram source
    count is one re-aggregation of that table, and the exclusive flag
    joins back on the gram — shuffles carry grams, never documents.
    The DuckDB twin (list comprehension over the filtered token
    array) is the registered oracle (GRADUATED_ORACLES)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda w: w != "")
    grams = (
        docs.select(
            "source",
            F.explode(
                # Spark's sequence(1, 0) DESCENDS to [1, 0] (DuckDB's
                # generate_series(1, 0) is empty) — guard short texts
                # explicitly or element_at(ws, 0) raises
                F.when(
                    F.size(ws) >= 3,
                    F.transform(
                        F.sequence(F.lit(1), F.size(ws) - 2),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(ws, i),
                            F.element_at(ws, i + 1),
                            F.element_at(ws, i + 2),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .distinct()
    )
    spread = grams.groupBy("gram").agg(
        F.count("*").alias("n_sources")
    )
    return (
        grams.join(spread, "gram")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exclusive"),
            F.round(
                F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
                / F.count("*").cast("double"),
                4,
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


@query("q_zipf_slope", oracle=GRADUATED_ORACLES["q_zipf_slope"])
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: the least-squares slope of
    ln(frequency) on ln(rank) over the source's top-100 words —
    natural corpora slope near −1, and a source that deviates hard
    (synthetic boilerplate, templated spam) shows up immediately, so
    this is the one-number corpus-health check next to q_ngram_novelty
    and q_text_stats. One token aggregation, a per-source rank window
    over the per-source vocabulary (tie-broken on the word), then the
    single-pass regr_slope moment fold over ≤100 rows per source.
    Oracle-backed since round 6 (graduated staging batch) —
    counts are exact ints and both engines share the regr_slope
    definition, so the fit is bit-stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    freqs = toks.groupBy("source", "w").agg(F.count("*").alias("n"))
    w_rank = Window.partitionBy("source").orderBy(F.col("n").desc(), "w")
    ranked = freqs.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") <= 100
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.round(
                F.regr_slope(F.log(F.col("n")), F.log(F.col("rk"))) + 0.0, 4
            ).alias("zipf_slope"),
            F.round(
                F.regr_r2(F.log(F.col("n")), F.log(F.col("rk"))) + 0.0, 4
            ).alias("fit_r2"),
        )
        .orderBy("source")
    )


@query("q_ttr_heaps", oracle=GRADUATED_ORACLES["q_ttr_heaps"])
def q_ttr_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per source: token count, type (distinct word)
    count, the type-token ratio, and the Heaps'-law exponent estimate
    ln(types)/ln(tokens) — the vocabulary-growth fingerprint (natural
    text sits near 0.5; templated text collapses toward 0, random
    noise toward 1). One aggregation pass per side of the
    distinct-count; everything is exact integer arithmetic until the
    final two rounded ratios. Oracle registered since round 6
    (graduated staging batch)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("w").alias("n_types"),
            F.round(
                F.count_distinct("w") / F.count("*").cast("double"), 4
            ).alias("ttr"),
            F.round(
                F.log(F.count_distinct("w").cast("double"))
                / F.log(F.count("*").cast("double")),
                4,
            ).alias("heaps_beta"),
        )
        .orderBy("source")
    )


@query("q_custom_source", oracle=GRADUATED_ORACLES["q_custom_source"])
def q_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python DataSource API as declared surface
    (mapreduce_llm_spark/pysource.py): a pure-Python class registered
    as a first-class `spark.read.format("mrs_synth_events")` source
    with partitioned reads (8 splits planned by the source) and
    FILTER PUSHDOWN — the event_type predicate reaches the source via
    pushFilters and non-matching rows are never materialized, the
    same contract a REST/queue/proprietary-store connector
    implements. The generator is pure integer hashing, so the registered
    DuckDB oracle REGENERATES the rows from the same arithmetic and
    hash-verifies the aggregate — an external engine proving the
    custom source honors its contract end-to-end (generation,
    partitioning, pushdown). The oracle (GRADUATED_ORACLES)
    regenerates and verifies it."""
    from mapreduce_llm_spark.pysource import register

    register(spark)
    df = (
        spark.read.format("mrs_synth_events")
        .option("n_rows", 20000)
        .option("n_partitions", 8)
        .load()
    )
    return (
        df.where(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 10).cast("int").alias("user_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_bucket")
    )
