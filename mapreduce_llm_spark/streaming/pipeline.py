"""Structured Streaming pipeline (SURVEY.md §2C "streaming runtime",
build-plan phase 5).

Streaming twins of the batch event-time queries (queries/events.py):
the same groupBy(window) / session_window plans run under
``readStream`` with watermarks for late-data handling, plus stateful
per-key processing via ``applyInPandasWithState``. Deliberately kept
out of the driver-checked query set — streaming output depends on
micro-batch boundaries; correctness here is smoke-checked by
batch-equivalence tests (tests/test_streaming.py).

At scale the file source becomes Kafka (swap ``readStream.format``),
watermarks bound state size, and the memory sink becomes a parquet /
Delta sink — the plans are unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source event stream (micro-batch replay of parquet files
    with µs-timestamp events — see tests for the writer)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of q_evt_tumbling: watermarked 1-hour windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value"
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of q_evt_sliding: watermarked sliding windows
    (1 h width, 15 min slide — every event lands in 4 overlapping
    windows). State per key is one partial aggregate per open window;
    the watermark finalizes and evicts windows whose end has passed,
    so state is bounded by (watermark horizon / slide) windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


def ohlc_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of q_ts_ohlc: watermarked 15-minute OHLC bars —
    the hypertable continuous-aggregate shape. Open/close are
    ``min_by``/``max_by`` over the composite (ts, event_id) key inside
    the same watermarked aggregation as high/low/count, so each bar is
    one state-store row that the watermark eventually finalizes and
    evicts; state is bounded by (watermark horizon / bar width) bars
    per partition regardless of stream length."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "open", "high", "low", "close", "n_ticks",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of q_evt_session: native session windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark —
    the streaming analogue of exact dedup (state is bounded by the
    watermark horizon, so it runs forever without unbounded memory)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total across micro-batches (the
    arbitrary-state escape hatch for operators session_window can't
    express)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enriched_segment_counts_stream(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    static dimension, then aggregate per segment. The canonical
    "enrich events with reference data" shape; the static side is
    re-resolvable per batch, so a slowly-updated dim table is picked
    up without restarting the query.

    The dimension leg is deliberately UNHINTED: customers scales with
    SF, and ``F.broadcast`` is not advisory — a forced hint that works
    at sf0.1 becomes a forced multi-GB build at the 100-TB design
    point (the round-9 kcore class; flagged by the round-12 call-site
    tracing in tools/broadcast_lint.py). When the projection is under
    the auto-broadcast threshold Spark still picks the broadcast join
    per micro-batch on its own; past it, the per-batch shuffle join is
    the plan that completes."""
    dim = customers.select("c_custkey", "c_mktsegment")
    return (
        events.join(dim, events["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


TOPK_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("rank", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

_TOPK_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("ids", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def topk_events_stream(events: DataFrame, k: int = 5) -> DataFrame:
    """Streaming top-k: per event_type, the k highest-value events seen
    so far (ties → lower event_id). You can't sort an infinite stream;
    state is a k-sized ordered list per key — O(k) memory per key
    forever, each micro-batch merges its rows into the list and
    re-emits the current top-k. ``n_seen`` (events absorbed per key)
    lets a consumer pick the latest emission per key from an
    update-mode sink."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_seen, ids, vals = state.get if state.exists else (0, [], [])
        pairs = list(zip(ids, vals))
        for pdf in pdfs:
            n_seen += len(pdf)
            pairs.extend(zip(pdf["event_id"].tolist(), pdf["value"].tolist()))
        pairs.sort(key=lambda p: (-p[1], p[0]))
        del pairs[k:]
        state.update((n_seen, [p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "n_seen": n_seen,
                "rank": range(1, len(pairs) + 1),
                "event_id": [p[0] for p in pairs],
                "value": [p[1] for p in pairs],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=TOPK_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "update"
) -> "DataFrame":
    """Drive a streaming frame to completion against the memory sink
    (synchronous: processAllAvailable) and return the result table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def purchase_attribution_stream(
    events: DataFrame, watermark: str = "1 hour", join_horizon_minutes: int = 30
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same
    user's signup-or-click events in the preceding ``join_horizon``.

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends, so Spark can expire buffered state — the
    requirement that makes a stream-stream join runnable forever. The
    state store holds only ``watermark + horizon`` worth of each side.
    """
    left = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_ts"),
            F.col("event_type").alias("a_type"),
        )
        .withWatermark("a_ts", watermark)
    )
    horizon = f"interval {join_horizon_minutes} minutes"
    return left.join(
        right,
        F.expr(
            f"p_user = a_user AND a_ts <= p_ts AND a_ts >= p_ts - {horizon}"
        ),
        "inner",
    )


def interval_join_stream(
    events: DataFrame, watermark: str = "1 hour", join_horizon_minutes: int = 30
) -> DataFrame:
    """Stream-stream interval join CARRYING ROW IDENTITY — the
    batch-equivalence surface: each purchase paired with every click
    by the same user in the preceding ``join_horizon``, emitting
    (purchase event_id, click event_id, gap) so the complete join
    result is comparable row-for-row against a batch interval join.

    Same state contract as purchase_attribution_stream: watermarks on
    both sides plus a two-ended event-time bound let Spark evict
    buffered rows, so the topology runs forever holding only
    ``watermark + horizon`` worth of each side. Inner-join results
    emit as matches are found; eviction only drops rows provably
    unable to match future input, so driving the replay to completion
    yields exactly the batch join."""
    left = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    horizon = f"interval {join_horizon_minutes} minutes"
    return left.join(
        right,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - {horizon}"
        ),
        "inner",
    ).select(
        "p_id",
        "c_id",
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


def upsert_parquet_sink(updates: DataFrame, snapshot_path: str, keys: list[str]):
    """foreachBatch sink: MERGE each micro-batch into a parquet
    snapshot (operators/merge.py), giving keyed exactly-once-effect
    semantics — replaying a batch after a failure upserts the same
    keys again instead of duplicating them.

    The snapshot is swapped atomically via a staging directory
    (read-then-overwrite of the same path would corrupt the input of
    the job that's still reading it). On object stores you'd use a
    transactional table format for the swap; the merge plan itself is
    unchanged. Returns the DataStreamWriter (caller starts it with a
    checkpoint location).
    """
    import os
    import shutil

    from mapreduce_llm_spark.operators.merge import merge_upsert

    def do_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = snapshot_path + ".staging"
        if os.path.exists(snapshot_path):
            base = spark.read.parquet(snapshot_path)
            # a micro-batch can be a whole backlog on restart — let
            # AQE size the anti-join instead of forcing a broadcast
            merged = merge_upsert(
                base, batch_df.dropDuplicates(keys), keys, broadcast_updates=False
            )
        else:
            merged = batch_df.dropDuplicates(keys)
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(snapshot_path):
            shutil.rmtree(snapshot_path)
        os.rename(staging, snapshot_path)

    return updates.writeStream.foreachBatch(do_batch).outputMode("update")


def unattributed_purchases_stream(
    events: DataFrame, watermark: str = "1 hour", join_horizon_minutes: int = 30
) -> DataFrame:
    """LEFT OUTER stream-stream join: purchase_attribution_stream's
    matched pairs PLUS a null-extended row for every purchase with no
    same-user activity in the preceding horizon.

    The outer semantics are the interesting part: a purchase's null row
    can only be emitted once the RIGHT watermark passes its timestamp
    (no earlier — a matching late click could still arrive). Until
    then the row sits in the state store; on watermark advance Spark
    evicts and emits it null-extended. A consumer therefore sees
    unattributed purchases with a delay of `watermark`, which is the
    price of correctness under late data — the batch twin
    (left join in tests) has no such delay but also no late-data
    story."""
    left = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_ts"),
            F.col("event_type").alias("a_type"),
        )
        .withWatermark("a_ts", watermark)
    )
    horizon = f"interval {join_horizon_minutes} minutes"
    return left.join(
        right,
        F.expr(f"p_user = a_user AND a_ts <= p_ts AND a_ts >= p_ts - {horizon}"),
        "left_outer",
    )


EWMA_STREAM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n_seen", LongType())]
)


def ewma_stream(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """TRUE recursive EWMA per user (e_t = α·x_t + (1-α)·e_{t-1},
    e_0 = x_0) via applyInPandasWithState — the semantics the batch
    engine deliberately truncates (queries/analytics_r4b.py:q_ewma
    keeps 8 lag terms to stay a pure window expression). A stream is
    the natural home for the recursive form: state per user is ONE
    float + a counter, each micro-batch folds its rows in event-time
    order and emits a smoothed value per input row. Equivalence to the
    offline recursion holds when micro-batches arrive time-ordered per
    key (file replay / per-key-ordered Kafka partitions); out-of-order
    arrivals within a batch are sorted, across batches they are the
    stream's usual late-data caveat."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ewma, n_seen = state.get if state.exists else (None, 0)
        if n_seen == 0:
            # disambiguate the stored 0.0 sentinel: a key whose prior
            # invocations carried no rows has NO genuine prior — its
            # first real value must seed the recursion, not blend with
            # the sentinel
            ewma = None
        # the runtime hands one key's batch as an ITERATOR of Arrow
        # chunks in shuffle-arrival order — sorting each chunk alone
        # folds the recursion out of time order whenever a key spans
        # chunks (~10k rows), so buffer the whole batch and sort ONCE;
        # per-key-per-batch state is bounded by the batch, same as the
        # runtime's own shuffle buffer for this key
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            full = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts", "event_id"])
            out = []
            for x in full["value"]:
                x = float(x)
                ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
                out.append(ewma)
            n_seen += len(full)
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "event_id": full["event_id"].to_numpy(),
                    "ts": full["ts"].to_numpy(),
                    "ewma": out,
                }
            )
        state.update((ewma if ewma is not None else 0.0, n_seen))

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_STREAM_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
