"""Streaming smoke tests (SURVEY §5.2 item 5): file-source micro-batch
replay of events, batch-equivalence for windowed aggs, watermark
late-data drop, stateful dedup, and the custom stateful operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.streaming.pipeline import (
    dedup_stream,
    run_to_memory,
    running_totals_stream,
    sessionized_stream,
    stream_events,
    tumbling_counts_stream,
)
from tests.conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Replay sf0.001 events as a 4-file parquet directory with proper
    µs timestamps (the raw testdata is ns, which readStream rejects)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    e = load_table(spark, SMOKE_SF_DIR, "events")
    e.repartitionByRange(4, "ts").write.mode("overwrite").parquet(out)
    return out


def test_stream_tumbling_matches_batch(spark, events_dir):
    """Complete-mode streaming window counts == batch window counts."""
    stream = stream_events(spark, events_dir)
    got = run_to_memory(
        tumbling_counts_stream(stream), "t_tumbling", output_mode="complete"
    )
    batch = (
        load_table(spark, SMOKE_SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events")
    )
    g = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b and len(b) > 0


def test_stream_session_runs(spark, events_dir):
    stream = stream_events(spark, events_dir, max_files_per_trigger=4)
    got = run_to_memory(sessionized_stream(stream), "t_session", output_mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_stream_dedup_drops_replayed_file(spark, events_dir, tmp_path):
    """Append the same earliest file twice: dropDuplicatesWithinWatermark
    must emit each event_id once."""
    import shutil, os

    dup_dir = str(tmp_path / "dup_events")
    shutil.copytree(events_dir, dup_dir)
    # duplicate one part file under a new name → same event_ids replayed
    parts = [f for f in os.listdir(dup_dir) if f.endswith(".parquet")]
    shutil.copy(
        os.path.join(dup_dir, parts[0]), os.path.join(dup_dir, "part-dup.parquet")
    )
    stream = stream_events(spark, dup_dir)
    # watermark wider than the 30-day corpus span: files replay out of
    # time order, and a narrow watermark would drop whole files as
    # late (that behavior is covered by test_stream_watermark_drops_
    # late_rows) — here we isolate the dedup semantics
    got = run_to_memory(
        dedup_stream(stream, watermark="60 days"), "t_dedup", output_mode="append"
    )
    n_unique = load_table(spark, SMOKE_SF_DIR, "events").count()
    counts = got.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert counts == 0
    assert got.count() == n_unique


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    """Two-file ordered replay: file B's event is older than the
    watermark horizon established by file A → its window never appears
    in append-mode output."""
    import pandas as pd

    base = str(tmp_path / "late_events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(base)

    # file A: events up to 12:00 → watermark ≈ 11:50
    write_file("a", [(1, "2024-01-01 10:00:05", 1, "x", 1.0, "{}"),
                     (2, "2024-01-01 12:00:00", 1, "x", 1.0, "{}")])
    stream = stream_events(spark, base, max_files_per_trigger=2)
    agg = tumbling_counts_stream(stream, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName("t_late").start()
    )
    try:
        q.processAllAvailable()
        # file B: an 08:00 event — hours behind the 11:50 watermark
        write_file("b", [(3, "2024-01-01 08:00:00", 1, "x", 1.0, "{}")])
        q.processAllAvailable()
        # file C: advance event time far enough to close all live windows
        write_file("c", [(4, "2024-01-02 00:00:00", 1, "x", 1.0, "{}")])
        q.processAllAvailable()
        # engine metrics must attribute EXACTLY the one injected late row
        # to the watermark, batch by batch — not just "its window is
        # absent" (which could also result from a mis-binned row)
        import json as _json

        dropped = [
            sum(op["numRowsDroppedByWatermark"] for op in p["stateOperators"])
            for p in (_json.loads(pr.json) for pr in q.recentProgress)
            if p.get("stateOperators")
        ]
    finally:
        q.stop()
    assert sum(dropped) == 1, f"watermark drop counts per batch: {dropped}"
    out = spark.table("t_late").collect()
    starts = {r["bucket_start"].strftime("%H:%M") for r in out}
    assert "10:00" in starts and "12:00" in starts
    assert "08:00" not in starts  # late row dropped by the watermark


def test_stream_running_totals_stateful(spark, events_dir):
    """applyInPandasWithState accumulates across micro-batches: the
    final per-user totals must equal the batch aggregation."""
    stream = stream_events(spark, events_dir)  # 4 micro-batches
    got = run_to_memory(running_totals_stream(stream), "t_state", output_mode="update")
    # update mode emits one row per user per batch; keep the last
    final = {r["user_id"]: r for r in got.collect()}  # memory table keeps all
    batch = {
        r["user_id"]: (r["n"], r["v"])
        for r in load_table(spark, SMOKE_SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    # the max n_events row per user is the final state
    got_final = {}
    for r in spark.table("t_state").collect():
        cur = got_final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got_final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert set(got_final) == set(batch)
    for u, (n, v) in batch.items():
        assert got_final[u][0] == n
        assert abs(got_final[u][1] - v) < 1e-6


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast join + agg == the same plan run batch."""
    from mapreduce_llm_spark.streaming.pipeline import enriched_segment_counts_stream

    customers = load_table(spark, SMOKE_SF_DIR, "customer")
    stream = stream_events(spark, events_dir)
    got = run_to_memory(
        enriched_segment_counts_stream(stream, customers),
        "t_enrich",
        output_mode="complete",
    )
    g = {r["c_mktsegment"]: (r["n_events"], r["sum_value"]) for r in got.collect()}
    events = load_table(spark, SMOKE_SF_DIR, "events")
    dim = customers.select("c_custkey", "c_mktsegment")
    b = {
        r["c_mktsegment"]: (r["n"], r["v"])
        for r in events.join(dim, events["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(g) == set(b) and len(b) > 0
    for k, (n, v) in b.items():
        assert g[k][0] == n and abs(g[k][1] - v) < 1e-6


def test_stream_topk_matches_batch(spark, events_dir):
    """Streaming top-k (k-sized state per key, merged per micro-batch)
    converges to the batch row_number top-k once all files are seen."""
    from pyspark.sql import Window

    from mapreduce_llm_spark.streaming.pipeline import topk_events_stream

    stream = stream_events(spark, events_dir)  # 4 micro-batches
    got = run_to_memory(topk_events_stream(stream, k=5), "t_topk", output_mode="update")
    # update mode re-emits the running top-k each batch; the emission
    # with the max n_seen per key is the final one
    final_seen = {}
    for r in got.collect():
        final_seen[r["event_type"]] = max(
            final_seen.get(r["event_type"], 0), r["n_seen"]
        )
    got_final = {
        (r["event_type"], r["rank"]): (r["event_id"], r["value"])
        for r in got.collect()
        if r["n_seen"] == final_seen[r["event_type"]]
    }
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    batch = {
        (r["event_type"], r["rank"]): (r["event_id"], r["value"])
        for r in load_table(spark, SMOKE_SF_DIR, "events")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got_final == batch and len(batch) > 0


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Stream-stream time-bounded join == the same join run as batch."""
    from mapreduce_llm_spark.streaming.pipeline import purchase_attribution_stream

    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    got = run_to_memory(
        purchase_attribution_stream(stream), "t_attr", output_mode="append"
    )
    # batch twin: same condition without watermarks
    e = load_table(spark, SMOKE_SF_DIR, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    right = e.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    batch = left.join(
        right,
        F.expr("p_user = a_user AND a_ts <= p_ts AND a_ts >= p_ts - interval 30 minutes"),
    )
    assert got.count() == batch.count() > 0


def test_stream_upsert_sink_is_idempotent_per_key(spark, events_dir, tmp_path):
    """Replay the same file twice through the upsert sink: the snapshot
    must hold each event_id exactly once (keyed exactly-once effect)."""
    import shutil, os

    from mapreduce_llm_spark.streaming.pipeline import upsert_parquet_sink

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    first = sorted(f for f in os.listdir(events_dir) if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(events_dir, first), os.path.join(src, "a.parquet"))
    shutil.copy(os.path.join(events_dir, first), os.path.join(src, "b.parquet"))

    snapshot = str(tmp_path / "snapshot")
    stream = stream_events(spark, src, max_files_per_trigger=1)
    q = (
        upsert_parquet_sink(stream, snapshot, keys=["event_id"])
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(snapshot)
    n_ids = spark.read.parquet(os.path.join(src, "a.parquet")).count()
    assert got.count() == got.select("event_id").distinct().count() == n_ids


def test_session_window_exact_gap_merges(spark):
    """The q_evt_session oracle encodes `new session iff gap > 30 min`;
    that is only right if Spark's session_window merges two events
    EXACTLY 30:00 apart (touching windows). Pin it."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:30:00")],
        "uid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "uid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 2


def test_stream_outer_join_flushes_unattributed_on_watermark(
    spark, events_dir, tmp_path
):
    """Left-outer stream-stream join: null-extended rows for purchases
    with no prior activity must be emitted once the watermark passes
    them. Two far-future sentinel files (processed in their own final
    micro-batches, mtime-ordered) push both sides' watermarks beyond
    every original purchase, so ALL original unattributed purchases
    flush; the streaming multiset must then equal the batch left join."""
    import os
    import shutil

    import pandas as pd

    from mapreduce_llm_spark.streaming.pipeline import (
        unattributed_purchases_stream,
    )

    src = str(tmp_path / "outer_src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(events_dir) if f.endswith(".parquet"))
    base_mtime = os.path.getmtime(os.path.join(events_dir, files[0]))
    # The file source replays in mtime order. The range-partitioned
    # part files carry ascending ts ranges in name order but
    # near-identical mtimes — pin strictly increasing mtimes so the
    # replay respects event time (otherwise an out-of-order file makes
    # the watermark drop its rows as late, nondeterministically).
    for i, f in enumerate(files):
        dst = os.path.join(src, f)
        shutil.copy(os.path.join(events_dir, f), dst)
        os.utime(dst, (base_mtime + i, base_mtime + i))

    max_ts = load_table(spark, SMOKE_SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, days in enumerate((10, 11)):
        sent_ts = pd.Timestamp(max_ts) + pd.Timedelta(days=days)
        table = pa.table(
            {
                "event_id": pa.array([9_000_000 + 2 * i, 9_000_001 + 2 * i], pa.int64()),
                # µs precision to match EVENTS_STREAM_SCHEMA's TimestampType
                "ts": pa.array([sent_ts.to_pydatetime()] * 2, pa.timestamp("us")),
                "user_id": pa.array([999_901 + i] * 2, pa.int64()),
                "event_type": pa.array(["purchase", "click"], pa.string()),
                "value": pa.array([0.0, 0.0], pa.float64()),
                "props": pa.array(["", ""], pa.string()),
            }
        )
        p = os.path.join(src, f"zz{i}.parquet")
        pq.write_table(table, p)
        os.utime(p, (base_mtime + 100 + i, base_mtime + 100 + i))

    stream = stream_events(spark, src, max_files_per_trigger=1)
    got = run_to_memory(
        unattributed_purchases_stream(stream), "t_outer", output_mode="append"
    ).filter(F.col("p_user") < 999_900)

    e = spark.read.parquet(*[os.path.join(src, f) for f in files])
    left = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    right = e.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    batch = left.join(
        right,
        F.expr(
            "p_user = a_user AND a_ts <= p_ts AND a_ts >= p_ts - interval 30 minutes"
        ),
        "left_outer",
    )
    n_null_stream = got.filter(F.col("a_type").isNull()).count()
    n_null_batch = batch.filter(F.col("a_type").isNull()).count()
    assert got.count() == batch.count() > 0
    assert n_null_stream == n_null_batch > 0


def test_stream_session_append_matches_batch(spark, events_dir, tmp_path):
    """Append-mode session windows emit a session only after the
    watermark passes its close — so with a far-future sentinel forcing
    the final watermark advance, the streamed session multiset must
    equal the batch session_window aggregation exactly (counts AND
    sums), not just smoke-run. Ordered replay via pinned mtimes."""
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_llm_spark.streaming.pipeline import sessionized_stream

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(events_dir) if f.endswith(".parquet"))
    base_mtime = os.path.getmtime(os.path.join(events_dir, files[0]))
    for i, f in enumerate(files):
        dst = os.path.join(src, f)
        shutil.copy(os.path.join(events_dir, f), dst)
        os.utime(dst, (base_mtime + i, base_mtime + i))
    max_ts = load_table(spark, SMOKE_SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    sent_ts = pd.Timestamp(max_ts) + pd.Timedelta(days=10)
    table = pa.table(
        {
            "event_id": pa.array([9_900_000], pa.int64()),
            "ts": pa.array([sent_ts.to_pydatetime()], pa.timestamp("us")),
            "user_id": pa.array([999_901], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([""], pa.string()),
        }
    )
    sent = os.path.join(src, "zz_sentinel.parquet")
    pq.write_table(table, sent)
    os.utime(sent, (base_mtime + 100, base_mtime + 100))

    stream = stream_events(spark, src, max_files_per_trigger=1)
    got = run_to_memory(
        sessionized_stream(stream), "t_session_append", output_mode="append"
    ).filter(F.col("user_id") < 999_900)

    batch = (
        spark.read.parquet(*[os.path.join(src, f) for f in files])
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    g = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 4))
        for r in got.collect()
    }
    b = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 4))
        for r in batch.collect()
    }
    assert len(g) == got.count() and len(b) == batch.count()
    assert g == b and len(b) > 0


def test_stream_ohlc_matches_batch_query(spark, events_dir):
    """Complete-mode streaming OHLC bars must equal the batch q_ts_ohlc
    computed over the same events — including the min_by/max_by
    open/close tie-breaks, which must behave identically under
    micro-batch incremental aggregation (partial states merge across
    batches in arrival order, so a wrong merge would surface here)."""
    from mapreduce_llm_spark.streaming.pipeline import ohlc_stream

    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    got = run_to_memory(ohlc_stream(stream), "t_ohlc", output_mode="complete")
    e = load_table(spark, SMOKE_SF_DIR, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    batch = (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .select(F.col("w.start").alias("bucket_start"), "open", "high", "low", "close", "n_ticks")
    )
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b and len(b) > 0


def test_stream_ewma_matches_offline_recursion(spark, tmp_path):
    """The stateful streaming EWMA must equal the offline recursion
    (pandas ewm(adjust=False)) when micro-batches replay in time
    order — state carries e_{t-1} across batch boundaries."""
    import os
    import time as _time

    import pandas as pd

    from mapreduce_llm_spark.streaming.pipeline import (
        ewma_stream,
        run_to_memory,
        stream_events,
    )

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    n = len(events)
    # three sequential time-ordered files with increasing mtimes so the
    # file source replays them oldest-first, one per trigger
    for i, chunk in enumerate(
        (events.iloc[: n // 3], events.iloc[n // 3 : 2 * n // 3], events.iloc[2 * n // 3 :])
    ):
        # via Spark so ts lands as µs TIMESTAMP (pandas to_parquet
        # writes ns INT64, which the stream schema can't read)
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.05)

    got = run_to_memory(
        ewma_stream(stream_events(spark, src), alpha=0.3), "ewma_stream_t"
    ).toPandas()

    expected = events.sort_values(["user_id", "ts", "event_id"]).copy()
    expected["ewma"] = expected.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )

    merged = got.merge(
        expected[["event_id", "ewma"]], on="event_id", suffixes=("_got", "_want")
    )
    assert len(merged) == len(events) == len(got)
    assert (merged["ewma_got"] - merged["ewma_want"]).abs().max() < 1e-9


def test_stream_ewma_sorts_across_arrow_chunks(spark, tmp_path):
    """Regression for the round-4 self-review bug: applyInPandasWithState
    delivers one key's micro-batch as MULTIPLE Arrow chunks (10k rows
    each by default) in shuffle-arrival order, and the old
    implementation sorted each chunk independently — folding the
    recursion out of time order whenever a key spans chunks. 25k
    deliberately time-shuffled rows for ONE user in ONE batch force 3
    chunks whose time ranges interleave; the result must still equal
    the offline recursion."""
    import datetime as dt
    import os

    import numpy as np
    import pandas as pd

    from mapreduce_llm_spark.streaming.pipeline import (
        ewma_stream,
        run_to_memory,
        stream_events,
    )

    rng = np.random.RandomState(5)
    n = 25_000
    order = rng.permutation(n)  # file order != time order
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "event_id": order.astype(np.int64),
            "ts": [base + dt.timedelta(seconds=int(i)) for i in order],
            "user_id": np.int64(7),
            "event_type": "tick",
            "value": rng.rand(n) * 100,
        }
    )
    pdf["props"] = ""
    src = str(tmp_path / "chunk_src")
    os.makedirs(src)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    got = run_to_memory(
        ewma_stream(stream_events(spark, src), alpha=0.3), "ewma_chunk_t"
    ).toPandas()
    assert len(got) == n

    expected = pdf.sort_values(["ts", "event_id"]).copy()
    expected["ewma"] = expected["value"].ewm(alpha=0.3, adjust=False).mean()
    merged = got.merge(
        expected[["event_id", "ewma"]], on="event_id", suffixes=("_got", "_want")
    )
    assert (merged["ewma_got"] - merged["ewma_want"]).abs().max() < 1e-9


def test_published_stream_source_mtimes_follow_time_ranges(spark):
    """_publish_stream_source must stamp strictly ascending mtimes in
    ts-range order (FileStreamSource orders by mtime; one parquet job
    stamps all files identically, which would leave replay order to
    unspecified tie-breaking)."""
    import os

    from mapreduce_llm_spark.queries.streaming_queries import (
        _publish_stream_source,
    )

    src = _publish_stream_source(spark, SMOKE_SF_DIR)
    parts = sorted(
        f for f in os.listdir(src) if f.startswith("part-") and f.endswith(".parquet")
    )
    assert len(parts) >= 2
    mtimes = [os.path.getmtime(os.path.join(src, f)) for f in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    mins = [
        spark.read.parquet(os.path.join(src, f)).agg({"ts": "min"}).collect()[0][0]
        for f in parts
    ]
    assert mins == sorted(mins)
