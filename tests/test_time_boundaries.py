"""Sub-second session-boundary parity (VERDICT r1 item 5).

The sessionize gap compare runs at microsecond precision on both
engines (a whole-second truncation would split sessions differently
when a gap lands within 1 s of the 1800 s threshold). This test feeds
hand-built events whose gaps straddle the boundary by exactly ±1 µs —
plus same-timestamp ties — and requires the Spark result to match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_llm_spark import registry
from tests.oracle_harness import compare

registry.load_all()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
US = dt.timedelta(microseconds=1)
GAP = dt.timedelta(seconds=1800)


def _events_parquet(path: str) -> None:
    rows = []
    eid = 0

    def add(user, ts):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, user, "click", float(eid)))

    # user 1: gap exactly 1800 s (same session: threshold is strict >)
    add(1, T0)
    add(1, T0 + GAP)
    # user 2: gap 1800 s + 1 µs (new session)
    add(2, T0)
    add(2, T0 + GAP + US)
    # user 3: gap 1800 s - 1 µs (same session)
    add(3, T0)
    add(3, T0 + GAP - US)
    # user 4: identical timestamps (event_id tie-break orders them)
    add(4, T0)
    add(4, T0)
    add(4, T0 + GAP + US)
    # user 5: fractional-second chain crossing several whole seconds
    t = T0
    for k in range(5):
        add(5, t)
        t += dt.timedelta(seconds=1799, microseconds=999999 - k)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, path)


def test_sessionize_exact_at_microsecond_boundaries(spark, tmp_path):
    _events_parquet(os.path.join(tmp_path, "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'events.parquet')}')"
    )
    df = registry.QUERIES["q_evt_sessionize"](spark, str(tmp_path))
    ok, msg = compare(df, con, registry.ORACLE["q_evt_sessionize"], "q_evt_sessionize")
    assert ok, msg
    # sanity on the construction itself: user 2 splits, users 1 and 3
    # do not (strict > threshold at µs precision)
    seqs = {
        (r["user_id"]): r["n_sessions"]
        for r in (
            df.groupBy("user_id").count().withColumnRenamed("count", "n_rows").join(
                df.groupBy("user_id").agg({"session_seq": "max"}).withColumnRenamed(
                    "max(session_seq)", "n_sessions"
                ),
                "user_id",
            )
        ).collect()
    }
    assert seqs[1] == 1 and seqs[3] == 1
    assert seqs[2] == 2
