"""Loader tolerance to data-generator format drift.

The corpus snapshot's timestamp encoding has already changed once
between rounds (events.ts: TIMESTAMP(NANOS) → TIMESTAMP_NTZ(µs)),
which crashed every events query until the loader branched on the
on-disk type. These tests pin the contract: whatever of the three
encodings arrives, ``load_table`` must yield the same session-TZ
TimestampType values.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_llm_spark.io import load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 6, 15, 12, 30, 45, 987654),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    ts_us = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS]
    if pa.types.is_timestamp(ts_type) and ts_type.unit == "ns":
        ts_arr = pa.array([v * 1000 for v in ts_us], pa.timestamp("ns"))
    else:
        ts_arr = pa.array(ts_us, pa.timestamp("us")).cast(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pytest.param(pa.timestamp("ns"), id="nanos"),
        pytest.param(pa.timestamp("us"), id="ntz_micros"),
        pytest.param(pa.timestamp("us", tz="UTC"), id="ltz_micros"),
    ],
)
def test_load_events_normalizes_every_ts_encoding(spark, tmp_path, ts_type):
    _write_events(os.path.join(tmp_path, "events.parquet"), ts_type)
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS


def test_load_orders_tolerates_nanos(spark, tmp_path):
    ts_us = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS]
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_totalprice": pa.array([100.0, 200.0], pa.float64()),
            "o_orderdate": pa.array([v * 1000 for v in ts_us], pa.timestamp("ns")),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "orders.parquet"))
    df = load_table(spark, str(tmp_path), "orders")
    got = [r["o_orderdate"] for r in df.orderBy("o_orderkey").collect()]
    assert got == TS


def test_load_events_tolerates_date_typed_ts(spark, tmp_path):
    """A DATE-typed snapshot column must load as midnight timestamps
    (F.window()/unix_micros consumers would reject DateType)."""
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t.date() for t in TS], pa.date32()),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == [dt.datetime.combine(t.date(), dt.time()) for t in TS]


def test_load_rejects_unknown_nanos_column_loudly(spark, tmp_path):
    """A NEW ns-encoded timestamp column (not in load_table's ts_cols
    map) must raise, not flow downstream as a silent int64 of
    nanoseconds (the nanosAsLong hazard flagged in round-3 ADVICE)."""
    ts_us = [
        int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "ingested_at": pa.array([v * 1000 for v in ts_us], pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "events.parquet"))
    with pytest.raises(TypeError, match="ingested_at"):
        load_table(spark, str(tmp_path), "events").schema
