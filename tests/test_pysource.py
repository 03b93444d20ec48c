"""Custom Python data source (mapreduce_llm_spark/pysource.py):
partition planning, filter pushdown semantics (accepted vs returned),
pushdown correctness vs post-scan filtering, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.pysource import (
    SyntheticEventsReader,
    _row,
    register,
)
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def test_reader_plans_requested_partitions():
    r = SyntheticEventsReader({"n_rows": "1000", "n_partitions": "7"})
    parts = r.partitions()
    assert len(parts) == 7
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 0 and covered[-1][1] == 1000
    for (s1, e1), (s2, _) in zip(covered, covered[1:]):
        assert e1 == s2, "partition ranges must tile without gaps"


def test_empty_source_plans_one_empty_split(spark):
    r = SyntheticEventsReader({"n_rows": "0"})
    parts = r.partitions()
    assert len(parts) == 1 and list(r.read(parts[0])) == []
    register(spark)
    df = spark.read.format("mrs_synth_events").option("n_rows", 0).load()
    assert df.count() == 0


def test_push_filters_accepts_type_equality_and_returns_rest():
    r = SyntheticEventsReader({})
    rest = list(
        r.pushFilters(
            [EqualTo(("event_type",), "purchase"), GreaterThan(("value",), 10.0)]
        )
    )
    assert r.type_filter == "purchase"
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
    # a second equality cannot be absorbed — it must come back to Spark
    rest2 = list(r.pushFilters([EqualTo(("event_type",), "view")]))
    assert len(rest2) == 1 and r.type_filter == "purchase"


def test_pushdown_skips_nonmatching_rows_at_generation():
    r = SyntheticEventsReader({"n_rows": "500", "n_partitions": "1"})
    list(r.pushFilters([EqualTo(("event_type",), "click")]))
    got = list(r.read(r.partitions()[0]))
    assert got, "filter produced nothing"
    assert all(row[2] == "click" for row in got)
    expected = [
        _row(i) for i in range(500) if _row(i)[2] == "click"
    ]
    assert got == expected


def test_source_end_to_end_matches_reference(spark):
    register(spark)
    df = (
        spark.read.format("mrs_synth_events")
        .option("n_rows", 2000)
        .option("n_partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 2000
    filtered = df.where(F.col("event_type") == "signup").count()
    assert filtered == sum(1 for i in range(2000) if _row(i)[2] == "signup")


def test_q_custom_source_buckets(spark):
    rows = QUERIES["q_custom_source"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 10  # every user bucket populated at 20k rows
    ref: dict[int, int] = {}
    for i in range(20000):
        r = _row(i)
        if r[2] == "purchase":
            ref[r[1] % 10] = ref.get(r[1] % 10, 0) + 1
    for row in rows:
        assert row["n_events"] == ref[row["user_bucket"]]


def test_push_filters_side_effect_is_eager():
    # pushFilters must not be a generator: the type_filter side effect
    # and the returned unsupported list have to materialize even if the
    # caller never iterates the result (ADVICE, round 5)
    r = SyntheticEventsReader({})
    res = r.pushFilters(
        [EqualTo(("event_type",), "signup"), GreaterThan(("value",), 1.0)]
    )
    assert isinstance(res, list), "pushFilters returned a lazy iterator"
    assert r.type_filter == "signup"
    assert len(res) == 1 and isinstance(res[0], GreaterThan)
