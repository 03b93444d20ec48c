"""Gated snapshot publishing — the load-side pattern composed from the
round-3 table-management operators, in execution order:

  1. transform  revenue rollup over orders ⋈ customer (any query works)
  2. gate       q_dq_checks-style audit — the publish ABORTS if any
                check fails; a bad snapshot never becomes visible
  3. layout     z-order the output on its two most-filtered columns so
                parquet stats prune row groups for either predicate
  4. publish    write_snapshot: the z-ordered data lands in an
                immutable v=<n> directory, then one atomic pointer
                rename makes it live — readers see the old version
                until the instant the new one is complete
  5. verify     read it back (latest + time travel to the previous)

Everything runs offline on the sf0.001 fixtures in a few seconds.

Run:  python examples/publish_snapshot.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.snapshots import (
    latest_version,
    read_snapshot,
    write_snapshot,
)
from mapreduce_llm_spark.session import get_spark
from mapreduce_llm_spark.sinks import write_zordered_parquet

SF_DIR = "/root/testdata/sf0.001"


def build_rollup(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


def dq_gate(df) -> None:
    bad = df.agg(
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("null_keys"),
        (F.count("*") - F.countDistinct("c_custkey")).alias("dup_keys"),
        F.count(F.when(F.col("revenue") < 0, 1)).alias("neg_revenue"),
    ).collect()[0]
    failures = {k: v for k, v in bad.asDict().items() if v}
    if failures:
        raise SystemExit(f"DQ gate failed, snapshot NOT published: {failures}")
    print("DQ gate passed:", dict(bad.asDict()))


def main() -> None:
    spark = get_spark(app_name="publish-snapshot-example")
    table = os.path.join(tempfile.mkdtemp(prefix="snapshot_ex_"), "cust_revenue")

    for run in (1, 2):  # two loads → two published versions
        rollup = build_rollup(spark)
        if run == 2:
            # simulated reload: only above-average purchasers this time
            rollup = rollup.filter(F.col("n_orders") >= 11)
        dq_gate(rollup)
        staged = os.path.join(tempfile.mkdtemp(prefix="stage_"), "zordered")
        write_zordered_parquet(rollup, staged, "c_custkey", "revenue", n_files=4)
        v = write_snapshot(spark.read.parquet(staged), table)
        print(f"published v={v}: {read_snapshot(spark, table).count()} rows")

    assert latest_version(table) == 2
    prev, cur = (read_snapshot(spark, table, version=i).count() for i in (1, 2))
    print(f"time travel: v1={prev} rows, v2={cur} rows (latest)")


if __name__ == "__main__":
    main()
