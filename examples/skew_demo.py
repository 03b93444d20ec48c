"""Demonstrate the salted join on genuinely skewed data.

Generates a fact table where ONE key holds half of all rows (the
pathological hot key a zipfian workload produces), joins it against a
dimension too big to broadcast, and runs the same join plain vs
salted, verifying identical results and printing the per-partition
row distribution of the shuffle — the thing salting exists to fix.

Run:  python examples/skew_demo.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_llm_spark.operators.skew import row_salt_col, salted_join
from mapreduce_llm_spark.session import get_spark

N_FACT = 2_000_000
N_KEYS = 10_000
HOT_KEY = 7


def main() -> None:
    spark = get_spark(app_name="example-skew-demo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # half the fact rows hit HOT_KEY; the rest spread uniformly
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise(F.col("id") % N_KEYS)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("attr_"), F.col("id")).alias("attr")
    )

    # the skew, made visible: rows per shuffle partition for the plain key
    # vs key+salt
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    plain_dist = (
        fact.groupBy(F.pmod(F.hash("k"), n_parts).alias("p")).count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).first()
    )
    salted = fact.withColumn("_salt", row_salt_col(fact, ["k"], 16))
    salted_dist = (
        salted.groupBy(F.pmod(F.hash("k", "_salt"), n_parts).alias("p")).count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).first()
    )
    print(f"plain shuffle: max/avg partition rows = {plain_dist['mx']}/{plain_dist['avg']:.0f} "
          f"(skew {plain_dist['mx'] / plain_dist['avg']:.1f}x)")
    print(f"salted shuffle: max/avg partition rows = {salted_dist['mx']}/{salted_dist['avg']:.0f} "
          f"(skew {salted_dist['mx'] / salted_dist['avg']:.1f}x)")

    def run(df):
        t0 = time.perf_counter()
        out = df.groupBy().agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")).first()
        return out, time.perf_counter() - t0

    plain_res, plain_t = run(fact.join(dim, "k"))
    salted_res, salted_t = run(salted_join(fact, dim, on=["k"], n_salts=16))
    assert plain_res == salted_res, (plain_res, salted_res)
    print(f"plain join:  {plain_t:.2f}s  -> {plain_res['n']} rows, sum={plain_res['s']}")
    print(f"salted join: {salted_t:.2f}s -> identical result")
    print("OK: salted join row-identical; hot-key shuffle spread "
          f"{plain_dist['mx'] / salted_dist['mx']:.1f}x thinner")


if __name__ == "__main__":
    main()
