"""HLL sketch correctness: the union-of-sketches estimate must track
the exact distinct count (the q_agg_sketch_union scale-path claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import load_table
from tests.conftest import SF_DIR

registry.load_all()


def test_sketch_union_tracks_exact_distinct(spark):
    est = {
        r["r_name"]: r["est_customers"]
        for r in registry.QUERIES["q_agg_sketch_union"](spark, SF_DIR).collect()
    }
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    reg = load_table(spark, SF_DIR, "region")
    exact = {
        r["r_name"]: r["n"]
        for r in (
            c.join(n, c.c_nationkey == n.n_nationkey)
            .join(reg, F.col("n_regionkey") == reg.r_regionkey)
            .groupBy("r_name")
            .agg(F.countDistinct("c_custkey").alias("n"))
            .collect()
        )
    }
    assert set(est) == set(exact)
    for name, e in exact.items():
        assert abs(est[name] - e) / e <= 0.05, (name, est[name], e)
