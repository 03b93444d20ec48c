"""Extended relational surface: pivot/unpivot, subqueries, CTEs,
HAVING, lateral array expansion, sampling.

Rounds out §2C so a SQL user's everyday constructs all have declared,
oracle-checked operators. Catalyst rewrites subqueries to joins
(broadcast where the subquery result is small) — nothing here needs
custom execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES


@query(
    "q_pivot",
    oracle="""
    SELECT
        o_orderpriority,
        round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 4) AS f_total,
        round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 4) AS o_total,
        round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 4) AS p_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns (Spark .pivot with an explicit
    value list — never let it scan for distinct values at scale)."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 4))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("f_total"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("o_total"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("p_total"),
    ).orderBy("o_orderpriority")


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, metric, round(val, 4) AS val
    FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retail', p_retailprice FROM part
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — wide→long without a join or shuffle."""
    p = load_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice) AS (metric, v)",
    ).select("p_partkey", "metric", F.round("v", 4).alias("val"))


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS price,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS price_dev
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery — Catalyst evaluates it once and broadcasts the
    scalar into the predicate/projection."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS price,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS price_dev
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) AND l_quantity > 45
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join under the hood."""
    for t in ("lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ) AND l_quantity > 45
        """
    )


@query(
    "q_cte_reuse",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment, round(avg(c_acctbal), 4) AS seg_avg
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, s.seg_avg,
           round(c.c_acctbal - s.seg_avg, 4) AS bal_dev
    FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
    WHERE c.c_acctbal > s.seg_avg
    """,
)
def q_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE defined once, joined back against its source — the
    aggregate side is tiny so it broadcasts."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH seg AS (
            SELECT c_mktsegment, round(avg(c_acctbal), 4) AS seg_avg
            FROM customer GROUP BY c_mktsegment
        )
        SELECT c.c_custkey, c.c_mktsegment, s.seg_avg,
               round(c.c_acctbal - s.seg_avg, 4) AS bal_dev
        FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
        WHERE c.c_acctbal > s.seg_avg
        """
    )


@query(
    "q_having",
    oracle="""
    SELECT l_partkey, count(*) AS n_lines, round(sum(l_quantity), 4) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 35 AND sum(l_quantity) > 800
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING) — a filter above the agg,
    pushed nowhere by design."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter((F.col("n_lines") >= 35) & (F.col("total_qty") > 800))
    )


@query(
    "q_lateral_posexplode",
    oracle="""
    SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos,
           round(CAST(val AS DOUBLE), 6) AS val
    FROM (
        SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM (SELECT * FROM embeddings WHERE vec_id < 20)
    )
    """,
)
def q_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional array expansion (posexplode ≡ unnest WITH ORDINALITY)
    — vector→long format for per-dimension analytics."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))


@query("q_sample_stratified")
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample (sampleBy): per-stratum Bernoulli fractions —
    the class-balancing sampler a training pipeline uses to downweight
    an overrepresented language/source. Seeded-deterministic within
    Spark but sampler RNGs differ across engines -> rows-only (the
    deterministic cross-engine alternative is the md5 hash split,
    q_split_train_test)."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.2, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}
    return (
        d.sampleBy("lang", fractions=fractions, seed=7)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query("q_balanced_sample", oracle=GRADUATED_ORACLES["q_balanced_sample"])
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced downsample: exactly k=20 examples per
    label, chosen by md5-hash order — the cross-engine-reproducible
    alternative to the seeded samplers above (q_sample_stratified's
    Bernoulli draw is engine-RNG-bound; a hash order is a pure
    function of the data). The hash acts as a fixed random permutation
    within each class, so the subsample is unbiased w.r.t. any
    attribute uncorrelated with md5 — and identical on every engine,
    cluster size, and run: the property a training-set freeze needs.
    One shuffle on label; row_number keeps O(1) state per class.
    Oracle-backed since round 6 (GRADUATED_ORACLES) — md5 strings
    order identically in both engines."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.lit("bs:"), F.col("vec_id").cast("string"))), "vec_id"
    )
    return (
        e.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 20)
        .orderBy("label", "rk")
    )


@query("q_sample")
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + agg — deterministic within Spark
    (fixed seed) but sampler RNGs differ across engines → rows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS price
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join on the correlation key, so it runs as one shuffle
    instead of a per-row loop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS price
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_merge_upsert",
    oracle="""
    SELECT c_custkey, c_name, round(acctbal, 4) AS acctbal
    FROM (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS acctbal
        FROM customer
        UNION ALL
        SELECT c_custkey + 1000000, 'NEW ' || c_name, 0.0
        FROM customer WHERE c_custkey % 97 = 0
    )
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) composed as update-batch ∪ anti-joined base —
    operators/merge.py. The update batch (10% modified + a few inserted
    keys) broadcasts, so the snapshot side never shuffles; the oracle
    states the same merge as CASE + UNION ALL over the source table.
    """
    from mapreduce_llm_spark.operators.merge import merge_upsert

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").alias("acctbal")
    )
    changed = c.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "acctbal", F.col("acctbal") + 100.0
    )
    inserted = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("acctbal"),
    )
    updates = changed.unionByName(inserted)
    merged = merge_upsert(c, updates, keys=["c_custkey"])
    return merged.select("c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal"))
