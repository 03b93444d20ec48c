"""UDF / UDAF / UDTF surface (SURVEY.md §2C "UDF / UDAF / UDTF").

The reference's extensibility point is its LLM map function; these
queries prove the engine's general user-function plumbing with
deterministic logic so the DuckDB oracle can recompute it in SQL.
All Python paths are Arrow-vectorized pandas UDFs — never
row-at-a-time — so each task processes whole record batches.

(UDFs are constructed inside the query functions, not at module scope:
``pandas_udf`` resolves its return type against the active session, and
the registry imports this module before any session exists.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_udf_scalar",
    oracle="""
    SELECT
        c_custkey,
        round(c_acctbal, 4) AS bal,
        CAST(CASE WHEN c_acctbal >= 5000 THEN 0.05
                  WHEN c_acctbal >= 0    THEN 0.02
                  ELSE 0.0 END AS DOUBLE) AS rate,
        round(c_acctbal * (CASE WHEN c_acctbal >= 5000 THEN 0.05
                                WHEN c_acctbal >= 0    THEN 0.02
                                ELSE 0.0 END), 4) + 0.0 AS fee
    FROM customer
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (Series→Series); the oracle
    recomputes the same tier logic in SQL."""

    @F.pandas_udf("double")
    def tier_rate(balance: pd.Series) -> pd.Series:
        return (
            (balance >= 5000).astype("float64") * 0.05
            + ((balance >= 0) & (balance < 5000)).astype("float64") * 0.02
        )

    c = load_table(spark, sf_dir, "customer")
    rate = tier_rate(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.round("c_acctbal", 4).alias("bal"),
        rate.alias("rate"),
        # + 0.0 canonicalizes IEEE -0.0 (bal<0 × rate 0.0) to +0.0,
        # matching the oracle expression.
        (F.round(F.col("c_acctbal") * rate, 4) + 0.0).alias("fee"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT
        l_returnflag,
        round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price,
        count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF inside groupBy().agg() — Spark
    splits it map-side per Arrow batch, so it scales like a built-in."""

    @F.pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else float("nan")

    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a pandas UDAF too.
    @F.pandas_udf("long")
    def n_rows_udaf(qty: pd.Series) -> int:
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("w_avg_price"),
            n_rows_udaf(F.col("l_quantity")).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_udtf_flatmap",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def q_udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape (1 row → N rows): word frequency via
    explode(split()) — the typed analogue of the reference's
    semantic_extract (one chunk → many lines, SURVEY §2B). Stays fully
    JVM-side; partial aggregation collapses per-partition counts before
    the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(50)
    )


@query(
    "q_udtf_native",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INTEGER)       AS sent_idx,
           CAST(length(s) AS INTEGER) AS sent_len
    FROM (
        SELECT doc_id,
               unnest(string_split(text, '. '))              AS s,
               generate_subscripts(string_split(text, '. '), 1) AS pos
        FROM documents
    )
    WHERE s <> ''
    """,
)
def q_udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4) under a LATERAL join: one document
    row → one row per sentence with positional metadata. Arrow-batched
    (useArrow) so the Python crossing moves columnar batches; the
    oracle recomputes the split with unnest WITH ORDINALITY."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sent_len int", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". "), 1):
                if s:
                    yield i, len(s)

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sent_len
        FROM documents d, LATERAL sentence_split(d.text) s
        """
    )
