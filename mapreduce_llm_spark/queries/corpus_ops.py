"""Training-corpus preparation operators: BM25 relevance ranking,
deterministic shuffle-sharding, length-bucketed batching profile, and
ANN recall evaluation.

These are the steps between "curated corpus" and "training run": rank
documents against a probe query (BM25 — the retrieval scorer TF-IDF
feeds), permute the corpus reproducibly and cut it into shards
(hash-ordered shuffle — no RNG, so re-runs and resumes see the same
order), profile padding efficiency under length bucketing (the
batching-cost model for sequence packing), and measure what the
approximate similarity index actually recalls against the exact
baseline (the eval loop every ANN deployment needs).

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT pins where DuckDB
widens to HUGEINT, deterministic tie-breaks on every window/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.queries.future_oracles import GRADUATED_ORACLES
from mapreduce_llm_spark.registry import query

# BM25 free parameters (Robertson et al. defaults).
_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("spark", "query", "join")


@query(
    "q_text_bm25",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(trim(lower(text)), ' '),
                           x -> x <> '') AS ws
        FROM documents
    ), dl AS (
        SELECT doc_id, len(ws) AS doclen FROM toks
    ), words AS (
        SELECT doc_id, unnest(ws) AS word FROM toks
    ), tf AS (
        SELECT doc_id, word, count(*) AS tf
        FROM words
        WHERE word IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
        GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), tot AS (
        SELECT count(*) AS n_docs, avg(doclen) AS avgdl FROM dl
    )
    SELECT tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * ({_K1} + 1)
                     / (tf + {_K1} * (1 - {_B} + {_B} * doclen / avgdl))),
                 4) AS bm25
    FROM tf
    JOIN dl USING (doc_id)
    JOIN dfreq USING (word)
    CROSS JOIN tot
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 20
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus against a fixed probe query — the
    length-normalized, saturating upgrade of q_text_tfidf's raw scores
    (idf: Robertson's ln(1+(N-df+.5)/(df+.5)); tf saturation k1=1.2;
    length norm b=0.75).

    Shape: doc lengths come from size(split(...)) with no explode (one
    narrow projection), term frequencies from an explode filtered to
    the 3 probe terms BEFORE the aggregation (the filter kills ~all
    rows pre-shuffle), document frequencies re-aggregate that tiny tf
    table and join back broadcast, and N/avgdl is a 1-row broadcast
    scalar (allowlisted cross). Final ranking is TakeOrdered top-20
    with doc_id tie-break — no global sort. At 100 TB the only
    full-data costs are the scan and the (doc,term)-key shuffle of
    probe-term hits."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.trim(F.lower("text")), " "), lambda w: w != "")
    toks = d.select("doc_id", ws.alias("ws"))
    dl = toks.select("doc_id", F.size("ws").alias("doclen"))
    tf = (
        toks.select("doc_id", F.explode("ws").alias("word"))
        .where(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    tot = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    term_score = (
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("doclen") / F.col("avgdl")))
    )
    return (
        tf.join(dl, "doc_id")
        # per-term document frequencies are a vocab leg - AQE-decided
        .join(dfreq, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(term_score), 4).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "q_shuffle_shards",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix1'), doc_id
           ) AS BIGINT) AS pos,
           CAST(ntile(16) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix1'), doc_id
           ) AS INT) AS shard
    FROM documents
    ORDER BY pos
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: permute the corpus by
    md5(doc_id || salt) and cut the permutation into 16 equal shards.
    No RNG anywhere — re-runs, resumes, and both engines see the
    identical order, which is what makes multi-epoch training
    reproducible (new salt per epoch = new permutation).

    The oracle states the single-task form (row_number + ntile over one
    global ORDER BY); the Spark side is the distributed rewrite —
    range-partition on the hash via global_row_number
    (operators/ranking.py) plus the exact ntile arithmetic from the
    broadcast total — so the hash match proves the permutation is
    identical with no single-partition window anywhere."""
    from mapreduce_llm_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = d.withColumn(
        "h", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix1")))
    )
    total = F.broadcast(d.agg(F.count(F.lit(1)).alias("_total")))
    ranked = global_row_number(
        hashed, [F.col("h").asc(), F.col("doc_id").asc()], alias="pos"
    ).crossJoin(total)
    return (
        ranked.select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            ntile_from_rank(F.col("pos"), F.col("_total"), 16).alias("shard"),
        )
        .orderBy("pos")
    )


@query(
    "q_length_buckets",
    oracle="""
    WITH dl AS (
        SELECT doc_id,
               len(list_filter(string_split(trim(lower(text)), ' '),
                               x -> x <> '')) AS n_tokens
        FROM documents
    )
    SELECT CAST(least(n_tokens // 64, 7) AS INT)      AS bucket,
           CAST(count(*) AS BIGINT)                   AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)              AS sum_tokens,
           CAST(max(n_tokens) AS BIGINT)              AS max_len,
           round(sum(n_tokens) * 1.0
                 / (count(*) * max(n_tokens)), 4)     AS pad_efficiency
    FROM dl
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching profile: bucket documents by token
    count (64-token strides, capped at bucket 7) and measure padding
    efficiency — the fraction of a pad-to-bucket-max batch that is
    real tokens. This is the cost model that motivates
    q_pack_sequences: efficiency below ~0.9 in a bucket is the padding
    waste packing recovers.

    Shape: one narrow projection computes per-doc token counts with no
    explode, then one map-side-combinable groupBy on the 8-value
    bucket key — a single aggregation shuffle of 8 rows at any
    scale."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.trim(F.lower("text")), " "), lambda w: w != "")
    ).cast("long")
    dl = d.select(n_tokens.alias("n_tokens"))
    return (
        dl.groupBy(
            F.least(F.floor(F.col("n_tokens") / 64), F.lit(7))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.max("n_tokens").alias("max_len"),
            F.round(
                F.sum("n_tokens") / (F.count(F.lit(1)) * F.max("n_tokens")), 4
            ).alias("pad_efficiency"),
        )
        .orderBy("bucket")
    )


@query("q_sim_recall", oracle=GRADUATED_ORACLES["q_sim_recall"])
def q_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the sign-LSH multiprobe ANN path against the exact
    brute-force top-10 — the evaluation loop an ANN index ships with
    (oracle-backed since round 8: the seeded hyperplanes round-trip as
    repr() double literals into the DuckDB twin, GRADUATED_ORACLES,
    which recomputes the sign-LSH bucket + 1-bit multiprobe in SQL;
    the recall ORDERING vs probe width is pinned in
    test_lsh_multiprobe_recall_dominates_single_probe).

    Shape: both legs are TakeOrdered top-10 scans (the ANN leg scans
    only the probed buckets); the intersection is a broadcast semi-join
    of two 10-row sets and the output is one row — nothing scales with
    corpus size except the two scans."""
    from mapreduce_llm_spark.operators.similarity import ann_topk_lsh, cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = list(
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    exact = cosine_topk(e, qvec, k=10)
    ann = ann_topk_lsh(e, qvec, k=10, n_planes=4, seed=42, n_probe_bits=1)
    hits = exact.join(
        F.broadcast(ann.select("vec_id")), "vec_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    k_df = exact.agg(F.count(F.lit(1)).alias("k"))
    return (
        hits.crossJoin(F.broadcast(k_df))
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_hits").cast("int").alias("n_hits"),
            F.round(F.col("n_hits") / F.col("k"), 4).alias("recall"),
        )
    )
