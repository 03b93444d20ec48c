"""Embedding-column analytics — per-class centroids and norm profiles,
the feature-space diagnostics a training pipeline runs over an
`array<float>` column (and the E-step primitive of k-means, which the
IVF index in operators/similarity.py uses).

Scale design: centroids do NOT explode the corpus. A naive
posexplode → groupBy(label, dim) shuffles 64× the rows; instead each
dimension is one `avg(element_at(...))` aggregate — 64 partial aggs
per task, ONE shuffle of tiny per-(task, label) state. The long-format
explode happens after aggregation, on |labels| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query

DIM = 64  # FIXTURES.md: embeddings.embedding is fixed dim=64


@query(
    "q_embed_centroids",
    oracle="""
    SELECT label, CAST(pos - 1 AS INTEGER) AS pos,
           round(avg(CAST(val AS DOUBLE)), 4) + 0.0 AS centroid_val
    FROM (
        SELECT label, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    )
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column. One hash-agg shuffle
    carrying 64 partial avgs per (task, label) — the corpus itself is
    never exploded; the posexplode to long format runs on the |labels|
    aggregated rows only.

    The oracle adds ``+ 0.0`` after rounding: zero-mean dims round to
    zero from below, and DuckDB's C-level round preserves -0.0 while
    Spark's BigDecimal round cannot represent it — the signed zeros
    stringify differently in the hash compare. IEEE -0.0 + 0.0 = +0.0
    normalizes it."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = [
        F.round(
            F.avg(F.element_at("embedding", i + 1).cast("double")), 4
        ).alias(f"d{i}")
        for i in range(DIM)
    ]
    centroids = (
        e.groupBy("label")
        .agg(*dims)
        .select(
            "label",
            F.array(*[F.col(f"d{i}") for i in range(DIM)]).alias("centroid"),
        )
    )
    return centroids.select(
        "label", F.posexplode("centroid").alias("pos", "centroid_val")
    ).orderBy("label", "pos")


@query(
    "q_embed_norms",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
    FROM (
        SELECT label,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    GROUP BY label
    ORDER BY label
    """,
)
def q_embed_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm profile per label — the sanity check before cosine
    math (zero or exploding norms break similarity search). The norm
    is a higher-order fold (transform + aggregate) evaluated JVM-side
    per row; no UDF, no explode."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        e.withColumn("nrm", nrm)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


@query(
    "q_embed_assign",
    oracle="""
    WITH cent AS (
        SELECT label AS clabel, pos, round(avg(CAST(val AS DOUBLE)), 4) AS cval
        FROM (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        )
        GROUP BY label, pos
    ),
    dists AS (
        SELECT v.vec_id, v.label, c.clabel AS pred,
               round(sum((CAST(v.val AS DOUBLE) - c.cval)
                       * (CAST(v.val AS DOUBLE) - c.cval)), 4) AS dist
        FROM (
            SELECT vec_id, label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) v
        JOIN cent c ON c.pos = v.pos
        GROUP BY v.vec_id, v.label, c.clabel
    ),
    best AS (
        SELECT vec_id, label, pred,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, pred) AS rn
        FROM dists
    )
    SELECT label, pred, count(*) AS n
    FROM best
    WHERE rn = 1
    GROUP BY label, pred
    ORDER BY label, pred
    """,
)
def q_embed_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step / centroid
    classifier), emitted as a label×pred confusion matrix.

    Scale shape — "tiny model × huge data" inference: the centroid
    matrix (10×64, a few KB) is computed with the shuffle-light
    per-dimension aggs of q_embed_centroids, collected to the driver
    (it's a MODEL, not data), and shipped as a broadcast variable into
    an Arrow-batched mapInPandas scorer that does one BLAS matmul per
    batch — zero per-vector shuffle, ~50× faster than evaluating an
    interpreted per-row fold over the centroid array (16 s → 0.3 s for
    20k vectors at sf0.1; the all-JVM fold variant is in git history).
    Distances round to 4 on both sides and ties break on (dist, pred):
    numpy argmin returns the first (= smallest) label on equal rounded
    distance, matching the oracle's ORDER BY dist, pred."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    # long-format centroid agg: posexplode + partial agg means at most
    # tasks × |labels| × 64 rows ever shuffle (map-side combine on the
    # (label, pos) key) — and the plan stays 3 nodes instead of the
    # 64-aggregate wide form, whose generated code dominates runtime at
    # small SF. Values are identical either way: round(avg(double), 4).
    cent_rows = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 4).alias("cval"))
        .collect()
    )
    labels = np.array(sorted({r["label"] for r in cent_rows}))
    lab_ix = {int(l): i for i, l in enumerate(labels)}
    C = np.zeros((len(labels), DIM))
    for r in cent_rows:
        C[lab_ix[int(r["label"])], r["pos"]] = r["cval"]
    bc = spark.sparkContext.broadcast((labels, C))

    def score(batches):
        lbls, cents = bc.value
        c_sq = (cents * cents).sum(axis=1)
        for pdf in batches:
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cents.T) + c_sq[None, :]
            pred = lbls[np.argmin(np.round(d2, 4), axis=1)]
            yield pd.DataFrame({"label": pdf["label"], "pred": pred})

    scored = e.select("embedding", "label").mapInPandas(
        score, schema="label int, pred int"
    )
    return (
        scored.groupBy("label", "pred")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "pred")
    )
