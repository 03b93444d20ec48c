"""End-to-end training-data preparation — the full corpus pipeline the
engine's operator families exist for, composed in execution order:

  1. curate    quality/language filter → exact dedup → token chunking
               (operators/curation.py)
  2. decontam  drop chunks whose distinct-bigram overlap with a held-out
               eval set exceeds 0.8 (the q_decontaminate logic, applied
               as a pipeline stage with the eval n-grams broadcast)
  3. split     deterministic md5 train/test assignment — stable across
               runs, engines, and cluster sizes
  4. pack      greedy first-fit of chunks into fixed token-budget
               training sequences (operators/packing.py)
  5. sink      Hive-partitioned parquet by split (sinks.py) — dynamic
               overwrite keeps re-runs idempotent

Everything runs offline on the sf0.001 fixtures in a few seconds.

Run:  python examples/prepare_training_data.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.curation import curate_corpus
from mapreduce_llm_spark.operators.packing import pack_sequences
from mapreduce_llm_spark.session import get_spark
from mapreduce_llm_spark.sinks import write_partitioned_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SEQ_BUDGET = 256


def main() -> None:
    spark = get_spark(app_name="prepare-training-data")
    docs = load_table(spark, SF_DIR, "documents")
    n_raw = docs.count()

    # 1. curate: quality + language gate, dedup, token-bounded chunks
    chunks = curate_corpus(docs, min_quality=0.2, min_words=5)

    # 2. decontaminate: eval set = every 50th doc; broadcast its bigrams
    words = F.split("chunk_text", " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.expr(
            "transform(sequence(1, size(split(chunk_text, ' ')) - 1),"
            " i -> concat(element_at(split(chunk_text, ' '), i), ' ',"
            "            element_at(split(chunk_text, ' '), i + 1)))"
        ),
    ).otherwise(F.array())
    exploded = chunks.select(
        "doc_id", "chunk_id", F.explode(F.array_distinct(bigrams)).alias("bg")
    )
    eval_bgs = (
        exploded.filter(F.col("doc_id") % 50 == 0).select("bg").distinct()
    )
    contam = (
        exploded.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_bgs.withColumn("hit", F.lit(1))), "bg", "left")
        .groupBy("doc_id", "chunk_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) / F.count("*")).alias("contam"))
    )
    clean = (
        chunks.filter(F.col("doc_id") % 50 != 0)
        .join(contam, ["doc_id", "chunk_id"], "left")
        .filter(F.coalesce("contam", F.lit(0.0)) <= 0.8)
        .drop("contam")
    )

    # 3. deterministic split (content-hash, not RNG)
    key = F.concat_ws("#", F.col("doc_id").cast("string"), F.col("chunk_id"))
    clean = clean.withColumn(
        "split",
        F.when(
            F.substring(F.md5(key), 1, 1).isin("0", "1"), F.lit("test")
        ).otherwise("train"),
    )

    # 4. pack chunks into training sequences per split
    packed = []
    for part in ("train", "test"):
        side = clean.filter(F.col("split") == part).withColumn(
            "uid", key
        )
        p = pack_sequences(
            side, budget=SEQ_BUDGET, text_col="chunk_text", id_col="uid"
        ).withColumn("split", F.lit(part))
        packed.append(p)
    sequences = packed[0].unionByName(packed[1])

    # 5. partitioned sink
    out = os.path.join(tempfile.mkdtemp(prefix="train_data_"), "sequences")
    write_partitioned_parquet(sequences, out, ["split"])

    back = spark.read.parquet(out)
    stats = (
        back.groupBy("split")
        .agg(
            F.countDistinct("seq_id").alias("n_sequences"),
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split")
        .collect()
    )
    print(f"raw docs: {n_raw}")
    for r in stats:
        print(
            f"{r['split']}: {r['n_sequences']} sequences / "
            f"{r['n_chunks']} chunks / {r['total_tokens']} tokens"
        )
    assert {r["split"] for r in stats} == {"train", "test"}
    assert all(r["n_chunks"] > 0 for r in stats)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
