"""End-to-end training-corpus curation: the operators composed the way
a data pipeline actually runs them.

quality-score → threshold filter → language filter → exact dedup →
token count → token-bounded chunking. Each stage is one of the
engine's tested operators; this module only sequences them, which is
the point — a user of the reference switching to this engine gets the
whole curation flow as one call.

Scale shape: the score/filter stages are JVM expressions fused into
the scan (no shuffle); dedup shuffles on the 64-byte digest of the
normalized text (not the document body) — one digest shuffle for the
survivor set plus the survivor semi-join back to the scored rows; the
chunker is an embarrassingly parallel mapInPandas with zero shuffle,
and the per-document metadata (quality, lang) rides THROUGH the
chunker as carry columns instead of a post-chunk join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_llm_spark.operators.chunker import (
    DEFAULT_MAX_TOKENS_PER_CHUNK,
    chunk_documents,
)
from mapreduce_llm_spark.operators.dedup import normalize_text
from mapreduce_llm_spark.operators.textstats import (
    detect_lang_col,
    quality_score_col,
    word_count_col,
)


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    min_words: int = 5,
    languages: list[str] | None = None,
    max_tokens_per_chunk: int = DEFAULT_MAX_TOKENS_PER_CHUNK,
) -> DataFrame:
    """Filter, dedup, and chunk a document corpus.

    Returns chunk-level rows ``(doc_id, chunk_id, chunk_text, n_tokens,
    quality, lang)`` for every surviving document. Survivor choice on
    duplicate content is deterministic (min id).
    """
    text = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        text,
        quality_score_col(text).alias("quality"),
        word_count_col(text).alias("n_words"),
        detect_lang_col(text).alias("lang"),
        F.sha2(normalize_text(text), 256).alias("_digest"),
    )
    kept = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("n_words") >= min_words)
    )
    if languages:
        kept = kept.filter(F.col("lang").isin(languages))

    # one survivor per distinct normalized content: shuffle the digest,
    # not the body
    survivors = kept.groupBy("_digest").agg(F.min(id_col).alias(id_col))
    deduped = kept.join(survivors, [id_col, "_digest"]).drop("_digest")

    return chunk_documents(
        deduped,
        text_col=text_col,
        id_col=id_col,
        max_tokens=max_tokens_per_chunk,
        carry_cols=["quality", "lang"],
    )
