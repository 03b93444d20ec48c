"""Multimodal FILE ingest as declared surface: real format bytes on
disk → binaryFile source → magic-byte sniff → pure-Python codec
decode → per-format corpus profile.

Closes the loop the in-DataFrame multimodal queries (q_mm_features /
q_mm_audio, which synthesize content into binary COLUMNS) left open:
media usually arrives as FILES. The fixture corpus is published once
per process (deterministic bytes from the existing PNG/WAV encoders,
so the decode stage exercises genuine format structure), then the
query runs the exact topology a 100 TB media lake uses — glob-pruned
directory listing, one row per file, Arrow-batched decode on
executors, aggregation to a per-format profile.

Rows-only: DuckDB cannot inflate PNG scanlines or walk RIFF chunks —
the decode semantics are pinned instead by operators/codecs.py's
round-trip tests and the deterministic totals test
(tests/test_mm_ingest.py).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import read_binary_files
from mapreduce_llm_spark.registry import query

# One published fixture corpus per process: 12 PNG + 12 WAV files of
# deterministic content (seeded per index), reused by every invocation
# (the _publish_stream_source memo pattern — no /tmp copy per call).
_MEDIA_DIR: list[str] = []

N_EACH = 12


def _publish_media_dir() -> str:
    if _MEDIA_DIR and os.path.isdir(_MEDIA_DIR[0]):
        return _MEDIA_DIR[0]
    from mapreduce_llm_spark.operators.codecs import encode_png, encode_wav

    d = tempfile.mkdtemp(prefix="mrs_media_src_")
    for i in range(N_EACH):
        rng = np.random.RandomState(1000 + i)
        w, h = 16 + i, 16 + (i * 3) % 16
        pixels = rng.randint(0, 256, (h, w), dtype=np.uint8)
        with open(os.path.join(d, f"img_{i:03d}.png"), "wb") as fh:
            fh.write(encode_png(pixels, channels=1))
        samples = rng.randint(-32768, 32767, 512 + 64 * i).astype(np.int16)
        with open(os.path.join(d, f"clip_{i:03d}.wav"), "wb") as fh:
            fh.write(encode_wav(samples, sample_rate=8000, n_channels=1))
    _MEDIA_DIR.append(d)
    return d


@query("q_mm_ingest")
def q_mm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest a directory of real media FILES and profile it per
    format: binaryFile source (one row per file; the ``*.png``/
    ``*.wav`` mix is read in one listing), format sniffed from magic
    bytes (PNG signature / RIFF fourcc), content decoded by the
    pure-Python codecs inside ONE Arrow-batched mapInPandas, then a
    per-format aggregate: file count, byte volume, decoded value
    count, and the mean decoded value (pixels in [0,255], samples in
    int16 — deterministic because the fixture bytes are seeded).
    At scale only the tiny (format, count, sums) partials shuffle;
    decode cost parallelizes per file."""
    src = _publish_media_dir()
    files = read_binary_files(spark, src).select("path", "length", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_llm_spark.operators.codecs import decode_png, decode_wav

        for pdf in batches:
            fmts, n_vals, totals = [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    vals = decode_png(b)[3].reshape(-1).astype(np.int64)
                    fmts.append("png")
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    vals = decode_wav(b)[2].astype(np.int64)
                    fmts.append("wav")
                else:
                    vals = np.zeros(0, dtype=np.int64)
                    fmts.append("unknown")
                n_vals.append(int(vals.size))
                totals.append(int(vals.sum()))
            yield pd.DataFrame(
                {
                    "fmt": fmts,
                    "n_bytes": pdf["length"].astype("int64"),
                    "n_values": n_vals,
                    "total_value": totals,
                }
            )

    decoded = files.mapInPandas(
        decode, schema="fmt string, n_bytes long, n_values long, total_value long"
    )
    return (
        decoded.groupBy("fmt")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_values").alias("n_values"),
            F.round(F.sum("total_value") / F.sum("n_values"), 4).alias(
                "mean_value"
            ),
        )
        .orderBy("fmt")
    )
