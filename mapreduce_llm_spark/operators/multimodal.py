"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star addition, BASELINE.json).

Design: media lives in a ``content: binary`` column with a metadata
struct (media_type, width/height or sample_rate/duration, codec).
Everything Spark-side is real and tested — schemas, partition-friendly
batch processing through ``mapInPandas``, Arrow binary transfer, UDF
signatures — and the codec boundary is explicit:

- PNG, WAV, and baseline JPEG decode for real, pure-Python
  (operators/codecs.py: zlib inflate + scanline unfilter, RIFF/PCM
  parse; operators/jpeg.py: numpy DCT + canonical Huffman) — the mm
  queries run on genuine format bytes end-to-end;
- video containers (MP4) raise ``NotImplementedError`` — inter-frame
  codecs genuinely need external libraries not in this container;
- the deterministic ``RAW1`` fake format (header + payload) remains as
  the minimal-overhead envelope for synthetic pipeline tests.

At 100 TB: binary columns ride parquet byte arrays; mapInPandas
processes them batch-at-a-time per partition with no shuffle, so
feature extraction scales embarrassingly; only the (tiny) feature
output shuffles into downstream joins/ANN.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, codec string, "
    "width int, height int, sample_rate int, content binary"
)

_RAW1_MAGIC = b"RAW1"


def encode_raw1(width: int, height: int, payload: bytes) -> bytes:
    """The deterministic fake media format: RAW1 | w | h | payload."""
    return _RAW1_MAGIC + struct.pack("<II", width, height) + payload


def decode_raw1(content: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, uint8 payload array); raises on bad magic."""
    if content[:4] != _RAW1_MAGIC:
        raise ValueError("not a RAW1 payload")
    w, h = struct.unpack("<II", content[4:12])
    return w, h, np.frombuffer(content[12:], dtype=np.uint8)


def decode_media(content: bytes, codec: str) -> np.ndarray:
    """Codec boundary → flat uint8 intensity array (what the
    histogram/feature stages consume).

    Real formats decoded pure-Python: PNG (zlib inflate + scanline
    unfilter) and WAV (RIFF/PCM) in operators/codecs.py, baseline
    JPEG (numpy DCT + canonical Huffman) in operators/jpeg.py, plus
    the deterministic RAW1 test format. WAV samples are mapped from
    int16 to the uint8 intensity domain here (the audio-native path,
    ``audio_features``, decodes at full int16 fidelity instead).
    Video containers (MP4) stay behind ``NotImplementedError`` —
    inter-frame codecs genuinely need ffmpeg; swap this function's
    body for PIL/ffmpeg in a full deployment for throughput.
    """
    if codec == "raw1":
        return decode_raw1(content)[2]
    if codec == "png":
        from mapreduce_llm_spark.operators.codecs import decode_png

        return decode_png(content)[3].reshape(-1)
    if codec == "jpeg":
        from mapreduce_llm_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)[3].reshape(-1)
    if codec == "wav":
        from mapreduce_llm_spark.operators.codecs import decode_wav

        samples = decode_wav(content)[2]
        return ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: decoding needs external libraries not present "
        "in this environment (ffmpeg)"
    )


def synthesize_media(
    docs: DataFrame, id_col: str = "doc_id", codec: str = "raw1"
) -> DataFrame:
    """Derive a deterministic media corpus from any id column: media i
    is a (16+i%16)×(16+(i//16)%16) grayscale 'image' whose pixel bytes
    are a fixed function of the id. ``codec='raw1'`` wraps the pixels
    in the raw test envelope; ``codec='png'`` writes REAL PNG files
    (stdlib encoder, operators/codecs.py); ``codec='jpeg'`` writes
    REAL baseline JFIF (operators/jpeg.py), so downstream decode
    exercises a full DCT/entropy stack on genuine format bytes."""
    if codec not in ("raw1", "png", "jpeg"):
        raise ValueError(
            f"synthesize_media codec must be raw1|png|jpeg, got {codec!r}"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_llm_spark.operators.codecs import encode_png
        from mapreduce_llm_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "media_type", "codec", "width", "height",
                "sample_rate", "content",
            )}
            for i in pdf[id_col]:
                i = int(i)
                w, h = 16 + i % 16, 16 + (i // 16) % 16
                rng = np.random.RandomState(i % (2**31))
                payload = rng.randint(0, 256, w * h, dtype=np.uint8)
                if codec == "png":
                    content = encode_png(payload.reshape(h, w), channels=1)
                elif codec == "jpeg":
                    content = encode_jpeg(payload.reshape(h, w), channels=1)
                else:
                    content = encode_raw1(w, h, payload.tobytes())
                rows["media_id"].append(i)
                rows["media_type"].append("image")
                rows["codec"].append(codec)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(0)
                rows["content"].append(content)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


FEATURE_SCHEMA = "media_id long, n_bytes long, mean_intensity double, features array<double>"


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram feature extraction over the binary column —
    a real computation (normalized intensity histogram) standing in
    for a vision backbone; the output shape (id, features vector) is
    exactly what feeds q_sim_search-style ANN downstream."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "mean_intensity": [], "features": []}
            for mid, content, codec in zip(
                pdf["media_id"], pdf["content"], pdf["codec"]
            ):
                arr = decode_media(bytes(content), codec)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                total = max(len(arr), 1)
                out["media_id"].append(int(mid))
                out["n_bytes"].append(len(arr))
                out["mean_intensity"].append(round(float(arr.mean()) if len(arr) else 0.0, 4))
                out["features"].append([round(float(x) / total, 6) for x in hist])
            yield pd.DataFrame(out)

    return media.select("media_id", "codec", "content").mapInPandas(
        feat, schema=FEATURE_SCHEMA
    )


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize — the batch-UDF shape of a real image
    resize (same schema in/out, content rewritten). Decodes each row
    through its genuine codec (RAW1 envelope, PNG, or baseline JPEG)
    and re-encodes the resized pixels in the SAME codec, so a
    mixed-format corpus stays mixed-format through the transform."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_llm_spark.operators.codecs import decode_png, encode_png
        from mapreduce_llm_spark.operators.jpeg import decode_jpeg, encode_jpeg

        for pdf in batches:
            contents = []
            for content, codec in zip(pdf["content"], pdf["codec"]):
                b = bytes(content)
                if codec == "raw1":
                    w, h, arr = decode_raw1(b)
                    c = 1
                elif codec == "png":
                    w, h, c, arr = decode_png(b)
                elif codec == "jpeg":
                    w, h, c, arr = decode_jpeg(b)
                else:
                    raise NotImplementedError(f"resize: codec {codec!r}")
                img = arr.reshape(h, w, c)
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                resized = img[yi, xi]
                if codec == "raw1":
                    out = encode_raw1(out_w, out_h, resized.tobytes())
                elif codec == "png":
                    out = encode_png(resized.reshape(out_h, out_w * c), channels=c)
                else:
                    out = encode_jpeg(resized.reshape(out_h, out_w * c), channels=c)
                contents.append(out)
            yield pdf.assign(
                content=contents, width=out_w, height=out_h
            )

    return media.mapInPandas(rs, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_ix int, frame_mean double"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling (video shape): split the payload into n_frames
    equal slices and emit one row per frame — the 1→N row explosion a
    video pipeline needs, with per-frame stats."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_ix": [], "frame_mean": []}
            for mid, content, codec in zip(
                pdf["media_id"], pdf["content"], pdf["codec"]
            ):
                arr = decode_media(bytes(content), str(codec))
                for ix, frame in enumerate(np.array_split(arr, n_frames)):
                    out["media_id"].append(int(mid))
                    out["frame_ix"].append(ix)
                    out["frame_mean"].append(
                        round(float(frame.mean()) if len(frame) else 0.0, 4)
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "codec", "content").mapInPandas(
        fs, schema=FRAME_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_samples int, rms double, peak double, zero_crossings int"
)


def synthesize_audio(docs: DataFrame, id_col: str = "doc_id", n_samples: int = 4096,
                     sample_rate: int = 16000, codec: str = "raw1") -> DataFrame:
    """Deterministic waveforms: each doc id seeds a sum of two sine
    tones, so every stage downstream is reproducible. ``codec='raw1'``
    carries the int16 PCM in the raw test envelope (width=n_samples,
    height=1); ``codec='wav'`` writes REAL RIFF/PCM WAV files (stdlib
    encoder); ``codec='adpcm'`` writes IMA-ADPCM WAV (4:1 lossy — the
    compressed-audio leg). The audio twin of synthesize_media — same
    schema."""
    if codec not in ("raw1", "wav", "adpcm"):
        raise ValueError(f"synthesize_audio codec must be raw1|wav|adpcm, got {codec!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_llm_spark.operators.codecs import encode_wav, encode_wav_adpcm

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "media_type", "codec", "width", "height",
                "sample_rate", "content")}
            for mid in pdf[id_col]:
                t = np.arange(n_samples, dtype=np.float64) / sample_rate
                f1, f2 = 200 + (int(mid) % 17) * 20, 1000 + (int(mid) % 5) * 100
                wave = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
                pcm = (wave * 32767).astype("<i2")
                if codec == "wav":
                    content = encode_wav(pcm, sample_rate)
                elif codec == "adpcm":
                    content = encode_wav_adpcm(pcm, sample_rate)
                else:
                    content = encode_raw1(n_samples, 1, pcm.tobytes())
                rows["media_id"].append(int(mid))
                rows["media_type"].append("audio")
                rows["codec"].append(codec)
                rows["width"].append(n_samples)
                rows["height"].append(1)
                rows["sample_rate"].append(sample_rate)
                rows["content"].append(content)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Waveform features per clip: RMS energy, peak, zero-crossing
    count — the audio analogue of extract_features; one Arrow batch in,
    one numpy pass per clip, no shuffle. Decodes WAV content at full
    int16 fidelity via the stdlib codec (PCM or IMA-ADPCM — the format
    tag dispatches); RAW1 payloads are raw PCM. ADPCM decode yields
    whole blocks, so clips are trimmed back to their declared width
    (the encoder pads the tail block)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_llm_spark.operators.codecs import decode_wav

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_samples", "rms", "peak", "zero_crossings")}
            for mid, content, codec, width in zip(
                pdf["media_id"], pdf["content"], pdf["codec"], pdf["width"]
            ):
                if codec in ("wav", "adpcm"):
                    pcm = decode_wav(bytes(content))[2]
                    if codec == "adpcm":
                        pcm = pcm[: int(width)]
                else:
                    _, _, raw = decode_raw1(bytes(content))
                    pcm = np.frombuffer(raw.tobytes(), dtype="<i2")
                wave = pcm.astype(np.float64) / 32767
                out["media_id"].append(int(mid))
                out["n_samples"].append(len(wave))
                out["rms"].append(round(float(np.sqrt(np.mean(wave**2))), 6))
                out["peak"].append(round(float(np.abs(wave).max()), 6))
                out["zero_crossings"].append(int(np.sum(np.diff(np.sign(wave)) != 0)))
            yield pd.DataFrame(out)

    return media.select("media_id", "codec", "width", "content").mapInPandas(
        feats, schema=AUDIO_FEATURE_SCHEMA
    )
