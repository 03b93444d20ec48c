"""Pure-stdlib PNG/WAV codecs and their integration with the
multimodal pipeline. The PNG decoder is additionally validated against
scanline data using every predictor filter type (our encoder only
emits filter 0, so round-trip alone would leave Sub/Up/Average/Paeth
untested)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mapreduce_llm_spark.operators.codecs import (
    _png_chunk,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def test_png_round_trip_grayscale():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 17), dtype=np.uint8)
    w, h, c, out = decode_png(encode_png(img, channels=1))
    assert (w, h, c) == (17, 13, 1)
    assert np.array_equal(out, img)


def test_png_round_trip_rgb_and_rgba():
    rng = np.random.RandomState(8)
    for channels in (3, 4):
        img = rng.randint(0, 256, (5, 6 * channels), dtype=np.uint8)
        w, h, c, out = decode_png(encode_png(img, channels=channels))
        assert (w, h, c) == (6, 5, channels)
        assert np.array_equal(out, img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    computing each filtered line from the true pixels (RFC 2083 §6)."""
    h, stride = img.shape
    bpp = 1
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y, ftype in zip(range(h), filters):
        line = img[y].astype(np.int16)
        enc = np.empty(stride, dtype=np.int16)
        for i in range(stride):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(line[i]) - pred) & 0xFF
        raw.append(ftype)
        raw.extend(int(v) for v in enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", stride, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decoder_handles_every_filter_type():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (5, 8), dtype=np.uint8)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    _, _, _, out = decode_png(data)
    assert np.array_equal(out, img)


def test_png_rejects_non_png_and_unsupported_variants():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not a png")
    # 16-bit depth: unsupported, must fail loudly
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    data = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(data)


def test_wav_round_trip_16bit():
    rng = np.random.RandomState(10)
    pcm = rng.randint(-32768, 32768, 999, dtype=np.int16)
    rate, channels, out = decode_wav(encode_wav(pcm, 22050))
    assert (rate, channels) == (22050, 1)
    assert np.array_equal(out, pcm)


def test_wav_8bit_widens_losslessly():
    samples8 = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 3) + samples8.tobytes()
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, _, out = decode_wav(data)
    assert rate == 8000
    assert out.tolist() == [-32768, 0, 32512]


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0) + b""
    )
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_png_corpus_features_match_raw1_corpus(spark):
    """The PNG-encoded media corpus must yield byte-identical features
    to the RAW1 one — same pixels, different container — proving the
    decode path (inflate + unfilter) reconstructs the exact payload
    inside the distributed pipeline."""
    from mapreduce_llm_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    via_png = extract_features(synthesize_media(docs, codec="png"))
    via_raw = extract_features(synthesize_media(docs, codec="raw1"))
    assert sorted(map(tuple, via_png.collect())) == sorted(
        map(tuple, via_raw.collect())
    )


def test_wav_corpus_audio_features_match_raw1_corpus(spark):
    from mapreduce_llm_spark.operators.multimodal import (
        audio_features,
        synthesize_audio,
    )

    docs = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    via_wav = audio_features(synthesize_audio(docs, codec="wav"))
    via_raw = audio_features(synthesize_audio(docs, codec="raw1"))
    assert sorted(map(tuple, via_wav.collect())) == sorted(
        map(tuple, via_raw.collect())
    )


def test_decode_media_still_rejects_truly_external_codecs():
    from mapreduce_llm_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "mp4")


def test_resize_through_real_codecs_matches_raw1(spark):
    """resize_media now decodes/re-encodes each row's genuine codec.
    PNG is lossless, so the resized-PNG frame stats must equal the
    resized-RAW1 ground truth exactly; JPEG re-encode must run and
    stay deterministic."""
    from mapreduce_llm_spark.operators.multimodal import (
        resize_media,
        sample_frames,
        synthesize_media,
    )

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")

    def frames(codec):
        media = resize_media(synthesize_media(ids, codec=codec), 8, 8)
        return {
            (r["media_id"], r["frame_ix"]): r["frame_mean"]
            for r in sample_frames(media, n_frames=4).collect()
        }

    raw, png = frames("raw1"), frames("png")
    assert raw == png
    jpg = frames("jpeg")
    assert set(jpg) == set(raw)
    assert jpg == frames("jpeg")  # deterministic
