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
    encode_wav_adpcm,
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


def _ima_wav(blocks: bytes, n_channels: int, block_align: int, spb: int) -> bytes:
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_channels, 8000,
        (8000 * block_align) // spb, block_align, 4, 2, spb,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_adpcm_decode_hand_computed_vector():
    """One block, predictor 0, step index 0 (step=7), nibbles hand-walked
    through the IMA tables:
      code 2: diff = 7>>3 + 7>>1 = 3            → pred 3,  index 0+(-1)→0
      code 4: diff = 7>>3 + 7    = 7            → pred 10, index 0+2 = 2
      code 9: step=9; diff = -(9>>3 + 9>>2) = -3 → pred 7,  index 2-1 = 1
      code 0: step=8; diff = 8>>3 = 1           → pred 8,  index 1-1 = 0
    plus 4 trailing zero codes (step 7→…, diff 0 each ⇒ pred stays ~8+ε).
    """
    header = struct.pack("<hBB", 0, 0, 0)
    payload = bytes([0x42, 0x09, 0x00, 0x00])  # low nibble first: 2,4,9,0,0,0,0,0
    data = _ima_wav(header + payload, 1, 8, 9)
    rate, ch, out = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert out[:5].tolist() == [0, 3, 10, 7, 8]
    # trailing zero codes at index 0: diff = 7>>3 = 0 → predictor frozen
    assert out[5:].tolist() == [8, 8, 8, 8]


def test_adpcm_round_trip_snr_mono():
    t = np.arange(4096)
    sine = (12000 * np.sin(2 * np.pi * t / 64)).astype(np.int16)
    rate, ch, out = decode_wav(encode_wav_adpcm(sine, 16000))
    assert (rate, ch) == (16000, 1)
    out = out[: sine.size]  # trailing block padding
    err = out.astype(np.float64) - sine.astype(np.float64)
    snr = 10 * np.log10(np.mean(sine.astype(np.float64) ** 2) / np.mean(err**2))
    assert snr > 25, f"ADPCM SNR too low: {snr:.1f} dB"


def test_adpcm_round_trip_stereo_interleave():
    """Stereo: left = slow ramp, right = negated — the 4-byte-group
    channel interleave must keep them apart."""
    n = 1024
    left = np.linspace(-8000, 8000, n).astype(np.int16)
    stereo = np.empty(2 * n, dtype=np.int16)
    stereo[0::2], stereo[1::2] = left, -left
    rate, ch, out = decode_wav(encode_wav_adpcm(stereo, 8000, n_channels=2))
    assert (rate, ch) == (8000, 2)
    lo, ro = out[0::2][:n].astype(np.float64), out[1::2][:n].astype(np.float64)
    assert np.max(np.abs(lo - left)) < 64  # smooth ramp: tiny quantizer error
    assert np.max(np.abs(ro + left)) < 64


def test_adpcm_rejects_malformed():
    with pytest.raises(ValueError, match="4-bit"):
        # format tag 0x11 but bits=8
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 256, 8, 2, 505)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0) + b""
        )
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="step index"):
        header = struct.pack("<hBB", 0, 99, 0)  # index 99 > 88
        decode_wav(_ima_wav(header + b"\x00" * 4, 1, 8, 9))


def test_adpcm_empty_and_short_tail():
    rate, ch, out = decode_wav(encode_wav_adpcm(np.empty(0, dtype=np.int16), 8000))
    assert out.size >= 0  # silence padding decodes cleanly
    # a 3-sample clip still round-trips its head exactly-ish
    clip = np.array([100, 200, 300], dtype=np.int16)
    _, _, out = decode_wav(encode_wav_adpcm(clip, 8000))
    assert abs(int(out[0]) - 100) == 0  # block header carries sample 0 verbatim


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


def test_adpcm_corpus_audio_features_close_to_raw1(spark):
    """ADPCM is lossy (4:1), so the distributed feature pass can't be
    byte-identical to the PCM corpus — but on smooth synthetic tones the
    RMS/peak must land within quantizer error and the clip length must
    match exactly (the decoder trims the padded tail block)."""
    from mapreduce_llm_spark.operators.multimodal import (
        audio_features,
        synthesize_audio,
    )

    docs = spark.range(0, 15).withColumnRenamed("id", "doc_id")
    via_adp = {r["media_id"]: r for r in
               audio_features(synthesize_audio(docs, codec="adpcm")).collect()}
    via_raw = {r["media_id"]: r for r in
               audio_features(synthesize_audio(docs, codec="raw1")).collect()}
    assert set(via_adp) == set(via_raw)
    for mid, raw in via_raw.items():
        adp = via_adp[mid]
        assert adp["n_samples"] == raw["n_samples"]
        assert abs(adp["rms"] - raw["rms"]) < 0.01
        assert abs(adp["peak"] - raw["peak"]) < 0.05


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
