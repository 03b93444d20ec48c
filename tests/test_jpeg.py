"""Baseline JPEG codec (operators/jpeg.py): lossy roundtrip bounds,
bitstream validity, Huffman table construction, format rejection, and
integration with the multimodal pipeline.

JPEG is lossy, so roundtrip asserts BOUNDED error, not equality:
quantization at quality 85-90 keeps smooth content within a few
intensity levels and sharp edges within ~10% of full scale. The
decoder reads quantization/Huffman tables from the file's own DQT/DHT
segments, so the roundtrip also proves the emitted bitstream is
self-describing — not an encoder/decoder sharing hidden state.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_llm_spark.operators.jpeg import (
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHROM_BITS,
    DC_CHROM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    build_huffman,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_table,
    Q_LUM,
)


def _test_image(h: int = 24, w: int = 40) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx * 255 / (w - 1)) * 0.6 + (yy * 255 / (h - 1)) * 0.4).astype(
        np.uint8
    )
    img[5:12, 5:15] = 200
    img[14:20, 20:33] = 30
    return img


def test_gray_roundtrip_bounded_error():
    img = _test_image()
    data = encode_jpeg(img, channels=1, quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w, h, c, out = decode_jpeg(data)
    assert (w, h, c) == (40, 24, 1)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 30


def test_rgb_roundtrip_bounded_error():
    g = _test_image()
    h, w = g.shape
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([g, 255 - g, ((xx * 3 + yy * 5) % 256).astype(np.uint8)], axis=-1)
    data = encode_jpeg(rgb.reshape(h, w * 3), channels=3, quality=90)
    w2, h2, c2, out = decode_jpeg(data)
    assert (w2, h2, c2) == (w, h, 3)
    err = np.abs(out.reshape(h, w, 3).astype(int) - rgb.astype(int))
    assert err.mean() < 5 and err.max() < 40


def test_non_multiple_of_8_dims_and_determinism():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (13, 19), dtype=np.uint8)
    a = encode_jpeg(img, channels=1, quality=75)
    assert a == encode_jpeg(img, channels=1, quality=75)
    w, h, c, out = decode_jpeg(a)
    assert (w, h, c) == (19, 13, 1) and out.shape == (13, 19)


def test_flat_image_compresses_to_dc_only():
    """A constant image is pure DC: every AC coefficient quantizes to
    zero, so the file collapses to EOB-per-block — and decodes back
    exactly (DC quantization of a flat level is lossless here)."""
    img = np.full((16, 16), 128, dtype=np.uint8)
    data = encode_jpeg(img, channels=1, quality=85)
    assert len(data) < 700  # headers dominate; entropy data is ~bytes
    _, _, _, out = decode_jpeg(data)
    assert int(np.abs(out.astype(int) - 128).max()) <= 1


def test_annex_k_huffman_tables_are_valid_prefix_codes():
    for bits, vals in [
        (DC_LUM_BITS, DC_LUM_VALS),
        (DC_CHROM_BITS, DC_CHROM_VALS),
        (AC_LUM_BITS, AC_LUM_VALS),
        (AC_CHROM_BITS, AC_CHROM_VALS),
    ]:
        table = build_huffman(bits, vals)  # raises on overflow
        assert len(table) == len(vals)
        # prefix-freeness: no code is a prefix of a longer code
        codes = sorted(
            (length, code) for code, length in table.values()
        )
        seen: list[tuple[int, int]] = []
        for length, code in codes:
            for pl, pc in seen:
                assert code >> (length - pl) != pc, "prefix violation"
            seen.append((length, code))


def test_quality_scaling_monotone_and_clamped():
    q10, q50, q95 = (scaled_quant_table(Q_LUM, q) for q in (10, 50, 95))
    assert (q10 >= q50).all() and (q50 >= q95).all()
    assert q95.min() >= 1 and q10.max() <= 255
    with pytest.raises(ValueError):
        scaled_quant_table(Q_LUM, 0)


def test_rejects_unsupported_variants():
    img = _test_image(16, 16)
    data = bytearray(encode_jpeg(img, channels=1, quality=85))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + bytes(data))
    # flip SOF0 -> SOF2 (progressive): find the C0 marker
    sof = data.find(b"\xff\xc0")
    prog = data[:sof] + b"\xff\xc2" + data[sof + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    # claim 2x2 subsampling on component 1
    sub = bytearray(data)
    sub[sof + 11] = 0x22  # SOF payload: len(2) precision(1) h(2) w(2) ncomp(1) id(1) samp
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(data[:-20]))


def test_decode_media_and_synthesis_integration(spark):
    """The jpeg codec path through the Spark pipeline: synthesize REAL
    JFIF bytes per doc, decode via the mapInPandas feature extractor,
    and pin determinism plus agreement with the RAW1 ground truth
    (noise survives quantization only approximately; mean intensity
    must stay within a few levels of the exact payload's)."""
    from mapreduce_llm_spark.operators.multimodal import (
        decode_media,
        extract_features,
        synthesize_media,
    )

    img = _test_image()
    flat = decode_media(encode_jpeg(img, channels=1, quality=85), "jpeg")
    assert flat.shape == (img.size,)

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = synthesize_media(ids, codec="jpeg")
    rows = {r["media_id"]: r for r in media.collect()}
    assert all(bytes(r["content"])[:2] == b"\xff\xd8" for r in rows.values())

    feats = {
        r["media_id"]: r for r in extract_features(media).collect()
    }
    raw = {
        r["media_id"]: r
        for r in extract_features(synthesize_media(ids, codec="raw1")).collect()
    }
    for mid in feats:
        assert feats[mid]["n_bytes"] == raw[mid]["n_bytes"]
        assert abs(feats[mid]["mean_intensity"] - raw[mid]["mean_intensity"]) < 6


@pytest.mark.parametrize("dims", [(1, 1), (1, 9), (7, 3), (8, 8), (9, 17)])
def test_tiny_and_odd_dimensions_roundtrip(dims):
    """Blocks pad by edge replication, so any positive dimensions must
    encode/decode cleanly — including sub-8×8 images where the whole
    image is padding except one corner."""
    h, w = dims
    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    w2, h2, c2, out = decode_jpeg(encode_jpeg(img, channels=1, quality=90))
    assert (w2, h2, c2) == (w, h, 1) and out.shape == (h, w)
    # noise is JPEG's worst case; bound loosely but meaningfully
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 64


def test_standalone_markers_and_fill_bytes_are_skipped():
    """T.81 allows 0xFF fill bytes before any marker and standalone
    length-less markers (TEM, RSTn) between segments; a parser that
    reads a 2-byte length for them misparses the whole stream. Inject
    both right after SOI of a valid self-encoded file."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_jpeg(img, channels=1, quality=85)
    assert data[:2] == b"\xff\xd8"
    # SOI + [fill bytes, TEM, RST3] + rest of stream
    patched = data[:2] + b"\xff\xff\xff\x01\xff\xd3" + data[2:]
    w, h, c, out = decode_jpeg(patched)
    assert (w, h, c) == (8, 8, 1)
    assert np.array_equal(out, decode_jpeg(data)[3])


def test_missing_tables_raise_value_error_not_key_error():
    """A scan referencing an undeclared Huffman/quant table must fail
    with an explicit ValueError before entropy decode starts — not a
    KeyError mid-scan. Strip the DHT segment from a valid file."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_jpeg(img, channels=1, quality=85)

    def strip_segment(buf: bytes, marker: int) -> bytes:
        out = bytearray()
        pos = 0
        import struct as _struct

        out += buf[:2]
        pos = 2
        while pos + 4 <= len(buf):
            m = buf[pos + 1]
            if m == 0xDA:
                out += buf[pos:]
                break
            (ln,) = _struct.unpack(">H", buf[pos + 2 : pos + 4])
            if m != marker:
                out += buf[pos : pos + 2 + ln]
            pos += 2 + ln
        return bytes(out)

    for m, frag in ((0xC4, "DHT"), (0xDB, "DQT")):
        with pytest.raises(ValueError, match=frag):
            decode_jpeg(strip_segment(data, m))
