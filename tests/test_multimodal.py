"""Multimodal plumbing tests: binary round-trip through Arrow batches,
decode/feature/resize/frame-sample shapes, and the explicit stub
boundary for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_llm_spark.operators.multimodal import (
    decode_media,
    decode_raw1,
    encode_raw1,
    extract_features,
    resize_media,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    return synthesize_media(ids).cache()


def test_binary_roundtrip_through_arrow(media):
    rows = media.collect()
    assert len(rows) == 40
    for r in rows[:5]:
        w, h, arr = decode_raw1(bytes(r["content"]))
        assert (w, h) == (r["width"], r["height"])
        assert len(arr) == w * h


def test_extract_features_histogram(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == 40
    for mid, r in feats.items():
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-4  # normalized histogram
        assert 0 <= r["mean_intensity"] <= 255
        assert r["n_bytes"] == (16 + mid % 16) * (16 + (mid // 16) % 16)


def test_resize_changes_dims_keeps_ids(media):
    resized = resize_media(media, 8, 8).collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in resized)
    for r in resized:
        w, h, arr = decode_raw1(bytes(r["content"]))
        assert (w, h, len(arr)) == (8, 8, 64)


def test_sample_frames_explodes_rows(media):
    frames = sample_frames(media, n_frames=4).collect()
    assert len(frames) == 40 * 4
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_ix"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_real_codec_is_explicit_stub():
    # video containers are the one remaining external-library boundary
    # (PNG/WAV: operators/codecs.py; baseline JPEG: operators/jpeg.py)
    with pytest.raises(NotImplementedError, match="mp4"):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "mp4")


def test_deterministic_across_runs(spark):
    ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    a = {r["media_id"]: bytes(r["content"]) for r in synthesize_media(ids).collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in synthesize_media(ids).collect()}
    assert a == b


def test_audio_features_deterministic(spark):
    """Same ids → identical waveform features across runs (the seeded
    synthesis contract the rows-only declaration relies on)."""
    from mapreduce_llm_spark.operators.multimodal import audio_features, synthesize_audio

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    a = {r["media_id"]: r for r in audio_features(synthesize_audio(ids)).collect()}
    b = {r["media_id"]: r for r in audio_features(synthesize_audio(ids)).collect()}
    assert a == b
    assert all(r["n_samples"] == 4096 for r in a.values())
    # different ids produce different tones → different features
    assert len({r["zero_crossings"] for r in a.values()}) > 1
