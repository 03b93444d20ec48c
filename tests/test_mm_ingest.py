"""Multimodal file ingest (io.read_binary_files + q_mm_ingest):
byte-exact file round trip, glob pruning at the listing level, and
the deterministic per-format decode profile."""

from __future__ import annotations

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import read_binary_files
from mapreduce_llm_spark.queries.multimodal_ingest import (
    N_EACH,
    _publish_media_dir,
)
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def test_binary_file_source_roundtrips_bytes(spark, tmp_path):
    payload = bytes(range(256)) * 3
    p = tmp_path / "blob.bin"
    p.write_bytes(payload)
    rows = read_binary_files(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payload
    assert rows[0]["length"] == len(payload)


def test_binary_file_glob_prunes_listing(spark):
    src = _publish_media_dir()
    pngs = read_binary_files(spark, src, glob="*.png")
    assert pngs.count() == N_EACH
    all_files = read_binary_files(spark, src)
    assert all_files.count() == 2 * N_EACH


def test_mm_ingest_profile_is_deterministic(spark):
    rows = {r["fmt"]: r for r in QUERIES["q_mm_ingest"](spark, SMOKE_SF_DIR).collect()}
    assert set(rows) == {"png", "wav"}  # nothing lands in 'unknown'
    for fmt in ("png", "wav"):
        assert rows[fmt]["n_files"] == N_EACH
        assert rows[fmt]["n_values"] > 0
    # pixel domain vs sample domain
    assert 0 <= rows["png"]["mean_value"] <= 255
    assert abs(rows["wav"]["mean_value"]) < 32768
    # seeded content => identical on a second run
    again = {r["fmt"]: r for r in QUERIES["q_mm_ingest"](spark, SMOKE_SF_DIR).collect()}
    for fmt in ("png", "wav"):
        assert again[fmt]["mean_value"] == rows[fmt]["mean_value"]
        assert again[fmt]["total_bytes"] == rows[fmt]["total_bytes"]
