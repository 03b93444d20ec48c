"""CLI entry + text-source tests (reference ops 1, 11, 14)."""

from __future__ import annotations

import os

from mapreduce_llm_spark.cli import main
from mapreduce_llm_spark.io import read_text_document, read_text_lines


def test_read_text_lines_order(spark, tmp_path):
    p = tmp_path / "lines.txt"
    lines = [f"row {i}" for i in range(100)]
    p.write_text("\n".join(lines))
    got = read_text_lines(spark, str(p)).orderBy("line_id").collect()
    assert [r["line"] for r in got] == lines
    assert [r["line_id"] for r in got] == list(range(100))


def test_read_text_document_whole(spark, tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("a\nb\nc")
    rows = read_text_document(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0]["text"] == "a\nb\nc"


def test_cli_end_to_end(spark, tmp_path):
    data = tmp_path / "reviews.txt"
    data.write_text("kitchen pan\ncar wax\nkitchen pot")
    out = tmp_path / "out.txt"
    rc = main([
        "keep kitchen items", str(data), "--keep-pattern", "kitchen", "-o", str(out)
    ])
    assert rc == 0
    assert out.read_text() == "kitchen pan\nkitchen pot"


def test_cli_default_output_path(spark, tmp_path):
    data = tmp_path / "reviews.txt"
    data.write_text("kitchen pan\ncar wax")
    rc = main(["p", str(data), "--keep-pattern", "kitchen"])
    assert rc == 0
    combined = tmp_path / "reviews.combined_results.txt"
    assert combined.read_text() == "kitchen pan"


def test_cli_dry_run(spark, tmp_path, capsys):
    data = tmp_path / "reviews.txt"
    data.write_text("some words here")
    rc = main(["p", str(data), "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Tokens:" in out and "gpt-5-nano" in out


def test_cli_missing_file(tmp_path):
    rc = main(["p", str(tmp_path / "nope.txt")])
    assert rc == 2


def test_read_csv_roundtrip(spark, tmp_path):
    from mapreduce_llm_spark.io import load_table, read_csv
    from tests.conftest import SMOKE_SF_DIR

    n = load_table(spark, SMOKE_SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    n.coalesce(1).write.option("header", "true").csv(out)
    back = read_csv(
        spark, out, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert back.count() == n.count()
    assert dict(back.dtypes)["n_nationkey"] == "int"


def test_read_json_lines_roundtrip(spark, tmp_path):
    from mapreduce_llm_spark.io import load_table, read_json_lines
    from tests.conftest import SMOKE_SF_DIR

    r = load_table(spark, SMOKE_SF_DIR, "region")
    out = str(tmp_path / "region_json")
    r.coalesce(1).write.json(out)
    back = read_json_lines(spark, out, "r_regionkey int, r_name string")
    assert sorted(x["r_name"] for x in back.collect()) == sorted(
        x["r_name"] for x in r.collect()
    )


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appending writers add columns over a table's lifetime; a
    mergeSchema read must union the schemas and null-fill old files —
    the evolution path a long-lived 100 TB table depends on."""
    from pyspark.sql import functions as F

    from mapreduce_llm_spark.io import load_table
    from tests.conftest import SMOKE_SF_DIR

    path = str(tmp_path / "evolving")
    r = load_table(spark, SMOKE_SF_DIR, "region")
    r.select("r_regionkey", "r_name").write.parquet(path)
    r.select(
        "r_regionkey", "r_name", F.lit("v2").alias("ingest_tag")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"r_regionkey", "r_name", "ingest_tag"}
    n = r.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("ingest_tag").isNull()).count() == n
    assert merged.filter(F.col("ingest_tag") == "v2").count() == n


def test_permissive_json_quarantines_corrupt_records(spark, tmp_path):
    """Good lines parse; bad lines appear once with raw text in
    _corrupt_record and NULL data columns — nothing dropped, nothing
    fatal."""
    from mapreduce_llm_spark.io import read_json_lines_permissive

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "wrong-type", "name": "bad id"}\n'
    )
    df = read_json_lines_permissive(spark, str(p), "id BIGINT, name STRING")
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(r["id"] for r in good) == [1, 2]
    assert len(bad) == 2
    assert any("not json" in r["_corrupt_record"] for r in bad)
    assert all(r["id"] is None for r in bad)
