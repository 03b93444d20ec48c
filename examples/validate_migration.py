"""Migration validation — the round-5 data-validation operators
composed the way a real cutover uses them, in execution order:

  1. publish    write the corpus as snapshot v1, then a derived v2
                (simulating a backfill: some docs dropped, some
                re-scored) via the versioned storage layer
  2. diff       table_diff(v1, v2) — every key accounted for as
                added / removed / changed / unchanged; both sides
                collapse to (key, fingerprint) so the join shuffles
                ~16 B/row however wide the rows are
  3. checksum   group_checksum per language on v2 vs an independently
                re-partitioned read of the same snapshot — equal sums
                prove the copy byte-identical without sorting either
                side (the layout-invariance that lets you compare a
                table with its re-bucketed / re-engined copy)
  4. gate       the cutover aborts unless the diff matches the
                backfill's declared intent and the checksums agree

Everything runs offline on the sf0.001 fixtures in a few seconds.

Run:  python examples/validate_migration.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.operators.snapshots import read_snapshot, write_snapshot
from mapreduce_llm_spark.operators.validate import group_checksum, table_diff
from mapreduce_llm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="validate-migration-example")
    table = tempfile.mkdtemp(prefix="mrs_migrate_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        v1 = write_snapshot(docs, table)
        # the "backfill": drop short docs, re-score a deterministic slice
        migrated = docs.where(F.col("n_chars") >= 100).withColumn(
            "n_chars",
            F.when(F.col("doc_id") % 10 == 0, F.col("n_chars") + 1).otherwise(
                F.col("n_chars")
            ),
        )
        v2 = write_snapshot(migrated, table)

        old = read_snapshot(spark, table, version=v1)
        new = read_snapshot(spark, table, version=v2)

        print("== diff v1 -> v2 ==")
        diff = (
            table_diff(old, new, ["doc_id"], ["lang", "source", "n_chars"])
            .groupBy("status")
            .count()
            .orderBy("status")
        )
        diff.show()
        statuses = {r["status"]: r["count"] for r in diff.collect()}
        assert "added" not in statuses, "a backfill must not invent keys"
        assert statuses.get("removed", 0) > 0 and statuses.get("changed", 0) > 0

        print("== checksum: snapshot vs re-partitioned copy ==")
        a = group_checksum(new, ["lang"], ["doc_id", "source", "n_chars"])
        b = group_checksum(
            read_snapshot(spark, table, version=v2).repartition(11),
            ["lang"],
            ["doc_id", "source", "n_chars"],
        ).withColumnRenamed("checksum", "checksum_copy")
        cmp = a.join(b.select("lang", "checksum_copy"), "lang")
        cmp.show()
        bad = cmp.where(F.col("checksum") != F.col("checksum_copy")).count()
        assert bad == 0, "copy diverges from snapshot"
        print("cutover gate: PASS")
    finally:
        shutil.rmtree(table, ignore_errors=True)


if __name__ == "__main__":
    main()
