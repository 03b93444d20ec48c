"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver contract (__spark_entry__.py docstring): for each
query with an oracle, run the Spark DataFrame and the DuckDB SQL over
the same parquet tables, then compare row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by their stringified values). Exact equality is required — the driver
hashes values, so "close" floats fail there too.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from mapreduce_llm_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rows_to_canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Return (ok, message). Exact order-insensitive value comparison."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    # DuckDB sums over integers yield HUGEINT; fetchall() converts those
    # to Python ints (so they'd compare equal here) but the driver
    # materializes via pandas where int128 becomes float64 and hashes as
    # "1.0" vs Spark's "1". Reject the type outright so the divergence
    # can't hide behind the lenient local fetch path.
    huge = [
        (c, str(t)) for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t)
    ]
    if huge:
        return False, (
            f"{name}: oracle emits HUGEINT column(s) {huge} — the driver "
            "hashes these as floats; CAST the aggregate AS BIGINT in the SQL"
        )
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"{name}: row count differs spark={len(s_rows)} duck={len(d_rows)}"
    _, s_canon = _rows_to_canonical(s_cols, s_rows)
    _, d_canon = _rows_to_canonical(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:3]
        return False, f"{name}: values differ; first diffs (spark,duck): {diffs}"
    return True, f"{name}: OK ({len(s_rows)} rows)"
