"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver contract (__spark_entry__.py docstring) INCLUDING its
materialization path: the driver pulls the Spark result via
``toPandas()`` and the DuckDB result via ``.df()``, sorts columns by
name, sorts rows, and hashes the cell values. Three rounds of history
show the hash is sensitive to *representation*, not just value — DuckDB
HUGEINT→float64 vs Spark int (round 1), list cells being unhashable
(round 2), DuckDB wide DECIMAL→float64 vs Spark ``Decimal`` objects
(round 3). A harness that fetches tuples via ``fetchall()`` misses all
of these because Python-level equality is more forgiving than the
driver's pandas rendering.

So this harness is deliberately STRICTER than plain value equality:

1. Both sides are materialized through the same pandas paths the driver
   uses (``toPandas()`` / ``.df()``).
2. Cell types the driver renders inconsistently are rejected outright:
   ``decimal.Decimal``, lists/arrays/maps/structs, bytes. Queries must
   emit driver-stable primitives (int64 / float64 / str / bool /
   timestamp) — cast wide decimals to string or round to double, join
   arrays, hex-encode binaries.
3. The per-column *type class* must agree between the two frames (int vs
   float vs str vs datetime ...). This catches HUGEINT-style silent
   widenings even when the values would compare equal as Python objects.
4. Values then compare exactly after a canonical stringification,
   order-insensitive (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import decimal
import math
import os
from datetime import date, datetime

import duckdb
import numpy as np

from mapreduce_llm_spark.io import TABLES

#: Cell types whose pandas rendering has diverged between engines in at
#: least one driver round. Queries must not emit them.
_UNSTABLE_CELLS = (decimal.Decimal, list, tuple, dict, set, bytes, bytearray, np.ndarray)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return True
    # pandas NaT / pd.NA arrive as singletons with their own types
    return v.__class__.__name__ in ("NaTType", "NAType")


def _column_class(series) -> str:
    """Coarse type class of a pandas column, inspecting object cells."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    if kind == "m":
        return "timedelta"
    # object dtype: classify by the first non-null cell
    for v in series:
        if _is_null(v):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, str):
            return "str"
        if isinstance(v, datetime):
            return "datetime"
        if isinstance(v, date):
            return "date"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return type(v).__name__
    return "empty"


def _unstable_cell(series):
    """First driver-unstable cell in the column, or None."""
    for v in series:
        if _is_null(v):
            continue
        if isinstance(v, _UNSTABLE_CELLS):
            return v
        return None  # homogeneous columns: first cell decides
    return None


def _norm(v) -> str:
    if _is_null(v):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.1f}"
        return repr(f)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _canonical_rows(pdf):
    cols = sorted(pdf.columns)
    arr = pdf[cols].to_numpy(dtype=object)
    out = [tuple(_norm(c) for c in row) for row in arr]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Return (ok, message). Driver-faithful order-insensitive compare."""
    rel = con.sql(sql)
    # Explicit early warnings for the two DuckDB logical types whose
    # pandas rendering is known-hostile, so the failure message teaches
    # the fix rather than just reporting a class mismatch.
    hostile = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t) or str(t).startswith("DECIMAL")
    ]
    d_pdf = rel.df()
    s_pdf = spark_df.toPandas()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        return False, f"{name}: columns differ spark={s_cols} duck={d_cols}"
    if len(s_pdf) != len(d_pdf):
        return False, f"{name}: row count differs spark={len(s_pdf)} duck={len(d_pdf)}"

    for col in s_cols:
        for side, pdf in (("spark", s_pdf), ("duck", d_pdf)):
            bad = _unstable_cell(pdf[col])
            if bad is not None:
                hint = (
                    f" (oracle type {dict(hostile).get(col)})" if col in dict(hostile) else ""
                )
                return False, (
                    f"{name}: column {col!r} on the {side} side contains "
                    f"driver-unstable cell type {type(bad).__name__}{hint} — the "
                    "driver's pandas canonicalizer renders these inconsistently. "
                    "Emit driver-stable primitives: cast DECIMAL to string on "
                    "BOTH sides, round to 4-decimal double, array_join lists, "
                    "hex() binaries."
                )
        s_class, d_class = _column_class(s_pdf[col]), _column_class(d_pdf[col])
        if "empty" in (s_class, d_class):
            continue  # zero rows on a side: nothing to classify
        if s_class != d_class:
            hint = f" (oracle type {dict(hostile).get(col)})" if col in dict(hostile) else ""
            return False, (
                f"{name}: column {col!r} type class differs: spark={s_class} "
                f"duck={d_class}{hint} — the driver hashes the pandas rendering, "
                "so e.g. HUGEINT sums arrive as float64 ('1.0') against Spark's "
                "int64 ('1'). CAST both sides to the same primitive."
            )

    s_canon = _canonical_rows(s_pdf)
    d_canon = _canonical_rows(d_pdf)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        return False, f"{name}: values differ; first diffs (spark,duck): {diffs}"
    return True, f"{name}: OK ({len(s_pdf)} rows)"
