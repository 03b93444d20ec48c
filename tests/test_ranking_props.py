"""Property tests for the distributed-ranking primitives, with DuckDB
as the semantics oracle for ntile."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _spark_ntile_bucket(rank: int, total: int, n: int) -> int:
    """Pure-python mirror of operators/ranking.py:ntile_from_rank."""
    q, r = divmod(total, n)
    if q == 0:
        return rank
    big = (q + 1) * r
    if rank <= big:
        return (rank - 1) // (q + 1) + 1
    return r + (rank - big - 1) // q + 1


@settings(max_examples=200, deadline=None)
@given(total=st.integers(1, 500), n=st.integers(1, 20))
def test_ntile_formula_matches_sql_semantics(total, n):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, ntile({n}) OVER (ORDER BY i) FROM generate_series(1, {total}) t(i)"
    ).fetchall()
    for rank, bucket in rows:
        assert _spark_ntile_bucket(rank, total, n) == bucket, (rank, total, n)
