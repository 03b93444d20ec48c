"""Run every registered oracle-backed query against the DuckDB oracle
at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn

registry.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_oracle_match(spark, con, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, registry.ORACLE[name], name)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLE)))
def test_rows_only_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
