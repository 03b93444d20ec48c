"""Round-6 staged oracles (queries/future_oracles.py) proven NOW with
the same harness the driver gate uses: each drafted DuckDB twin must
already hash-match its live rows-only query at sf0.01, so the round-6
flip into @query(oracle=...) carries no new risk. Also pins that the
staged names are NOT yet registered oracles (they must not occupy the
full round-5 window)."""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.future_oracles import FUTURE_ORACLES
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn

registry.load_all()


def test_staged_names_are_registered_rows_only():
    for name in FUTURE_ORACLES:
        assert name in registry.QUERIES, name
        assert name not in registry.ORACLE, (
            f"{name} graduated to a registered oracle — move its SQL "
            "out of future_oracles and into the @query declaration"
        )


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(FUTURE_ORACLES))
def test_future_oracle_hash_matches(spark, con, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, FUTURE_ORACLES[name], name)
    assert ok, msg
