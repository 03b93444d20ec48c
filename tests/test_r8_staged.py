"""Round-8 staged-surface invariants (queries/analytics_r8_staged.py).

The round-7 DRIVER_PRIORITY window is exactly full, so brand-new
oracle-backed queries cannot register this round (the external-book
invariant would — correctly — fail them). The staged module holds the
next window-sized tranche as full (fn, oracle) pairs; this test proves
every pair NOW with the same harness the driver gate uses, so the
round-8 flip into ``@query(oracle=...)`` + DRIVER_PRIORITY slots
carries no new risk. Also pins that staging is registry-side-effect
free: importing the staged module must not register anything.
"""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r8_staged import STAGED
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn

registry.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_staged_module_has_no_registry_side_effects():
    for name in STAGED:
        assert name not in registry.QUERIES, (
            f"{name} leaked into the registry — staged queries must not "
            "register until their round-8 window slot exists"
        )


def test_staged_names_are_new():
    assert len(STAGED) == 47
    for name in STAGED:
        assert name.startswith("q_")


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_hash_matches_oracle(spark, con, name):
    fn, sql = STAGED[name]
    ok, msg = compare(fn(spark, SF_DIR), con, sql, name)
    assert ok, msg
