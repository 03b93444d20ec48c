"""Round-12 staged-surface invariants (queries/analytics_r12_staged.py).

Same contract as the (retired) round-11 staging test, one window
further out: the round-11 window is fully allocated by the r11 flip,
so surface built beyond that point stages in the r12 module and is
proven NOW with the driver-gate harness at sf0.01 (and the sf0.1
sweep env), carrying zero flip risk into round 13. Also pins that the
module is registry-side-effect free and collision-free against the
live registry (which includes the flipped round-11 batch).
"""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r12_staged import STAGED_R12
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn

registry.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_staged_module_has_no_registry_side_effects():
    for name in STAGED_R12:
        assert name not in registry.QUERIES, (
            f"{name} leaked into the registry — staged queries must not "
            "register until their round-12 window slot exists"
        )


def test_staged_names_are_new():
    for name in STAGED_R12:
        assert name.startswith("q_")


@pytest.mark.parametrize("name", sorted(STAGED_R12))
def test_staged_query_hash_matches_oracle(spark, con, name):
    fn, sql = STAGED_R12[name]
    ok, msg = compare(fn(spark, SF_DIR), con, sql, name)
    assert ok, msg
