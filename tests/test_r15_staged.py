"""Round-15 staged-surface invariants (queries/analytics_r15_staged.py).

Same contract as the round-14 staging test: every entry is proven NOW
with the driver-gate harness at sf0.01 (and the sf0.1 sweep env). Also
pins that the module is registry-side-effect free and collision-free
against the live registry AND the pending r14 staging.
"""

from __future__ import annotations

import pytest

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.queries.analytics_r14_staged import STAGED_R14
from mapreduce_llm_spark.queries.analytics_r15_staged import STAGED_R15
from tests.conftest import SF_DIR, STAGED_TIER
from tests.oracle_harness import compare, duckdb_conn

registry.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_staged_module_has_no_registry_side_effects():
    for name in STAGED_R15:
        assert name not in registry.QUERIES, (
            f"{name} leaked into the registry — staged queries must not "
            "register until their round-16 window slot exists"
        )


def test_staged_names_do_not_collide_with_pending_stagings():
    overlap = set(STAGED_R15) & set(STAGED_R14)
    assert not overlap, (
        f"{sorted(overlap)} staged twice — an earlier flip would collide"
    )


def test_staged_names_are_new():
    for name in STAGED_R15:
        assert name.startswith("q_")


@STAGED_TIER
@pytest.mark.parametrize("name", sorted(STAGED_R15))
def test_staged_query_hash_matches_oracle(spark, con, name):
    fn, sql = STAGED_R15[name]
    ok, msg = compare(fn(spark, SF_DIR), con, sql, name)
    assert ok, msg
