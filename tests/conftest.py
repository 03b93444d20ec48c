from __future__ import annotations

import os

import pytest

from mapreduce_llm_spark.session import get_spark

# Overridable so the oracle gate can be swept at other scale factors
# (the driver regenerates testdata each round — row counts, tie
# patterns, and encodings drift; a query that is only correct at
# sf0.01's exact data is a latent red cell):
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 pytest tests/test_oracle_queries.py
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Staged-surface tier gate (round-15 verify-budget fix, VERDICT r14
# item 2): the pending staged windows (queries/analytics_r14_staged,
# analytics_r15_staged) were fully proven when they were staged —
# driver-gate harness at sf0.01, the sf0.1 sweep, plan lint, law
# tests, sf1 stress — and none of that surface is registered or
# reachable by the driver until its flip round. Re-proving ~310
# staged tests on every verify run pushed the suite past the driver's
# wall-clock budget (VERIFY_r14 was killed at ~95% with zero
# failures). The tier is opt-in: any round that TOUCHES staged
# surface, and every flip round, must run with
# SPARK_GRAFT_STAGED_TESTS=1. Registry-hygiene tests (staged names
# must not leak into or collide with the live registry) stay
# unconditional.
STAGED_TIER = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STAGED_TESTS"),
    reason="staged-surface tier: opt-in via SPARK_GRAFT_STAGED_TESTS=1 "
    "(proven at staging time; unregistered until the flip round)",
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mapreduce_llm_spark-tests")
    yield spark
