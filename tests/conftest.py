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


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mapreduce_llm_spark-tests")
    yield spark
