from __future__ import annotations

import pytest

from mapreduce_llm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mapreduce_llm_spark-tests")
    yield spark
