from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from incubator_impala_spark.session import get_spark

    s = get_spark("incubator-impala-spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from incubator_impala_spark.engine import Engine

    return Engine(spark, sf_dir=SF_SMALL)
