"""Shared pytest fixtures: one SparkSession per test run, small fixtures."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dataflow_geobeam_spark.session import get_spark

    # local[8]: enough parallelism to catch partitioning bugs, cheap worker spawn
    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    from dataflow_geobeam_spark.fixtures import ensure_fixtures

    return ensure_fixtures(TESTDATA_SF)


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA_SF
