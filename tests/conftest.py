"""Shared test fixtures: one SparkSession per test run + generated fixture data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monthly_report_etl_spark.fixtures import write_fixture  # noqa: E402
from monthly_report_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture")
    write_fixture(str(out), n_scenarios=300, seed=42)
    return str(out)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
