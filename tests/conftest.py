"""Shared fixtures: one SparkSession per test run, DuckDB oracle per sf_dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_asana_spark.session import build_session  # noqa: E402
from etl_asana_spark.testing import duckdb_connect  # noqa: E402

#: Parity tests default to sf0.001 (seconds, not minutes); override with
#: PARITY_SF_DIR=/root/testdata/sf0.01 to mirror the driver's t2 scale.
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="etl_asana_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()
