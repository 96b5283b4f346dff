"""Shared fixtures: one SparkSession and one DuckDB oracle connection.

Mirrors the driver's correctness gate (run Spark query + DuckDB oracle on
the same parquet, compare order-insensitively) at sf0.001 so the suite
stays fast. Modeled on the reference's session-scoped adapter fixtures
(python/tests/conftest.py:15-53).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.catalog import TABLES
from history_collector_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hcs-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(TEST_SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()
