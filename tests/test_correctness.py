"""Every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate so regressions surface in
pytest before a round ends. Queries without an oracle get a weaker
runs-and-returns-rows check (same as the driver).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR
from tests.oracle_compare import assert_frames_match

registry.load_all()

ALL_NAMES = sorted(registry.QUERIES)


def test_registry_nonempty():
    assert len(registry.QUERIES) >= 11
    # every oracle key must have a query
    assert set(registry.ORACLES) <= set(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(name, spark, duck):
    sdf = registry.QUERIES[name](spark, TEST_SF_DIR).toPandas()
    if name not in registry.ORACLES:
        assert sdf is not None  # rows-only check: it ran
        return
    odf = duck.sql(registry.ORACLES[name]).df()
    assert_frames_match(sdf, odf, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
