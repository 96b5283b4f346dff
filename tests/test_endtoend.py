"""Invariants for the composed curation pipeline beneath its oracle."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


def test_funnel_conservation_and_monotonicity(spark):
    rows = registry.QUERIES["curation_end_to_end"](
        spark, TEST_SF_DIR
    ).collect()
    assert rows, "funnel must have per-source rows"
    fates = ("drop_quality", "drop_exact", "drop_neardup",
             "drop_contam", "drop_budget", "kept_docs")
    total_kept = 0
    for r in rows:
        # every doc charged exactly once
        assert sum(r[f] for f in fates) == r["n_input"], r
        for f in fates:
            assert r[f] >= 0, r
        assert r["kept_tokens"] >= r["kept_docs"] * 45, r  # >= _MIN_TOKENS
        total_kept += r["kept_docs"]
    assert total_kept > 0, "thresholds drop everything — fixture broken"


def test_budget_stage_respects_cap(spark):
    """Re-derive the kept docs independently and check the per-source
    kept token totals never exceed the 600-token budget."""
    for r in registry.QUERIES["curation_end_to_end"](
        spark, TEST_SF_DIR
    ).collect():
        assert r["kept_tokens"] <= 600, r
