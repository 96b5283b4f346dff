"""Semantic invariants of the curation/analytics operators — properties
the oracle hash-match cannot express (it only proves Spark == DuckDB,
not that both are *right*). Each test states a law the operator must
satisfy on any input and checks it on the sf0.001 tables.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


def test_shard_assign_is_a_balanced_permutation(spark):
    """Every doc appears exactly once; positions within a shard are the
    contiguous range 1..len(shard); no shard is pathologically loaded
    (the hash route is uniform)."""
    pdf = registry.QUERIES["curation_shard_assign"](spark, TEST_SF_DIR).toPandas()
    n_docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").count()
    assert len(pdf) == n_docs
    assert pdf["doc_id"].is_unique
    for _, grp in pdf.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    sizes = pdf.groupby("shard").size()
    assert sizes.max() <= 4 * max(sizes.min(), 1)


def test_ngram_lm_probabilities_are_normalized(spark):
    """Conditionals lie in (0, 1] and reported continuations of a prefix
    never sum past 1 (they are a subset of the full distribution)."""
    pdf = registry.QUERIES["text_ngram_lm"](spark, TEST_SF_DIR).toPandas()
    assert ((pdf["prob"] > 0) & (pdf["prob"] <= 1 + 1e-9)).all()
    assert (pdf.groupby("prefix")["prob"].sum() <= 1 + 1e-9).all()
    assert (pdf["c"] >= 3).all()


def test_temperature_mix_conserves_corpus_mass(spark):
    """Weights form a distribution and the reweighted corpus keeps the
    original total size: sum(n_docs * sample_rate) == sum(n_docs)."""
    pdf = registry.QUERIES["curation_temperature_mix"](
        spark, TEST_SF_DIR
    ).toPandas()
    assert abs(pdf["weight"].sum() - 1.0) < 1e-9
    total = pdf["n_docs"].sum()
    assert abs((pdf["n_docs"] * pdf["sample_rate"]).sum() - total) < 1e-6 * total
    # alpha < 1 flattens: smallest source gets rate above the largest's
    smallest = pdf.loc[pdf["n_docs"].idxmin(), "sample_rate"]
    largest = pdf.loc[pdf["n_docs"].idxmax(), "sample_rate"]
    assert smallest >= largest


def test_cohort_retention_peaks_at_week_zero(spark):
    """Week 0 contains the whole cohort, so no later week of the same
    cohort can exceed it; week_k is never negative."""
    pdf = registry.QUERIES["cohort_retention"](spark, TEST_SF_DIR).toPandas()
    assert (pdf["week_k"] >= 0).all()
    for _, grp in pdf.groupby("cohort"):
        base = grp.loc[grp["week_k"] == 0, "n_active"]
        assert len(base) == 1
        assert (grp["n_active"] <= base.iloc[0]).all()


def test_resample_copies_match_rates(spark):
    """Each doc yields floor(rate) or ceil(rate) contiguous copies for
    its source's temperature rate, and (doc_id, copy) never repeats."""
    import math

    rates = {
        r["source"]: r["sample_rate"]
        for r in registry.QUERIES["curation_temperature_mix"](
            spark, TEST_SF_DIR
        ).collect()
    }
    pdf = registry.QUERIES["curation_resample"](spark, TEST_SF_DIR).toPandas()
    assert not pdf.duplicated(["doc_id", "copy"]).any()
    for (doc, src), grp in pdf.groupby(["doc_id", "source"]):
        n = len(grp)
        assert sorted(grp["copy"]) == list(range(n))
        assert n in (math.floor(rates[src]), math.ceil(rates[src]))
