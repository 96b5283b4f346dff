"""Round-15 optimization-phase focused tests.

Each test pins the internals an optimization changed:
- the ewma mapInPandas kernel's cross-batch carry path (a group that
  straddles an Arrow-batch boundary must continue its recursion
  exactly);
- catalog.spread() adds parallelism only when the scan is below the
  cluster's, and never changes row content.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.catalog import spread, table
from history_collector_spark.queries.timeseries import _EWMA_ALPHA, _ewma_batches
from tests.conftest import TEST_SF_DIR


def _frame(uids, vals):
    n = len(uids)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.asarray(uids, dtype="int64"),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "value": np.asarray(vals, dtype="float64"),
        }
    )


def _reference_ewma(pdf: pd.DataFrame) -> np.ndarray:
    """The pre-optimization per-group truth: one pandas ewm per group."""
    out = np.empty(len(pdf), dtype="float64")
    for uid, g in pdf.groupby("user_id", sort=False):
        out[g.index.to_numpy()] = (
            g["value"].ewm(alpha=_EWMA_ALPHA, adjust=False).mean().to_numpy()
        )
    return out


def test_ewma_kernel_single_batch_matches_per_group():
    pdf = _frame([1, 1, 1, 2, 2, 3], [10.0, 20.0, 5.0, 1.0, 2.0, 7.0])
    (res,) = list(_ewma_batches(iter([pdf])))
    np.testing.assert_array_equal(
        res["ewma"].to_numpy(), _reference_ewma(pdf)
    )


def test_ewma_kernel_group_straddles_batch_boundary_bit_exact():
    """Splitting one partition's rows into several Arrow batches must
    not change a single bit of the recursion: the carry-and-seed path
    is y = a*x + (1-a)*carry, exactly the next recursion step."""
    rng = np.random.RandomState(7)
    uids = np.repeat(np.arange(5), 40)  # sorted, as after the partition sort
    vals = rng.uniform(-100, 100, size=len(uids))
    pdf = _frame(uids, vals)
    whole = list(_ewma_batches(iter([pdf])))[0]["ewma"].to_numpy()
    for cut in (1, 37, 40, 41, 97, 199):
        parts = [
            pdf.iloc[i : i + cut].reset_index(drop=True)
            for i in range(0, len(pdf), cut)
        ]
        got = np.concatenate(
            [r["ewma"].to_numpy() for r in _ewma_batches(iter(parts))]
        )
        np.testing.assert_array_equal(got, whole, err_msg=f"cut={cut}")


def test_ewma_kernel_empty_batch_passthrough():
    pdf = _frame([1, 1], [3.0, 4.0])
    res = list(_ewma_batches(iter([pdf.iloc[0:0], pdf])))
    assert len(res[0]) == 0 and "ewma" in res[0].columns
    np.testing.assert_array_equal(
        res[1]["ewma"].to_numpy(), _reference_ewma(pdf)
    )


def test_spread_preserves_rows_and_only_adds_partitions(spark):
    base = table(spark, TEST_SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    out = spread(base, spark)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == max(
        target, base.rdd.getNumPartitions()
    )
    a = sorted(r.o_orderkey for r in base.collect())
    b = sorted(r.o_orderkey for r in out.collect())
    assert a == b


def test_spread_noop_when_scan_already_parallel(spark):
    df = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism + 3)
    assert spread(df, spark) is df


# ---------------------------------------------------------------------------
# Session table-metadata memo (catalog.table): the analyzed frame is
# reused within a session, refresh_tables() evicts, and distinct corpus
# dirs never share an entry.
# ---------------------------------------------------------------------------


def test_table_memo_reuses_frame_and_refresh_evicts(spark):
    from history_collector_spark import catalog

    catalog.refresh_tables(TEST_SF_DIR)
    a = table(spark, TEST_SF_DIR, "orders")
    b = table(spark, TEST_SF_DIR, "orders")
    assert a is b  # plan metadata cached, not rebuilt
    key = (spark.sparkContext.applicationId, TEST_SF_DIR, "orders")
    assert key in catalog._TABLE_CACHE
    catalog.refresh_tables(TEST_SF_DIR)
    assert key not in catalog._TABLE_CACHE
    c = table(spark, TEST_SF_DIR, "orders")
    assert c is not a  # rebuilt after evict
    assert c.schema == a.schema


def test_table_memo_keys_by_corpus_dir(spark, tmp_path):
    from history_collector_spark import catalog

    d = str(tmp_path / "corpus2")
    table(spark, TEST_SF_DIR, "nation").write.parquet(
        os.path.join(d, "nation.parquet")
    )
    first = table(spark, TEST_SF_DIR, "nation")
    second = table(spark, d, "nation")
    assert first is not second
    assert second.count() == first.count()
    catalog.refresh_tables(d)


# ---------------------------------------------------------------------------
# Window-free rewrites of the paired-eval family: the row-local
# array_sort top-k must keep the physical plan free of Window/Sort
# operators (the point of the rewrite) while the oracle parity tests
# pin the values.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "eval_win_rate_matrix",
        "eval_mcnemar_paired",
        "centroid_classifier_confusion",
        "bloom_membership_audit",
    ],
)
def test_rewritten_evals_have_no_window_operator(spark, name):
    from history_collector_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, TEST_SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert " Window " not in plan and "WindowExec" not in plan
