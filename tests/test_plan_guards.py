"""Plan-level invariants over EVERY registered query — the automated
version of the .explain() audit:

- no row-at-a-time Python UDFs (BatchEvalPython) anywhere: Python in
  the row path must go through Arrow (ArrowEvalPython / mapInPandas);
- no cartesian products: all-pairs shapes must be broadcast nested
  loop (bounded build side) or mapInPandas, never CartesianProduct;
- no unbounded single-partition exchange: a global window/sort over
  full-cardinality data serializes the whole input through one task.
  `Exchange SinglePartition` is allowed only when fed by a limit
  (TakeOrderedAndProject / CollectLimit), i.e. k rows.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()

ALL_NAMES = sorted(registry.QUERIES)


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, TEST_SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_row_at_a_time_python(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use Arrow "
        "(pandas_udf / mapInPandas) instead"
    )


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in plan — bound one side (broadcast) "
        "or bucket the candidates"
    )


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_unbounded_single_partition_exchange(spark, name):
    # plan strings print sinks first, so a SinglePartition exchange's
    # INPUT (upstream operators) appears on the lines after it
    lines = _plan(spark, name).splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        upstream = "\n".join(lines[i + 1:])
        assert (
            "TakeOrderedAndProject" in upstream
            or "Limit" in upstream
            # global agg: the exchange moves one partial row per input
            # partition, not the data
            or "partial_" in upstream
        ), (
            f"{name}: Exchange SinglePartition over unbounded input — "
            "a global window/sort of the full data; use orderBy+limit "
            "(TakeOrderedAndProject) or partition the window"
        )


def test_partitioned_roundtrip_prunes_partitions(spark):
    """The lang='de' read over the partitioned sink must resolve at the
    DIRECTORY level (PartitionFilters on the scan), not as a post-scan
    data filter — at 100 TB this is the difference between listing one
    partition and scanning the corpus."""
    df = registry.QUERIES["sink_partitioned_roundtrip"](spark, TEST_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in scan:\n{plan}"
    assert "lang" in m.group(1) and "de" in m.group(1), (
        f"lang=de not pushed to partition pruning: {m.group(1)}"
    )
    # and the data filters must NOT re-check lang (nothing to scan)
    dm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if dm:
        assert "lang" not in dm.group(1)


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed fact-fact join: with broadcast disabled (at real
    scale neither fact side fits in memory), the sort-merge join AND
    the same-key aggregation above it must run directly on the bucket
    layout — zero Exchange operators; that's the point of paying the
    bucketed write. At tiny SF Catalyst is free to broadcast instead
    (and does), which is also correct — so the guard pins the
    at-scale plan explicitly."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry.QUERIES["bucketed_join_roundtrip"](spark, TEST_SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert plan.count("Bucketed: true") == 2, plan


def test_star_schema_joins_are_all_hash_no_shuffle_of_dims(spark):
    """Q5-shape: every join is a broadcast hash join (at sf0.001 even
    orders broadcasts — fine); the only allowed hashpartitioning
    exchange is the final small aggregation, never a join input, and
    the status filter reaches the orders scan."""
    df = registry.QUERIES["star_schema_revenue"](spark, TEST_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") == 1, plan
    assert "EqualTo(o_orderstatus,F)" in plan, "status filter not pushed"


def test_projection_prunes_scan_columns(spark):
    """Column pruning must reach the parquet scan: a projection query
    reads ONLY the columns it outputs or filters on — a scan that
    drags the whole schema pays full I/O at 100 TB for nothing. The
    FileScan operator prints its pruned column list in brackets."""
    import re as _re

    cases = {
        # query -> columns that must NOT be read by any scan
        "payments_projection": ("o_orderpriority",),
        "count_filtered": ("o_orderdate", "o_totalprice"),
        "star_schema_revenue": ("l_quantity", "l_shipdate", "c_name"),
        "text_token_stats": ("source", "n_chars"),
    }
    for name, banned in cases.items():
        plan = _plan(spark, name)
        scans = _re.findall(r"FileScan \w+ \[([^\]]*)\]", plan)
        assert scans, f"{name}: no FileScan in plan"
        read = ",".join(scans)
        for col in banned:
            assert col not in read, (
                f"{name}: scan reads unused column {col!r}: {read}"
            )


def test_q6_predicates_reach_the_scan(spark):
    """forecast_revenue_change is scan-filter-aggregate: the discount
    band and quantity cap must appear in the scan's PushedFilters, and
    ReadSchema must prune to the four referenced columns (formatted
    explain — the plan toString truncates scan metadata)."""
    import re

    df = registry.QUERIES["forecast_revenue_change"](spark, TEST_SF_DIR)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs, plan
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }, cols


def test_q10_top20_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "returned_item_report")
    assert "TakeOrderedAndProject" in plan, plan
