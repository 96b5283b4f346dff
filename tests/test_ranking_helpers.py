"""functions/ranking.py: the two-phase range rank / prefix-sum helpers
must agree EXACTLY with the single-task window formulation they
replace, for any grouping, and must never plan a window over an
unbounded low-cardinality partition."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from history_collector_spark.functions.ranking import (
    grouped_range_rank,
    grouped_range_prefix_sum,
)


@pytest.fixture(scope="module")
def frame(spark):
    import random

    rnd = random.Random(8)
    rows = [
        (i, rnd.choice(["a", "b", "c"]), rnd.randint(0, 50), rnd.randint(1, 9))
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "id long, grp string, val long, wt long"
    ).repartition(7)


def test_grouped_rank_matches_window(frame):
    got = (
        grouped_range_rank(
            frame, ["grp"], [F.col("val"), F.col("id")], rank_col="rk",
            n_parts=5,
        )
        .select("id", "rk")
        .collect()
    )
    w = Window.partitionBy("grp").orderBy("val", "id")
    exp = frame.select(
        "id", F.row_number().over(w).cast("long").alias("rk")
    ).collect()
    assert {r["id"]: r["rk"] for r in got} == {
        r["id"]: r["rk"] for r in exp
    }


def test_global_rank_matches_window(frame):
    got = grouped_range_rank(
        frame, [], [F.col("val").desc(), F.col("id")], rank_col="rk",
        n_parts=4,
    ).collect()
    w = Window.orderBy(F.col("val").desc(), "id")
    exp = frame.select(
        "id", F.row_number().over(w).cast("long").alias("rk")
    ).collect()
    assert {r["id"]: r["rk"] for r in got} == {
        r["id"]: r["rk"] for r in exp
    }


def test_grouped_prefix_sum_matches_window(frame):
    got = grouped_range_prefix_sum(
        frame, ["grp"], [F.col("id")], "wt", out_col="cw", n_parts=6
    ).collect()
    w = (
        Window.partitionBy("grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = frame.select("id", F.sum("wt").over(w).alias("cw")).collect()
    assert {r["id"]: r["cw"] for r in got} == {
        r["id"]: r["cw"] for r in exp
    }


def test_rank_unaffected_by_partition_count(frame):
    a = grouped_range_rank(
        frame, ["grp"], [F.col("val"), F.col("id")], rank_col="rk", n_parts=1
    ).collect()
    b = grouped_range_rank(
        frame, ["grp"], [F.col("val"), F.col("id")], rank_col="rk", n_parts=13
    ).collect()
    assert {r["id"]: r["rk"] for r in a} == {r["id"]: r["rk"] for r in b}


def test_helper_plans_have_no_unbounded_partition_window(frame):
    """Every Window in the helper's plan partitions by the range-slice
    id (bounded by the split) or orders the task-count-sized totals
    frame by it — the invariant tests/test_plan_guards.py enforces
    repo-wide."""
    df = grouped_range_rank(frame, ["grp"], [F.col("val"), F.col("id")])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__rr_pid" in plan
    df.rdd.count()
    phys = df._jdf.queryExecution().executedPlan().toString()
    # the broadcast of the offsets frame is explicit
    assert "Broadcast" in phys
