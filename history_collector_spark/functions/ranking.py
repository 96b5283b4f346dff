"""Scale-safe distributed ranking / prefix sums.

A plain ``row_number() OVER (PARTITION BY low_card_key ORDER BY ...)``
(or a global ``ORDER BY`` window) funnels every row of a partition
through ONE task's sort — the classic 100 TB killer shape the ntile
rewrites of round 8 removed. These helpers compute the identical rank /
running-sum semantics in two bounded phases:

1. range-partition on ``group_cols + order_cols`` (so, within a group,
   partition id is monotone in the sort order) and compute LOCAL ranks /
   prefix sums per ``(task, group)`` slice — each slice is one range
   split, never a whole group;
2. aggregate per-slice totals to a tiny ``(n_tasks x n_groups)`` frame,
   prefix-sum THAT (the only unbounded-window sort left runs over
   task-count x group-count rows), and broadcast the offsets back.

Ranks are deterministic as long as the caller's order columns form a
total order within each group (include a unique tiebreaker, exactly as
a window version would need). Range split boundaries are sample-based
and therefore not deterministic — but any boundary placement yields the
same ranks, because offsets are computed from the actual slice contents.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rr_pid"
_LOCAL = "__rr_local"
_OFFSET = "__rr_offset"


def _ranged(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    n_parts: Optional[int],
) -> DataFrame:
    if n_parts:
        n = n_parts
    else:
        # spark.sql.shuffle.partitions may be non-numeric (e.g. "auto"
        # under some AQE configurations) — fall back rather than fail.
        try:
            n = int(
                df.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "32"
                )
            )
        except (TypeError, ValueError):
            n = df.sparkSession.sparkContext.defaultParallelism or 32
    keys = [F.col(c) for c in group_cols] + list(order_cols)
    return df.repartitionByRange(n, *keys).withColumn(
        _PID, F.spark_partition_id()
    )


def _with_offsets(
    local: DataFrame,
    group_cols: Sequence[str],
    totals: DataFrame,
) -> DataFrame:
    """Exclusive prefix-sum of per-(task, group) totals along the task
    axis, broadcast back. `totals` has columns [_PID, *group_cols, _c]."""
    w = (
        Window.partitionBy(*group_cols).orderBy(_PID)
        if group_cols
        else Window.orderBy(_PID)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *group_cols,
        F.coalesce(F.sum("_c").over(w), F.lit(0)).alias(_OFFSET),
    )
    return local.join(F.broadcast(offsets), [_PID, *group_cols])


def grouped_range_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    rank_col: str = "rank",
    n_parts: Optional[int] = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY group_cols ORDER BY order_cols)``
    without any per-group single-task sort. ``group_cols`` may be empty
    for a global rank. ``order_cols`` must totally order each group."""
    parts = _ranged(df, group_cols, order_cols, n_parts)
    wloc = Window.partitionBy(_PID, *group_cols).orderBy(*order_cols)
    local = parts.withColumn(_LOCAL, F.row_number().over(wloc))
    totals = parts.groupBy(_PID, *group_cols).agg(F.count("*").alias("_c"))
    return (
        _with_offsets(local, group_cols, totals)
        .withColumn(rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def grouped_range_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    weight_col: str | Sequence[str],
    out_col: str | Sequence[str] = "prefix_sum",
    n_parts: Optional[int] = None,
) -> DataFrame:
    """INCLUSIVE running ``sum(weight_col)`` in ``order_cols`` order per
    group — the distributed form of
    ``sum(w) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)``.
    Subtract the row's own weight for the exclusive form.

    ``weight_col``/``out_col`` accept parallel sequences to compute
    SEVERAL running sums in the same order in ONE pass. Prefer that
    over chaining two calls: each call samples fresh range boundaries,
    and chaining puts a join between the two range exchanges, which
    can defeat physical exchange reuse — the two consumers of a range
    split must see the SAME boundary placement for the offsets to be
    consistent (observed live as a nondeterministic KS statistic; one
    call per ordering is also simply cheaper)."""
    wcols = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(wcols) == len(ocols)
    parts = _ranged(df, group_cols, order_cols, n_parts)
    wloc = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts
    for i, w in enumerate(wcols):
        local = local.withColumn(f"{_LOCAL}_{i}", F.sum(w).over(wloc))
    totals = parts.groupBy(_PID, *group_cols).agg(
        *[F.sum(w).alias(f"_c_{i}") for i, w in enumerate(wcols)]
    )
    woff = (
        Window.partitionBy(*group_cols).orderBy(_PID)
        if group_cols
        else Window.orderBy(_PID)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *group_cols,
        *[
            F.coalesce(F.sum(f"_c_{i}").over(woff), F.lit(0)).alias(
                f"{_OFFSET}_{i}"
            )
            for i in range(len(wcols))
        ],
    )
    out = local.join(F.broadcast(offsets), [_PID, *group_cols])
    for i, oc in enumerate(ocols):
        out = out.withColumn(
            oc, F.col(f"{_OFFSET}_{i}") + F.col(f"{_LOCAL}_{i}")
        )
    return out.drop(
        _PID,
        *[f"{_LOCAL}_{i}" for i in range(len(wcols))],
        *[f"{_OFFSET}_{i}" for i in range(len(wcols))],
    )
