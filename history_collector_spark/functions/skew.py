"""Skew and co-location utilities — the manual levers for the cases
AQE cannot fix alone (SURVEY.md §4; brief: "salting for skew,
bucketing for co-located joins").

- salted_join: for a shuffle join whose LEFT side has pathological hot
  keys, explode the right side SALT ways and scatter the left side's
  rows uniformly across the salt space. Each hot key's rows spread
  over SALT reducers instead of one straggler. Results are identical
  to the plain join (the salt is internal and dropped).
- bucketed joins: write both sides bucketed by the join key
  (write_bucketed); joins between them skip the shuffle entirely —
  assert_no_shuffle_join proves it from the physical plan.

AQE's skew-join splitting handles most runtime skew; salting remains
the answer when one key alone exceeds what a single task may hold, or
in aggregations where AQE cannot split a group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join `left` (skewed) with `right` on column `on`, spreading
    each key across `salt` partitions. `right` is replicated `salt`
    times — keep it the smaller side. Only inner/left joins are sound
    (an outer arm on the replicated side would duplicate its misses)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_left = left.withColumn(
        _SALT, (F.rand(seed=42) * salt).cast("int")
    )
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, [on, _SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 16
) -> None:
    """Persist a table bucketed+sorted by the join key; subsequent
    equi-joins between same-bucketed tables need no exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


def has_shuffle(df: DataFrame) -> bool:
    """Inspect the physical plan for exchanges (test/diagnostic aid)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
