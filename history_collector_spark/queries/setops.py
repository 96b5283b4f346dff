"""Set operations — INTERSECT / EXCEPT / UNION.

The reference has none of these (SURVEY.md §2.5 "Absent"); they come
free from Catalyst once exposed. Both compile to aggregate/join plans
that shuffle on the full row key — same scale posture as the semi/anti
join pair (queries/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


@register(
    "set_ops",
    oracle="""
    SELECT 'active' AS side, custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      INTERSECT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'inactive' AS side, custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers partitioned into with-orders (INTERSECT) and
    without-orders (EXCEPT), tagged and unioned."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    ordered = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    active = cust.intersect(ordered).select(
        F.lit("active").alias("side"), "custkey"
    )
    inactive = cust.subtract(ordered).select(
        F.lit("inactive").alias("side"), "custkey"
    )
    return active.unionByName(inactive)
