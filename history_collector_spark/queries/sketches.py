"""Sketch aggregates — HyperLogLog++ distinct counts and quantile
sketches over `events`.

These are the approximate, mergeable, bounded-memory aggregates a
100 TB rollup runs instead of exact distinct/percentile (exact distinct
shuffles every distinct value; a sketch shuffles KBs per partition).
Sketch values are implementation-specific, so there is NO DuckDB
oracle (the driver records the weaker rows-only check) — instead
tests/test_properties.py pins the relative error against the exact
answers at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


@register("sketch_aggregates")  # rows-only: sketch outputs are engine-specific
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias(
            "value_quantiles"
        ),
        F.count("*").alias("n_events"),
    )
