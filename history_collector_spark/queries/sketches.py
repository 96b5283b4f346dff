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


@register("incremental_sketch_merge")  # rows-only: sketch bytes are engine-specific
def incremental_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch maintenance — the approximate twin of
    incremental_agg_merge: per-(event_type) DataSketches HLL sketches
    are built separately for the standing corpus and a late delta, then
    UNIONED (hll_union_agg) without touching raw data again. This is
    the property that makes sketches the 100 TB rollup currency: a
    day's sketch is built once, and any window/backfill recombines
    sketches in KBs. Output: merged estimate vs the exact distinct and
    the single-pass sketch estimate — the accuracy invariant
    (merged == single-pass, both within rsd of exact) is pinned in
    tests/test_properties.py.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.col("ts")
    )
    cut = F.lit("1970-01-08").cast("timestamp")

    base = ev.filter(F.col("ts") < cut).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    delta = ev.filter(F.col("ts") >= cut).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "merged_estimate"
            )
        )
    )
    single = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "single_pass_estimate"
        ),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return merged.join(single, "event_type").select(
        "event_type", "merged_estimate", "single_pass_estimate",
        "exact_distinct",
    )
