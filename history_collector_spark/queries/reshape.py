"""Reshaping / multi-dimensional aggregation — pivot, cube, exact
percentiles, deterministic stratified sampling.

All absent from the reference (SURVEY.md §2.5 "Absent"), all native
Catalyst once exposed. Pivot values are pinned explicitly so the plan
never needs the extra distinct-collection job; cube is one pass with
grouping-set expansion (map-side combined); the stratified sample uses
a deterministic hash-mod predicate so it both pushes down to the scan
and reproduces exactly in the oracle (`sampleBy` is the probabilistic
variant — not oracle-comparable by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import md5_hash32
from history_collector_spark.registry import register

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id % 10 AS cohort,
           {", ".join(
             f"count(*) FILTER (event_type = '{t}') AS n_{t}"
             for t in _EVENT_TYPES
           )}
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot leaves NULL for empty cells; the oracle's FILTER count gives 0
    return pivoted.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, sum(o_totalprice) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("total")
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.75) AS p75,
           min(value) AS lo, max(value) AS hi
    FROM events GROUP BY event_type
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 10 = 0
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% per stratum via a deterministic hash-mod on the key — the
    reproducible form of df.sampleBy('lang', fractions)."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(
        md5_hash32(F.col("doc_id").cast("string")) % 10 == 0
    ).select("doc_id", "lang")
