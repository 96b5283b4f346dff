"""Change-data-capture compaction — last-write-wins upsert semantics.

The reference's sink is append-only (each ledger lands once, S6/S7);
a lakehouse ingest additionally needs the MERGE/compaction view: when
the same business key arrives multiple times (retries, corrections,
out-of-order replays), readers must see only the LATEST version per
key. Expressed declaratively as one per-key window top-1 ordered by
(event time, tiebreaker id) — the compaction pass Delta/Iceberg MERGE
runs under the hood, restated as a pure query so it needs no table
format.

Scale shape: one shuffle on the business key (user_id, event_type —
high-cardinality), per-partition sort bounded by versions-per-key;
row_number short-circuits (rank 1 kept) so nothing but the winners
survives the window. At 100 TB this is the standard "read-optimize a
CDC stream" plan; AQE handles retry-storm key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


@register(
    "cdc_last_write_wins",
    oracle="""
    SELECT user_id, event_type, ts AS latest_ts, value AS latest_value,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM (
      SELECT user_id, event_type, ts, value,
             count(*) OVER (PARTITION BY user_id, event_type) AS n_versions,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wcnt = Window.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count("*").over(wcnt))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
    )
