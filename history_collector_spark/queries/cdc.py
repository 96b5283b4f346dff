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


# ---------------------------------------------------------------------------
# Snapshot diff: field-level reconciliation between two table versions.
# ---------------------------------------------------------------------------


@register(
    "snapshot_diff_report",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 13 != 0
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 5.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    ), j AS (
      SELECT v1.o_orderkey AS k1, v2.o_orderkey AS k2,
             v1.o_orderstatus AS s1, v2.o_orderstatus AS s2,
             v1.o_totalprice AS p1, v2.o_totalprice AS p2
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT CAST(sum(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND (s1 != s2 OR p1 != p2)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND s1 = s2 AND p1 = p2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND s1 != s2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_status_diff,
           CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND p1 != p2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_price_diff
    FROM j
    """,
)
def snapshot_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row- and field-level diff between two snapshots of the same
    table (the nightly reconciliation a warehouse runs after a
    backfill): added / removed / changed / unchanged counts plus
    per-column change attribution. The second snapshot here is a
    deterministic synthetic revision of the first (status flip on
    keys % 11, price bump on % 7, deletes on % 13) so the report has
    every category; the operator is the full-outer key join.

    One full-outer shuffle on the key, collapsed straight to a 1-row
    scorecard by map-side partial sums — the report never materializes
    the joined table. At 100 TB both snapshot scans prune to exactly
    the compared columns (ReadSchema), and AQE handles the key skew.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderstatus").alias("s1"),
        F.col("o_totalprice").alias("p1"),
    )
    v2 = orders.select(
        F.col("o_orderkey").alias("k2"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("s2"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 5.0)
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
    )
    j = v1.join(v2, v1.k1 == v2.k2, "full_outer")
    both = F.col("k1").isNotNull() & F.col("k2").isNotNull()
    s_diff = F.col("s1") != F.col("s2")
    p_diff = F.col("p1") != F.col("p2")
    return j.agg(
        F.sum(F.when(F.col("k1").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("k2").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(both & (s_diff | p_diff), 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(both & ~s_diff & ~p_diff, 1).otherwise(0)).alias(
            "n_unchanged"
        ),
        F.sum(F.when(both & s_diff, 1).otherwise(0)).alias("n_status_diff"),
        F.sum(F.when(both & p_diff, 1).otherwise(0)).alias("n_price_diff"),
    )
