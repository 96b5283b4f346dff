"""As-of (time-travel) join — a custom operator Spark lacks natively.

Semantics: for each probe row, attach the most recent reference row at
or before its timestamp within the same key (here: each event gets the
latest prior 'signup' event of the same user).

A naive range join (l.ts >= r.ts with max) explodes quadratically at
scale. The scalable composition: union both streams with a side tag,
sort within the key partition by (ts, side) — reference rows first on
ties so 'at or before' is inclusive — and carry the reference forward
with last(..., ignorenulls=True). One shuffle on the key, linear work,
no pairwise expansion; this survives 100 TB where a range join cannot.

Oracle: DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


@register(
    "asof_join_last_signup",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, r.ts AS signup_ts, r.value AS signup_value
    FROM events p
    ASOF LEFT JOIN (
      SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
    ) r ON p.user_id = r.user_id AND p.ts >= r.ts
    """,
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    probe = ev.select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(None).cast("double").alias("ref_value"),
    )
    ref = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
        F.col("ts").alias("ref_ts"),
        F.col("value").alias("ref_value"),
    )
    merged = probe.unionByName(ref)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "event_id", "user_id", "ts", "side",
            F.last("ref_ts", ignorenulls=True).over(w).alias("signup_ts"),
            F.last("ref_value", ignorenulls=True).over(w).alias("signup_value"),
        )
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "signup_ts", "signup_value")
    )


@register(
    "asof_join_tolerance",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN signup_ts IS NOT NULL
                     AND ts - signup_ts <= INTERVAL 2 HOUR
                THEN signup_ts END AS recent_signup_ts,
           CASE WHEN signup_ts IS NOT NULL
                     AND ts - signup_ts <= INTERVAL 2 HOUR
                THEN signup_value END AS recent_signup_value
    FROM (
      SELECT p.event_id, p.user_id, p.ts, r.ts AS signup_ts,
             r.value AS signup_value
      FROM events p
      ASOF LEFT JOIN (
        SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
      ) r ON p.user_id = r.user_id AND p.ts >= r.ts
    )
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with max staleness (kdb `aj` tolerance / TimescaleDB
    interval): the matched reference must be within 2 hours, else NULL.

    Same single-shuffle union+carry-forward composition as
    asof_join_last_signup — the tolerance is a post-carry predicate, so
    the scale shape is unchanged (no range join, no pair expansion).
    """
    base = asof_join_last_signup(spark, sf_dir)
    fresh = F.col("signup_ts").isNotNull() & (
        F.col("ts").cast("long") - F.col("signup_ts").cast("long") <= 7200
    )
    return base.select(
        "event_id", "user_id", "ts",
        F.when(fresh, F.col("signup_ts")).alias("recent_signup_ts"),
        F.when(fresh, F.col("signup_value")).alias("recent_signup_value"),
    )
