"""Flatten/explode operators — SURVEY.md §2.4 (E1-E3) and §2.3 J3.

The reference's core reshaping is nested-record flattening
(python/main.py:133-155): tx-set arrays explode into transactions,
transactions explode into operations *with ordinal* (op_index from 0,
README.md:10), and the i-th operation positionally zips with the i-th
op-result (python/main.py:155) where the result array may be shorter
(failed txs) — zip truncates, guarded by a truthiness check
(python/main.py:157,169).

Here we build the nested shape from flat tables with
``sort_array(collect_list(struct(...)))`` (deterministic order — structs
sort lexicographically and the leading field is unique per group), then
flatten it back with ``explode``/``posexplode``/``arrays_zip``. At scale
the groupBy is one shuffle on the natural key and the explode is
pipeline-local (no further shuffle), so the pattern holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# E1 — explode tx-set -> transactions (python/main.py:133-136): the parent
# key (ledgerSeq there, l_orderkey here) is carried through the explode.
# ---------------------------------------------------------------------------


@register(
    "explode_txset",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_partkey AS partkey, l_quantity AS quantity
    FROM lineitem
    """,
)
def explode_txset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
        ).alias("txs")
    )
    return nested.select(
        F.col("l_orderkey").alias("orderkey"), F.explode("txs").alias("tx")
    ).select(
        "orderkey",
        F.col("tx.l_linenumber").alias("linenumber"),
        F.col("tx.l_partkey").alias("partkey"),
        F.col("tx.l_quantity").alias("quantity"),
    )


# ---------------------------------------------------------------------------
# E2 — posexplode with ordinal: op_index counts from 0 within each parent
# (python/main.py:155 enumerate; README.md:10).
# ---------------------------------------------------------------------------


@register(
    "posexplode_opindex",
    oracle="""
    SELECT l_orderkey AS orderkey,
           CAST(row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber, l_partkey) - 1 AS INT)
             AS op_index,
           l_linenumber AS linenumber, l_partkey AS partkey
    FROM lineitem
    """,
)
def posexplode_opindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))).alias("ops")
    )
    return nested.select(
        F.col("l_orderkey").alias("orderkey"),
        F.posexplode("ops").alias("op_index", "op"),
    ).select(
        "orderkey",
        "op_index",
        F.col("op.l_linenumber").alias("linenumber"),
        F.col("op.l_partkey").alias("partkey"),
    )


# ---------------------------------------------------------------------------
# E3 — explode result-set -> tx-results (python/main.py:118-122), on the
# events table: per-user result arrays flattened back out.
# ---------------------------------------------------------------------------


@register(
    "explode_resultset",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM events
    """,
)
def explode_resultset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    nested = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("event_id", "event_type", "value"))
        ).alias("results")
    )
    return nested.select("user_id", F.explode("results").alias("r")).select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.value").alias("value"),
    )


# ---------------------------------------------------------------------------
# J3 — positional zip-join of parallel arrays (python/main.py:155,157):
# i-th operation pairs with i-th op-result; the result array may be
# SHORTER. Python's zip truncates; arrays_zip null-pads — the
# when(isNotNull) guard reproduces the reference's truthiness guard so
# both semantics agree (SURVEY §2.3 J3, §7 hard-part 3), and the
# null-padded rows are *retained* with a NULL status (failed ops are
# data, not discards — python/adapters/s3_storage_adapter.py:180-185).
# ---------------------------------------------------------------------------


@register(
    "zip_join_oppairs",
    oracle="""
    WITH ops AS (
      SELECT l_orderkey, l_partkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey) - 1 AS rn
      FROM lineitem
    ), res AS (
      SELECT l_orderkey, l_returnflag,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_returnflag) - 1 AS rn
      FROM lineitem WHERE l_linenumber <= 3
    )
    SELECT o.l_orderkey AS orderkey, CAST(o.rn AS INT) AS op_index,
           o.l_partkey AS partkey, r.l_returnflag AS op_status
    FROM ops o LEFT JOIN res r ON o.l_orderkey = r.l_orderkey AND o.rn = r.rn
    """,
)
def zip_join_oppairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))).alias("ops"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("l_linenumber") <= 3,
                    F.struct("l_linenumber", "l_returnflag"),
                )
            )
        ).alias("results"),
    )
    zipped = nested.select(
        F.col("l_orderkey").alias("orderkey"),
        F.posexplode(F.arrays_zip("ops", "results")).alias("op_index", "z"),
    )
    return zipped.select(
        "orderkey",
        "op_index",
        F.col("z.ops.l_partkey").alias("partkey"),
        F.when(
            F.col("z.results").isNotNull(), F.col("z.results.l_returnflag")
        ).alias("op_status"),
    )
