"""Relational core: projections, filters, lookups, counts, fan-out.

Covers SURVEY.md §2.2 (P1-P3, F1-F5), §2.5 (A1/A2, Q1-Q3), and §2.4 E4 on
the driver-provided TPC-H-ish tables. Every query is pure built-in Catalyst
expressions (no Python UDFs) so filters/projections push down to the
parquet scan and joins stay broadcast-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# Q1 flavor — per-account history: equality filter + join + order + limit.
# Reference: sample/main.py:19-34 (SELECT * FROM payments WHERE source=%s
# LIMIT %s). Generalized to customer order history; ORDER BY a unique key
# makes the LIMIT deterministic (the reference relies on Postgres heap order,
# which is not a semantics we want to copy).
# ---------------------------------------------------------------------------


@register(
    "account_history",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey = 7
    ORDER BY o.o_orderkey
    LIMIT 20
    """,
)
def account_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_custkey") == 7)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "c_name", "c_mktsegment",
        )
        .orderBy("o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 — point lookup by key (sample/main.py:37-48: WHERE hash=%s + fetchone).
# ---------------------------------------------------------------------------


@register(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders WHERE o_orderkey = 7
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # date_format mirrors the reference's strftime('%Y-%m-%d') on output
    # rows (sample/main.py:31,45).
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 7)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — count(*) with a time predicate
# (python/tests/test_postgres_storage_adapter.py:213-218).
# ---------------------------------------------------------------------------


@register(
    "count_filtered",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .agg(F.count("*").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# A2 — top-1 by time: ORDER BY time DESC LIMIT 1
# (python/tests/test_postgres_storage_adapter.py:78,157). Tie-broken on the
# unique event_id so the result is deterministic.
# ---------------------------------------------------------------------------


@register(
    "top1_latest",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "ts", "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# F1/F2 — type-tag filter + conjunctive null-safe predicate
# (python/main.py:160-164: body.type == 1 AND alphaNum4 IS NOT NULL AND
# assetCode='KIN' AND issuer=<const>). Modeled on orders/lineitem: a
# discriminator equality plus a conjunction of null-safe predicates.
# ---------------------------------------------------------------------------


@register(
    "typetag_asset_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus IS NOT NULL
      AND l_linestatus = 'F' AND l_quantity >= 25.0
    """,
)
def typetag_asset_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & F.col("l_linestatus").isNotNull()
        & (F.col("l_linestatus") == "F")
        & (F.col("l_quantity") >= 25.0)
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# F3 — app-id memo filter: rlike + split + equality (python/main.py:57-58,
# 142-148). The reference's `[A-z]` character class (not `[A-Za-z]`) is
# preserved deliberately — RE2 (DuckDB) and Java regex (Spark) agree on
# code-point ranges. Memo strings are derived deterministically from events.
# ---------------------------------------------------------------------------

APP_ID_REGEX = r"^1-[A-z0-9]{4}-.*"


@register(
    "appid_memo_filter",
    oracle="""
    WITH memos AS (
      SELECT event_id,
             concat('1-', substr(event_type, 1, 4), '-', CAST(user_id AS VARCHAR)) AS memo
      FROM events
    )
    SELECT event_id, memo, string_split(memo, '-')[2] AS app_id
    FROM memos
    WHERE regexp_matches(memo, '^1-[A-z0-9]{4}-.*')
      AND string_split(memo, '-')[2] = 'sign'
    """,
)
def appid_memo_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    memo = F.concat(
        F.lit("1-"), F.substring("event_type", 1, 4), F.lit("-"),
        F.col("user_id").cast("string"),
    )
    df = ev.select("event_id", memo.alias("memo"))
    app_id = F.split(F.col("memo"), "-")[1]
    return df.filter(
        F.col("memo").rlike(APP_ID_REGEX) & (app_id == "sign")
    ).select("event_id", "memo", app_id.alias("app_id"))


# ---------------------------------------------------------------------------
# F4 — null-safe optional-field fallback: coalesce(optional override, default)
# (python/main.py:172-176: op-level sourceAccount overrides tx-level).
# Modeled as: per-order source = first lineitem supplier if any line has
# l_returnflag='R' (the "override"), else the customer's nation default.
# ---------------------------------------------------------------------------


@register(
    "coalesce_override",
    oracle="""
    SELECT o.o_orderkey,
           coalesce(ov.override_supp, -1) AS effective_source
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, min(l_suppkey) AS override_supp
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    ) ov ON o.o_orderkey = ov.l_orderkey
    """,
)
def coalesce_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    overrides = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("override_supp"))
    )
    return (
        orders.join(overrides, orders.o_orderkey == overrides.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("override_supp"), F.lit(-1)).alias("effective_source"),
        )
    )


# ---------------------------------------------------------------------------
# F5 — conditional status extraction: when(present, x).otherwise(null)
# (python/main.py:157,169-170).
# ---------------------------------------------------------------------------


@register(
    "conditional_status",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'FINISHED'
                WHEN o_orderstatus = 'O' THEN 'OPEN'
                ELSE NULL END AS op_status,
           CASE WHEN o_totalprice > 100000 THEN round(o_totalprice, 0)
                ELSE NULL END AS big_price
    FROM orders
    """,
)
def conditional_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "FINISHED")
        .when(F.col("o_orderstatus") == "O", "OPEN")
        .otherwise(F.lit(None))
        .alias("op_status"),
        F.when(F.col("o_totalprice") > 100000, F.round("o_totalprice", 0))
        .otherwise(F.lit(None))
        .alias("big_price"),
    )


# ---------------------------------------------------------------------------
# P1-P3 — projection + rename + reorder to a fixed output schema
# (python/main.py:150-199; convert_* renames in
# python/adapters/postgres_storage_adapter.py:56-88). The payments-shaped
# projection: source/destination/amount/fee/.../time with renamed columns.
# ---------------------------------------------------------------------------


@register(
    "payments_projection",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS source,
           CAST(l_suppkey AS VARCHAR) AS destination,
           l_extendedprice AS amount,
           l_linenumber - 1 AS operation_index,
           CAST(round(o_totalprice * 0.001, 0) AS INT) AS fee,
           l_returnflag AS op_status,
           o_orderstatus AS tx_status,
           md5(concat(CAST(o_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))) AS hash,
           o_orderdate AS time
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l_linenumber <= 2
    """,
)
def payments_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    orders = table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return joined.select(
        F.col("o_custkey").cast("string").alias("source"),
        F.col("l_suppkey").cast("string").alias("destination"),
        F.col("l_extendedprice").alias("amount"),
        (F.col("l_linenumber") - 1).alias("operation_index"),
        F.round(F.col("o_totalprice") * 0.001, 0).cast("int").alias("fee"),
        F.col("l_returnflag").alias("op_status"),
        F.col("o_orderstatus").alias("tx_status"),
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"), F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hash"),
        F.col("o_orderdate").alias("time"),
    )


# ---------------------------------------------------------------------------
# E4 — tag-partitioned fan-out into two row kinds unioned with a `type`
# discriminator (the S3 adapter's own design,
# python/adapters/s3_storage_adapter.py:125,143-164).
# ---------------------------------------------------------------------------


@register(
    "fanout_union_type",
    oracle="""
    SELECT 'payment' AS type, o_orderkey AS id, o_totalprice AS amount
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'creation' AS type, o_orderkey AS id, o_totalprice AS amount
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def fanout_union_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    payments = orders.filter(F.col("o_orderstatus") == "O").select(
        F.lit("payment").alias("type"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    creations = orders.filter(F.col("o_orderstatus") == "F").select(
        F.lit("creation").alias("type"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    return payments.unionAll(creations)


# ---------------------------------------------------------------------------
# S2 — monotone file-sequence generation (python/main.py:205-228): next
# sequence = hex(int(seq,16)+64) zero-padded to 8, lowercase; validity
# (seq+1) % 64 == 0 (python/build_database.py:24-27). Expressed as a
# distributed sequence, not a driver loop.
# ---------------------------------------------------------------------------


@register(
    "file_sequence",
    oracle="""
    SELECT n,
           lpad(lower(to_hex(63 + 64 * n)), 8, '0') AS file_seq,
           ((63 + 64 * n) + 1) % 64 = 0 AS valid
    FROM (SELECT unnest(range(100)) AS n)
    """,
)
def file_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.range(0, 100).select(F.col("id").alias("n"))
    seq = 63 + 64 * F.col("n")
    return df.select(
        "n",
        F.lpad(F.lower(F.hex(seq)), 8, "0").alias("file_seq"),
        (((seq + 1) % 64) == 0).alias("valid"),
    )
