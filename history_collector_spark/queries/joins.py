"""Dedicated lookup-shaped joins — SURVEY.md §2.3 J1/J2.

The reference replaces relational joins with in-memory hash maps probed
per row: ledgerSeq -> closeTime (python/main.py:108-110,134) and
txHash -> result (python/main.py:113-123,138), both with left-outer
semantics (miss -> None). In Spark these are broadcast hash joins: the
build side is dimension-sized, so no shuffle touches the fact table —
the plan that survives a 1000-executor 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# J1 — seq -> close_time lookup, left-outer: the probe side keeps rows
# whose key is absent from the build side (timestamp=None on miss,
# python/main.py:134). Dim is filtered to force real misses.
# ---------------------------------------------------------------------------


@register(
    "broadcast_lookup_time",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, d.close_time
    FROM orders o
    LEFT JOIN (
      SELECT c_custkey, c_name AS close_time FROM customer WHERE c_custkey % 3 = 0
    ) d ON o.o_custkey = d.c_custkey
    """,
)
def broadcast_lookup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", F.col("c_name").alias("close_time"))
    )
    return orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "close_time")


# ---------------------------------------------------------------------------
# J2 — hash -> result lookup, left-outer on a computed key: the reference
# probes by tx hash string (python/main.py:138). Both sides derive the
# same md5 key; miss -> NULL status. Build side is an aggregate of the
# dim, still broadcast.
# ---------------------------------------------------------------------------


@register(
    "broadcast_lookup_result",
    oracle="""
    WITH keyed AS (
      SELECT md5(CAST(s_suppkey AS VARCHAR)) AS supp_hash,
             s_name AS result_name, s_nationkey
      FROM supplier WHERE s_nationkey < 13
    )
    SELECT l.l_orderkey, l.l_linenumber, k.result_name
    FROM lineitem l
    LEFT JOIN keyed k ON md5(CAST(l.l_suppkey AS VARCHAR)) = k.supp_hash
    """,
)
def broadcast_lookup_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    keyed = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 13)
        .select(
            F.md5(F.col("s_suppkey").cast("string")).alias("supp_hash"),
            F.col("s_name").alias("result_name"),
        )
    )
    probe_key = F.md5(F.col("l_suppkey").cast("string"))
    return li.join(
        F.broadcast(keyed), probe_key == keyed.supp_hash, "left"
    ).select("l_orderkey", "l_linenumber", "result_name")


# ---------------------------------------------------------------------------
# Semi/anti joins — absent from the reference but part of a complete
# engine surface (SURVEY §2.3 'Absent join types'): orders that have /
# lack a returned lineitem, with the filter pushed into the semi side.
# ---------------------------------------------------------------------------


@register(
    "semi_anti_join",
    oracle="""
    SELECT o_orderkey, 'has_return' AS kind FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    UNION ALL
    SELECT o_orderkey, 'no_return' AS kind FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    returned = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    semi = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    ).select("o_orderkey", F.lit("has_return").alias("kind"))
    anti = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_anti"
    ).select("o_orderkey", F.lit("no_return").alias("kind"))
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# Full outer reconciliation — the dual-sink audit query the reference's
# operators run by hand: which txs reached the payments sink, the
# results sink, or only one of them (S7's all-or-nothing promise means
# 'only one' rows are the bug signal). Completes the join-type family
# (inner/left/semi/anti/asof/range + full outer).
# ---------------------------------------------------------------------------


@register(
    "full_outer_reconcile",
    oracle="""
    WITH sink_a AS (
      SELECT o_orderkey AS k, o_totalprice AS a_price
      FROM orders WHERE o_orderkey % 7 != 0
    ), sink_b AS (
      SELECT o_orderkey AS k, o_totalprice AS b_price
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT coalesce(a.k, b.k) AS order_key,
           a.a_price, b.b_price,
           CASE WHEN a.k IS NULL THEN 'missing_in_a'
                WHEN b.k IS NULL THEN 'missing_in_b'
                ELSE 'both' END AS presence
    FROM sink_a a FULL OUTER JOIN sink_b b ON a.k = b.k
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: a shuffle full-outer hash join on the reconcile key
    (both sides are sink-sized — broadcasting either would be wrong);
    AQE handles skew. The presence column is computed from null-ness,
    so the query is one join + one projection.
    """
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("ak"), F.col("o_totalprice").alias("a_price")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("bk"), F.col("o_totalprice").alias("b_price")
    )
    return a.join(b, a.ak == b.bk, "full_outer").select(
        F.coalesce("ak", "bk").alias("order_key"),
        "a_price", "b_price",
        F.when(F.col("ak").isNull(), "missing_in_a")
        .when(F.col("bk").isNull(), "missing_in_b")
        .otherwise("both")
        .alias("presence"),
    )


# ---------------------------------------------------------------------------
# Salted skew-join, registered: events.user_id is a natural skew
# candidate (a viral user concentrates a key), so the enrich-join runs
# through functions.skew.salted_join — each key's rows scatter across 8
# salt partitions and the dimension side replicates 8x. The result is
# IDENTICAL to the plain join (salt is internal and dropped), which is
# exactly what the oracle asserts; what changes is the physical layout:
# no reducer ever owns a whole hot key. This is the manual lever for
# the case AQE's skew splitting cannot fix — a single key larger than
# one task's memory.
# ---------------------------------------------------------------------------


@register(
    "skew_salted_enrich",
    oracle="""
    SELECT e.user_id, c.c_nationkey AS nationkey,
           count(*) AS n_events, sum(e.value) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def skew_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from history_collector_spark.functions.skew import salted_join

    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "value"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    # force the shuffle-join path so the salt actually restructures the
    # exchange (broadcast would hide it — and at real skew scale the
    # dimension may not be broadcastable anyway)
    joined = salted_join(ev, cust.hint("shuffle_hash"), "k")
    return joined.groupBy(
        F.col("k").alias("user_id"), F.col("c_nationkey").alias("nationkey")
    ).agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
