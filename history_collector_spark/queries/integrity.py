"""Data-integrity audits and correlated-subquery analytics.

The reference trusts its ingest to keep orders/payments referentially
consistent (the Postgres schema has no FK constraints; python/main.py
writes parent and child rows in one transaction) — at warehouse scale
that trust needs a standing audit. These queries are the verification
surface: orphan-key audits, digit-distribution fraud checks (Benford),
and the classic correlated-subquery shapes (TPC-H Q2/Q17/Q18) that a
consumer of the collected history runs downstream.

Scale notes, per query, are in the docstrings; the common rules:
every global scalar (a corpus total, a global average) is a 1-row
aggregate broadcast back via ``crossJoin(F.broadcast(...))`` — never a
single-partition window; every correlated per-group bound (avg per
part, min per part) is an aggregate joined back on the SAME key its
source was just shuffled on, so Catalyst reuses the exchange instead
of shuffling twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan foreign keys across the schema.
# ---------------------------------------------------------------------------


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM lineitem c
    LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
      ON c.l_orderkey = p.k
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem c
    LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
      ON c.l_partkey = p.k
    UNION ALL
    SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem c
    LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
      ON c.l_suppkey = p.k
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders c
    LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
      ON c.o_custkey = p.k
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK counts for every parent/child relationship in the schema.

    Each branch is one left join (child keys vs distinct parent keys)
    collapsed straight into a 1-row count — the join shuffles on the FK
    like any key join, the aggregate is map-side partial, and the final
    result is 4 rows. No branch scans its child twice: presence is a
    joined marker, so total and orphan counts come from the same pass.
    At 100 TB the parent distinct is itself an aggregate (not a
    broadcast assumption) — both sides shuffle on the key, skew-safe
    under AQE.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")

    def audit(rel: str, child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
        pkeys = parent.select(F.col(pk).alias("k")).distinct().withColumn(
            "present", F.lit(1)
        )
        joined = child.select(F.col(fk).alias("k")).join(pkeys, "k", "left")
        return joined.agg(
            F.lit(rel).alias("relationship"),
            F.count("*").alias("n_child"),
            F.coalesce(F.sum(F.when(F.col("present").isNull(), 1).otherwise(0)), F.lit(0)).alias(
                "n_orphans"
            ),
        ).select("relationship", "n_child", "n_orphans")

    return (
        audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            audit("lineitem->part", li, "l_partkey", table(spark, sf_dir, "part"), "p_partkey")
        )
        .unionByName(
            audit(
                "lineitem->supplier",
                li,
                "l_suppkey",
                table(spark, sf_dir, "supplier"),
                "s_suppkey",
            )
        )
        .unionByName(
            audit(
                "orders->customer",
                orders,
                "o_custkey",
                table(spark, sf_dir, "customer"),
                "c_custkey",
            )
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit: price-distribution fraud smell test.
# ---------------------------------------------------------------------------


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice > 0
    ), counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts
    )
    SELECT digit, n,
           n / total AS frac,
           log10(1.0 + 1.0 / digit) AS benford_expected,
           abs(n / total - log10(1.0 + 1.0 / digit)) AS abs_dev
    FROM counts, tot
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic anomaly screen for fabricated monetary data.

    Digit extraction is pure arithmetic (floor/log10/pow, all codegen),
    the count is a 9-key aggregate, and the global total is a 1-row
    aggregate broadcast back — no single-partition window. The whole
    query is one scan of one pushed-down column at any scale.
    """
    orders = table(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).alias("digit")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(digit)
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("double").alias("total"))
    frac = F.col("n") / F.col("total")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            frac.alias("frac"),
            expected.alias("benford_expected"),
            F.abs(frac - expected).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: revenue lost to small-quantity orders, with the
# correlated per-part average decorrelated into an aggregate self-join.
# ---------------------------------------------------------------------------


@register(
    "small_qty_order_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT sum(l.l_extendedprice) / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN lim ON l.l_partkey = lim.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#13'
    WHERE l.l_quantity < lim.qty_lim
    """,
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (ref consumers run this against the collected history):
    average yearly revenue from lines whose quantity is below half the
    part's average.

    The correlated subquery `l_quantity < 0.5 * (SELECT avg ... WHERE
    same part)` decorrelates into a per-part aggregate joined back to
    lineitem ON THE KEY IT WAS JUST AGGREGATED ON — Catalyst reuses the
    l_partkey exchange for both sides, so the whole query costs one
    lineitem shuffle. The brand filter prunes `part` to ~1/25 before a
    broadcast join, never a shuffle of the fact table on a dim key.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_lim")
    )
    brand_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    return (
        li.join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .join(F.broadcast(brand_parts), "l_partkey")
        .agg(
            (F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING over a child aggregate),
# top-k by quantity with a deterministic tie-break.
# ---------------------------------------------------------------------------


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY big.sum_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed 250 total units.

    The HAVING collapses lineitem to qualifying orderkeys FIRST (one
    orderkey shuffle, map-side partial sums), so the joins see only the
    survivors — at 100 TB that's the difference between joining the
    full fact table and joining a few thousand rows. The survivor set
    joins orders on the same orderkey (exchange-compatible) and the
    customer dim last. Top-k is TakeOrderedAndProject (per-partition
    heaps, k rows to the driver), never a global sort; (sum_qty desc,
    o_orderkey) makes the cut deterministic.
    """
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: revenue concentration — groups whose share of GLOBAL
# revenue clears a threshold (HAVING against a broadcast scalar).
# ---------------------------------------------------------------------------


@register(
    "revenue_concentration",
    oracle="""
    WITH per AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_suppkey
    ), tot AS (
      SELECT sum(revenue) AS total FROM per
    )
    SELECT l_suppkey, revenue, revenue / total AS share
    FROM per, tot
    WHERE revenue > 0.012 * total
    """,
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's `HAVING sum(...) > fraction * (SELECT sum(...))`:
    suppliers carrying an outsized share of total revenue.

    The global total is a 1-row aggregate over the ALREADY-GROUPED
    per-supplier table (supplier-cardinality input, not a second fact
    scan) broadcast back via crossJoin — the decorrelated form of the
    scalar subquery, with no single-partition exchange and exactly one
    shuffle of lineitem on l_suppkey.
    """
    per = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    tot = per.agg(F.sum("revenue").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("revenue") > F.lit(0.012) * F.col("total"))
        .select("l_suppkey", "revenue", (F.col("revenue") / F.col("total")).alias("share"))
    )


# ---------------------------------------------------------------------------
# CUSUM change-point scan: where does each event type's hourly level
# shift hardest from its long-run mean?
# ---------------------------------------------------------------------------


@register(
    "cusum_changepoint",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             avg(value) AS hmean
      FROM events GROUP BY 1, 2
    ), centered AS (
      SELECT h.event_type, h.hr,
             h.hmean - m.type_mean AS dev
      FROM hourly h
      JOIN (SELECT event_type, avg(hmean) AS type_mean
            FROM hourly GROUP BY 1) m USING (event_type)
    ), cusum AS (
      SELECT event_type, hr,
             sum(dev) OVER (PARTITION BY event_type ORDER BY hr
                            ROWS UNBOUNDED PRECEDING) AS c
      FROM centered
    )
    SELECT event_type, hr AS change_hour, abs(c) AS max_abs_cusum
    FROM (
      SELECT event_type, hr, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(c) DESC, hr) AS rk
      FROM cusum
    ) WHERE rk = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: cumulative sum of
    hourly-mean deviations from the type's long-run mean; the hour where
    |CUSUM| peaks is the most likely level-shift point (Page 1954 —
    public method).

    The raw stream collapses to (type x hour) FIRST — bounded by the
    time range regardless of event volume — so the ordered window runs
    over a tiny series. The per-type mean is a type-cardinality
    aggregate joined back by broadcast. Event types are few, so the
    cumulative window has few partitions, but over hourly rollups, not
    raw events: the state is O(hours), not O(rows).
    """
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.avg("value").alias("hmean"))
    )
    type_mean = hourly.groupBy("event_type").agg(
        F.avg("hmean").alias("type_mean")
    )
    centered = hourly.join(F.broadcast(type_mean), "event_type").withColumn(
        "dev", F.col("hmean") - F.col("type_mean")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = centered.withColumn("c", F.sum("dev").over(wcum))
    wpick = Window.partitionBy("event_type").orderBy(F.desc(F.abs(F.col("c"))), "hr")
    return (
        cusum.withColumn("rk", F.row_number().over(wpick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hr").alias("change_hour"),
            F.abs("c").alias("max_abs_cusum"),
        )
    )
