"""Aggregations, top-N-per-group, rollups — SURVEY.md §2.5 extensions.

The reference's query surface only counts and takes top-1
(python/tests/test_postgres_storage_adapter.py:213-218,78,157); a real
analytics engine needs the full groupBy family. Every aggregate here is
partial-aggregatable (map-side combine before the shuffle) and keeps
the plan inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.ranking import (
    grouped_range_prefix_sum,
    grouped_range_rank,
)
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: wide agg with computed inputs; the
# canonical map-side-combine workload at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "group_agg_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def group_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).alias("sum_disc_price"),
        F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Top-N per group (A2 generalized): latest 3 events per user. Window
# row_number + filter — Spark runs this as a partial top-N sort within
# partitions when the window is rank-limited.
# ---------------------------------------------------------------------------


@register(
    "topn_per_group",
    oracle="""
    SELECT user_id, event_id, ts, rank FROM (
      SELECT user_id, event_id, ts,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INT)
               AS rank
      FROM events
    ) WHERE rank <= 3
    """,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id", "event_id", "ts", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Distinct counting: exact per-group distinct (expands to two-phase agg).
# ---------------------------------------------------------------------------


@register(
    "distinct_count",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup: subtotals + grand total in one pass (GROUPING SETS under the
# hood — one shuffle, expand-side combine).
# ---------------------------------------------------------------------------


@register(
    "rollup_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           sum(o_totalprice) AS total_price,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group linear regression: value-vs-time trend per event type via
# the built-in regression aggregates (regr_slope & co are
# partial-aggregatable sufficient statistics — sums and cross-products
# — so this is one map-side-combined shuffle on a 5-value key, same
# cost as a count).
# ---------------------------------------------------------------------------


@register(
    "regression_per_type",
    oracle="""
    SELECT event_type,
           regr_slope(value, epoch_us(ts) / 1e6) AS slope,
           regr_intercept(value, epoch_us(ts) / 1e6) AS intercept,
           corr(value, epoch_us(ts) / 1e6) AS r,
           CAST(regr_count(value, epoch_us(ts) / 1e6) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def regression_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") / F.lit(1e6)).alias("x")
    return ev.select("event_type", F.col("value"), x).groupBy("event_type").agg(
        F.regr_slope("value", "x").alias("slope"),
        F.regr_intercept("value", "x").alias("intercept"),
        F.corr("value", "x").alias("r"),
        F.regr_count("value", "x").alias("n"),
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection: flag events whose value deviates > 3
# sigma from their event type's mean. Two-pass shape — a tiny per-type
# stats aggregate broadcast back over the scan — never a whole-table
# window (a window over event_type would sort 100 TB on a 5-value
# maximally-skewed key).
# ---------------------------------------------------------------------------


@register(
    "anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mu) / s.sigma AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


@register(
    "table_profile",
    oracle="""
    SELECT 'o_orderkey' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS vmin,
           CAST(max(o_orderkey) AS DOUBLE) AS vmax
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE),
           CAST(max(o_totalprice) AS DOUBLE)
    FROM orders
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (rows / non-null / distinct /
    min / max per column) computed in ONE scan: all per-column
    aggregates ride a single global aggregation (map-side combined,
    one partial row per partition), then unpivot to a row per column —
    never one scan per column. Exact distinct is the honest profiler
    default; the sketch twin (approx_count_distinct) is what a 100 TB
    profile would swap in, query `sketch_aggregates`."""
    o = table(spark, sf_dir, "orders")
    cols = ("o_orderkey", "o_custkey", "o_totalprice")
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nonnull").alias("n_nonnull"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("vmin"),
                F.col(f"{c}__max").alias("vmax"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select(
        "p.col", "p.n_rows", "p.n_nonnull", "p.n_distinct", "p.vmin",
        "p.vmax",
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS freq,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    scored AS (
      SELECT o_custkey,
             CASE WHEN date_diff('day', last_order, a.maxd) <= 30 THEN 'R1'
                  WHEN date_diff('day', last_order, a.maxd) <= 90 THEN 'R2'
                  ELSE 'R3' END AS r_band,
             CASE WHEN freq >= 20 THEN 'F1'
                  WHEN freq >= 10 THEN 'F2' ELSE 'F3' END AS f_band,
             CASE WHEN monetary >= 100000 THEN 'M1'
                  WHEN monetary >= 20000 THEN 'M2' ELSE 'M3' END AS m_band
      FROM per_cust, anchor a
    )
    SELECT r_band, f_band, m_band,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r_band, f_band, m_band
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: one o_custkey aggregation produces recency /
    frequency / monetary, the corpus max-date rides a 1-row broadcast
    (the two-pass scalar pattern), and fixed band thresholds reduce to
    a 27-cell segment count — the whole report is two bounded
    aggregations over one scan."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.when(F.datediff(F.col("maxd"), F.col("last_order")) <= 30, "R1")
        .when(F.datediff(F.col("maxd"), F.col("last_order")) <= 90, "R2")
        .otherwise("R3")
        .alias("r_band"),
        F.when(F.col("freq") >= 20, "F1")
        .when(F.col("freq") >= 10, "F2")
        .otherwise("F3")
        .alias("f_band"),
        F.when(F.col("monetary") >= 100000, "M1")
        .when(F.col("monetary") >= 20000, "M2")
        .otherwise("M3")
        .alias("m_band"),
    )
    return scored.groupBy("r_band", "f_band", "m_band").agg(
        F.count("*").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of per-customer order counts, with the
# defining twist that the predicate lives in the OUTER join's ON clause
# (customers whose only orders are urgent must still appear with 0).
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
    WITH c AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two cascading aggregations: per-customer order count (custkey
    shuffle — at scale the orders side pre-aggregates map-side before
    the join key exchange), then the tiny count-of-counts. The priority
    filter is part of the LEFT JOIN condition, not a WHERE — pushing it
    to WHERE would silently drop zero-order customers, the classic Q13
    trap; Catalyst still pushes it down to the orders SCAN because it
    only references the preserved-null side's input."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Contribution analysis: each nation's revenue as a share of its region
# and of the world — percent-of-total over the dimensional rollup.
# ---------------------------------------------------------------------------


@register(
    "revenue_contribution",
    oracle="""
    WITH rev AS (
      SELECT n.n_name, r.r_name, sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT n_name, r_name, revenue,
           revenue / sum(revenue) OVER (PARTITION BY r_name)
             AS share_of_region,
           revenue / sum(revenue) OVER () AS share_of_total
    FROM rev
    """,
)
def revenue_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation with region and global shares. The fact-side
    join keys on custkey (orders pre-aggregation would need the
    nation, so the join comes first; customer/nation/region broadcast
    — dims always fit); after the nation-bounded aggregate, BOTH
    window sums run over a ~25-row frame, so the single-partition
    exchange the global share needs moves partial-aggregated rows,
    never data."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "n_name",
        "r_name",
        "revenue",
        (F.col("revenue") / F.sum("revenue").over(w_region)).alias(
            "share_of_region"
        ),
        (F.col("revenue") / F.sum("revenue").over(w_all)).alias(
            "share_of_total"
        ),
    )


# ---------------------------------------------------------------------------
# Key-skew report: the distribution of per-key row counts on the
# events.user_id shuffle key — the number every partitioning decision
# (salting, AQE skew thresholds, bucket counts) is made from.
# ---------------------------------------------------------------------------


@register(
    "key_skew_report",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_count,
           avg(1.0 * cnt) AS avg_count,
           max(cnt) / avg(1.0 * cnt) AS skew_ratio,
           quantile_cont(cnt, 0.5) AS p50_count,
           quantile_cont(cnt, 0.99) AS p99_count
    FROM c
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row skew profile of the user_id key: key cardinality,
    max/avg ratio (the salting trigger), and exact p50/p99 of per-key
    counts (linear interpolation — quantile_cont semantics, matching
    percentile()). The per-key count is a map-side-combined aggregate;
    the summary is a 1-row reduce over the KEYS-sized table, which is
    orders of magnitude smaller than the data. percentile() buffers
    the key-count column per group — fine while keys fit an executor;
    at billions of keys swap in approx_percentile, same plan shape."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    return c.agg(
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_count"),
        F.avg(F.lit(1.0) * F.col("cnt")).alias("avg_count"),
        (F.max("cnt") / F.avg(F.lit(1.0) * F.col("cnt"))).alias("skew_ratio"),
        F.percentile(F.col("cnt"), F.lit(0.5)).alias("p50_count"),
        F.percentile(F.col("cnt"), F.lit(0.99)).alias("p99_count"),
    )


# ---------------------------------------------------------------------------
# Winsorized robust stats: clamp each type's values to its own
# [P5, P95] before mean/std — the outlier-robust summary a quality
# pipeline feeds thresholds from.
# ---------------------------------------------------------------------------


@register(
    "robust_stats_winsorized",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p5,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY 1
    ), w AS (
      SELECT e.event_type,
             least(greatest(e.value, q.p5), q.p95) AS wv
      FROM events e JOIN q ON e.event_type = q.event_type
    )
    SELECT w.event_type, CAST(count(*) AS BIGINT) AS n,
           avg(wv) AS win_mean, stddev_samp(wv) AS win_std
    FROM w GROUP BY w.event_type
    """,
)
def robust_stats_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized mean/std: exact P5/P95 per type (a
    type-bounded aggregate — percentile() buffers one type's values;
    swap approx_percentile past memory scale, same plan), broadcast
    back onto the scan, clamp row-locally, re-aggregate. Two scans,
    one type-keyed exchange each, map-side combine on both."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p5"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    wv = F.least(F.greatest(F.col("value"), F.col("p5")), F.col("p95"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .select("event_type", wv.alias("wv"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("wv").alias("win_mean"),
            F.stddev_samp("wv").alias("win_std"),
        )
    )


# ---------------------------------------------------------------------------
# Shipping-delay stats: order-to-ship latency percentiles per priority
# — the co-partitioned fact-fact join feeding a bounded-group summary.
# ---------------------------------------------------------------------------


@register(
    "shipping_delay_stats",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           avg(1.0 * delay_days) AS avg_delay,
           quantile_cont(delay_days, 0.5) AS p50_delay,
           quantile_cont(delay_days, 0.95) AS p95_delay
    FROM d GROUP BY o_orderpriority
    """,
)
def shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days from order to line-item shipment, summarized per priority.
    The join keys on l_orderkey/o_orderkey — the natural co-partition
    key both facts should be bucketed on (bucketed_join_roundtrip
    demonstrates the zero-exchange layout); the summary is a 5-group
    aggregate with exact interpolated percentiles (bounded groups;
    approx_percentile is the swap past memory scale)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("delay_days"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.avg(F.lit(1.0) * F.col("delay_days")).alias("avg_delay"),
        F.percentile("delay_days", F.lit(0.5)).alias("p50_delay"),
        F.percentile("delay_days", F.lit(0.95)).alias("p95_delay"),
    )


# ---------------------------------------------------------------------------
# MAD-based anomaly stats: median absolute deviation per type — the
# robust twin of anomaly_zscore (mean/std break under the very
# outliers being hunted; medians don't).
# ---------------------------------------------------------------------------


@register(
    "event_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           any_value(m.med) AS med, any_value(x.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > 3 * 1.4826 * x.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad x ON d.event_type = x.event_type
    GROUP BY d.event_type
    """,
)
def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outliers by the 3-sigma-equivalent MAD rule
    (dev > 3 * 1.4826 * MAD). Three passes over the scan, each a
    type-bounded aggregate with the 5-row result broadcast back —
    medians don't pipeline the way moments do, so the extra scan IS
    the robust-statistics trade, and each scan stays map-side-combined
    with zero corpus-sized exchanges."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("dev") > F.lit(3 * 1.4826) * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Correlation pack: pairwise Pearson correlations of the lineitem
# measures in ONE pass — corr() is a sufficient-statistics aggregate,
# so the whole matrix costs a single map-side-combined scan.
# ---------------------------------------------------------------------------


@register(
    "lineitem_corr_matrix",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           corr(l_quantity, l_extendedprice) AS qty_price,
           corr(l_quantity, l_discount) AS qty_discount,
           corr(l_quantity, l_tax) AS qty_tax,
           corr(l_extendedprice, l_discount) AS price_discount,
           corr(l_extendedprice, l_tax) AS price_tax,
           corr(l_discount, l_tax) AS discount_tax
    FROM lineitem
    """,
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.corr("l_quantity", "l_extendedprice").alias("qty_price"),
        F.corr("l_quantity", "l_discount").alias("qty_discount"),
        F.corr("l_quantity", "l_tax").alias("qty_tax"),
        F.corr("l_extendedprice", "l_discount").alias("price_discount"),
        F.corr("l_extendedprice", "l_tax").alias("price_tax"),
        F.corr("l_discount", "l_tax").alias("discount_tax"),
    )


# ---------------------------------------------------------------------------
# Explicit two-phase salted aggregation: the skew-agg escape hatch.
# ---------------------------------------------------------------------------


@register(
    "salted_two_phase_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(value) AS sum_value,
           sum(value) / count(*) AS avg_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats via an EXPLICIT salt: phase 1 aggregates on
    (event_type, salt-16) — 16-way spread of each hot key — phase 2
    merges the partials per type. For plain sum/count Catalyst's own
    partial aggregation already does this; the explicit form is the
    pattern for when it can't: algebraic merges after an expand, UDAF
    states, or count-distinct under a 5-key skew like this one, where
    the distinct's (type, user) shuffle would land 1/5 of the corpus
    on one reducer. Salting makes the phase-1 keys (type, salt) — 80
    near-even groups — and phase 2 merges 16 bounded partials per
    type. Result is oracle-identical to the direct groupBy.

    The salt is hash(user_id) so each user lands in ONE salt bucket —
    count_distinct(user_id) partials are disjoint and their sum is the
    true distinct count (a random salt would double-count users).
    """
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("user_id"), F.lit(16)))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("psum"),
        F.count_distinct("user_id").alias("pusers"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("psum").alias("sum_value"),
            F.sum("pusers").alias("n_users"),
        )
        .select(
            "event_type",
            "n",
            "sum_value",
            (F.col("sum_value") / F.col("n")).alias("avg_value"),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Out-of-orderness audit: how late does data actually arrive? The
# empirical basis for choosing a watermark delay.
# ---------------------------------------------------------------------------


@register(
    "out_of_order_audit",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events
    ), lateness AS (
      SELECT user_id,
             CASE WHEN high_water IS NOT NULL AND ts < high_water
                  THEN epoch(high_water) - epoch(ts) ELSE 0.0 END AS late_sec
      FROM seq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_sec > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           sum(CASE WHEN late_sec > 0 THEN 1.0 ELSE 0.0 END) / count(*)
             AS frac_out_of_order,
           max(late_sec) AS max_late_sec,
           quantile_cont(late_sec, 0.99) AS p99_late_sec
    FROM lateness
    """,
)
def out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How disordered is the stream, really? Per user (event_id is the
    arrival order), an event is late by (running-max event time − its
    own time); the p99/max of that lateness IS the watermark delay the
    streaming jobs (§2.7f) should configure — guessed watermarks
    either drop data or hold state too long.

    The running max partitions by user_id — arrival order is only
    meaningful within a user's stream, and user-partitioning keeps
    every window bounded (a single global arrival order would need a
    one-partition sort). One user_id exchange, then a 1-row scorecard.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id", "ts", F.max("ts").over(w).alias("high_water")
    )
    late_sec = (
        F.when(
            F.col("high_water").isNotNull() & (F.col("ts") < F.col("high_water")),
            (F.unix_micros("high_water") - F.unix_micros("ts")) / F.lit(1_000_000.0),
        )
        .otherwise(F.lit(0.0))
    )
    lateness = seq.select(late_sec.alias("late_sec"))
    return lateness.agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("late_sec") > 0, 1).otherwise(0)).alias(
            "n_out_of_order"
        ),
        (
            F.sum(F.when(F.col("late_sec") > 0, 1.0).otherwise(0.0)) / F.count("*")
        ).alias("frac_out_of_order"),
        F.max("late_sec").alias("max_late_sec"),
        F.expr("percentile(late_sec, 0.99)").alias("p99_late_sec"),
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (Borzsony, Kossmann & Stocker ICDE'01,
# public formulation): the orders no other order dominates on
# (cheaper price, more recent date) within each priority class.
# ---------------------------------------------------------------------------


@register(
    "orders_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT o_orderpriority AS priority, o_totalprice AS price,
             max(o_orderdate) AS best_date,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ), scan AS (
      SELECT priority, price, best_date, n_orders,
             max(best_date) OVER (
               PARTITION BY priority ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_best
      FROM pts
    ), frontier AS (
      SELECT priority, price, best_date, n_orders
      FROM scan WHERE prev_best IS NULL OR best_date > prev_best
    )
    SELECT priority, price, best_date, n_orders,
           CAST(row_number() OVER (
             PARTITION BY priority ORDER BY price) AS INT) AS frontier_pos
    FROM frontier
    """,
)
def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Pareto frontier of (minimize o_totalprice, maximize
    o_orderdate): an order survives iff no strictly cheaper order in its
    class is at least as recent. Classic skyline operator, expressed as
    sort-scan: group to distinct price points first (best_date = max
    date at that price, so within-price dominance resolves in the
    aggregate), then one ordered pass where a point survives iff it
    beats the running max date of all cheaper points.

    Scale shape: the window input is the (priority, price) aggregate —
    map-side combined — not raw orders, and partitions by the 5
    priority classes. All comparisons are stored doubles/timestamps
    and integer counts (no derived-float output), so the result is
    bit-stable across engines by construction. For key spaces where
    distinct prices stay huge, the standard refinement is grid-
    partition pre-filtering (keep each grid cell's local frontier,
    then one merge pass) — same two-level shape as the salted aggs.
    """
    pts = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
        )
        .agg(
            F.max("o_orderdate").alias("best_date"),
            F.count("*").alias("n_orders"),
        )
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scan = pts.withColumn("prev_best", F.max("best_date").over(w))
    frontier = scan.filter(
        F.col("prev_best").isNull() | (F.col("best_date") > F.col("prev_best"))
    )
    return frontier.select(
        "priority",
        "price",
        "best_date",
        "n_orders",
        F.row_number()
        .over(Window.partitionBy("priority").orderBy("price"))
        .alias("frontier_pos"),
    )


# ---------------------------------------------------------------------------
# Exact weighted median: the order statistic where every row counts
# with its own mass — the price point at which half the shipped
# QUANTITY is cheaper, not half the line items.
# ---------------------------------------------------------------------------


@register(
    "lineitem_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             sum(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           min(l_extendedprice) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_quantity
    FROM cum WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: the smallest price whose cumulative shipped
    quantity reaches half the group's total — the exact
    quantity-weighted median (lower weighted median convention).

    Scale shape: one shuffle on the bounded l_returnflag key, an
    in-partition ordered pass for the cumulative weight, and a
    bounded-key reduce. The selected value is a STORED double and the
    2*cw >= tw comparison is over sums of whole-number quantities
    (exact in double), so the answer is bit-deterministic — the
    weighted sibling of exact_percentiles, with the same
    "pre-aggregate then scan" discipline as the skyline query.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber", "l_quantity",
    )
    # two-phase range prefix sum: a window PARTITION BY l_returnflag
    # would push a third of lineitem through ONE task's sort; the
    # helper range-slices the sort and only prefix-sums slice totals
    # globally. cw addends are whole-number quantities, so the re-
    # grouped summation stays exact in double (order-independent).
    cum = grouped_range_prefix_sum(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        "l_quantity",
        out_col="cw",
    )
    tot = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("tw"))
    cum = cum.join(F.broadcast(tot), "l_returnflag")
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").cast("long").alias("total_quantity"),
        )
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer spend: THE inequality number — how
# concentrated revenue is across the customer base (0 = egalitarian,
# ->1 = one whale), from the ranked-sum closed form.
# ---------------------------------------------------------------------------


@register(
    "customer_spend_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS s
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT s, row_number() OVER (ORDER BY s, o_custkey) AS i,
             count(*) OVER () AS n
      FROM spend
    )
    SELECT CAST(min(n) AS BIGINT) AS n_customers,
           sum(s) AS total_spend,
           (2.0 * sum((1.0 * i) * s)) / (min(n) * sum(s))
             - ((1.0 * min(n) + 1.0) / min(n)) AS gini
    FROM ranked
    """,
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini = 2*sum(i * x_i) / (n * sum(x)) - (n+1)/n over spends
    ranked ascending (ties broken by custkey) — the ranked-sum closed
    form, no pairwise differences.

    Scale shape: the rank runs over the per-customer AGGREGATE (one
    map-side-combined reduce collapses orders first), then a single
    global reduction; the ordered pass is the same pre-aggregate
    discipline as the skyline and weighted-median queries. The
    expression keeps the oracle's exact op order (parity-audited);
    the test pins 0 <= gini < 1 and the closed form against a direct
    mean-absolute-difference computation.
    """
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    # global rank via the two-phase range helper (a bare Window.orderBy
    # serializes every customer through one task); n rides a 1-row
    # broadcast instead of a single-partition count window
    ranked = grouped_range_rank(
        spend, [], [F.col("s"), F.col("o_custkey")], rank_col="i"
    ).select("s", "i")
    nrow = spend.agg(F.count("*").alias("n"))
    ranked = ranked.crossJoin(F.broadcast(nrow))
    gini = (
        F.lit(2.0) * F.sum((F.lit(1.0) * F.col("i")) * F.col("s"))
    ) / (F.min("n") * F.sum("s")) - (
        (F.lit(1.0) * F.min("n") + F.lit(1.0)) / F.min("n")
    )
    return ranked.agg(
        F.min("n").cast("long").alias("n_customers"),
        F.sum("s").alias("total_spend"),
        gini.alias("gini"),
    )


# ---------------------------------------------------------------------------
# Chi-squared test of independence: is order priority independent of
# order status? The contingency-table statistic every experimentation /
# data-drift platform computes, distributed as bounded-key aggregates.
# ---------------------------------------------------------------------------


@register(
    "orders_chi2_independence",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), rows_t AS (
      SELECT pri, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY pri
    ), cols_t AS (
      SELECT st, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY st
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
    cells AS (
      SELECT r.pri, col.st,
             coalesce(c.n, 0) AS observed,
             ((1.0 * r.rn) * col.cn) / tot.t AS expected
      FROM rows_t r CROSS JOIN cols_t col CROSS JOIN tot
      LEFT JOIN c ON c.pri = r.pri AND c.st = col.st
    )
    SELECT pri, st, CAST(observed AS BIGINT) AS observed, expected,
           ((observed - expected) * (observed - expected)) / expected
             AS chi2_term
    FROM cells
    """,
)
def orders_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full contingency table of (priority x status) with observed
    counts, independence-expected counts, and each cell's chi-squared
    contribution — sum the chi2_term column and compare against the
    chi-squared critical value at (R-1)(C-1) dof to reject
    independence; large single cells localize WHERE the dependence
    lives (the drift-debugging payoff).

    Scale shape: one map-side-combined count over the bounded
    (priority, status) key space; margins and the total ride tiny
    broadcasts; the zero-cell LEFT JOIN keeps structurally absent
    combinations in the table (their chi2 term is the full expected
    mass). Expected counts are single-chain int arithmetic in matched
    op order (parity-audited); the additivity of chi2 terms against
    an independently computed statistic is pinned in
    tests/test_round6.py::test_chi2_matches_direct_computation.
    """
    o = table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").alias("n"))
    rows_t = c.groupBy("pri").agg(F.sum("n").alias("rn"))
    cols_t = c.groupBy("st").agg(F.sum("n").alias("cn"))
    tot = c.agg(F.sum("n").alias("t"))
    cells = (
        rows_t.crossJoin(F.broadcast(cols_t))
        .crossJoin(F.broadcast(tot))
        .join(c, ["pri", "st"], "left")
        .select(
            "pri",
            "st",
            F.coalesce("n", F.lit(0)).alias("observed"),
            (((F.lit(1.0) * F.col("rn")) * F.col("cn")) / F.col("t")).alias(
                "expected"
            ),
        )
    )
    return cells.select(
        "pri",
        "st",
        "observed",
        "expected",
        (
            ((F.col("observed") - F.col("expected"))
             * (F.col("observed") - F.col("expected")))
            / F.col("expected")
        ).alias("chi2_term"),
    )
