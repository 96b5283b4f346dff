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


# ---------------------------------------------------------------------------
# Unpivot (melt): the four lineitem measures as (measure, value) rows —
# the inverse of pivot, for long-format consumers (plotting, generic
# metric sinks). Map-only: unpivot is a per-row fan-out, no exchange.
# ---------------------------------------------------------------------------


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan counts across the table graph —
# the data-quality gate a pipeline runs before promoting a snapshot.
# ---------------------------------------------------------------------------


@register(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', count(*)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'embeddings->documents', count(*)
    FROM embeddings e WHERE NOT EXISTS
      (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each check is a left-anti join that reduces to a count — the
    anti side only carries its key column, so the probe moves key
    bytes, and dimension-sized parents broadcast under AQE. Counts
    partial-aggregate map-side; the union is three 1-row frames.
    """

    def orphans(child: DataFrame, ck: str, parent: DataFrame, pk: str, tag: str) -> DataFrame:
        return (
            child.select(F.col(ck))
            .join(parent.select(F.col(pk)), child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(tag).alias("fk"), "n_orphans")
        )

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    return (
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionAll(orphans(orders, "o_custkey", cust, "c_custkey", "orders->customer"))
        .unionAll(orphans(emb, "vec_id", docs, "doc_id", "embeddings->documents"))
    )


# ---------------------------------------------------------------------------
# Order-independent table digest: one row that changes iff any row's
# audited columns change — replica/migration equality checks at scale.
# ---------------------------------------------------------------------------


@register(
    "table_content_digest",
    oracle="""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(concat_ws('|',
               l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_returnflag, l_linestatus,
               strftime(l_shipdate, '%Y-%m-%d'))), 1, 8)) AS BIGINT) AS rh
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(rh) AS BIGINT) AS digest_sum,
           CAST(bit_xor(rh) AS BIGINT) AS digest_xor
    FROM h
    """,
)
def table_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commutative content checksum of lineitem's stable columns (keys,
    flags, ship date — floats excluded so the digest never depends on
    formatting). Row hash is the md5-derived 32-bit value used across
    the repo; sum and xor are both order-independent, so two copies of
    the table compare equal regardless of partitioning or row order,
    and the whole check is a map-side-combined 1-row aggregate — the
    cheapest possible full-table scan. The sum stays under 2^52 even
    at trillions of rows (32-bit terms), far from BIGINT overflow."""
    li = table(spark, sf_dir, "lineitem")
    rh = md5_hash32(
        F.concat_ws(
            "|",
            F.col("l_orderkey"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_linenumber"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.date_format("l_shipdate", "yyyy-MM-dd"),
        )
    )
    return li.select(rh.alias("rh")).agg(
        F.count("*").alias("n_rows"),
        F.sum("rh").alias("digest_sum"),
        F.expr("bit_xor(rh)").alias("digest_xor"),
    )
