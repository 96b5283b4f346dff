"""Privacy-release audits: k-anonymity and l-diversity over a
quasi-identifier grouping — the gate a training-data pipeline runs
before any customer-derived table leaves the boundary (does any
quasi-identifier combination isolate fewer than k people, and do the
small groups leak a sensitive value?).

Extends the curation tier's PII machinery (curation_pii_redact redacts
values IN text; this audits RE-IDENTIFICATION risk of structured
rows). Reference anchor: no privacy surface exists in the reference
(single-purpose ledger ETL, reference python/main.py); this is
pipeline-extension tier.

Scale shape: one hash aggregate at quasi-identifier grain (map-side
combined; the QI space is far smaller than the row count), then a
bounded per-threshold summary — the audit of a trillion-row table
shuffles only its QI groups. Every output is an exact integer or a
single division of exact integers, so the DuckDB oracle is EXACT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_K_THRESHOLDS = (2, 5, 10)

# quasi-identifiers: nation x market segment x account-balance band
# (floor(acctbal/1000) — exact integer arithmetic on both engines);
# sensitive attribute: a deterministic per-customer plan tier
_QI_SQL = """
  qi AS (
    SELECT c_nationkey AS nation,
           c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           c_custkey % 5 AS tier
    FROM customer
  ),
  grp AS (
    SELECT nation, segment, bal_band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT tier) AS BIGINT) AS l_div
    FROM qi GROUP BY nation, segment, bal_band
  )
"""


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH {_QI_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(min(n) AS BIGINT) AS min_group,
             CAST(min(l_div) AS BIGINT) AS min_l_diversity
      FROM grp
    ),
    ks AS (SELECT unnest([{", ".join(map(str, _K_THRESHOLDS))}]) AS k)
    SELECT CAST(ks.k AS INT) AS k,
           tot.n_groups, tot.n_rows, tot.min_group, tot.min_l_diversity,
           CAST(coalesce(sum(CASE WHEN grp.n < ks.k THEN 1 END), 0)
                AS BIGINT) AS groups_below_k,
           CAST(coalesce(sum(CASE WHEN grp.n < ks.k THEN grp.n END), 0)
                AS BIGINT) AS rows_below_k,
           CAST(coalesce(sum(CASE WHEN grp.n < ks.k THEN grp.n END), 0)
                AS DOUBLE) / tot.n_rows AS at_risk_share,
           CAST(coalesce(sum(CASE WHEN grp.n >= ks.k AND grp.l_div < 2
                                  THEN grp.n END), 0) AS BIGINT)
             AS rows_homogeneous
    FROM ks CROSS JOIN tot CROSS JOIN grp
    GROUP BY ks.k, tot.n_groups, tot.n_rows, tot.min_group,
             tot.min_l_diversity
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per release threshold k in {_K_THRESHOLDS}: how many
    quasi-identifier groups (nation x segment x balance band) isolate
    fewer than k customers, how many rows sit in them (the
    re-identifiable share), and — for the groups that DO pass k — how
    many rows sit in sensitive-value-homogeneous groups (l-diversity
    < 2: k-anonymous but the sensitive tier still leaks).

    One QI-grain hash aggregate over the table, then a broadcast of
    the tiny threshold grid against the group table; exact integers
    and one division end to end."""
    cust = table(spark, sf_dir, "customer")
    grp = (
        cust.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
                "bal_band"
            ),
            (F.col("c_custkey") % 5).alias("tier"),
        )
        .groupBy("nation", "segment", "bal_band")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("tier").alias("l_div"),
        )
    )
    tot = grp.agg(
        F.count("*").alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_group"),
        F.min("l_div").alias("min_l_diversity"),
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _K_THRESHOLDS], "k int"
    )
    below = F.col("n") < F.col("k")
    homog = (F.col("n") >= F.col("k")) & (F.col("l_div") < 2)
    per_k = (
        ks.crossJoin(grp)
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(below, 1)), F.lit(0)
            ).cast("long").alias("groups_below_k"),
            F.coalesce(
                F.sum(F.when(below, F.col("n"))), F.lit(0)
            ).cast("long").alias("rows_below_k"),
            F.coalesce(
                F.sum(F.when(homog, F.col("n"))), F.lit(0)
            ).cast("long").alias("rows_homogeneous"),
        )
    )
    return per_k.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_groups",
        "n_rows",
        "min_group",
        "min_l_diversity",
        "groups_below_k",
        "rows_below_k",
        (F.col("rows_below_k").cast("double") / F.col("n_rows")).alias(
            "at_risk_share"
        ),
        "rows_homogeneous",
    )
