"""Declarative data-quality expectations — a Great-Expectations-shaped
surface evaluated as Spark aggregates.

The reference hand-rolls its integrity checks as scattered asserts
(python/build_database.py:26-27 mod-64 validation, python/main.py:88-105
sequence checks); a warehouse needs them DECLARED once and evaluated in
as few passes as the rule shapes allow:

- row-level rules (not-null / domain / range / predicate) compile to
  conditional sums folded into ONE aggregate per table — a single scan
  evaluates any number of them;
- uniqueness rules are one (count - count distinct) aggregate on the
  key;
- referential rules are one left-anti orphan count per FK edge.

The report is the union of those bounded aggregates: per rule, how many
rows were checked and how many violate. At 100 TB this is exactly the
nightly DQ gate shape — no rule adds a pass, only an expression.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


@dataclass(frozen=True)
class RowRule:
    """A row-level expectation: `predicate` must hold for every row."""

    name: str
    predicate: Column


def evaluate_row_rules(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    """Evaluate every row-level rule in ONE aggregate over one scan:
    each rule is a conditional sum, so N rules cost zero extra passes."""
    aggs = []
    for r in rules:
        aggs.append(
            F.sum(F.when(~F.coalesce(r.predicate, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(f"v_{r.name}")
        )
    aggs.append(F.count("*").cast("long").alias("n_rows"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into (rule, n_violations, n_checked)
    pairs = []
    for r in rules:
        pairs.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"v_{r.name}").alias("n_violations"),
                F.col("n_rows").alias("n_checked"),
            )
        )
    return wide.select(F.explode(F.array(*pairs)).alias("s")).select(
        "s.rule", "s.n_violations", "s.n_checked"
    )


def evaluate_unique_rule(df: DataFrame, name: str, key: str) -> DataFrame:
    return df.agg(
        (F.count(key) - F.count_distinct(F.col(key)))
        .cast("long")
        .alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    ).select(F.lit(name).alias("rule"), "n_violations", "n_checked")


def evaluate_fk_rule(
    child: DataFrame, name: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    return (
        orphans.agg(F.count("*").cast("long").alias("n_violations"))
        .crossJoin(
            F.broadcast(child.agg(F.count("*").cast("long").alias("n_checked")))
        )
        .select(F.lit(name).alias("rule"), "n_violations", "n_checked")
    )


@register(
    "dq_expectations_report",
    oracle="""
    SELECT 'o_totalprice_positive' AS rule,
           CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_in_domain',
           CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'),
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'l_discount_in_unit_range',
           CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_positive',
           CAST(sum(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate_not_null',
           CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_fk_orders',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly DQ gate over orders/lineitem: five row-level rules
    (two single-scan aggregates, one per table), one uniqueness rule,
    one FK rule — 7 expectations, 4 bounded aggregates, unioned into
    one report frame."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    order_rules = evaluate_row_rules(
        orders,
        [
            RowRule("o_totalprice_positive", F.col("o_totalprice") > 0),
            RowRule(
                "o_orderstatus_in_domain",
                F.col("o_orderstatus").isin("F", "O", "P"),
            ),
        ],
    )
    li_rules = evaluate_row_rules(
        li,
        [
            RowRule(
                "l_discount_in_unit_range", F.col("l_discount").between(0, 1)
            ),
            RowRule("l_quantity_positive", F.col("l_quantity") > 0),
            RowRule("l_shipdate_not_null", F.col("l_shipdate").isNotNull()),
        ],
    )
    uniq = evaluate_unique_rule(orders, "o_orderkey_unique", "o_orderkey")
    fk = evaluate_fk_rule(
        li.select("l_orderkey"),
        "l_orderkey_fk_orders",
        "l_orderkey",
        orders.select("o_orderkey"),
        "o_orderkey",
    )
    return order_rules.unionByName(li_rules).unionByName(uniq).unionByName(fk)
