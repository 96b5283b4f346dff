"""The SQL query surface — sample/main.py parity.

The reference delegates ad-hoc consumer queries to Postgres via a
sample Flask API (sample/main.py:14-48); here the same layer is
`spark.sql` over the registered temp views (catalog.register_views):
parse -> Catalyst analyze/optimize -> codegen, no external database.
One registered query proves the full SQL path end-to-end; every
DataFrame query in this package could equally be written this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       avg(o_totalprice) AS avg_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register("sql_surface", oracle=_SQL)
def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 optimization (guide §1.2 "don't compute things you throw
    # away"): the statement references ONE view, so only that view is
    # registered — the former catalog-wide register_views() paid ten
    # spark.read.parquet footer/schema round-trips per invocation to
    # register nine views the query never touches. The demonstrated
    # surface is unchanged: parse -> analyze over a temp view ->
    # Catalyst -> codegen, same result, same oracle.
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL)
