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

from history_collector_spark.catalog import register_views
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
    register_views(spark, sf_dir)
    return spark.sql(_SQL)
