"""Graph scoring over the near-dup evidence graph — fixed-iteration
PageRank on the verified MinHash-LSH duplicate pairs.

Where connected components (clusters.py) answers "which docs form one
near-dup group", PageRank answers "which doc is the HUB of the sharing
structure" — the doc most embedded in duplicate relationships, which a
curation pass down-weights as probable boilerplate origin. Iterations
are FIXED (3) with damping 0.85, so the computation is deterministic
and the DuckDB oracle expresses it as three unrolled aggregate CTEs —
no recursion, no convergence test to disagree on.

Scale shape: the rank vector and degree table are (node, value) pairs
— bytes per node; each iteration is one join of edges to ranks on the
contribution source (high-cardinality doc_id key) plus one
map-side-combined sum by destination. Per round: one shuffle, data
volume = edge count, never node-squared. The loop body matches
clusters.py's discipline — `localCheckpoint` truncates the growing
lineage each round; the edge frame is persisted once and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.functions.scope import scoped_shuffle_partitions
from history_collector_spark.queries.clusters import (
    _DUP_THRESHOLD,
    _ITER_PARTITIONS,
    _dup_pairs,
)
from history_collector_spark.queries.dedup import _BUCKETS_SQL
from history_collector_spark.registry import register

_DAMPING = 0.85
_N_ITER = 3

_EDGES_SQL = f"""
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    shl AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks
    ),
    dup AS (
      SELECT doc_a, doc_b FROM cand
      JOIN shl x ON cand.doc_a = x.doc_id
      JOIN shl y ON cand.doc_b = y.doc_id
      WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              / len(list_distinct(list_concat(x.s, y.s))) >= {_DUP_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION ALL SELECT doc_b, doc_a FROM dup
    ),
    deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
    n AS (SELECT count(*) AS n_nodes FROM deg)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT d.u AS node,
             (1.0 - {_DAMPING}) / n.n_nodes
             + {_DAMPING} * coalesce(sum_in.contrib, 0.0) AS r
      FROM deg d CROSS JOIN n
      LEFT JOIN (
        SELECT e.v AS node, sum(p.r / pd.deg) AS contrib
        FROM edges e
        JOIN {prev} p ON e.u = p.node
        JOIN deg pd ON e.u = pd.u
        GROUP BY e.v
      ) sum_in ON d.u = sum_in.node
    )
    """


_PR_CHAIN = ",".join(
    _pr_iter_sql(f"pr{i}", f"pr{i + 1}") for i in range(_N_ITER)
)


@register(
    "graph_pagerank_dups",
    oracle=f"""
    WITH {_BUCKETS_SQL},
    {_EDGES_SQL},
    pr0 AS (
      SELECT d.u AS node, 1.0 / n.n_nodes AS r FROM deg d CROSS JOIN n
    ),
    {_PR_CHAIN}
    SELECT p.node AS doc_id, p.r AS rank, CAST(d.deg AS BIGINT) AS degree
    FROM pr{_N_ITER} p JOIN deg d ON p.node = d.u
    """,
)
def graph_pagerank_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    dup = _dup_pairs(spark, sf_dir)
    edges = dup.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
                F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # the iteration runs over the DUP SUBGRAPH (edge/node frames that
    # scale with duplication, not corpus size) — size its shuffles and
    # checkpoints to that, not to the session's corpus-wide default
    with scoped_shuffle_partitions(spark, _ITER_PARTITIONS):
        edges = edges.repartition(_ITER_PARTITIONS, "u").persist()
        edges.count()

        deg = edges.groupBy("u").agg(F.count("*").alias("deg")).persist()
        n_nodes = deg.count()  # bounded driver scalar: node count only

        ranks = deg.select(
            F.col("u").alias("node"), F.lit(1.0 / n_nodes).alias("r")
        ).localCheckpoint(eager=True)
        for _ in range(_N_ITER):
            contrib = (
                edges.join(ranks, edges.u == ranks.node)
                .join(deg, "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum(F.col("r") / F.col("deg")).alias("contrib"))
            )
            ranks = (
                deg.select(F.col("u").alias("node"))
                .join(contrib, "node", "left")
                .select(
                    "node",
                    (
                        F.lit((1.0 - _DAMPING) / n_nodes)
                        + F.lit(_DAMPING) * F.coalesce("contrib", F.lit(0.0))
                    ).alias("r"),
                )
                .localCheckpoint(eager=True)
            )
        edges.unpersist()
        result = ranks.join(deg, ranks.node == deg.u).select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("rank"),
            F.col("deg").cast("long").alias("degree"),
        )
        deg.unpersist()
    return result
