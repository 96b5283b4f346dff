"""Near-dup cluster assignment — connected components over the
MinHash-LSH duplicate pairs, the step that turns pairwise near-dup
evidence into one canonical document per cluster.

Algorithm: iterative min-label propagation (each node repeatedly takes
the minimum label among itself and its neighbors until fixpoint) — the
standard large-scale connected-components formulation: every iteration
is one shuffle join on doc_id, converging in O(diameter) rounds
(near-dup clusters are shallow, so 2-4 rounds in practice). The loop's
only driver-side work is the convergence check (a count), never data.
Labels are doc_ids, so the fixpoint (min doc_id reachable) is unique
and deterministic; the DuckDB oracle computes the same fixpoint with a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.queries.dedup import (
    _BUCKETS_SQL,
    _candidate_pairs,
    _verified_pairs,
)
from history_collector_spark.registry import register

_DUP_THRESHOLD = 0.5


def _dup_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate pairs verified at jaccard >= threshold (edges).

    Shares dedup's candidate-pruned verify: the verify side is
    broadcast-semi-joined down to collision survivors before it is even
    tokenized, so only the duplicate subgraph pays the second shingle
    pass. Returns (pairs, cached_candidates);
    the caller unpersists the candidate cache once edges materialize.
    """
    cand = _candidate_pairs(spark, sf_dir)
    pairs = (
        _verified_pairs(spark, sf_dir, cand)
        .filter(F.col("jaccard") >= _DUP_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return pairs, cand


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_BUCKETS_SQL},
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
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, min(v) AS cluster_id,
           (min(v) = u) AS is_canonical
    FROM reach GROUP BY u
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    dup, sh_cache = _dup_pairs(spark, sf_dir)
    # both directions of every edge in ONE pass over the verify
    # pipeline — a self-unionAll would duplicate the whole unpersisted
    # subtree and run LSH + verify twice
    edges = dup.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
                ),
                F.struct(
                    F.col("doc_b").alias("u"), F.col("doc_a").alias("v")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # cache: every iteration probes the same edge set; materializing it
    # here also fixes the candidate set before the loop, after which the
    # shingle-set cache backing the verify join can go
    edges = edges.persist()
    edges.count()
    sh_cache.unpersist()

    # iterate ONLY over edge-participating nodes — duplicates are a
    # small fraction of any corpus, so each round's join touches the
    # dup subgraph, never the full table; isolated docs join back as
    # their own singleton clusters at the end
    # labels(node, label): the alias gives `node` a fresh attribute id,
    # so the edges-vs-labels joins below are unambiguous
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    while True:
        nbr = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(edges.u.alias("nu"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
        )
        # carry the changed flag inside the checkpointed frame so the
        # convergence check is a scan of the checkpoint, not another join
        stepped = (
            labels.join(nbr, labels.node == nbr.nu, "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("chg"),
            )
            # truncate lineage each round or the plan doubles per iteration
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter("chg").count()
        labels = stepped.drop("chg")
        if changed == 0:
            break
    edges.unpersist()

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, docs.doc_id == labels.node, "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        (F.coalesce(F.col("label"), F.col("doc_id")) == F.col("doc_id")).alias(
            "is_canonical"
        ),
    )
