"""Semantic (embedding-space) deduplication — SemDeDup-shaped.

SemDeDup (Abbas et al., 2023, public) clusters embeddings and drops
near-duplicates *within* a cluster, so the pairwise cosine work is
intra-cluster instead of all-pairs. Here the clustering step is the
deterministic random-hyperplane sign-LSH bucket (same md5-derived
±1 planes as ann_lsh_topk, so the DuckDB oracle reproduces it exactly;
a production run would swap in k-means centroids — the plan shape is
identical, only the bucket assignment changes).

A vector is a semantic duplicate if some LOWER-id vector in its bucket
has cosine >= the threshold; the canonical survivor of each near-dup
group is its minimum id (the same keep-lowest rule the text dedup
family uses). Output: every vector with its bucket, the id it
duplicates (null for keepers), and the keep flag.

Scale shape: one map-only signature pass (the planes are literal
arrays constant-folded at plan build), one self-join keyed on `bucket`
(cost sum(bucket_size^2), never all-pairs — the SemDeDup point), one
per-vec_id min-agg, one left join back. At 100 TB you raise the plane
count so buckets stay bounded (each extra plane halves expected bucket
size); skewed buckets are AQE skew-join territory, same as the MinHash
LSH path (dedup.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.functions.nlp import cosine, l2_norm
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

_EMB_DIM = 64
_N_PLANES = 8
_THRESHOLD = 0.3

_EMB_NORM_SQL = """
  emb AS (
    SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
  )
"""

_SIGN_SQL = f"""
  planes AS (
    SELECT p, list_transform(range(1, {_EMB_DIM + 1}),
             i -> CASE WHEN (CAST(concat('0x', substr(md5(concat(p, '#', i)), 1, 8)) AS BIGINT)
                        % 2) = 1 THEN 1.0 ELSE -1.0 END) AS hp
    FROM (SELECT unnest(range({_N_PLANES})) AS p)
  ),
  sigs AS (
    SELECT e.vec_id, e.embedding, e.nrm,
           CAST(sum(CASE WHEN list_sum(list_transform(range(1, {_EMB_DIM + 1}),
                  i -> CAST(e.embedding[i] AS DOUBLE) * hp[i])) >= 0
                THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM emb e, planes
    GROUP BY e.vec_id, e.embedding, e.nrm
  )
"""

_COS_SQL = f"""
  list_sum(list_transform(range(1, {_EMB_DIM + 1}),
    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (a.nrm * c.nrm)
"""


@register(
    "dedup_semantic",
    oracle=f"""
    WITH {_EMB_NORM_SQL},
    {_SIGN_SQL},
    dups AS (
      SELECT a.vec_id, min(c.vec_id) AS dup_of
      FROM sigs a JOIN sigs c
        ON a.bucket = c.bucket AND c.vec_id < a.vec_id
      WHERE {_COS_SQL} >= {_THRESHOLD}
      GROUP BY a.vec_id
    )
    SELECT s.vec_id, s.bucket, d.dup_of,
           d.dup_of IS NULL AS keep
    FROM sigs s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )

    def plane_sign(p: int, i: int) -> float:
        # md5 of constants -> fold at plan-build time (hashlib md5 ==
        # Spark/DuckDB md5); per-row work is one zip_with over a
        # literal ±1 array. Same derivation as similarity.ann_lsh_topk.
        h = int(hashlib.md5(f"{p}#{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 1 else -1.0

    def plane_dot(p: int) -> F.Column:
        hp = F.array(*[F.lit(plane_sign(p, i)) for i in range(1, _EMB_DIM + 1)])
        return F.aggregate(
            F.zip_with(F.col("embedding"), hp, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = None
    for p in range(_N_PLANES):
        term = F.when(plane_dot(p) >= 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = term if bucket is None else bucket + term

    # r15 optimization (guide §2.5 + the multiply-consumed-frame persist
    # discipline): the signature frame anchors THREE consumers (both
    # sides of the intra-bucket self-join plus the final left join), so
    # the 8 plane-dot folds re-ran three times — fused into a ONE-task
    # scan (single-row-group input). spread() parallelizes the signature
    # pass; persist() makes all three consumers read InMemoryTableScan.
    # The frame is the signature table a SemDeDup run materializes
    # anyway (id, vec, norm, bucket).
    sigs = pin_local(spread(emb, spark).withColumn("bucket", bucket))
    a = sigs.alias("a")
    c = sigs.alias("c")
    cos = cosine(
        F.col("a.embedding"), F.col("c.embedding"),
        F.col("a.nrm"), F.col("c.nrm"),
    )
    dups = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("c.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= _THRESHOLD)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min(F.col("c.vec_id")).alias("dup_of"))
    )
    return sigs.join(dups, "vec_id", "left").select(
        "vec_id",
        "bucket",
        "dup_of",
        F.col("dup_of").isNull().alias("keep"),
    )
