"""Deduplication operators over the `documents` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the 100 TB posture):
- exact dedup groups on a 256-bit content hash, not the full text —
  the shuffle moves 32-byte keys, not documents;
- MinHash signatures/bands are computed per-row with array expressions
  (zero shuffles), then candidates come from a groupable (band, bucket)
  key join — never an all-pairs comparison;
- SimHash is likewise per-row;
- the only all-pairs query (embedding cosine) is the brute-force
  baseline; the bucketed scale path is similarity.ann_lsh_topk.

Every hash is md5-derived so the DuckDB oracles reproduce values
exactly; LSH candidate pairs are therefore deterministic, not
probabilistic, from the oracle's point of view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import (
    cosine,
    jaccard,
    l2_norm,
    md5_hash32,
    minhash,
    shingles,
)
from history_collector_spark.registry import register

N_HASHES = 32
N_BANDS = 16  # r=2 rows per band

# DuckDB CTE producing the identical (doc_id, band, bucket) LSH table.
_BUCKETS_SQL = """
  toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
  sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 1, 1)),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s
    FROM toks
  ),
  mh AS (
    SELECT doc_id, seed,
           min(CAST(concat('0x', substr(md5(concat(seed, ':', s)), 1, 8)) AS BIGINT)) AS m
    FROM sh, (SELECT unnest(range(32)) AS seed)
    GROUP BY doc_id, seed
  ),
  buckets AS (
    SELECT a.doc_id, CAST(a.seed // 2 AS INT) AS band,
           md5(concat(a.m, '_', b.m)) AS bucket
    FROM mh a JOIN mh b ON a.doc_id = b.doc_id AND b.seed = a.seed + 1
    WHERE a.seed % 2 = 0
  )
"""


def _lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc LSH table: N_BANDS rows of (doc_id, band, bucket).

    Signature + banding are pure array expressions over each row — no
    shuffle until someone groups on (band, bucket).
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    sigs = docs.select(
        "doc_id",
        *[minhash(F.col("sh"), s).alias(f"m{s}") for s in range(N_HASHES)],
    )
    bands = F.array(
        *[
            F.md5(
                F.concat(
                    F.col(f"m{2 * j}").cast("string"),
                    F.lit("_"),
                    F.col(f"m{2 * j + 1}").cast("string"),
                )
            )
            for j in range(N_BANDS)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(bands).alias("band", "bucket")
    )


# ---------------------------------------------------------------------------
# Exact dedup: group on content hash, keep the lowest doc_id per group.
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# MinHash LSH table: the banded-signature index itself.
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_lsh",
    oracle=f"WITH {_BUCKETS_SQL} SELECT doc_id, band, bucket FROM buckets",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_buckets(spark, sf_dir)


# ---------------------------------------------------------------------------
# MinHash LSH candidate pairs + exact-Jaccard verification: docs sharing
# any band bucket, scored with true shingle Jaccard. The join is on the
# (band, bucket) key — candidate count scales with real duplication,
# not quadratically.
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH {_BUCKETS_SQL},
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
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard,
           (CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
             / len(list_distinct(list_concat(x.s, y.s))) >= 0.8) AS is_dup
    FROM cand c
    JOIN shl x ON c.doc_a = x.doc_id
    JOIN shl y ON c.doc_b = y.doc_id
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = _lsh_buckets(spark, sf_dir)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = table(spark, sf_dir, "documents").select(
        "doc_id", shingles(F.col("text")).alias("s")
    )
    x = sh.alias("x")
    y = sh.alias("y")
    j = jaccard(F.col("x.s"), F.col("y.s"))
    return (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select(
            "doc_a", "doc_b", j.alias("jaccard"), (j >= 0.8).alias("is_dup")
        )
    )


# ---------------------------------------------------------------------------
# SimHash: 32-bit per-doc fingerprint over distinct tokens; near-dups
# differ in few bits. Fully per-row (no shuffle anywhere).
# ---------------------------------------------------------------------------


@register(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split_regex(text, '\\s+')) AS t
      FROM documents
    ), th AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
    ), bits AS (
      SELECT doc_id, b,
             CASE WHEN sum(CASE WHEN (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) >= 0
                  THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END AS bitval
      FROM th, (SELECT unnest(range(32)) AS b)
      GROUP BY doc_id, b
    )
    SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", r"\s+")),
            lambda t: md5_hash32(t),
        ).alias("tokh"),
    )
    simhash = F.expr(
        """
        aggregate(sequence(0, 31), 0L, (acc, b) ->
          acc + IF(
            aggregate(tokh, 0L, (a, h) ->
              a + IF((h div CAST(pow(2, b) AS LONG)) % 2 = 1, 1L, -1L)) >= 0,
            CAST(pow(2, b) AS LONG), 0L))
        """
    )
    return docs.select("doc_id", simhash.alias("simhash"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs within language blocks: the
# blocked all-pairs baseline the LSH path approximates. Blocking keys
# bound the quadratic term per block.
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(text, '\\s+')) - 1, 1)),
               i -> concat_ws(' ', string_split_regex(text, '\\s+')[i],
                              string_split_regex(text, '\\s+')[i+1],
                              string_split_regex(text, '\\s+')[i+2]))) AS s
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", shingles(F.col("text")).alias("s")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    j = jaccard(F.col("a.s"), F.col("b.s"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
            j.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs: brute-force baseline (norms
# precomputed once; dot products in JVM codegen via zip_with/aggregate).
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(
        F.col("a.embedding"), F.col("b.embedding"),
        F.col("a.nrm"), F.col("b.nrm"),
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )
