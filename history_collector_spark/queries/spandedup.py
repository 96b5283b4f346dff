"""Span-level exact deduplication over `documents`.

Two corpus-scale text-cleaning operators the big training-data
pipelines run before anything else:

- `dedup_exact_substring` — the ExactSubstr shape from "Deduplicating
  Training Data Makes Language Models Better" (Lee et al., 2021):
  every K-token window that occurs more than once ANYWHERE in the
  corpus (including twice in the same document) marks its K covered
  token positions as duplicated; those tokens are removed and the
  document reconstructed. The paper builds a suffix array; the
  distributed re-expression is a positional K-gram inverted index —
  the same duplicated-span set for spans of exactly length K, with
  cost linear in Σ df(g)·K (never df², unlike pair-enumeration).

- `dedup_exact_segments` — the CCNet/C4 paragraph-hash shape: the
  corpus is cut into fixed non-overlapping segments, each segment kept
  only at its globally FIRST occurrence (ordered by doc_id, then
  position), later occurrences dropped, documents reconstructed from
  their surviving segments.

Scale notes (100 TB): both operators shuffle GRAM/SEGMENT HASHES
(8-byte longs via md5_hash32), never text. dedup_exact_substring does
one gram-hash aggregation (map-side combined), one co-partitioned
join back onto the positional index, and one doc_id aggregation to
assemble covered-position sets — per-doc state is bounded by document
length, per-gram fan-out by df(g)·K (linear). dedup_exact_segments is
one window over segment hash (the keeper rank) plus one doc_id
aggregation. No all-pairs product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import md5_hash32, tokens
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

# K-token window for substring dedup; SEG-token cells for segment dedup.
K = 8
SEG = 16

_TOKS_SQL = """
    toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    )"""


@register(
    "dedup_exact_substring",
    oracle=f"""
    WITH {_TOKS_SQL},
    grams AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             CAST(concat('0x', substr(md5(
               array_to_string(list_slice(t, i, i + {K - 1}), ' ')), 1, 8))
               AS BIGINT) AS gh
      FROM toks,
           UNNEST(range(1, CASE WHEN len(t) >= {K}
                               THEN len(t) - {K} + 2 ELSE 1 END)) AS u(i)
    ),
    dup AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) > 1),
    cov AS (
      SELECT DISTINCT g.doc_id, CAST(p AS INT) AS p
      FROM grams g JOIN dup USING (gh),
           UNNEST(range(g.pos, g.pos + {K})) AS v(p)
    ),
    perdoc AS (
      SELECT doc_id, list_sort(list(p)) AS cov_arr FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS INT) AS n_tokens,
           CAST(coalesce(len(p.cov_arr), 0) AS INT) AS dup_token_count,
           coalesce(array_to_string(
             list_filter(t.t, (x, i) ->
               NOT list_contains(coalesce(p.cov_arr, CAST([] AS INT[])), i)),
             ' '), '') AS cleaned_text
    FROM toks t LEFT JOIN perdoc p USING (doc_id)
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("t"))

    # Positional K-grams, map-only (same materialized-array discipline
    # as functions/nlp.shingle_rows — the array stays a bound column so
    # the lambda's element_at is O(1)).
    idx = F.when(
        F.size("t") >= K, F.sequence(F.lit(1), F.size("t") - K + 1)
    ).otherwise(F.array().cast("array<int>"))
    gram_structs = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            md5_hash32(
                F.concat_ws(" ", *[F.element_at("t", i + j) for j in range(K)])
            ).alias("gh"),
        ),
    )
    # r15: pin grams — it anchors two consumer subtrees (the dup-gram
    # aggregate and the coverage join), each of which would re-run the
    # tokenize + K-gram md5 explode otherwise (same persist discipline
    # as dedup._candidate_pairs). Rows are (doc_id, pos, gh) — id-width.
    grams = (
        t.select("doc_id", F.explode(gram_structs).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.gh").alias("gh"))
        .transform(pin_local)
    )

    # Corpus-wide duplicated grams: one gh-keyed agg with map-side
    # combine; the join back is co-partitioned on gh.
    dup = grams.groupBy("gh").count().filter(F.col("count") > 1).select("gh")

    # Expand each duplicated occurrence to its K covered positions,
    # then ONE doc_id shuffle assembles the per-doc covered set
    # (collect_set dedups overlapping spans inside the agg).
    cov = (
        grams.join(dup, "gh")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + K - 1)).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("p")).alias("cov_arr"))
    )

    joined = t.join(cov, "doc_id", "left").withColumn(
        "cov_arr",
        F.coalesce(F.col("cov_arr"), F.array().cast("array<int>")),
    )
    # Spark's filter lambda index is 0-based; positions are 1-based.
    kept = F.filter(
        F.col("t"), lambda x, i: ~F.array_contains(F.col("cov_arr"), i + 1)
    )
    return joined.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.size("cov_arr").alias("dup_token_count"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


@register(
    "dedup_exact_segments",
    oracle=f"""
    WITH {_TOKS_SQL},
    segs AS (
      SELECT doc_id, CAST(s AS INT) AS seg_idx,
             array_to_string(
               list_slice(t, s * {SEG} + 1, s * {SEG} + {SEG}), ' ') AS seg
      FROM toks,
           UNNEST(range(0, CAST(ceil(len(t) / {SEG}.0) AS BIGINT))) AS u(s)
    ),
    hashed AS (
      SELECT doc_id, seg_idx, seg,
             CAST(concat('0x', substr(md5(seg), 1, 8)) AS BIGINT) AS gh
      FROM segs
    ),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (
               PARTITION BY gh ORDER BY doc_id, seg_idx) AS rn
      FROM hashed
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_segments,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT)
             AS kept_segments,
           coalesce(
             array_to_string(
               list(seg ORDER BY seg_idx) FILTER (WHERE rn = 1), ' '),
             '') AS cleaned_text
    FROM ranked GROUP BY doc_id
    """,
)
def dedup_exact_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("t"))

    # Non-overlapping SEG-token cells, map-only (split is never empty,
    # so every doc has >= 1 segment).
    seg_structs = F.transform(
        F.sequence(F.lit(0), F.floor((F.size("t") - 1) / SEG).cast("int")),
        lambda s: F.struct(
            s.alias("seg_idx"),
            F.array_join(F.slice("t", s * SEG + 1, SEG), " ").alias("seg"),
        ),
    )
    segs = t.select("doc_id", F.explode(seg_structs).alias("s")).select(
        "doc_id",
        F.col("s.seg_idx").alias("seg_idx"),
        F.col("s.seg").alias("seg"),
        md5_hash32(F.col("s.seg")).alias("gh"),
    )

    # Globally-first occurrence keeps the segment: one window over the
    # 8-byte segment hash (the only corpus-wide exchange).
    w = Window.partitionBy("gh").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w))

    # Reassemble per doc: collect_list skips the nulls from dropped
    # segments; array_sort on (seg_idx, seg) structs restores order.
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("seg_idx"), F.col("seg"))
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_segments"),
            F.sum((F.col("rn") == 1).cast("int")).cast("int").alias(
                "kept_segments"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
