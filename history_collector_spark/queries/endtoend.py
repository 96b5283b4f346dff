"""End-to-end curation pipeline as ONE composed dataflow.

The repo's curation operators are individually oracle-verified; this
module composes the canonical LLM-training-data preprocessing chain —

  quality gate -> exact dedup -> near-dup (LSH + Jaccard verify)
  -> benchmark decontamination -> per-source token budget

— into a single query whose output is the per-source attrition FUNNEL
(every document charged to the FIRST stage that drops it, so the fate
columns sum exactly to the input count). This is the artifact a real
pipeline publishes per corpus pass, and the composition is what a user
of the engine actually runs: one DAG, one scan of the corpus text,
with the near-dup stage reading the session-materialized pair table
(the thing a production pass writes out once).

Stage semantics (all deterministic and SQL-mirrored exactly):
- input corpus = documents with doc_id % 50 != 0; the held-out
  doc_id % 50 == 0 slice plays the EXTERNAL benchmark suite.
- quality: >= 45 whitespace tokens.
- exact: keep the lowest doc_id per identical text (md5 grouping —
  the shuffle key is the hash, never the text).
- near-dup: among exact survivors, LSH collision pairs with verified
  shingle-Jaccard >= 0.5 drop the GREATER doc_id (single-pass
  keep-lowest policy: deliberately non-transitive — the transitive-
  closure variant is dedup_clusters / dedup_cluster_representative).
- decontamination: any distinct 3-shingle shared with a benchmark doc
  drops the survivor (the curation_decontaminate broadcast idiom).
- budget: per source in doc_id order, keep while the inclusive
  running token total stays <= 600.

Scale shape: the text is scanned once for metadata (tokens, hash);
shingle work happens only in the near-dup verify (candidate-pruned,
scales with duplication) and the benchmark gram build (benchmark-
sized broadcast); the budget cumsum is the two-phase range prefix
sum, never a per-source window over raw rows. Reference parity note:
the reference engine has no curation surface — LLM-pipeline extension
tier, composing SURVEY.md §2.6-adjacent operators end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.functions.ranking import (
    grouped_range_prefix_sum,
)
from history_collector_spark.queries.dedup import (
    _BUCKETS_SQL,
    verified_pair_table,
)
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

_MIN_TOKENS = 45
_NEARDUP_J = 0.5
_BUDGET = 600
_BENCH_MOD = 50

_ORACLE = f"""
    WITH {_BUCKETS_SQL},
    meta AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt,
             md5(text) AS h
      FROM documents WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    q AS (SELECT * FROM meta WHERE nt >= {_MIN_TOKENS}),
    ex AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM q
    ),
    b AS (SELECT * FROM ex WHERE rn = 1),
    shl AS (
      SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(t) - 1, 1)),
          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks
    ),
    nd_drop AS (
      SELECT DISTINCT p.doc_b FROM (
        SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM buckets a JOIN buckets c
          ON a.band = c.band AND a.bucket = c.bucket
         AND a.doc_id < c.doc_id
        JOIN b ba ON ba.doc_id = a.doc_id
        JOIN b bb ON bb.doc_id = c.doc_id
      ) p
      JOIN shl x ON x.doc_id = p.doc_a
      JOIN shl y ON y.doc_id = p.doc_b
      WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
            / len(list_distinct(list_concat(x.s, y.s))) >= {_NEARDUP_J}
    ),
    c AS (
      SELECT * FROM b
      WHERE doc_id NOT IN (SELECT doc_b FROM nd_drop)
    ),
    bench AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
          range(1, greatest(len(t) - 1, 1)),
          i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS g
      FROM toks WHERE doc_id % {_BENCH_MOD} = 0
    ),
    contam AS (
      SELECT DISTINCT sh.doc_id FROM (
        SELECT doc_id, unnest(s) AS g FROM shl
      ) sh JOIN bench ON sh.g = bench.g
    ),
    d AS (
      SELECT * FROM c
      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    e AS (
      SELECT doc_id, sum(nt) OVER (
        PARTITION BY source ORDER BY doc_id
        ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    ),
    fates AS (
      SELECT m.source, m.nt,
        CASE WHEN m.nt < {_MIN_TOKENS} THEN 'quality'
             WHEN ex.rn > 1 THEN 'exact'
             WHEN m.doc_id IN (SELECT doc_b FROM nd_drop)
               THEN 'neardup'
             WHEN m.doc_id IN (SELECT doc_id FROM contam)
               THEN 'contam'
             WHEN e.cum > {_BUDGET} THEN 'budget'
             ELSE 'kept' END AS fate
      FROM meta m
      LEFT JOIN ex ON ex.doc_id = m.doc_id
      LEFT JOIN e ON e.doc_id = m.doc_id
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_input,
      CAST(sum(CASE WHEN fate = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_quality,
      CAST(sum(CASE WHEN fate = 'exact' THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_exact,
      CAST(sum(CASE WHEN fate = 'neardup' THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_neardup,
      CAST(sum(CASE WHEN fate = 'contam' THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_contam,
      CAST(sum(CASE WHEN fate = 'budget' THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_budget,
      CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
        AS kept_docs,
      CAST(sum(CASE WHEN fate = 'kept' THEN nt ELSE 0 END) AS BIGINT)
        AS kept_tokens
    FROM fates GROUP BY source
"""


@register("curation_end_to_end", oracle=_ORACLE)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five-stage funnel (module docstring): all-integer output,
    every doc charged to the first stage that drops it."""
    from history_collector_spark.queries.dedup import _doc_shingles

    # r15: spread() the single-row-group scan (guide §2.5) and pin
    # meta — it anchors FIVE consumer subtrees (quality chain, both
    # near-dup broadcast id-sets, the fate assembly), each of which
    # would re-run the scan + split + md5 on one task otherwise.
    docs = spread(
        table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ),
        spark,
    )
    meta = (
        docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select(
            "doc_id", "source",
            F.size(F.split("text", r"\s+")).cast("long").alias("nt"),
            F.md5("text").alias("h"),
        )
        .transform(pin_local)
    )
    q = meta.filter(F.col("nt") >= _MIN_TOKENS)
    wex = Window.partitionBy("h").orderBy("doc_id")
    ex = q.withColumn("rn", F.row_number().over(wex))
    b = ex.filter(F.col("rn") == 1).select("doc_id", "source", "nt")

    # near-dup drops: the session pair table (scales with duplication)
    # with both ends restricted to exact-dedup survivors
    b_ids = b.select("doc_id")
    pairs = verified_pair_table(spark, sf_dir).filter(
        F.col("jaccard") >= _NEARDUP_J
    )
    nd_drop = (
        pairs.join(
            F.broadcast(b_ids.withColumnRenamed("doc_id", "doc_a")),
            "doc_a",
        )
        .join(
            F.broadcast(b_ids.withColumnRenamed("doc_id", "doc_b")),
            "doc_b",
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        # r15 batch 6: consumed twice (c and the fate assembly) — each
        # consumer re-ran the pair-table joins otherwise. Tiny id-set.
        .transform(pin_local)
    )
    c = b.join(nd_drop, "doc_id", "left_anti")

    # decontamination: broadcast benchmark gram set, semi-join probe.
    # The shingle explode is rebuilt over the SAME spread scan (r15):
    # _doc_shingles would fuse the explode into a fresh one-task scan,
    # and the frame is consumed twice (benchmark set + probe side).
    from history_collector_spark.functions.nlp import shingle_rows

    sh = shingle_rows(
        docs.withColumn("lang", F.lit(""))
    ).select("doc_id", "g")
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("g").distinct()
    )
    contam = (
        sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id").distinct()
        # r15 batch 6: consumed by d AND the fate assembly, and d's
        # range-prefix-sum repartitionByRange adds a boundary-sampling
        # pass — without the pin the full corpus shingle explode ran
        # up to three times. Tiny id-set (contaminated docs only).
        .transform(pin_local)
    )
    d = c.join(contam, "doc_id", "left_anti")

    # budget: two-phase range prefix sum (never a per-source window
    # over raw rows)
    e = grouped_range_prefix_sum(
        d, ["source"], [F.col("doc_id")], "nt", out_col="cum"
    ).select("doc_id", F.col("cum"))

    fate = (
        meta.join(
            ex.select("doc_id", "rn"), "doc_id", "left"
        )
        .join(nd_drop.withColumn("nd", F.lit(1)), "doc_id", "left")
        .join(contam.withColumn("ct", F.lit(1)), "doc_id", "left")
        .join(e, "doc_id", "left")
        .select(
            "source", "nt",
            F.when(F.col("nt") < _MIN_TOKENS, "quality")
            .when(F.col("rn") > 1, "exact")
            .when(F.col("nd") == 1, "neardup")
            .when(F.col("ct") == 1, "contam")
            .when(F.col("cum") > _BUDGET, "budget")
            .otherwise("kept")
            .alias("fate"),
        )
    )
    out = fate.groupBy("source").agg(
        F.count("*").alias("n_input"),
        F.sum((F.col("fate") == "quality").cast("long")).alias(
            "drop_quality"
        ),
        F.sum((F.col("fate") == "exact").cast("long")).alias("drop_exact"),
        F.sum((F.col("fate") == "neardup").cast("long")).alias(
            "drop_neardup"
        ),
        F.sum((F.col("fate") == "contam").cast("long")).alias(
            "drop_contam"
        ),
        F.sum((F.col("fate") == "budget").cast("long")).alias(
            "drop_budget"
        ),
        F.sum((F.col("fate") == "kept").cast("long")).alias("kept_docs"),
        F.sum(
            F.when(F.col("fate") == "kept", F.col("nt")).otherwise(0)
        ).alias("kept_tokens"),
    )
    return out
