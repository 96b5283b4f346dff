"""CCNet-style perplexity partitioning (Wenzek et al. 2020,
arXiv:1911.00359): score every document with a language-model
perplexity proxy, cut each source into head / middle / tail at the
per-source tertiles, and report the bucket manifest — the standard
"keep the head, sample the middle, drop the tail" crawl-curation step.

The per-doc score is the trigram-LM mean NLL (same LM as
text_perplexity_lm: p(w3|w1,w2) = c3 / prefix_count, both exact
integer counts). Two determinism decisions matter here, because the
tertile CUTOFF comparison consumes raw doubles (the round-to-6 parity
contract protects output values, not comparisons):

* the per-doc NLL is an ORDERED fold — scored trigrams come back from
  the LM join in arbitrary order, so they are re-sorted by document
  position (sort_array over collect_list of (pos, prob) structs) and
  summed left-to-right. Identical texts therefore produce the exact
  same double in both engines, and the tie-goes-lower rule is
  well-defined; an unordered float avg would let two copies of the
  same document land on opposite sides of a cutoff by 1 ulp.
* cutoffs are nearest-rank (percentile_disc) — actual data values,
  never interpolated micro-precision floats (PARITY.md rule).

Scale shape mirrors curation_curriculum_phases' broadcast-cutoff
policy: no per-source total-order window anywhere — the cutoffs are a
bounded per-source percentile_disc aggregate broadcast back for a
range-comparison assignment.

Reference scope: kinecosystem/history-collector has no corpus ops;
LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

# per-doc ordered-fold mean NLL under the corpus trigram LM; pos keeps
# document order so list_sum replays the Spark fold sequence
_SCORED_SQL = """
  toks AS (
    SELECT doc_id, source,
           string_split_regex(lower(text), '\\s+') AS w
    FROM documents
  ),
  tri AS (
    SELECT doc_id, source, i AS pos,
           w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
    FROM toks, (SELECT unnest(range(1, 2000)) AS i)
    WHERE i <= len(w) - 2
  ),
  lm3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri GROUP BY w1, w2, w3),
  lm2 AS (SELECT w1, w2, sum(c3) AS c2 FROM lm3 GROUP BY w1, w2),
  probs AS (
    SELECT lm3.w1, lm3.w2, lm3.w3,
           CAST(lm3.c3 AS DOUBLE) / CAST(lm2.c2 AS DOUBLE) AS prob
    FROM lm3 JOIN lm2 ON lm3.w1 = lm2.w1 AND lm3.w2 = lm2.w2
  ),
  scored AS (
    SELECT tri.doc_id, tri.source,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           list_sum(list_transform(
             list(probs.prob ORDER BY tri.pos), p -> -ln(p)))
             / count(*) AS mean_nll
    FROM tri JOIN probs
      ON tri.w1 = probs.w1 AND tri.w2 = probs.w2 AND tri.w3 = probs.w3
    GROUP BY tri.doc_id, tri.source
  ),
  cuts AS (
    SELECT source,
           min(CASE WHEN CAST(r AS DOUBLE) / n >= 1.0/3
                    THEN mean_nll END) AS c1,
           min(CASE WHEN CAST(r AS DOUBLE) / n >= 2.0/3
                    THEN mean_nll END) AS c2
    FROM (
      SELECT source, mean_nll,
             row_number() OVER (PARTITION BY source ORDER BY mean_nll) AS r,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    ) GROUP BY source
  ),
  bucketed AS (
    -- tie policy: a score exactly at a cutoff goes to the BETTER
    -- (lower-perplexity) bucket
    SELECT s.source, s.mean_nll,
           CASE WHEN s.mean_nll <= c.c1 THEN 'head'
                WHEN s.mean_nll <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c ON s.source = c.source
  )
"""


@register(
    "curation_perplexity_buckets",
    oracle=f"""
    WITH {_SCORED_SQL}
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(mean_nll) AS min_nll,
           max(mean_nll) AS max_nll
    FROM bucketed
    GROUP BY source, bucket
    """,
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail manifest per source: bucket sizes plus each
    bucket's NLL envelope (min/max are stored-value endpoints).

    Scale shape: the LM build and scoring join are the
    text_perplexity_lm subtree (uniform trigram keys, map-side
    combines); the per-doc sort is doc-bounded inside the groupBy; the
    tertile cutoffs are a bounded per-source percentile_disc aggregate
    broadcast back — no per-source total-order window (the shape the
    round-8 window plan guard enforces). Docs with < 3 tokens have no
    trigrams and are absent, matching the oracle."""
    # spread() the single-row-group scan (r15, guide §2.5): the
    # trigram struct-transform + explode fuse into the scan stage and
    # the frame is consumed twice (LM counts and the scoring join), so
    # one-task scans paid the explode twice serially.
    docs = spread(
        table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ),
        spark,
    )
    t = docs.select(
        "doc_id",
        "source",
        F.split(F.lower(F.col("text")), r"\s+").alias("w"),
    )
    idx = F.when(
        F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri_arr = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at("w", i).alias("w1"),
            F.element_at("w", i + 1).alias("w2"),
            F.element_at("w", i + 2).alias("w3"),
        ),
    )
    flat = t.select(
        "doc_id", "source", F.explode(tri_arr).alias("g")
    ).select("doc_id", "source", "g.pos", "g.w1", "g.w2", "g.w3")
    # r15 optimization (the multiply-consumed-frame persist
    # discipline): `flat` feeds the LM counts AND the scoring join, so
    # the tokenize + trigram explode ran twice even after spread().
    flat = pin_local(flat)
    lm3 = flat.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    prefix_w = Window.partitionBy("w1", "w2")
    p = lm3.select(
        "w1",
        "w2",
        "w3",
        (
            F.col("c3").cast("double")
            / F.sum("c3").over(prefix_w).cast("double")
        ).alias("prob"),
    )
    # ordered fold: re-sort each doc's scored trigrams by position so
    # the NLL sum is a deterministic left-to-right sequence (see module
    # docstring), then one division by the trigram count
    scored = (
        flat.join(p, ["w1", "w2", "w3"])
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sort_array(
                F.collect_list(F.struct("pos", "prob"))
            ).alias("pp"),
        )
        .select(
            "doc_id",
            "source",
            (
                F.aggregate(
                    "pp", F.lit(0.0), lambda acc, x: acc - F.log(x["prob"])
                )
                / F.col("n_trigrams").cast("double")
            ).alias("mean_nll"),
        )
        # same discipline: `scored` feeds the cutoff aggregate AND the
        # bucket assignment join — pinned, the LM join + per-doc NLL
        # fold runs once (doc-cardinality rows, bounded).
    ).transform(pin_local)
    cuts = scored.groupBy("source").agg(
        F.expr(
            "percentile_disc(1.0/3) WITHIN GROUP (ORDER BY mean_nll)"
        ).alias("c1"),
        F.expr(
            "percentile_disc(2.0/3) WITHIN GROUP (ORDER BY mean_nll)"
        ).alias("c2"),
    )
    bucketed = scored.join(F.broadcast(cuts), "source").select(
        "source",
        "mean_nll",
        F.when(F.col("mean_nll") <= F.col("c1"), "head")
        .when(F.col("mean_nll") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("mean_nll").alias("min_nll"),
        F.max("mean_nll").alias("max_nll"),
    )
