"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much more likely its
hashed-n-gram features are under a target (high-quality) corpus than
under the raw pool, then keep the top slice. The production shape for
"make 100 TB of crawl look like Wikipedia" selection.

Pipeline (all JVM-side):
1. word bigrams per doc (zip_with over two token-array slices — O(len)
   per doc even under projection collapse; see _gram_expr),
2. each gram hashed into one of 256 buckets with the cross-engine
   md5 idiom (conv(substr(md5,1,8),16,10) % 256),
3. bucket unigram counts under target (source = 'src0') vs raw (the
   rest) — a 256-key aggregate with map-side combine, collected
   driver-side (bounded),
4. add-1-smoothed log-likelihood ratio per bucket, embedded back into
   the plan as a 256-double literal array,
5. per-doc importance logweight = left-fold of lambda[bucket(g)] over
   the doc's grams (F.aggregate — sequential in doc order, so the
   float sum is deterministic and the oracle's list_sum replays it).

Reference scope: kinecosystem/history-collector has no selection ops;
LLM-pipeline extension tier.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_N_BUCKETS = 256
_TARGET_SOURCE = "src0"

# per-doc bigram list + md5 bucket, shared by the oracle SQL of both
# queries: gs is in document order (list_sum later replays the Spark
# left-fold order)
_DSIR_SQL = f"""
  toks AS (
    SELECT doc_id, source,
           string_split_regex(lower(text), '\\s+') AS w
    FROM documents
  ),
  gr AS (
    SELECT doc_id, source,
           list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                          i -> w[i] || ' ' || w[i+1]) AS gs
    FROM toks
  ),
  occ AS (
    SELECT source = '{_TARGET_SOURCE}' AS tgt,
           CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
             % {_N_BUCKETS} AS bucket
    FROM (SELECT source, unnest(gs) AS g FROM gr)
  ),
  cnt AS (
    SELECT bucket,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
           sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
    FROM occ GROUP BY bucket
  ),
  tot AS (
    SELECT CAST(sum(ct) AS BIGINT) AS t_total,
           CAST(sum(cr) AS BIGINT) AS r_total
    FROM cnt
  ),
  lam_rows AS (
    SELECT g.b AS bucket,
           ln(CAST(coalesce(cnt.ct, 0) + 1 AS DOUBLE)
              / CAST(tot.t_total + {_N_BUCKETS} AS DOUBLE))
           - ln(CAST(coalesce(cnt.cr, 0) + 1 AS DOUBLE)
                / CAST(tot.r_total + {_N_BUCKETS} AS DOUBLE)) AS lam
    FROM (SELECT unnest(range(0, {_N_BUCKETS})) AS b) g
    LEFT JOIN cnt ON cnt.bucket = g.b, tot
  ),
  laml AS (SELECT list(lam ORDER BY bucket) AS l FROM lam_rows),
  dw AS (
    SELECT gr.doc_id, gr.source,
           CAST(len(gs) AS BIGINT) AS n_grams,
           coalesce(list_sum(list_transform(gs, g ->
             laml.l[(CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
                     % {_N_BUCKETS}) + 1])), 0.0) AS dsir_logweight
    FROM gr, laml
  )
"""


_LAM_CACHE: dict[tuple[str, str], list[float]] = {}


def _gram_expr() -> Column:
    """Word-bigram array over the bound token column ``w``, O(len) per
    doc. NOT transform(sequence, i -> element_at(w, i)...): Catalyst's
    CollapseProject inlines ``w = split(text)`` into such a lambda and
    the document is re-split at every gram position — the O(len²) trap
    cross_source_contamination documents, and binding w in its own
    projection does NOT survive the collapse when another projection
    sits between it and the consumer. zip_with evaluates both slice
    arguments ONCE per row, then iterates the materialized arrays."""
    n = F.size("w")
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice("w", 1, n - 1),
            F.slice(F.col("w"), 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bucket(g: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % _N_BUCKETS
    )


def _lambda_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """256 smoothed log-likelihood ratios, one distributed count pass;
    memoized per (session, corpus) so both registered queries share it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LAM_CACHE.get(key)
    if cached is not None:
        return cached
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    tgt = F.col("source") == _TARGET_SOURCE
    # bounded 256-key count aggregate -> driver (the only collect; the
    # corpus never touches the driver)
    cnt = (
        toks.select(tgt.alias("tgt"), F.explode(_gram_expr()).alias("g"))
        .select("tgt", _bucket(F.col("g")).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(F.col("tgt"), 0).otherwise(1)).alias("cr"),
        )
        .collect()
    )
    ct = [0] * _N_BUCKETS
    cr = [0] * _N_BUCKETS
    for r in cnt:
        ct[r["bucket"]] = int(r["ct"])
        cr[r["bucket"]] = int(r["cr"])
    t_total, r_total = sum(ct), sum(cr)
    lam = [
        math.log((ct[b] + 1) / (t_total + _N_BUCKETS))
        - math.log((cr[b] + 1) / (r_total + _N_BUCKETS))
        for b in range(_N_BUCKETS)
    ]
    _LAM_CACHE[key] = lam
    return lam


def _doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_grams, dsir_logweight) for every document."""
    lam = _lambda_vector(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.split(F.lower(F.col("text")), r"\s+").alias("w"),
    )
    gr = toks.select("doc_id", "source", _gram_expr().alias("gs"))
    lam_arr = F.array(*[F.lit(v) for v in lam])
    # left fold in document order: deterministic float sum, mirrored by
    # the oracle's list_sum over the same ordered gram list
    weight = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(lam_arr, (_bucket(g) + 1).cast("int")),
    )
    return gr.select(
        "doc_id",
        "source",
        F.size("gs").cast("long").alias("n_grams"),
        weight.alias("dsir_logweight"),
    )


@register(
    "curation_dsir_weights",
    oracle=f"""
    WITH {_DSIR_SQL}
    SELECT doc_id, source, n_grams, dsir_logweight
    FROM dw
    ORDER BY dsir_logweight DESC, doc_id
    LIMIT 100
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 documents by DSIR importance logweight — the slice a
    target-matched pretraining mix would keep first.

    Scale shape: two corpus passes (bucket counts, then per-doc fold),
    both map-only except one 256-key aggregate; the top-k is
    TakeOrderedAndProject (per-partition heads, no global sort), with
    (weight DESC, doc_id) making the boundary deterministic under
    duplicate texts."""
    return (
        _doc_weights(spark, sf_dir)
        .orderBy(F.desc("dsir_logweight"), "doc_id")
        .limit(100)
    )


@register(
    "curation_dsir_selection",
    oracle=f"""
    WITH {_DSIR_SQL}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dsir_logweight > 0.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(sum(CASE WHEN dsir_logweight > 0.0 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS sel_rate
    FROM dw
    GROUP BY source
    """,
)
def curation_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DSIR selection rate at the natural threshold
    (logweight > 0 = "more target-like than raw-like") — the sanity
    readout before resampling: the target source should self-select
    near 1.0 and each raw source's rate measures its target overlap.

    Integer counts + one int/int division — parity-exact; the float
    threshold compare feeds on the same deterministic per-doc fold as
    curation_dsir_weights."""
    dw = _doc_weights(spark, sf_dir)
    sel = F.sum(
        F.when(F.col("dsir_logweight") > 0.0, 1).otherwise(0)
    )
    return dw.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        sel.alias("n_selected"),
        (sel.cast("double") / F.count("*")).alias("sel_rate"),
    )
