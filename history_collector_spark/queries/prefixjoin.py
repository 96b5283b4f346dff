"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family) — the deterministic counterpart to the MinHash-LSH pipeline.

Where LSH (dedup.py) trades a small miss probability for bounded work,
prefix filtering is EXACT: under a global token order, any two sets
with Jaccard >= tau must share at least one element inside their
(|x| - ceil(tau*|x|) + 1)-element prefixes, so joining on prefix
elements yields a candidate superset with zero false negatives
(Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07 —
public literature, no code reused). Ordering tokens by ascending
document frequency makes prefixes maximally rare, so candidate volume
is costed by Σ over PREFIX tokens of df², a strict subset of the full
inverted-index join's Σ df² (dedup_ngram_jaccard) — the standard way
an exact similarity join survives web scale.

The reference has no similarity machinery at all (its dedup is the
per-ledger INSERT key, python/main.py:79-83); this operator exists for
the training-data curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.queries.dedup import _doc_shingles
from history_collector_spark.registry import register

_TAU = 0.6


@register(
    "dedup_prefix_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    sets AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks WHERE len(t) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= {_TAU}
    """,
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs (within a language block) with trigram-shingle
    Jaccard >= 0.6, found EXACTLY — the oracle brute-forces every pair
    to prove no candidate is ever missed.

    Plan shape: one (lang, g) hash join attaches df to each shingle row
    (the df table is a vocabulary-bounded map-side-combined aggregate);
    one doc_id shuffle assembles each doc's df-sorted shingle array
    (the same single inverted-index-style exchange dedup_ngram_jaccard
    pays); the prefix slice is row-local; the candidate self-join keys
    on prefix shingles only — rare by construction of the df ordering —
    and the verify joins the bounded sets table twice by doc id. No
    stage is ever all-pairs."""
    sh = _doc_shingles(spark, sf_dir)
    df = sh.groupBy("lang", "g").agg(F.count("*").alias("df"))
    keyed = sh.join(df, ["lang", "g"])
    # (df, g) struct sort = ascending global rarity order, total because
    # g is unique within the struct comparison
    docs = keyed.groupBy("doc_id", "lang").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("g")))
        ).alias("sorted")
    )
    sets = docs.select(
        "doc_id",
        "lang",
        F.transform(F.col("sorted"), lambda x: x["g"]).alias("s"),
        F.size("sorted").alias("n"),
    )
    prefix_len = F.col("n") - F.ceil(F.lit(_TAU) * F.col("n")) + 1
    pre = sets.select(
        "doc_id",
        "lang",
        F.explode(
            F.slice(F.col("s"), F.lit(1), prefix_len.cast("int"))
        ).alias("g"),
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b")
    )
    jac = F.size(F.array_intersect("s_a", "s_b")) / F.size(
        F.array_union("s_a", "s_b")
    ).cast("double")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _TAU)
        .select("doc_a", "doc_b", "lang", "jaccard")
    )
