"""BM25 retrieval scoring over the `documents` table.

The reference exposes account-history lookups through a Flask/SQL surface
(python/api/server.py); a training-data engine needs the text analogue —
rank documents against a term query. BM25 (Robertson/Spärck Jones, public
formula) over whitespace tokens:

    score(D, Q) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * |D|/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

Scale shape: tokenization is map-only (explode), per-(doc, term) counts
shuffle on doc_id+term (high cardinality, no skew), document frequencies
are one small per-term agg that joins back BROADCAST (the query has a
handful of terms, so the df side after the term filter is tiny), and the
corpus constants (N, avgdl) come from one 1-row aggregate cross-joined as
a broadcast. Nothing driver-side; the plan is linear in corpus size and
survives a 1000-executor scale-up — the per-term df agg is the only
global shuffle and it keys on `term`, pruned to |Q| rows before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# Fixed retrieval query — mid-frequency corpus terms so scores separate.
_QUERY_TERMS = ("vector", "stream", "window")
_K1 = 1.2
_B = 0.75
_TOP_K = 20

_TERMS_SQL = ", ".join(f"('{t}')" for t in _QUERY_TERMS)


@register(
    "text_bm25_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    doclen AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ),
    corpus AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl
      FROM doclen
    ),
    q(term) AS (VALUES {_TERMS_SQL}),
    tf AS (
      SELECT tok.doc_id, tok.term, count(*) AS tf
      FROM tok JOIN q USING (term)
      GROUP BY tok.doc_id, tok.term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM tok JOIN q USING (term)
      GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * doclen.dl / corpus.avgdl))
             ) AS bm25
      FROM tf
      JOIN df USING (term)
      JOIN doclen USING (doc_id)
      CROSS JOIN corpus
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, rank FROM (
      SELECT doc_id, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    )
    doclen = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = doclen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtok = tok.filter(F.col("term").isin(*_QUERY_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(doclen, "doc_id")
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(_K1)
                    * (
                        F.lit(1.0 - _B)
                        + F.lit(_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("bm25")
        )
    )
    # global top-k: tiny result, TakeOrderedAndProject — no full sort shuffle
    return (
        scored.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_TOP_K)
        .select(
            "doc_id",
            "bm25",
            # rank over the already-limited 20 rows — single tiny partition
            # by construction, not a scale risk
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("rank"),
        )
    )
