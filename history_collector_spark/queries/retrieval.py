"""BM25 retrieval scoring over the `documents` table.

The reference exposes account-history lookups through its sample query app
(sample/main.py); a training-data engine needs the text analogue —
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
from history_collector_spark.functions.ranking import grouped_range_rank
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


# ---------------------------------------------------------------------------
# MMR diverse re-ranking: relevance is not enough — a retrieval layer
# feeding RAG or training-data selection wants the top-k to COVER the
# query's neighborhood, not repeat its nearest cluster five times.
# Maximal Marginal Relevance (Carbonell & Goldstein 1998, public):
#   pick argmax  lambda * rel(d) - (1 - lambda) * max_{s in S} sim(d, s)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CANDS = 12
_MMR_K = 5

_MMR_COS = """
  list_sum(list_transform(range(1, 65),
    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (q.nrm * c.nrm)
"""


def _mmr_oracle() -> str:
    """Chained-CTE greedy MMR: each selection step is an argmax over
    the not-yet-picked candidates penalized by their max similarity to
    the picks so far — five mechanical layers of the same block."""
    from history_collector_spark.queries.similarity import _panel_sql

    panel = _panel_sql()
    sql = f"""
    WITH emb AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), qpanel AS MATERIALIZED (
      SELECT * FROM emb WHERE {panel}
    ), ranked AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid, {_MMR_COS} AS rel,
             c.embedding AS cemb, c.nrm AS cnrm,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_MMR_COS} DESC, c.vec_id) AS rn
      FROM qpanel q JOIN emb c
        ON q.label = c.label AND q.vec_id != c.vec_id
    ), cands AS MATERIALIZED (
      SELECT qid, cid, rel, cemb, cnrm FROM ranked WHERE rn <= {_MMR_CANDS}
    ), psim AS MATERIALIZED (
      SELECT a.qid, a.cid AS ai, b.cid AS bi,
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.cemb[i] AS DOUBLE) * CAST(b.cemb[i] AS DOUBLE)))
               / (a.cnrm * b.cnrm) AS s
      FROM cands a JOIN cands b ON a.qid = b.qid AND a.cid != b.cid
    ), p1 AS MATERIALIZED (
      SELECT qid, cid, {_MMR_LAMBDA} * rel AS score FROM (
        SELECT qid, cid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, cid) AS rn
        FROM cands) WHERE rn = 1
    ), sel1 AS (SELECT qid, cid FROM p1)"""
    for k in range(2, _MMR_K + 1):
        prev = k - 1
        sql += f""", score{k} AS (
      SELECT c.qid, c.cid,
             {_MMR_LAMBDA} * c.rel - {1 - _MMR_LAMBDA:.1f} * max(p.s) AS mmr
      FROM cands c
      LEFT JOIN sel{prev} e ON e.qid = c.qid AND e.cid = c.cid
      JOIN psim p ON p.qid = c.qid AND p.ai = c.cid
      JOIN sel{prev} s ON s.qid = p.qid AND s.cid = p.bi
      WHERE e.cid IS NULL
      GROUP BY c.qid, c.cid, c.rel
    ), p{k} AS MATERIALIZED (
      SELECT qid, cid, mmr AS score FROM (
        SELECT qid, cid, mmr,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY mmr DESC, cid) AS rn
        FROM score{k}) WHERE rn = 1
    ), sel{k} AS MATERIALIZED (
      SELECT qid, cid FROM sel{prev} UNION ALL SELECT qid, cid FROM p{k}
    )"""
    picks = "\n    UNION ALL\n    ".join(
        f"SELECT qid AS query_id, cid AS neighbor_id, "
        f"CAST({k} AS INT) AS mmr_rank, score AS mmr_score FROM p{k}"
        for k in range(1, _MMR_K + 1)
    )
    return sql + "\n    " + picks


def _mmr_rerank_kernel(pdf):
    """Greedy MMR over one query's bounded candidate set (<= 12 rows):
    12x12 numpy similarity matrix, 5 argmax sweeps — O(k * c^2) on a
    constant-size group."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("cid").reset_index(drop=True)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cemb"]])
    nrm = pdf["cnrm"].to_numpy(dtype=np.float64)
    S = (X @ X.T) / np.outer(nrm, nrm)
    rel = pdf["rel"].to_numpy(dtype=np.float64)
    cids = pdf["cid"].to_numpy()
    n = len(pdf)
    selected: list[int] = []
    out = []
    for rank in range(1, min(_MMR_K, n) + 1):
        best_i, best_score = None, None
        for i in range(n):
            if i in selected:
                continue
            penalty = max(S[i, j] for j in selected) if selected else 0.0
            score = _MMR_LAMBDA * rel[i] - (1 - _MMR_LAMBDA) * penalty
            # tie-break on cid ascending (rows are cid-sorted)
            if best_score is None or score > best_score:
                best_i, best_score = i, score
        selected.append(best_i)
        out.append(
            (int(pdf["qid"][best_i]), int(cids[best_i]), rank, float(best_score))
        )
    return pd.DataFrame(
        out, columns=["query_id", "neighbor_id", "mmr_rank", "mmr_score"]
    )


@register("retrieval_mmr_rerank", oracle=_mmr_oracle())
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-5 per query: take the 12 most-relevant
    same-list candidates, then greedily re-rank with MMR (lambda=0.7)
    so each pick trades relevance against similarity to what's already
    picked. The DuckDB oracle replays the greedy argmax as five chained
    CTE layers — the full selection sequence is oracle-verified, not
    just the candidate pool.

    Scale shape: candidate generation is the IVF probe (bucketed list
    join + per-query WindowGroupLimit top-12); the re-rank is an
    applyInPandas over BOUNDED groups (<= 12 rows each, 12x12 numpy
    sims) — per-query constant work, embarrassingly parallel across
    queries, no driver involvement."""
    from history_collector_spark.functions.nlp import l2_norm

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    # fixed-size query panel (round 11: the %-mod panel grew with the
    # corpus, making panel x same-label candidate ranking quadratic —
    # the ann_ivf_topk defect class caught by the sf10 probe)
    from history_collector_spark.queries.similarity import (
        _sweep_query_filter,
    )

    q = emb.filter(_sweep_query_filter(spark, sf_dir)).alias("q")
    c = emb.alias("c")
    dot = F.aggregate(
        F.zip_with(
            F.col("q.embedding"), F.col("c.embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rel = dot / (F.col("q.nrm") * F.col("c.nrm"))
    w = Window.partitionBy("qid").orderBy(F.desc("rel"), "cid")
    cands = (
        q.join(
            c,
            (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("qid"),
            F.col("c.vec_id").alias("cid"),
            rel.alias("rel"),
            F.col("c.embedding").alias("cemb"),
            F.col("c.nrm").alias("cnrm"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_CANDS)
    )
    return cands.groupBy("qid").applyInPandas(
        _mmr_rerank_kernel,
        schema="query_id long, neighbor_id long, mmr_rank int, mmr_score double",
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: the standard hybrid-search combiner (Cormack,
# Clarke & Buettcher SIGIR'09, public formula) — merge N independent
# rankings of the same candidates without score calibration:
#   rrf(d) = sum_r 1 / (k + rank_r(d)),  k = 60
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 20


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), overlap AS (
      SELECT doc_id, count(*) AS hits
      FROM tok WHERE term IN ({", ".join(f"'{t}'" for t in _QUERY_TERMS)})
      GROUP BY doc_id
    ), cand AS (
      SELECT o.doc_id, o.hits, dl.dl
      FROM overlap o JOIN dl USING (doc_id)
    ), ranked AS (
      SELECT doc_id, hits, dl,
             row_number() OVER (ORDER BY hits DESC, doc_id) AS r_sparse,
             row_number() OVER (ORDER BY dl DESC, doc_id) AS r_prior
      FROM cand
    ), fused AS (
      SELECT doc_id,
             CAST(r_sparse AS INT) AS r_sparse,
             CAST(r_prior AS INT) AS r_prior,
             1.0 / ({_RRF_K} + r_sparse) + 1.0 / ({_RRF_K} + r_prior)
               AS rrf_score
      FROM ranked
    )
    SELECT doc_id, r_sparse, r_prior, rrf_score,
           CAST(fused_rank AS INT) AS fused_rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id)
               AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {_RRF_TOP}
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse two rankings of the query's candidate set — sparse term-hit
    count and a document-length prior — with reciprocal-rank fusion.
    The scorers here are deliberately INTEGER-valued (term hits, token
    length) so every rank, and therefore every rrf_score (two exact
    divisions + one add in matched op order), is bit-identical across
    engines; any real scorer ranking (BM25, dense cosine) plugs into
    either leg unchanged.

    Scale shape: candidates are the posting lists of the |Q| query
    terms (df-bounded, the same set text_bm25_retrieval ranks), so the
    two rank windows run over retrieval-sized input, not the corpus;
    the final top-{_RRF_TOP} is TakeOrderedAndProject. The fusion
    itself is rank arithmetic — no score normalization, the property
    that makes RRF the default hybrid combiner at serving time.
    """
    tok = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    overlap = (
        tok.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )
    cand = overlap.join(dl, "doc_id")
    # both leg ranks via the two-phase range helper: a bare global
    # Window.orderBy would funnel the whole candidate set through one
    # task's sort; range slices bound each local sort and only slice
    # counts prefix-sum globally (functions/ranking.py)
    r1 = grouped_range_rank(
        cand, [], [F.col("hits").desc(), F.col("doc_id")], rank_col="r_sparse"
    ).select("doc_id", "hits", "dl", "r_sparse")
    r2 = grouped_range_rank(
        cand.select("doc_id", "dl"),
        [],
        [F.col("dl").desc(), F.col("doc_id")],
        rank_col="r_prior",
    ).select("doc_id", "r_prior")
    ranked = r1.join(r2, "doc_id").select(
        "doc_id",
        F.col("r_sparse").cast("int").alias("r_sparse"),
        F.col("r_prior").cast("int").alias("r_prior"),
    )
    fused = ranked.select(
        "doc_id",
        "r_sparse",
        "r_prior",
        (
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_sparse"))
            + F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_prior"))
        ).alias("rrf_score"),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_RRF_TOP)
        .select(
            "doc_id",
            "r_sparse",
            "r_prior",
            "rrf_score",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_score").desc(), "doc_id"))
            .alias("fused_rank"),
        )
    )
