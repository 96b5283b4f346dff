"""Corpus-health audits over the embeddings and documents tables.

A training-data pipeline watches its corpus the way the reference
watches its ledger stream (failure notification, SURVEY §2.7e) — not
per-record errors but distribution-level drift: dead embedding
dimensions after a bad encoder deploy, collapsed-norm vectors, label
centroids drifting together, vocabulary shrinking between crawls.
These queries are that monitoring surface as one-pass Spark plans.

Scale rules: everything collapses to a bounded key space (64 dims,
~10 labels, a handful of sources) in ONE pass with map-side partial
aggregation; the only joins are between already-aggregated
bounded-cardinality tables, all broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import (
    EXPECTED_EMBEDDING_DIMS,
    checked_embedding,
    spread,
    table,
)
from history_collector_spark.registry import register

# The dim-indexed oracles unnest range(1, dim+1); deriving the bound from the
# single catalog constant keeps the fixture width in exactly one place —
# checked_embedding() fails loudly if the parquet width ever disagrees.
_DIM_UB = EXPECTED_EMBEDDING_DIMS + 1

# ---------------------------------------------------------------------------
# Per-dimension health: dead dims, mean/variance per coordinate.
# ---------------------------------------------------------------------------


@register(
    "embedding_dim_health",
    oracle="""
    SELECT CAST(i - 1 AS INT) AS dim,
           avg(CAST(embedding[i] AS DOUBLE)) AS mean_val,
           var_samp(CAST(embedding[i] AS DOUBLE)) AS var_val,
           avg(CASE WHEN abs(embedding[i]) < 1e-6 THEN 1.0 ELSE 0.0 END)
             AS frac_nearzero
    FROM embeddings, (SELECT unnest(range(1, {dim_ub})) AS i) r
    GROUP BY 1
    """.format(dim_ub=_DIM_UB),
)
def embedding_dim_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-coordinate mean / variance / near-zero fraction across the
    corpus — the "dead dimension" audit run after every encoder change
    (a dim whose variance collapses carries no signal and poisons
    cosine geometry).

    posexplode fans each vector into 64 (dim, value) rows, which the
    partial aggregate collapses to 64 groups map-side — the shuffle
    moves O(64 x partitions) pre-aggregated rows, not O(rows x 64).
    """
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode(checked_embedding()).alias("dim", "v")
    ).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    return exploded.groupBy("dim").agg(
        F.avg("v").alias("mean_val"),
        F.var_samp("v").alias("var_val"),
        F.avg(F.when(F.abs("v") < 1e-6, 1.0).otherwise(0.0)).alias("frac_nearzero"),
    )


# ---------------------------------------------------------------------------
# Norm audit per label: collapsed or exploded vector magnitudes.
# ---------------------------------------------------------------------------


@register(
    "embedding_norm_audit",
    oracle="""
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           avg(nrm) AS avg_norm,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate
    FROM n GROUP BY label
    """,
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm distribution per label: collapsed (near-zero) vectors
    break cosine similarity (division by ~0) and exploding norms flag
    un-normalized encoder output. Norm is a map-only array fold
    (F.aggregate, JVM-side); the aggregate has label-cardinality keys.
    """
    emb = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg("nrm").alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            F.sum(F.when(F.col("nrm") < 1e-6, 1).otherwise(0)).alias("n_degenerate"),
        )
    )


# ---------------------------------------------------------------------------
# Label-centroid geometry: pairwise cosine between class centroids.
# ---------------------------------------------------------------------------


@register(
    "label_centroid_distances",
    oracle="""
    WITH dims AS (
      SELECT label, CAST(i - 1 AS INT) AS dim,
             avg(CAST(embedding[i] AS DOUBLE)) AS m
      FROM embeddings, (SELECT unnest(range(1, {dim_ub})) AS i) r
      GROUP BY 1, 2
    ), nrm AS (
      SELECT label, sqrt(sum(m * m)) AS n FROM dims GROUP BY label
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b, sum(a.m * b.m) AS dot
      FROM dims a JOIN dims b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT d.label_a, d.label_b, d.dot / (na.n * nb.n) AS centroid_cos
    FROM dots d
    JOIN nrm na ON d.label_a = na.label
    JOIN nrm nb ON d.label_b = nb.label
    """.format(dim_ub=_DIM_UB),
)
def label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between label centroids — classes
    whose centroids converge are losing separability (label noise or
    embedding drift).

    The only full-data pass is the (label, dim) mean — bounded keys,
    map-side combined. Everything after runs on labels x 64 rows:
    the dim-aligned self-join and the norm joins are all broadcast,
    so the pairwise stage costs nothing at any corpus size.
    """
    emb = table(spark, sf_dir, "embeddings")
    dims = (
        emb.select("label", F.posexplode(checked_embedding()).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
    )
    nrm = dims.groupBy("label").agg(F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("n"))
    a = dims.select(
        F.col("label").alias("label_a"), "dim", F.col("m").alias("ma")
    )
    b = dims.select(
        F.col("label").alias("label_b"), "dim", F.col("m").alias("mb")
    )
    dots = (
        a.join(F.broadcast(b), "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("dot"))
    )
    na = nrm.select(F.col("label").alias("label_a"), F.col("n").alias("na"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("n").alias("nb"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("centroid_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Hapax legomena ratio: vocabulary fragility per source.
# ---------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    oracle="""
    WITH words AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) WHERE w <> ''
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           sum(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) / count(*) AS hapax_ratio
    FROM words GROUP BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each source's vocabulary that occurs exactly once
    (hapax legomena). A crawl whose hapax ratio spikes is ingesting
    noise (OCR junk, random IDs); one that collapses is boilerplate.

    Tokenization matches text_token_stats (whitespace split, lowered).
    One (source, word) shuffle with map-side counts, then a
    source-cardinality rollup on the same grouping prefix.
    """
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return words.groupBy("source").agg(
        F.count("*").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        (
            F.sum(F.when(F.col("c") == 1, 1.0).otherwise(0.0)) / F.count("*")
        ).alias("hapax_ratio"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth: vocab vs token volume per source.
# ---------------------------------------------------------------------------


@register(
    "text_vocab_growth",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
      FROM documents
    ), filtered AS (
      SELECT source, w FROM toks WHERE w <> ''
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS vocab_size,
           ln(count(DISTINCT w)) / ln(count(*)) AS heaps_beta
    FROM filtered GROUP BY source
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent per source: vocab ~ tokens^beta, so beta =
    ln(vocab)/ln(tokens). Natural text sits near 0.5; beta ~ 1 means
    every token is new (ID spam), beta ~ 0 means a closed template
    vocabulary. Token count and distinct count come from one grouped
    pass (Spark plans count+count_distinct as a two-phase expand with
    partial aggregation — no extra job, no driver loop).
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return toks.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("w").alias("vocab_size"),
        (F.log(F.count_distinct("w")) / F.log(F.count("*"))).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# Cross-source contamination: pairwise shingle-set Jaccard between
# sources — which crawls are re-serving each other's content?
# ---------------------------------------------------------------------------


@register(
    "cross_source_contamination",
    oracle="""
    WITH grams AS (
      -- the Spark side dedups/joins on xxhash64(gram) (8-byte shuffle
      -- keys); the oracle keeps the raw gram string — counts are equal
      -- as long as no two distinct grams collide in 64 bits, which the
      -- parity gate itself verifies on the fixed testdata
      SELECT DISTINCT source, g AS gh
      FROM (
        SELECT source,
               unnest(list_transform(
                 range(1, greatest(len(w) - 2, 0) + 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM (
          SELECT source, string_split_regex(lower(text), '\\s+') AS w
          FROM documents
        )
      ) WHERE g IS NOT NULL
    ), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM grams a JOIN grams b ON a.gh = b.gh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_common,
           i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.source_a = sa.source
    JOIN sizes sb ON i.source_b = sb.source
    WHERE i.n_common > 0
    """,
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise word-3-gram Jaccard between sources: a pair whose
    overlap spikes means one crawl is mirroring another (shared CDN,
    scraped re-posts) and the mix is double-counting that content.

    The full-data pass is ONE gram-keyed aggregate building each
    gram's source-set (collect_set dedups map-side), so a gram
    contributes at most sources² pairs (sources are few), never
    documents². Sizes and pair counts both derive from that grouped
    frame via narrow explodes; the size join is broadcast. The
    df-explosion risk of raw-document inverted indexes (see
    dedup_ngram_jaccard's cap) doesn't arise: the set bounds every
    posting list at the source count.
    """
    # spread() the single-row-group scan (r15, guide §2.5): the
    # split + gram transform + xxhash all fuse into the scan stage.
    docs = spread(
        table(spark, sf_dir, "documents").select("source", "text"), spark
    )
    # Bind the token array in a projection FIRST: a lambda that
    # references the raw split(lower(text)) expression re-splits the
    # whole document for every gram position — O(len²) per doc, and
    # measured at ~8 s of the query's sf0.1 wall before this fix. Over
    # the bound column the transform is the O(len) it looks like.
    toks = docs.select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    n = F.size("w")
    # Docs with <3 tokens emit NO grams (the oracle's substring-count
    # formulation does the same).  Guarded with F.when because
    # F.sequence(0, -1) yields a *descending* [0, -1] — not an empty
    # array — whose element_at(w, 0) aborts under ANSI mode.
    gram3 = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at("w", i + 1),
                F.element_at("w", i + 2),
                F.element_at("w", i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # hash each gram to 64 bits (native xxhash64, JVM-side) before the
    # distinct: the dedup shuffle and the self-join then move 8-byte
    # longs instead of 3-word strings — same postings bound, a
    # several-fold reduction in shuffled bytes. The oracle dedups the
    # raw gram strings; counts agree unless two distinct grams collide
    # in 64 bits (P ~ n^2/2^65 — and deterministic, so the parity gate
    # itself proves absence on the test corpus; at 100 TB a stray
    # collision shifts n_common by 1, immaterial for a contamination
    # ratio)
    gh = F.xxhash64(F.col("g"))
    # ONE gram-keyed exchange replaces the former distinct + self-join
    # (three full-width shuffles): collect_set(source) dedups in the
    # partial aggregate map-side and every gram's posting is bounded by
    # the source count, so the merged state is a tiny set per gh. Both
    # downstream facts — per-source distinct-gram sizes and the
    # source-pair co-occurrence counts — are derived from that grouped
    # frame with narrow explodes; nothing corpus-wide shuffles again.
    grouped = (
        toks.select("source", F.explode(gram3).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("source", gh.alias("gh"))
        .groupBy("gh")
        .agg(F.collect_set("source").alias("ss"))
    )
    sizes = (
        grouped.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ss"),
                lambda x: F.transform(
                    F.col("ss"),
                    lambda y: F.struct(
                        x.alias("source_a"), y.alias("source_b")
                    ),
                ),
            )
        ),
        lambda p: p["source_a"] < p["source_b"],
    )
    inter = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") > 0)
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Blocklist hit audit: where does the banned-term filter actually bite?
# ---------------------------------------------------------------------------

# Config in practice; literal here so the DuckDB oracle pins the same list.
BLOCKLIST_TERMS = ("spark", "merge", "window")


@register(
    "curation_blocklist_audit",
    oracle="""
    WITH hits AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) WHERE w IN ('spark', 'merge', 'window')
    ), tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
    )
    SELECT w AS term,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_hit,
           count(DISTINCT doc_id) / n_docs AS frac_docs
    FROM hits, tot
    GROUP BY w, n_docs
    """,
)
def curation_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term impact report for a C4-style blocklist filter: how many
    documents each banned term would remove, BEFORE committing the
    filter — run this first or a single over-broad term silently
    deletes a corpus slice.

    Tokens explode once, the IN-list predicate is a scan-side filter
    (tiny literal list, codegen'd — no join needed for a config-sized
    blocklist), and the term aggregate has blocklist-cardinality keys.
    The doc denominator is a 1-row aggregate broadcast back.
    """
    docs = table(spark, sf_dir, "documents")
    hits = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w").isin(*BLOCKLIST_TERMS))
    )
    tot = docs.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        hits.crossJoin(F.broadcast(tot))
        .groupBy(F.col("w").alias("term"), "n_docs")
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("doc_id").alias("n_docs_hit"),
        )
        .select(
            "term",
            "n_hits",
            "n_docs_hit",
            (F.col("n_docs_hit") / F.col("n_docs")).alias("frac_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility: subword inflation per language.
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS bp,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           sum(bp) / CAST(sum(ws) AS DOUBLE) AS fertility,
           sum(chars) / CAST(sum(bp) AS DOUBLE) AS chars_per_token
    FROM per_doc GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword fertility (BPE-ish tokens per whitespace word) and
    compression (chars per token) by language — the standard check for
    whether a tokenizer under-serves a language (high fertility =
    more tokens per word = shorter effective context for that lang).

    Tokenization matches text_token_stats exactly. Map-only token
    counts per doc, then a lang-cardinality aggregate of the summed
    numerators/denominators (ratio-of-sums, not avg-of-ratios — long
    docs weigh proportionally).
    """
    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    bp = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
        )
    ).cast("long")
    return (
        docs.select(
            "lang",
            ws.alias("ws"),
            bp.alias("bp"),
            F.length("text").cast("long").alias("chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("bp") / F.sum("ws").cast("double")).alias("fertility"),
            (F.sum("chars") / F.sum("bp").cast("double")).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit: how much embedding "energy" survives
# prefix truncation (Kusupati et al. 2022, public MRL formulation) —
# the audit run before serving truncated vectors from an MRL encoder.
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)


@register(
    "embedding_matryoshka_audit",
    oracle="""
    WITH pref AS (
      SELECT e.vec_id, d.d,
        list_sum(list_transform(e.embedding[1:d.d],
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS pss,
        list_sum(list_transform(e.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS tss
      FROM embeddings e, (SELECT unnest([{dims}]) AS d) d
    )
    SELECT CAST(d AS INT) AS prefix_dim,
           avg(pss / tss) AS avg_retained,
           min(pss / tss) AS min_retained,
           CAST(sum(CASE WHEN pss / tss >= 0.9 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_090,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM pref GROUP BY d
    """.format(dims=", ".join(str(d) for d in _MRL_DIMS)),
)
def embedding_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per prefix length (8/16/32/64 dims): mean / worst-case fraction
    of squared-norm energy the prefix retains, and how many vectors
    keep >= 90% — the go/no-go audit before serving truncated
    (Matryoshka) embeddings to cut ANN index cost 2-8x.

    Scale shape: map-only array folds per (vector, prefix) — the
    4-way prefix explode happens BEFORE the fold so each row carries
    one bounded slice, and the only shuffle is the 4-group partial
    aggregate. The slice fold (F.aggregate over F.slice) runs the same
    left-to-right op order as the oracle's list_sum(list_transform)
    so the ratio is engine-stable (drift-class only; parity-audited).
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", checked_embedding().alias("embedding")
    )

    def ssq(col):
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    per = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[F.lit(d) for d in _MRL_DIMS])).alias("d"),
    ).select(
        "vec_id",
        "d",
        ssq(F.slice("embedding", 1, F.col("d"))).alias("pss"),
        ssq(F.col("embedding")).alias("tss"),
    )
    ratio = F.col("pss") / F.col("tss")
    return per.groupBy(F.col("d").cast("int").alias("prefix_dim")).agg(
        F.avg(ratio).alias("avg_retained"),
        F.min(ratio).alias("min_retained"),
        F.sum(F.when(ratio >= 0.9, 1).otherwise(0)).alias("n_above_090"),
        F.count("*").alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# Embedding drift: population-stability index per dimension between a
# reference and a current population — the monitor that catches an
# upstream encoder change or domain shift before it contaminates an
# index build or training run. Fixed value-bucket edges (stored-float
# comparisons: deterministic both engines), Laplace-smoothed
# proportions as single int/int divisions, and a fixed-parenthesized
# 4-term PSI fold — the only cross-engine wobble is libm ln (flip-free
# ulp territory).
# ---------------------------------------------------------------------------

_PSI_EDGES = (-0.25, 0.0, 0.25)  # 4 fixed buckets over the value range


@register(
    "embedding_drift_psi",
    oracle="""
    WITH grid AS (SELECT unnest(range(1, 65)) AS pos),
    v AS (
      SELECT grid.pos - 1 AS dim,
             vec_id % 2 AS pop,
             CASE WHEN CAST(embedding[grid.pos] AS DOUBLE) < -0.25 THEN 0
                  WHEN CAST(embedding[grid.pos] AS DOUBLE) < 0.0 THEN 1
                  WHEN CAST(embedding[grid.pos] AS DOUBLE) < 0.25 THEN 2
                  ELSE 3 END AS b
      FROM embeddings, grid
    ),
    piv AS (
      SELECT dim,
        sum(CASE WHEN pop = 0 THEN 1 ELSE 0 END) AS n_ref,
        sum(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS n_cur,
        sum(CASE WHEN pop = 0 AND b = 0 THEN 1 ELSE 0 END) AS r0,
        sum(CASE WHEN pop = 0 AND b = 1 THEN 1 ELSE 0 END) AS r1,
        sum(CASE WHEN pop = 0 AND b = 2 THEN 1 ELSE 0 END) AS r2,
        sum(CASE WHEN pop = 0 AND b = 3 THEN 1 ELSE 0 END) AS r3,
        sum(CASE WHEN pop = 1 AND b = 0 THEN 1 ELSE 0 END) AS c0,
        sum(CASE WHEN pop = 1 AND b = 1 THEN 1 ELSE 0 END) AS c1,
        sum(CASE WHEN pop = 1 AND b = 2 THEN 1 ELSE 0 END) AS c2,
        sum(CASE WHEN pop = 1 AND b = 3 THEN 1 ELSE 0 END) AS c3
      FROM v GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim,
      CAST(n_ref AS BIGINT) AS n_ref,
      CAST(n_cur AS BIGINT) AS n_cur,
      ((((CAST(r0 + 1 AS DOUBLE) / (n_ref + 4)
          - CAST(c0 + 1 AS DOUBLE) / (n_cur + 4))
         * ln((CAST(r0 + 1 AS DOUBLE) / (n_ref + 4))
              / (CAST(c0 + 1 AS DOUBLE) / (n_cur + 4)))
        + (CAST(r1 + 1 AS DOUBLE) / (n_ref + 4)
           - CAST(c1 + 1 AS DOUBLE) / (n_cur + 4))
          * ln((CAST(r1 + 1 AS DOUBLE) / (n_ref + 4))
               / (CAST(c1 + 1 AS DOUBLE) / (n_cur + 4))))
        + (CAST(r2 + 1 AS DOUBLE) / (n_ref + 4)
           - CAST(c2 + 1 AS DOUBLE) / (n_cur + 4))
          * ln((CAST(r2 + 1 AS DOUBLE) / (n_ref + 4))
               / (CAST(c2 + 1 AS DOUBLE) / (n_cur + 4))))
       + (CAST(r3 + 1 AS DOUBLE) / (n_ref + 4)
          - CAST(c3 + 1 AS DOUBLE) / (n_cur + 4))
         * ln((CAST(r3 + 1 AS DOUBLE) / (n_ref + 4))
              / (CAST(c3 + 1 AS DOUBLE) / (n_cur + 4)))) AS psi
    FROM piv
    """,
)
def embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension PSI between the even-id (reference) and odd-id
    (current) halves of the embedding corpus. Proportions are
    Laplace-smoothed ((c+1)/(n+4): no empty-bucket infinities) single
    divisions of exact integers; the 4 bucket terms fold in one fixed
    parenthesization, matching the oracle's expression shape exactly.

    Scale shape: posexplode to (dim, pop, bucket) grain, then ONE
    map-side-combined hash aggregate pivots everything — 64 output
    rows regardless of corpus size; no window, no join. At 100 TB a
    drift monitor must cost one pass, and this is one pass."""
    emb = table(spark, sf_dir, "embeddings")
    val = F.col("val").cast("double")
    b = (
        F.when(val < _PSI_EDGES[0], 0)
        .when(val < _PSI_EDGES[1], 1)
        .when(val < _PSI_EDGES[2], 2)
        .otherwise(3)
    )
    v = emb.select(
        (F.col("vec_id") % 2).alias("pop"),
        F.posexplode("embedding").alias("dim", "val"),
    ).select("pop", "dim", b.alias("b"))

    def cnt(pop: int, bucket: int):
        return F.sum(
            ((F.col("pop") == pop) & (F.col("b") == bucket)).cast("int")
        )

    piv = v.groupBy("dim").agg(
        F.sum((F.col("pop") == 0).cast("int")).alias("n_ref"),
        F.sum((F.col("pop") == 1).cast("int")).alias("n_cur"),
        *[cnt(0, k).alias(f"r{k}") for k in range(4)],
        *[cnt(1, k).alias(f"c{k}") for k in range(4)],
    )

    def term(k: int):
        p = (F.col(f"r{k}") + 1).cast("double") / (F.col("n_ref") + 4)
        q = (F.col(f"c{k}") + 1).cast("double") / (F.col("n_cur") + 4)
        return (p - q) * F.log(p / q)

    psi = ((term(0) + term(1)) + term(2)) + term(3)
    return piv.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        psi.alias("psi"),
    )
