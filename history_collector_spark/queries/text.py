"""Text analysis over `documents`: language-ID heuristic, quality
scoring, token statistics, document fingerprinting.

All pure Catalyst scalar/array expressions — per-row, shuffle-free,
whole-stage-codegen'd; the natural shape for a 100 TB text-prep sweep
(the scan cost dominates and nothing here adds exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register

# Tiny marker wordlists for the n-gram/stopword language heuristic.
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "de", "los"],
}

_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_language_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(t, x -> x IN ({_sql_list(_LANG_MARKERS["en"])}))) AS en_hits,
             len(list_filter(t, x -> x IN ({_sql_list(_LANG_MARKERS["de"])}))) AS de_hits,
             len(list_filter(t, x -> x IN ({_sql_list(_LANG_MARKERS["fr"])}))) AS fr_hits,
             len(list_filter(t, x -> x IN ({_sql_list(_LANG_MARKERS["es"])}))) AS es_hits
      FROM toks
    )
    SELECT doc_id, lang AS labeled_lang,
           CAST(en_hits AS INT) AS en_hits, CAST(de_hits AS INT) AS de_hits,
           CAST(fr_hits AS INT) AS fr_hits, CAST(es_hits AS INT) AS es_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                WHEN fr_hits >= es_hits THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM scored
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def hits(lang: str) -> F.Column:
        markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(
            F.filter(toks, lambda x: F.array_contains(markers, x))
        )

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits("en").alias("en_hits"),
        hits("de").alias("de_hits"),
        hits("fr").alias("fr_hits"),
        hits("es").alias("es_hits"),
    )
    return scored.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") >= F.col("es_hits")),
            "en",
        )
        .when(
            (F.col("de_hits") >= F.col("fr_hits"))
            & (F.col("de_hits") >= F.col("es_hits")),
            "de",
        )
        .when(F.col("fr_hits") >= F.col("es_hits"), "fr")
        .otherwise("es"),
    )


def with_quality(docs: DataFrame) -> DataFrame:
    """Append the quality-feature columns (len_chars, n_tokens, ratios,
    composite `quality`) to any frame with a `text` column — shared by
    text_quality_score and the composed curation pipeline so both
    score identically in a single scan."""
    toks = F.split(F.col("text"), r"\s+")
    ltoks = F.split(F.lower(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    m = docs.withColumns(
        {
            "len_chars": F.length("text"),
            "n_tokens": F.size(toks),
            "n_digits": F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", "")),
            "n_punct": F.length("text")
            - F.length(F.regexp_replace("text", r"[^a-zA-Z0-9\s]", "")),
            "n_stop": F.size(
                F.filter(ltoks, lambda x: F.array_contains(stop_arr, x))
            ),
        }
    )
    digit_ratio = F.col("n_digits").cast("double") / F.col("len_chars")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return m.withColumns(
        {
            "digit_ratio": digit_ratio,
            "punct_ratio": F.col("n_punct").cast("double") / F.col("len_chars"),
            "stopword_ratio": stop_ratio,
            "avg_token_len": F.col("len_chars").cast("double")
            / F.col("n_tokens"),
            "quality": (
                F.when(F.col("n_tokens") >= 20, 0.4).otherwise(0.0)
                + F.when(stop_ratio.between(0.01, 0.6), 0.3).otherwise(0.0)
                + F.when(digit_ratio < 0.2, 0.3).otherwise(0.0)
            ),
        }
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS INT) AS len_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT)
               AS n_digits,
             CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT)
               AS n_punct,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> x IN ({_sql_list(_STOPWORDS)}))) AS INT) AS n_stop
      FROM documents
    )
    SELECT doc_id, len_chars, n_tokens,
           CAST(n_digits AS DOUBLE) / len_chars AS digit_ratio,
           CAST(n_punct AS DOUBLE) / len_chars AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(len_chars AS DOUBLE) / n_tokens AS avg_token_len,
           (CASE WHEN n_tokens >= 20 THEN 0.4 ELSE 0.0 END
            + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
                   THEN 0.3 ELSE 0.0 END
            + CASE WHEN CAST(n_digits AS DOUBLE) / len_chars < 0.2
                   THEN 0.3 ELSE 0.0 END) AS quality
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return with_quality(docs).select(
        "doc_id", "len_chars", "n_tokens", "digit_ratio", "punct_ratio",
        "stopword_ratio", "avg_token_len", "quality",
    )


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT)
             AS bpeish_tokens,
           CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS INT)
             AS unique_tokens,
           CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
             / len(string_split_regex(text, '\\s+')) AS unique_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    # BPE-ish pre-tokenizer: alpha runs, digit runs, single punct marks
    bpeish = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    uniq = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.size(bpeish).alias("bpeish_tokens"),
        F.size(uniq).alias("unique_tokens"),
        (F.size(uniq).cast("double") / F.size(ws)).alias("unique_ratio"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_fp,
           list_min(list_transform(
             range(1, greatest(length(text) - 3, 1)),
             i -> md5(substr(text, CAST(i AS INT), 5)))) AS min_shingle_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread() the single-row-group scan (r15, guide §2.5): this query
    # is pure map-only — len(text) md5s per row fused into the scan
    # stage — so its entire cost sat on one task; the round-robin
    # exchange ships only (doc_id, text) rows.
    docs = spread(table(spark, sf_dir, "documents"), spark)
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    # rolling 5-char-shingle min-hash as an in-place array transform:
    # the lambda's only outer reference is the raw text column (nothing
    # recomputed per element, so the no-CSE HOF pitfall doesn't bite),
    # and nothing explodes — the explode-positions formulation carried a
    # full copy of text through every one of its len(text) rows (O(len^2)
    # bytes materialized) and measured 8x slower. Map-only, no shuffle.
    n = F.length("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1))),
        lambda i: F.md5(F.substring(F.col("text"), i, F.lit(5))),
    )
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("content_fp"),
        F.array_min(grams).alias("min_shingle_fp"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition (the Gopher/RefinedWeb quality signal):
# what fraction of a doc's word bigrams is the single most frequent
# bigram, and how diverse are its bigrams overall. Highly repetitive
# docs (boilerplate, keyword stuffing, generation loops) score high
# top_bigram_frac / low distinct_ratio and get filtered.
# ---------------------------------------------------------------------------


@register(
    "text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w), 2)),
                    i -> concat_ws(' ', w[i], w[i+1]))) AS g
      FROM t
    ), counts AS (
      SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac,
           CAST(count(*) AS DOUBLE) / sum(c) AS distinct_ratio
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only bigram formation: tokenize once into a materialized
    array column, assemble bigrams with a transform over indices
    (the lambda references the bound array — no per-element
    re-evaluation; inlining split() in the lambda body would be
    O(len^2) per doc), explode, then ONE (doc_id, g) shuffle with
    map-side combine. The previous window-lead formulation shuffled
    and sorted every token row first.

    A 1-token doc keeps its degenerate single-token 'bigram'
    (element_at past the end is NULL; concat_ws skips it), matching
    the oracle's greatest(len, 2) range.
    """
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i), F.element_at("w", i + 1)
        ),
    )
    bg = t.select("doc_id", F.explode(grams).alias("g"))
    counts = bg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"),
        (F.count("*").cast("double") / F.sum("c")).alias("distinct_ratio"),
    )


# ---------------------------------------------------------------------------
# Corpus trigram language-model counts: c(w1 w2 w3) and the conditional
# P(w3 | w1 w2) — the n-gram statistics behind perplexity filtering and
# classic LM baselines (reported for trigrams seen >= 3 times; the
# conditional is normalized over ALL continuations, not just reported
# ones).
# ---------------------------------------------------------------------------


@register(
    "text_ngram_lm",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ), tri AS (
      SELECT unnest(list_transform(
               range(1, greatest(len(w) - 1, 1)),
               i -> struct_pack(w1 := w[i], w2 := w[i+1], w3 := w[i+2])))
             AS s
      FROM t
    ), c AS (
      SELECT s.w1 AS w1, s.w2 AS w2, s.w3 AS w3, count(*) AS c
      FROM tri GROUP BY 1, 2, 3
    ), p AS (
      SELECT concat_ws(' ', w1, w2) AS prefix, w3, c,
             CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY w1, w2) AS prob
      FROM c
    )
    SELECT prefix, w3, c, prob FROM p WHERE c >= 3
    """,
)
def text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: trigram rows are MAP-ONLY (tokenize into a
    materialized array, transform-over-indices assembles trigrams from
    the bound column, explode — no exchange, unlike the earlier
    posexplode + window-lead form that shuffled every token row),
    counts are a map-side-combined groupBy on the trigram itself (high-
    cardinality, evenly distributed key), and the conditional divides
    by a window sum partitioned by the bigram PREFIX — also high-
    cardinality, so no reducer ever sees more than one prefix's
    continuations. The c >= 3 report filter runs AFTER the window so
    probabilities stay normalized over every continuation.
    """
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.lower(F.col("text")), r"\s+").alias("w"))
    idx = F.when(
        F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri_arr = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("w", i).alias("w1"),
            F.element_at("w", i + 1).alias("w2"),
            F.element_at("w", i + 2).alias("w3"),
        ),
    )
    tri = t.select(F.explode(tri_arr).alias("g")).select("g.w1", "g.w2", "g.w3")
    counts = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c"))
    pref = Window.partitionBy("w1", "w2")
    return (
        counts.select(
            F.concat_ws(" ", "w1", "w2").alias("prefix"),
            "w3",
            "c",
            (F.col("c").cast("double") / F.sum("c").over(pref)).alias("prob"),
        )
        .filter(F.col("c") >= 3)
    )


# ---------------------------------------------------------------------------
# LM-based perplexity scoring: each document's average trigram negative
# log-likelihood under the corpus's own trigram LM — the model-based
# quality filter (perplexity gating a la CCNet/Gopher) expressed
# relationally. Self-scored, so there is no OOV smoothing to pick:
# every doc trigram exists in the LM by construction.
# ---------------------------------------------------------------------------


@register(
    "text_perplexity_lm",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ), tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
               i -> struct_pack(w1 := w[i], w2 := w[i+1], w3 := w[i+2]))) AS g
      FROM t
    ), flat AS (
      SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tri
    ), lm3 AS (
      SELECT w1, w2, w3, count(*) AS c3 FROM flat GROUP BY 1, 2, 3
    ), lm2 AS (
      SELECT w1, w2, sum(c3) AS c2 FROM lm3 GROUP BY 1, 2
    ), p AS (
      SELECT w1, w2, w3, CAST(c3 AS DOUBLE) / c2 AS prob
      FROM lm3 JOIN lm2 USING (w1, w2)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           avg(-ln(prob)) AS avg_nll
    FROM flat JOIN p USING (w1, w2, w3)
    GROUP BY doc_id
    """,
)
def text_perplexity_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: trigram rows are map-only (bound-array transform,
    zero exchanges); the LM is two map-side-combined aggregates on
    high-cardinality uniform keys (the trigram, then its prefix); the
    scoring join shuffles on the trigram key — both sides uniform, no
    hot key — and the per-doc reduction combines map-side. At 100 TB
    the LM table is what you would persist; here it is recomputed from
    the same map-only subtree (cheaper than pinning for one pass).
    Docs with < 3 tokens have no trigrams and no row, matching the
    oracle's empty unnest.
    """
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    idx = F.when(
        F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri_arr = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("w", i).alias("w1"),
            F.element_at("w", i + 1).alias("w2"),
            F.element_at("w", i + 2).alias("w3"),
        ),
    )
    flat = t.select("doc_id", F.explode(tri_arr).alias("g")).select(
        "doc_id", "g.w1", "g.w2", "g.w3"
    )
    lm3 = flat.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    prefix_w = Window.partitionBy("w1", "w2")
    p = lm3.select(
        "w1", "w2", "w3",
        (F.col("c3").cast("double") / F.sum("c3").over(prefix_w)).alias("prob"),
    )
    return (
        flat.join(p, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.avg(-F.log("prob")).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram novelty: the fraction of a document's distinct 3-shingles that
# appear NOWHERE else in the corpus (df == 1) — the standard
# diversity/novelty signal a data-mixing pass uses to up-weight unique
# content (the inverse of boilerplate density).
# ---------------------------------------------------------------------------


@register(
    "text_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS g
      FROM toks
    ),
    df AS (
      SELECT g, count(*) AS df FROM sh GROUP BY g
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (df.df = 1) AS BIGINT) AS n_novel,
           CAST(count(*) FILTER (df.df = 1) AS DOUBLE) / count(*) AS novelty
    FROM sh JOIN df USING (g)
    GROUP BY sh.doc_id
    """,
)
def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: a df==1 shingle belongs to exactly ONE document, so
    its owner is recoverable from the same shingle-keyed aggregate that
    computes df (min(doc_id) of a singleton group IS the owner) — no
    join of the corpus-wide shingle rows back to the df table. One
    g-keyed agg (map-side combined) -> filter to singletons (tiny) ->
    one doc-keyed count, plus an independent doc-keyed shingle count
    that rides the map-only shingle pass. The corpus shingle rows
    shuffle ONCE; under heavy replication (hot shingles with df~100)
    the old join-back formulation re-shuffled them a second time into
    skewed reducers — measured 18.8x at 100x vs ~4x for this shape.
    """
    from history_collector_spark.queries.dedup import _doc_shingles

    sh = _doc_shingles(spark, sf_dir).select("doc_id", "g")
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    novel_per_doc = (
        sh.groupBy("g")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("owner"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count("*").alias("n_novel"))
    )
    return per_doc.join(novel_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        (
            F.coalesce("n_novel", F.lit(0)).cast("double") / F.col("n_shingles")
        ).alias("novelty"),
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    freq AS (
      SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
      FROM chars GROUP BY doc_id, c
    ),
    tot AS (
      SELECT doc_id, sum(n) AS total, count(*) AS n_distinct FROM freq
      GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(t.total AS BIGINT) AS n_chars,
           CAST(t.n_distinct AS INT) AS distinct_chars,
           -sum((f.n / t.total) * log2(f.n / t.total)) AS entropy_bits
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id, t.total, t.n_distinct
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    cheap quality/noise signal (gibberish and binary spill score low
    or extreme; natural text sits in a band).

    Relational form at scale: explode characters, (doc, char) counts
    with map-side combine, then one doc-keyed reduction — all keys
    high-cardinality and balanced, no Python. The (doc, char) explode
    multiplies rows by text length, but both aggs combine map-side so
    the shuffle carries (doc, char, count), bounded by alphabet x docs.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    )
    freq = chars.groupBy("doc_id", "c").agg(
        F.count("*").cast("double").alias("n")
    )
    w_tot = Window.partitionBy("doc_id")
    scored = freq.withColumn("total", F.sum("n").over(w_tot)).withColumn(
        "n_distinct", F.count("*").over(w_tot)
    )
    p = F.col("n") / F.col("total")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.first("total").cast("long").alias("n_chars"),
            F.first("n_distinct").cast("int").alias("distinct_chars"),
            (-F.sum(p * F.log2(p))).alias("entropy_bits"),
        )
    )


@register(
    "text_source_drift_kl",
    oracle="""
    WITH toks AS (
      SELECT source, w FROM documents,
           UNNEST(string_split_regex(text, '\\s+')) AS u(w)
      WHERE w != ''
    ),
    per_source AS (
      SELECT source, w, CAST(count(*) AS DOUBLE) AS n
      FROM toks GROUP BY source, w
    ),
    source_tot AS (
      SELECT source, sum(n) AS tot FROM per_source GROUP BY source
    ),
    corpus AS (
      SELECT w, CAST(sum(n) AS DOUBLE) AS cn FROM per_source GROUP BY w
    ),
    corpus_tot AS (SELECT sum(cn) AS ctot FROM corpus)
    SELECT ps.source,
           CAST(st.tot AS BIGINT) AS n_tokens,
           sum((ps.n / st.tot)
               * log2((ps.n / st.tot) / (c.cn / ct.ctot))) AS kl_bits
    FROM per_source ps
    JOIN source_tot st USING (source)
    JOIN corpus c USING (w)
    CROSS JOIN corpus_tot ct
    GROUP BY ps.source, st.tot
    """,
)
def text_source_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL(source unigram dist || corpus
    unigram dist) in bits — the mixture-monitoring score that flags a
    source whose language shifted (crawl rot, spam floods) before it
    pollutes a training mix.

    Scale shape: one (source, term) aggregation (map-side combined)
    feeds everything; the corpus marginal is a term-keyed re-reduce of
    that aggregate (vocab-sized, co-partitioned join back on the term);
    the corpus total is a 1-row broadcast. Every term present in a
    source is present in the corpus, so no zero-handling is needed.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    per_source = toks.groupBy("source", "w").agg(
        F.count("*").cast("double").alias("n")
    )
    w_src = Window.partitionBy("source")
    ps = per_source.withColumn("tot", F.sum("n").over(w_src))
    corpus = per_source.groupBy("w").agg(F.sum("n").alias("cn"))
    ctot = corpus.agg(F.sum("cn").alias("ctot"))
    p = F.col("n") / F.col("tot")
    q = F.col("cn") / F.col("ctot")
    return (
        ps.join(corpus, "w")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            F.first("tot").cast("long").alias("n_tokens"),
            F.sum(p * F.log2(p / q)).alias("kl_bits"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy hitters: tokens above a frequency share, found by the mergeable
# Misra-Gries summary + an exact verification pass (two corpus scans,
# bounded state everywhere in between).
# ---------------------------------------------------------------------------

# 1/_HH_SHARE_K is the frequency-share threshold; _HH_COUNTERS (> the
# threshold's k) is the per-partition summary size. The MG guarantee:
# any token with global count > N/k survives in at least one
# partition's k-counter summary (pigeonhole), so the union of partition
# candidates is a SUPERSET of the true heavy hitters and the exact pass
# only ever narrows it.
_HH_SHARE_K = 30
_HH_COUNTERS = 64


def _mg_candidates(it):
    """Per-partition Misra-Gries over Arrow batches. Python cost per
    batch is O(batch_vocab + counters): pandas value_counts does the
    row-bounded work in C; the summary merge (add counts, then subtract
    the (k+1)-st largest and drop non-positive — the mergeable-summaries
    formulation) touches only the bounded counter dict."""
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in it:
        for tok, n in pdf["tok"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(n)
        if len(counters) > _HH_COUNTERS:
            cut = sorted(counters.values(), reverse=True)[_HH_COUNTERS]
            counters = {
                t: c - cut for t, c in counters.items() if c - cut > 0
            }
    yield pd.DataFrame({"tok": list(counters)})


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(
               string_split_regex(text, '\\s+'), x -> x != '')) AS tok
      FROM documents
    ), tot AS (SELECT count(*) AS n FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences,
           (1.0 * count(*)) / (SELECT n FROM tot) AS share
    FROM toks GROUP BY tok
    HAVING count(*) > (SELECT 1.0 * n FROM tot) / {_HH_SHARE_K}
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with frequency share > 1/30 of the corpus. Scan 1 feeds
    per-partition Misra-Gries summaries (mapInPandas, bounded counters)
    whose union is a small candidate superset; scan 2 exact-counts ONLY
    the candidates (broadcast semi-join, map-side combine caps the
    shuffle at counters x partitions rows) and filters by the true
    threshold. Nothing ever group-bys the full vocabulary — the shape
    that matters when the key space is web-scale n-grams, not a toy
    wordlist. The total-token denominator is a map-only 1-row aggregate
    (bounded driver scalar)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cand = toks.mapInPandas(_mg_candidates, schema="tok string").distinct()
    total = toks.groupBy().count().collect()[0][0]  # 1-row scalar
    return (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > F.lit(total) / _HH_SHARE_K)
        .select(
            "tok",
            "n_occurrences",
            ((F.lit(1.0) * F.col("n_occurrences")) / F.lit(total)).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations: adjacent-bigram pointwise mutual information — the
# classic collocation signal ("new york" vs chance co-occurrence).
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


@register(
    "text_pmi_bigrams",
    oracle=f"""
    WITH toks AS (
      SELECT string_split_regex(text, '\\s+') AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS t1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS t2
      FROM toks
    ), pc AS (
      SELECT t1, t2, count(*) AS n_pair FROM bg GROUP BY 1, 2
    ), uc AS (
      SELECT tok, count(*) AS n_tok FROM (
        SELECT unnest(t) AS tok FROM toks
      ) GROUP BY tok
    ), nb AS (SELECT sum(n_pair) AS nb FROM pc),
    nu AS (SELECT sum(n_tok) AS nu FROM uc)
    SELECT p.t1, p.t2, CAST(p.n_pair AS BIGINT) AS n_pair,
           ln((((1.0 * p.n_pair) * nu.nu) * nu.nu)
              / (((1.0 * nb.nb) * a.n_tok) * b.n_tok)) AS pmi
    FROM pc p
    JOIN uc a ON p.t1 = a.tok
    JOIN uc b ON p.t2 = b.tok
    CROSS JOIN nb CROSS JOIN nu
    WHERE p.n_pair >= {_PMI_MIN_COUNT}
    """,
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI = ln(P(ab) / (P(a)P(b))) for adjacent token bigrams with
    count >= 5. Bigram formation is MAP-ONLY (transform over the
    materialized token array — same no-token-shuffle discipline as
    shingle_rows); both count tables are vocabulary-bounded map-side-
    combined aggregates, the totals are broadcast 1-row normalizers,
    and the unigram joins key on distinct-bigram rows (vocab^2-bounded,
    never corpus-sized). The PMI expression is authored with identical
    association order in both engines so the doubles agree bit-for-bit
    (the compare's 1e-6 tolerance never has to absorb algebra)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.col("text"), r"\s+").alias("t"))
    idx = F.when(
        F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = t.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("t", i).alias("t1"),
                    F.element_at("t", i + 1).alias("t2"),
                ),
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    pc = bg.groupBy("t1", "t2").agg(F.count("*").alias("n_pair"))
    uc = (
        t.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    nb = pc.agg(F.sum("n_pair").alias("nb"))
    nu = uc.agg(F.sum("n_tok").alias("nu"))
    a = uc.select(F.col("tok").alias("t1"), F.col("n_tok").alias("na"))
    b = uc.select(F.col("tok").alias("t2"), F.col("n_tok").alias("nb_tok"))
    pmi = F.log(
        (F.lit(1.0) * F.col("n_pair") * F.col("nu") * F.col("nu"))
        / (F.lit(1.0) * F.col("nb") * F.col("na") * F.col("nb_tok"))
    )
    return (
        pc.filter(F.col("n_pair") >= _PMI_MIN_COUNT)
        .join(a, "t1")
        .join(b, "t2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select("t1", "t2", "n_pair", pmi.alias("pmi"))
    )


# ---------------------------------------------------------------------------
# Zipf fit: regress log(freq) on log(rank) over the corpus vocabulary
# — the one-number summary of whether token mass looks like natural
# language (slope ~ -1) or synthetic/templated text.
# ---------------------------------------------------------------------------


@register(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(
               string_split_regex(text, '\\s+'), x -> x != '')) AS tok
      FROM documents
    ), c AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), r AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           regr_slope(ln(1.0 * n), ln(1.0 * rank)) AS zipf_slope,
           regr_intercept(ln(1.0 * n), ln(1.0 * rank)) AS zipf_intercept,
           regr_r2(ln(1.0 * n), ln(1.0 * rank)) AS r2
    FROM r
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of log-frequency vs log-rank. Token counts
    are a vocabulary-bounded aggregate; the rank window and the
    regr_* reduction then run over VOCAB rows, not corpus rows — the
    single-partition rank exchange moves one row per type, which is
    the one case where a global sort is the right plan (and the
    plan-guard's partial-aggregate exemption recognizes it). regr_*
    are sufficient-statistics aggregates: map-side combinable, one
    pass."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    c = toks.groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    r = c.withColumn("rank", F.row_number().over(w))
    lf = F.log(F.lit(1.0) * F.col("n"))
    lr = F.log(F.lit(1.0) * F.col("rank"))
    return r.agg(
        F.count("*").alias("n_types"),
        F.regr_slope(lf, lr).alias("zipf_slope"),
        F.regr_intercept(lf, lr).alias("zipf_intercept"),
        F.regr_r2(lf, lr).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV audit: what fraction of each source's token
# stream (and type inventory) a fixed top-V vocabulary captures — the
# go/no-go check before freezing a tokenizer vocab for training.
# ---------------------------------------------------------------------------

_VOCAB_V = 256


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ), counts AS (
      SELECT term, count(*) AS n FROM tok GROUP BY term
    ), vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY n DESC, term) AS rn
        FROM counts
      ) WHERE rn <= {_VOCAB_V}
    ), per AS (
      SELECT t.source, t.term, count(*) AS occ,
             max(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS in_vocab
      FROM tok t LEFT JOIN vocab v ON t.term = v.term
      GROUP BY t.source, t.term
    )
    SELECT source,
           CAST(sum(occ) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN in_vocab = 1 THEN occ ELSE 0 END) AS BIGINT)
             AS n_tokens_in_vocab,
           CAST(sum(CASE WHEN in_vocab = 1 THEN occ ELSE 0 END) AS DOUBLE)
             / sum(occ) AS token_coverage,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(in_vocab) AS BIGINT) AS n_types_in_vocab,
           CAST(sum(in_vocab) AS DOUBLE) / count(*) AS type_coverage
    FROM per GROUP BY source
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token- and type-level coverage of the global top-{_VOCAB_V}
    vocabulary, per source: low token_coverage in one source means the
    frozen vocab will shred that source into OOV fragments (fertility
    blow-up), the audit run before committing a tokenizer.

    Scale shape: term counts are map-side combined on the term key; the
    vocab is the top-V of that aggregate (V rows, broadcast back into
    the per-(source, term) join), and the final reduce has
    source-cardinality keys. Both coverage ratios are a single
    int/int division of exactly-summed counts — bit-stable across
    engines. The top-V cut's rank window runs over the DISTINCT-term
    aggregate, never the token stream.
    """
    tok = table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("n"))
    vocab = (
        counts.select(
            "term",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "term"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= _VOCAB_V)
        .select("term")
    )
    per = (
        tok.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))), "term", "left")
        .groupBy("source", "term")
        .agg(
            F.count("*").alias("occ"),
            F.max(F.coalesce(F.col("in_v"), F.lit(0))).alias("in_vocab"),
        )
    )
    return per.groupBy("source").agg(
        F.sum("occ").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab") == 1, F.col("occ")).otherwise(0)).alias(
            "n_tokens_in_vocab"
        ),
        (
            F.sum(
                F.when(F.col("in_vocab") == 1, F.col("occ")).otherwise(0)
            ).cast("double")
            / F.sum("occ")
        ).alias("token_coverage"),
        F.count("*").alias("n_types"),
        F.sum("in_vocab").alias("n_types_in_vocab"),
        (F.sum("in_vocab").cast("double") / F.count("*")).alias("type_coverage"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword scoring (Rose et al. 2010, public formulation): candidate
# phrases are maximal stopword-free runs; a word's score is its
# co-occurrence degree over its frequency. Degree sums PHRASE LENGTHS —
# an integer aggregate — so every score is one exact int/int division.
# ---------------------------------------------------------------------------

_RAKE_STOPS = (
    "the|and|of|a|an|to|in|is|it|for|on|with|as|at|by|be|or|this|that|are|was"
)
_RAKE_TOP = 30


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH cut AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(lower(text), '[.,;:!?()]', '|', 'g'),
               '\\b({_RAKE_STOPS})\\b', '|', 'g') AS cuttext
      FROM documents
    ), phrases AS (
      SELECT doc_id, trim(p) AS phrase
      FROM cut, unnest(string_split(cuttext, '|')) AS t(p)
      WHERE trim(p) != ''
    ), pwords AS (
      SELECT phrase,
             list_filter(string_split_regex(phrase, '\\s+'),
                         w -> w != '') AS words
      FROM phrases
    ), wrows AS (
      SELECT unnest(words) AS word, len(words) AS plen
      FROM pwords
    ), scored AS (
      SELECT word,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree,
             CAST(sum(plen) AS DOUBLE) / count(*) AS score
      FROM wrows GROUP BY word
    )
    SELECT word, freq, degree, score, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY score DESC, word) AS INT)
                  AS rank
      FROM scored
    ) WHERE rank <= {_RAKE_TOP}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level RAKE keyword ranking: split every document into
    stopword-free candidate phrases (punctuation and a fixed stopword
    list both cut), then score each word by degree/frequency where
    degree accumulates the lengths of the phrases it appears in —
    words that ride long multi-word phrases outrank bare frequent
    words, which is RAKE's whole trick.

    Scale shape: phrase extraction is map-only regexp work; the only
    shuffle is the word-keyed count/sum aggregate (map-side combined)
    and the top-{_RAKE_TOP} cut over the distinct-word aggregate.
    freq and degree are exact integer sums, so score is a single
    int/int division — bit-identical across engines, no float-order
    risk anywhere (parity-audited).
    """
    cut = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[.,;:!?()]", "|"),
            rf"\b({_RAKE_STOPS})\b",
            "|",
        ).alias("cuttext"),
    )
    phrases = (
        cut.select(F.explode(F.split("cuttext", r"\|")).alias("p"))
        .select(F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    pwords = phrases.select(
        F.filter(F.split("phrase", r"\s+"), lambda w: w != "").alias("words")
    )
    wrows = pwords.select(
        F.explode("words").alias("word"), F.size("words").alias("plen")
    )
    scored = wrows.groupBy("word").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("degree"),
        (F.sum("plen").cast("double") / F.count("*")).alias("score"),
    )
    return (
        scored.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "word"))
            .alias("rank"),
        )
        .filter(F.col("rank") <= _RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram probabilities (Kneser & Ney 1995 / Chen & Goodman
# 1998, public formulation) — the smoothing every production n-gram LM
# uses: absolute discounting plus a CONTINUATION back-off (how many
# contexts a word completes, not how often it occurs).
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_TOP = 50


@register(
    "text_kneser_ney_bigrams",
    oracle=f"""
    WITH toks AS (
      SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM toks
    ), cb AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
    ), cl AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n_right
      FROM cb GROUP BY w1
    ), cr AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n_left FROM cb GROUP BY w2
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM cb)
    SELECT w1, w2, c12, c1, n_right, n_left, n_types,
           (greatest(c12 - {_KN_D}, 0.0) / c1)
             + ((({_KN_D} * n_right) / c1) * ((1.0 * n_left) / n_types))
             AS p_kn,
           rank
    FROM (
      SELECT cb.w1, cb.w2, cb.c12, cl.c1, cl.n_right, cr.n_left, tot.n_types,
             CAST(row_number() OVER (ORDER BY cb.c12 DESC, cb.w1, cb.w2)
                  AS INT) AS rank
      FROM cb JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN tot
    ) WHERE rank <= {_KN_TOP}
    """,
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney probability for the corpus's top
    {_KN_TOP} bigrams: P(w2|w1) = max(c12 - d, 0)/c1 +
    (d * |right types of w1| / c1) * (|left contexts of w2| / |bigram
    types|), d = {_KN_D}. The continuation term is KN's insight — a
    word that completes MANY contexts backs off high even if rare
    (the "san francisco" test: "francisco" is frequent but only ever
    follows "san", so its continuation probability is tiny).

    Scale shape: bigram formation is map-only over the token array;
    every count table is vocabulary-bounded and map-side combined;
    the rank window runs over the distinct-bigram aggregate. All
    inputs to p_kn are exact integers and the expression uses the
    same parenthesized op order on both engines (parity-audited).
    """
    toks = table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    bg = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cl = cb.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_right")
    )
    cr = cb.groupBy("w2").agg(F.count("*").alias("n_left"))
    tot = cb.agg(F.count("*").alias("n_types"))
    joined = (
        cb.join(cl, "w1")
        .join(cr, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c12", "c1", "n_right", "n_left", "n_types",
            F.row_number()
            .over(Window.orderBy(F.col("c12").desc(), "w1", "w2"))
            .alias("rank"),
        )
        .filter(F.col("rank") <= _KN_TOP)
    )
    p_kn = (
        F.greatest(F.col("c12") - F.lit(_KN_D), F.lit(0.0)) / F.col("c1")
    ) + (
        ((F.lit(_KN_D) * F.col("n_right")) / F.col("c1"))
        * ((F.lit(1.0) * F.col("n_left")) / F.col("n_types"))
    )
    return joined.select(
        "w1", "w2", "c12", "c1", "n_right", "n_left", "n_types",
        p_kn.alias("p_kn"),
        "rank",
    )


# ---------------------------------------------------------------------------
# Burrows' Delta (Burrows 2002, public stylometry formulation): distance
# between sources in z-scored most-frequent-word space — the corpus
# forensics measure for "do these two sources share an author/register".
# ---------------------------------------------------------------------------

_DELTA_TOP_WORDS = 30


@register(
    "text_burrows_delta",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
      FROM documents
    ), stok AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY source
    ), topw AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rn
        FROM tok GROUP BY w
      ) WHERE rn <= {_DELTA_TOP_WORDS}
    ), freq AS (
      SELECT t.source, t.w,
             (1.0 * count(*)) / min(s.n_tok) AS f
      FROM tok t JOIN topw USING (w) JOIN stok s ON s.source = t.source
      GROUP BY t.source, t.w
    ), grid AS (
      SELECT s.source, topw.w, coalesce(f.f, 0.0) AS f
      FROM stok s CROSS JOIN topw
      LEFT JOIN freq f ON f.source = s.source AND f.w = topw.w
    ), stats AS (
      SELECT w, avg(f) AS mu, greatest(stddev_samp(f), 1e-30) AS sd
      FROM grid GROUP BY w
    ), z AS (
      SELECT g.source, g.w, (g.f - st.mu) / st.sd AS z
      FROM grid g JOIN stats st USING (w)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           avg(abs(a.z - b.z)) AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Burrows' Delta between sources over the corpus's top
    {_DELTA_TOP_WORDS} words: relative frequencies z-scored ACROSS
    sources per word (zero-variance guard at 1e-30), then the mean
    absolute z-difference per source pair. Low delta = similar
    register/style; the measure that found Elena Ferrante.

    Scale shape: the only corpus-sized pass is the (source, word)
    count with the broadcast top-word filter; everything after runs on
    sources x {_DELTA_TOP_WORDS} rows, and the pair join is over the
    bounded source vocabulary. Frequencies are single int/int
    divisions; downstream z-arithmetic is drift-class only.
    """
    tok = table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    )
    stok = tok.groupBy("source").agg(F.count("*").alias("n_tok"))
    topw = (
        tok.groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "w"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= _DELTA_TOP_WORDS)
        .select("w")
    )
    freq = (
        tok.join(F.broadcast(topw), "w")
        .join(stok, "source")
        .groupBy("source", "w")
        .agg(((F.lit(1.0) * F.count("*")) / F.min("n_tok")).alias("f"))
    )
    grid = (
        stok.crossJoin(F.broadcast(topw))
        .join(freq, ["source", "w"], "left")
        .select("source", "w", F.coalesce("f", F.lit(0.0)).alias("f"))
    )
    stats = grid.groupBy("w").agg(
        F.avg("f").alias("mu"),
        F.greatest(F.stddev_samp("f"), F.lit(1e-30)).alias("sd"),
    )
    z = grid.join(F.broadcast(stats), "w").select(
        "source", "w", ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z")
    )
    a = z.select(F.col("source").alias("source_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "w", F.col("z").alias("zb"))
    return (
        a.join(F.broadcast(b), "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.avg(F.abs(F.col("za") - F.col("zb"))).alias("delta"))
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal: a dictionary coder as a universal
# repetition detector — boilerplate, templated spam, and token-loop
# junk compress far better than natural prose, so compression ratio is
# one of the cheapest high-recall corpus filters (used alongside the
# Gopher heuristics in real pretraining pipelines).
#
# Round-13 redesign (VERDICT r12 item 3, oracle-izing the last text
# rows-only row): the coder is a FULLY SPECIFIED greedy-LZ cost bound
# instead of zlib, so the compressed size is exactly computable by any
# engine and the query gains a DuckDB value-hash oracle. Model: slide
# a 16-char window over the document (one shingle per char position).
# A position whose shingle content has occurred earlier in the
# document is coverable by a back-reference, so repeated positions are
# charged one 24-bit match token per 16 chars; each FIRST occurrence
# of a shingle content is a literal char (8 bits); the trailing 15
# chars (no full window) are literals; 32 bits of header. Overlapping
# shingles make the detector phase-invariant — repetition at ANY
# period is caught, unlike block-aligned dedup which misses periods
# coprime to the block size. Every arithmetic step is integer-exact
# in both Spark and DuckDB; only the final ratios involve floats,
# each produced by a SINGLE division of exact integers —
# IEEE-identical cross-engine.
# ---------------------------------------------------------------------------

_CQ_K = 16  # shingle width (chars)
_CQ_LIT_BITS = 8  # literal char cost
_CQ_REF_BITS = 24  # back-reference token cost (covers up to 16 chars)
_CQ_HDR_BITS = 32  # per-document header


@register(
    "text_compression_quality",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS L
      FROM documents WHERE length(text) > 0
    ),
    s AS (
      SELECT doc_id,
             count(DISTINCT substr(text, CAST(p AS INT), {_CQ_K})) AS dd,
             count(*) AS n
      FROM d,
           LATERAL (SELECT unnest(generate_series(
                      1, L - {_CQ_K - 1})) AS p) ps
      WHERE L >= {_CQ_K}
      GROUP BY doc_id
    ),
    pd AS (
      SELECT d.doc_id, d.source, d.L,
             ({_CQ_HDR_BITS}
              + {_CQ_LIT_BITS} * (coalesce(s.dd, 0)
                                  + least(d.L, {_CQ_K - 1}))
              + {_CQ_REF_BITS}
                * ((coalesce(s.n, 0) - coalesce(s.dd, 0) + 15) // 16)
              + 7) // 8 AS cc
      FROM d LEFT JOIN s ON d.doc_id = s.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(L) AS BIGINT) AS raw_chars,
           CAST(sum(cc) AS BIGINT) AS compressed_chars,
           CAST(sum(cc) AS DOUBLE) / sum(L) AS corpus_ratio,
           min(CAST(cc AS DOUBLE) / L) AS min_ratio,
           max(CAST(cc AS DOUBLE) / L) AS max_ratio,
           CAST(sum(CASE WHEN CAST(cc AS DOUBLE) / L < 0.4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suspicious
    FROM pd GROUP BY source
    """,
)
def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility profile under the greedy-LZ cost
    bound (see module comment): corpus-level ratio, per-doc extremes,
    and how many docs fall under the "suspiciously compressible" 0.4
    threshold (a ratio that low on prose-length text almost always
    means templated/repeated content).

    Plan shape (round-14 rewrite of the r13 slope-watch row): the
    per-doc distinct-shingle count is ROW-LOCAL, so it is computed
    inside the row with size(array_distinct(transform(...))) — the
    document's shingles never leave the row, let alone the task. The
    only shuffle left is the tiny per-source reduce (one partial row
    per task). The previous explode + countDistinct plan shipped ~16x
    the corpus bytes through an exchange (at 100 TB: a ~1.6 PB
    shuffle) for the same integers; its sf1->sf10 slope was x8.6, the
    repo's worst live row. Transient per-row cost is O(16L) bytes for
    the shingle array — bounded by the longest single document, not
    the corpus, and freed within the codegen stage.

    Verified by tests/test_round6.py::test_compression_quality_signal
    (a 50x-repeated document must land far below its single copy and
    below the 0.4 threshold, vs a pinned pure-Python third opinion)
    plus the DuckDB oracle at driver hash discipline.
    """
    K = _CQ_K
    # spread() the single-row-group scan (r15, guide §2.5): the whole
    # per-doc distinct-shingle transform is row-local and fuses into
    # the scan stage, so without it every document is costed on ONE
    # task; the only downstream exchange is the tiny per-source reduce,
    # which is indifferent to the upstream partitioning.
    d = (
        spread(
            table(spark, sf_dir, "documents").select(
                "doc_id", "source", "text"
            ),
            spark,
        )
        .filter(F.length("text") > 0)
        .withColumn("L", F.length("text"))
    )
    long_enough = F.col("L") >= K
    dd = F.when(
        long_enough,
        F.expr(
            f"size(array_distinct(transform(sequence(1, L - {K - 1}),"
            f" p -> substring(text, p, {K}))))"
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    n = F.when(
        long_enough, (F.col("L") - F.lit(K - 1)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    per_doc = (
        d.select("source", "L", dd.alias("dd"), n.alias("n"))
        .select(
            "source",
            "L",
            (
                F.lit(_CQ_HDR_BITS)
                + F.lit(_CQ_LIT_BITS)
                * (F.col("dd") + F.least(F.col("L"), F.lit(K - 1)))
                + F.lit(_CQ_REF_BITS)
                * F.expr("(n - dd + 15) div 16")
                + F.lit(7)
            ).alias("bits"),
        )
        # integer division keeps the byte count exact at any magnitude
        .select("source", "L", F.expr("bits div 8").alias("cc"))
    )
    ratio = F.col("cc").cast("double") / F.col("L")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("L").alias("raw_chars"),
        F.sum("cc").alias("compressed_chars"),
        (F.sum("cc").cast("double") / F.sum("L")).alias("corpus_ratio"),
        F.min(ratio).alias("min_ratio"),
        F.max(ratio).alias("max_ratio"),
        F.sum(F.when(ratio < 0.4, 1).otherwise(0)).alias("n_suspicious"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition panel (Rae et al. 2021, table A1): fraction
# of a document's characters covered by its most-covering word n-gram
# (n=2,3) and by word n-grams occurring more than once (n=5,10).
# Deviations from the paper, chosen for cross-engine determinism: the
# "top" n-gram maximizes chars-covered c*len(g) (the paper's
# most-frequent with an unspecified tie-break is ambiguous), and the
# duplicate coverage is not overlap-adjusted (each occurrence's chars
# count once per occurrence). Both are documented monotone proxies of
# the published signals.
# ---------------------------------------------------------------------------

_GOPHER_NS = (2, 3, 5, 10)


@register(
    "text_gopher_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, length(text) AS L,
             string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, L, n,
             unnest(list_transform(range(1, len(w) - n + 2),
                    i -> array_to_string(list_slice(w, i, i + n - 1), ' ')))
               AS g
      FROM t, (SELECT unnest([2, 3, 5, 10]) AS n) ns
      WHERE len(w) >= n
    ), c AS (
      SELECT doc_id, L, n, g, count(*) AS c
      FROM g GROUP BY doc_id, L, n, g
    ), p AS (
      SELECT doc_id, L, n, max(length(g) * c) AS topc,
             sum(CASE WHEN c > 1 THEN length(g) * c ELSE 0 END) AS dupc
      FROM c GROUP BY doc_id, L, n
    )
    SELECT doc_id,
      CAST(max(CASE WHEN n = 2 THEN topc END) AS DOUBLE) / L
        AS top2_char_frac,
      CAST(max(CASE WHEN n = 3 THEN topc END) AS DOUBLE) / L
        AS top3_char_frac,
      CAST(max(CASE WHEN n = 5 THEN dupc END) AS DOUBLE) / L
        AS dup5_char_frac,
      CAST(max(CASE WHEN n = 10 THEN dupc END) AS DOUBLE) / L
        AS dup10_char_frac
    FROM p GROUP BY doc_id, L
    """,
)
def text_gopher_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-exchange map-only Arrow kernel. The grouping keys of the
    repetition counts are (doc_id, n, gram) — entirely within one row's
    data — so no stage needs to see another row's grams and the gram
    stream must never cross a task boundary. The round-9 form did ship
    it through an exchange (explode -> hash agg on full gram STRINGS)
    and the round-10 second-decade probe caught the bill: x11.1
    sf1->sf10 (234s), all GC-locker thrash at the gram aggregate —
    memory pressure from wide string shuffle keys, not algorithmic
    growth. Counting within-doc duplicates is exactly what a per-row
    kernel is for: one scan, one mapInPandas, narrow (id + 4 doubles)
    output, nothing wide ever leaves the task. Re-measured: sf1
    21.1s -> 4.8s and sf10 234.6s -> 27.8s (x5.8 — and the probe file
    exposes only 2 parquet input splits at sf10, so that is 10x work
    on 2x tasks: linear CPU per task, parallelism bounded by input
    splits, which a real crawl's thousands of shards provide).

    The kernel counts gram TUPLES (no joined-string construction) with
    collections.Counter per (doc, n); chars-covered uses the word-length
    sum + (n-1) identity. The char fractions are single int/int
    divisions for bit-stable parity (PARITY.md); a doc shorter than n
    words yields NULL for that column (nullable Float64 arrays so
    missing is Arrow null, not NaN), mirroring the oracle's
    `len(w) >= n` gate.
    """
    docs = table(spark, sf_dir, "documents")

    def batches(it):
        import re
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"\s+")
        cols = [
            ("top2_char_frac", 2, True),
            ("top3_char_frac", 3, True),
            ("dup5_char_frac", 5, False),
            ("dup10_char_frac", 10, False),
        ]
        for pdf in it:
            out = {name: [] for name, _, _ in cols}
            for text in pdf["text"]:
                L = len(text)
                w = ws.split(text.lower())
                m = len(w)
                for name, n, top in cols:
                    if m < n:
                        out[name].append(None)
                        continue
                    cnt = Counter(
                        tuple(w[i : i + n]) for i in range(m - n + 1)
                    )
                    if top:
                        v = max(
                            (sum(map(len, k)) + n - 1) * c
                            for k, c in cnt.items()
                        )
                    else:
                        v = sum(
                            (sum(map(len, k)) + n - 1) * c
                            for k, c in cnt.items()
                            if c > 1
                        )
                    out[name].append(v / L)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        name: pd.array(vals, dtype="Float64")
                        for name, vals in out.items()
                    },
                }
            )

    return spread(docs.select("doc_id", "text"), spark).mapInPandas(
        batches,
        schema=(
            "doc_id bigint, top2_char_frac double, top3_char_frac double,"
            " dup5_char_frac double, dup10_char_frac double"
        ),
    )


# ---------------------------------------------------------------------------
# Syllable-complexity readability panel: the vowel-run syllable proxy
# under Flesch/Gunning-Fog-class readability scores, reduced to exact
# integer counts (total syllables, complex words) so every output
# ratio is a single division — readability is a standard column in
# training-data quality filters, and the syllable counter is the only
# non-trivial part of the family.
# ---------------------------------------------------------------------------


def _syl_runs(col):
    """Word column -> number of maximal vowel runs (syllable proxy):
    collapse runs to a marker and count markers. The marker 'A' cannot
    collide because the input is lower()ed first."""
    marked = F.regexp_replace(col, "[aeiouy]+", "A")
    return F.length(marked) - F.length(F.regexp_replace(marked, "A", ""))


@register(
    "text_syllable_complexity",
    oracle="""
    WITH w AS (
      SELECT source,
             list_transform(
               string_split_regex(lower(text), '\\s+'),
               x -> len(regexp_replace(x, '[aeiouy]+', 'A', 'g'))
                  - len(replace(regexp_replace(x, '[aeiouy]+', 'A', 'g'),
                                'A', ''))
             ) AS syl
      FROM documents
    )
    SELECT source,
      CAST(sum(len(syl)) AS BIGINT) AS n_words,
      CAST(sum(list_sum(syl)) AS BIGINT) AS n_syllables,
      CAST(sum(list_sum(syl)) AS DOUBLE) / sum(len(syl))
        AS avg_syllables_per_word,
      CAST(sum(len(list_filter(syl, s -> s >= 3))) AS DOUBLE)
        / sum(len(syl)) AS complex_word_pct,
      CAST(max(list_max(syl)) AS BIGINT) AS max_word_syllables
    FROM w GROUP BY source
    """,
)
def text_syllable_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source syllable statistics via the vowel-run proxy (maximal
    [aeiouy]+ runs per word — the classic Flesch-era approximation;
    its known failure modes like silent 'e' are shared by BOTH engines
    because both count the same runs, which is exactly what the parity
    gate should prove). All outputs are exact-integer sums with single
    divisions — bit-stable.

    Scale shape: the per-word counts are a row-local HOF over the
    word array (bounded by doc length, the BLEU-side of the per-row
    HOF cost line), reduced to three integers per doc before the ONE
    source-grain aggregate."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    syl = F.transform(words, _syl_runs)
    per_doc = docs.select(
        "source",
        F.size(syl).alias("nw"),
        F.aggregate(
            syl, F.lit(0), lambda acc, s: acc + s
        ).alias("ns"),
        F.size(F.filter(syl, lambda s: s >= 3)).alias("nc"),
        F.array_max(syl).alias("mx"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("ns").cast("long").alias("n_syllables"),
        (F.sum("ns").cast("double") / F.sum("nw")).alias(
            "avg_syllables_per_word"
        ),
        (F.sum("nc").cast("double") / F.sum("nw")).alias(
            "complex_word_pct"
        ),
        F.max("mx").cast("long").alias("max_word_syllables"),
    )
