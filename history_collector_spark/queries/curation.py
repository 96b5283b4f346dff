"""Corpus-curation operators for training-data pipelines: redaction,
corpus statistics, mixture balancing, vocabulary building, and a
composed quality-filter -> embedding-retrieval join.

These extend the reference's query surface (SURVEY.md §2.5 lists the
aggregate/window family as "absent — native when exposed") with the
selection/cleaning passes a pretraining pipeline runs over a 100 TB
corpus. Shapes are chosen for that scale:

- redaction + histogram are per-row scans (no exchange at all);
- the per-source quota is one hash-partitioned window (source count is
  the parallelism — fine, mixtures have thousands of sources);
- vocabulary is explode -> partial-agg count (map-side combined) with
  a final top-k on the *vocabulary*, which is tiny relative to the
  corpus;
- the retrieval join broadcasts the single query vector and stays
  co-partitioned on doc_id=vec_id (at scale, bucket both tables by id
  to make it shuffle-free — see SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import cosine, l2_norm
from history_collector_spark.functions.ranking import (
    grouped_range_prefix_sum,
    grouped_range_rank,
)
from history_collector_spark.registry import register

_STOP_PAT = r"\b(the|a|of|and|to|in)\b"


@register(
    "curation_redact_stopwords",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(text, '{_STOP_PAT}', '<stop>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_STOP_PAT}')) AS INT) AS n_redacted
    FROM documents
    """,
)
def curation_redact_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token redaction (the PII-scrub shape: match -> replace -> count).

    Pure per-row regexp work — whole-stage codegen, no exchange; the
    same plan scrubs emails/phones/IDs at 100 TB by swapping the
    pattern. Word-boundary `\\b` semantics agree between Java regex
    (Spark) and RE2 (DuckDB) for this alternation.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace("text", _STOP_PAT, "<stop>").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(_STOP_PAT), 0)).alias(
            "n_redacted"
        ),
    )


@register(
    "curation_length_histogram",
    oracle="""
    SELECT CAST(least(n_chars // 100, 9) AS INT) AS bucket,
           count(*) AS n_docs,
           avg(n_chars) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def curation_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution in fixed 100-char buckets (capped).

    Fixed bucket boundaries keep the aggregation single-pass (no
    percentile pre-scan); the group count is bounded (10 buckets) so
    the final exchange is trivially small at any corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / F.lit(100)), F.lit(9))
    return docs.groupBy(bucket.cast("int").alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "curation_source_quota",
    oracle="""
    SELECT doc_id, source, lang, n_chars, rk FROM (
      SELECT doc_id, source, lang, n_chars,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS INT) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
)
def curation_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: cap each source's contribution at its K best
    docs (here: longest, ties by doc_id — deterministic).

    One window partitioned by `source`: hash-partition shuffle on the
    quota key, per-partition sort, early row_number cutoff. Skewed
    sources split fine under AQE; K is a constant so output is bounded
    by K x |sources| regardless of corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


@register(
    "curation_vocabulary",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), agg AS (
      SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM tok GROUP BY term
    )
    SELECT term, tf, df, rank FROM (
      SELECT term, tf, df,
             CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT) AS rank
      FROM agg
    ) WHERE rank <= 50
    """,
)
def curation_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global term frequency + document frequency,
    top-50 terms.

    explode -> groupBy(term) partial-aggregates map-side, so the
    shuffle carries one row per (partition, term) — vocabulary-sized,
    not corpus-sized. The top-50 is orderBy+limit, which Catalyst
    compiles to TakeOrderedAndProject (per-partition top-k merged at
    the driver) — never a global single-partition sort of the
    vocabulary, which at web scale is itself billions of terms. The
    rank window then runs over only the 50 survivors.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    )
    agg = tok.groupBy("term").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    top = agg.orderBy(F.col("tf").desc(), "term").limit(50)
    w = Window.orderBy(F.col("tf").desc(), "term")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("term", "tf", "df", "rank")
    )


@register(
    "curation_filtered_retrieval",
    oracle="""
    WITH emb AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), q AS (
      SELECT embedding AS q_emb, nrm AS q_nrm FROM emb WHERE vec_id = 0
    ), cand AS (
      SELECT d.doc_id, d.n_chars,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (q.q_nrm * c.nrm) AS cos_sim
      FROM documents d JOIN emb c ON d.doc_id = c.vec_id CROSS JOIN q
      WHERE d.lang = 'en' AND d.n_chars >= 100
    )
    SELECT doc_id, n_chars, cos_sim, rank FROM (
      SELECT doc_id, n_chars, cos_sim,
             CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS INT)
               AS rank
      FROM cand
    ) WHERE rank <= 20
    """,
)
def curation_filtered_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pass: metadata filter -> embedding join ->
    cosine retrieval against a query vector (vec_id 0), top-20.

    The metadata filter prunes BEFORE the embedding join, so vectors
    for rejected docs are never read (column pruning keeps the wide
    embedding column out of the filter scan). The single query vector
    is broadcast; the doc->vector join is an equi-join on doc_id =
    vec_id (bucket both by id at scale for a shuffle-free join). The
    top-20 is orderBy+limit -> TakeOrderedAndProject (per-partition
    heap + driver merge); the rank window runs over only the 20
    survivors, never the full candidate set in one partition.
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    docs_f = (
        table(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 100))
        .select("doc_id", "n_chars")
    )
    cand = (
        docs_f.join(emb, docs_f.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "n_chars",
            cosine(
                F.col("q_emb"), F.col("embedding"),
                F.col("q_nrm"), F.col("nrm"),
            ).alias("cos_sim"),
        )
    )
    top = cand.orderBy(F.col("cos_sim").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "n_chars", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: hash the stable document key into
# 100 buckets, 90/5/5. Hash-based (not random) so the split is
# reproducible across runs, machines, and engine versions — the
# property a training pipeline actually needs.
# ---------------------------------------------------------------------------


@register(
    "curation_hash_split",
    oracle="""
    WITH b AS (
      SELECT doc_id, source,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INT) % 100 AS INT) AS bucket
      FROM documents
    )
    SELECT doc_id, source, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row expression work — no exchange, fully codegen'd;
    at 100 TB the split costs exactly one scan and writes three
    partitions via partitionBy('split')."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    return docs.select(
        "doc_id", "source",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style): concatenate each source's docs in
# doc_id order into one token stream, then cut at exact context-window
# boundaries. A doc's placement is fully determined by the running
# token offset, so the whole layout is two window functions — no
# stateful iteration, one shuffle on the packing key.
# ---------------------------------------------------------------------------

_CTX = 512  # tokens per packed context window


@register(
    "curation_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), o AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_off
      FROM t
    )
    SELECT doc_id, source, n_tokens, start_off,
           CAST(start_off // {_CTX} AS BIGINT) AS first_chunk,
           CAST((start_off + n_tokens - 1) // {_CTX} AS BIGINT) AS last_chunk
    FROM o
    """,
)
def curation_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc its byte range in the packed token stream:
    start offset (exclusive prefix sum of token counts) and the first/
    last context-window chunk it lands in. Chunks are {_CTX} tokens.

    Scale: partitioned by source — one shuffle on the packing key, and
    each partition's window is a linear scan. The reference has no
    analogue; this is the training-side consumer of the curated corpus.
    """
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )
    # two-phase range prefix sum (functions/ranking.py): a window
    # PARTITION BY source would stream a hot source's every doc through
    # one task; range slices bound each local scan, and only per-slice
    # token totals prefix-sum globally. Exclusive form = inclusive - own.
    o = grouped_range_prefix_sum(
        t, ["source"], [F.col("doc_id")], "n_tokens", out_col="cum"
    ).withColumn("start_off", F.col("cum") - F.col("n_tokens"))
    return o.select(
        "doc_id", "source", "n_tokens", "start_off",
        F.floor(F.col("start_off") / _CTX).alias("first_chunk"),
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / _CTX).alias(
            "last_chunk"
        ),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus docs sharing any word 3-gram
# with a held-out benchmark set (here: doc_id % 100 == 0 stands in for
# the benchmark). Inverted-index semi-join on the shingle itself — the
# standard n-gram-overlap contamination check, never all-pairs.
# ---------------------------------------------------------------------------


@register(
    "curation_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS g
      FROM toks
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 0
    ), hits AS (
      SELECT s.doc_id, count(b.g) AS n_shared
      FROM sh s LEFT JOIN bench b ON s.g = b.g
      WHERE s.doc_id % 100 <> 0
      GROUP BY s.doc_id
    )
    SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared,
           n_shared > 0 AS contaminated
    FROM hits
    """,
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination = any distinct 3-shingle of a training doc appears
    in any benchmark doc.

    Scale shape: benchmark shingle sets are tiny next to the corpus, so
    the overlap probe is a BROADCAST left join on the shingle string —
    corpus shingles never shuffle; the count aggregates map-side by
    doc_id. A billion-doc corpus pays one scan + one broadcast.
    """
    from history_collector_spark.queries.dedup import _doc_shingles

    sh = _doc_shingles(spark, sf_dir).select("doc_id", "g")
    bench = (
        sh.filter(F.col("doc_id") % 100 == 0)
        .select(F.col("g").alias("bg"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % 100 != 0)
    return (
        train.join(F.broadcast(bench), train.g == bench.bg, "left")
        .groupBy("doc_id")
        .agg(F.count("bg").alias("n_shared"))
        .select(
            "doc_id", "n_shared", (F.col("n_shared") > 0).alias("contaminated")
        )
    )


# ---------------------------------------------------------------------------
# Composed curation flagship: quality scoring -> metadata + quality
# filters -> exact dedup (canonical = min doc_id per content hash) ->
# deterministic split assignment, as ONE declarative plan. This is the
# LLM-side analogue of pipeline_parity: every stage exists as its own
# named query; here they compose into the pass a pretraining pipeline
# actually runs.
# ---------------------------------------------------------------------------


@register(
    "curation_quality_pipeline",
    oracle="""
    WITH m AS (
      SELECT doc_id, source, lang, text,
             CAST(length(text) AS INT) AS len_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS INT) AS n_digits,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS INT)
               AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, source, lang, text, len_chars, n_tokens,
             (CASE WHEN n_tokens >= 20 THEN 0.4 ELSE 0.0 END
              + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
                     THEN 0.3 ELSE 0.0 END
              + CASE WHEN CAST(n_digits AS DOUBLE) / len_chars < 0.2
                     THEN 0.3 ELSE 0.0 END) AS quality
      FROM m
    ), kept AS (
      SELECT * FROM scored
      WHERE lang = 'en' AND quality >= 0.7
        AND len_chars BETWEEN 100 AND 20000
      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    )
    SELECT doc_id, source, lang, n_tokens, quality,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT *, CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                  1, 4)) AS INT) % 100 AS INT) AS bucket
      FROM kept
    )
    """,
)
def curation_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: scoring and filtering are a single scan (no join
    back to documents — the quality columns ride the same projection);
    the only exchanges are the content-hash window for dedup and
    nothing else. Filters run BEFORE the dedup shuffle, so the exchange
    carries only the quality-surviving subset, keyed by a 32-byte hash.
    """
    from history_collector_spark.queries.text import with_quality

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    kept = with_quality(docs).filter(
        (F.col("lang") == "en")
        & (F.col("quality") >= 0.7)
        & F.col("len_chars").between(100, 20000)
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    dedup = kept.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    return dedup.select(
        "doc_id", "source", "lang", "n_tokens", "quality",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Quantile-threshold quality filter: keep docs at or above the corpus
# median quality — "top half by quality", the relative form of the
# fixed-threshold filter. Two-pass shape: a full-corpus scalar
# reduction, then the scalar broadcast back over a second scan.
# ---------------------------------------------------------------------------


@register(
    "curation_quality_threshold",
    oracle="""
    WITH m AS (
      SELECT doc_id, source,
             CAST(length(text) AS INT) AS len_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS INT) AS n_digits,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS INT)
               AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             (CASE WHEN n_tokens >= 20 THEN 0.4 ELSE 0.0 END
              + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
                     THEN 0.3 ELSE 0.0 END
              + CASE WHEN CAST(n_digits AS DOUBLE) / len_chars < 0.2
                     THEN 0.3 ELSE 0.0 END) AS quality
      FROM m
    )
    SELECT doc_id, source, quality
    FROM scored
    WHERE quality >= (SELECT quantile_cont(quality, 0.5) FROM scored)
    """,
)
def curation_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: pass 1 reduces the corpus to ONE scalar (exact
    median via percentile — a global aggregate whose single-partition
    exchange moves one partial row per input partition); pass 2
    broadcasts that 1-row frame and filters. No sort of the corpus, no
    window; the percentile state is bounded by distinct quality values
    (here: the 6 composite scores), not rows.
    """
    from history_collector_spark.queries.text import with_quality

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = with_quality(docs).select("doc_id", "source", "quality")
    med = scored.agg(F.percentile("quality", F.lit(0.5)).alias("med"))
    return (
        scored.crossJoin(F.broadcast(med))
        .filter(F.col("quality") >= F.col("med"))
        .select("doc_id", "source", "quality")
    )


# ---------------------------------------------------------------------------
# Deterministic corpus sharding: assign every document a shard and a
# stable position within it — the "global shuffle" a training run needs
# so epoch order is reproducible and uncorrelated with ingest order.
# ---------------------------------------------------------------------------

_N_SHARDS = 16
_SHUFFLE_SEED = "42"


@register(
    "curation_shard_assign",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5(concat(CAST(doc_id AS VARCHAR), '_{_SHUFFLE_SEED}')) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(h, 1, 8)) AS BIGINT)
                % {_N_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(concat('0x', substr(h, 1, 8)) AS BIGINT)
                          % {_N_SHARDS}
             ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def curation_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A global random permutation without a global sort: hash each
    doc_id with a seed, route to shard by hash (uniform, so shards are
    balanced), order within the shard by the hash itself. One exchange
    on the shard key and a per-shard sort — never an Exchange
    SinglePartition; readers stream shards independently and
    concatenation over (shard, pos) is the epoch order. Re-seeding
    reshuffles deterministically.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"_{_SHUFFLE_SEED}")))
    shard = (
        F.conv(F.substring(F.col("h"), 1, 8), 16, 10).cast("long")
        % _N_SHARDS
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("shard", shard)
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture reweighting: per-source sampling rates
# proportional to n^alpha (alpha < 1 upweights small sources) — the
# multilingual/multi-domain rebalancing rule used when composing a
# training mixture from skewed source sizes.
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5


@register(
    "curation_temperature_mix",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
      SELECT sum(pow(n_docs, {_MIX_ALPHA})) AS z, sum(n_docs) AS total
      FROM s
    )
    SELECT source, n_docs,
           pow(n_docs, {_MIX_ALPHA}) / z AS weight,
           pow(n_docs, {_MIX_ALPHA}) / z * total / n_docs AS sample_rate
    FROM s, t
    """,
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two bounded aggregates: per-source counts (map-side combined,
    group count = number of sources), then a 1-row normalizer
    broadcast back over the source table. sample_rate > 1 means the
    source is upsampled (repeated) in the mixture; < 1 downsampled.
    Nothing here scales with corpus rows except the first scan.
    """
    docs = table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = src.agg(
        F.sum(F.pow("n_docs", _MIX_ALPHA)).alias("z"),
        F.sum("n_docs").alias("total"),
    )
    wgt = F.pow("n_docs", _MIX_ALPHA) / F.col("z")
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        wgt.alias("weight"),
        (wgt * F.col("total") / F.col("n_docs")).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Deterministic mixture resampling: APPLY the temperature rates —
# every document becomes floor(rate) copies plus one more with
# probability frac(rate), decided by a seeded hash so the resampled
# corpus is reproducible. Expected output size == input size (mass
# conservation), but rebalanced across sources.
# ---------------------------------------------------------------------------

_RS_SEED = "rs"


@register(
    "curation_resample",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
      SELECT sum(pow(n_docs, {_MIX_ALPHA})) AS z, sum(n_docs) AS total
      FROM s
    ), r AS (
      SELECT source, pow(n_docs, {_MIX_ALPHA}) / z * total / n_docs AS rate
      FROM s, t
    ), d AS (
      SELECT doc_id, d.source, rate,
             CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                  '_{_RS_SEED}')), 1, 8)) AS BIGINT) / 4294967296.0 AS u
      FROM documents d JOIN r USING (source)
    )
    SELECT doc_id, source,
           CAST(unnest(range(0, CAST(floor(rate) AS BIGINT)
                + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END))
             AS INT) AS copy
    FROM d
    """,
)
def curation_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes curation_temperature_mix's rates back over the corpus:
    the 20-row rate table is broadcast onto the scan, the per-doc copy
    count is floor(rate) + a seeded-hash Bernoulli trial on the
    fractional part, and copies fan out with posexplode-style sequence
    — map-only after one broadcast, no shuffle of the corpus. Every
    hash is md5-derived, so the "random" trial is bit-identical in the
    DuckDB oracle and across reruns (resampling a 100 TB corpus must
    be replayable).
    """
    docs = table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = src.agg(
        F.sum(F.pow("n_docs", _MIX_ALPHA)).alias("z"),
        F.sum("n_docs").alias("total"),
    )
    rates = src.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.pow("n_docs", _MIX_ALPHA) / F.col("z") * F.col("total")
         / F.col("n_docs")).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"_{_RS_SEED}"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    n_copies = F.floor("rate").cast("int") + F.when(
        u < F.col("rate") - F.floor("rate"), 1
    ).otherwise(0)
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction: scrub emails / IPv4s / phone numbers before training —
# the compliance pass every corpus gets. Pure scan-side expression work
# (regexp_count + regexp_replace): map-only, no shuffle, trivially
# parallel at any corpus size. The fixture injects one deterministic
# instance of each PII shape per doc (derived from doc_id, mirrored in
# the oracle) so the operator's hits are non-trivial on synthetic text.
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


@register(
    "curation_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             concat(text, ' contact: u', CAST(doc_id AS VARCHAR),
                    '@example.com from 10.0.',
                    CAST(doc_id % 256 AS VARCHAR), '.9 tel 555-',
                    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS INT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS clean_fp
    FROM aug
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact: u"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".9 tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = docs.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IP), F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE), F.lit("<PHONE>"),
    )
    return t.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PII_IP)).alias("n_ips"),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).alias("n_phones"),
        F.md5(clean).alias("clean_fp"),
    )


# ---------------------------------------------------------------------------
# Overlapping document chunking: split each doc into fixed-size token
# windows with a stride (overlap = size - stride) — the chunking pass
# every RAG index and long-context pretraining pipeline runs before
# embedding/packing. Map-only: tokenize once, explode the start
# offsets, slice the bound token array per chunk. No exchange at all.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 50
_CHUNK_STRIDE = 40


@register(
    "curation_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(len(list_slice(t, start + 1,
                               least(start + {_CHUNK_SIZE}, len(t))))
                AS INT) AS n_tokens,
           array_to_string(list_slice(t, start + 1,
                           least(start + {_CHUNK_SIZE}, len(t))), ' ')
             AS chunk_text
    FROM toks, unnest(range(0, greatest(len(t), 1), {_CHUNK_STRIDE}))
           AS s(start)
    """,
)
def curation_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunks overlap by size - stride tokens; the final chunk may be
    short (>= 1 token). Start offsets are a per-row `sequence` explode
    over the already-materialized token array (the bound-column
    pattern of functions.nlp — no re-tokenization per chunk), so the
    whole operator is a single scan-side projection + explode: zero
    shuffles, scales with scan bandwidth alone, and the chunk fan-out
    (~n_tokens/stride per doc) is the row-growth a downstream
    embedding stage expects.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("t"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("t"), F.lit(1)) - 1,
        F.lit(_CHUNK_STRIDE),
    )
    ex = t.select("doc_id", "t", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("t"), F.col("start") + 1, _CHUNK_SIZE)
    return ex.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis, public):
# each doc draws key = ln(u) / w for a uniform u and weight w; the
# top-k keys ARE a weighted sample without replacement. With u derived
# from md5(doc_id) the draw is deterministic and exactly reproducible
# by the oracle — the seeded form a data-mixing pass uses so every
# rerun picks the same sample. One scan + TakeOrderedAndProject; no
# shuffle of the corpus, k rows to the driver.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 50
# md5-derived uniform in (0, 1): (h32 + 1) / (2^32 + 1)
_WSAMPLE_U = "(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1) / 4294967297.0"


@register(
    "curation_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars, skey, rank FROM (
      SELECT doc_id, n_chars,
             ln({_WSAMPLE_U}) / n_chars AS skey,
             CAST(row_number() OVER (
               ORDER BY ln({_WSAMPLE_U}) / n_chars DESC, doc_id) AS INT)
               AS rank
      FROM documents
    ) WHERE rank <= {_WSAMPLE_K}
    """,
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longer docs (weight = n_chars) are proportionally likelier to be
    drawn, never guaranteed — the statistical contract exact top-k by
    weight would break. ln(u)/w is monotone in u^(1/w), so top-k by it
    is the E-S sample."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967297.0)
    skey = F.log(u) / F.col("n_chars")
    ranked = (
        docs.withColumn("skey", skey)
        .orderBy(F.col("skey").desc(), "doc_id")
        .limit(_WSAMPLE_K)
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        "skey",
        F.row_number()
        .over(Window.orderBy(F.col("skey").desc(), "doc_id"))
        .alias("rank"),
    )


@register(
    "curation_class_balance",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS c FROM documents GROUP BY lang
    ),
    k AS (SELECT min(c) AS k FROM counts),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang FROM ranked r, k WHERE r.rn <= k.k
    """,
)
def curation_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class downsampling: every language keeps exactly
    min-class-size documents, selected as the K smallest doc-id hashes
    per class — deterministic, seedless, and stable under reruns
    (the property a reproducible training mix needs).

    Scale shape: the class-size reduction is a tiny agg broadcast back
    (the two-pass scalar pattern); selection is one window per class
    on the hash. With few huge classes the per-class sort concentrates
    — the 100 TB refinement is a two-phase threshold (sample the
    per-class hash quantile at K/N, filter, trim exactly), which
    replaces the sort with a scan + a bounded correction; the exact
    window form here IS the correction step run on the survivors.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    k = counts.agg(F.min("c").alias("k"))
    # two-phase range rank per class (functions/ranking.py) — a window
    # PARTITION BY lang would sort a dominant class through one task;
    # the K-smallest-hash selection is a rank filter, so the rank can
    # come from bounded range slices + broadcast slice offsets.
    ranked = grouped_range_rank(
        docs, ["lang"], [F.col("h"), F.col("doc_id")], rank_col="rn"
    )
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )


@register(
    "curation_filter_funnel",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
               / len(string_split_regex(text, '\\s+')) AS stop_ratio,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE) / length(text) AS digit_ratio
      FROM documents
    ),
    flags AS (
      SELECT CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS f_short,
             CASE WHEN n_tokens >= 20
                   AND stop_ratio NOT BETWEEN 0.01 AND 0.6
                  THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN n_tokens >= 20
                   AND stop_ratio BETWEEN 0.01 AND 0.6
                   AND digit_ratio >= 0.2 THEN 1 ELSE 0 END AS f_digit
      FROM m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_short) AS BIGINT) AS dropped_short,
           CAST(sum(f_stop) AS BIGINT) AS dropped_stopword,
           CAST(sum(f_digit) AS BIGINT) AS dropped_digit,
           CAST(count(*) - sum(f_short) - sum(f_stop) - sum(f_digit)
             AS BIGINT) AS survivors
    FROM flags
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade attrition report: how many documents each
    quality rule removes when applied IN ORDER (short -> stopword-band
    -> digit-heavy), plus survivors — the diagnostic every filtering
    pipeline publishes so rule changes are auditable. Single scan, one
    1-row aggregate; each doc is charged to the FIRST rule that drops
    it, so columns sum exactly to the corpus."""
    from history_collector_spark.queries.text import with_quality

    m = with_quality(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    f_short = (F.col("n_tokens") < 20).cast("long")
    in_band = F.col("stopword_ratio").between(0.01, 0.6)
    f_stop = ((F.col("n_tokens") >= 20) & ~in_band).cast("long")
    f_digit = (
        (F.col("n_tokens") >= 20) & in_band & (F.col("digit_ratio") >= 0.2)
    ).cast("long")
    return m.agg(
        F.count("*").alias("n_docs"),
        F.sum(f_short).alias("dropped_short"),
        F.sum(f_stop).alias("dropped_stopword"),
        F.sum(f_digit).alias("dropped_digit"),
        (
            F.count("*") - F.sum(f_short) - F.sum(f_stop) - F.sum(f_digit)
        ).alias("survivors"),
    )


# ---------------------------------------------------------------------------
# Temporal train/test split + leakage audit: cut at the 80% point of
# the observed time range, then count users straddling the cut — the
# check that catches user-level leakage in a time-split evaluation.
# ---------------------------------------------------------------------------


@register(
    "temporal_split_leakage",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
    ), f AS (
      SELECT user_id, event_type,
             CASE WHEN epoch_us(ts) < mn + CAST(floor(0.8 * (mx - mn))
                                                AS BIGINT)
                  THEN 1 ELSE 0 END AS is_train
      FROM events, b
    ), per_type AS (
      SELECT event_type, CAST(sum(is_train) AS BIGINT) AS n_train,
             CAST(sum(1 - is_train) AS BIGINT) AS n_test
      FROM f GROUP BY 1
    ), u AS (
      SELECT event_type, user_id,
             max(is_train) AS ht, max(1 - is_train) AS hs
      FROM f GROUP BY 1, 2
    ), leak AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(ht * hs) AS BIGINT) AS n_leaky_users
      FROM u GROUP BY 1
    )
    SELECT p.event_type, p.n_train, p.n_test, l.n_users, l.n_leaky_users
    FROM per_type p JOIN leak l ON p.event_type = l.event_type
    """,
)
def temporal_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events before min + 0.8*(max-min) micros are train, the rest
    test; a user is LEAKY for a type if they appear on both sides. The
    range bounds are a map-only 1-row aggregate broadcast back onto
    the scan; the leak check is one (event_type, user_id) shuffle with
    max() flags (never a distinct-pair join); both finales are
    type-bounded. The cutoff arithmetic (double multiply, floor, add)
    is authored identically in both engines."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bounds = ev.agg(
        F.min(us).alias("mn"), F.max(us).alias("mx")
    )
    cutoff = F.col("mn") + F.floor(
        F.lit(0.8) * (F.col("mx") - F.col("mn"))
    ).cast("long")
    f = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "event_type",
        F.when(us < cutoff, 1).otherwise(0).alias("is_train"),
    )
    per_type = f.groupBy("event_type").agg(
        F.sum("is_train").alias("n_train"),
        F.sum(1 - F.col("is_train")).alias("n_test"),
    )
    u = f.groupBy("event_type", "user_id").agg(
        F.max("is_train").alias("ht"),
        F.max(1 - F.col("is_train")).alias("hs"),
    )
    leak = u.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("ht") * F.col("hs")).alias("n_leaky_users"),
    )
    return per_type.join(leak, "event_type").select(
        "event_type", "n_train", "n_test", "n_users", "n_leaky_users"
    )


# ---------------------------------------------------------------------------
# Curriculum phases: rank-tertile each source by length (the classic
# easy->hard proxy) so training can feed short documents first without
# starving any source — the ordering companion of curation_resample.
# ---------------------------------------------------------------------------

_CURRICULUM_PHASES = 3


@register(
    "curation_curriculum_phases",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars) AS r,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), cuts AS (
      -- nearest-rank (percentile_disc) phase cutoffs per source;
      -- mirrors Spark percentile_disc's cume_dist >= q rule
      SELECT source,
             min(CASE WHEN CAST(r AS DOUBLE) / n >= 1.0/3
                      THEN n_chars END) AS c1,
             min(CASE WHEN CAST(r AS DOUBLE) / n >= 2.0/3
                      THEN n_chars END) AS c2
      FROM ranked GROUP BY source
    ), phased AS (
      -- tie policy: a length exactly at a cutoff goes to the LOWER phase
      SELECT d.source, d.n_chars,
             CASE WHEN d.n_chars <= c.c1 THEN 1
                  WHEN d.n_chars <= c.c2 THEN 2
                  ELSE 3 END AS phase
      FROM documents d JOIN cuts c ON d.source = c.source
    )
    SELECT source, CAST(phase AS INT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM phased GROUP BY 1, 2
    """,
)
def curation_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every source into {_CURRICULUM_PHASES} curriculum phases
    by document length and report each phase's size and length
    envelope — the manifest a curriculum dataloader consumes.

    Phases are VALUE-based tertiles: per-source nearest-rank cutoffs
    c1 = percentile_disc(1/3), c2 = percentile_disc(2/3) over n_chars,
    with every document assigned by range comparison and a length
    exactly at a cutoff going to the LOWER phase. Unlike ntile, equal
    lengths always land in the same phase (phase counts may differ by
    more than 1 under heavy ties; a source whose lengths are all equal
    collapses into phase 1 — deterministic by construction, since the
    assignment depends only on the stored integer n_chars).

    Scale shape: the cutoffs are a bounded-cardinality per-source
    aggregate (percentile_disc partials — no per-source total-order
    window, so a billion-row crawl source never funnels through one
    sort task) broadcast back for the range assignment, followed by a
    bounded (source x phase) reduce. Replaces the round-6
    ntile(3) OVER (PARTITION BY source) single-task-per-source sort.
    """
    docs = table(spark, sf_dir, "documents")
    cuts = docs.groupBy("source").agg(
        F.expr(
            "percentile_disc(1.0/3) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("c1"),
        F.expr(
            "percentile_disc(2.0/3) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("c2"),
    )
    phased = docs.join(F.broadcast(cuts), "source").select(
        "source",
        "n_chars",
        F.when(F.col("n_chars") <= F.col("c1"), 1)
        .when(F.col("n_chars") <= F.col("c2"), 2)
        .otherwise(3)
        .alias("phase"),
    )
    return phased.groupBy("source", "phase").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# Span-corruption mask planning (T5/UL2-style denoising prep): pick
# deterministic, non-overlapping mask spans per document — the mask
# plan a denoising-objective dataloader materializes, computed
# relationally so the plan is reproducible corpus-wide.
# ---------------------------------------------------------------------------

_SPAN_LEN = 3          # mean-span-length stand-in (fixed for determinism)
_SPAN_EVERY = 20       # one span per ~20 tokens (~15% noise density)
_SPAN_GRID = 16        # constant oracle grid bound (docs here are short)

_SPAN_U = (
    "(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#', "
    "CAST(s.s AS VARCHAR))), 1, 8)) AS BIGINT) + 1) / 4294967297.0"
)


@register(
    "curation_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens
      FROM documents
    ), docs AS (
      SELECT doc_id, n_tokens,
             greatest(1, n_tokens // {_SPAN_EVERY}) AS n_spans,
             n_tokens // greatest(1, n_tokens // {_SPAN_EVERY}) AS w
      FROM toks WHERE n_tokens >= 8
    )
    SELECT doc_id, n_tokens,
           CAST(s.s AS INT) AS span_idx,
           CAST(s.s * w + CAST(floor({_SPAN_U}
                * greatest(1, w - {_SPAN_LEN})) AS INT) AS INT) AS span_start,
           CAST({_SPAN_LEN} AS INT) AS span_len
    FROM docs, (SELECT unnest(range(0, {_SPAN_GRID})) AS s) s
    WHERE s.s < n_spans
    """,
)
def curation_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan one {_SPAN_LEN}-token mask span per ~{_SPAN_EVERY} tokens of
    each document: the doc is cut into n_spans equal windows and each
    window holds exactly one span at an md5-uniform offset — spans are
    non-overlapping BY CONSTRUCTION (no iterative rejection pass), and
    the whole plan is integer arithmetic on deterministic hashes, so
    any worker, any engine, any retry derives the identical mask.

    Scale shape: map-only (tokenize, a handful of integer columns, one
    bounded explode of n_spans ≤ n_tokens/{_SPAN_EVERY} rows per doc);
    no shuffle at all — the mask plan streams out next to the doc,
    exactly what a denoising dataloader wants at 100 TB.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", r"\s+")).cast("int").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 8)
        .withColumn(
            "n_spans",
            F.greatest(F.lit(1), (F.col("n_tokens") / _SPAN_EVERY).cast("int")),
        )
        .withColumn("w", (F.col("n_tokens") / F.col("n_spans")).cast("int"))
    )
    per = docs.select(
        "doc_id",
        "n_tokens",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("span_idx"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("span_idx").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967297.0)
    offmax = F.greatest(F.lit(1), F.col("w") - _SPAN_LEN)
    start = (
        F.col("span_idx") * F.col("w") + F.floor(u * offmax).cast("int")
    ).cast("int")
    return per.select(
        "doc_id",
        "n_tokens",
        "span_idx",
        start.alias("span_start"),
        F.lit(_SPAN_LEN).cast("int").alias("span_len"),
    )


# ---------------------------------------------------------------------------
# Water-filling quota allocation: split a global token budget across
# sources as alloc_i = min(demand_i, level), with the water level the
# unique value making the allocations sum to the budget — the max-min
# fair answer to "cap the big sources, never starve the small ones".
# Closed form via one sorted cumulative pass (no iteration).
# ---------------------------------------------------------------------------

_WF_BUDGET_NUM = 3  # budget = 3/5 of total demand (forces capping)
_WF_BUDGET_DEN = 5


@register(
    "curation_quota_water_filling",
    oracle=f"""
    WITH demand AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS d
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(d) * {_WF_BUDGET_NUM} / {_WF_BUDGET_DEN} AS DOUBLE)
               AS budget,
             CAST(count(*) AS BIGINT) AS n
      FROM demand
    ), ranked AS (
      SELECT source, d,
             row_number() OVER (ORDER BY d, source) AS k,
             sum(d) OVER (ORDER BY d, source
                          ROWS UNBOUNDED PRECEDING) - d AS p_below
      FROM demand
    ), levels AS (
      SELECT r.source, r.d, r.k,
             (t.budget - r.p_below) / (t.n - r.k + 1) AS lvl
      FROM ranked r, tot t
    ), pick AS (
      -- the level regime starts at the FIRST ascending-demand rank
      -- whose candidate level stops exceeding its demand; later rows'
      -- candidates are bogus (they subtract demands that were never
      -- fully granted), so take the lvl at the smallest such k. The
      -- aggregate yields a single NULL row when nothing qualifies
      -- (budget >= total demand -> nobody capped).
      SELECT arg_min(lvl, k) AS level FROM levels WHERE lvl <= d
    )
    SELECT l.source, l.d AS demand,
           CASE WHEN p.level IS NULL OR l.d <= p.level
                THEN CAST(l.d AS DOUBLE) ELSE p.level END AS alloc,
           (p.level IS NOT NULL AND l.d > p.level) AS capped
    FROM levels l, pick p
    """,
)
def curation_quota_water_filling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate {_WF_BUDGET_NUM}/{_WF_BUDGET_DEN} of total demand across
    sources by water-filling: sort demands ascending, and the first
    rank k where the candidate level (remaining budget over remaining
    sources) no longer exceeds that source's demand fixes the level;
    smaller sources keep their full demand, larger ones are capped AT
    the level. One sorted pass — no fixed-point loop — and the level
    arithmetic is a single division of exact integer sums, so
    allocations are engine-stable.

    Scale shape: demands are a bounded-key aggregate; the rank/cumsum
    window runs over source-cardinality rows (tiny relative to data);
    total and level ride 1-row broadcasts. The same plan shape works
    for thousands of tenants — it is the token-budget sibling of
    curation_source_quota's proportional split.
    """
    docs = table(spark, sf_dir, "documents")
    demand = docs.groupBy("source").agg(F.sum("n_chars").alias("d"))
    tot = demand.agg(
        (
            F.sum("d").cast("double")
            * F.lit(_WF_BUDGET_NUM)
            / F.lit(_WF_BUDGET_DEN)
        ).alias("budget"),
        F.count("*").alias("n"),
    )
    w = Window.orderBy("d", "source")
    ranked = demand.select(
        "source",
        "d",
        F.row_number().over(w).alias("k"),
        (
            F.sum("d").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("d")
        ).alias("p_below"),
    )
    levels = ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        "d",
        "k",
        (
            (F.col("budget") - F.col("p_below")) / (F.col("n") - F.col("k") + 1)
        ).alias("lvl"),
    )
    # first qualifying rank fixes the level (see oracle comment); the
    # min_by aggregate returns a single NULL row when nothing qualifies
    # (budget covers total demand -> nobody capped)
    pick = levels.filter(F.col("lvl") <= F.col("d")).agg(
        F.min_by("lvl", "k").alias("level")
    )
    return levels.crossJoin(F.broadcast(pick)).select(
        "source",
        F.col("d").alias("demand"),
        F.when(
            F.col("level").isNull() | (F.col("d") <= F.col("level")),
            F.col("d").cast("double"),
        )
        .otherwise(F.col("level"))
        .alias("alloc"),
        (F.col("level").isNotNull() & (F.col("d") > F.col("level"))).alias(
            "capped"
        ),
    )


# ---------------------------------------------------------------------------
# Padding-vs-packing cost audit: what one-doc-per-padded-window training
# costs versus the contiguous packed stream — the table that justifies
# sequence packing to whoever pays the GPU bill.
# ---------------------------------------------------------------------------


@register(
    "curation_pack_efficiency",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum((n_tokens + {_CTX} - 1) // {_CTX}) AS BIGINT)
             AS padded_chunks,
           CAST((sum(n_tokens) + {_CTX} - 1) // {_CTX} AS BIGINT)
             AS packed_chunks,
           CAST(sum((n_tokens + {_CTX} - 1) // {_CTX}) * {_CTX}
                - sum(n_tokens) AS BIGINT) AS padding_tokens,
           (1.0 * (sum((n_tokens + {_CTX} - 1) // {_CTX}) * {_CTX}
                   - sum(n_tokens))) / sum(n_tokens) AS padding_overhead
    FROM t GROUP BY source
    """,
)
def curation_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: chunks consumed by pad-to-{_CTX} training (each doc
    rounded up to whole windows) vs the contiguous packed stream
    (curation_sequence_pack's layout), and the padding overhead that
    packing eliminates. Every quantity is an exact integer sum except
    the final overhead ratio (one int/int division).

    Scale shape: one map-side-combined aggregate over token counts —
    the whole audit is a bounded-key reduce.
    """
    t = table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )
    ceil_chunks = (F.col("n_tokens") + _CTX - 1) / _CTX
    return t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(ceil_chunks.cast("long")).alias("padded_chunks"),
        ((F.sum("n_tokens") + _CTX - 1) / _CTX)
        .cast("long")
        .alias("packed_chunks"),
        (F.sum(ceil_chunks.cast("long")) * _CTX - F.sum("n_tokens")).alias(
            "padding_tokens"
        ),
        (
            (
                F.lit(1.0)
                * (F.sum(ceil_chunks.cast("long")) * _CTX - F.sum("n_tokens"))
            )
            / F.sum("n_tokens")
        ).alias("padding_overhead"),
    )


# ---------------------------------------------------------------------------
# Encoding-artifact audit: per-source profile of the classic crawl
# defects — U+FFFD replacement characters (lossy transcoding), C0
# control characters (binary bleed-through), and UTF-8-read-as-Latin-1
# mojibake markers ('Ã', 'â€'). Char counts come from length-diff
# against replace()/regexp_replace(), so the whole audit is a map-only
# scan plus one tiny per-source agg — at 100 TB the scan is the cost
# and nothing here adds exchange beyond a source-keyed partial agg.
# The synthetic corpus is clean (all zeros except the ratio); the
# detection arithmetic is pinned on hand-built dirty docs in
# tests/test_round8.py.
# ---------------------------------------------------------------------------

_MOJIBAKE_A = "Ã"      # 'Ã' — UTF-8 lead byte read as Latin-1
_MOJIBAKE_B = "â€"  # 'â€' — U+2018..201D smart quotes mangled
_REPLACEMENT = "�"
_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
_NON_ASCII_CLASS = r"[^\x00-\x7F]"


def encoding_artifact_cols():
    """Per-row artifact char counts over a `text` column; shared by
    the registered query and the fixture tests so the tested
    arithmetic IS the shipped arithmetic."""
    L = F.length("text")

    def _lit_diff(marker: str):
        return L - F.length(F.replace(F.col("text"), F.lit(marker)))

    def _re_diff(pattern: str):
        return L - F.length(F.regexp_replace("text", pattern, ""))

    return [
        L.alias("L"),
        _lit_diff(_REPLACEMENT).alias("repl_chars"),
        _re_diff(_CTRL_CLASS).alias("ctrl_chars"),
        (_lit_diff(_MOJIBAKE_A) + _lit_diff(_MOJIBAKE_B)).alias(
            "moji_chars"
        ),
        _re_diff(_NON_ASCII_CLASS).alias("non_ascii_chars"),
    ]


@register(
    "curation_encoding_audit",
    oracle=f"""
    WITH per AS (
      SELECT source, length(text) AS L,
        length(text) - length(replace(text, '{_REPLACEMENT}', ''))
          AS repl_chars,
        length(text) - length(regexp_replace(text,
          '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS ctrl_chars,
        (length(text) - length(replace(text, '{_MOJIBAKE_A}', '')))
          + (length(text) - length(replace(text, '{_MOJIBAKE_B}', '')))
          AS moji_chars,
        length(text) - length(regexp_replace(text,
          '[^\\x00-\\x7F]', '', 'g')) AS non_ascii_chars
      FROM documents
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN repl_chars + ctrl_chars + moji_chars > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
      CAST(sum(repl_chars) AS BIGINT) AS repl_chars,
      CAST(sum(ctrl_chars) AS BIGINT) AS ctrl_chars,
      CAST(sum(moji_chars) AS BIGINT) AS mojibake_chars,
      CAST(sum(non_ascii_chars) AS BIGINT) AS non_ascii_chars,
      CAST(sum(L) AS BIGINT) AS total_chars,
      CAST(sum(non_ascii_chars) AS DOUBLE) / sum(L) AS non_ascii_ratio
    FROM per GROUP BY source
    """,
)
def curation_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per = docs.select("source", *encoding_artifact_cols())
    flagged = (
        F.col("repl_chars") + F.col("ctrl_chars") + F.col("moji_chars") > 0
    )
    return per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(flagged, 1).otherwise(0)).alias("n_docs_flagged"),
        F.sum("repl_chars").cast("long").alias("repl_chars"),
        F.sum("ctrl_chars").cast("long").alias("ctrl_chars"),
        F.sum("moji_chars").cast("long").alias("mojibake_chars"),
        F.sum("non_ascii_chars").cast("long").alias("non_ascii_chars"),
        F.sum("L").cast("long").alias("total_chars"),
        (F.sum("non_ascii_chars").cast("double") / F.sum("L")).alias(
            "non_ascii_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Boilerplate template detection: scraped corpora repeat page furniture
# (cookie banners, navigation headers, licence blurbs) across thousands
# of documents; a cheap first-pass signal is a document PREFIX shared
# verbatim by multiple docs. This is the pre-LSH screen real pipelines
# run before fuzzy dedup — O(corpus) with one combinable aggregation,
# no pairwise work at all.
# ---------------------------------------------------------------------------

_TEMPLATE_PREFIX_TOKENS = 6


@register(
    "boilerplate_prefix_templates",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, source,
             concat_ws(' ', t[1], t[2], t[3], t[4], t[5], t[6]) AS p
      FROM (SELECT doc_id, source,
                   string_split_regex(lower(text), '\\s+') AS t
            FROM documents)
    ),
    g AS (SELECT p AS gp FROM p GROUP BY p HAVING count(*) >= 2),
    tp AS (
      SELECT source, count(*) AS n_templated,
             count(DISTINCT p) AS n_templates
      FROM p JOIN g ON p.p = g.gp GROUP BY source
    ),
    s AS (SELECT source, count(*) AS n_docs FROM p GROUP BY source)
    SELECT s.source AS source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(tp.n_templated, 0) AS BIGINT) AS n_templated,
           CAST(coalesce(tp.n_templates, 0) AS BIGINT) AS n_templates,
           CAST(coalesce(tp.n_templated, 0) AS DOUBLE) / s.n_docs
             AS template_rate
    FROM s LEFT JOIN tp USING (source)
    """,
)
def boilerplate_prefix_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share of docs opening with a corpus-repeated
    six-token prefix (a "template").

    Scale shape: prefix extraction is a map-only projection; the
    global prefix df is ONE map-side-combined aggregation keyed by
    prefix (cardinality <= corpus, combinable); templated docs come
    from a co-partitioned join on that same prefix key (no broadcast
    needed — both sides already hash on `p`); the per-source rollups
    are source-cardinality aggregates. No window, no pairwise join —
    this is the cheap screen that runs BEFORE MinHash. template_rate
    is one int/int division, op order mirrored in the oracle."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat_ws(
            " ",
            F.slice(
                F.split(F.lower(F.col("text")), r"\s+"),
                1,
                _TEMPLATE_PREFIX_TOKENS,
            ),
        ).alias("p"),
    )
    shared = (
        docs.groupBy("p")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("p")
    )
    tp = (
        docs.join(shared, "p")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_templated"),
            F.countDistinct("p").alias("n_templates"),
        )
    )
    s = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return s.join(tp, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_templated"), F.lit(0)).alias("n_templated"),
        F.coalesce(F.col("n_templates"), F.lit(0)).alias("n_templates"),
        (
            F.coalesce(F.col("n_templated"), F.lit(0)).cast("double")
            / F.col("n_docs")
        ).alias("template_rate"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group uniform sample via bottom-k of a hash — the
# scalable way to pull a fixed-size audit sample PER SOURCE from an
# unbounded corpus: no rand() (reproducible across runs and engines),
# no full sort (the rank filter compiles to WindowGroupLimit, so each
# task pre-keeps at most k rows per group), and the sample is stable
# under corpus growth in the bottom-k sense (a doc only leaves the
# sample when a smaller-hash doc arrives).
# ---------------------------------------------------------------------------

_BKS_K = 8


@register(
    "curation_group_sample_bottomk",
    oracle=f"""
    SELECT source, doc_id, h FROM (
      SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents
    ) WHERE rn <= {_BKS_K}
    """,
)
def curation_group_sample_bottomk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bottom-{_BKS_K}-by-md5 sample per source. The hash order is a
    deterministic uniform order (the cross-engine md5 idiom), so the
    kept set is an exact uniform-without-replacement sample of each
    source that any engine reproduces bit-for-bit — the audit-sample
    primitive every human-review and eval-annotation pipeline needs.

    Scale shape: the rank<= literal filter compiles to
    WindowGroupLimit (plan-asserted via the WGL allowlist entry), so
    each task keeps at most k rows per source BEFORE the exchange —
    per-source cost is O(k) per task regardless of corpus size."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        docs.select("source", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BKS_K)
        .select("source", "doc_id", "h")
    )
