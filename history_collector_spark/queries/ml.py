"""Distributed classical-ML kernels over `documents` — the shapes a
data-quality team runs ON the corpus pipeline itself.

- `ml_ridge_probe_stats` — closed-form linear/ridge probe: the corpus
  reduces to the sufficient statistics (XᵀX, Xᵀy) in ONE map-side-
  combined aggregation — the normal-equations trick that makes linear
  probes O(d²) per partition regardless of corpus size. The tiny
  (d+1)² solve happens after (driver/numpy — validated in pytest);
  the QUERY output is the statistics themselves, so the oracle checks
  the distributed part exactly.

- `text_langid_confusion` — per-(labeled, predicted) confusion counts
  for the language-ID heuristic plus per-class precision/recall —
  evaluating a corpus-scale classifier is itself one groupBy.

Both are pure Catalyst aggregations: no Python in the row path, no
exchange beyond the final bounded-key reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, checked_embedding, table
from history_collector_spark.queries.text import text_language_id, with_quality
from history_collector_spark.registry import register

# Features: intercept, n_tokens, stopword_ratio, len_chars. Target:
# is_en (labeled lang == 'en') — a linear probe of "does quality
# signal track language" over the whole corpus.
_FEATS = ("x0", "x1", "x2", "x3")


def _features(docs: DataFrame) -> DataFrame:
    q = with_quality(docs)
    return q.select(
        F.lit(1.0).alias("x0"),
        F.col("n_tokens").cast("double").alias("x1"),
        F.col("stopword_ratio").cast("double").alias("x2"),
        F.col("len_chars").cast("double").alias("x3"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )


@register(
    "ml_ridge_probe_stats",
    oracle="""
    WITH f AS (
      SELECT 1.0 AS x0,
             CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS x1,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
               / len(string_split_regex(text, '\\s+')) AS x2,
             CAST(length(text) AS DOUBLE) AS x3,
             CAST(lang = 'en' AS DOUBLE) AS y
      FROM documents
    )
    SELECT i, j,
           CASE
             WHEN j = 0 THEN sum((CASE i WHEN 0 THEN x0 WHEN 1 THEN x1
                                         WHEN 2 THEN x2 ELSE x3 END) * y)
             ELSE sum((CASE i WHEN 0 THEN x0 WHEN 1 THEN x1
                              WHEN 2 THEN x2 ELSE x3 END)
                    * (CASE j - 1 WHEN 0 THEN x0 WHEN 1 THEN x1
                                  WHEN 2 THEN x2 ELSE x3 END))
           END AS v
    FROM f, (SELECT unnest(range(4)) AS i), (SELECT unnest(range(5)) AS j)
    GROUP BY i, j
    """,
)
def ml_ridge_probe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sufficient statistics for the normal equations, flattened to
    (i, j, v) rows: j=0 carries Xᵀy[i], j=1..4 carries XᵀX[i][j-1].
    One aggregation, map-side combined; 20 output rows at any corpus
    size. The solve itself is (XᵀX + λI)⁻¹ Xᵀy on those 20 numbers —
    see tests/test_invariants.py for the numpy twin."""
    docs = table(spark, sf_dir, "documents")
    # r16 optimization (guide §2.5): with_quality tokenizes every
    # document (split + stopword filters) and the global agg's map
    # side fuses it all into the ONE-task scan; spread the (text,
    # lang) projection so feature extraction runs at cluster
    # parallelism. The agg output is a single row either way.
    f = _features(spread(docs.select("text", "lang"), spark))
    aggs = []
    for i, xi in enumerate(_FEATS):
        aggs.append(
            F.sum(F.col(xi) * F.col("y")).alias(f"s_{i}_0")
        )
        for j, xj in enumerate(_FEATS):
            aggs.append(
                F.sum(F.col(xi) * F.col(xj)).alias(f"s_{i}_{j + 1}")
            )
    wide = f.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("i"),
                F.lit(j).cast("long").alias("j"),
                F.col(f"s_{i}_{j}").alias("v"),
            )
            for i in range(4)
            for j in range(5)
        ]
    )
    return wide.select(F.explode(cells).alias("c")).select(
        "c.i", "c.j", "c.v"
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and'))) AS en_hits,
             len(list_filter(t, x -> x IN ('der', 'die', 'das', 'und'))) AS de_hits,
             len(list_filter(t, x -> x IN ('le', 'la', 'et', 'les'))) AS fr_hits,
             len(list_filter(t, x -> x IN ('el', 'la', 'de', 'los'))) AS es_hits
      FROM toks
    ), pred AS (
      SELECT lang AS labeled,
             CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits
                       AND en_hits >= es_hits THEN 'en'
                  WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                  WHEN fr_hits >= es_hits THEN 'fr'
                  ELSE 'es' END AS predicted
      FROM scored
    )
    SELECT labeled, predicted, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY labeled, predicted
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of the language-ID heuristic against labels —
    classifier evaluation as one bounded-key groupBy over the scored
    corpus (reuses text_language_id's plan wholesale)."""
    scored = text_language_id(spark, sf_dir)
    return (
        scored.groupBy(
            F.col("labeled_lang").alias("labeled"),
            F.col("predicted_lang").alias("predicted"),
        )
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Point-in-time churn labels: leakage-safe label/feature generation.
# ---------------------------------------------------------------------------


@register(
    "churn_labels",
    oracle="""
    WITH feat AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purchases,
             avg(value) AS avg_value,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_active
      FROM events WHERE ts < TIMESTAMP '2024-01-24'
      GROUP BY user_id
    ), fut AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-24'
        AND ts < TIMESTAMP '2024-01-31'
    )
    SELECT f.user_id, f.n_events, f.n_purchases, f.avg_value,
           f.days_active, (fut.user_id IS NULL) AS churned
    FROM feat f LEFT JOIN fut ON f.user_id = fut.user_id
    """,
)
def churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn training set: features aggregate STRICTLY
    before the cutoff, the label looks only at the 7 days after — the
    point-in-time discipline that separates a valid training table
    from one that leaks the future into its features.

    Both the feature aggregate and the future-activity set shuffle on
    user_id (one exchange each, map-side combined; the label side is
    DISTINCT user_id so it carries one row per user, never raw
    events), and the label join is user-co-partitioned. Cutoffs are
    scan-side predicates — at 100 TB with date-partitioned events,
    partition pruning makes each side read only its window.
    """
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-24").cast("timestamp")
    horizon = F.lit("2024-01-31").cast("timestamp")
    feat = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.avg("value").alias("avg_value"),
            F.count_distinct(F.to_date("ts")).alias("days_active"),
        )
    )
    fut = (
        ev.filter((F.col("ts") >= cutoff) & (F.col("ts") < horizon))
        .select("user_id")
        .distinct()
        .withColumn("active", F.lit(1))
    )
    return (
        feat.join(fut, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "avg_value",
            "days_active",
            F.col("active").isNull().alias("churned"),
        )
    )


# ---------------------------------------------------------------------------
# Full-batch logistic-regression gradient step — the distributed inner
# loop of every quality / toxicity / langid classifier a data pipeline
# trains on its own corpus. One step from zero init is exactly
# representable: sigmoid(0) = 1/2, so grad_j = sum_i (1/2 - y_i) x_ij
# needs no transcendentals at all.
# ---------------------------------------------------------------------------

_LRS_Q = 1 << 24  # fixed-point scale for the feature quantization
_LRS_LR = 0.25  # learning rate; /2^2, so the update stays a power-of-2 shift


@register(
    "ml_logreg_step",
    oracle=f"""
    WITH terms AS (
      SELECT CAST(i - 1 AS BIGINT) AS dim,
             (1 - 2 * (CASE WHEN label = 0 THEN 1 ELSE 0 END))
               * CAST(floor(CAST(embedding[i] AS DOUBLE) * {_LRS_Q})
                      AS BIGINT) AS t
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) r
    )
    SELECT dim,
           CAST(sum(t) AS BIGINT) AS grad2_fixed,
           CAST(sum(t) AS DOUBLE) / {2 * _LRS_Q} AS grad,
           -(CAST(sum(t) AS DOUBLE) / {int(2 * _LRS_Q / _LRS_LR)}) AS w_after
    FROM terms
    GROUP BY dim
    """,
)
def ml_logreg_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-batch logistic-regression gradient step for the binary
    task y = (label == 0) over the embedding table, from zero init at
    lr=0.25 — the distributed step a corpus-scale classifier trainer
    repeats. At w=0 every predicted probability is exactly 1/2, so the
    NLL gradient is sum_i (1/2 - y_i) x_ij: pure sums, no sigmoid.

    Bit-exactness device: features are quantized to 24-bit fixed point
    (floor(x * 2^24) is exact — a float32 times a power of two is an
    exact double, floor is deterministic), so the per-dimension
    gradient accumulates as a BIGINT in ANY order; the (1/2 - y) factor
    and the lr=1/4 step fold into power-of-two divisors (2^25, 2^27),
    each a single exact division. Summation-order nondeterminism —
    the reason a naive float gradient can't hash-match across engines —
    is engineered out, not tolerated.

    Scale shape: one scan, posexplode to (dim, term), a 64-key
    aggregate with map-side combine; the model state is 64 numbers.
    Reference scope: no ML in kinecosystem/history-collector;
    LLM-pipeline extension tier.
    """
    emb = table(spark, sf_dir, "embeddings")
    y = F.when(F.col("label") == 0, 1).otherwise(0)
    terms = emb.select(
        (F.lit(1) - F.lit(2) * y).alias("s"),
        F.posexplode(checked_embedding()).alias("dim", "v"),
    ).select(
        F.col("dim").cast("long").alias("dim"),
        (
            F.col("s")
            * F.floor(F.col("v").cast("double") * _LRS_Q).cast("long")
        ).alias("t"),
    )
    g = F.sum("t")
    return terms.groupBy("dim").agg(
        g.alias("grad2_fixed"),
        (g.cast("double") / F.lit(float(2 * _LRS_Q))).alias("grad"),
        (-(g.cast("double") / F.lit(float(int(2 * _LRS_Q / _LRS_LR))))).alias(
            "w_after"
        ),
    )
