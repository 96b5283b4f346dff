"""Model-evaluation and statistical-inference operators.

The reference leaves analysis to downstream consumers; at training-data
scale those consumers need model-eval primitives that run ON the
cluster: classifier confusion matrices over millions of predictions,
privacy audits before a dataset ships, and resampled confidence
intervals that never collect the data. Each query here is the
distributed form: bounded-key aggregates, broadcast-sized model state
(centroids, replicate weights), no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import checked_embedding, table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# Nearest-centroid classifier confusion matrix: embedding-quality eval.
# ---------------------------------------------------------------------------


@register(
    "centroid_classifier_confusion",
    oracle="""
    WITH dims AS (
      SELECT label, CAST(i - 1 AS INT) AS dim,
             avg(CAST(embedding[i] AS DOUBLE)) AS m
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) r
      GROUP BY 1, 2
    ), cent AS (
      SELECT label AS clabel, list(m ORDER BY dim) AS centroid
      FROM dims GROUP BY label
    ), scored AS (
      SELECT e.vec_id, e.label AS true_label, c.clabel AS pred_candidate,
             list_sum(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i] ))
             - 0.5 * list_sum(list_transform(c.centroid, x -> x * x))
               AS score
      FROM embeddings e CROSS JOIN cent c
    ), best AS (
      SELECT vec_id, true_label, pred_candidate AS pred_label FROM (
        SELECT vec_id, true_label, pred_candidate, score,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, pred_candidate) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
    FROM best GROUP BY 1, 2
    """,
)
def centroid_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the nearest-centroid classifier against the
    stored labels — the standard embedding-space sanity eval (a clean
    embedding classifies its own labels near-perfectly; off-diagonal
    mass localizes which classes bleed together).

    Nearest centroid under L2 == argmax of (e·c - ||c||²/2), which
    avoids recomputing ||e||² per candidate. The centroid table is
    labels x 64 — broadcast-joined against every vector, scored
    JVM-side (zip_with/aggregate), ranked by a per-vector window whose
    partition is the vector id (perfectly parallel). Output is at most
    labels² rows via map-side-combined counts.
    """
    emb = table(spark, sf_dir, "embeddings")
    dims = (
        emb.select("label", F.posexplode(checked_embedding()).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
    )
    cent = (
        dims.groupBy(F.col("label").alias("pred_candidate"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("dm")
        )
        .select(
            "pred_candidate",
            F.transform("dm", lambda s: s.m).alias("centroid"),
        )
        .withColumn(
            "half_cnorm2",
            F.lit(0.5)
            * F.aggregate("centroid", F.lit(0.0), lambda a, x: a + x * x),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "centroid", lambda e, c: e.cast("double") * c
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("score"), "pred_candidate")
    )
    scored = (
        emb.select("vec_id", F.col("label").alias("true_label"), "embedding")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "true_label",
            "pred_candidate",
            (dot - F.col("half_cnorm2")).alias("score"),
        )
        .withColumn("rk", w)
        .filter(F.col("rk") == 1)
    )
    return scored.groupBy(
        "true_label", F.col("pred_candidate").alias("pred_label")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit: privacy gate before a dataset ships.
# ---------------------------------------------------------------------------


@register(
    "k_anonymity_audit",
    oracle="""
    WITH eq AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(count(*) AS BIGINT) AS class_size,
             CAST(count(DISTINCT CAST(round(c_acctbal / 1000) AS BIGINT))
               AS BIGINT) AS l_diversity
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(min(class_size) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_5,
           CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
             AS BIGINT) AS n_rows_at_risk,
           CAST(min(l_diversity) AS BIGINT) AS min_l_diversity,
           CAST(count(*) AS BIGINT) AS n_classes
    FROM eq
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier pair (segment, nation) and
    l-diversity of the bucketed sensitive attribute (account balance in
    1k bands): the release gate a governance pipeline runs before a
    customer extract leaves the warehouse. k = the smallest equivalence
    class; rows in classes below the threshold are re-identifiable.

    One (segment, nation) shuffle with map-side partial counts +
    distinct-count, collapsed to a 1-row scorecard — the audit costs a
    single aggregation at any table size.
    """
    cust = table(spark, sf_dir, "customer")
    eq = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("class_size"),
        F.count_distinct(
            F.round(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_diversity"),
    )
    return eq.agg(
        F.min("class_size").alias("k_anonymity"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0)).alias(
            "n_classes_below_5"
        ),
        F.sum(
            F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
        F.min("l_diversity").alias("min_l_diversity"),
        F.count("*").alias("n_classes"),
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval: resampling without collecting.
# ---------------------------------------------------------------------------

N_REPLICATES = 50

# Inverse-CDF thresholds for Poisson(1): cumulative e^-1 * sum 1/k!.
_POISSON_CDF = (
    0.36787944117144233,  # k = 0
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


@register(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH weighted AS (
      SELECT r,
             (CASE
                WHEN u < {_POISSON_CDF[0]} THEN 0 WHEN u < {_POISSON_CDF[1]} THEN 1
                WHEN u < {_POISSON_CDF[2]} THEN 2 WHEN u < {_POISSON_CDF[3]} THEN 3
                WHEN u < {_POISSON_CDF[4]} THEN 4 WHEN u < {_POISSON_CDF[5]} THEN 5
                WHEN u < {_POISSON_CDF[6]} THEN 6 ELSE 7 END) AS wgt,
             o_totalprice
      FROM (
        SELECT o_totalprice, r,
               (CAST(concat('0x', substr(
                    md5(o_orderkey || '#' || CAST(r // 4 AS BIGINT)),
                    CAST(1 + 8 * (r % 4) AS BIGINT), 8))
                  AS BIGINT) + 1) / 4294967297.0 AS u
        FROM orders, (SELECT unnest(range(0, {N_REPLICATES})) AS r) reps
      )
    ), means AS (
      SELECT r, sum(wgt * o_totalprice) / sum(wgt) AS m
      FROM weighted GROUP BY r HAVING sum(wgt) > 0
    )
    SELECT avg(m) AS boot_mean,
           quantile_cont(m, 0.025) AS ci_lo,
           quantile_cont(m, 0.975) AS ci_hi,
           stddev_samp(m) AS boot_se,
           CAST(count(*) AS BIGINT) AS n_replicates
    FROM means
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean(o_totalprice) via the Poisson
    bootstrap (Chamandy et al.'s scalable form): instead of resampling
    n rows with replacement — impossible without a global pass — each
    row draws an independent Poisson(1) weight per replicate, which
    converges to the multinomial bootstrap at large n and needs no
    coordination at all.

    Weights are DETERMINISTIC: each md5 digest is 32 hex chars = four
    independent 32-bit words, so replicate r draws its uniform from
    word r%4 of md5(orderkey # r//4) — 13 digests per row instead of
    50, computed ONCE per input row in a bound array column BEFORE the
    replicate explode (inlining md5 after the explode would evaluate
    it per (row, replicate): 4x the hashing for identical digests).
    The uniform inverts through the Poisson(1) CDF (7 terms cover
    P < 1e-4); the fan-out explode is map-side combined into 50
    replicate groups, so the whole resample is one scan + one 50-key
    aggregate; the final percentile runs on 50 numbers.
    """
    orders = table(spark, sf_dir, "orders")
    reps = F.sequence(F.lit(0), F.lit(N_REPLICATES - 1))
    n_hashes = (N_REPLICATES + 3) // 4
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda h: F.md5(
            F.concat_ws("#", F.col("o_orderkey"), h.cast("long"))
        ),
    )
    u = (
        F.conv(
            F.expr(
                "substring(element_at(hs, CAST(r DIV 4 AS INT) + 1),"
                " CAST(1 + 8 * (r % 4) AS INT), 8)"
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(4294967297.0)
    wgt = F.lit(7)
    for k in range(6, -1, -1):
        wgt = F.when(F.col("u") < F.lit(_POISSON_CDF[k]), k).otherwise(wgt)
    weighted = (
        orders.select("o_totalprice", hashes.alias("hs"))
        .select("o_totalprice", "hs", F.explode(reps).alias("r"))
        .withColumn("u", u)
        .withColumn("wgt", wgt)
    )
    means = (
        weighted.groupBy("r")
        .agg(
            (
                F.sum(F.col("wgt") * F.col("o_totalprice")) / F.sum("wgt")
            ).alias("m")
        )
        .filter(F.col("m").isNotNull())
    )
    return means.agg(
        F.avg("m").alias("boot_mean"),
        F.expr("percentile(m, 0.025)").alias("ci_lo"),
        F.expr("percentile(m, 0.975)").alias("ci_hi"),
        F.stddev_samp("m").alias("boot_se"),
        F.count("*").alias("n_replicates"),
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (Dwork et al. 2006, public
# Laplace mechanism): noise the per-(source, lang) counts with
# DETERMINISTIC Laplace draws (md5-uniform -> inverse CDF) so the
# release is reproducible and auditable — the privacy layer a corpus
# stats endpoint publishes instead of raw counts.
# ---------------------------------------------------------------------------

_DP_EPS = 0.5  # epsilon; sensitivity 1 for counting queries -> b = 1/eps

_DP_U = (
    "(CAST(concat('0x', substr(md5(concat(source, '|', lang)), 1, 8)) "
    "AS BIGINT) + 1) / 4294967297.0"
)


@register(
    "dp_count_release_audit",
    oracle=f"""
    WITH g AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS true_count
      FROM documents GROUP BY source, lang
    ), noised AS (
      SELECT source, lang, true_count,
             ({_DP_U}) AS u
      FROM g
    )
    SELECT source, lang, true_count,
           true_count + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * ((1.0 / {_DP_EPS})
                * ln(CASE WHEN u < 0.5 THEN 2.0 * u
                          ELSE 2.0 * (1.0 - u) END)) AS released,
           abs((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * ((1.0 / {_DP_EPS})
                * ln(CASE WHEN u < 0.5 THEN 2.0 * u
                          ELSE 2.0 * (1.0 - u) END))) AS abs_noise
    FROM noised
    """,
)
def dp_count_release_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release of the (source, lang) count table at
    epsilon={_DP_EPS} (sensitivity 1), with the true count and the
    realized |noise| kept alongside for the privacy-utility audit.
    The draw is the inverse-CDF transform of an md5-uniform keyed on
    the GROUP (not the rows), so the release is deterministic given
    the group key — reproducible across engines, retries, and the
    DuckDB oracle, while remaining a faithful Laplace(1/eps) sample
    per group.

    Scale shape: one bounded-key count aggregate (map-side combined)
    plus map-only noise arithmetic; the noise expression keeps the
    same op order on both engines (sign * (b * ln(arg)), arg computed
    identically) so the released floats match the driver hash.
    """
    g = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("true_count"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("source"), F.lit("|"), F.col("lang"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967297.0)
    sign = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    arg = F.when(u < 0.5, F.lit(2.0) * u).otherwise(
        F.lit(2.0) * (F.lit(1.0) - u)
    )
    noise = sign * ((F.lit(1.0) / F.lit(_DP_EPS)) * F.log(arg))
    return g.select(
        "source",
        "lang",
        "true_count",
        (F.col("true_count") + noise).alias("released"),
        F.abs(noise).alias("abs_noise"),
    )
