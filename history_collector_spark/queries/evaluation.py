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

from history_collector_spark.catalog import checked_embedding, spread, table
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
    # r15 optimization (guide §2.4 remove shuffles / §4.1 built-ins):
    # the former plan crossJoined every vector with the broadcast
    # centroid table (N x labels rows) and ran a row_number window
    # partitioned by vec_id — a full exchange + sort of the fanned-out
    # rows just to take a per-vector argmax. The centroids ride along
    # as ONE array row instead, and the argmax is a row-local
    # array_min over (-score, pred_candidate) structs: lexicographic
    # struct min == highest score, ties to the SMALLEST candidate id —
    # exactly the window's (score DESC, pred_candidate ASC) row_number
    # = 1 rule. Scores are the same IEEE-754 dot - half||c||^2
    # sequence per (vector, centroid), so the confusion matrix is
    # bit-identical (oracle-verified). No fan-out exchange, no sort.
    cents_one = cent.agg(
        F.collect_list(
            F.struct("pred_candidate", "centroid", "half_cnorm2")
        ).alias("cs")
    )

    def score(c):
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), c["centroid"],
                lambda e, cc: e.cast("double") * cc,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return dot - c["half_cnorm2"]

    pred = F.array_min(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                (-score(c)).alias("nscore"),
                c["pred_candidate"].alias("pred_label"),
            ),
        )
    )["pred_label"]
    scored = (
        emb.select("vec_id", F.col("label").alias("true_label"), "embedding")
        .crossJoin(F.broadcast(cents_one))
        .select("true_label", pred.alias("pred_label"))
    )
    # Degenerate-input guard: with an EMPTY centroid table, array_min
    # over the empty cs array yields NULL pred_label, whereas the old
    # crossJoin fan-out produced zero rows — filter those out so both
    # shapes agree. (Scores are assumed finite: a NaN score would order
    # differently under min(-score) than the old score-DESC window.)
    return (
        scored.filter(F.col("pred_label").isNotNull())
        .groupBy("true_label", "pred_label")
        .agg(F.count("*").alias("n"))
    )


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

    The scan is spread() first (r15 optimization): the single-row-group
    input pins the whole md5 + x50 explode pipeline to one task
    otherwise — measured 6.5 s -> 2.3 s at sf0.1/local[32].
    """
    orders = spread(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        spark,
    )
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


# ---------------------------------------------------------------------------
# Ranking-classifier eval: AUC-ROC, average precision, calibration.
#
# A data pipeline that trains quality / toxicity / language classifiers
# needs their evals to run ON the cluster over millions of scored rows.
# The scale shape shared by all three: collapse the scored corpus to a
# DISTINCT-SCORE aggregate first (bounded: the score is discretized),
# then compute rank statistics on that tiny table. The full-resolution
# per-row sort (how sklearn does it) is exactly the global-sort trap
# the window-partition guard bans.
#
# The classifier under eval is synthetic but deterministic: each order
# scores s = md5_uniform(o_orderkey) % 1000 + 300 * label, with label
# = (o_orderstatus = 'F') — a "model" with genuine signal (AUC ~ 0.65)
# whose integer scores make every rank statistic exact across engines.
# ---------------------------------------------------------------------------

_SCORE_STEPS = 1300  # score range [0, 1300): 1000 hash + 300 label lift

# (score, n_pos_s, n_neg_s) per distinct integer score — the bounded
# aggregate every eval below starts from; mirrored by _eval_scored().
_EVAL_SCORED_SQL = """
  scored AS (
    SELECT (CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000)
           + CASE WHEN o_orderstatus = 'F' THEN 300 ELSE 0 END AS score,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
    FROM orders
  ),
  per_score AS (
    SELECT score,
           CAST(sum(y) AS BIGINT) AS p,
           CAST(sum(1 - y) AS BIGINT) AS n
    FROM scored GROUP BY score
  ),
  tot AS (
    SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg
    FROM per_score
  )
"""


def _eval_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(score, p, n) per distinct integer score — one map-side-combined
    aggregate over orders; everything downstream is <= 1300 rows."""
    orders = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    scored = orders.select(
        ((h % 1000) + F.when(F.col("o_orderstatus") == "F", 300).otherwise(0))
        .alias("score"),
        y.alias("y"),
    )
    return scored.groupBy("score").agg(
        F.sum("y").alias("p"),
        F.sum(F.lit(1) - F.col("y")).alias("n"),
    )


@register(
    "eval_auc_roc",
    oracle=f"""
    WITH {_EVAL_SCORED_SQL},
    ranked AS (
      SELECT p, n,
             coalesce(sum(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM per_score
    )
    SELECT tot.n_pos, tot.n_neg,
           CAST(sum(p * (2 * neg_below + n)) AS BIGINT) AS auc2_numerator,
           CAST(sum(p * (2 * neg_below + n)) AS DOUBLE)
             / (2 * tot.n_pos * tot.n_neg) AS auc
    FROM ranked, tot
    GROUP BY tot.n_pos, tot.n_neg
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected AUC-ROC (Mann-Whitney form) of the synthetic
    order-status classifier, computed entirely on the distinct-score
    aggregate: AUC = [#(pos>neg pairs) + #ties/2] / (n_pos * n_neg),
    and with integer scores the doubled numerator
    sum_s p_s * (2 * neg_below(s) + n_s) is an exact BIGINT — the only
    float op is the final single division, so the result is bit-stable
    across engines.

    Scale shape: one scan into a <=1300-row score aggregate (map-side
    combined); the cumulative window runs over that bounded table (one
    task, 1300 rows — allowlisted), never over the corpus. sklearn's
    per-row sort at 100 TB is exactly the global-sort trap this avoids.
    """
    per_score = _eval_scored(spark, sf_dir)
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    num = F.sum(
        F.col("p") * (F.lit(2) * F.col("neg_below") + F.col("n"))
    )
    return ranked.agg(
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        num.alias("auc2_numerator"),
        (
            num.cast("double")
            / (F.lit(2) * F.sum("p") * F.sum("n"))
        ).alias("auc"),
    )


@register(
    "eval_average_precision",
    oracle=f"""
    WITH {_EVAL_SCORED_SQL},
    cum AS (
      SELECT score, p,
             sum(p) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
             sum(p + n) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      FROM per_score
    ),
    terms AS (
      SELECT score,
             CAST(p * cum_p AS DOUBLE) / (tot.n_pos * cum_all) AS term
      FROM cum, tot
      WHERE p > 0
    )
    SELECT tot.n_pos,
           CAST(count(*) AS BIGINT) AS n_positive_scores,
           list_sum(list(term ORDER BY score)) AS avg_precision
    FROM terms, tot
    GROUP BY tot.n_pos
    """,
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation) on the distinct-score aggregate:
    AP = sum_s (p_s / n_pos) * precision(s), precision(s) = cum_p(s) /
    cum_all(s) cumulated from the top score down, ties handled as one
    block. Each term is a single BIGINT/BIGINT division (exact per
    row); the final sum left-folds the terms in ascending-score order
    on BOTH engines (F.aggregate over the sorted array here, ordered
    list_sum in the oracle) so the float accumulation is replayed
    bit-for-bit.

    Scale shape: identical to eval_auc_roc — corpus collapses to the
    <=1300-row score table before any ordering happens.
    """
    per_score = _eval_scored(spark, sf_dir)
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        "score",
        "p",
        F.sum("p").over(w).alias("cum_p"),
        F.sum(F.col("p") + F.col("n")).over(w).alias("cum_all"),
    )
    n_pos = per_score.agg(F.sum("p").alias("n_pos"))
    terms = (
        cum.filter(F.col("p") > 0)
        .crossJoin(F.broadcast(n_pos))
        .select(
            "n_pos",
            "score",
            (
                (F.col("p") * F.col("cum_p")).cast("double")
                / (F.col("n_pos") * F.col("cum_all"))
            ).alias("term"),
        )
    )
    folded = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("score", "term"))),
            lambda s: s.term,
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return terms.groupBy("n_pos").agg(
        F.count("*").alias("n_positive_scores"),
        folded.alias("avg_precision"),
    )


@register(
    "eval_calibration_bins",
    oracle=f"""
    WITH {_EVAL_SCORED_SQL}
    SELECT CAST(score // 100 AS BIGINT) AS bin,
           CAST(sum(p + n) AS BIGINT) AS n_rows,
           CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(p) AS DOUBLE) / sum(p + n) AS accuracy,
           CAST(sum(score * (p + n)) AS DOUBLE)
             / (sum(p + n) * {_SCORE_STEPS}) AS confidence,
           abs(CAST(sum(p) AS DOUBLE) / sum(p + n)
               - CAST(sum(score * (p + n)) AS DOUBLE)
                 / (sum(p + n) * {_SCORE_STEPS})) AS calibration_gap
    FROM per_score
    GROUP BY 1
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the synthetic classifier whose
    predicted probability is score/{_SCORE_STEPS}: per score-centile
    bin (13 bins of width 100), observed positive rate vs mean
    predicted probability and the |gap| an ECE would weight. Every
    column is integer sums plus one BIGINT/BIGINT division (confidence
    folds the /{_SCORE_STEPS} into the divisor so it stays a single
    division) — exact across engines.

    Scale shape: a second tiny aggregate over the distinct-score table;
    the corpus is touched once, bins are bounded (13 rows), no windows.
    """
    per_score = _eval_scored(spark, sf_dir)
    n_rows = F.sum(F.col("p") + F.col("n"))
    acc = F.sum("p").cast("double") / n_rows
    conf = F.sum(F.col("score") * (F.col("p") + F.col("n"))).cast(
        "double"
    ) / (n_rows * F.lit(_SCORE_STEPS))
    return per_score.groupBy(
        F.expr("score DIV 100").cast("long").alias("bin")
    ).agg(
        n_rows.alias("n_rows"),
        F.sum("p").alias("n_pos"),
        acc.alias("accuracy"),
        conf.alias("confidence"),
        F.abs(acc - conf).alias("calibration_gap"),
    )


@register(
    "eval_conformal_coverage",
    oracle=f"""
    WITH scored AS (
      SELECT o_orderkey % 2 = 0 AS cal,
             CASE WHEN o_orderstatus = 'F'
                  THEN {_SCORE_STEPS} -
                       ((CAST(concat('0x', substr(md5(CAST(o_orderkey
                            AS VARCHAR)), 1, 8)) AS BIGINT) % 1000) + 300)
                  ELSE (CAST(concat('0x', substr(md5(CAST(o_orderkey
                            AS VARCHAR)), 1, 8)) AS BIGINT) % 1000)
             END AS alpha
      FROM orders
    ),
    cal_hist AS (
      SELECT alpha, CAST(count(*) AS BIGINT) AS c
      FROM scored WHERE cal GROUP BY alpha
    ),
    cal_tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM cal_hist),
    cum AS (
      SELECT alpha,
             sum(c) OVER (ORDER BY alpha
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      FROM cal_hist
    ),
    thr AS (
      SELECT min(alpha) AS threshold
      FROM cum, cal_tot
      WHERE cum_c >= least((9 * (cal_tot.n_cal + 1) + 9) // 10,
                           cal_tot.n_cal)
    )
    SELECT cal_tot.n_cal, thr.threshold,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.alpha <= thr.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN s.alpha <= thr.threshold THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS coverage
    FROM scored s CROSS JOIN thr CROSS JOIN cal_tot
    WHERE NOT s.cal
    GROUP BY cal_tot.n_cal, thr.threshold
    """,
)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction calibration at 90% target coverage:
    the nonconformity of the true label under the synthetic classifier
    (alpha = {_SCORE_STEPS}-score for positives, score for negatives),
    thresholded at the ceil((n_cal+1)*0.9)-th smallest calibration
    alpha (nearest-rank, computed with the exact integer formula
    (9*(n+1)+9) DIV 10 — no float quantile), then audited for realized
    coverage on the held-out half. The split is o_orderkey parity —
    deterministic, engine-independent.

    Everything is integers plus one final int/int division — EXACT.
    Scale shape: the calibration side collapses to the bounded
    distinct-alpha histogram (<= {_SCORE_STEPS + 1} rows; cumulative
    window allowlisted on that aggregate), the threshold broadcasts
    back, and the test side is one map-side-combined count — two scans,
    no corpus sort, no corpus shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    is_pos = F.col("o_orderstatus") == "F"
    alpha = F.when(
        is_pos, F.lit(_SCORE_STEPS) - ((h % 1000) + F.lit(300))
    ).otherwise(h % 1000)
    scored = orders.select(
        (F.col("o_orderkey") % 2 == 0).alias("cal"), alpha.alias("alpha")
    )
    cal_hist = (
        scored.filter("cal").groupBy("alpha").agg(F.count("*").alias("c"))
    )
    cal_tot = cal_hist.agg(F.sum("c").alias("n_cal"))
    w = Window.orderBy("alpha").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cal_hist.select("alpha", F.sum("c").over(w).alias("cum_c"))
    thr = (
        cum.crossJoin(F.broadcast(cal_tot))
        .filter(
            F.col("cum_c")
            >= F.least(
                F.expr("(9 * (n_cal + 1) + 9) DIV 10"), F.col("n_cal")
            )
        )
        .agg(F.min("alpha").alias("threshold"))
    )
    covered = F.sum(
        F.when(F.col("alpha") <= F.col("threshold"), 1).otherwise(0)
    )
    return (
        scored.filter(~F.col("cal"))
        .crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(cal_tot))
        .groupBy("n_cal", "threshold")
        .agg(
            F.count("*").alias("n_test"),
            covered.alias("n_covered"),
            (covered.cast("double") / F.count("*")).alias("coverage"),
        )
    )


@register(
    "events_welch_ttest",
    oracle="""
    WITH m AS (
      SELECT CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
               AS BIGINT) AS n1,
             CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
               AS BIGINT) AS n2,
             CAST(sum(CASE WHEN event_type = 'click'
               THEN CAST(round(value * 1000000) AS BIGINT) END)
               AS BIGINT) AS s1,
             CAST(sum(CASE WHEN event_type = 'view'
               THEN CAST(round(value * 1000000) AS BIGINT) END)
               AS BIGINT) AS s2,
             sum(CASE WHEN event_type = 'click'
               THEN CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT)
                    * CAST(round(value * 1000000) AS BIGINT) END) AS q1,
             sum(CASE WHEN event_type = 'view'
               THEN CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT)
                    * CAST(round(value * 1000000) AS BIGINT) END) AS q2
      FROM events
    ),
    v AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(q1 AS DOUBLE)
              - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n1)
               / (n1 - 1) AS v1,
             (CAST(q2 AS DOUBLE)
              - (CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / n2)
               / (n2 - 1) AS v2
      FROM m
    )
    SELECT n1, n2,
           m1 / 1000000 AS mean_click,
           m2 / 1000000 AS mean_view,
           (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
           ((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
             / (((v1 / n1) * (v1 / n1)) / (n1 - 1)
                + ((v2 / n2) * (v2 / n2)) / (n2 - 1)) AS welch_df
    FROM v
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the 'click' and 'view'
    value distributions — the workhorse significance test an
    experimentation readout runs per metric, in one scan.

    Parity engineering: values quantize to exact BIGINT micros; the
    squared sums widen to HUGEINT/decimal(38,0) (micros^2 overflows
    int64); every downstream float — means, variances (moment form),
    the t statistic, the Welch-Satterthwaite df — is a FIXED sequence
    of double ops over those exact integers, and sqrt is correctly
    rounded by IEEE-754, so the whole row is bit-stable across
    engines. EXACT, no tolerance.

    Scale shape: ONE map-side-combined aggregate row; the test costs a
    single scan at any corpus size.
    """
    ev = table(spark, sf_dir, "events")
    micros = F.round(F.col("value") * 1000000).cast("long")
    microsq = micros.cast("decimal(19,0)") * micros.cast("decimal(19,0)")

    def only(t: str, c):
        return F.when(F.col("event_type") == t, c)

    m = ev.agg(
        F.count(only("click", F.lit(1))).alias("n1"),
        F.count(only("view", F.lit(1))).alias("n2"),
        F.sum(only("click", micros)).alias("s1"),
        F.sum(only("view", micros)).alias("s2"),
        F.sum(only("click", microsq)).alias("q1"),
        F.sum(only("view", microsq)).alias("q2"),
    )
    d = F.col
    v = m.select(
        "n1",
        "n2",
        (d("s1").cast("double") / d("n1")).alias("m1"),
        (d("s2").cast("double") / d("n2")).alias("m2"),
        (
            (
                d("q1").cast("double")
                - (d("s1").cast("double") * d("s1").cast("double")) / d("n1")
            )
            / (d("n1") - 1)
        ).alias("v1"),
        (
            (
                d("q2").cast("double")
                - (d("s2").cast("double") * d("s2").cast("double")) / d("n2")
            )
            / (d("n2") - 1)
        ).alias("v2"),
    )
    se1 = d("v1") / d("n1")
    se2 = d("v2") / d("n2")
    return v.select(
        "n1",
        "n2",
        (d("m1") / F.lit(1000000)).alias("mean_click"),
        (d("m2") / F.lit(1000000)).alias("mean_view"),
        ((d("m1") - d("m2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            ((se1 + se2) * (se1 + se2))
            / (
                (se1 * se1) / (d("n1") - 1)
                + (se2 * se2) / (d("n2") - 1)
            )
        ).alias("welch_df"),
    )


@register(
    "events_ks_test",
    oracle="""
    WITH q AS (
      SELECT CAST(round(value * 1000000) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS i2
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byv AS (
      SELECT v, CAST(sum(i1) AS BIGINT) AS c1, CAST(sum(i2) AS BIGINT) AS c2
      FROM q GROUP BY v
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM byv
    ),
    cum AS (
      SELECT sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
      FROM byv
    ),
    d AS (
      SELECT tot.n1, tot.n2,
             max(abs(CAST(cum1 AS DOUBLE) / tot.n1
                     - CAST(cum2 AS DOUBLE) / tot.n2)) AS d_stat
      FROM cum, tot GROUP BY tot.n1, tot.n2
    )
    SELECT n1, n2, d_stat,
           d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS ks_z,
           2 * (exp(-2 * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
                        * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))))
                - exp(-8 * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
                         * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))))
                + exp(-18 * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
                          * (d_stat * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))))
           ) AS p_approx
    FROM d
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the 'click' and
    'view' value distributions: D = sup |F1 - F2| over the pooled
    step CDF, the scaled statistic, and the 3-term Kolmogorov series
    p-value approximation.

    Scale shape: the pooled CDF is the 100 TB-hostile part — a naive
    ``sum() OVER (ORDER BY v)`` sorts every distinct value through one
    task. Here both running counts come from functions/ranking.py's
    grouped_range_prefix_sum (range-partition, per-slice local sums,
    one bounded offsets frame broadcast back), so no task ever sees
    more than one range slice; the final D is a plain max-aggregate
    (order-free). Parity: exact micro-quantized values, exact integer
    cumulative counts, one exact division per side per row, |diff| and
    max are bit-stable; sqrt is correctly rounded; the exp terms are
    the 1-ulp libm class (flip-safe off rounding boundaries).
    """
    from history_collector_spark.functions.ranking import (
        grouped_range_prefix_sum,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    byv = (
        ev.select(
            F.round(F.col("value") * 1000000).cast("long").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("i1"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("i2"),
        )
        .groupBy("v")
        .agg(F.sum("i1").alias("c1"), F.sum("i2").alias("c2"))
    )
    # BOTH running counts in one helper pass: chaining two calls puts
    # a join between two independently-sampled range exchanges, which
    # broke offset consistency (nondeterministic D) — see the helper's
    # docstring
    cum = grouped_range_prefix_sum(
        byv, [], [F.col("v")], ["c1", "c2"], out_col=["cum1", "cum2"]
    )
    tot = byv.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d_stat")
        )
    )
    z = F.col("d_stat") * F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    )
    p = F.lit(2) * (
        F.exp(F.lit(-2) * z * z)
        - F.exp(F.lit(-8) * z * z)
        + F.exp(F.lit(-18) * z * z)
    )
    return d.select("n1", "n2", "d_stat", z.alias("ks_z"), p.alias("p_approx"))


@register(
    "eval_brier_decomposition",
    oracle=f"""
    WITH {_EVAL_SCORED_SQL},
    binned AS (
      SELECT CAST(score // 100 AS BIGINT) AS bin,
             CAST(sum(p + n) AS BIGINT) AS nb,
             CAST(sum(p) AS BIGINT) AS pb,
             CAST(sum(score * (p + n)) AS BIGINT) AS sb,
             CAST(sum(score * score * (p + n)) AS BIGINT) AS sqb,
             CAST(sum(score * p) AS BIGINT) AS spb
      FROM per_score GROUP BY 1
    )
    SELECT bin, nb AS n_rows, pb AS n_pos,
           CAST(sqb - 2 * {_SCORE_STEPS} * spb
                + {_SCORE_STEPS * _SCORE_STEPS} * pb AS DOUBLE)
             / (nb * {_SCORE_STEPS * _SCORE_STEPS}) AS brier_bin,
           CAST((sb * nb - {_SCORE_STEPS} * pb * nb)
                * (sb - {_SCORE_STEPS} * pb) AS DOUBLE)
             / (nb * nb * CAST(nb AS DOUBLE)
                * {_SCORE_STEPS * _SCORE_STEPS}) AS reliability_bin,
           CAST(pb AS DOUBLE) / nb
             * (1 - CAST(pb AS DOUBLE) / nb) AS uncertainty_bin
    FROM binned
    """,
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin Brier score with Murphy-style terms for the synthetic
    classifier (p = score/{_SCORE_STEPS}): the bin's mean squared
    error, its reliability term n_b*(conf_b - acc_b)^2 / n_b (how much
    of the error is miscalibration), and its outcome uncertainty
    acc_b*(1-acc_b).

    Exactness: with integer scores, every numerator is an exact
    BIGINT — brier_bin's numerator is sum((score - S*y)^2) expanded to
    sqb - 2*S*spb + S^2*pb, and reliability_bin's is
    (sb - S*pb)^2 / n scaled to the common integer form
    (sb*n - S*pb*n)*(sb - S*pb) — so each emitted float is a single
    integer/integer division (or one fixed product chain). EXACT.

    Scale shape: a 13-row rollup of the bounded distinct-score
    aggregate; the corpus is scanned once, no windows.
    """
    per_score = _eval_scored(spark, sf_dir)
    s = _SCORE_STEPS
    nb = F.sum(F.col("p") + F.col("n"))
    pb = F.sum("p")
    sb = F.sum(F.col("score") * (F.col("p") + F.col("n")))
    sqb = F.sum(F.col("score") * F.col("score") * (F.col("p") + F.col("n")))
    spb = F.sum(F.col("score") * F.col("p"))
    binned = per_score.groupBy(
        F.expr("score DIV 100").cast("long").alias("bin")
    ).agg(
        nb.alias("nb"),
        pb.alias("pb"),
        sb.alias("sb"),
        sqb.alias("sqb"),
        spb.alias("spb"),
    )
    d = F.col
    acc = d("pb").cast("double") / d("nb")
    return binned.select(
        "bin",
        d("nb").alias("n_rows"),
        d("pb").alias("n_pos"),
        (
            (
                d("sqb") - F.lit(2 * s) * d("spb") + F.lit(s * s) * d("pb")
            ).cast("double")
            / (d("nb").cast("double") * F.lit(float(s * s)))
        ).alias("brier_bin"),
        # numerator algebra: (sb*nb - s*pb*nb) * (sb - s*pb) ==
        # nb * (sb - s*pb)^2 — the SAME integer, but the factored form
        # widens through decimal so it survives sf1+ bin counts where
        # the expanded long product overflowed (caught by the round-9
        # full-suite scale probe); identical integers -> identical
        # doubles -> hash-identical to the oracle at the driver SF.
        (
            (
                d("nb").cast("decimal(19,0)")
                * (d("sb") - F.lit(s) * d("pb")).cast("decimal(19,0)")
                * (d("sb") - F.lit(s) * d("pb")).cast("decimal(19,0)")
            ).cast("double")
            / (
                d("nb").cast("double")
                * d("nb").cast("double")
                * d("nb").cast("double")
                * F.lit(float(s * s))
            )
        ).alias("reliability_bin"),
        (acc * (F.lit(1) - acc)).alias("uncertainty_bin"),
    )


@register(
    "eval_bootstrap_auc_ci",
    oracle=f"""
    WITH scored AS (
      SELECT o_orderkey,
             (CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                AS BIGINT) % 1000)
             + CASE WHEN o_orderstatus = 'F' THEN 300 ELSE 0 END AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    weighted AS (
      SELECT r, score, y,
             (CASE
                WHEN u < {_POISSON_CDF[0]} THEN 0 WHEN u < {_POISSON_CDF[1]} THEN 1
                WHEN u < {_POISSON_CDF[2]} THEN 2 WHEN u < {_POISSON_CDF[3]} THEN 3
                WHEN u < {_POISSON_CDF[4]} THEN 4 WHEN u < {_POISSON_CDF[5]} THEN 5
                WHEN u < {_POISSON_CDF[6]} THEN 6 ELSE 7 END) AS wgt
      FROM (
        SELECT score, y, r,
               (CAST(concat('0x', substr(
                    md5(o_orderkey || '#' || CAST(r // 4 AS BIGINT)),
                    CAST(1 + 8 * (r % 4) AS BIGINT), 8))
                  AS BIGINT) + 1) / 4294967297.0 AS u
        FROM scored, (SELECT unnest(range(0, {N_REPLICATES})) AS r) reps
      )
    ),
    per_score AS (
      SELECT r, score,
             CAST(sum(wgt * y) AS BIGINT) AS wp,
             CAST(sum(wgt * (1 - y)) AS BIGINT) AS wn
      FROM weighted GROUP BY r, score
    ),
    ranked AS (
      SELECT r, wp, wn,
             coalesce(sum(wn) OVER (PARTITION BY r ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM per_score
    ),
    aucs AS (
      SELECT r,
             CAST(sum(wp * (2 * neg_below + wn)) AS DOUBLE)
               / (2 * sum(wp) * sum(wn)) AS auc
      FROM ranked GROUP BY r
      HAVING sum(wp) > 0 AND sum(wn) > 0
    )
    SELECT avg(auc) AS boot_mean_auc,
           quantile_cont(auc, 0.025) AS ci_lo,
           quantile_cont(auc, 0.975) AS ci_hi,
           stddev_samp(auc) AS boot_se,
           CAST(count(*) AS BIGINT) AS n_replicates
    FROM aucs
    """,
)
def eval_bootstrap_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the classifier's
    AUC — uncertainty-quantified eval in one dataflow: each row draws
    its deterministic Poisson(1) weight per replicate (the
    bootstrap_mean_ci md5-four-words idiom), the weighted rows
    collapse to per-(replicate, score) integer counts, each
    replicate's AUC is the exact tie-corrected Mann-Whitney ratio
    (eval_auc_roc's integer numerator, weighted), and the CI is read
    off the {N_REPLICATES} replicate AUCs.

    Scale shape: one scan fans out x{N_REPLICATES} into a
    (replicate, score) aggregate — bounded at {N_REPLICATES} x 1300
    rows whatever the corpus size; the cumulative window runs per
    replicate over that bounded table (allowlisted); the final
    percentile touches {N_REPLICATES} numbers. Per-replicate AUCs are
    exact (integer numerator, single division); the summary row's
    avg/quantile/stddev over 50 exact doubles is the flip-free class.

    The scan is spread() first (r15 optimization): the single-row-group
    input otherwise pins the 13-md5 + x50 explode pipeline to one task
    (bootstrap_mean_ci's measured 6.5 s -> 2.3 s class).
    """
    orders = spread(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        spark,
    )
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    reps = F.sequence(F.lit(0), F.lit(N_REPLICATES - 1))
    n_hashes = (N_REPLICATES + 3) // 4
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda hh: F.md5(
            F.concat_ws("#", F.col("o_orderkey"), hh.cast("long"))
        ),
    )
    # weights are derived AFTER the replicate explode from the carried
    # digest array (bootstrap_mean_ci's exact shape). Two pre-explode
    # "optimizations" were measured and REJECTED at sf0.1: a transform
    # lambda referencing the digest column re-evaluates all 13 md5 per
    # element (177s — the dsir._gram_expr collapse trap), and even the
    # collapse-safe flatten-the-digests form ran 2x slower (16.6s vs
    # 8.3s) than this explode.
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
        orders.select(
            ((h % 1000) + F.when(y == 1, 300).otherwise(0)).alias("score"),
            y.alias("y"),
            hashes.alias("hs"),
        )
        .select("score", "y", "hs", F.explode(reps).alias("r"))
        .withColumn("u", u)
        .withColumn("wgt", wgt)
    )
    per_score = weighted.groupBy("r", "score").agg(
        F.sum(F.col("wgt") * F.col("y")).alias("wp"),
        F.sum(F.col("wgt") * (F.lit(1) - F.col("y"))).alias("wn"),
    )
    w = (
        Window.partitionBy("r")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("wn").over(w), F.lit(0))
    )
    num = F.sum(F.col("wp") * (F.lit(2) * F.col("neg_below") + F.col("wn")))
    aucs = (
        ranked.groupBy("r")
        .agg(
            num.alias("num"),
            F.sum("wp").alias("tp"),
            F.sum("wn").alias("tn"),
        )
        .filter((F.col("tp") > 0) & (F.col("tn") > 0))
        .select(
            (
                F.col("num").cast("double")
                / (F.lit(2) * F.col("tp") * F.col("tn"))
            ).alias("auc")
        )
    )
    return aucs.agg(
        F.avg("auc").alias("boot_mean_auc"),
        F.expr("percentile(auc, 0.025)").alias("ci_lo"),
        F.expr("percentile(auc, 0.975)").alias("ci_hi"),
        F.stddev_samp("auc").alias("boot_se"),
        F.count("*").alias("n_replicates"),
    )
