"""Online-experimentation readouts: CUPED variance reduction.

An A/B platform over warehouse-scale data reads out experiments with
pre-period covariate adjustment (CUPED, Deng et al. 2013, WSDM): the
adjusted metric Y - theta*(X - E[X]) keeps the treatment-effect
estimate unbiased while shrinking variance by the squared pre/post
correlation — the standard way to cut experiment runtimes.

Reference scope: kinecosystem/history-collector has no experimentation
ops; large-scale-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import md5_hash32
from history_collector_spark.registry import register


@register(
    "experiment_cuped_adjusted",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate)
               + (max(o_orderdate) - min(o_orderdate)) / 2 AS mid
      FROM orders
    ),
    per_user AS (
      SELECT o_custkey,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 2 AS variant,
             CAST(sum(CASE WHEN o_orderdate < b.mid
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN o_orderdate >= b.mid
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM orders, bounds b
      GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
      FROM per_user
    ),
    th AS (
      SELECT n, sx,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
      FROM g
    )
    SELECT p.variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(p.x) AS BIGINT) AS pre_cents,
           CAST(sum(p.y) AS BIGINT) AS post_cents,
           CAST(sum(p.y) AS DOUBLE) / count(*) AS mean_post,
           th.theta,
           CAST(sum(p.y) AS DOUBLE) / count(*)
             - th.theta * (CAST(sum(p.x) AS DOUBLE) / count(*)
                           - CAST(th.sx AS DOUBLE) / th.n) AS adjusted_mean
    FROM per_user p CROSS JOIN th
    GROUP BY p.variant, th.theta, th.sx, th.n
    """,
)
def experiment_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: customers are hash-split into
    two variants (md5 parity — deterministic, engine-independent), the
    pre-period metric X is first-half spend and the post metric Y is
    second-half spend (integer cents); theta = cov(X,Y)/var(X) is
    estimated pooled, and each variant reports raw and adjusted means.

    Parity: the per-user metrics and all five moment sums are exact
    BIGINTs in any aggregation order (x*y peaks ~1e14, the sums stay
    far under 2^63); theta and the adjusted means combine those exact
    integers through a FIXED sequence of double products/divisions, so
    the floats are identical across engines — EXACT, no tolerance.

    Scale shape: one (custkey)-keyed aggregate with map-side combine,
    one 5-number global moment row broadcast back, one 2-row variant
    rollup. The covariate adjustment costs nothing extra at 100 TB —
    exactly why CUPED is the default readout at warehouse scale.
    """
    orders = table(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_orderdate").cast("timestamp").alias("mn"),
        F.max("o_orderdate").cast("timestamp").alias("mx"),
    ).select(
        F.timestamp_micros(
            ((F.unix_micros("mn") + F.unix_micros("mx")) / 2).cast("long")
        )
        .cast("timestamp_ntz")
        .alias("mid")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_user = (
        orders.crossJoin(F.broadcast(b))
        .select(
            "o_custkey",
            (md5_hash32(F.col("o_custkey").cast("string")) % 2).alias(
                "variant"
            ),
            F.when(F.col("o_orderdate") < F.col("mid"), cents)
            .otherwise(F.lit(0))
            .alias("xc"),
            F.when(F.col("o_orderdate") >= F.col("mid"), cents)
            .otherwise(F.lit(0))
            .alias("yc"),
        )
        .groupBy("o_custkey", "variant")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
    )
    # cross moments in exact wide integers: the long*long product of
    # per-user cent totals overflows int64, so the operands widen to
    # decimal(19,0) -> exact decimal(38,0) products, summed exactly in
    # any order (the oracle mirrors with HUGEINT = int128)
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    g = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    th = g.select(
        "n",
        "sx",
        (
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("theta"),
    )
    mean_post = F.sum("y").cast("double") / F.count("*")
    mean_pre = F.sum("x").cast("double") / F.count("*")
    return (
        per_user.crossJoin(F.broadcast(th))
        .groupBy("variant", "theta", "sx", "n")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("x").alias("pre_cents"),
            F.sum("y").alias("post_cents"),
            mean_post.alias("mean_post"),
            (
                mean_post
                - F.col("theta")
                * (mean_pre - F.col("sx").cast("double") / F.col("n"))
            ).alias("adjusted_mean"),
        )
        .select(
            "variant",
            "n_users",
            "pre_cents",
            "post_cents",
            "mean_post",
            "theta",
            "adjusted_mean",
        )
    )
