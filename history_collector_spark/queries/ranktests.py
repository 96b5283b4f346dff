"""Nonparametric rank statistics: Mann-Whitney U + Kendall tau-b.

New operator family (round 15). Model-eval and data-drift work wants
distribution comparisons that don't assume normality; the two
workhorses are the Mann-Whitney U test (are two groups' metric
distributions shifted?) and Kendall's tau-b (do two daily series move
together, ties handled?). Both are RANK statistics: once the metric
is quantized to the package's 1e-6 fixed-point grid, every number
either engine produces is an exact integer — no float oracle risk.

Scale shapes:
- Mann-Whitney runs its rank window over the DISTINCT-VALUE frame
  (groupBy (pair, qv) collapses map-side first), so the window input
  is bounded by metric granularity, not corpus size.
- Kendall tau-b self-joins the per-day aggregate frame — bounded by
  the calendar, not the corpus — after one map-side-combined daily
  rollup of the events scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_BASELINE = "click"
_OTHERS = ("error", "purchase", "signup", "view")

_MWU_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
  FROM events
),
pairs AS (
  SELECT o.t AS pair, 1 AS grp, qv FROM ev,
         (SELECT unnest(['{"','".join(_OTHERS)}']) AS t) o
  WHERE ev.event_type = o.t
  UNION ALL
  SELECT o.t AS pair, 0 AS grp, qv FROM ev,
         (SELECT unnest(['{"','".join(_OTHERS)}']) AS t) o
  WHERE ev.event_type = '{_BASELINE}'
),
vals AS (
  SELECT pair, qv, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(grp) AS BIGINT) AS cnt1
  FROM pairs GROUP BY pair, qv
),
ranked AS (
  SELECT pair, cnt, cnt1,
         2 * (sum(cnt) OVER (PARTITION BY pair ORDER BY qv
                             ROWS UNBOUNDED PRECEDING) - cnt)
           + cnt + 1 AS r2
  FROM vals
)
SELECT pair,
       CAST(sum(cnt1) AS BIGINT) AS n1,
       CAST(sum(cnt) - sum(cnt1) AS BIGINT) AS n2,
       CAST(sum(cnt1 * r2) AS BIGINT) AS r1_x2,
       CAST(2 * sum(cnt1) * (sum(cnt) - sum(cnt1))
            + sum(cnt1) * (sum(cnt1) + 1)
            - sum(cnt1 * r2) AS BIGINT) AS u1_x2
FROM ranked
GROUP BY pair
"""


@register("events_mann_whitney_u", oracle=_MWU_ORACLE)
def events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U for each event type against the '{click}'
    baseline on the 1e-6-quantized value. Doubled average ranks keep
    tie handling in integers: for a distinct value v,
    r2(v) = 2*(#below) + cnt(v) + 1, R1*2 = sum(cnt1 * r2), and
    U1*2 = 2*n1*n2 + n1*(n1+1) - R1*2 — every output column exact.

    Plan: one scan -> explode only the BASELINE rows across the 4
    pair slots (the small constant fan-out) -> map-side-combined
    (pair, qv) aggregate -> rank window over the DISTINCT-VALUE frame
    -> 4-row result. The window partition count equals the pair
    count; its input is the distinct-value frame, which metric
    granularity bounds at any corpus size."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("qv"),
    )
    others = F.array(*[F.lit(t) for t in _OTHERS])
    grp1 = ev.filter(F.col("event_type").isin(*_OTHERS)).select(
        F.col("event_type").alias("pair"), F.lit(1).alias("grp"), "qv"
    )
    grp0 = (
        ev.filter(F.col("event_type") == _BASELINE)
        .select(F.explode(others).alias("pair"), F.lit(0).alias("grp"), "qv")
    )
    vals = (
        grp1.unionByName(grp0)
        .groupBy("pair", "qv")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("grp").cast("long").alias("cnt1"),
        )
    )
    w = (
        Window.partitionBy("pair")
        .orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = vals.withColumn(
        "r2",
        2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1,
    )
    agg = ranked.groupBy("pair").agg(
        F.sum("cnt1").cast("long").alias("n1"),
        (F.sum("cnt") - F.sum("cnt1")).cast("long").alias("n2"),
        F.sum(F.col("cnt1") * F.col("r2")).cast("long").alias("r1_x2"),
    )
    return agg.select(
        "pair",
        "n1",
        "n2",
        "r1_x2",
        (
            2 * F.col("n1") * F.col("n2")
            + F.col("n1") * (F.col("n1") + 1)
            - F.col("r1_x2")
        )
        .cast("long")
        .alias("u1_x2"),
    )


_KENDALL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS nx,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sy
  FROM events GROUP BY event_type, d
),
pair AS (
  SELECT a.event_type,
         CASE WHEN (a.nx - b.nx) * (a.sy - b.sy) > 0 THEN 1 ELSE 0
           END AS conc,
         CASE WHEN (a.nx - b.nx) * (a.sy - b.sy) < 0 THEN 1 ELSE 0
           END AS disc,
         CASE WHEN a.nx = b.nx AND a.sy != b.sy THEN 1 ELSE 0
           END AS tie_x,
         CASE WHEN a.nx != b.nx AND a.sy = b.sy THEN 1 ELSE 0
           END AS tie_y,
         CASE WHEN a.nx = b.nx AND a.sy = b.sy THEN 1 ELSE 0
           END AS tie_xy
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
)
SELECT p.event_type,
       CAST(n.n_days AS BIGINT) AS n_days,
       CAST(sum(conc) AS BIGINT) AS n_conc,
       CAST(sum(disc) AS BIGINT) AS n_disc,
       CAST(sum(tie_x) AS BIGINT) AS n_tie_x,
       CAST(sum(tie_y) AS BIGINT) AS n_tie_y,
       CAST(sum(tie_xy) AS BIGINT) AS n_tie_xy
FROM pair p
JOIN (SELECT event_type, count(*) AS n_days FROM daily
      GROUP BY event_type) n USING (event_type)
GROUP BY p.event_type, n.n_days
"""


@register("events_kendall_tau_daily", oracle=_KENDALL_ORACLE)
def events_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance census between each event type's
    daily volume (x) and daily 1e-6-quantized value total (y):
    concordant / discordant / x-tied / y-tied / both-tied pair counts
    plus the day count — the exact integer ingredients of tau-b
    (tau_b = (C-D)/sqrt((C+D+Tx)(C+D+Ty)) is left to the caller so
    the result stays float-free cross-engine).

    Plan: one map-side-combined daily rollup of the events scan, then
    a self-equi-join ON EVENT TYPE over the per-day frame — bounded
    by the calendar (days^2 per type), independent of corpus size.
    The join is an equi-join on event_type with a range predicate on
    the date, never a cartesian product."""
    daily = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("qv"),
        )
        .groupBy("event_type", "d")
        .agg(
            F.count("*").cast("long").alias("nx"),
            F.sum("qv").cast("long").alias("sy"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    prod = (F.col("a.nx") - F.col("b.nx")) * (F.col("a.sy") - F.col("b.sy"))
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.when(prod > 0, 1).otherwise(0).alias("conc"),
            F.when(prod < 0, 1).otherwise(0).alias("disc"),
            F.when(
                (F.col("a.nx") == F.col("b.nx"))
                & (F.col("a.sy") != F.col("b.sy")),
                1,
            )
            .otherwise(0)
            .alias("tie_x"),
            F.when(
                (F.col("a.nx") != F.col("b.nx"))
                & (F.col("a.sy") == F.col("b.sy")),
                1,
            )
            .otherwise(0)
            .alias("tie_y"),
            F.when(
                (F.col("a.nx") == F.col("b.nx"))
                & (F.col("a.sy") == F.col("b.sy")),
                1,
            )
            .otherwise(0)
            .alias("tie_xy"),
        )
    )
    ndays = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.sum("conc").cast("long").alias("n_conc"),
            F.sum("disc").cast("long").alias("n_disc"),
            F.sum("tie_x").cast("long").alias("n_tie_x"),
            F.sum("tie_y").cast("long").alias("n_tie_y"),
            F.sum("tie_xy").cast("long").alias("n_tie_xy"),
        )
        .join(F.broadcast(ndays), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_conc",
            "n_disc",
            "n_tie_x",
            "n_tie_y",
            "n_tie_xy",
        )
    )
