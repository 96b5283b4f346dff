"""Ranking-quality and annotation-quality evaluation: NDCG@k, MRR /
recall@k, Fleiss' kappa inter-annotator agreement, and preference-pair
mining stats — the measurement layer of a retrieval or RLHF data
pipeline (the reference's query surface stops at relational
aggregates; these extend the eval family the way AUC/calibration did).

Parity discipline (PARITY.md): every per-query metric is built from
bit-stable pieces — rank-pivoted gains folded in ONE FIXED
parenthesization with PRECOMPUTED literal discount weights shared by
both engines (log2 in two libms is not guaranteed bit-equal; the same
17-digit literal is), integer counts divided once — so per-row values
are bit-identical cross-engine and only the final group means carry
summation-order drift (O(1) magnitudes, flip-free).

The retrieval fixture: each order is a "query", its lineitems are the
ranked candidates — score = l_extendedprice (the retriever), graded
relevance = l_quantity (1..50 integers), binary relevance = quantity
>= 45. Deterministic, join-free to generate, and skew-realistic
(orders have 1..7 candidates).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_K = 5
# 1/log2(rank+1) for ranks 1..5, as shared 17-digit literals (NOT
# engine log2 calls — libm vs JVM StrictMath can differ in the last
# ulp, and the discount is a constant, not data).
_DCG_W = tuple(1.0 / math.log2(r + 1) for r in range(1, _K + 1))
_REL_BIN = 45


def _rank_pivot_gain(rel_by_rank: list, weights: tuple[float, ...]):
    """Fixed-parenthesization weighted fold ((((g1+g2)+g3)+g4)+g5) of
    rank-pivoted gains — bit-stable regardless of aggregation order."""
    acc = None
    for col, w in zip(rel_by_rank, weights):
        term = F.coalesce(col.cast("double"), F.lit(0.0)) * F.lit(w)
        acc = term if acc is None else acc + term
    return acc


@register(
    "eval_ndcg_at_k",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CAST(l_quantity AS BIGINT) AS rel,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC,
                                         l_linenumber) AS r,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_quantity DESC,
                                         l_linenumber) AS ir
      FROM lineitem
    ),
    per_q AS (
      SELECT l_orderkey,
        ((((coalesce(CAST(max(CASE WHEN r = 1 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[0]!r}
          + coalesce(CAST(max(CASE WHEN r = 2 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[1]!r})
          + coalesce(CAST(max(CASE WHEN r = 3 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[2]!r})
          + coalesce(CAST(max(CASE WHEN r = 4 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[3]!r})
          + coalesce(CAST(max(CASE WHEN r = 5 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[4]!r})
          AS dcg,
        ((((coalesce(CAST(max(CASE WHEN ir = 1 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[0]!r}
          + coalesce(CAST(max(CASE WHEN ir = 2 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[1]!r})
          + coalesce(CAST(max(CASE WHEN ir = 3 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[2]!r})
          + coalesce(CAST(max(CASE WHEN ir = 4 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[3]!r})
          + coalesce(CAST(max(CASE WHEN ir = 5 THEN rel END) AS DOUBLE), 0.0) * {_DCG_W[4]!r})
          AS idcg
      FROM ranked GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_queries,
           avg(p.dcg / p.idcg) AS avg_ndcg5,
           min(p.dcg / p.idcg) AS min_ndcg5,
           max(p.dcg / p.idcg) AS max_ndcg5
    FROM per_q p JOIN orders o ON o.o_orderkey = p.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 with graded relevance: per query, gains are pivoted by
    rank and folded with literal discount weights in one fixed
    parenthesization, so each query's DCG/IDCG (and their single
    division) is bit-identical in both engines; min/max endpoints are
    then EXACT and only avg carries flip-free summation drift.

    Scale shape: two window ranks over ONE (l_orderkey) exchange (same
    partitioning, Catalyst reuses it), a pivot agg on the same key, a
    co-keyed join to orders for the report dimension, and a tiny final
    agg. Candidate lists per query are bounded (top-k pivot columns),
    so no partition ever holds more than a query's candidates."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("rel"),
        "l_extendedprice",
    )
    wscore = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    wideal = Window.partitionBy("l_orderkey").orderBy(
        F.col("rel").desc(), F.col("l_linenumber")
    )
    ranked = li.select(
        "l_orderkey",
        "rel",
        F.row_number().over(wscore).alias("r"),
        F.row_number().over(wideal).alias("ir"),
    )
    dcg = _rank_pivot_gain(
        [F.max(F.when(F.col("r") == k, F.col("rel")))
         for k in range(1, _K + 1)],
        _DCG_W,
    )
    idcg = _rank_pivot_gain(
        [F.max(F.when(F.col("ir") == k, F.col("rel")))
         for k in range(1, _K + 1)],
        _DCG_W,
    )
    per_q = ranked.groupBy("l_orderkey").agg(
        dcg.alias("dcg"), idcg.alias("idcg")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    ndcg = F.col("dcg") / F.col("idcg")
    return (
        per_q.join(orders, per_q.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_queries"),
            F.avg(ndcg).alias("avg_ndcg5"),
            F.min(ndcg).alias("min_ndcg5"),
            F.max(ndcg).alias("max_ndcg5"),
        )
    )


@register(
    "eval_mrr_recall_at_k",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CASE WHEN l_quantity >= {_REL_BIN} THEN 1 ELSE 0 END AS rel,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC,
                                         l_linenumber) AS r
      FROM lineitem
    ),
    per_q AS (
      SELECT l_orderkey,
             min(CASE WHEN rel = 1 THEN r END) AS first_rel,
             CAST(sum(rel) AS BIGINT) AS n_rel,
             CAST(sum(CASE WHEN rel = 1 AND r <= {_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_topk
      FROM ranked GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN p.n_rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_relevant,
           avg(CASE WHEN p.n_rel > 0
                    THEN 1.0 / p.first_rel ELSE 0.0 END) AS mrr,
           avg(CASE WHEN p.n_rel > 0
                    THEN CAST(p.n_rel_topk AS DOUBLE) / p.n_rel END)
             AS avg_recall5
    FROM per_q p JOIN orders o ON o.o_orderkey = p.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def eval_mrr_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR (queries with no relevant item contribute 0, the standard
    convention) and mean recall@5 (defined only over queries WITH a
    relevant item — its average skips the others via NULL). Per-query
    values are single int/int divisions (exact); group means carry
    only flip-free summation drift.

    Scale shape: one (l_orderkey) exchange shared by the window and
    the aggregate, then the co-keyed orders join — identical topology
    to eval_ndcg_at_k, and the binary-relevance plan prunes
    l_quantity into the rank stage (no second scan)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") >= _REL_BIN).cast("int").alias("rel"),
        "l_extendedprice",
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    ranked = li.select(
        "l_orderkey", "rel", F.row_number().over(w).alias("r")
    )
    per_q = ranked.groupBy("l_orderkey").agg(
        F.min(F.when(F.col("rel") == 1, F.col("r"))).alias("first_rel"),
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum(
            ((F.col("rel") == 1) & (F.col("r") <= _K)).cast("int")
        ).cast("long").alias("n_rel_topk"),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    has_rel = F.col("n_rel") > 0
    return (
        per_q.join(orders, per_q.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum(has_rel.cast("int")).cast("long").alias(
                "n_with_relevant"
            ),
            F.avg(
                F.when(has_rel, F.lit(1.0) / F.col("first_rel"))
                .otherwise(F.lit(0.0))
            ).alias("mrr"),
            F.avg(
                F.when(
                    has_rel,
                    F.col("n_rel_topk").cast("double") / F.col("n_rel"),
                )
            ).alias("avg_recall5"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-annotator agreement: Fleiss' kappa over a deterministic
# 5-annotations-per-item panel synthesized from events. All aggregates
# are exact integers (decimal-widened where squares can pass 2^53);
# the three output statistics are single divisions / one fixed
# parenthesized expression over exact values — bit-stable.
# ---------------------------------------------------------------------------

_FK_N = 5  # annotations per item
_FK_LABELS = 4


@register(
    "label_fleiss_kappa",
    oracle=f"""
    WITH ann AS (
      SELECT event_id // {_FK_N} AS item,
             (event_id + user_id) % {_FK_LABELS} AS label
      FROM events
    ),
    complete AS (
      SELECT item FROM ann GROUP BY item HAVING count(*) = {_FK_N}
    ),
    cells AS (
      SELECT a.item, a.label, count(*) AS n_ij
      FROM ann a JOIN complete c ON a.item = c.item
      GROUP BY a.item, a.label
    ),
    per_item AS (
      SELECT item, sum(n_ij * n_ij) AS sumsq FROM cells GROUP BY item
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(sumsq) AS BIGINT) AS s1
      FROM per_item
    ),
    lab AS (
      SELECT CAST(sum(CAST(c_j AS HUGEINT) * c_j) AS DOUBLE) AS sum_cj_sq
      FROM (SELECT sum(n_ij) AS c_j FROM cells GROUP BY label)
    )
    SELECT t.n_items,
           CAST({_FK_N} AS BIGINT) AS n_per_item,
           CAST(t.s1 - t.n_items * {_FK_N} AS DOUBLE)
             / (t.n_items * {_FK_N * (_FK_N - 1)}) AS p_bar,
           l.sum_cj_sq
             / (CAST(t.n_items AS DOUBLE) * {_FK_N}
                * (CAST(t.n_items AS DOUBLE) * {_FK_N})) AS p_e,
           ((CAST(t.s1 - t.n_items * {_FK_N} AS DOUBLE)
             / (t.n_items * {_FK_N * (_FK_N - 1)}))
            - (l.sum_cj_sq
               / (CAST(t.n_items AS DOUBLE) * {_FK_N}
                  * (CAST(t.n_items AS DOUBLE) * {_FK_N}))))
           / (1.0 - (l.sum_cj_sq
                     / (CAST(t.n_items AS DOUBLE) * {_FK_N}
                        * (CAST(t.n_items AS DOUBLE) * {_FK_N}))))
             AS kappa
    FROM tot t, lab l
    """,
)
def label_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement for a fixed-size
    annotator panel — the QA gate any labeled training set needs
    before its labels are trusted. Items are event_id // 5 blocks
    (only complete 5-annotation items count), labels a deterministic
    (event_id + user_id) % 4.

    Exactness: P_bar's numerator/denominator and P_e's numerator are
    exact integers (label totals squared are decimal-widened — at
    100x this data c_j^2 passes 2^53, the eval_brier overflow class);
    each statistic is a single division, and kappa is one fixed
    parenthesized expression over those two exact doubles, so all
    three floats are bit-identical cross-engine.

    Scale shape: one (item, label) hash agg with map-side combine,
    one item-grain agg, two scalar folds — no window, no join back;
    the agreement statistic of a trillion annotations reduces to two
    numbers per label cell."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("event_id") / _FK_N).cast("long").alias("item"),
        ((F.col("event_id") + F.col("user_id")) % _FK_LABELS).alias(
            "label"
        ),
    )
    complete = (
        ev.groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == _FK_N)
        .select("item")
    )
    cells = (
        ev.join(complete, "item")
        .groupBy("item", "label")
        .agg(F.count("*").alias("n_ij"))
    )
    per_item = cells.groupBy("item").agg(
        F.sum(F.col("n_ij") * F.col("n_ij")).alias("sumsq")
    )
    tot = per_item.agg(
        F.count("*").alias("n_items"),
        F.sum("sumsq").cast("long").alias("s1"),
    )
    lab = (
        cells.groupBy("label")
        .agg(F.sum("n_ij").alias("c_j"))
        .agg(
            F.sum(
                F.col("c_j").cast("decimal(38,0)") * F.col("c_j")
            ).cast("double").alias("sum_cj_sq")
        )
    )
    n_items = F.col("n_items")
    p_bar = (
        (F.col("s1") - n_items * _FK_N).cast("double")
        / (n_items * (_FK_N * (_FK_N - 1)))
    )
    t = n_items.cast("double") * _FK_N
    p_e = F.col("sum_cj_sq") / (t * t)
    return tot.crossJoin(lab).select(
        "n_items",
        F.lit(_FK_N).cast("long").alias("n_per_item"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Preference-pair mining stats: pair consecutive events per prompt
# block, chosen = higher value (tie -> the earlier event), and report
# the margin distribution + position-bias rate per event type — the
# sanity screen run over RLHF comparison data before training a
# reward model on it.
# ---------------------------------------------------------------------------


@register(
    "preference_pair_stats",
    oracle="""
    WITH halves AS (
      SELECT event_id // 2 AS pid,
             max(CASE WHEN event_id % 2 = 0 THEN value END) AS v_first,
             max(CASE WHEN event_id % 2 = 1 THEN value END) AS v_second,
             max(CASE WHEN event_id % 2 = 0 THEN event_type END)
               AS etype
      FROM events GROUP BY event_id // 2
    ),
    pairs AS (
      SELECT etype,
             CASE WHEN v_first >= v_second THEN 1 ELSE 0 END
               AS first_chosen,
             CASE WHEN v_first = v_second THEN 1 ELSE 0 END AS tie,
             abs(v_first - v_second) AS margin
      FROM halves WHERE v_first IS NOT NULL AND v_second IS NOT NULL
    )
    SELECT etype AS event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(first_chosen) AS BIGINT) AS n_first_chosen,
           CAST(sum(first_chosen) AS DOUBLE) / count(*)
             AS first_chosen_rate,
           CAST(sum(tie) AS BIGINT) AS n_ties,
           max(margin) AS max_margin,
           CAST(sum(CASE WHEN margin >= 10.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_confident
    FROM pairs GROUP BY etype
    """,
)
def preference_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison-data QA: position-bias rate (a healthy blind
    comparison set sits near 0.5 first-chosen; a drifted annotation UI
    shows up here first), tie rate, and the reward-margin distribution
    (pairs with margin >= 10 are 'confident' supervision; a glut of
    near-ties means the pairing policy wastes annotator budget).

    Exactness: pairing is a pivot agg on pid = event_id // 2 (no
    self-join), chosen/tie are comparisons of STORED doubles, margin
    is one subtraction of stored doubles (exact same double both
    engines), rates are single int/int divisions, and max_margin is a
    stored-value endpoint — no output float mixes summation order.

    Scale shape: one (pid) hash agg with map-side combine, one
    event_type agg — pairing a trillion comparisons never shuffles
    more than the pivoted pair rows."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("event_id") / 2).cast("long").alias("pid"),
        (F.col("event_id") % 2).alias("half"),
        "value",
        "event_type",
    )
    halves = ev.groupBy("pid").agg(
        F.max(F.when(F.col("half") == 0, F.col("value"))).alias("v_first"),
        F.max(F.when(F.col("half") == 1, F.col("value"))).alias(
            "v_second"
        ),
        F.max(F.when(F.col("half") == 0, F.col("event_type"))).alias(
            "etype"
        ),
    )
    pairs = halves.filter(
        F.col("v_first").isNotNull() & F.col("v_second").isNotNull()
    ).select(
        "etype",
        (F.col("v_first") >= F.col("v_second")).cast("int").alias(
            "first_chosen"
        ),
        (F.col("v_first") == F.col("v_second")).cast("int").alias("tie"),
        F.abs(F.col("v_first") - F.col("v_second")).alias("margin"),
    )
    return pairs.groupBy(F.col("etype").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.sum("first_chosen").cast("long").alias("n_first_chosen"),
        (
            F.sum("first_chosen").cast("double") / F.count("*")
        ).alias("first_chosen_rate"),
        F.sum("tie").cast("long").alias("n_ties"),
        F.max("margin").alias("max_margin"),
        F.sum((F.col("margin") >= 10.0).cast("int")).cast("long").alias(
            "n_confident"
        ),
    )
