"""Pairwise-preference rating — Bradley-Terry strength scores over
event-type "duels", the aggregation shape behind RLHF preference-data
curation (which response/source wins head-to-head, reduced to one
strength scalar per contestant).

Duels are derived deterministically from the event stream: each pair of
consecutive events by the same user is one comparison, won by the
event type with the larger ``value`` (same-type and tied-value pairs
are skipped). The distributed work is ONE user_id-keyed window pass
plus a bounded (winner, loser) count aggregation; the MM fixpoint
iteration runs driver-side over the types x types matrix — bounded by
the event-type vocabulary at any corpus size, exactly like the k-means
and Markov driver loops (clustering.py, windows.py).

Parity: the DuckDB oracle runs the same 25 MM iterations in a
recursive CTE over DOUBLE lists with the same operand order (j-ordered
inner sum, i-ordered normalization), so the float path is mirrored
operation-for-operation. NOTE the anchor of the recursive CTE must be
cast to DOUBLE[] — a bare ``1.0`` list literal types the recursive
column DECIMAL(2,1) and every iteration's result is silently rounded
back to one decimal place (observed: the fixpoint freezes at the
init vector).

Reference scope: kinecosystem/history-collector has no rating ops;
this is LLM-pipeline extension tier (Bradley & Terry 1952; MM
algorithm per Hunter 2004).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_BT_ITERS = 25

_DUELS_SQL = """
  ev AS (
    SELECT event_type, value,
           lead(event_type) OVER w AS nt,
           lead(value) OVER w AS nv
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ),
  duels AS (
    SELECT CASE WHEN value > nv THEN event_type ELSE nt END AS winner,
           CASE WHEN value > nv THEN nt ELSE event_type END AS loser
    FROM ev
    WHERE nt IS NOT NULL AND event_type <> nt AND value <> nv
  )
"""


@register(
    "events_bradley_terry",
    oracle=f"""
    WITH RECURSIVE
    {_DUELS_SQL},
    types AS (
      SELECT t, CAST(row_number() OVER (ORDER BY t) AS INT) AS idx
      FROM (SELECT DISTINCT winner AS t FROM duels
            UNION SELECT DISTINCT loser FROM duels)
    ),
    wl AS (
      SELECT winner, loser, CAST(count(*) AS BIGINT) AS n
      FROM duels GROUP BY winner, loser
    ),
    wins AS (
      SELECT t.idx AS i, t.t AS typ,
             CAST(coalesce(sum(wl.n), 0) AS BIGINT) AS w
      FROM types t LEFT JOIN wl ON wl.winner = t.t GROUP BY t.idx, t.t
    ),
    games AS (
      SELECT ti.idx AS i, tj.idx AS j, CAST(sum(n) AS BIGINT) AS nij
      FROM (
        SELECT winner AS a, loser AS b, n FROM wl
        UNION ALL SELECT loser AS a, winner AS b, n FROM wl
      ) g JOIN types ti ON ti.t = g.a JOIN types tj ON tj.t = g.b
      GROUP BY ti.idx, tj.idx
    ),
    grid AS (
      SELECT ti.idx AS i, tj.idx AS j,
             CAST(coalesce(games.nij, 0) AS DOUBLE) AS nij
      FROM types ti CROSS JOIN types tj
      LEFT JOIN games ON games.i = ti.idx AND games.j = tj.idx
    ),
    rows_ AS (SELECT i, list(nij ORDER BY j) AS r FROM grid GROUP BY i),
    mats AS (
      SELECT (SELECT list(r ORDER BY i) FROM rows_) AS nmat,
             (SELECT list(CAST(w AS DOUBLE) ORDER BY i) FROM wins) AS wv
    ),
    bt AS (
      SELECT 0 AS it,
             (SELECT list(CAST(1.0 AS DOUBLE) ORDER BY idx) FROM types) AS p
      UNION ALL
      SELECT it + 1,
        list_transform(range(1, len(p)+1), i ->
          m.wv[i] / list_sum(list_transform(range(1, len(p)+1), j ->
            m.nmat[i][j] / (p[i] + p[j]))))
      FROM bt, mats m WHERE it < {_BT_ITERS}
    ),
    final AS (SELECT p FROM bt WHERE it = {_BT_ITERS}),
    gsum AS (SELECT i, CAST(sum(nij) AS BIGINT) AS g FROM grid GROUP BY i)
    SELECT wins.typ AS event_type, wins.w AS wins, gsum.g AS games,
           final.p[wins.i] / list_sum(final.p) AS bt_score
    FROM wins JOIN gsum ON gsum.i = wins.i, final
    """,
)
def events_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths via the MM algorithm: the distributed
    pass is one user_id window (lead of type/value) reduced to a
    (winner, loser) count matrix — types^2 cells, a handful at any
    corpus size — and the driver iterates
    ``p_i <- W_i / sum_j n_ij / (p_i + p_j)`` 25 times (fixed count,
    no early exit, so the oracle's recursive CTE replays the identical
    float sequence), then normalizes once in index order.

    Scale shape: identical to events_markov_stationary — the only
    data-sized exchange is the per-user window; everything after the
    bounded collect is O(types^2) driver math.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type"),
        F.col("value"),
        F.lead("event_type").over(w).alias("nt"),
        F.lead("value").over(w).alias("nv"),
    ).filter(
        F.col("nt").isNotNull()
        & (F.col("event_type") != F.col("nt"))
        & (F.col("value") != F.col("nv"))
    )
    up = F.col("value") > F.col("nv")
    wl = (
        seq.select(
            F.when(up, F.col("event_type")).otherwise(F.col("nt")).alias(
                "winner"
            ),
            F.when(up, F.col("nt")).otherwise(F.col("event_type")).alias(
                "loser"
            ),
        )
        .groupBy("winner", "loser")
        .agg(F.count("*").alias("n"))
        .collect()  # BOUNDED: one row per ordered type pair
    )
    types = sorted({r["winner"] for r in wl} | {r["loser"] for r in wl})
    idx = {t: i for i, t in enumerate(types)}
    T = len(types)
    nmat = [[0.0] * T for _ in range(T)]
    wins = [0] * T
    for r in wl:
        a, b = idx[r["winner"]], idx[r["loser"]]
        nmat[a][b] += float(r["n"])
        nmat[b][a] += float(r["n"])
        wins[a] += r["n"]
    # fixed-count MM iteration, operand order mirroring the oracle's
    # recursive CTE exactly: inner sum in j order (zero terms included
    # — adding 0.0 is exact), outer list in i order
    p = [1.0] * T
    for _ in range(_BT_ITERS):
        newp = []
        for i in range(T):
            acc = 0.0
            for j in range(T):
                acc += nmat[i][j] / (p[i] + p[j])
            newp.append(float(wins[i]) / acc)
        p = newp
    s = 0.0
    for i in range(T):
        s += p[i]
    out = [
        (
            types[i],
            int(wins[i]),
            int(sum(int(v) for v in nmat[i])),
            p[i] / s,
        )
        for i in range(T)
    ]
    return spark.createDataFrame(
        out, "event_type string, wins bigint, games bigint, bt_score double"
    )
