"""Exact Shapley-value channel attribution — the game-theoretic
counterpart of the Markov removal-effect attribution already in-tree
(queries/windows.py events_markov_attribution): each converting
user's pre-conversion touchset defines a coalition, the value
function v(S) counts conversions reachable with channel set S, and a
channel's credit is its exact Shapley value. Marketing/attribution
teams run BOTH (Shapley and Markov) because they bracket each other;
this completes the pair.

Exactness is the whole design: with n = 4 channels the subset lattice
has 16 cells, so the corpus reduces to 16 exact integers
(conversions per exact touchset) and the Shapley sum is computed as
an INTEGER numerator (margins weighted by s!(n-1-s)! literals) with
ONE division by 4! at the end — bit-stable cross-engine, no float
accumulates. The efficiency axiom (sum of Shapley values = v(full) -
v(empty)) is emitted as columns and pinned in tests, so the
combinatorics are verified by their defining law, not just by oracle
agreement.

Scale shape: ONE pass builds per-user (first-purchase time, touchset
bitmask) via min/bit_or aggregates; everything after operates on the
16-row mask table joined to a 16-row literal subset grid — corpus
size never touches the combinatorial stage. This is why exact Shapley
is tractable at 100 TB for bounded channel sets (and why tools cap
channels: the lattice doubles per channel, the corpus cost does not).
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_CHANNELS = ("click", "error", "signup", "view")  # bit i = 1 << i
_N = len(_CHANNELS)
_DENOM = factorial(_N)  # 24

# (channel index i, subset S not containing i, weight |S|!(n-1-|S|)!)
_GRID = [
    (i, S, factorial(bin(S).count("1")) * factorial(_N - 1 - bin(S).count("1")))
    for i in range(_N)
    for S in range(1 << _N)
    if not S & (1 << i)
]

_GRID_SQL = ", ".join(f"({i}, {S}, {w})" for i, S, w in _GRID)
_CH_BIT_SQL = " ".join(
    f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(_CHANNELS)
)


@register(
    "events_shapley_attribution",
    oracle=f"""
    WITH fp AS (
      SELECT user_id, min(ts) AS pt FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touch AS (
      SELECT f.user_id,
             coalesce(bit_or(CASE e.event_type {_CH_BIT_SQL} END), 0)
               AS mask
      FROM fp f LEFT JOIN events e
        ON e.user_id = f.user_id AND e.ts < f.pt
       AND e.event_type != 'purchase'
      GROUP BY f.user_id
    ),
    mc AS (SELECT mask, count(*) AS n FROM touch GROUP BY mask),
    v AS (
      SELECT S, CAST(coalesce(sum(mc.n), 0) AS BIGINT) AS v
      FROM (SELECT unnest(range(0, {1 << _N})) AS S)
      LEFT JOIN mc ON (mc.mask & ~S) = 0
      GROUP BY S
    ),
    grid(i, S, w) AS (VALUES {_GRID_SQL}),
    num AS (
      SELECT g.i,
             CAST(sum(g.w * (vi.v - vs.v)) AS BIGINT) AS shapley_num
      FROM grid g
      JOIN v vs ON vs.S = g.S
      JOIN v vi ON vi.S = (g.S | (1 << g.i))
      GROUP BY g.i
    )
    SELECT ['click','error','signup','view'][CAST(i AS INT) + 1]
             AS channel,
           shapley_num,
           CAST(shapley_num AS DOUBLE) / {_DENOM} AS shapley,
           (SELECT v FROM v WHERE S = {(1 << _N) - 1})
             - (SELECT v FROM v WHERE S = 0) AS attributable_conv
    FROM num
    """,
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley conversion credit per channel. One corpus pass
    (first-purchase min + pre-conversion bit_or per user), then pure
    16-row lattice arithmetic: v(S) = conversions whose touchset is a
    subset of S, margins weighted by the exact |S|!(n-1-|S|)! literals
    summed into an INTEGER numerator, one division by 4! at the end.
    The attributable_conv column repeats v(full)-v(empty) on every row
    so the efficiency axiom (sum of shapley == attributable_conv) is
    visible in the output itself."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    bit = F.when(F.col("event_type") == _CHANNELS[0], 1)
    for i, c in enumerate(_CHANNELS[1:], start=1):
        bit = bit.when(F.col("event_type") == c, 1 << i)
    touch = (
        fp.join(
            ev.filter(F.col("event_type") != "purchase").alias("e"),
            (F.col("e.user_id") == fp.user_id)
            & (F.col("e.ts") < F.col("pt")),
            "left",
        )
        .groupBy(fp.user_id)
        .agg(F.coalesce(F.bit_or(bit), F.lit(0)).alias("mask"))
    )
    mc = touch.groupBy("mask").agg(F.count("*").alias("n"))
    subsets = spark.range(1 << _N).select(F.col("id").alias("S"))
    v = (
        subsets.join(
            mc,
            mc.mask.bitwiseAND(F.bitwise_not(F.col("S"))) == 0,
            "left",
        )
        .groupBy("S")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("v"))
    )
    grid = spark.createDataFrame(_GRID, "i int, S int, w long")
    vs = v.select(F.col("S").alias("gS"), F.col("v").alias("v_s"))
    vi = v.select(F.col("S").alias("iS"), F.col("v").alias("v_si"))
    num = (
        grid.join(vs, grid.S == F.col("gS"))
        .join(vi, F.col("iS") == grid.S.bitwiseOR(F.expr("shiftleft(1, i)")))
        .groupBy("i")
        .agg(
            F.sum(F.col("w") * (F.col("v_si") - F.col("v_s")))
            .cast("long")
            .alias("shapley_num")
        )
    )
    vfull = v.filter(F.col("S") == (1 << _N) - 1).select(
        F.col("v").alias("v_full")
    )
    vempty = v.filter(F.col("S") == 0).select(F.col("v").alias("v_empty"))
    chan = F.element_at(
        F.array(*[F.lit(c) for c in _CHANNELS]), F.col("i") + 1
    )
    return (
        num.crossJoin(F.broadcast(vfull))
        .crossJoin(F.broadcast(vempty))
        .select(
            chan.alias("channel"),
            "shapley_num",
            (F.col("shapley_num").cast("double") / _DENOM).alias(
                "shapley"
            ),
            (F.col("v_full") - F.col("v_empty")).alias(
                "attributable_conv"
            ),
        )
    )
