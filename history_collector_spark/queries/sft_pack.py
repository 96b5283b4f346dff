"""SFT conversation assembly: multi-turn chat-template packing with a
context budget — the data-prep step between a curated document pool
and a supervised fine-tuning run. Turns are grouped into
conversations, each turn pays its role-template overhead (tag +
separator tokens), a per-conversation system preamble is charged
once, and the conversation is truncated to the FIRST k whole turns
that fit the context window (the standard SFT truncation: never split
a turn, never drop a middle turn).

Exactness: token counts are word counts plus literal overheads —
exact integers end to end; the budget cut is a monotone cumulative
sum, so "kept" is a prefix property and every output is an integer
aggregate.

The companion eval_win_rate_matrix extends the McNemar pair to the
full pairwise matrix over three rankers — the league table an eval
pipeline publishes before promoting a system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_TURNS_PER_CONV = 4
_CTX_BUDGET = 160
_SYS_OVERHEAD = 5  # system preamble tokens, charged once
_ROLE_OVERHEAD = {0: 3 + 2, 1: 4 + 2}  # user / assistant tag + separators


@register(
    "curation_chat_template_pack",
    oracle=f"""
    WITH turns AS (
      SELECT doc_id // {_TURNS_PER_CONV} AS conv_id,
             doc_id % {_TURNS_PER_CONV} AS turn,
             CAST(len(string_split(text, ' ')) AS BIGINT)
               + CASE WHEN doc_id % 2 = 0 THEN {_ROLE_OVERHEAD[0]}
                      ELSE {_ROLE_OVERHEAD[1]} END AS nt
      FROM documents
    ),
    cum AS (
      SELECT conv_id, turn, nt,
             {_SYS_OVERHEAD} + sum(nt) OVER (
               PARTITION BY conv_id ORDER BY turn
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM turns
    ),
    conv AS (
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(CASE WHEN cum <= {_CTX_BUDGET} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
             CAST({_SYS_OVERHEAD}
                  + sum(CASE WHEN cum <= {_CTX_BUDGET} THEN nt
                             ELSE 0 END) AS BIGINT) AS kept_tokens,
             CAST({_SYS_OVERHEAD} + sum(nt) AS BIGINT) AS total_tokens
      FROM cum GROUP BY conv_id
    )
    SELECT n_kept,
           CAST(count(*) AS BIGINT) AS n_conversations,
           CAST(sum(CASE WHEN n_kept < n_turns THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(sum(kept_tokens) AS BIGINT) AS sum_kept_tokens,
           CAST(sum(total_tokens - kept_tokens) AS BIGINT)
             AS tokens_dropped,
           CAST(max(total_tokens) AS BIGINT) AS max_total_tokens
    FROM conv GROUP BY n_kept
    """,
)
def curation_chat_template_pack(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Profile of the SFT packing outcome, grouped by how many whole
    turns survive the {_CTX_BUDGET}-token window: conversation counts,
    truncation incidence, kept-vs-dropped token mass, and the longest
    raw conversation. Role overheads are literal integers and the
    budget cut is a prefix property of the monotone running total, so
    every cell is exact.

    Scale shape: one (conv_id) aggregate collects each conversation's
    <= {_TURNS_PER_CONV} turns into an array folded ROW-LOCALLY
    (sort + running total inside the row — no window, no second
    exchange), then one tiny report aggregate. Packing a trillion
    turns costs two hash exchanges of narrow rows."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    nt = (
        F.size(F.split("text", " "))
        + F.when(d % 2 == 0, _ROLE_OVERHEAD[0]).otherwise(
            _ROLE_OVERHEAD[1]
        )
    ).cast("long")
    turns = docs.select(
        (d / _TURNS_PER_CONV).cast("long").alias("conv_id"),
        F.struct(
            (d % _TURNS_PER_CONV).alias("turn"), nt.alias("nt")
        ).alias("t"),
    )
    conv = turns.groupBy("conv_id").agg(
        F.sort_array(F.collect_list("t")).alias("ts")
    )
    # row-local fold: running total with the system preamble, then the
    # prefix that fits the budget (F.get is the null-safe out-of-bounds
    # accessor — ANSI element_at throws on the empty-array first step)
    cums = F.aggregate(
        F.col("ts"),
        F.expr("CAST(array() AS array<bigint>)"),
        lambda acc, t: F.concat(
            acc,
            F.array(
                F.coalesce(
                    F.get(acc, F.size(acc) - 1),
                    F.lit(_SYS_OVERHEAD).cast("long"),
                )
                + t["nt"]
            ),
        ),
    )
    kept_mask = F.transform(cums, lambda c: (c <= _CTX_BUDGET).cast("int"))
    n_kept = F.aggregate(kept_mask, F.lit(0), lambda a, x: a + x)
    nts = F.transform(F.col("ts"), lambda t: t["nt"])
    total = F.aggregate(
        nts, F.lit(_SYS_OVERHEAD).cast("long"), lambda a, x: a + x
    )
    kept_tokens = F.lit(_SYS_OVERHEAD).cast("long") + F.aggregate(
        F.zip_with(
            nts, kept_mask, lambda n, k: n * k.cast("bigint")
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    per_conv = conv.select(
        F.size("ts").alias("n_turns"),
        n_kept.alias("n_kept"),
        kept_tokens.alias("kept_tokens"),
        total.alias("total_tokens"),
    )
    return per_conv.groupBy(F.col("n_kept").cast("long").alias("n_kept")).agg(
        F.count("*").alias("n_conversations"),
        F.sum((F.col("n_kept") < F.col("n_turns")).cast("int"))
        .cast("long").alias("n_truncated"),
        F.sum("kept_tokens").alias("sum_kept_tokens"),
        F.sum(F.col("total_tokens") - F.col("kept_tokens")).alias(
            "tokens_dropped"
        ),
        F.max("total_tokens").alias("max_total_tokens"),
    )


# ---------------------------------------------------------------------------
# Pairwise system win-rate matrix over three rankers.
# ---------------------------------------------------------------------------

_WRM_K = 3
_WRM_SYSTEMS = ("by_price", "by_discounted", "by_quantity")


@register(
    "eval_win_rate_matrix",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END AS rel,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber) AS r0,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_extendedprice * (1 - l_discount) DESC,
                        l_linenumber) AS r1,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_quantity * l_extendedprice DESC,
                        l_linenumber) AS r2
      FROM lineitem
    ),
    per_q AS (
      SELECT l_orderkey,
        max(CASE WHEN r0 <= {_WRM_K} AND rel = 1 THEN 1 ELSE 0 END) AS h0,
        max(CASE WHEN r1 <= {_WRM_K} AND rel = 1 THEN 1 ELSE 0 END) AS h1,
        max(CASE WHEN r2 <= {_WRM_K} AND rel = 1 THEN 1 ELSE 0 END) AS h2
      FROM ranked GROUP BY l_orderkey
    ),
    pairs(ia, ib) AS (VALUES (0,1), (0,2), (1,0), (1,2), (2,0), (2,1)),
    cells AS (
      SELECT ia, ib,
        CAST(sum(CASE WHEN [h0, h1, h2][CAST(ia AS INT) + 1] = 1
                       AND [h0, h1, h2][CAST(ib AS INT) + 1] = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS wins,
        CAST(sum(CASE WHEN [h0, h1, h2][CAST(ia AS INT) + 1] = 0
                       AND [h0, h1, h2][CAST(ib AS INT) + 1] = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS losses,
        CAST(sum(CASE WHEN [h0, h1, h2][CAST(ia AS INT) + 1]
                        = [h0, h1, h2][CAST(ib AS INT) + 1]
                      THEN 1 ELSE 0 END) AS BIGINT) AS ties
      FROM per_q, pairs
      GROUP BY ia, ib
    )
    SELECT ['by_price','by_discounted','by_quantity'][CAST(ia AS INT) + 1]
             AS system_a,
           ['by_price','by_discounted','by_quantity'][CAST(ib AS INT) + 1]
             AS system_b,
           wins, losses, ties,
           CASE WHEN wins + losses > 0
                THEN CAST(wins AS DOUBLE) / (wins + losses) END
             AS win_rate
    FROM cells
    """,
)
def eval_win_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise league table over three rankers (success = a
    relevant item in the top {_WRM_K}): for each ordered pair, wins /
    losses / ties over the shared query set and the win rate among
    decided queries (a single exact-integer division; NULL when no
    query decides the pair). Extends eval_mcnemar_paired's single
    comparison to the matrix an eval pipeline actually publishes.

    Scale shape: all three rankings share ONE (l_orderkey) exchange
    (three windows over the same partitioning), one per-query pivot
    agg, then the 3x3 matrix is literal-grid arithmetic on the tiny
    per-query hit table — comparing k systems over a billion queries
    is one pass plus k^2 bounded aggregates."""
    # r15 optimization (guide §2.4 remove shuffles / §4.1 built-ins):
    # the former plan ran THREE full row_number window sorts over one
    # l_orderkey exchange, then re-shuffled a 6x crossJoin fan-out into
    # a second aggregate. Orders are tiny groups (<= 7 lineitems), so
    # the per-query hit flags are computed ROW-LOCALLY instead: one
    # collect_list aggregate per order, array_sort with the SAME
    # (key DESC, l_linenumber ASC) comparator per ranker, top-K prefix
    # scan. row_number <= K over a deterministic total order selects
    # exactly the first K array elements, so the hit flags are
    # bit-identical (integer flags; oracle-verified). The 6-cell matrix
    # collapses to ONE single-pass aggregate (18 integer sums) exploded
    # from a literal grid — no fan-out exchange.
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") >= 45).cast("int").alias("rel"),
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    )
    keys = [
        lambda x: x["l_extendedprice"],
        lambda x: x["l_extendedprice"] * (1 - x["l_discount"]),
        lambda x: x["l_quantity"] * x["l_extendedprice"],
    ]

    def cmp(keyf):
        def c(left, right):
            kl, kr = keyf(left), keyf(right)
            return (
                F.when(kl > kr, F.lit(-1))
                .when(kl < kr, F.lit(1))
                .when(
                    left["l_linenumber"] < right["l_linenumber"], F.lit(-1)
                )
                # final equality branch: equal key AND equal linenumber
                # compare as 0 so the comparator is a valid total order
                # (TimSort may reject an ordering where a>b and b>a) —
                # unreachable today because l_linenumber is unique
                # within an order, but required by the contract.
                .when(
                    left["l_linenumber"] > right["l_linenumber"], F.lit(1)
                )
                .otherwise(F.lit(0))
            )

        return c

    grouped = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                "l_linenumber", "rel", "l_extendedprice", "l_discount",
                "l_quantity",
            )
        ).alias("xs")
    )
    per_q = grouped.select(
        *[
            F.exists(
                F.slice(F.array_sort("xs", cmp(keys[i])), 1, _WRM_K),
                lambda x: x["rel"] == 1,
            )
            .cast("int")
            .alias(f"h{i}")
            for i in range(3)
        ]
    )
    pair_ids = [(a, b) for a in range(3) for b in range(3) if a != b]
    aggs = []
    for a, b in pair_ids:
        ha, hb = F.col(f"h{a}"), F.col(f"h{b}")
        aggs.extend(
            [
                F.sum(((ha == 1) & (hb == 0)).cast("int"))
                .cast("long").alias(f"w_{a}_{b}"),
                F.sum(((ha == 0) & (hb == 1)).cast("int"))
                .cast("long").alias(f"l_{a}_{b}"),
                F.sum((ha == hb).cast("int"))
                .cast("long").alias(f"t_{a}_{b}"),
            ]
        )
    one = per_q.agg(*aggs)
    cells = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(_WRM_SYSTEMS[a]).alias("system_a"),
                        F.lit(_WRM_SYSTEMS[b]).alias("system_b"),
                        F.col(f"w_{a}_{b}").alias("wins"),
                        F.col(f"l_{a}_{b}").alias("losses"),
                        F.col(f"t_{a}_{b}").alias("ties"),
                    )
                    for a, b in pair_ids
                ]
            )
        ).alias("cell")
    ).select("cell.*")
    decided = F.col("wins") + F.col("losses")
    return cells.select(
        "system_a",
        "system_b",
        "wins",
        "losses",
        "ties",
        F.when(
            decided > 0, F.col("wins").cast("double") / decided
        ).alias("win_rate"),
    )
