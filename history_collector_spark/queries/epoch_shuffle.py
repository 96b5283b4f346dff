"""Deterministic stateless epoch shuffling via a Feistel permutation —
how a 100 TB training run orders its data WITHOUT ever sorting by
rand() or materializing a permutation table.

The problem: every epoch must visit every example exactly once in a
different pseudorandom order, resumable from any step, identical
across reruns. A sort-by-random is a full shuffle of the corpus per
epoch (and not resumable without persisting it); a permutation table
is a second copy of the keyspace. A keyed Feistel network gives a
BIJECTION on [0, 2^32) computed row-locally in O(1): position =
feistel(epoch_key, id). Reading order = (position % n_shards,
position // n_shards) — a pure function of (epoch, id), so any worker
can compute its slice with zero coordination, zero exchange, zero
state. Injectivity on the actual id set is inherited from bijectivity
on the domain.

Everything below is exact 64-bit integer arithmetic expressible in
both engines (multiplies bounded by 2^16 * 2^32 < 2^53 before the
mod), so the oracle is bit-for-bit — and the tests additionally prove
the permutation laws (bijectivity, epoch-key sensitivity) rather than
trusting the construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_HALF_BITS = 16
_MASK = (1 << _HALF_BITS) - 1  # 0xFFFF
_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
_N_SHARDS = 8
_EPOCH_KEYS = (0x9E37, 0x79B9)  # two epochs, distinct round keys


def _feistel_sql(col: str, key: int) -> str:
    """DuckDB expression: 4-round Feistel on a bigint in [0, 2^32)."""
    expr_l, expr_r = f"({col} // 65536) % 65536", f"{col} % 65536"
    for rnd in range(4):
        f = (
            f"(({expr_r} * {_MULT} + {key + rnd * 1013904223})"
            f" // 2048) % 65536"
        )
        expr_l, expr_r = expr_r, f"xor({expr_l}, {f})"
    return f"({expr_l} * 65536 + {expr_r})"


def feistel_position(doc_id, key: int):
    """Spark twin of _feistel_sql: same rounds, same constants."""
    left = (doc_id / 65536).cast("long") % 65536
    right = doc_id % 65536
    for rnd in range(4):
        f = (
            (right * _MULT + F.lit(key + rnd * 1013904223)) / 2048
        ).cast("long") % 65536
        left, right = right, left.bitwiseXOR(f.cast("long"))
    return left * 65536 + right


@register(
    "curation_epoch_shuffle",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, e.epoch,
             CASE WHEN e.epoch = 0
                  THEN {_feistel_sql('doc_id', _EPOCH_KEYS[0])}
                  ELSE {_feistel_sql('doc_id', _EPOCH_KEYS[1])} END AS p
      FROM documents, (SELECT unnest([0, 1]) AS epoch) e
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(p % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(p // {_N_SHARDS}) AS BIGINT) AS min_slot,
           CAST(max(p // {_N_SHARDS}) AS BIGINT) AS max_slot,
           CAST(sum(doc_id * (1 + (p // {_N_SHARDS}) % 97)) AS BIGINT)
             AS order_checksum
    FROM pos GROUP BY epoch, p % {_N_SHARDS}
    """,
)
def curation_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two epochs of stateless Feistel shuffling over the corpus: each
    doc's (shard, slot) is a pure row-local function of (epoch_key,
    doc_id) — 4 Feistel rounds of exact bigint arithmetic fused into
    the scan, zero exchange before the per-(epoch, shard) report
    aggregate. The order_checksum (id weighted by slot-derived
    coefficient) differs between epochs exactly when the orders
    differ, while n_docs per epoch proves no row is lost or doubled —
    together with the bijectivity unit proof, the shuffle contract.

    At 100 TB this replaces a per-epoch full-corpus sort-by-rand
    (the single most expensive shuffle a training pipeline runs) with
    free per-row arithmetic any worker can evaluate independently."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    per_epoch = []
    for epoch, key in enumerate(_EPOCH_KEYS):
        p = feistel_position(F.col("doc_id"), key)
        per_epoch.append(
            docs.select(
                F.lit(epoch).alias("epoch"),
                F.col("doc_id"),
                p.alias("p"),
            )
        )
    pos = per_epoch[0].unionByName(per_epoch[1])
    slot = (F.col("p") / _N_SHARDS).cast("long")
    return pos.groupBy(
        "epoch", (F.col("p") % _N_SHARDS).alias("shard")
    ).agg(
        F.count("*").alias("n_docs"),
        F.min(slot).alias("min_slot"),
        F.max(slot).alias("max_slot"),
        F.sum(F.col("doc_id") * (1 + slot % 97)).alias("order_checksum"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired-system test: the significance screen for "is
# retriever B actually better than retriever A" over the SAME query
# set — the decision every eval pipeline makes before promoting a
# model. The statistic (b - c)^2 / (b + c) uses only the DISCORDANT
# pairs; computing it needs one pass and two integers, which is why it
# is THE cheap paired test at corpus scale.
# ---------------------------------------------------------------------------

_MCN_K = 3


@register(
    "eval_mcnemar_paired",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END AS rel,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC,
                                         l_linenumber) AS ra,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice * (1 - l_discount)
                                           DESC,
                                         l_linenumber) AS rb
      FROM lineitem
    ),
    per_q AS (
      SELECT l_orderkey,
             max(CASE WHEN ra <= {_MCN_K} AND rel = 1
                      THEN 1 ELSE 0 END) AS hit_a,
             max(CASE WHEN rb <= {_MCN_K} AND rel = 1
                      THEN 1 ELSE 0 END) AS hit_b
      FROM ranked GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
      CAST(sum(CASE WHEN hit_a = 1 AND hit_b = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS both_hit,
      CAST(sum(CASE WHEN hit_a = 1 AND hit_b = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS only_a,
      CAST(sum(CASE WHEN hit_a = 0 AND hit_b = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS only_b,
      CAST(sum(CASE WHEN hit_a = 0 AND hit_b = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS neither,
      CASE WHEN sum(CASE WHEN hit_a != hit_b THEN 1 ELSE 0 END) > 0
        THEN CAST(
          (sum(CASE WHEN hit_a = 1 AND hit_b = 0 THEN 1 ELSE 0 END)
           - sum(CASE WHEN hit_a = 0 AND hit_b = 1 THEN 1 ELSE 0 END))
          * (sum(CASE WHEN hit_a = 1 AND hit_b = 0 THEN 1 ELSE 0 END)
             - sum(CASE WHEN hit_a = 0 AND hit_b = 1 THEN 1 ELSE 0 END))
          AS DOUBLE)
          / sum(CASE WHEN hit_a != hit_b THEN 1 ELSE 0 END)
        ELSE 0.0 END AS mcnemar_chi2
    FROM per_q
    """,
)
def eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System A ranks by price, system B by discounted price; success
    per query = a relevant item in the top 3. McNemar's chi-square
    (b-c)^2/(b+c) over the discordant counts is a single division of
    exact integers — bit-stable — and the full 2x2 concordance table
    ships with it so the caller can see WHERE the statistic comes
    from.

    Scale shape: both rankings share ONE (l_orderkey) exchange (two
    windows over the same partitioning), one per-query agg, one scalar
    fold. Comparing two systems over a billion queries costs one pass
    and returns six numbers."""
    # r15 optimization (guide §2.4 remove shuffles / §4.1 built-ins):
    # the former plan ran TWO full row_number window sorts over the
    # l_orderkey exchange plus a second hash aggregate. Orders are tiny
    # groups (<= 7 lineitems), so the hit flags are computed
    # ROW-LOCALLY: one collect_list aggregate per order, array_sort
    # with the SAME (key DESC, l_linenumber ASC) comparator per
    # ranker, top-K prefix scan — row_number <= K over a deterministic
    # total order selects exactly the first K sorted elements, so the
    # integer hit flags are bit-identical (oracle-verified).
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") >= 45).cast("int").alias("rel"),
        "l_extendedprice",
        "l_discount",
    )
    keys = [
        lambda x: x["l_extendedprice"],
        lambda x: x["l_extendedprice"] * (1 - x["l_discount"]),
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
            F.struct("l_linenumber", "rel", "l_extendedprice", "l_discount")
        ).alias("xs")
    )
    hits = [
        F.exists(
            F.slice(F.array_sort("xs", cmp(keys[i])), 1, _MCN_K),
            lambda x: x["rel"] == 1,
        ).cast("int")
        for i in range(2)
    ]
    per_q = grouped.select(
        hits[0].alias("hit_a"), hits[1].alias("hit_b")
    )
    a1, b1 = F.col("hit_a") == 1, F.col("hit_b") == 1
    only_a = F.sum((a1 & ~b1).cast("int")).cast("long")
    only_b = F.sum((~a1 & b1).cast("int")).cast("long")
    disc = F.sum((F.col("hit_a") != F.col("hit_b")).cast("int"))
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.sum((a1 & b1).cast("int")).cast("long").alias("both_hit"),
        only_a.alias("only_a"),
        only_b.alias("only_b"),
        F.sum((~a1 & ~b1).cast("int")).cast("long").alias("neither"),
        F.when(
            disc > 0,
            ((only_a - only_b) * (only_a - only_b)).cast("double")
            / disc,
        ).otherwise(F.lit(0.0)).alias("mcnemar_chi2"),
    )
