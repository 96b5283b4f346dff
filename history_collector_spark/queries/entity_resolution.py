"""Entity resolution (record linkage) over the customer table.

The classic data-integration workload: noisy duplicate records of the
same real-world entity must be found WITHOUT an all-pairs comparison —
blocking bounds the candidate set, a cheap exact similarity scores the
survivors, and the audit measures precision/recall against planted
ground truth (Fellegi-Sunter / Christen's canonical pipeline shape).

Ground truth is INJECTED deterministically so both engines can
recompute it closed-form: every 5th customer gains a duplicate record
(key + 1e9) whose name has ONE character deleted at an md5-derived
digit position; nation, balance and segment are inherited, so the
duplicate always lands in its original's block and carries edit
distance exactly 1. False-positive pressure is real, not synthetic:
TPC-H's formulaic names ("Customer#%09d") put genuinely distinct
customers within edit distance 2 of each other whenever their key
digits nearly agree, so precision < 1 emerges from the data.

Scale shape: blocking key = (c_nationkey, floor(c_acctbal)) — a FIXED
~275k-key space, so the equi-self-join shuffles on the block key and
block populations grow slowly with the corpus (sub-linear pair
growth; second-decade probe recorded in .scale_probe); no all-pairs
shape anywhere. Scoring is the JVM codegen
levenshtein both engines ship. The audit aggregates to one row per
market segment; precision/recall/F1 are single divisions of exact
integers — IEEE-identical cross-engine.

Reference parity note: extension tier (the reference has no fuzzy
matching); the dedup ladder analogue for STRUCTURED records rather
than documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

_ER_OFFSET = 1_000_000_000  # duplicate-record key offset
_ER_EVERY = 5               # every 5th customer gets a duplicate
_ER_MAX_DIST = 2            # match rule: same block, levenshtein <= 2

# name = 'Customer#%09d' (18 chars); delete one of the 9 digit
# positions (10..18), picked by the md5 idiom both engines share
_ER_POS_SQL = """(10 + CAST(concat('0x',
    substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 9)"""


def _er_records_sql() -> str:
    return f"""
    recs AS (
      SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
             CAST(floor(c_acctbal) AS BIGINT) AS bal, c_mktsegment AS seg
      FROM customer
      UNION ALL
      SELECT c_custkey + {_ER_OFFSET},
             concat(substr(c_name, 1, CAST({_ER_POS_SQL} AS INT) - 1),
                    substr(c_name, CAST({_ER_POS_SQL} AS INT) + 1, 100)),
             c_nationkey, CAST(floor(c_acctbal) AS BIGINT), c_mktsegment
      FROM customer WHERE c_custkey % {_ER_EVERY} = 0
    )
    """


@register(
    "er_blocked_match_audit",
    oracle=f"""
    WITH {_er_records_sql()},
    pairs AS (
      SELECT a.seg, a.k AS lo, b.k AS hi,
             CASE WHEN levenshtein(a.nm, b.nm) <= {_ER_MAX_DIST}
                  THEN 1 ELSE 0 END AS matched
      FROM recs a JOIN recs b
        ON a.nat = b.nat AND a.bal = b.bal AND a.k < b.k
    ),
    agg AS (
      SELECT seg,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(matched) AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN matched = 1
                           AND hi - lo = {_ER_OFFSET}
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM pairs GROUP BY seg
    ),
    truth AS (
      SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_true
      FROM customer WHERE c_custkey % {_ER_EVERY} = 0
      GROUP BY c_mktsegment
    )
    SELECT t.seg, coalesce(a.n_candidates, 0) AS n_candidates,
           coalesce(a.n_matched, 0) AS n_matched,
           coalesce(a.tp, 0) AS tp, t.n_true,
           CAST(coalesce(a.tp, 0) AS DOUBLE)
             / greatest(coalesce(a.n_matched, 0), 1) AS precision_,
           CAST(coalesce(a.tp, 0) AS DOUBLE) / t.n_true AS recall_
    FROM truth t LEFT JOIN agg a ON t.seg = a.seg
    """,
)
def er_blocked_match_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity-resolution audit: planted-duplicate recovery per
    market segment. See the module docstring for the pipeline shape;
    every count is exact and the two ratios are single int/int
    divisions."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    pos = (
        F.lit(10)
        + F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 9
    ).cast("int")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nat"),
        F.floor("c_acctbal").cast("long").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    dups = (
        cust.filter(F.col("c_custkey") % _ER_EVERY == 0)
        .withColumn("pp", pos)
        .select(
            (F.col("c_custkey") + _ER_OFFSET).alias("k"),
            F.expr(
                "concat(substring(c_name, 1, pp - 1),"
                " substring(c_name, pp + 1, 100))"
            ).alias("nm"),
            F.col("c_nationkey").alias("nat"),
            F.floor("c_acctbal").cast("long").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    recs = base.unionByName(dups)
    a = recs.alias("a")
    b = recs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.nat") == F.col("b.nat"))
        & (F.col("a.bal") == F.col("b.bal"))
        & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.col("a.seg").alias("seg"),
        F.col("a.k").alias("lo"),
        F.col("b.k").alias("hi"),
        F.when(
            F.levenshtein(F.col("a.nm"), F.col("b.nm")) <= _ER_MAX_DIST, 1
        ).otherwise(0).alias("matched"),
    )
    agg = pairs.groupBy("seg").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.sum("matched").cast("long").alias("n_matched"),
        F.sum(
            F.when(
                (F.col("matched") == 1)
                & (F.col("hi") - F.col("lo") == _ER_OFFSET),
                1,
            ).otherwise(0)
        ).cast("long").alias("tp"),
    )
    truth = (
        cust.filter(F.col("c_custkey") % _ER_EVERY == 0)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").cast("long").alias("n_true"))
    )
    return (
        truth.join(agg, "seg", "left")
        .select(
            "seg",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            "n_true",
            (
                F.coalesce("tp", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_matched", F.lit(0)), F.lit(1))
            ).alias("precision_"),
            (F.coalesce("tp", F.lit(0)).cast("double") / F.col("n_true"))
            .alias("recall_"),
        )
    )


@register(
    "er_entity_cluster_census",
    oracle=f"""
    WITH RECURSIVE {_er_records_sql()},
    edges AS (
      SELECT a.k AS lo, b.k AS hi
      FROM recs a JOIN recs b
        ON a.nat = b.nat AND a.bal = b.bal AND a.k < b.k
      WHERE levenshtein(a.nm, b.nm) <= {_ER_MAX_DIST}
    ),
    -- every record starts as its own entity; matched pairs merge to
    -- the MINIMUM key reachable in <= 8 pointer-jumping rounds (the
    -- graph's components here are tiny chains, diameter << 8)
    it AS (
      SELECT k, k AS root, 0 AS r FROM recs
      UNION ALL
      SELECT i.k,
             least(i.root,
                   coalesce((SELECT min(least(e.lo, e.hi))
                             FROM edges e
                             WHERE e.lo = i.root OR e.hi = i.root),
                            i.root)) AS root,
             r + 1
      FROM it i WHERE r < 8
    ),
    final AS (
      SELECT k, min(root) AS root FROM it GROUP BY k
    ),
    sizes AS (
      SELECT root, CAST(count(*) AS BIGINT) AS sz FROM final GROUP BY root
    )
    SELECT CAST(sz AS INT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY sz
    """,
)
def er_entity_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-cluster size census: connected components over the
    match edges (min-key label propagation, 8 fixed rounds — component
    diameters here are tiny chains through shared blocks), then a
    histogram of cluster sizes. The singleton count is the unmatched
    population; size-2 clusters are the planted duplicates plus
    look-alike pairs; >2 means look-alike CHAINS merged entities — the
    over-merge signal an ER deployment alarms on.

    Scale shape: the edge set comes from the same bounded blocked
    join as the audit; label propagation is 8 rounds of edge joins on
    keys (each round a bounded-key shuffle), the pointer-jumping
    pattern already proven in graph_wcc_pointer_jumping."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    pos = (
        F.lit(10)
        + F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 9
    ).cast("int")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nat"),
        F.floor("c_acctbal").cast("long").alias("bal"),
    )
    dups = (
        cust.filter(F.col("c_custkey") % _ER_EVERY == 0)
        .withColumn("pp", pos)
        .select(
            (F.col("c_custkey") + _ER_OFFSET).alias("k"),
            F.expr(
                "concat(substring(c_name, 1, pp - 1),"
                " substring(c_name, pp + 1, 100))"
            ).alias("nm"),
            F.col("c_nationkey").alias("nat"),
            F.floor("c_acctbal").cast("long").alias("bal"),
        )
    )
    recs = base.unionByName(dups)
    a = recs.alias("a")
    b = recs.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.nat") == F.col("b.nat"))
            & (F.col("a.bal") == F.col("b.bal"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .filter(
            F.levenshtein(F.col("a.nm"), F.col("b.nm")) <= _ER_MAX_DIST
        )
        .select(F.col("a.k").alias("lo"), F.col("b.k").alias("hi"))
        .transform(pin_local)
    )
    # undirected neighbor map: for each node, the min neighbor key
    nbr_min = (
        edges.select(F.col("lo").alias("node"), F.col("hi").alias("other"))
        .unionByName(
            edges.select(
                F.col("hi").alias("node"), F.col("lo").alias("other")
            )
        )
        .groupBy("node")
        .agg(F.min("other").alias("min_other"))
    )
    labels = recs.select("k", F.col("k").alias("root"))
    for _ in range(8):
        labels = (
            labels.join(
                nbr_min, labels["root"] == nbr_min["node"], "left"
            )
            .select(
                "k",
                F.least(
                    F.col("root"),
                    F.coalesce(F.col("min_other"), F.col("root")),
                ).alias("root"),
            )
        )
    sizes = labels.groupBy("root").agg(F.count("*").alias("sz"))
    out = (
        sizes.groupBy(F.col("sz").cast("int").alias("cluster_size"))
        .agg(F.count("*").cast("long").alias("n_clusters"))
    )
    return out
