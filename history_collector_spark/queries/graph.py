"""Graph scoring over the near-dup evidence graph — fixed-iteration
PageRank on the verified MinHash-LSH duplicate pairs.

Where connected components (clusters.py) answers "which docs form one
near-dup group", PageRank answers "which doc is the HUB of the sharing
structure" — the doc most embedded in duplicate relationships, which a
curation pass down-weights as probable boilerplate origin. Iterations
are FIXED (3) with damping 0.85, so the computation is deterministic
and the DuckDB oracle expresses it as three unrolled aggregate CTEs —
no recursion, no convergence test to disagree on.

Scale shape: the rank vector and degree table are (node, value) pairs
— bytes per node; each iteration is one join of edges to ranks on the
contribution source (high-cardinality doc_id key) plus one
map-side-combined sum by destination. Per round: one shuffle, data
volume = edge count, never node-squared. The loop body matches
clusters.py's discipline — `localCheckpoint` truncates the growing
lineage each round; the edge frame is persisted once and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.scope import scoped_shuffle_partitions
from history_collector_spark.queries.clusters import (
    _DUP_THRESHOLD,
    _ITER_PARTITIONS,
    _dup_pairs,
)
from history_collector_spark.queries.dedup import _BUCKETS_SQL
from history_collector_spark.registry import register

_DAMPING = 0.85
_N_ITER = 3

_EDGES_SQL = f"""
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    shl AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks
    ),
    dup AS (
      SELECT doc_a, doc_b FROM cand
      JOIN shl x ON cand.doc_a = x.doc_id
      JOIN shl y ON cand.doc_b = y.doc_id
      WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              / len(list_distinct(list_concat(x.s, y.s))) >= {_DUP_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION ALL SELECT doc_b, doc_a FROM dup
    ),
    deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
    n AS (SELECT count(*) AS n_nodes FROM deg)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT d.u AS node,
             (1.0 - {_DAMPING}) / n.n_nodes
             + {_DAMPING} * coalesce(sum_in.contrib, 0.0) AS r
      FROM deg d CROSS JOIN n
      LEFT JOIN (
        SELECT e.v AS node, sum(p.r / pd.deg) AS contrib
        FROM edges e
        JOIN {prev} p ON e.u = p.node
        JOIN deg pd ON e.u = pd.u
        GROUP BY e.v
      ) sum_in ON d.u = sum_in.node
    )
    """


_PR_CHAIN = ",".join(
    _pr_iter_sql(f"pr{i}", f"pr{i + 1}") for i in range(_N_ITER)
)


@register(
    "graph_pagerank_dups",
    oracle=f"""
    WITH {_BUCKETS_SQL},
    {_EDGES_SQL},
    pr0 AS (
      SELECT d.u AS node, 1.0 / n.n_nodes AS r FROM deg d CROSS JOIN n
    ),
    {_PR_CHAIN}
    SELECT p.node AS doc_id, p.r AS rank, CAST(d.deg AS BIGINT) AS degree
    FROM pr{_N_ITER} p JOIN deg d ON p.node = d.u
    """,
)
def graph_pagerank_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    dup = _dup_pairs(spark, sf_dir)
    edges = dup.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
                F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # the iteration runs over the DUP SUBGRAPH (edge/node frames that
    # scale with duplication, not corpus size) — size its shuffles and
    # checkpoints to that, not to the session's corpus-wide default
    with scoped_shuffle_partitions(spark, _ITER_PARTITIONS):
        edges = edges.repartition(_ITER_PARTITIONS, "u").persist()
        edges.count()

        deg = edges.groupBy("u").agg(F.count("*").alias("deg")).persist()
        n_nodes = deg.count()  # bounded driver scalar: node count only

        # r15: the rank frame CARRIES deg through the loop, removing
        # one deg-join per iteration and the final deg-join (4 joins
        # total at _N_ITER=3). The contribution addends are the same
        # r_u/deg_u multiset per destination, so the float sums are
        # unchanged.
        #
        # r15 optimization round (guide §1.2 driver-side job count):
        # each rank frame is consumed exactly ONCE by the next
        # iteration, so the per-iteration eager localCheckpoint bought
        # no recompute protection — it only paid 3 extra
        # materialization jobs. At the FIXED _N_ITER=3 horizon the
        # iterations compose lazily into one 3-join plan executed by a
        # single job (edges/deg stay persisted, so each unrolled level
        # reads InMemoryTableScan); ONE final eager checkpoint
        # materializes the chain so edges/deg can be unpersisted before
        # returning. A convergence-driven loop (tens of iterations,
        # growing lineage) is where the per-iteration checkpoint
        # discipline belongs — clusters.py keeps it.
        ranks = deg.select(
            F.col("u").alias("node"),
            "deg",
            F.lit(1.0 / n_nodes).alias("r"),
        )
        for _ in range(_N_ITER):
            contrib = (
                edges.join(ranks, edges.u == ranks.node)
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum(F.col("r") / F.col("deg")).alias("contrib"))
            )
            ranks = (
                deg.select(F.col("u").alias("node"), "deg")
                .join(contrib, "node", "left")
                .select(
                    "node",
                    "deg",
                    (
                        F.lit((1.0 - _DAMPING) / n_nodes)
                        + F.lit(_DAMPING) * F.coalesce("contrib", F.lit(0.0))
                    ).alias("r"),
                )
            )
        ranks = ranks.localCheckpoint(eager=True)
        edges.unpersist()
        result = ranks.select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("rank"),
            F.col("deg").cast("long").alias("degree"),
        )
        deg.unpersist()
    return result


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_BUCKETS_SQL},
    {_EDGES_SQL},
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM dup e1
      JOIN dup e2 ON e1.doc_b = e2.doc_a
      JOIN dup e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    tnodes AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM tnodes GROUP BY doc_id
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle support in the near-dup graph — a clique-ness
    signal that separates "hub of a star" (PageRank-high, triangle-low:
    one template shared into many docs) from "member of a mutual clone
    group" (triangle-high: exact-duplicate cliques). Standard two-join
    enumeration over CANONICAL edges (doc_a < doc_b), so each triangle
    a<b<c is generated exactly once: wedges b-joined to edge starts,
    then closed against the edge set. Both joins key on high-cardinality
    doc ids of the dup SUBGRAPH (edge count scales with duplication
    mass, never corpus^2) and the shuffles are sized to it, same as the
    CC/PageRank loops. Reads the session-materialized pair table, so no
    LSH/verify recompute."""
    dup = _dup_pairs(spark, sf_dir)
    with scoped_shuffle_partitions(spark, _ITER_PARTITIONS):
        e = dup.select("doc_a", "doc_b").persist()
        e.count()
        wedges = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a"))
            .select(
                F.col("e1.doc_a").alias("a"),
                F.col("e1.doc_b").alias("b"),
                F.col("e2.doc_b").alias("c"),
            )
        )
        tri = wedges.join(
            e.alias("e3"),
            (F.col("a") == F.col("e3.doc_a"))
            & (F.col("c") == F.col("e3.doc_b")),
        ).select("a", "b", "c")
        result = (
            tri.select(
                F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                    "doc_id"
                )
            )
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_triangles"))
        )
        # materialize before unpersisting the edge frame it depends on
        result = result.localCheckpoint(eager=True)
        e.unpersist()
    return result


@register(
    "item_cooccurrence",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_users
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ), deg AS (
      SELECT event_type, count(*) AS n FROM ut GROUP BY 1
    )
    SELECT p.t1, p.t2, CAST(p.n_users AS BIGINT) AS n_users,
           p.n_users / sqrt((1.0 * a.n) * b.n) AS cosine
    FROM pairs p
    JOIN deg a ON p.t1 = a.event_type
    JOIN deg b ON p.t2 = b.event_type
    """,
)
def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the user->event_type graph: for each
    item pair, how many users touched both, normalized to cosine
    (co-count / sqrt(deg_a * deg_b)) — the classic item-item
    collaborative-filtering similarity. One (user, item) distinct
    shuffle, then each user's bounded item set expands to its pair
    combinations ROW-LOCALLY (collect_set + transform over index
    pairs, no self-join of the corpus-sized table), and the pair/degree
    aggregates are item^2- and item-bounded with map-side combine. At
    web scale the guard is the per-user fanout: a user with a huge
    item set explodes quadratically, so real deployments cap it —
    here the item vocabulary itself is the (tiny) bound."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    per_user = ut.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    idx = F.sequence(F.lit(1), F.size("items"))
    pair_structs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(F.col("items"), i + 1, F.size("items")),
                lambda y: F.struct(
                    F.element_at("items", i).alias("t1"), y.alias("t2")
                ),
            ),
        )
    )
    pairs = (
        per_user.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .agg(F.count("*").alias("n_users"))
    )
    deg = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = deg.select(F.col("event_type").alias("t1"), F.col("n").alias("na"))
    b = deg.select(F.col("event_type").alias("t2"), F.col("n").alias("nb"))
    cosine = F.col("n_users") / F.sqrt(
        (F.lit(1.0) * F.col("na")) * F.col("nb")
    )
    return (
        pairs.join(F.broadcast(a), "t1")
        .join(F.broadcast(b), "t2")
        .select("t1", "t2", "n_users", cosine.alias("cosine"))
    )


@register(
    "dedup_rates_by_source",
    oracle=f"""
    WITH {_BUCKETS_SQL},
    {_EDGES_SQL},
    ex AS (
      SELECT source, count(*) AS n_docs,
             count(DISTINCT sha256(text)) AS n_unique
      FROM documents GROUP BY 1
    ),
    dd AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM dup
        UNION ALL SELECT doc_b FROM dup
      )
    ),
    nr AS (
      SELECT d.source, count(*) AS n_near
      FROM documents d JOIN dd ON d.doc_id = dd.doc_id GROUP BY 1
    )
    SELECT ex.source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_unique AS BIGINT) AS n_unique_exact,
           1.0 - (1.0 * n_unique) / n_docs AS exact_dup_rate,
           CAST(coalesce(n_near, 0) AS BIGINT) AS n_near_dup_docs,
           (1.0 * coalesce(n_near, 0)) / n_docs AS near_dup_rate
    FROM ex LEFT JOIN nr ON ex.source = nr.source
    """,
)
def dedup_rates_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication scorecard: exact-dup rate (1 - distinct
    digests / docs) and near-dup incidence (share of docs appearing in
    the verified pair table) — the table a curation run reads to decide
    which crawls to down-weight. Exact side is one source-bounded
    aggregate over content digests (32-byte shuffle keys, the
    dedup_exact discipline); near side reuses the memoized pair table,
    collapses it to a distinct doc set (dup-subgraph-sized), and joins
    back to docs by id. Everything after the scans is bounded by
    sources or duplication mass."""
    docs = table(spark, sf_dir, "documents")
    ex = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.sha2("text", 256)).alias("n_unique_exact"),
    )
    dup = _dup_pairs(spark, sf_dir)
    dd = (
        dup.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    nr = (
        docs.select("doc_id", "source")
        .join(dd, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        ex.join(nr, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_unique_exact",
            (
                F.lit(1.0)
                - (F.lit(1.0) * F.col("n_unique_exact")) / F.col("n_docs")
            ).alias("exact_dup_rate"),
            F.coalesce("n_near", F.lit(0)).alias("n_near_dup_docs"),
            (
                (F.lit(1.0) * F.coalesce("n_near", F.lit(0)))
                / F.col("n_docs")
            ).alias("near_dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Pointer jumping (Wyllie): root + depth for every node of a forest in
# O(log depth) ROUNDS of self-joins — the distributed answer to
# ancestor chains that a per-row loop or a depth-long iteration can't
# deliver at scale. Forest: customer keys, parent(c) = c DIV 8, roots
# are keys < 100 (the contiguous 0..N-1 key space makes every parent a
# real node).
# ---------------------------------------------------------------------------

_HPJ_ROOT_BOUND = 100
_HPJ_FANOUT = 8


@register(
    "hierarchy_pointer_jumping",
    oracle=f"""
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS custkey, c_custkey AS cur, 0 AS depth
      FROM customer
      UNION ALL
      SELECT custkey, cur // {_HPJ_FANOUT}, depth + 1
      FROM walk WHERE cur >= {_HPJ_ROOT_BOUND}
    )
    SELECT custkey, CAST(cur AS BIGINT) AS root,
           CAST(depth AS BIGINT) AS depth
    FROM walk WHERE cur < {_HPJ_ROOT_BOUND}
    """,
)
def hierarchy_pointer_jumping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root and depth of every node in the synthetic customer forest
    via pointer jumping: each round replaces every node's ancestor
    pointer with its ancestor's ancestor (anc' = L[anc].anc, d' = d +
    L[anc].d), so covered distance DOUBLES per round and the whole
    forest resolves in ceil(log2(max_depth)) self-joins — Wyllie's
    list-ranking algorithm, the shape that makes billion-node ancestor
    chains tractable where per-depth iteration (O(depth) shuffles) or
    driver-side walking cannot be. Roots are fixpoints of the jump
    (L[root] = (root, 0)), so finished rows need no branch: jumping is
    idempotent on them.

    The round count is computed CLOSED-FORM from the max key (depth of
    the deepest chain under parent = key DIV {_HPJ_FANOUT}) — no
    convergence polling, no driver-side data. All-integer output —
    EXACT against the recursive-CTE oracle walking the same chains
    one step at a time.

    Scale shape: log2(depth) rounds x one co-partitioned self-join on
    the ancestor key each. At 100 TB-scale key spaces (2^40 nodes,
    depth ~13 at fanout 8) that is FOUR joins total.
    """
    cust = table(spark, sf_dir, "customer")
    max_key = cust.agg(F.max("c_custkey").alias("m")).collect()[0]["m"]
    depth, c = 0, int(max_key)
    while c >= _HPJ_ROOT_BOUND:
        c //= _HPJ_FANOUT
        depth += 1
    rounds = max(1, (max(depth, 1) - 1).bit_length())
    state = cust.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.col("c_custkey") < _HPJ_ROOT_BOUND, F.col("c_custkey")
        )
        .otherwise(F.expr(f"c_custkey DIV {_HPJ_FANOUT}"))
        .alias("anc"),
        F.when(F.col("c_custkey") < _HPJ_ROOT_BOUND, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
    )
    for _ in range(rounds):
        lookup = state.select(
            F.col("node").alias("lnode"),
            F.col("anc").alias("lanc"),
            F.col("d").alias("ld"),
        )
        state = (
            state.join(lookup, state["anc"] == lookup["lnode"])
            .select(
                "node",
                F.col("lanc").alias("anc"),
                (F.col("d") + F.col("ld")).alias("d"),
            )
        )
    return state.select(
        F.col("node").alias("custkey"),
        F.col("anc").alias("root"),
        F.col("d").alias("depth"),
    )
