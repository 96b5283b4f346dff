"""Plan-level invariants over EVERY registered query — the automated
version of the .explain() audit:

- no row-at-a-time Python UDFs (BatchEvalPython) anywhere: Python in
  the row path must go through Arrow (ArrowEvalPython / mapInPandas);
- no cartesian products: all-pairs shapes must be broadcast nested
  loop (bounded build side) or mapInPandas, never CartesianProduct;
- no unbounded single-partition exchange: a global window/sort over
  full-cardinality data serializes the whole input through one task.
  `Exchange SinglePartition` is allowed only when fed by a limit
  (TakeOrderedAndProject / CollectLimit), i.e. k rows.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()

ALL_NAMES = sorted(registry.QUERIES)


_PLAN_CACHE: dict = {}


def _qe(spark, name: str):
    if name not in _PLAN_CACHE:
        df = registry.QUERIES[name](spark, TEST_SF_DIR)
        qe = df._jdf.queryExecution()
        plan_obj = qe.executedPlan()
        _PLAN_CACHE[name] = (plan_obj.toString(), qe.optimizedPlan(),
                             plan_obj, df.schema)
    return _PLAN_CACHE[name]


def _plan(spark, name: str) -> str:
    return _qe(spark, name)[0]


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_row_at_a_time_python(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use Arrow "
        "(pandas_udf / mapInPandas) instead"
    )


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in plan — bound one side (broadcast) "
        "or bucket the candidates"
    )


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_unbounded_single_partition_exchange(spark, name):
    # plan strings print sinks first, so a SinglePartition exchange's
    # INPUT (upstream operators) appears on the lines after it
    lines = _plan(spark, name).splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        upstream = "\n".join(lines[i + 1:])
        assert (
            "TakeOrderedAndProject" in upstream
            or "Limit" in upstream
            # global agg: the exchange moves one partial row per input
            # partition, not the data
            or "partial_" in upstream
        ), (
            f"{name}: Exchange SinglePartition over unbounded input — "
            "a global window/sort of the full data; use orderBy+limit "
            "(TakeOrderedAndProject) or partition the window"
        )


@pytest.mark.parametrize("name", ALL_NAMES)
def test_output_schema_is_driver_sortable(spark, name):
    """The external driver canonicalizes every result with pandas
    sort_values over ALL columns before hashing; ArrayType / MapType /
    StructType cells arrive as Python lists/dicts and crash pandas
    factorize with `unhashable type` (the round-13 embedding_quantize
    driver-red). Scalar-only output columns, registry-wide — arrays
    belong INSIDE a query's plan, its OUTPUT must be digests, explodes,
    or summaries."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = _qe(spark, name)[3]
    complex_cols = [
        f.name for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would "
        "crash the driver canonicalizer — emit a digest "
        "(md5 of a canonical join), posexplode to rows, or scalar "
        "summaries instead"
    )


def test_partitioned_roundtrip_prunes_partitions(spark):
    """The lang='de' read over the partitioned sink must resolve at the
    DIRECTORY level (PartitionFilters on the scan), not as a post-scan
    data filter — at 100 TB this is the difference between listing one
    partition and scanning the corpus."""
    df = registry.QUERIES["sink_partitioned_roundtrip"](spark, TEST_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in scan:\n{plan}"
    assert "lang" in m.group(1) and "de" in m.group(1), (
        f"lang=de not pushed to partition pruning: {m.group(1)}"
    )
    # and the data filters must NOT re-check lang (nothing to scan)
    dm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if dm:
        assert "lang" not in dm.group(1)


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed fact-fact join: with broadcast disabled (at real
    scale neither fact side fits in memory), the sort-merge join AND
    the same-key aggregation above it must run directly on the bucket
    layout — zero Exchange operators; that's the point of paying the
    bucketed write. At tiny SF Catalyst is free to broadcast instead
    (and does), which is also correct — so the guard pins the
    at-scale plan explicitly."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry.QUERIES["bucketed_join_roundtrip"](spark, TEST_SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert plan.count("Bucketed: true") == 2, plan


def test_star_schema_joins_are_all_hash_no_shuffle_of_dims(spark):
    """Q5-shape: every join is a broadcast hash join (at sf0.001 even
    orders broadcasts — fine); the only allowed hashpartitioning
    exchange is the final small aggregation, never a join input, and
    the status filter reaches the orders scan."""
    df = registry.QUERIES["star_schema_revenue"](spark, TEST_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") == 1, plan
    assert "EqualTo(o_orderstatus,F)" in plan, "status filter not pushed"


def test_projection_prunes_scan_columns(spark):
    """Column pruning must reach the parquet scan: a projection query
    reads ONLY the columns it outputs or filters on — a scan that
    drags the whole schema pays full I/O at 100 TB for nothing. The
    FileScan operator prints its pruned column list in brackets."""
    import re as _re

    cases = {
        # query -> columns that must NOT be read by any scan
        "payments_projection": ("o_orderpriority",),
        "count_filtered": ("o_orderdate", "o_totalprice"),
        "star_schema_revenue": ("l_quantity", "l_shipdate", "c_name"),
        "text_token_stats": ("source", "n_chars"),
    }
    for name, banned in cases.items():
        plan = _plan(spark, name)
        scans = _re.findall(r"FileScan \w+ \[([^\]]*)\]", plan)
        assert scans, f"{name}: no FileScan in plan"
        read = ",".join(scans)
        for col in banned:
            assert col not in read, (
                f"{name}: scan reads unused column {col!r}: {read}"
            )


def test_q6_predicates_reach_the_scan(spark):
    """forecast_revenue_change is scan-filter-aggregate: the discount
    band and quantity cap must appear in the scan's PushedFilters, and
    ReadSchema must prune to the four referenced columns (formatted
    explain — the plan toString truncates scan metadata)."""
    import re

    df = registry.QUERIES["forecast_revenue_change"](spark, TEST_SF_DIR)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs, plan
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }, cols


def test_q10_top20_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "returned_item_report")
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# Window-partition scale policy (round 8): a window's per-partition
# sort runs in ONE task, so every Window operator must fall into a
# bounded class or the query fails review here. Classes:
#
#   * HIGH-CARD partition key — per-entity partitions (user, doc,
#     query, ...) stay small as data grows;
#   * hash-expression partition (sha2/md5/xxhash64/...) — same;
#   * range-slice partition (__rr_pid from functions/ranking.py) — the
#     two-phase rank helper; each slice is one range split;
#   * offsets frame (ORDER BY __rr_pid) — the helper's per-slice totals
#     frame, task-count x group-count rows;
#   * BOUNDED_INPUT_WINDOWS — reviewed sites where the window input is
#     a bounded-cardinality aggregate or a top-k limit. The entry is a
#     justification string; entries marked "WGL:" additionally require
#     WindowGroupLimit in the physical plan (rank-filter pushdown, so
#     the per-partition sort sees only k rows per group per task).
#
# A new low-card / global window over unbounded input has no class and
# fails — the guard that makes the round-6 ntile shape un-reintroducible.
# ---------------------------------------------------------------------------

HIGH_CARD_WINDOW_KEYS = {
    "user_id", "query_id", "doc_id", "vec_id", "o_custkey", "qid",
    "event_id", "o_orderkey", "l_orderkey", "l_partkey", "l_suppkey",
    "cluster_id", "h", "gh", "shingle", "sig",
}

_HASHY = ("sha2(", "md5(", "xxhash64(", "hash(", "crc32(", "sha1(")

BOUNDED_INPUT_WINDOWS = {
    ("bpe_merge_step", ()): "pair-count aggregate, VOCAB_CAP-bounded",
    ("curation_filtered_retrieval", ()): "input is the top-20 limit",
    ("curation_quota_water_filling", ()): "per-source demand aggregate",
    ("curation_vocabulary", ()): "input is the top-50 limit",
    ("curation_weighted_sample", ()): "input is the top-K limit",
    ("retrieval_rrf_fusion", ()): "final rank over the top-10 limit",
    ("text_bm25_retrieval", ()): "input is the top-k limit",
    ("text_burrows_delta", ()): "word-frequency aggregate (vocab-bounded)",
    ("text_kneser_ney_bigrams", ()): "bigram-type aggregate (vocab^2)",
    ("text_rake_keywords", ()): "keyword-score aggregate (vocab-bounded)",
    ("text_zipf_fit", ()): "token-frequency aggregate (vocab-bounded)",
    ("tokenizer_vocab_coverage", ()): "term-frequency agg (vocab-bounded)",
    ("user_retention_kaplan_meier", ()): "distinct-duration aggregate",
    ("events_mann_whitney_u", ("pair",)):
        "rank window over the DISTINCT-QUANTIZED-VALUE aggregate — "
        "input is bounded by the 1e-6 metric grid (value-range x 1e6 "
        "cells), not by corpus size; the (pair, qv) groupBy collapses "
        "the scan map-side first",
    ("revenue_contribution", ()): "nation-level aggregate (~25 rows)",
    ("revenue_contribution", ("r_name",)): "nation-level aggregate",
    ("orders_pareto_frontier", ("priority",)):
        "distinct-price aggregate; grid-partition refinement documented "
        "in the query docstring for key spaces where that stays huge",
    ("cusum_changepoint", ("event_type",)): "hourly aggregate input",
    ("eval_auc_roc", ()):
        "distinct-integer-score aggregate (<=1300 rows) — the corpus "
        "collapses to per-score counts before the cumulative window",
    ("eval_average_precision", ()):
        "distinct-integer-score aggregate (<=1300 rows), same subtree "
        "as eval_auc_roc",
    ("eval_conformal_coverage", ()):
        "distinct-alpha calibration histogram (<=1301 rows)",
    ("eval_bootstrap_auc_ci", ("r",)):
        "50 bootstrap replicates over the bounded distinct-score "
        "aggregate (<=50x1300 rows)",
    ("streaming_topk_e2e", ("event_type",)):
        "per-key micro-batch count aggregate, key-space-bounded",
    ("curation_shard_assign", ("shard",)):
        "shard count is a sizing config; shards are file-sized at scale",
    ("curation_source_quota", ("source",)):
        "WGL: rank<=5 literal filter compiles to WindowGroupLimit "
        "(per-partition top-k before the shuffle)",
    ("curation_group_sample_bottomk", ("source",)):
        "WGL: rn <= k literal filter compiles to WindowGroupLimit — "
        "each task pre-keeps at most k rows per source",
    ("crawl_frontier_assign", ("host",)):
        "WGL: slot <= _HOST_BUDGET literal filter compiles to "
        "WindowGroupLimit — each task pre-keeps at most budget rows "
        "per host before the exchange, so a mega-host never sorts "
        "its full frontier",
    ("text_source_drift_kl", ("source",)):
        "per-(source, term) vocab-bounded aggregate",
    ("text_ngram_lm", ("w1", "w2")):
        "bigram-context groups over the n-gram TYPE aggregate",
    ("text_perplexity_lm", ("w1", "w2")):
        "bigram-context groups over the n-gram TYPE aggregate",
    ("curation_perplexity_buckets", ("w1", "w2")):
        "bigram-context groups over the n-gram TYPE aggregate "
        "(same LM subtree as text_perplexity_lm)",
}


def _strip_ids(s: str) -> str:
    import re as _re

    return _re.sub(r"#\d+L?", "", s)


def _window_specs(optimized_plan):
    """Yield (partition_keys, order_keys) for every Window node in the
    optimized logical plan (walked via py4j)."""

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.length()):
            yield from walk(ch.apply(i))

    for node in walk(optimized_plan):
        if node.getClass().getSimpleName() == "Window":
            ps, os_ = node.partitionSpec(), node.orderSpec()
            yield (
                tuple(_strip_ids(ps.apply(i).toString())
                      for i in range(ps.length())),
                tuple(_strip_ids(os_.apply(i).toString())
                      for i in range(os_.length())),
            )


def window_violations(name, specs, physical_plan) -> list:
    """Classify every window of a query; return unclassifiable ones."""
    bad = []
    for pk, ok in specs:
        if any(k == "__rr_pid" for k in pk):
            continue  # range-slice local rank (functions/ranking.py)
        if any(o.startswith("__rr_pid ") for o in ok):
            continue  # helper offsets frame: task-count x groups rows
        if any(k in HIGH_CARD_WINDOW_KEYS for k in pk):
            continue  # per-entity partitions stay small
        if pk and all(
            any(hf in k for hf in _HASHY)
            or (k.startswith("_w") and _is_hashy_alias(k, physical_plan))
            for k in pk
        ):
            continue  # hash-expression partition — high-card
        just = BOUNDED_INPUT_WINDOWS.get((name, pk))
        if just is not None:
            if just.startswith("WGL:") and "WindowGroupLimit" not in physical_plan:
                bad.append((pk, ok, "allowlisted as WindowGroupLimit "
                            "rank-pushdown, but physical plan has none"))
            continue
        bad.append((pk, ok, "unclassified window partition"))
    return bad


def _is_hashy_alias(key: str, physical_plan: str) -> bool:
    """Resolve a `_wN` projection alias: accept iff its defining
    expression in the plan is a hash function (high-cardinality).
    The definition prints as `<expr> AS _wN#id` inside a Project's
    comma-separated list — recover <expr> by scanning backwards to the
    nearest comma/bracket at paren depth 0."""
    marker = f" AS {key}#"
    pos = physical_plan.find(marker)
    while pos != -1:
        start = physical_plan.rfind("\n", 0, pos) + 1
        prefix = physical_plan[start:pos]
        depth = 0
        expr_start = 0
        for i in range(len(prefix) - 1, -1, -1):
            c = prefix[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    expr_start = i + 1
                    break
                depth -= 1
            elif c in ",[" and depth == 0:
                expr_start = i + 1
                break
        expr = prefix[expr_start:].strip()
        if any(expr.startswith(hf) for hf in _HASHY):
            return True
        pos = physical_plan.find(marker, pos + 1)
    return False


@pytest.mark.parametrize("name", ALL_NAMES)
def test_window_partitions_bounded(spark, name):
    physical, optimized = _qe(spark, name)[:2]
    bad = window_violations(name, list(_window_specs(optimized)), physical)
    assert not bad, (
        f"{name}: window(s) over potentially unbounded partitions — "
        f"{bad}; either partition by a high-cardinality key, use "
        "functions/ranking.py's two-phase range helpers, or add a "
        "reviewed BOUNDED_INPUT_WINDOWS entry with justification"
    )


def test_guard_catches_reintroduced_per_source_ntile(spark):
    """The round-6 killer shape, rebuilt deliberately: ntile over
    PARTITION BY source on raw documents must be flagged."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    df = docs.select("source", F.ntile(3).over(w).alias("phase"))
    qe = df._jdf.queryExecution()
    bad = window_violations(
        "deliberate_ntile", list(_window_specs(qe.optimizedPlan())),
        qe.executedPlan().toString(),
    )
    assert bad, "guard failed to flag a per-source ntile over raw docs"


def test_dpp_join_prunes_partitions(spark):
    """sink_dpp_join_prune must read the lang-partitioned fact through
    a DYNAMIC pruning subquery (the hot langs are only knowable at run
    time): the executed fact scan's PartitionFilters must carry a
    dynamicpruning expression — at scale that is the difference
    between listing the surviving partitions and scanning the sink."""
    df = registry.QUERIES["sink_dpp_join_prune"](spark, TEST_SF_DIR)
    df.collect()  # DPP prints in the EXECUTED plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


# ---------------------------------------------------------------------------
# Spill-safety guard (round-9, VERDICT item 8): the dedup_edit_distance
# postmortem generalized. Shipping a WIDE payload column (document
# text) through a shuffled join (SortMergeJoin / ShuffledHashJoin) is
# the spill-cliff class — at memory pressure the sorter spills the
# payload bytes, and the measured cost cliff was 478s -> 20s once the
# pair set was pre-gated on narrow columns. Any shuffled join whose
# either input carries a wide payload column must be allowlisted with
# a justification explaining why the input is bounded (the
# BOUNDED_INPUT_WINDOWS pattern).
# ---------------------------------------------------------------------------

WIDE_PAYLOAD_COLS = {"text"}

# (query name, join node class) -> why the wide-side input is bounded
WIDE_JOIN_ALLOWLIST: dict = {
    ("dedup_edit_distance", "SortMergeJoinExec"):
        "text fetch happens AFTER the narrow n_chars pre-gate and the "
        "work-budget refusal (EDIT_MAX_CELLS): the pair set riding the "
        "join is the length-gated LSH survivors, bounded by real "
        "duplication, never corpus-sized — measured 478s -> 20.2s at "
        "the sf1 probe once the pre-gate landed (SCALING.md)",
}

_SHUFFLE_JOIN_CLASSES = ("SortMergeJoinExec", "ShuffledHashJoinExec")


def _walk_physical(node):
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk_physical(ch.apply(i))
    # AQE wraps subtrees in query-stage/adaptive nodes whose children()
    # can be empty while the real plan hangs off innerChildren — the
    # string form still shows them, so also descend any plan exposed
    # via the adaptive executedPlan/initialPlan accessors.
    for acc in ("executedPlan", "initialPlan"):
        try:
            sub = getattr(node, acc)()
            yield from _walk_physical(sub)
        except Exception:
            pass


def wide_join_violations(plan_obj) -> list:
    """Shuffled-join nodes whose input carries a wide payload column."""
    bad = []
    for node in _walk_physical(plan_obj):
        cls = node.getClass().getSimpleName()
        if cls not in _SHUFFLE_JOIN_CLASSES:
            continue
        for side, child in (("left", node.left()), ("right", node.right())):
            out = child.output()
            wide = [
                out.apply(i).name()
                for i in range(out.length())
                if out.apply(i).name() in WIDE_PAYLOAD_COLS
            ]
            if wide:
                bad.append((cls, side, wide))
    return bad


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_wide_payload_through_shuffled_join(spark, name):
    plan_obj = _qe(spark, name)[2]
    bad = wide_join_violations(plan_obj)
    if bad and (name, bad[0][0]) in WIDE_JOIN_ALLOWLIST:
        return
    assert not bad, (
        f"{name}: wide payload column rides a shuffled join {bad} — "
        "pre-gate the pair set on narrow columns and fetch text "
        "after (dedup_edit_distance idiom), broadcast the text side, "
        "or add a WIDE_JOIN_ALLOWLIST entry with a boundedness "
        "justification"
    )


def test_guard_catches_text_through_smj(spark):
    """Deliberate reintroduction: a text-carrying self-join big enough
    that Catalyst picks a shuffled join must be flagged."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    a = docs.select("doc_id", "lang", "text").alias("a")
    b = docs.select(
        F.col("doc_id").alias("bid"), F.col("lang").alias("blang")
    ).alias("b")
    # disable broadcast so the join shuffles, as it would at scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = a.join(b, F.col("a.lang") == F.col("b.blang")).select(
            "doc_id", "bid", "text"
        )
        bad = wide_join_violations(df._jdf.queryExecution().executedPlan())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert bad, "guard failed to flag text riding a shuffled join"
