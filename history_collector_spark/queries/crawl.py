"""Crawl-coordination operators: registrable-domain (public-suffix)
extraction, robots.txt rule evaluation, and frontier politeness
scheduling — the three per-URL decisions a crawler makes before any
byte is fetched, and therefore the hottest row-grain code in a
web-corpus pipeline (they run on every DISCOVERED url, a superset of
every fetched page).

All three are pure Catalyst expression work (zero Python, asserted
UDF-free by the plan guards): at 100 TB the frontier table is
trillions of rows, so these must fuse into the scan. The only
exchanges are the final host/suffix-grain aggregates and the per-host
window for politeness sequencing.

Oracle discipline (same as queries/urls.py): inputs are GENERATED
deterministically from doc_id so DuckDB can state each expected
answer closed-form from the generator arithmetic — the oracle never
parses a host, matches a rule, or ranks a queue, so agreement proves
the Spark-side machinery inverts/implements the spec rather than
both engines sharing one formulation.

Reference anchor: the reference pipeline ingests a fixed archive
sequence (reference python/main.py:254-309) and never crawls; these
operators extend the engine to the crawl-acquisition tier the same
way the WARC/HTML modules extend its parse stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

# Mini public-suffix list (structure of the real PSL: plain TLDs,
# second-level country registries, and a private-domain entry that
# must win over its parent TLD by LONGEST match).
_PSL = (
    "com",
    "org",
    "net",
    "uk",
    "co.uk",
    "au",
    "com.au",
    "jp",
    "ac.jp",
    "io",
    "github.io",
)
_SUFFIX_CHOICES = ("com", "org", "co.uk", "com.au", "github.io", "ac.jp", "net")
_SUB_CHOICES = ("", "www.", "cdn.img.", "a.b.")


def synth_host(doc_id):
    """doc_id -> deterministic host with a known registrable domain."""
    sub_idx = doc_id % 4
    sub = (
        F.when(sub_idx == 1, "www.")
        .when(sub_idx == 2, "cdn.img.")
        .when(sub_idx == 3, "a.b.")
        .otherwise(F.lit(""))
    )
    name = F.concat(F.lit("site"), (doc_id % 23).cast("string"))
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _SUFFIX_CHOICES]),
        (doc_id % 7).cast("int") + 1,
    )
    return F.concat(sub, name, F.lit("."), suffix)


def registrable_domain(host):
    """Host column -> (public_suffix, pld) via longest-PSL-suffix match.

    Pure expressions: the PSL is a Catalyst literal array, candidate
    suffixes of 1..3 trailing labels are sliced row-locally, and the
    LONGEST listed candidate wins (that ordering is the whole PSL
    contract: 'github.io' beats 'io', 'co.uk' beats 'uk')."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    psl = F.array(*[F.lit(s) for s in _PSL])

    def cand(k: int):
        return F.array_join(
            F.slice(labels, n - k + 1, k), "."
        )

    suffix_len = (
        F.when((n > 3) & F.array_contains(psl, cand(3)), 3)
        .when((n > 2) & F.array_contains(psl, cand(2)), 2)
        .when((n > 1) & F.array_contains(psl, cand(1)), 1)
        .otherwise(0)
    )
    suffix = F.when(suffix_len > 0, F.array_join(
        F.slice(labels, n - suffix_len + 1, suffix_len), "."
    ))
    pld = F.when(suffix_len > 0, F.array_join(
        F.slice(labels, n - suffix_len, suffix_len + 1), "."
    ))
    return suffix, pld


@register(
    "corpus_pld_extract",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             ['com','org','co.uk','com.au','github.io','ac.jp','net']
               [CAST(doc_id % 7 AS INT) + 1] AS suffix,
             'site' || CAST(doc_id % 23 AS VARCHAR) AS name
      FROM documents
    )
    SELECT suffix AS public_suffix,
           CAST(count(*) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT name) AS BIGINT) AS n_plds,
           min(name || '.' || suffix) AS min_pld
    FROM g GROUP BY suffix
    """,
)
def corpus_pld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain extraction: the grouping key for every
    per-site crawl policy (politeness, quotas, dedup, spam scoring) is
    the PLD, not the hostname — 'www.x.co.uk', 'cdn.img.x.co.uk' and
    'a.b.x.co.uk' are one site, and 'x.github.io' is NOT part of a
    'github.io' site because the PSL marks it a private registry.

    The oracle states the expected PLD closed-form from the host
    GENERATOR's arithmetic (it never splits a hostname), so agreement
    proves the longest-suffix matcher inverts every shape the
    generator emits, including the multi-label and private-registry
    suffixes that break naive 'last two labels' heuristics.

    Scale shape: matching is row-local array slicing against a
    literal-array PSL inside whole-stage codegen (the real PSL is
    ~10k entries — still a broadcast-scale literal); the only exchange
    is the suffix-grain aggregate."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    hosts = docs.select(synth_host(F.col("doc_id")).alias("host"))
    suffix, pld = registrable_domain(F.col("host"))
    ext = hosts.select(
        suffix.alias("public_suffix"), pld.alias("pld")
    )
    return ext.groupBy("public_suffix").agg(
        F.count("*").alias("n_hosts"),
        F.countDistinct(
            F.substring_index("pld", ".", 1)
        ).alias("n_plds"),
        F.min("pld").alias("min_pld"),
    )


# ---------------------------------------------------------------------------
# robots.txt evaluation. Per-host rule sets are generated as a
# deterministic grid; URL paths are generated per doc; the evaluator
# implements the longest-match-wins / tie-goes-to-allow semantics of
# RFC 9309 sec. 2.2.2. The oracle derives each URL's fate closed-form
# from the generator arithmetic — it never matches a rule.
# ---------------------------------------------------------------------------

_N_ROBOT_HOSTS = 5


def _robot_rules(spark: SparkSession) -> DataFrame:
    """The per-host rule grid: host k disallows /private/ and
    /a/sec{k}/, but re-allows the longer /a/sec{k}/public/."""
    hosts = spark.range(_N_ROBOT_HOSTS).select(
        F.concat(F.lit("crawl"), F.col("id").cast("string")).alias("host"),
        F.col("id").alias("k"),
    )
    return hosts.select(
        "host",
        F.explode(
            F.array(
                F.struct(
                    F.lit("/private/").alias("prefix"),
                    F.lit(0).alias("allow"),
                ),
                F.struct(
                    F.concat(
                        F.lit("/a/sec"), F.col("k").cast("string"),
                        F.lit("/"),
                    ).alias("prefix"),
                    F.lit(0).alias("allow"),
                ),
                F.struct(
                    F.concat(
                        F.lit("/a/sec"), F.col("k").cast("string"),
                        F.lit("/public/"),
                    ).alias("prefix"),
                    F.lit(1).alias("allow"),
                ),
            )
        ).alias("r"),
    ).select("host", F.col("r.prefix").alias("prefix"),
             F.col("r.allow").alias("allow"))


@register(
    "corpus_robots_rules",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'crawl' || CAST(doc_id % 5 AS VARCHAR) AS host,
             doc_id % 4 AS shape,
             doc_id % 5 AS k,
             (doc_id // 4) % 4 AS sec
      FROM documents
    ),
    fates AS (
      -- closed-form from the generator: shape 2 hits /private/
      -- (blocked), shape 3 is /open/ (no rule: default allow), shapes
      -- 0/1 sit under /a/sec{sec}/... which only host k's rules cover
      -- when sec = k; shape 1's /public/ re-allow outranks the
      -- disallow by length.
      SELECT host,
        CASE WHEN shape = 2 THEN 'blocked'
             WHEN shape = 3 THEN 'default'
             WHEN sec != k THEN 'default'
             WHEN shape = 1 THEN 'allowed'
             ELSE 'blocked' END AS fate
      FROM u
    )
    SELECT host,
      CAST(count(*) AS BIGINT) AS n_urls,
      CAST(sum(CASE WHEN fate = 'blocked' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_blocked,
      CAST(sum(CASE WHEN fate = 'allowed' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_rule_allowed,
      CAST(sum(CASE WHEN fate = 'default' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_default_allowed
    FROM fates GROUP BY host
    """,
)
def corpus_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots evaluation: for each discovered URL, the most
    specific (longest-prefix) matching rule decides fetchability, a
    length tie goes to allow, and no match means allowed. The fixture
    exercises exactly the cases that break naive first-match
    evaluators: a longer allow nested under a shorter disallow, rules
    that exist on the wrong host, and unruled paths.

    The oracle computes each URL's fate closed-form from the path
    GENERATOR's arithmetic (shape/sec/k), never from the rules — so
    agreement proves the join + longest-match window implements the
    RFC semantics.

    Scale shape: rules-per-host is a small table (real robots files
    are KBs) — Catalyst broadcasts it under AQE; the candidate match
    filter is startswith on the broadcast side, the winner is one
    max_by struct per URL (no window needed), and the only exchange
    is the host-grain aggregate."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("crawl"), (d % 5).cast("string")).alias("host"),
        F.when(d % 4 == 2, F.lit("/private/doc"))
        .when(d % 4 == 3, F.lit("/open/doc"))
        .when(
            d % 4 == 1,
            F.concat(F.lit("/a/sec"), ((d / 4).cast("long") % 4)
                     .cast("string"), F.lit("/public/doc")),
        )
        .otherwise(
            F.concat(F.lit("/a/sec"), ((d / 4).cast("long") % 4)
                     .cast("string"), F.lit("/doc")),
        )
        .alias("path"),
    )
    rules = _robot_rules(spark)
    matched = (
        urls.join(rules, "host", "left")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("doc_id", "host")
        .agg(
            F.max_by(
                F.col("allow"),
                F.struct(F.length("prefix").alias("l"),
                         F.col("allow").alias("a")),
            ).alias("allow")
        )
    )
    fate = (
        urls.join(matched.select("doc_id", "allow"), "doc_id", "left")
        .select(
            "host",
            F.when(F.col("allow").isNull(), "default")
            .when(F.col("allow") == 1, "allowed")
            .otherwise(F.lit("blocked"))
            .alias("fate"),
        )
    )
    return fate.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum((F.col("fate") == "blocked").cast("long")).alias("n_blocked"),
        F.sum((F.col("fate") == "allowed").cast("long")).alias(
            "n_rule_allowed"
        ),
        F.sum((F.col("fate") == "default").cast("long")).alias(
            "n_default_allowed"
        ),
    )


# ---------------------------------------------------------------------------
# Frontier politeness scheduling: per-host fetch sequencing with
# host-specific crawl delays and a per-host budget cap — the step that
# turns a scored URL frontier into an executable fetch plan.
# ---------------------------------------------------------------------------

_HOST_BUDGET = 40


@register(
    "crawl_frontier_assign",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             'crawl' || CAST(doc_id % 17 AS VARCHAR) AS host,
             1 + (doc_id % 17) % 3 AS delay_s,
             CAST(doc_id % 89 AS BIGINT) AS priority
      FROM documents
    ),
    seq AS (
      SELECT host, delay_s, priority,
             row_number() OVER (PARTITION BY host
                                ORDER BY priority DESC, doc_id) AS slot
      FROM f
    )
    SELECT host,
      CAST(count(*) AS BIGINT) AS n_frontier,
      CAST(sum(CASE WHEN slot <= {_HOST_BUDGET} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_scheduled,
      CAST(max(CASE WHEN slot <= {_HOST_BUDGET}
                    THEN (slot - 1) * delay_s END) AS BIGINT)
        AS makespan_s,
      CAST(max(CASE WHEN slot = 1 THEN priority END) AS BIGINT)
        AS head_priority
    FROM seq GROUP BY host
    """,
)
def crawl_frontier_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling: within each host the frontier is ordered
    by (priority DESC, doc_id) — the deterministic tie-break matters,
    a frontier re-plan must be reproducible — fetch slot k starts at
    (k-1) * crawl_delay(host), and hosts are capped at a per-cycle
    budget so one mega-site cannot monopolize a fetch wave.

    Scale shape: totals (frontier size, head priority) are plain
    per-host aggregates; the slot sequence is computed ONLY for the
    scheduled subset via a rank filter that Catalyst compiles to
    WindowGroupLimit (plan-asserted) — each task pre-keeps at most
    budget rows per host BEFORE the window exchange and sort, so a
    mega-host costs O(budget) per task, never its full frontier;
    every output is exact integer arithmetic."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    f = docs.select(
        "doc_id",
        F.concat(F.lit("crawl"), (d % 17).cast("string")).alias("host"),
        (1 + (d % 17) % 3).alias("delay_s"),
        (d % 89).cast("long").alias("priority"),
    )
    totals = f.groupBy("host").agg(
        F.count("*").alias("n_frontier"),
        F.max("priority").alias("head_priority"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    kept = f.withColumn("slot", F.row_number().over(w)).filter(
        F.col("slot") <= _HOST_BUDGET
    )
    sched = kept.groupBy("host").agg(
        F.count("*").alias("n_scheduled"),
        F.max((F.col("slot") - 1) * F.col("delay_s")).alias("makespan_s"),
    )
    return totals.join(sched, "host").select(
        "host",
        "n_frontier",
        "n_scheduled",
        "makespan_s",
        "head_priority",
    )


# ---------------------------------------------------------------------------
# Sitemap ingestion: the URL-discovery feed a crawler reads right
# after robots.txt — urlset and sitemapindex documents through the
# from-scratch sitemaps.org XML parser (functions/sitemap_xml.py),
# with torn documents degrading to error rows.
# ---------------------------------------------------------------------------

_SITEMAP_ERR_MOD = 23


def _sitemap_batches(batches):
    import pandas as pd

    from history_collector_spark.functions.sitemap_xml import (
        SitemapParseError,
        parse_sitemap,
        render_sitemap,
    )

    for pdf in batches:
        rows = []
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            d = int(doc_id)
            xml = render_sitemap(d, source)
            if d % _SITEMAP_ERR_MOD == 0:
                xml = xml[:-11]  # tear off the closing root tag
            try:
                sm = parse_sitemap(xml)
                pris = [
                    u["priority_milli"]
                    for u in sm["urls"]
                    if u["priority_milli"] is not None
                ]
                lastmods = [
                    u["lastmod"] for u in sm["urls"] if u["lastmod"]
                ]
                rows.append(
                    (
                        source,
                        "ok",
                        sm["kind"],
                        len(sm["urls"]),
                        len(sm["children"]),
                        len(pris),
                        sum(pris),
                        max(lastmods) if lastmods else None,
                    )
                )
            except SitemapParseError:
                rows.append(
                    (source, "error", None, None, None, None, None, None)
                )
        yield pd.DataFrame(
            rows,
            columns=["source", "status", "kind", "n_urls", "n_children",
                     "n_with_priority", "sum_priority_milli",
                     "max_lastmod"],
        )


@register(
    "corpus_sitemap_ingest",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             doc_id % {_SITEMAP_ERR_MOD} = 0 AS err,
             doc_id % 5 = 0 AS is_index,
             3 + doc_id % 3 AS n
      FROM documents
    ),
    u AS (
      SELECT d.doc_id, d.source,
             CAST((doc_id + g.k) % 10 AS BIGINT) * 100 AS pri,
             g.k % 2 = 0 AS has_pri,
             '2024-0' || CAST(1 + (doc_id + g.k) % 9 AS VARCHAR)
               || '-11' AS lastmod
      FROM d, (SELECT unnest(range(0, 6)) AS k) g
      WHERE NOT d.err AND NOT d.is_index AND g.k < d.n
    ),
    per_doc AS (
      SELECT doc_id, source,
             CAST(count(*) AS BIGINT) AS n_urls,
             CAST(sum(CASE WHEN has_pri THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pri,
             CAST(sum(CASE WHEN has_pri THEN pri ELSE 0 END) AS BIGINT)
               AS sum_pri,
             max(lastmod) AS max_lastmod
      FROM u GROUP BY doc_id, source
    )
    SELECT d.source,
      CAST(count(*) AS BIGINT) AS n_sitemaps,
      CAST(sum(CASE WHEN d.err THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      CAST(sum(CASE WHEN NOT d.err AND d.is_index THEN 1 ELSE 0 END)
           AS BIGINT) AS n_indexes,
      CAST(sum(CASE WHEN NOT d.err AND NOT d.is_index THEN 1 ELSE 0 END)
           AS BIGINT) AS n_urlsets,
      CAST(sum(CASE WHEN NOT d.err AND NOT d.is_index
                    THEN p.n_urls ELSE 0 END) AS BIGINT) AS n_urls,
      CAST(sum(CASE WHEN NOT d.err AND d.is_index THEN 2 ELSE 0 END)
           AS BIGINT) AS n_children,
      CAST(sum(CASE WHEN NOT d.err AND NOT d.is_index
                    THEN p.n_pri ELSE 0 END) AS BIGINT)
        AS n_with_priority,
      CAST(sum(CASE WHEN NOT d.err AND NOT d.is_index
                    THEN p.sum_pri ELSE 0 END) AS BIGINT)
        AS sum_priority_milli,
      max(CASE WHEN NOT d.err THEN p.max_lastmod END) AS max_lastmod
    FROM d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def corpus_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sitemap census through the real parser both
    directions (render_sitemap -> parse_sitemap): urlset vs
    sitemapindex kinds, URL and child counts, priority presence and
    exact milli-priority mass (the protocol's 0.0-1.0 priority parsed
    as an integer — no float leaves the parser), max lastmod, and a
    deterministic 1/23 of documents torn mid-tag degrading to error
    rows (SitemapParseError contract, mutation-fuzz-proven).

    The oracle states every cell closed-form from the generator
    arithmetic via the constant-bound-grid idiom — DuckDB never reads
    a tag — so agreement proves the parser inverts the renderer:
    entity-decoded locs, namespace/declaration/comment tolerance,
    capture of nested character data, and the index-vs-urlset split.

    Scale shape: map-only Arrow kernel (one sitemap per row), ONE
    (source) hash aggregate; URL discovery over a trillion sitemaps
    moves only per-source count rows."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    meta = docs.mapInPandas(
        _sitemap_batches,
        schema=(
            "source string, status string, kind string, n_urls bigint,"
            " n_children bigint, n_with_priority bigint,"
            " sum_priority_milli bigint, max_lastmod string"
        ),
    )
    err = F.col("status") == "error"
    isx = F.col("kind") == "index"
    return meta.groupBy("source").agg(
        F.count("*").alias("n_sitemaps"),
        F.sum(err.cast("int")).cast("long").alias("n_errors"),
        F.sum((~err & isx).cast("int")).cast("long").alias("n_indexes"),
        F.sum((~err & ~isx).cast("int")).cast("long").alias("n_urlsets"),
        F.sum(F.when(~err & ~isx, F.col("n_urls")).otherwise(0))
        .cast("long").alias("n_urls"),
        F.sum(F.when(~err & isx, F.col("n_children")).otherwise(0))
        .cast("long").alias("n_children"),
        F.sum(F.when(~err & ~isx, F.col("n_with_priority")).otherwise(0))
        .cast("long").alias("n_with_priority"),
        F.sum(
            F.when(~err & ~isx, F.col("sum_priority_milli")).otherwise(0)
        ).cast("long").alias("sum_priority_milli"),
        F.max(F.when(~err, F.col("max_lastmod"))).alias("max_lastmod"),
    )


# ---------------------------------------------------------------------------
# Crawl-discovery end-to-end: messy URLs -> canonical dedup -> robots
# evaluation -> per-host politeness budget, ONE DAG with a per-host
# fate funnel — the acquisition-side twin of curation_end_to_end
# (which starts where this ends: with fetched documents).
# ---------------------------------------------------------------------------

_CDE_BUDGET = 40


def messy_url_py(doc_id: int) -> str:
    """Python twin of queries/urls.py:messy_url (the Catalyst
    generator) — used ONLY on the fixture/render side of the discovery
    e2e, so the links the HTML extractor recovers are the exact messy
    URL multiset the funnel oracle is stated over. Pinned equal to the
    expression form by tests/test_round10_waves.py."""
    g = doc_id // 2
    odd = doc_id % 2 == 1
    host = f"site{g % 5}.Example.COM"
    scheme = "HTTPS" if odd else "https"
    www = "WWW." if odd else ""
    port = ":8080" if g % 7 == 0 else (":443" if odd else "")
    path = (
        f"/a/./sec{g % 4}/doc%2D{g}"
        if odd
        else f"/a/x/../sec{g % 4}/doc-{g}"
    )
    query = (
        f"?utm_source=feed&id={g}&b=2&a=1"
        if odd
        else f"?b=2&utm_campaign=x&a=1&id={g}"
    )
    frag = f"#sec{doc_id % 3}"
    return scheme + "://" + www + host + port + path + query + frag


def _discovery_link_batches(batches):
    """Render a tiny index page per doc_id carrying its messy URL as a
    real <a href> (plus adversarial non-links: a script-quoted fake
    anchor and a mailto:), run the from-scratch link extractor on the
    page, and emit (doc_id, url). The page never leaves the task —
    only the narrow link rows do."""
    import pandas as pd

    from history_collector_spark.functions.html_extract import (
        escape_html,
        extract_links,
    )

    for pdf in batches:
        ids, urls = [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            page = (
                "<html><head><title>links</title>"
                "<script>var x = '<a href=\"/fake\">no</a>';"
                "</script></head><body>"
                "<!-- <a href=\"/commented\">out</a> -->"
                f'<p>see <a href="{escape_html(messy_url_py(d))}">'
                f"doc {d // 2}</a>"
                ' or <a href="mailto:ops@crawl.example">write in</a>'
                "</p></body></html>"
            )
            for url, _anchor in extract_links(
                page, base_url=f"http://idx{d % 7}.example.net/l/{d}"
            ):
                ids.append(d)
                urls.append(url)
        yield pd.DataFrame({"doc_id": ids, "url": urls})


@register(
    "crawl_discovery_end_to_end",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, doc_id // 2 AS g FROM documents
    ),
    grp AS (
      SELECT g, min(doc_id) AS rep, count(*) AS nvar,
             g % 5 AS k,
             g % 4 = g % 5 AS blocked,
             CAST(g % 89 AS BIGINT) AS priority
      FROM u GROUP BY g
    ),
    surv AS (
      SELECT k, count(*) AS s, max(priority) AS head_priority
      FROM grp WHERE NOT blocked GROUP BY k
    )
    SELECT 'site' || CAST(grp.k AS VARCHAR) || '.example.com' AS host,
      CAST(sum(grp.nvar) AS BIGINT) AS n_discovered,
      CAST(sum(grp.nvar - 1) AS BIGINT) AS drop_dup,
      CAST(sum(CASE WHEN grp.blocked THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_robots,
      CAST(greatest(coalesce(any_value(surv.s), 0) - {_CDE_BUDGET}, 0)
           AS BIGINT) AS drop_budget,
      CAST(least(coalesce(any_value(surv.s), 0), {_CDE_BUDGET}) AS BIGINT)
        AS n_fetched,
      CAST(any_value(surv.head_priority) AS BIGINT) AS head_priority,
      CAST(CASE WHEN coalesce(any_value(surv.s), 0) > 0
                THEN (least(any_value(surv.s), {_CDE_BUDGET}) - 1)
                     * (1 + grp.k % 3) END AS BIGINT) AS makespan_s
    FROM grp LEFT JOIN surv ON surv.k = grp.k
    GROUP BY grp.k
    """,
)
def crawl_discovery_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole acquisition funnel in one DAG, built from the REAL
    machinery of each stage (not fate shortcuts): HTML index pages ->
    the from-scratch outlink extractor (functions/html_extract.py:
    extract_links — round 11; discovery used to start from synthetic
    URL lists) -> the pure-Catalyst canonicalizer (queries/urls.py) ->
    canonical dedup (keep lowest doc_id) -> host/path split -> the
    broadcast robots-rules join with longest-match max_by -> per-host
    politeness budget, priorities parsed back OUT of the canonical
    URL's id parameter (the URL round-trips through attribute entity
    decode AND the normalizer before the scheduler sees it). Every URL
    is charged to the first stage that drops it (dup -> robots ->
    budget), so the funnel columns sum to the discovered count per
    host.

    The oracle states every cell closed-form from doc_id arithmetic —
    it never parses HTML, normalizes a URL, or matches a rule — so
    agreement proves extractor+normalizer+evaluator+scheduler invert
    the generator end to end (a leaked script/comment anchor or
    mailto: would surface as an extra discovered URL). Budget fates
    need only counts (min/max arithmetic), so the Spark side has NO
    window at all: map-only Arrow link extraction -> expression work
    -> two hash aggregates -> broadcast rules join -> final host
    aggregate."""
    from history_collector_spark.queries.urls import canonicalize_url

    docs = table(spark, sf_dir, "documents").select("doc_id")
    links = spread(docs, spark).mapInPandas(
        _discovery_link_batches, schema="doc_id bigint, url string"
    )
    canon = links.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("curl"),
    )
    grp = canon.groupBy("curl").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("nvar")
    )
    host = F.regexp_extract("curl", r"://([^:/]+)", 1)
    path = F.regexp_extract("curl", r"://[^/]+(?::\d+)?(/[^?#]*)", 1)
    priority = F.regexp_extract("curl", r"[?&]id=(\d+)", 1).cast(
        "long"
    ) % 89
    g = grp.select(
        "curl",
        "nvar",
        host.alias("host"),
        path.alias("path"),
        priority.alias("priority"),
        # r15 batch 6: g feeds the robots verdict AND the staged fate
        # join — without the pin the Arrow link-extraction kernel and
        # the canonical agg ran twice. One row per distinct canonical
        # URL.
    ).transform(pin_local)
    rules = spark.range(5).select(
        F.concat(
            F.lit("site"), F.col("id").cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.explode(
            F.array(
                F.struct(F.lit("/private/").alias("prefix"),
                         F.lit(0).alias("allow")),
                F.struct(
                    F.concat(F.lit("/a/sec"), F.col("id").cast("string"),
                             F.lit("/")).alias("prefix"),
                    F.lit(0).alias("allow"),
                ),
                F.struct(
                    F.concat(F.lit("/a/sec"), F.col("id").cast("string"),
                             F.lit("/public/")).alias("prefix"),
                    F.lit(1).alias("allow"),
                ),
            )
        ).alias("r"),
    ).select("host", F.col("r.prefix").alias("prefix"),
             F.col("r.allow").alias("allow"))
    verdict = (
        g.join(rules, "host", "left")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("curl")
        .agg(
            F.max_by(
                F.col("allow"),
                F.struct(F.length("prefix").alias("l"),
                         F.col("allow").alias("a")),
            ).alias("allow")
        )
    )
    staged = g.join(verdict, "curl", "left").select(
        "host",
        "nvar",
        "priority",
        F.coalesce(F.col("allow") == 0, F.lit(False)).alias("blocked"),
    )
    surv_s = F.sum((~F.col("blocked")).cast("long"))
    delay = 1 + F.regexp_extract("host", r"site(\d+)", 1).cast("long") % 3
    n_fetched = F.least(surv_s, F.lit(_CDE_BUDGET))
    return staged.groupBy("host").agg(
        F.sum("nvar").alias("n_discovered"),
        F.sum(F.col("nvar") - 1).alias("drop_dup"),
        F.sum(F.col("blocked").cast("long")).alias("drop_robots"),
        F.greatest(surv_s - _CDE_BUDGET, F.lit(0)).cast("long").alias(
            "drop_budget"
        ),
        n_fetched.cast("long").alias("n_fetched"),
        F.max(F.when(~F.col("blocked"), F.col("priority"))).alias(
            "head_priority"
        ),
        F.when(n_fetched > 0, (n_fetched - 1) * F.first(delay))
        .cast("long").alias("makespan_s"),
    )
