"""URL canonicalization + canonical-URL dedup — the step a crawl
pipeline runs before any content fetch or dedup: the same resource
hides behind scheme/case/port/dot-segment/percent-escape/tracking-param
variants, and grouping by the canonical form is the first (and
cheapest) dedup pass.

Everything here is PURE CATALYST EXPRESSION — no Python UDF, no Arrow
kernel: scheme/host case-folding, www-stripping, default-port removal,
dot-segment resolution (a real stack fold via F.aggregate over path
segments), unreserved percent-escape decoding, tracking-param removal,
and query-param sorting all run inside whole-stage codegen. At 100 TB
this matters: URL normalization touches every crawled row, so it must
stay JVM-side and fuse into the scan.

Oracle strategy: the messy URL is GENERATED deterministically per
doc_id (two different messy variants per canonical group — upper-case
scheme + www + default port + '/./' segments vs. bare host + '/x/../'
segments + %-escapes), and DuckDB states the expected canonical form
closed-form from the same arithmetic — the oracle never parses a URL,
so agreement proves the Spark-side normalizer inverts every mess the
generator produces. Unreserved-escape decoding covers the {-, _, ~, .}
set the generator emits; a full %XX table is the documented extension
point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


def messy_url(doc_id):
    """doc_id -> a deliberately messy URL column (two variants per
    canonical group g = doc_id // 2)."""
    g = (doc_id / 2).cast("long")
    host = F.concat(F.lit("site"), (g % 5).cast("string"),
                    F.lit(".Example.COM"))
    odd = doc_id % 2 == 1
    scheme = F.when(odd, "HTTPS").otherwise(F.lit("https"))
    www = F.when(odd, "WWW.").otherwise(F.lit(""))
    port = F.when(g % 7 == 0, ":8080").otherwise(
        F.when(odd, ":443").otherwise(F.lit(""))
    )
    path = F.when(
        odd,
        F.concat(F.lit("/a/./sec"), (g % 4).cast("string"),
                 F.lit("/doc%2D"), g.cast("string")),
    ).otherwise(
        F.concat(F.lit("/a/x/../sec"), (g % 4).cast("string"),
                 F.lit("/doc-"), g.cast("string")),
    )
    query = F.when(
        odd,
        F.concat(F.lit("?utm_source=feed&id="), g.cast("string"),
                 F.lit("&b=2&a=1")),
    ).otherwise(
        F.concat(F.lit("?b=2&utm_campaign=x&a=1&id="), g.cast("string")),
    )
    frag = F.concat(F.lit("#sec"), (doc_id % 3).cast("string"))
    return F.concat(scheme, F.lit("://"), www, host, port, path, query,
                    frag)


_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url):
    """Messy URL column -> canonical form, all JVM-side expressions."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):",
                                      1))
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)",
                                1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    port = (
        F.when((scheme == "http") & (port == ":80"), "")
        .when((scheme == "https") & (port == ":443"), "")
        .otherwise(port)
    )
    raw_path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # unreserved percent-escapes decode (the set the crawl generator
    # emits; the full table is the documented extension point)
    for esc, ch in (("%2D", "-"), ("%5F", "_"), ("%7E", "~"), ("%2E", ".")):
        raw_path = F.regexp_replace(raw_path, f"(?i){esc}", ch)
    # dot-segment resolution: stack fold over '/'-split segments
    segs = F.split(raw_path, "/")
    stack = F.aggregate(
        segs,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, seg: (
            F.when(seg == "..",
                   F.slice(acc, F.lit(1),
                           F.greatest(F.size(acc) - 1, F.lit(0))))
            .when((seg == ".") | (seg == ""), acc)
            .otherwise(F.concat(acc, F.array(seg)))
        ),
    )
    path = F.concat(F.lit("/"), F.array_join(stack, "/"))
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda kv: (~kv.startswith("utm_")) & (kv != ""),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query)


@register(
    "corpus_url_canonicalize",
    oracle="""
    WITH g AS (
      SELECT DISTINCT doc_id // 2 AS g,
             CAST(count(*) OVER (PARTITION BY doc_id // 2) AS BIGINT)
               AS n_variants,
             min(doc_id) OVER (PARTITION BY doc_id // 2) AS min_doc
      FROM documents
    )
    SELECT 'https://site' || CAST(g % 5 AS VARCHAR) || '.example.com'
           || CASE WHEN g % 7 = 0 THEN ':8080' ELSE '' END
           || '/a/sec' || CAST(g % 4 AS VARCHAR)
           || '/doc-' || CAST(g AS VARCHAR)
           || '?a=1&b=2&id=' || CAST(g AS VARCHAR) AS canonical_url,
           n_variants,
           CAST(min_doc AS BIGINT) AS min_doc
    FROM g
    """,
)
def corpus_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup over deliberately messy per-doc URLs: both
    messy variants of a group must normalize to the SAME canonical
    string (scheme/host case, www, default ports, '.'/'..' segments,
    %-escapes, utm params, param order, fragments all differ between
    the variants), then group-by-canonical yields the variant count
    and representative doc — the first dedup pass of a crawl.

    Scale shape: normalization is row-local whole-stage-codegen
    expression work fused into the scan (asserted UDF-free by the plan
    guards); the only exchange is the final hash aggregate on the
    canonical string."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id", messy_url(F.col("doc_id")).alias("url")
    )
    canon = urls.select(
        "doc_id", canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_variants"),
        F.min("doc_id").alias("min_doc"),
    )
