"""HTML main-content extraction over WARC response payloads.

The missing link between the container sources (sources/warc.py) and
the text/curation stack: a real crawl pipeline's first transform after
framing is HTML -> main text. This module wires the from-scratch
extractor (functions/html_extract.py: tag/script/style/comment
stripping, entity decode, block segmentation, link-density boilerplate
classification) into the crawl-ingest topology — binaryFile scan, one
WARC shard per task, Arrow-batched map-only extraction, zero shuffles.
It is the web-corpus analogue of the reference's parse stage
(reference python/main.py:263-266: raw ingested payload -> structured
rows).

Oracle strategy (same discipline as corpus_warc_ingest): the fixture
renders each `documents` row into a full HTML page — title, styles, a
script containing raw '<' and a fake '</div>', an HTML comment with
fake markup, pure-link nav/header/footer (and an aside on odd doc_ids),
and the document text as entity-escaped 40-word <p> paragraphs (with
'a' -> '&#97;' and 'the' -> 't&#104;e' so numeric entity decode is on
the hot path). Extraction must invert the rendering exactly: drop every
boilerplate block by link density, keep every paragraph, decode
entities, and re-join to the original text — so DuckDB can state the
expected output in closed form over `documents`.

Scale shape: real crawls shard WARC at ~1 GB, so per-task memory is one
shard; extraction is stateless per record (map-only, no exchange in the
plan); the per-doc output rows are narrow (the extracted text itself is
reduced to length + digest before leaving the task, so no wide payload
crosses any boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.queries.corpus_io import _fixture_dir
from history_collector_spark.registry import register

_WORDS_PER_PARA = 40
_MAX_LINK_DENSITY = 0.35


def render_page(doc_id: int, source: str, text: str) -> str:
    """Deterministic document -> HTML page (fixture side)."""
    from history_collector_spark.functions.html_extract import escape_html

    def esc_word(w: str) -> str:
        if w == "a":
            return "&#97;"
        if w == "the":
            return "t&#104;e"
        return escape_html(w)

    words = text.split(" ")
    paras = [
        "<p>"
        + " ".join(esc_word(w) for w in words[i : i + _WORDS_PER_PARA])
        + "</p>"
        for i in range(0, len(words), _WORDS_PER_PARA)
    ]
    nav_links = " ".join(
        f'<a href="/s?q=x>y&amp;p={k}">nav{k}</a>'
        for k in range(3 + doc_id % 3)
    )
    aside = (
        "<aside><a href='/ad1'>sponsored</a> <a href='/ad2'>links</a>"
        "</aside>"
        if doc_id % 2 == 1
        else ""
    )
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>Doc {doc_id}</title>\n"
        "<style>body { color: #333; } a > b { x: 1; }</style>\n"
        '<script>var x = 1 < 2 && "</div>"; // fake close\n</script>\n'
        "</head>\n<body>\n"
        f"<nav>{nav_links}</nav>\n"
        "<!-- boilerplate comment with <p>fake para</p> -->\n"
        f'<header><a href="/{source}">SiteName</a></header>\n'
        f'<div id="main">\n' + "\n".join(paras) + "\n</div>\n"
        f"{aside}\n"
        "<footer><a href='/tos'>terms</a> <a href='/priv'>privacy</a>"
        "</footer>\n"
        "</body></html>\n"
    )


def _write_html_warc_fixture(spark: SparkSession, sf_dir: str) -> str:
    from history_collector_spark.sources.warc import write_warc

    out = _fixture_dir(sf_dir, "htmlwarc")
    done = os.path.join(out, "_FIXTURE_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    # fixture-builder collect: bounded sample, writes test INPUT files
    # (the crawler side, not the engine under test)
    rows = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    shards: dict[int, list] = {k: [] for k in range(8)}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        shards[r["doc_id"] % 8].append(
            {
                "warc_type": "response",
                "uri": f"http://crawl.example/{r['source']}/{r['doc_id']}",
                "date": "2024-01-01T00:00:00Z",
                "payload": render_page(
                    r["doc_id"], r["source"], r["text"]
                ).encode("utf-8"),
            }
        )
    for k, recs in shards.items():
        gz = k % 2 == 1
        blob = write_warc(recs, gzip_members=gz)
        name = f"pages{k}.warc" + (".gz" if gz else "")
        with open(os.path.join(out, name), "wb") as f:
            f.write(blob)
    with open(done, "w") as f:
        f.write("ok")
    return out


def _extract_batches(batches):
    import hashlib

    import pandas as pd

    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )
    from history_collector_spark.sources.warc import parse_warc

    for pdf in batches:
        rows = []
        for blob in pdf["content"]:
            for rec in parse_warc(bytes(blob)):
                if rec["warc_type"] != "response":
                    continue
                parts = rec["uri"].rsplit("/", 2)
                title, text, n_content, n_boiler = extract_main_text(
                    rec["payload"].decode("utf-8", "replace"),
                    max_link_density=_MAX_LINK_DENSITY,
                )
                rows.append(
                    (
                        parts[-2],
                        int(parts[-1]),
                        title,
                        n_content,
                        n_boiler,
                        len(text),
                        int(
                            hashlib.md5(text.encode()).hexdigest()[:8],
                            16,
                        ),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "source",
                "doc_id",
                "title",
                "n_content_blocks",
                "n_boiler_blocks",
                "extracted_chars",
                "h32",
            ],
        )


@register(
    "corpus_html_extract",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           source,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           CAST(ceil(len(string_split(text, ' ')) / 40.0) AS BIGINT)
             AS n_content_blocks,
           CAST(3 + doc_id % 2 AS BIGINT) AS n_boiler_blocks,
           CAST(length(text) AS BIGINT) AS extracted_chars,
           CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS h32
    FROM documents
    """,
)
def corpus_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile scan of HTML-payload WARC shards -> Arrow-batched
    framing + main-content extraction -> one narrow row per page.

    Extraction must exactly invert the fixture's rendering (boilerplate
    dropped by link density, paragraphs kept, entities decoded,
    40-word paragraphs re-joined), so the expected title / block counts
    / char count / digest are all closed-form over `documents` — any
    leaked nav text, swallowed paragraph, or mis-decoded entity flips
    the per-row hash.
    """
    src = _write_html_warc_fixture(spark, sf_dir)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "pages*.warc*")
        .load(src)
        .select("content")
    )
    return blobs.mapInPandas(
        _extract_batches,
        schema=(
            "source string, doc_id bigint, title string,"
            " n_content_blocks bigint, n_boiler_blocks bigint,"
            " extracted_chars bigint, h32 bigint"
        ),
    ).select(
        "doc_id",
        "source",
        "title",
        F.col("n_content_blocks").cast("bigint").alias("n_content_blocks"),
        F.col("n_boiler_blocks").cast("bigint").alias("n_boiler_blocks"),
        "extracted_chars",
        "h32",
    )
