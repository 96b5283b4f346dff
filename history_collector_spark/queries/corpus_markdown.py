"""Markdown corpus cleaning: the docs/README/wiki share of a training
corpus arrives as Markdown, and the cleaning transform recovers the
prose stream while dropping fenced code and markup sugar
(functions/markdown.py — the markdown sibling of the HTML extraction
stage, same render-inversion oracle discipline as corpus_html.py).

Reference parity note: extends the reference's parse stage
(reference python/main.py:263-266, raw payload -> structured rows) to
the markdown flavor of the web-corpus tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register


def _md_batches(batches):
    import hashlib

    import pandas as pd

    from history_collector_spark.functions.markdown import (
        markdown_to_text,
        render_markdown,
    )

    for pdf in batches:
        rows = []
        for doc_id, source, text in zip(
            pdf["doc_id"], pdf["source"], pdf["text"]
        ):
            d = int(doc_id)
            r = markdown_to_text(render_markdown(d, text))
            rows.append(
                (
                    d,
                    source,
                    r["title"],
                    r["n_links"],
                    r["n_code_blocks"],
                    r["n_list_items"],
                    len(r["text"]),
                    int(
                        hashlib.md5(r["text"].encode()).hexdigest()[:8], 16
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "source", "title", "n_links", "n_code_blocks",
                "n_list_items", "extracted_chars", "h32",
            ],
        )


@register(
    "corpus_markdown_extract",
    # Renderer inversion, stated closed-form from word-count
    # arithmetic: every 11th word is a link, every third paragraph a
    # 10-word-item list, one fenced block after paragraph 0 plus a
    # tail block on odd ids, and the recovered prose stream must equal
    # the original text byte-for-byte (h32) — a swallowed list marker,
    # leaked code fence, or mangled emphasis flips the hash.
    oracle="""
    WITH d AS (
      SELECT doc_id, source, text,
             len(string_split(text, ' ')) AS n,
             CAST(ceil(len(string_split(text, ' ')) / 30.0) AS BIGINT)
               AS np
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      'Doc ' || CAST(doc_id AS VARCHAR) AS title,
      CAST((n + 10) // 11 AS BIGINT) AS n_links,
      CAST(1 + doc_id % 2 AS BIGINT) AS n_code_blocks,
      CAST((np - 1) // 3 * 3
           + CASE WHEN (np - 1) % 3 = 2
                  THEN CAST(ceil((n - 30 * (np - 1)) / 10.0) AS BIGINT)
                  ELSE 0 END AS BIGINT) AS n_list_items,
      CAST(length(text) AS BIGINT) AS extracted_chars,
      CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS h32
    FROM d
    """,
)
def corpus_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown -> prose cleaning through the from-scratch kernel,
    render + extract both in-kernel (the sitemap idiom: the page never
    leaves the task, only narrow per-doc facts do). Extraction must
    invert the deterministic renderer exactly — headings to title,
    fences dropped and counted, list/quote markers stripped, links/
    emphasis/inline-code unwrapped — so every output column is
    closed-form over `documents`.

    Scale shape: map-only Arrow kernel over the documents scan, zero
    exchange in the plan."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    return spread(docs, spark).mapInPandas(
        _md_batches,
        schema=(
            "doc_id bigint, source string, title string, n_links bigint,"
            " n_code_blocks bigint, n_list_items bigint,"
            " extracted_chars bigint, h32 bigint"
        ),
    )
