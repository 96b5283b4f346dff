"""Independent cross-checks for the round-10 waves: the oracle gate
proves Spark == DuckDB; these prove the shared formulas right against
implementations that share no code with either engine's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


# ---------------------------------------------------------------------------
# HTML main-content extraction
# ---------------------------------------------------------------------------


def test_html_entity_decode_table():
    from history_collector_spark.functions.html_extract import (
        unescape_entities,
    )

    cases = {
        "&amp;": "&",
        "&lt;x&gt;": "<x>",
        "&quot;&apos;": "\"'",
        "&nbsp;": " ",
        "&#97;&#98;": "ab",
        "&#x61;&#X42;": "aB",
        "&unknown;": "&unknown;",
        "&#xD800;": "&#xD800;",  # surrogate: literal, not chr()
        "&#0;": "&#0;",  # NUL rejected
        "&": "&",
        "&#": "&#",
        "a&b;c": "a&b;c",
        "&AMP;": "&",  # entity names case-fold
    }
    for src, want in cases.items():
        assert unescape_entities(src) == want, src


def test_html_block_segmentation_and_density():
    from history_collector_spark.functions.html_extract import parse_blocks

    title, blocks = parse_blocks(
        "<html><head><title>T1</title></head><body>"
        "<nav><a href='/'>home</a> <a href='/x'>about</a></nav>"
        "<p>twelve plain words of body text</p>"
        "<p>see <a href='/y'>this link</a> for details</p>"
        "</body></html>"
    )
    assert title == "T1"
    assert [b.text for b in blocks] == [
        "home about",
        "twelve plain words of body text",
        "see this link for details",
    ]
    # nav: 9 of 10 chars inside anchors
    assert blocks[0].link_density == 9 / 10
    assert blocks[0].n_links == 2
    assert blocks[1].link_density == 0.0
    # "this link" = 9 link chars of 25 total
    assert blocks[2].link_chars == 9
    assert blocks[2].n_chars == 25


def test_html_strips_script_style_comments_doctype():
    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )

    html = (
        "<!DOCTYPE html><?xml version='1.0'?>"
        "<script>if (1 < 2) document.write('</div>');</script>"
        "<style>p > a { color: red }</style>"
        "<!-- <p>ghost</p> -->"
        "<noscript>enable js</noscript>"
        "<p>real text</p>"
    )
    title, text, n_content, n_boiler = extract_main_text(html)
    assert text == "real text"
    assert (n_content, n_boiler) == (1, 0)


def test_html_quoted_gt_in_attribute():
    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )

    _, text, _, _ = extract_main_text(
        "<p><a href=\"/s?q=a>b\" title='x>y'>link</a> word word word"
        " word word word</p>"
    )
    assert text == "link word word word word word word"


def test_html_extract_matches_stdlib_parser_on_fixture_pages(spark):
    """Cross-validation against a stdlib-html.parser reference (the
    tarball-vs-stdlib-tarfile discipline): on every fixture page the
    from-scratch tokenizer must see the same visible text stream."""
    from html.parser import HTMLParser

    from history_collector_spark.functions.html_extract import parse_blocks
    from history_collector_spark.queries.corpus_html import render_page

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out: list[str] = []
            self.skip = 0
            self.in_title = False

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "noscript", "textarea", "svg"):
                self.skip += 1
            if tag == "title":
                self.in_title = True

        def handle_endtag(self, tag):
            if tag in ("script", "style", "noscript", "textarea", "svg"):
                self.skip = max(0, self.skip - 1)
            if tag == "title":
                self.in_title = False

        def handle_data(self, data):
            if not self.skip and not self.in_title:
                self.out.append(data)

    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(60)
        .collect()
    )
    assert docs
    for r in docs:
        page = render_page(r["doc_id"], r["source"], r["text"])
        ref = Ref()
        ref.feed(page)
        want = " ".join("".join(ref.out).split())
        _, blocks = parse_blocks(page)
        got = " ".join(b.text for b in blocks)
        assert got == want, r["doc_id"]


def test_html_render_extract_roundtrip_property():
    """Hypothesis: rendering ANY single-space word text and extracting
    inverts exactly — text, paragraph count, and boilerplate count."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )
    from history_collector_spark.queries.corpus_html import (
        _WORDS_PER_PARA,
        render_page,
    )

    word = st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("Ll", "Lu", "Nd"),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=10_000),
        st.lists(word, min_size=1, max_size=150),
    )
    def check(doc_id, words):
        text = " ".join(words)
        title, got, n_content, n_boiler = extract_main_text(
            render_page(doc_id, "srcP", text)
        )
        assert title == f"Doc {doc_id}"
        assert got == text
        assert n_content == math.ceil(len(words) / _WORDS_PER_PARA)
        assert n_boiler == 3 + doc_id % 2

    check()


def test_corpus_html_extract_plan_is_map_only(spark):
    """The crawl-ingest topology: binaryFile scan -> mapInPandas, no
    exchange anywhere (extraction is embarrassingly parallel)."""
    df = registry.QUERIES["corpus_html_extract"](spark, TEST_SF_DIR)
    df.rdd.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan
