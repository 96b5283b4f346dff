"""Round-12 regression pins.

Covers the round-11 ADVICE items (markdown ordered-marker inversion
guard, Snappy torn-shard chunk-boundary hazard, extract_links lower()
hoisting) plus the round-12 builds added below as they land.
"""

from __future__ import annotations

import os

import pytest


# ---------------------------------------------------------------------------
# ADVICE r11: markdown render-inversion vs paragraph-initial "12." tokens
# ---------------------------------------------------------------------------


def test_markdown_ordered_marker_is_real_commonmark():
    """The extractor keeps \\d+\\. ordered-marker stripping because it
    is real CommonMark — this is kernel behavior, not a bug."""
    from history_collector_spark.functions.markdown import markdown_to_text

    r = markdown_to_text("12. item twelve\n1. item one\n")
    assert r["n_list_items"] == 2
    assert r["text"] == "item twelve item one"


def test_markdown_inversion_survives_numeric_period_words():
    """ADVICE r11 (medium): a corpus word like '12.' at a paragraph
    start must not be swallowed as an ordered-list marker. Sweep the
    hazard token through every word position of a multi-paragraph
    document and demand byte-exact inversion each time."""
    from history_collector_spark.functions.markdown import (
        markdown_to_text,
        render_markdown,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 10).split()
    for pos in range(0, 95, 7):
        words = list(base)
        words[pos] = "12."
        text = " ".join(words)
        for d in (0, 1):
            r = markdown_to_text(render_markdown(d, text))
            assert r["text"] == text, (pos, d)


def test_markdown_renderer_guard_wraps_bare_numeric_marker():
    """The para_safe guard itself: a plain paragraph line that WOULD
    start with a bare '12.' token reads back exactly (emphasis-wrap
    round-trips). Exercised directly on the hazard string since the
    current style() periods make the guard unreachable via
    render_markdown — the guard exists for when those constants
    change."""
    from history_collector_spark.functions.markdown import markdown_to_text

    # what para_safe emits for a hazard line
    assert markdown_to_text("*12.* rest of line")["text"] == "12. rest of line"
    assert markdown_to_text("*12.*")["text"] == "12."


# ---------------------------------------------------------------------------
# ADVICE r11: Snappy torn shard must land mid-chunk
# ---------------------------------------------------------------------------


def test_snappy_chunk_boundary_cut_decodes_cleanly():
    """Establishes the hazard: the Snappy framing format has no
    end-of-stream marker, so a truncation at a chunk boundary decodes
    as a valid short prefix (unlike the LZ4 frame, which has an end
    mark + content checksum)."""
    from history_collector_spark.functions.snappy import (
        compress_frame,
        decode_snappy_frame,
    )

    a = compress_frame(b"first chunk of data\n" * 10)
    b = compress_frame(b"second chunk of data\n" * 10)
    # concatenated frames: cutting exactly at the boundary of the
    # second stream keeps a fully valid frame
    two = a + b[10:]  # strip the second stream identifier, keep chunks
    assert decode_snappy_frame(two[: len(a)]) == b"first chunk of data\n" * 10


def test_snappy_fixture_torn_shard_always_raises(spark, tmp_path):
    """ADVICE r11 (low): the fixture writer must nudge the cut until
    decode provably raises, so the oracle's __error__ row appears for
    every corpus size."""
    from history_collector_spark.functions.snappy import (
        SnappyDecodeError,
        decode_snappy_frame,
    )
    from history_collector_spark.queries.corpus_io import (
        _fixture_dir,
        _write_snappy_fixture,
    )

    # force a rebuild so the test exercises the fixed writer, not a
    # fixture cached in /tmp by an earlier run of the old code
    import shutil

    stale = _fixture_dir("/root/testdata/sf0.001", "snappyjsonl")
    shutil.rmtree(stale, ignore_errors=True)
    out = _write_snappy_fixture(spark, "/root/testdata/sf0.001")
    torn = [f for f in sorted(os.listdir(out)) if f.endswith(".snappy")][0]
    assert torn == "docs000.jsonl.snappy"
    blob = open(os.path.join(out, torn), "rb").read()
    with pytest.raises(SnappyDecodeError):
        decode_snappy_frame(blob)


# ---------------------------------------------------------------------------
# ADVICE r11: extract_links / parse_blocks lower() hoisting stays correct
# ---------------------------------------------------------------------------


def test_extract_links_many_script_tags_correct():
    from history_collector_spark.functions.html_extract import extract_links

    page = "".join(
        f"<SCRIPT>var x{i} = '<a href=\"http://evil.example/{i}\">';"
        f"</ScRiPt><p><a href='/p{i}'>link {i}</a></p>"
        for i in range(50)
    )
    links = extract_links(page, base_url="http://h.example/a/b")
    assert len(links) == 50
    assert links[0] == ("http://h.example/p0", "link 0")
    assert all("evil" not in u for u, _ in links)


def test_parse_blocks_mixed_case_script_close():
    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )

    page = ("<p>before</p><style>p {color: red}</STYLE>"
            "<p>after the style block this text survives</p>")
    _, text, _, _ = extract_main_text(page)
    assert "before" in text and "survives" in text
    assert "color" not in text
