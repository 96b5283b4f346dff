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


# ---------------------------------------------------------------------------
# WebP VP8L codec — decode-only paths exercised via hand-built
# bitstreams (no reference WebP implementation exists in this
# environment; the encoder never emits LZ77/cache/meta/predictor, so
# these streams are constructed bit-by-bit from the spec).
# ---------------------------------------------------------------------------


def _vp8l_wrap(payload_bits) -> bytes:
    payload = b"\x2f" + payload_bits.tobytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _vp8l_header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _literal_codes(bw, greens, reds, blues, alphas, cache_bits=0,
                   lengths=(), dists=()):
    """Write the 5 prefix codes covering the given symbol sets and
    return them for emitting."""
    from history_collector_spark.functions import webp as W

    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gsyms = sorted(set(greens) | {256 + l for l in lengths})
    def lens(syms):
        syms = list(syms)
        return {syms[0]: 1} if len(syms) == 1 else W._huffman_lengths(
            {s: 1 for s in syms}
        )
    g = W._write_prefix_code(bw, lens(gsyms), galpha)
    r = W._write_prefix_code(bw, lens(sorted(set(reds))), 256)
    b = W._write_prefix_code(bw, lens(sorted(set(blues))), 256)
    a = W._write_prefix_code(bw, lens(sorted(set(alphas))), 256)
    d = W._write_prefix_code(
        bw, lens(sorted(set(dists) or {0})), 40
    )
    return g, r, b, a, d


def _emit_literal(bw, codes, argb):
    from history_collector_spark.functions import webp as W

    g, r, b, a, _ = codes
    W._write_symbol(bw, g, (argb >> 8) & 0xFF)
    W._write_symbol(bw, r, (argb >> 16) & 0xFF)
    W._write_symbol(bw, b, argb & 0xFF)
    W._write_symbol(bw, a, (argb >> 24) & 0xFF)


def test_vp8l_lz77_backref_row_copy():
    """length-4 backref at distance code 1 ((0,1) => one row up)."""
    import numpy as np

    from history_collector_spark.functions import webp as W

    row = [0xFF102030, 0xFF112131, 0xFF122232, 0xFF132333]
    bw = W._BitWriter()
    _vp8l_header(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    codes = _literal_codes(
        bw,
        greens=[(p >> 8) & 0xFF for p in row],
        reds=[(p >> 16) & 0xFF for p in row],
        blues=[p & 0xFF for p in row],
        alphas=[0xFF],
        lengths=[3],  # length prefix 3 => value 4
        dists=[0],  # distance prefix 0 => value 1 => map (0,1)
    )
    for p in row:
        _emit_literal(bw, codes, p)
    W._write_symbol(bw, codes[0], 256 + 3)  # length 4
    W._write_symbol(bw, codes[4], 0)  # dist code 1
    out = W.decode_webp(_vp8l_wrap(bw))
    top = out[0].astype(np.uint32)
    assert (out[1] == out[0]).all()
    got = [
        (0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b))
        for r, g, b, _ in top
    ]
    assert got == row


def test_vp8l_color_cache_hit():
    from history_collector_spark.functions import webp as W

    A, B = 0xFF0A141E, 0xFF303132
    cache_bits = 4
    idx = ((0x1E35A7BD * A) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = W._BitWriter()
    _vp8l_header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    cache_sym = 256 + 24 + idx
    from history_collector_spark.functions.webp import (
        _huffman_lengths,
        _write_prefix_code,
    )

    galpha = 256 + 24 + (1 << cache_bits)
    gsyms = sorted({(A >> 8) & 0xFF, (B >> 8) & 0xFF, cache_sym})
    g = _write_prefix_code(bw, _huffman_lengths({s: 1 for s in gsyms}), galpha)
    r = _write_prefix_code(
        bw, _huffman_lengths({(A >> 16) & 0xFF: 1, (B >> 16) & 0xFF: 1}), 256
    )
    b = _write_prefix_code(
        bw, _huffman_lengths({A & 0xFF: 1, B & 0xFF: 1}), 256
    )
    a = _write_prefix_code(bw, {0xFF: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    codes = (g, r, b, a, None)
    _emit_literal(bw, codes, A)
    _emit_literal(bw, codes, B)
    W._write_symbol(bw, g, cache_sym)
    out = W.decode_webp(_vp8l_wrap(bw))
    px = [
        0xFF000000 | (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])
        for p in out[0]
    ]
    assert px == [A, B, A]


def test_vp8l_predictor_transform_mode_left():
    """2x2 image, predictor mode 1 (L) for the interior pixel; border
    pixels use the spec's implicit black/L/T predictors."""
    from history_collector_spark.functions import webp as W

    bw = W._BitWriter()
    _vp8l_header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(W._PREDICTOR_TRANSFORM, 2)
    bw.write(2, 3)  # bits = 2+2 = 4 => one 16x16 block
    # predictor sub-image: 1x1, mode 1 in green channel
    bw.write(0, 1)  # no cache (sub-image)
    codes = _literal_codes(bw, greens=[1], reds=[0], blues=[0], alphas=[0])
    _emit_literal(bw, codes, 0x00000100)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache (main)
    bw.write(0, 1)  # no meta
    # target image:
    #  (0,0)=alpha-black + residual; want ARGB FF404040
    #  residual(0,0) = want - 0xFF000000 per channel = 00404040
    #  (0,1): pred = L = FF404040, want FF505050 -> res 00101010
    #  (1,0): pred = T = FF404040, want FF606060 -> res 00202020
    #  (1,1): pred = L = FF606060 (mode 1), want FF707070 -> res 00101010
    residuals = [0x00404040, 0x00101010, 0x00202020, 0x00101010]
    codes = _literal_codes(
        bw,
        greens=[(p >> 8) & 0xFF for p in residuals],
        reds=[(p >> 16) & 0xFF for p in residuals],
        blues=[p & 0xFF for p in residuals],
        alphas=[0],
    )
    for p in residuals:
        _emit_literal(bw, codes, p)
    out = W.decode_webp(_vp8l_wrap(bw))
    got = [
        (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for row in out
        for r, g, b, a in row.tolist()
    ]
    assert got == [0xFF404040, 0xFF505050, 0xFF606060, 0xFF707070]


def test_vp8l_color_transform_deltas():
    from history_collector_spark.functions import webp as W

    g2r, g2b, r2b = 0x10, 0xF0, 0x08  # 16, -16, 8 as int8
    # multipliers in the low three channels: g2r=blue, g2b=green, r2b=red
    ct_pixel = (r2b << 16) | (g2b << 8) | g2r
    bw = W._BitWriter()
    _vp8l_header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(W._COLOR_TRANSFORM, 2)
    bw.write(2, 3)  # bits = 4
    bw.write(0, 1)  # sub-image: no cache
    codes = _literal_codes(
        bw, greens=[g2b], reds=[r2b], blues=[g2r], alphas=[0]
    )
    _emit_literal(bw, codes, ct_pixel)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    stored = 0xFF204060  # a=FF r=20 g=40 b=60 (residual space)
    codes = _literal_codes(bw, greens=[0x40], reds=[0x20], blues=[0x60],
                           alphas=[0xFF])
    _emit_literal(bw, codes, stored)
    out = W.decode_webp(_vp8l_wrap(bw))
    green = 0x40
    red = (0x20 + W._ct_delta(g2r, green)) & 0xFF
    blue = (0x60 + W._ct_delta(g2b, green) + W._ct_delta(r2b, red)) & 0xFF
    assert out[0, 0].tolist() == [red, green, blue, 0xFF]


def test_vp8l_palette_with_bundling():
    """3-color palette => width_bits 2 (four 2-bit indices share one
    packed green byte)."""
    from history_collector_spark.functions import webp as W

    palette = [0xFF111111, 0xFF222222, 0xFF333333]
    indices = [0, 1, 2, 1, 0, 2]  # 6x1 image
    bw = W._BitWriter()
    _vp8l_header(bw, 6, 1)
    bw.write(1, 1)
    bw.write(W._COLOR_INDEXING, 2)
    bw.write(len(palette) - 1, 8)
    # palette sub-image: delta-coded entries
    deltas = []
    prev = 0
    for p in palette:
        deltas.append(
            tuple(((p >> s) - (prev >> s)) & 0xFF for s in (24, 16, 8, 0))
        )
        prev = p
    bw.write(0, 1)  # no cache
    codes = _literal_codes(
        bw,
        greens=[d[2] for d in deltas],
        reds=[d[1] for d in deltas],
        blues=[d[3] for d in deltas],
        alphas=[d[0] for d in deltas],
    )
    for d in deltas:
        _emit_literal(bw, codes, (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache (main)
    bw.write(0, 1)  # no meta
    # packed width = ceil(6/4) = 2; greens pack 4 indices LSB-first
    packed = [
        indices[0] | indices[1] << 2 | indices[2] << 4 | indices[3] << 6,
        indices[4] | indices[5] << 2,
    ]
    codes = _literal_codes(bw, greens=packed, reds=[0], blues=[0], alphas=[0])
    for g in packed:
        _emit_literal(bw, codes, g << 8)
    out = W.decode_webp(_vp8l_wrap(bw))
    got = [
        (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b, a in out[0].tolist()
    ]
    assert got == [palette[i] for i in indices]


def test_vp8l_meta_prefix_codes():
    """8x1 image, meta_bits=2 => two horizontal code groups with
    different (degenerate single-symbol) literal codes."""
    from history_collector_spark.functions import webp as W

    bw = W._BitWriter()
    _vp8l_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta present
    bw.write(0, 3)  # meta_bits = 2 => huffman image 2x1
    # huffman image (entropy, no meta): pixels' (red<<8|green) = 0, 1
    bw.write(0, 1)  # no cache in huffman image
    codes = _literal_codes(bw, greens=[0, 1], reds=[0], blues=[0], alphas=[0])
    _emit_literal(bw, codes, 0x00000000)
    _emit_literal(bw, codes, 0x00000100)
    # group 0: constant red 0xAA; group 1: constant red 0xBB
    for red in (0xAA, 0xBB):
        _literal_codes(bw, greens=[5], reds=[red], blues=[7], alphas=[0xFF])
    # all symbols are single-symbol codes: zero data bits needed
    out = W.decode_webp(_vp8l_wrap(bw))
    reds = [int(p[0]) for p in out[0]]
    assert reds == [0xAA] * 4 + [0xBB] * 4
    assert [int(p[1]) for p in out[0]] == [5] * 8


def test_webp_roundtrip_matrix():
    """Pixel-exact encode->decode across shapes, channel counts, and
    the subtract-green transform."""
    import numpy as np

    from history_collector_spark.functions.webp import (
        decode_webp,
        encode_webp_vp8l,
    )

    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (4, 6, 3), (3, 5, 4), (8, 8, 3), (2, 17, 3)]:
        for sg in (False, True):
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = decode_webp(encode_webp_vp8l(px, subtract_green=sg))
            want = (
                px
                if shape[2] == 4
                else np.dstack(
                    [px, np.full(shape[:2] + (1,), 255, np.uint8)]
                )
            )
            assert (out == want).all(), (shape, sg)
    # constant image: the degenerate single-symbol code path
    px = np.full((5, 7, 3), 42, np.uint8)
    assert (decode_webp(encode_webp_vp8l(px))[:, :, :3] == px).all()


def test_webp_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from history_collector_spark.functions.webp import (
        decode_webp,
        encode_webp_vp8l,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=3, max_value=4),
        st.booleans(),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(w, h, ch, sg, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        out = decode_webp(encode_webp_vp8l(px, subtract_green=sg))
        assert out.shape == (h, w, 4)
        assert (out[:, :, :ch] == px).all()
        if ch == 3:
            assert (out[:, :, 3] == 255).all()

    check()


def test_webp_animation_is_plug_point_and_torn_bodies_are_errors():
    # round 12: lossy VP8 and static VP8X have real decoders, so
    # garbage bodies are malformed-input ERRORS; only ANIMATED
    # containers remain a (frame-compositing) plug point
    import pytest

    from history_collector_spark.functions.codec_errors import (
        ImageDecodeError,
    )
    from history_collector_spark.functions.webp import decode_webp

    for tag in (b"VP8 ", b"VP8X"):
        blob = (
            b"RIFF\x1c\x00\x00\x00WEBP" + tag
            + (16).to_bytes(4, "little") + bytes(16)
        )
        with pytest.raises(ImageDecodeError):
            decode_webp(blob)
    from history_collector_spark.queries.multimodal import _vp8x_blob

    # round 13: animated containers DECODE to the first composited
    # canvas — real pinned libwebp frame payloads and header-only
    # sub-streams alike (empty partitions decode as all-default
    # frames per the RFC 6386 bool-decoder past-end rule)
    first = decode_webp(_vp8x_blob(5, 3, alpha=False, real=True))
    assert first.shape == (3, 5, 4)
    first = decode_webp(_vp8x_blob(8, 8, alpha=False))
    assert first.shape == (8, 8, 4)


def test_curation_web_end_to_end_brute_force(spark):
    """Independent pure-Python recomputation of the web funnel from the
    raw documents (no Spark, no DuckDB, no shared helper code): render
    -> extract is exercised by the real query; here the EXPECTED funnel
    is rebuilt from first principles over the same corpus."""
    import hashlib
    from collections import defaultdict

    from history_collector_spark.queries.corpus_html import (
        _WEB_BUDGET,
        _WEB_MIN_TOKENS,
    )

    docs = sorted(
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    fate: dict[int, str] = {}
    seen_h: set[str] = set()
    cum: dict[str, int] = defaultdict(int)
    for r in docs:
        nt = len(r["text"].split(" "))
        if nt < _WEB_MIN_TOKENS:
            fate[r["doc_id"]] = "quality"
            continue
        h = hashlib.md5(r["text"].encode()).hexdigest()
        if h in seen_h:
            fate[r["doc_id"]] = "exact"
            continue
        seen_h.add(h)
        cum[r["source"]] += nt
        fate[r["doc_id"]] = (
            "budget" if cum[r["source"]] > _WEB_BUDGET else "kept"
        )

    want = defaultdict(lambda: defaultdict(int))
    for r in docs:
        s = r["source"]
        want[s]["n_pages"] += 1
        want[s]["boiler_blocks_dropped"] += 3 + r["doc_id"] % 2
        f = fate[r["doc_id"]]
        if f == "kept":
            want[s]["kept_docs"] += 1
            want[s]["kept_tokens"] += len(r["text"].split(" "))
        else:
            want[s][f"drop_{f}"] += 1

    got = {
        r["source"]: r.asDict()
        for r in registry.QUERIES["curation_web_end_to_end"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for s, row in got.items():
        for col in (
            "n_pages",
            "boiler_blocks_dropped",
            "drop_quality",
            "drop_exact",
            "drop_budget",
            "kept_docs",
            "kept_tokens",
        ):
            assert row[col] == want[s][col], (s, col, row, dict(want[s]))
        assert (
            row["drop_quality"] + row["drop_exact"] + row["drop_budget"]
            + row["kept_docs"] == row["n_pages"]
        )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


def test_url_canonicalizer_hand_cases(spark):
    """Spot canonicalizations against hand-derived expectations —
    independent of the generator (the oracle only proves the generator
    inverts; these pin the normalizer on messes the generator never
    emits)."""
    from history_collector_spark.queries.urls import canonicalize_url
    from pyspark.sql import functions as F

    cases = [
        ("HTTP://WWW.Ex.COM:80/a/./b/../c?utm_x=1&z=2&a=1#f",
         "http://ex.com/a/c?a=1&z=2"),
        ("https://Host.Org:443/p%2Dq/%7Euser", "https://host.org/p-q/~user"),
        ("https://h.io:8443/x/y/../../z", "https://h.io:8443/z"),
        ("http://a.b/", "http://a.b/"),
        ("http://a.b/p?utm_source=x&utm_campaign=y", "http://a.b/p"),
        ("https://a.b/p/..", "https://a.b/"),
        ("http://www.a.b:80/%5Fx%2E?b=2&a=10", "http://a.b/_x.?a=10&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r[0]
        for r in df.select(canonicalize_url(F.col("url"))).collect()
    ]
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)


def test_url_variants_collapse_and_plan_is_udf_free(spark):
    """Both messy variants of every group canonicalize identically, and
    the whole normalizer stays JVM-side (no BatchEvalPython /
    ArrowEvalPython in the executed plan)."""
    from pyspark.sql import functions as F

    from history_collector_spark.queries.urls import (
        canonicalize_url,
        messy_url,
    )

    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    canon = ids.select(
        (F.col("doc_id") / 2).cast("long").alias("g"),
        canonicalize_url(messy_url(F.col("doc_id"))).alias("c"),
    )
    per_group = canon.groupBy("g").agg(
        F.count_distinct("c").alias("n_distinct")
    )
    assert per_group.filter(F.col("n_distinct") != 1).count() == 0

    df = registry.QUERIES["corpus_url_canonicalize"](spark, TEST_SF_DIR)
    df.rdd.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Crawl tier: PLD extraction, robots evaluation, frontier scheduling
# ---------------------------------------------------------------------------


def test_registrable_domain_hand_cases(spark):
    """Hosts the generator never emits — including the naive
    'last-two-labels' traps and a no-match host."""
    from pyspark.sql import functions as F

    from history_collector_spark.queries.crawl import registrable_domain

    cases = [
        ("www.x.co.uk", "co.uk", "x.co.uk"),
        ("a.b.c.d.site.com.au", "com.au", "site.com.au"),
        ("user.github.io", "github.io", "user.github.io"),
        ("deep.sub.user.github.io", "github.io", "user.github.io"),
        ("plain.net", "net", "plain.net"),
        ("localhost", None, None),
        ("internal.corp", None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases], "host string")
    suffix, pld = registrable_domain(F.col("host"))
    got = df.select(suffix.alias("s"), pld.alias("p")).collect()
    for (host, ws, wp), r in zip(cases, got):
        assert r["s"] == ws, (host, r["s"], ws)
        assert r["p"] == wp, (host, r["p"], wp)


def test_robots_longest_match_brute_force(spark):
    """Independent pure-Python RFC 9309 evaluator over the same
    generated URLs and rule grid — shares no code with the Spark plan
    OR the closed-form oracle (which derives fates from generator
    arithmetic, not rules)."""
    from collections import defaultdict

    docs = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    rules = {
        f"crawl{k}": [
            ("/private/", 0),
            (f"/a/sec{k}/", 0),
            (f"/a/sec{k}/public/", 1),
        ]
        for k in range(5)
    }
    want = defaultdict(lambda: [0, 0, 0, 0])  # urls, blocked, allowed, default
    for d in docs:
        host = f"crawl{d % 5}"
        shape = d % 4
        sec = (d // 4) % 4
        path = {
            0: f"/a/sec{sec}/doc",
            1: f"/a/sec{sec}/public/doc",
            2: "/private/doc",
            3: "/open/doc",
        }[shape]
        matches = [
            (len(p), allow)
            for p, allow in rules[host]
            if path.startswith(p)
        ]
        w = want[host]
        w[0] += 1
        if not matches:
            w[3] += 1
        elif max(matches)[1]:  # longest wins, length-tie -> allow
            w[2] += 1
        else:
            w[1] += 1

    got = {
        r["host"]: r
        for r in registry.QUERIES["corpus_robots_rules"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for host, w in want.items():
        r = got[host]
        assert (
            r["n_urls"],
            r["n_blocked"],
            r["n_rule_allowed"],
            r["n_default_allowed"],
        ) == tuple(w), host


def test_frontier_invariants(spark):
    """Per-host schedule laws: the budget cap, the makespan identity
    (delay is a host constant), and head = max priority."""
    from history_collector_spark.queries.crawl import _HOST_BUDGET

    rows = registry.QUERIES["crawl_frontier_assign"](
        spark, TEST_SF_DIR
    ).collect()
    assert rows
    for r in rows:
        k = int(r["host"].removeprefix("crawl"))
        delay = 1 + k % 3
        assert r["n_scheduled"] == min(r["n_frontier"], _HOST_BUDGET)
        assert r["makespan_s"] == (r["n_scheduled"] - 1) * delay
        assert 0 <= r["head_priority"] <= 88


def test_crawl_tier_plans_are_udf_free(spark):
    """All three crawl decisions must stay JVM-side — they run per
    DISCOVERED url at 100 TB."""
    for name in (
        "corpus_pld_extract",
        "corpus_robots_rules",
        "crawl_frontier_assign",
    ):
        df = registry.QUERIES[name](spark, TEST_SF_DIR)
        df.rdd.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name



# ---------------------------------------------------------------------------
# Ranking / annotation evaluation
# ---------------------------------------------------------------------------


def test_ndcg_and_mrr_brute_force(spark):
    """Pure-Python recomputation of NDCG@5 / MRR / recall@5 from the
    raw lineitem rows — independent of both engines' window + pivot
    machinery."""
    import math
    from collections import defaultdict

    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_orderpriority"]
        for r in spark.read.parquet(
            f"{TEST_SF_DIR}/orders.parquet"
        ).collect()
    }
    by_q = defaultdict(list)
    for r in li:
        by_q[r["l_orderkey"]].append(r)
    W = [1.0 / math.log2(r + 1) for r in range(1, 6)]

    ndcg_acc = defaultdict(list)
    mrr_acc = defaultdict(list)
    rec_acc = defaultdict(list)
    for qid, rows in by_q.items():
        ranked = sorted(
            rows, key=lambda r: (-r["l_extendedprice"], r["l_linenumber"])
        )
        ideal = sorted(
            rows, key=lambda r: (-r["l_quantity"], r["l_linenumber"])
        )
        dcg = 0.0
        idcg = 0.0
        for i in range(min(5, len(rows))):
            dcg += int(ranked[i]["l_quantity"]) * W[i]
            idcg += int(ideal[i]["l_quantity"]) * W[i]
        prio = orders[qid]
        ndcg_acc[prio].append(dcg / idcg)
        rel = [r["l_quantity"] >= 45 for r in ranked]
        n_rel = sum(rel)
        if n_rel:
            first = rel.index(True) + 1
            mrr_acc[prio].append(1.0 / first)
            rec_acc[prio].append(sum(rel[:5]) / n_rel)
        else:
            mrr_acc[prio].append(0.0)

    got_n = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["eval_ndcg_at_k"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got_n) == set(ndcg_acc)
    for p, vals in ndcg_acc.items():
        r = got_n[p]
        assert r["n_queries"] == len(vals)
        assert abs(r["avg_ndcg5"] - sum(vals) / len(vals)) < 1e-9
        assert abs(r["min_ndcg5"] - min(vals)) < 1e-12
        assert abs(r["max_ndcg5"] - max(vals)) < 1e-12

    got_m = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["eval_mrr_recall_at_k"](
            spark, TEST_SF_DIR
        ).collect()
    }
    for p, vals in mrr_acc.items():
        r = got_m[p]
        assert r["n_queries"] == len(vals)
        assert abs(r["mrr"] - sum(vals) / len(vals)) < 1e-9
        recs = rec_acc[p]
        assert r["n_with_relevant"] == len(recs)
        if recs:
            assert abs(r["avg_recall5"] - sum(recs) / len(recs)) < 1e-9


def test_fleiss_kappa_brute_force_and_properties(spark):
    """Textbook Fleiss computation over the same synthesized panel,
    plus the two boundary laws: kappa == 1 on perfect agreement and
    kappa ~ 0 under independence-at-chance."""
    from collections import Counter, defaultdict

    ev = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    items = defaultdict(list)
    for r in ev:
        items[r["event_id"] // 5].append(
            (r["event_id"] + r["user_id"]) % 4
        )
    items = {i: ls for i, ls in items.items() if len(ls) == 5}
    N, n = len(items), 5
    p_i = []
    totals = Counter()
    for ls in items.values():
        c = Counter(ls)
        totals.update(c)
        p_i.append(
            (sum(v * v for v in c.values()) - n) / (n * (n - 1))
        )
    p_bar = sum(p_i) / N
    p_e = sum((v / (N * n)) ** 2 for v in totals.values())
    want_kappa = (p_bar - p_e) / (1 - p_e)

    row = registry.QUERIES["label_fleiss_kappa"](
        spark, TEST_SF_DIR
    ).collect()[0]
    assert row["n_items"] == N
    assert abs(row["p_bar"] - p_bar) < 1e-12
    assert abs(row["p_e"] - p_e) < 1e-12
    assert abs(row["kappa"] - want_kappa) < 1e-12
    # this synthetic panel is chance-level by construction
    assert abs(row["kappa"]) < 0.05

    # perfect-agreement law on a hand panel, via the same formula
    perfect = [[2] * 5, [0] * 5, [3] * 5]
    s1 = sum(sum(Counter(ls)[j] ** 2 for j in set(ls)) for ls in perfect)
    pb = (s1 - 3 * 5) / (3 * 5 * 4)
    assert pb == 1.0


def test_preference_pair_stats_brute_force(spark):
    from collections import defaultdict

    ev = {
        r["event_id"]: r
        for r in spark.read.parquet(
            f"{TEST_SF_DIR}/events.parquet"
        ).collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0.0, 0])
    for eid, r in ev.items():
        if eid % 2 or eid + 1 not in ev:
            continue
        a, b = r, ev[eid + 1]
        w = want[a["event_type"]]
        m = abs(a["value"] - b["value"])
        w[0] += 1
        w[1] += a["value"] >= b["value"]
        w[2] += a["value"] == b["value"]
        w[3] = max(w[3], m)
        w[4] += m >= 10.0
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["preference_pair_stats"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for t, w in want.items():
        r = got[t]
        assert (
            r["n_pairs"],
            r["n_first_chosen"],
            r["n_ties"],
            r["n_confident"],
        ) == (w[0], w[1], w[2], w[4]), t
        assert r["max_margin"] == w[3]
        assert r["first_chosen_rate"] == w[1] / w[0]



# ---------------------------------------------------------------------------
# WAV / TIFF metadata codecs
# ---------------------------------------------------------------------------


def test_wav_cross_validates_stdlib_both_directions():
    """Our writer must be readable by stdlib wave, and stdlib-written
    files must parse identically here (the tarfile discipline)."""
    import io
    import wave as stdwave

    import numpy as np

    from history_collector_spark.functions.wav import encode_wav, parse_wav

    samples = (np.arange(300, dtype=np.int64) * 97 % 4096 - 2048)
    for ch, rate in ((1, 8000), (2, 44100), (3, 16000)):
        n = len(samples) - len(samples) % ch
        blob = encode_wav(samples[:n], rate, ch)
        with stdwave.open(io.BytesIO(blob)) as w:
            assert w.getnchannels() == ch
            assert w.getframerate() == rate
            assert w.getsampwidth() == 2
            assert w.getnframes() == n // ch
            std_frames = w.readframes(w.getnframes())
        assert std_frames == np.asarray(
            samples[:n], dtype="<i2"
        ).tobytes()

        buf = io.BytesIO()
        with stdwave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(np.asarray(samples[:n], dtype="<i2").tobytes())
        ours = parse_wav(buf.getvalue())
        assert ours["sample_rate"] == rate
        assert ours["n_channels"] == ch
        assert ours["n_frames"] == n // ch
        assert (
            ours["samples"] == np.asarray(samples[:n], dtype="<i2")
        ).all()


def test_wav_error_and_plug_points():
    import struct

    import numpy as np
    import pytest

    from history_collector_spark.functions.codec_errors import (
        AudioDecodeError,
    )
    from history_collector_spark.functions.wav import encode_wav, parse_wav

    good = encode_wav(np.arange(32, dtype=np.int64), 8000, 1)
    # torn magic / form type / missing chunks
    with pytest.raises(AudioDecodeError):
        parse_wav(b"XIFF" + good[4:])
    with pytest.raises(AudioDecodeError):
        parse_wav(good[:8] + b"WAVX" + good[12:])
    with pytest.raises(AudioDecodeError):
        parse_wav(good[:40])
    # still-unplugged compressed tags and 8-bit PCM are plug points
    # (round 11 plugged float/extensible/IMA-ADPCM, round 12 plugged
    # MS-ADPCM and G.711: a PCM16 blob re-tagged as float or MS-ADPCM
    # is now a decode ERROR — those bit widths don't exist there —
    # not a plug point)
    nonpcm = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", nonpcm, fmt_at, 0x55)  # MP3 tag: unplugged
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(nonpcm))
    retagged_ms = bytearray(good)
    struct.pack_into("<H", retagged_ms, fmt_at, 2)
    with pytest.raises(AudioDecodeError):
        parse_wav(bytes(retagged_ms))  # MS ADPCM with 16 bits/sample
    retagged_float = bytearray(good)
    struct.pack_into("<H", retagged_float, fmt_at, 3)
    with pytest.raises(AudioDecodeError):
        parse_wav(bytes(retagged_float))  # float WAVE with 16 bits
    bits8 = bytearray(good)
    struct.pack_into("<H", bits8, fmt_at + 14, 8)
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(bits8))


def test_tiff_roundtrip_matrix_and_ifd_chain():
    """Both byte orders x inline/offset ASCII, plus a hand-built
    two-IFD chain with an unknown tag that must be skipped."""
    import struct

    from history_collector_spark.functions.tiff import (
        encode_tiff_meta,
        parse_tiff_meta,
    )

    for be in (False, True):
        for make in ("abc", "camera5"):  # 4 bytes padded vs offset
            m = parse_tiff_meta(
                encode_tiff_meta(1024, 768, 7, make, big_endian=be)
            )
            assert m["byte_order"] == ("MM" if be else "II")
            assert (m["width"], m["height"]) == (1024, 768)
            assert m["orientation"] == 7
            assert m["make"] == make

    # hand-built: IFD0 (width SHORT + unknown tag type 99) -> IFD1
    bo = "<"
    ifd0_off = 8
    ifd0 = struct.pack(bo + "H", 2)
    ifd0 += struct.pack(bo + "HHI", 256, 3, 1) + struct.pack(bo + "HH", 77, 0)
    ifd0 += struct.pack(bo + "HHI", 555, 99, 1) + b"\x00\x00\x00\x00"
    next_at = ifd0_off + len(ifd0) + 4
    ifd0 += struct.pack(bo + "I", next_at)
    # IFD1 carries a height that must NOT overwrite IFD0's view
    ifd1 = struct.pack(bo + "H", 1)
    ifd1 += struct.pack(bo + "HHI", 257, 3, 1) + struct.pack(bo + "HH", 99, 0)
    ifd1 += struct.pack(bo + "I", 0)
    blob = b"II" + struct.pack(bo + "H", 42) + struct.pack(
        bo + "I", ifd0_off
    ) + ifd0 + ifd1
    m = parse_tiff_meta(blob)
    assert m["width"] == 77
    assert m["height"] is None  # IFD1 is not the primary image
    assert m["orientation"] is None


def test_wav_tiff_queries_are_map_only(spark):
    for name, agg_ok in (
        ("multimodal_audio_wav_ingest", False),
        ("multimodal_exif_tiff_metadata", True),
    ):
        df = registry.QUERIES[name](spark, TEST_SF_DIR)
        df.rdd.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        n_exchanges = plan.count("+- Exchange")
        assert n_exchanges == (1 if agg_ok else 0), (name, plan)


# ---------------------------------------------------------------------------
# Charset sniffing + embedding drift
# ---------------------------------------------------------------------------


def test_utf8_validator_cross_validates_stdlib():
    """The from-scratch RFC 3629 state machine must agree with
    bytes.decode('utf-8') on hand-built edge cases AND arbitrary
    hypothesis byte strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from history_collector_spark.queries.charset import validate_utf8

    def ref(blob: bytes) -> str:
        try:
            s = blob.decode("utf-8")
        except UnicodeDecodeError:
            return "invalid"
        return "utf8" if any(ord(c) > 127 for c in s) else "ascii"

    cases = [
        b"",
        b"plain ascii",
        "héllo".encode("utf-8"),
        "€\U0001f600".encode("utf-8"),  # 3- and 4-byte
        b"\xc0\xaf",  # overlong '/'
        b"\xe0\x80\xaf",  # overlong 3-byte
        b"\xed\xa0\x80",  # surrogate U+D800
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xf5\x80\x80\x80",  # invalid lead
        b"\x80",  # stray continuation
        b"\xc3",  # truncated 2-byte
        b"\xe2\x82",  # truncated 3-byte
        b"\xf0\x9f\x98",  # truncated 4-byte
        b"ok\xc3\xa9tail",
        b"\xe9 ",  # latin-1 e-acute + ascii: the fixture's case
    ]
    for blob in cases:
        assert validate_utf8(blob) == ref(blob), blob

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=40))
    def check(blob):
        assert validate_utf8(blob) == ref(blob), blob

    check()


def test_charset_fixture_covers_all_classes_and_is_exact(spark):
    got = registry.QUERIES["corpus_charset_sniff"](
        spark, TEST_SF_DIR
    ).collect()
    classes = {r["charset"] for r in got}
    assert classes == {
        "ascii", "utf8", "utf8_bom", "utf16le_bom", "utf16be_bom",
        "latin1",
    }
    n = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in got) == n


def test_embedding_drift_psi_brute_force_and_laws(spark):
    """Numpy recomputation per dim + the PSI laws: every term (and so
    the sum) is nonnegative, and identical populations give psi == 0
    exactly (smoothed proportions equal -> ln(1) == 0)."""
    import math

    import numpy as np

    rows = spark.read.parquet(
        f"{TEST_SF_DIR}/embeddings.parquet"
    ).collect()
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    edges = [-0.25, 0.0, 0.25]

    def buckets(vals):
        return np.digitize(vals, edges)

    got = {
        r["dim"]: r
        for r in registry.QUERIES["embedding_drift_psi"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(range(E.shape[1]))
    ref_mask = ids % 2 == 0
    for dim in range(E.shape[1]):
        b = buckets(E[:, dim])
        r_cnt = np.bincount(b[ref_mask], minlength=4)
        c_cnt = np.bincount(b[~ref_mask], minlength=4)
        n_ref, n_cur = ref_mask.sum(), (~ref_mask).sum()
        psi = 0.0
        for k in range(4):
            p = (r_cnt[k] + 1) / (n_ref + 4)
            q = (c_cnt[k] + 1) / (n_cur + 4)
            psi += (p - q) * math.log(p / q)
        row = got[dim]
        assert row["n_ref"] == n_ref and row["n_cur"] == n_cur
        assert abs(row["psi"] - psi) < 1e-12, dim
        assert row["psi"] >= 0.0



# ---------------------------------------------------------------------------
# Feistel epoch shuffle + McNemar paired test
# ---------------------------------------------------------------------------


def _feistel_py(x: int, key: int) -> int:
    left, right = (x >> 16) & 0xFFFF, x & 0xFFFF
    for rnd in range(4):
        f = ((right * 2654435761 + key + rnd * 1013904223) >> 11) & 0xFFFF
        left, right = right, left ^ f
    return (left << 16) | right


def _feistel_py_inverse(y: int, key: int) -> int:
    left, right = (y >> 16) & 0xFFFF, y & 0xFFFF
    for rnd in reversed(range(4)):
        f = ((left * 2654435761 + key + rnd * 1013904223) >> 11) & 0xFFFF
        left, right = right ^ f, left
    return (left << 16) | right


def test_feistel_is_a_bijection_by_invertibility():
    """A Feistel network is invertible by construction; proving
    inverse(permute(x)) == x on arbitrary domain points (and that the
    Spark expression equals the Python model) proves injectivity
    everywhere — the shuffle contract."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from history_collector_spark.queries.epoch_shuffle import _EPOCH_KEYS

    @settings(max_examples=500, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(_EPOCH_KEYS),
    )
    def check(x, key):
        y = _feistel_py(x, key)
        assert 0 <= y < 2**32
        assert _feistel_py_inverse(y, key) == x

    check()


def test_feistel_spark_matches_python_model(spark):
    from pyspark.sql import functions as F

    from history_collector_spark.queries.epoch_shuffle import (
        _EPOCH_KEYS,
        feistel_position,
    )

    ids = list(range(0, 3000, 7)) + [0, 1, 2**31, 2**32 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for key in _EPOCH_KEYS:
        got = [
            r[0]
            for r in df.select(
                feistel_position(F.col("doc_id"), key)
            ).collect()
        ]
        assert got == [_feistel_py(i, key) for i in ids], key


def test_epoch_shuffle_laws(spark):
    """Per epoch: positions are distinct over the corpus (injectivity
    materialized), every doc lands in exactly one shard, and the two
    epochs produce different orders over the same id set."""
    from pyspark.sql import functions as F

    from history_collector_spark.queries.epoch_shuffle import (
        _EPOCH_KEYS,
        feistel_position,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id"
    )
    n = docs.count()
    orders = []
    for key in _EPOCH_KEYS:
        p = docs.select(
            feistel_position(F.col("doc_id"), key).alias("p"),
            "doc_id",
        )
        assert p.select("p").distinct().count() == n
        orders.append(
            tuple(
                r["doc_id"]
                for r in p.orderBy("p").limit(50).collect()
            )
        )
    assert orders[0] != orders[1]

    rows = registry.QUERIES["curation_epoch_shuffle"](
        spark, TEST_SF_DIR
    ).collect()
    for epoch in (0, 1):
        assert sum(r["n_docs"] for r in rows if r["epoch"] == epoch) == n
    # different epoch keys -> different shard orders -> the checksums
    # cannot all coincide
    cks = {
        e: sorted(
            (r["shard"], r["order_checksum"])
            for r in rows
            if r["epoch"] == e
        )
        for e in (0, 1)
    }
    assert cks[0] != cks[1]


def test_mcnemar_brute_force(spark):
    from collections import defaultdict

    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    ).collect()
    by_q = defaultdict(list)
    for r in li:
        by_q[r["l_orderkey"]].append(r)
    cell = defaultdict(int)
    for rows in by_q.values():
        ra = sorted(rows, key=lambda r: (-r["l_extendedprice"],
                                         r["l_linenumber"]))
        rb = sorted(
            rows,
            key=lambda r: (-(r["l_extendedprice"] * (1 - r["l_discount"])),
                           r["l_linenumber"]),
        )
        ha = any(r["l_quantity"] >= 45 for r in ra[:3])
        hb = any(r["l_quantity"] >= 45 for r in rb[:3])
        cell[(ha, hb)] += 1
    got = registry.QUERIES["eval_mcnemar_paired"](
        spark, TEST_SF_DIR
    ).collect()[0]
    assert got["both_hit"] == cell[(True, True)]
    assert got["only_a"] == cell[(True, False)]
    assert got["only_b"] == cell[(False, True)]
    assert got["neither"] == cell[(False, False)]
    b, c = cell[(True, False)], cell[(False, True)]
    want = (b - c) ** 2 / (b + c) if b + c else 0.0
    assert got["mcnemar_chi2"] == want


# ---------------------------------------------------------------------------
# Sitemap XML parser
# ---------------------------------------------------------------------------


def test_sitemap_parser_hand_cases():
    import pytest

    from history_collector_spark.functions.sitemap_xml import (
        SitemapParseError,
        parse_sitemap,
    )

    sm = parse_sitemap(
        '<?xml version="1.0"?><!-- c --><ns:urlset xmlns:ns="x">'
        "<ns:url><ns:loc>https://a/b?x=1&amp;y=2</ns:loc>"
        "<ns:lastmod>2023-05-06T01:02:03Z</ns:lastmod>"
        "<ns:priority>0.85</ns:priority></ns:url>"
        "<ns:url><ns:loc> https://a/c </ns:loc></ns:url>"
        "</ns:urlset>"
    )
    assert sm["kind"] == "urlset"
    assert sm["urls"][0] == {
        "loc": "https://a/b?x=1&y=2",
        "lastmod": "2023-05-06",
        "priority_milli": 850,
    }
    assert sm["urls"][1]["loc"] == "https://a/c"
    assert sm["urls"][1]["priority_milli"] is None

    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    )
    assert idx["kind"] == "index"
    assert idx["children"] == ["https://a/s1.xml", "https://a/s2.xml"]

    for bad in (
        "",  # no root
        "<html><body/></html>",  # wrong root
        "<urlset><url><loc>x</loc>",  # unclosed
        "<urlset><url></url></urlset>",  # url without loc
        "<urlset><sitemap><loc>x</loc></sitemap></urlset>",  # mixed kind
        "<urlset><url><loc>x</loc><priority>1.5</priority></url></urlset>",
        "<urlset><url><loc>x</loc><lastmod>junk</lastmod></url></urlset>",
        "<urlset><url><url></url></url></urlset>",  # nested url
    ):
        with pytest.raises(SitemapParseError):
            parse_sitemap(bad)


def test_sitemap_priority_bounds_and_self_closing():
    from history_collector_spark.functions.sitemap_xml import (
        parse_sitemap,
    )

    sm = parse_sitemap(
        "<urlset><url><loc>u</loc><priority>1.0</priority>"
        "<changefreq/></url></urlset>"
    )
    assert sm["urls"][0]["priority_milli"] == 1000
    sm = parse_sitemap(
        "<urlset><url><loc>u</loc><priority>0</priority></url></urlset>"
    )
    assert sm["urls"][0]["priority_milli"] == 0


# ---------------------------------------------------------------------------
# Streaming frontier
# ---------------------------------------------------------------------------


def test_streaming_frontier_budget_spans_batches(spark):
    """The e2e is only meaningful if some host's budget is consumed
    across MORE than one micro-batch — prove the fixture exercises the
    state carry, and that admissions equal the batch plan per host."""
    from collections import defaultdict

    from history_collector_spark.queries.frontier_stream import (
        _BUDGET,
        _N_FILES,
    )

    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            f"{TEST_SF_DIR}/documents.parquet"
        ).collect()
    )
    mn, mx = ids[0], ids[-1]
    per_host_files = defaultdict(set)
    admitted = defaultdict(int)
    for d in ids:  # arrival order = doc_id by replay construction
        h = d % 17
        if admitted[h] < _BUDGET:
            admitted[h] += 1
            per_host_files[h].add(_N_FILES * (d - mn) // (mx - mn + 1))
    assert any(len(fs) > 1 for fs in per_host_files.values()), (
        "fixture never carries budget state across a batch boundary"
    )
    got = {
        r["host"]: r["n_admitted"]
        for r in registry.QUERIES["streaming_frontier_e2e"](
            spark, TEST_SF_DIR
        ).collect()
    }
    for h, n in admitted.items():
        assert got[f"crawl{h}"] == n, h


def test_crawl_discovery_end_to_end_brute_force(spark):
    """Pure-Python recomputation of the acquisition funnel from raw
    doc_ids — independent of the normalizer, the rules join, and the
    oracle's closed forms."""
    from collections import defaultdict

    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            f"{TEST_SF_DIR}/documents.parquet"
        ).collect()
    )
    groups = defaultdict(int)
    for d in ids:
        groups[d // 2] += 1
    per_host = defaultdict(lambda: [0, 0, 0, []])  # disc, dup, rob, prios
    for g, nvar in groups.items():
        k = g % 5
        w = per_host[k]
        w[0] += nvar
        w[1] += nvar - 1
        if g % 4 == k:
            w[2] += 1
        else:
            w[3].append(g % 89)
    got = {
        r["host"]: r
        for r in registry.QUERIES["crawl_discovery_end_to_end"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == {f"site{k}.example.com" for k in per_host}
    for k, w in per_host.items():
        r = got[f"site{k}.example.com"]
        s = len(w[3])
        fetched = min(s, 40)
        assert r["n_discovered"] == w[0]
        assert r["drop_dup"] == w[1]
        assert r["drop_robots"] == w[2]
        assert r["drop_budget"] == max(s - 40, 0)
        assert r["n_fetched"] == fetched
        assert r["head_priority"] == (max(w[3]) if w[3] else None)
        assert r["makespan_s"] == (
            (fetched - 1) * (1 + k % 3) if fetched else None
        )
        # every URL charged exactly once
        assert (
            r["drop_dup"] + r["drop_robots"] + r["drop_budget"]
            + r["n_fetched"] == r["n_discovered"]
        )


def test_group_sample_bottomk_laws(spark):
    """Exactly k per source (or the whole source if smaller), kept set
    = the k smallest hashes per source, stable under re-evaluation."""
    from collections import defaultdict
    import hashlib

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    want = defaultdict(list)
    for r in docs:
        want[r["source"]].append(
            (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
             r["doc_id"])
        )
    got = defaultdict(list)
    for r in registry.QUERIES["curation_group_sample_bottomk"](
        spark, TEST_SF_DIR
    ).collect():
        got[r["source"]].append((r["h"], r["doc_id"]))
    assert set(got) == set(want)
    for s, pairs in want.items():
        assert sorted(got[s]) == sorted(sorted(pairs)[:8]), s


# ---------------------------------------------------------------------------
# Shapley attribution + syllable complexity
# ---------------------------------------------------------------------------


def test_shapley_attribution_brute_force_and_axioms(spark):
    """Textbook Shapley over the per-user touchsets (itertools
    permutation definition — not the subset-weight form the query
    uses), plus the efficiency axiom."""
    from collections import Counter, defaultdict
    from itertools import permutations

    ev = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").select(
        "user_id", "ts", "event_type"
    ).collect()
    first_p = {}
    for r in ev:
        if r["event_type"] == "purchase":
            u = r["user_id"]
            if u not in first_p or r["ts"] < first_p[u]:
                first_p[u] = r["ts"]
    chans = ["click", "error", "signup", "view"]
    bit = {c: 1 << i for i, c in enumerate(chans)}
    masks = defaultdict(int)
    for r in ev:
        u = r["user_id"]
        if (
            u in first_p
            and r["event_type"] in bit
            and r["ts"] < first_p[u]
        ):
            masks[u] |= bit[r["event_type"]]
    mc = Counter(masks.get(u, 0) for u in first_p)

    def v(S):
        return sum(n for m, n in mc.items() if m & ~S == 0)

    # permutation definition: average marginal over all 4! orders
    acc = Counter()
    for perm in permutations(range(4)):
        S = 0
        for i in perm:
            acc[i] += v(S | (1 << i)) - v(S)
            S |= 1 << i
    got = {
        r["channel"]: r
        for r in registry.QUERIES["events_shapley_attribution"](
            spark, TEST_SF_DIR
        ).collect()
    }
    total = 0.0
    for i, c in enumerate(chans):
        assert got[c]["shapley_num"] == acc[i], c
        assert got[c]["shapley"] == acc[i] / 24
        assert got[c]["attributable_conv"] == v(15) - v(0)
        total += got[c]["shapley"]
    # efficiency: credits sum to the attributable conversions
    assert abs(total - (v(15) - v(0))) < 1e-9


def test_syllable_complexity_brute_force(spark):
    import re
    from collections import defaultdict

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "source", "text"
    ).collect()
    runs = re.compile(r"[aeiouy]+")
    agg = defaultdict(lambda: [0, 0, 0, 0])  # words, syl, complex, max
    for r in docs:
        for w in re.split(r"\s+", r["text"].lower()):
            s = len(runs.findall(w))
            a = agg[r["source"]]
            a[0] += 1
            a[1] += s
            a[2] += s >= 3
            a[3] = max(a[3], s)
    got = {
        r["source"]: r
        for r in registry.QUERIES["text_syllable_complexity"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(agg)
    for s, a in agg.items():
        r = got[s]
        assert (r["n_words"], r["n_syllables"], r["max_word_syllables"]) \
            == (a[0], a[1], a[3]), s
        assert r["avg_syllables_per_word"] == a[1] / a[0]
        assert r["complex_word_pct"] == a[2] / a[0]


# ---------------------------------------------------------------------------
# SFT chat-template packing + win-rate matrix
# ---------------------------------------------------------------------------


def test_chat_template_pack_brute_force(spark):
    from collections import defaultdict

    from history_collector_spark.queries.sft_pack import (
        _CTX_BUDGET,
        _ROLE_OVERHEAD,
        _SYS_OVERHEAD,
        _TURNS_PER_CONV,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    convs = defaultdict(dict)
    for r in docs:
        d = r["doc_id"]
        nt = len(r["text"].split(" ")) + _ROLE_OVERHEAD[d % 2]
        convs[d // _TURNS_PER_CONV][d % _TURNS_PER_CONV] = nt
    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for turns in convs.values():
        cum = _SYS_OVERHEAD
        kept = 0
        kept_tok = _SYS_OVERHEAD
        total = _SYS_OVERHEAD
        for t in sorted(turns):
            cum += turns[t]
            total += turns[t]
            if cum <= _CTX_BUDGET:
                kept += 1
                kept_tok += turns[t]
        w = want[kept]
        w[0] += 1
        w[1] += kept < len(turns)
        w[2] += kept_tok
        w[3] += total - kept_tok
        w[4] = max(w[4], total)
    got = {
        r["n_kept"]: r
        for r in registry.QUERIES["curation_chat_template_pack"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        r = got[k]
        assert (
            r["n_conversations"], r["n_truncated"], r["sum_kept_tokens"],
            r["tokens_dropped"], r["max_total_tokens"],
        ) == tuple(w), k


def test_win_rate_matrix_brute_force_and_antisymmetry(spark):
    from collections import defaultdict

    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    ).collect()
    by_q = defaultdict(list)
    for r in li:
        by_q[r["l_orderkey"]].append(r)
    keys = [
        lambda r: (-r["l_extendedprice"], r["l_linenumber"]),
        lambda r: (-(r["l_extendedprice"] * (1 - r["l_discount"])),
                   r["l_linenumber"]),
        lambda r: (-(r["l_quantity"] * r["l_extendedprice"]),
                   r["l_linenumber"]),
    ]
    hits = []
    for rows in by_q.values():
        hits.append(tuple(
            any(x["l_quantity"] >= 45 for x in sorted(rows, key=k)[:3])
            for k in keys
        ))
    names = ["by_price", "by_discounted", "by_quantity"]
    got = {
        (r["system_a"], r["system_b"]): r
        for r in registry.QUERIES["eval_win_rate_matrix"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert len(got) == 6
    for a in range(3):
        for b in range(3):
            if a == b:
                continue
            wins = sum(h[a] and not h[b] for h in hits)
            losses = sum(not h[a] and h[b] for h in hits)
            ties = sum(h[a] == h[b] for h in hits)
            r = got[(names[a], names[b])]
            assert (r["wins"], r["losses"], r["ties"]) == (
                wins, losses, ties
            )
            # antisymmetry with the transposed cell
            t = got[(names[b], names[a])]
            assert (t["wins"], t["losses"]) == (losses, wins)
            assert t["ties"] == ties
