"""Round-11 pinned tests: the outlink/anchor extractor, URL reference
resolution, and the messy-URL Python/Catalyst twin behind the rebased
crawl-discovery e2e."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from history_collector_spark import registry
from history_collector_spark.functions.html_extract import (
    escape_html,
    extract_links,
    resolve_url,
)

registry.load_all()


# ---------------------------------------------------------------------------
# resolve_url: RFC 3986-lite reference resolution
# ---------------------------------------------------------------------------


def test_resolve_url_cases():
    base = "http://h.example/a/b/c?q=1#frag"
    cases = {
        "https://x.example/p?a=1#s": "https://x.example/p?a=1",
        "//cdn.example/lib.js": "http://cdn.example/lib.js",
        "/root/path": "http://h.example/root/path",
        "d": "http://h.example/a/b/d",
        "./d": "http://h.example/a/b/d",
        "../d": "http://h.example/a/d",
        "../../../d": "http://h.example/d",
        "sub/": "http://h.example/a/b/sub/",
        "?x=2": "http://h.example/a/b/c?x=2",
        "#top": "http://h.example/a/b/c?q=1",
        "mailto:x@y.example": "",
        "javascript:void(0)": "",
        "tel:+1555": "",
        "data:text/plain,hi": "",
    }
    for href, want in cases.items():
        assert resolve_url(base, href) == want, (href, want)


def test_resolve_url_total_on_garbage():
    for base in ("", "not a url", "http://", "http://h"):
        for href in ("", "x", "/x", "//", "..", "%%%", "\x00"):
            resolve_url(base, href)  # must not raise


# ---------------------------------------------------------------------------
# extract_links: document order, entity decode, suppression rules
# ---------------------------------------------------------------------------


def test_extract_links_order_and_suppression():
    html = (
        "<html><head><title>t</title>"
        "<script>var s = '<a href=\"/script-fake\">x</a>';</script>"
        "<style>a > b { color: red }</style></head><body>"
        "<!-- <a href='/commented'>no</a> -->"
        '<p><a href="/one?x=1&amp;y=2">first &amp; best</a></p>'
        "<p><a href='two'>second</a></p>"
        '<a href="">empty</a>'
        "<a>no href</a>"
        '<a href="mailto:x@y">mail</a>'
        "</body></html>"
    )
    got = extract_links(html, "http://h.example/dir/page")
    assert got == [
        ("http://h.example/one?x=1&y=2", "first & best"),
        ("http://h.example/dir/two", "second"),
    ]


def test_extract_links_nested_anchor_implicit_close():
    # HTML5 forbids nested <a>: a new open implicitly closes the prior
    html = '<a href="/a">one <a href="/b">two</a> tail</a>'
    got = extract_links(html, "http://h.example/")
    assert got == [
        ("http://h.example/a", "one"),
        ("http://h.example/b", "two"),
    ]


def test_extract_links_quoted_gt_and_blocks():
    html = (
        '<a href="/s?q=x>y">before<div>after</div></a>'
        "<a href='/p' target='_blank' rel=nofollow>z</a>"
    )
    got = extract_links(html, "http://h.example/")
    assert got == [
        ("http://h.example/s?q=x>y", "before after"),
        ("http://h.example/p", "z"),
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet="abcdefghij-_/", min_size=1, max_size=12
            ).filter(lambda s: not s.startswith("/") and ".." not in s),
            st.text(
                alphabet="abc &<>xyz", min_size=0, max_size=16
            ),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_extract_links_roundtrip_property(links):
    """Render n links with entity-escaped hrefs/anchors, extract, and
    require the exact ordered list back (hrefs resolved against a
    fixed base)."""
    html = "<html><body>" + "".join(
        f'<p><a href="{escape_html(h)}">{escape_html(t)}</a></p>'
        for h, t in links
    ) + "</body></html>"
    got = extract_links(html, "http://b.example/d/page")
    want = []
    for h, t in links:
        want.append(
            (resolve_url("http://b.example/d/page", h), " ".join(t.split()))
        )
    assert got == want


def test_extract_links_total_on_mutations():
    """Fuzz: truncations and splices of a real page never raise."""
    base = (
        '<html><body><a href="/a">x</a><script>"</a>"</script>'
        '<a href="/b" title="q>r">y</a><!-- <a --></body></html>'
    )
    for i in range(0, len(base), 7):
        extract_links(base[:i], "http://h.example/")
        extract_links(base[i:], "http://h.example/")
        extract_links(base[:i] + "<" + base[i:], "http://h.example/")
        extract_links(base[:i] + '"' + base[i:], "http://h.example/")


# ---------------------------------------------------------------------------
# messy_url twin: the Python render-side generator behind the rebased
# discovery e2e must equal the Catalyst expression form bit-for-bit
# ---------------------------------------------------------------------------


def test_messy_url_python_twin_matches_expression(spark):
    from pyspark.sql import functions as F

    from history_collector_spark.queries.crawl import messy_url_py
    from history_collector_spark.queries.urls import messy_url

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), messy_url(F.col("id")).alias("u")
    )
    for r in df.collect():
        assert messy_url_py(r["doc_id"]) == r["u"], r["doc_id"]


def test_discovery_links_are_exactly_the_messy_urls(spark):
    """The in-kernel page render + extractor must emit EXACTLY one URL
    per doc_id: the messy URL, fragment-stripped (the crawler fetches
    resources, not anchors) — no script/comment/mailto leakage."""
    from tests.conftest import TEST_SF_DIR

    from history_collector_spark.queries.crawl import (
        _discovery_link_batches,
        messy_url_py,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id"
    )
    got = {
        (r["doc_id"], r["url"])
        for r in docs.mapInPandas(
            _discovery_link_batches, schema="doc_id bigint, url string"
        ).collect()
    }
    want = {
        (r["doc_id"], messy_url_py(r["doc_id"]).split("#", 1)[0])
        for r in docs.collect()
    }
    assert got == want


def test_outlinks_ordinals_contiguous(spark, duck):
    """corpus_html_outlinks: per-page ordinals are 0..n-1 with no gaps
    and in document order (nav block first, footer last)."""
    from tests.conftest import TEST_SF_DIR

    rows = registry.QUERIES["corpus_html_outlinks"](
        spark, TEST_SF_DIR
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["ord"])
        assert [r["ord"] for r in rs] == list(range(len(rs)))
        assert rs[0]["anchor"] == "nav0"
        assert rs[-1]["anchor"] == "privacy"
        assert rs[-2]["anchor"] == "terms"


# ---------------------------------------------------------------------------
# WebP VP8L spec fixes (round-11 ADVICE items): the literal 120-entry
# LZ77 distance table, the rightmost-column TR predictor pixel, and
# out-of-range palette indices decoding as transparent black.
# ---------------------------------------------------------------------------

# The spec's plane-code byte table (public constant; also libwebp's
# kCodeToPlaneCodes): y = v >> 4, x = 8 - (v & 0xF). Pinning all 120
# entries guards the whole distance map, including codes 97-120 that
# the hand-built decode-path tests never exercise.
_PLANE_CODES = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
)


def test_vp8l_distance_map_all_120_entries():
    from history_collector_spark.functions.webp import _DIST_MAP

    want = [(8 - (v & 0xF), v >> 4) for v in _PLANE_CODES]
    assert len(_DIST_MAP) == 120
    assert list(_DIST_MAP) == want


def test_vp8l_predictor_tr_rightmost_column():
    """Predictor mode 3 (TR) at the rightmost column must use the
    flat-buffer wraparound pixel px[i - xsize + 1] — the CURRENT row's
    leftmost pixel — not a clamp to T."""
    from history_collector_spark.functions import webp as W
    from tests.test_round10_waves import (
        _emit_literal,
        _literal_codes,
        _vp8l_header,
        _vp8l_wrap,
    )

    bw = W._BitWriter()
    _vp8l_header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(W._PREDICTOR_TRANSFORM, 2)
    bw.write(2, 3)  # bits = 4 => one block covers the 2x2 image
    bw.write(0, 1)  # sub-image: no cache
    codes = _literal_codes(bw, greens=[3], reds=[0], blues=[0], alphas=[0])
    _emit_literal(bw, codes, 0x00000300)  # mode 3 = TR
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache (main)
    bw.write(0, 1)  # no meta
    # (0,0) pred=black -> FF101010; (0,1) pred=L; (1,0) pred=T;
    # (1,1) mode 3: TR = px[3-2+1] = px[2] = (1,0) = FF404040
    # (wraparound), NOT T = px[1] = FF202020
    residuals = [0x00101010, 0x00101010, 0x00303030, 0x00010101]
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
    assert got == [0xFF101010, 0xFF202020, 0xFF404040, 0xFF414141]


def test_vp8l_palette_out_of_range_is_transparent_black():
    from history_collector_spark.functions.webp import _apply_color_index

    palette = [0xFF111111, 0xFF222222]
    # width_bits=0: one index per pixel in the green channel
    packed = [(0 << 8), (1 << 8), (5 << 8)]
    out = _apply_color_index(packed, 3, 1, palette, 0)
    assert out == [0xFF111111, 0xFF222222, 0x00000000]
    # packed sub-byte path (width_bits=2 -> 4 indices per byte)
    g = 0b11100100  # indices 0,1,2,3 for x=0..3
    out = _apply_color_index([(g << 8)], 4, 1, palette, 2)
    assert out == [0xFF111111, 0xFF222222, 0x00000000, 0x00000000]


def test_parse_webp_info_fields():
    from history_collector_spark.functions.webp import (
        encode_webp_vp8l,
        parse_webp_info,
    )
    from history_collector_spark.queries.multimodal import (
        _vp8_header_only_blob,
        _vp8x_blob,
    )
    import numpy as np

    i = parse_webp_info(_vp8_header_only_blob(640, 480))
    assert (i["kind"], i["width"], i["height"]) == ("vp8", 640, 480)
    assert not i["has_alpha"] and not i["has_anim"] and i["n_frames"] == 1

    i = parse_webp_info(_vp8x_blob(1920, 1080, alpha=True))
    assert (i["kind"], i["width"], i["height"]) == ("vp8x", 1920, 1080)
    assert i["has_alpha"] and i["has_anim"] and i["n_frames"] == 2

    px = np.zeros((3, 5, 4), dtype=np.uint8)
    px[:, :, 3] = 200  # non-opaque alpha
    i = parse_webp_info(encode_webp_vp8l(px))
    assert (i["kind"], i["width"], i["height"]) == ("vp8l", 5, 3)


def test_decode_blob_lossy_webp_and_vp8x():
    # round 12: lossy VP8 decodes to real pixels ('ok'); round 13:
    # animated containers decode to first-canvas pixels with the true
    # ANMF frame count — both with real pinned libwebp payloads and
    # with header-only sub-streams (whose empty partitions decode as
    # all-default frames per the RFC 6386 bool-decoder past-end rule)
    from history_collector_spark.queries.multimodal import (
        _vp8_lossy_blob,
        _vp8x_blob,
        decode_blob,
    )

    meta = decode_blob(_vp8_lossy_blob(5, 3))
    assert meta == {
        "width": 5, "height": 3, "n_frames": 1,
        "decode_status": "ok",
    }
    meta = decode_blob(_vp8x_blob(5, 3, alpha=True, real=True))
    assert meta == {
        "width": 5, "height": 3, "n_frames": 2,
        "decode_status": "ok",
    }
    meta = decode_blob(_vp8x_blob(40, 30, alpha=True))
    assert meta == {
        "width": 40, "height": 30, "n_frames": 2,
        "decode_status": "ok",
    }


# ---------------------------------------------------------------------------
# WAV format arms (round 11: float / extensible / IMA ADPCM join the
# PCM16-only round-10 reader)
# ---------------------------------------------------------------------------


def test_wav_float_roundtrip_exact_for_scaled_integers():
    import numpy as np

    from history_collector_spark.functions.wav import (
        encode_wav_float,
        parse_wav,
    )

    ints = (np.arange(500, dtype=np.int64) * 613) % 65536 - 32768
    for bits in (32, 64):
        w = parse_wav(encode_wav_float(ints / 32767.0, 22050, 1, bits=bits))
        assert w["codec"] == f"float{bits}"
        # the int16 normalization scale is 32767: -32768/32767 < -1.0
        # clips to -1.0 -> -32767; every |i| <= 32767 is exact
        want = np.maximum(ints, -32767)
        assert (w["samples"] == want).all()


def test_wav_extensible_dispatches_subformat():
    import numpy as np
    import pytest

    from history_collector_spark.functions.codec_errors import (
        AudioDecodeError,
    )
    from history_collector_spark.functions.wav import (
        encode_wav_extensible,
        parse_wav,
    )

    ints = np.arange(64, dtype=np.int64) - 32
    blob = encode_wav_extensible(ints, 48000, 2)
    w = parse_wav(blob)
    assert w["codec"] == "pcm16" and w["n_channels"] == 2
    assert (w["samples"] == ints.astype(np.int16)).all()
    # corrupt GUID tail must be a decode error, not a silent PCM read
    bad = bytearray(blob)
    i = blob.index(b"fmt ") + 8 + 26
    bad[i + 5] ^= 0xFF
    with pytest.raises(AudioDecodeError):
        parse_wav(bytes(bad))


def test_wav_ima_adpcm_constant_exact_and_snr():
    import numpy as np

    from history_collector_spark.functions.wav import (
        encode_wav_ima_adpcm,
        parse_wav,
    )

    # constant signal: zero nibbles at step index 0 reconstruct exactly
    const = np.full(505 * 2, -1234, dtype=np.int64)
    w = parse_wav(encode_wav_ima_adpcm(const, 8000))
    assert w["codec"] == "ima_adpcm"
    assert w["n_frames"] == 505 * 2 and (w["samples"] == -1234).all()
    # varying signal: lossy, but must track within a sane SNR
    t = np.arange(505 * 4)
    sig = (3000 * np.sin(t / 20)).astype(np.int64)
    w = parse_wav(encode_wav_ima_adpcm(sig, 8000))
    err = w["samples"].astype(np.float64) - sig[: len(w["samples"])]
    snr = 10 * np.log10(
        (sig[: len(w["samples"])].astype(np.float64) ** 2).mean()
        / (err**2).mean()
    )
    assert snr > 30.0, snr


def test_wav_adpcm_decode_pinned_block():
    """Hand-computed block: seed 100 at step index 0, nibble 0x1
    (diff = 7>>3 + 7>>2 = 1, index -1 -> clamped 0) then 0x9
    (diff = -1), then six zero nibbles (diff = 7>>3 = 0)."""
    import struct

    from history_collector_spark.functions.wav import _decode_ima_adpcm

    block = (
        struct.pack("<hBB", 100, 0, 0)
        + bytes([0x1 | (0x9 << 4)])
        + bytes(3)
    )
    assert _decode_ima_adpcm(block, 8) == [100, 101, 100] + [100] * 6


def test_parse_webp_info_animated_vp8x_counts_frames():
    """ANIM-flagged VP8X with two ANMF frames: has_anim, n_frames=2,
    canvas dims from the 24-bit fields."""
    from history_collector_spark.functions.webp import parse_webp_info

    flags = (0x10 | 0x02).to_bytes(1, "big")  # alpha + animation
    vp8x = (
        b"VP8X" + (10).to_bytes(4, "little")
        + flags + b"\x00\x00\x00"
        + (320 - 1).to_bytes(3, "little") + (240 - 1).to_bytes(3, "little")
    )
    anim = b"ANIM" + (6).to_bytes(4, "little") + bytes(6)
    anmf_body = bytes(16) + b"fill"  # frame header + payload stub
    anmf = b"ANMF" + len(anmf_body).to_bytes(4, "little") + anmf_body
    chunks = vp8x + anim + anmf + anmf
    blob = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks
    i = parse_webp_info(blob)
    assert i == {
        "kind": "vp8x", "width": 320, "height": 240,
        "has_alpha": True, "has_anim": True, "n_frames": 2,
    }


# ---------------------------------------------------------------------------
# LZ4 + xxHash32 (round 11 from-scratch codec pair)
# ---------------------------------------------------------------------------


def test_xxh32_public_vectors():
    from history_collector_spark.functions.lz4 import xxh32

    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert xxh32(b"abc", seed=1) != xxh32(b"abc")


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lz4_block_and_frame_roundtrip(data):
    from history_collector_spark.functions.lz4 import (
        compress_block,
        compress_frame,
        decode_lz4_frame,
        decompress_block,
    )

    assert decompress_block(compress_block(data)) == data
    assert decode_lz4_frame(compress_frame(data, block_size=512)) == data


def test_lz4_compresses_repetitive_input():
    from history_collector_spark.functions.lz4 import (
        compress_frame,
        decode_lz4_frame,
    )

    data = b"the quick brown fox jumps over the lazy dog " * 200
    blob = compress_frame(data)
    assert len(blob) < len(data) // 10
    assert decode_lz4_frame(blob) == data


def test_lz4_content_checksum_catches_block_swap():
    """Two valid compressed blocks swapped in place re-frame to a
    structurally valid stream; the content checksum must catch it."""
    import struct

    import pytest

    from history_collector_spark.functions.lz4 import (
        Lz4DecodeError,
        compress_block,
        decode_lz4_frame,
        xxh32,
    )

    b1 = compress_block(b"A" * 300)
    b2 = compress_block(b"B" * 300)
    desc = bytes([0x40 | 0x20 | 0x04, 0x40])
    hc = (xxh32(desc) >> 8) & 0xFF
    def frame(x, y):
        return (struct.pack("<I", 0x184D2204) + desc + bytes([hc])
                + struct.pack("<I", len(x)) + x
                + struct.pack("<I", len(y)) + y
                + struct.pack("<I", 0)
                + struct.pack("<I", xxh32(b"A" * 300 + b"B" * 300)))
    assert decode_lz4_frame(frame(b1, b2)) == b"A" * 300 + b"B" * 300
    with pytest.raises(Lz4DecodeError):
        decode_lz4_frame(frame(b2, b1))


# ---------------------------------------------------------------------------
# Markdown cleaning kernel (round 11)
# ---------------------------------------------------------------------------


def test_markdown_roundtrip_exact():
    from history_collector_spark.functions.markdown import (
        markdown_to_text,
        render_markdown,
    )

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch stream spark dup " * 9).strip()
    for d in (0, 1, 7, 12):
        r = markdown_to_text(render_markdown(d, text))
        assert r["title"] == f"Doc {d}"
        assert r["text"] == text, d
        n = len(text.split(" "))
        assert r["n_links"] == (n + 10) // 11
        assert r["n_code_blocks"] == 1 + d % 2


def test_markdown_constructs():
    from history_collector_spark.functions.markdown import markdown_to_text

    md = (
        "# Title here\n\n"
        "plain *em* **bold** `code` [anchor](http://x.example/p)\n\n"
        "## Later heading\n\n"
        "- item one\n"
        "2. item two\n"
        "> quoted text\n\n"
        "![alt words](http://x.example/img.png)\n\n"
        "```\nfenced *not em* [not](a-link)\n```\n"
    )
    r = markdown_to_text(md)
    assert r["title"] == "Title here"
    assert r["text"] == (
        "plain em bold code anchor Later heading item one item two "
        "quoted text alt words"
    )
    assert r["n_links"] == 1 and r["n_images"] == 1
    assert r["n_code_blocks"] == 1
    assert r["n_headings"] == 2 and r["n_list_items"] == 2


def test_markdown_total_on_garbage():
    from history_collector_spark.functions.markdown import markdown_to_text

    for s in ("", "```", "```\nunclosed", "[", "![](", "*`_", "#"*10,
              "> > >", "- \n1. \n", "\x00*a*"):
        markdown_to_text(s)  # must not raise


def test_markdown_intraword_underscores_survive():
    """CommonMark: intraword underscores do not open emphasis —
    snake_case identifiers must survive cleaning untouched."""
    from history_collector_spark.functions.markdown import markdown_to_text

    r = markdown_to_text("use snake_case names and _real emphasis_ here")
    assert r["text"] == "use snake_case names and real emphasis here"


# ---------------------------------------------------------------------------
# Snappy + CRC32C (round 11 from-scratch codec pair)
# ---------------------------------------------------------------------------


def test_crc32c_public_vectors():
    from history_collector_spark.functions.snappy import crc32c

    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_snappy_block_and_frame_roundtrip(data):
    from history_collector_spark.functions.snappy import (
        compress_block,
        compress_frame,
        decode_snappy_frame,
        decompress_block,
    )

    assert decompress_block(compress_block(data)) == data
    assert decode_snappy_frame(compress_frame(data, chunk_size=600)) == data


def test_snappy_preamble_length_enforced():
    import pytest

    from history_collector_spark.functions.snappy import (
        SnappyDecodeError,
        compress_block,
        decompress_block,
    )

    blk = bytearray(compress_block(b"abcdefgh"))
    blk[0] += 1  # declare one more byte than the stream produces
    with pytest.raises(SnappyDecodeError):
        decompress_block(bytes(blk))


def test_snappy_copy1_and_copy4_decode_paths():
    """The greedy encoder only emits copy-2 elements, so the tag-01
    (1-byte offset, 3-bit length) and tag-11 (4-byte offset) decode
    paths get hand-built blocks: literals 'abcd' then a copy of them
    via each tag form."""
    import struct

    from history_collector_spark.functions.snappy import (
        _emit_varint,
        decompress_block,
    )

    # copy-1: length=4 -> ((4-4)<<2)|01 tag bits, offset 4 (high 3
    # bits in tag bits 5-7 are 0, low 8 bits in the next byte)
    blk = _emit_varint(8) + bytes([(4 - 1) << 2]) + b"abcd" \
        + bytes([0b000_000_01, 4])
    assert decompress_block(blk) == b"abcdabcd"

    # copy-4: length-1 in high 6 bits, 4-byte LE offset
    blk = _emit_varint(8) + bytes([(4 - 1) << 2]) + b"abcd" \
        + bytes([((4 - 1) << 2) | 3]) + struct.pack("<I", 4)
    assert decompress_block(blk) == b"abcdabcd"

    # copy-1 with overlap (offset < length): run-length expansion
    blk = _emit_varint(7) + bytes([(1 - 1) << 2]) + b"x" \
        + bytes([((6 - 4) << 2) | 0b001, 1])
    assert decompress_block(blk) == b"x" * 7
