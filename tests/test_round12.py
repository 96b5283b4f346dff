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


# ---------------------------------------------------------------------------
# Round-12 build: from-scratch zstd (RFC 8878) decoder
# ---------------------------------------------------------------------------

# Real libzstd output (pyarrow's bundled codec, level 19), pinned so
# the interop contract holds without pyarrow at test time.
_ZSTD_PIN_PLAIN = b"history collector spark: zstd pin. " * 12 + b"tail-of-frame"
_ZSTD_PIN_FRAME = bytes.fromhex(
    "28b52ffd60b100bd010002430b12b0b901777287d26ca7975a63e490bac94204"
    "25dd1a6014245e3f285c27cded02ed2dfe6a8f92a9e36cb5194f0100f333aa7a"
    "02"
)


def test_zstd_pinned_libzstd_frame():
    from history_collector_spark.functions.zstd import decompress

    assert decompress(_ZSTD_PIN_FRAME) == _ZSTD_PIN_PLAIN


def test_xxh64_public_vectors():
    from history_collector_spark.functions.zstd import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B


def test_xxh64_matches_spark_jvm(spark):
    """Cross-check against an independent implementation: Spark's
    xxhash64 hashes BINARY values as raw bytes with seed 42."""
    import random

    from pyspark.sql import functions as F

    from history_collector_spark.functions.zstd import xxh64

    random.seed(3)
    payloads = [b"", b"x", b"hello world", bytes(range(256)),
                bytes(random.randrange(256) for _ in range(1000))]
    for p in payloads:
        got = spark.range(1).select(
            F.xxhash64(F.lit(p)).alias("h")
        ).collect()[0]["h"]
        want = xxh64(p, seed=42)
        # Spark returns a signed 64-bit long
        assert (got & 0xFFFFFFFFFFFFFFFF) == want, p[:16]


def test_zstd_store_mode_roundtrip():
    from history_collector_spark.functions.zstd import (
        compress_store,
        decompress,
    )

    for payload in (b"", b"q", b"corpus " * 999, bytes(range(256)) * 300):
        assert decompress(compress_store(payload)) == payload
        assert decompress(compress_store(payload, checksum=False)) == payload


def test_zstd_store_checksum_detects_corruption():
    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        compress_store,
        decompress,
    )

    blob = bytearray(compress_store(b"all the corpus bytes live here"))
    blob[10] ^= 0x40  # flip a payload bit; frame structure stays valid
    with pytest.raises(ZstdDecodeError):
        decompress(bytes(blob))


def test_zstd_roundtrip_real_encoder_matrix():
    """Decode REAL libzstd frames across compression levels and
    payload shapes — FSE tables, Huffman literals (single and
    4-stream), RLE, repeat modes, multi-block frames."""
    import random

    pytest.importorskip("pyarrow")
    from pyarrow import Codec

    from history_collector_spark.functions.zstd import decompress

    if not Codec.is_available("zstd"):
        pytest.skip("pyarrow built without zstd")
    random.seed(7)
    payloads = [
        b"hello hello hello hello world world world" * 50,
        b"the quick brown fox jumps over the lazy dog. " * 1000,
        bytes(random.randrange(256) for _ in range(5000)),
        b"a" * 100000,
        b"ab" * 70000,
        ("".join(random.choice("abcdefg ")
                 for _ in range(200000))).encode(),
        b"z",
        b"",
    ]
    for lvl in (1, 3, 9, 19):
        c = Codec("zstd", compression_level=lvl)
        for t in payloads:
            assert decompress(c.compress(t, asbytes=True)) == t, (
                lvl, len(t))


def test_zstd_multiblock_window_descriptor():
    """>128 KB inputs span multiple blocks and use the non-single-
    segment header (window descriptor path)."""
    import random

    pytest.importorskip("pyarrow")
    from pyarrow import Codec

    from history_collector_spark.functions.zstd import decompress

    random.seed(11)
    words = ["alpha", "beta", "gamma", "delta", "data", "spark"]
    big = (" ".join(random.choice(words) for _ in range(150000))).encode()
    for lvl in (1, 19):
        blob = Codec("zstd", compression_level=lvl).compress(
            big, asbytes=True)
        assert decompress(blob, max_out=1 << 24) == big


def test_zstd_multiframe_and_skippable():
    pytest.importorskip("pyarrow")
    from pyarrow import Codec

    from history_collector_spark.functions.zstd import decompress

    f1 = Codec("zstd").compress(b"first frame ", asbytes=True)
    f2 = Codec("zstd").compress(b"second frame", asbytes=True)
    skip = ((0x184D2A53).to_bytes(4, "little")
            + (5).to_bytes(4, "little") + b"JUNK!")
    assert decompress(f1 + skip + f2) == b"first frame second frame"


def test_zstd_fuzz_total():
    """Truncations and byte flips raise ZstdDecodeError or decode to
    something — never IndexError/KeyError/struct.error."""
    import random

    pytest.importorskip("pyarrow")
    from pyarrow import Codec

    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        decompress,
    )

    random.seed(5)
    base = (b"zstd fuzz target payload " * 2000)
    blob = Codec("zstd", compression_level=3).compress(base, asbytes=True)
    for cut in range(0, len(blob), 53):
        try:
            decompress(blob[:cut])
        except ZstdDecodeError:
            pass
    for _ in range(300):
        b = bytearray(blob)
        pos = random.randrange(len(b))
        b[pos] ^= 1 << random.randrange(8)
        try:
            decompress(bytes(b), max_out=1 << 24)
        except ZstdDecodeError:
            pass


def test_zstd_guards():
    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        compress_store,
        decompress,
    )

    with pytest.raises(ZstdDecodeError):
        decompress(b"")
    with pytest.raises(ZstdDecodeError):
        decompress(b"\x00\x01\x02\x03junkjunk")
    # decompression-bomb guard: output larger than max_out refuses
    blob = compress_store(b"y" * 100000)
    with pytest.raises(ZstdDecodeError):
        decompress(blob, max_out=1000)


def test_zstd_fixture_torn_shard_always_raises(spark):
    import shutil

    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        decompress,
    )
    from history_collector_spark.queries.corpus_io import (
        _fixture_dir,
        _write_zstd_fixture,
    )

    stale = _fixture_dir("/root/testdata/sf0.001", "zstdjsonl")
    shutil.rmtree(stale, ignore_errors=True)
    out = _write_zstd_fixture(spark, "/root/testdata/sf0.001")
    blob = open(os.path.join(out, "docs000.jsonl.zst"), "rb").read()
    with pytest.raises(ZstdDecodeError):
        decompress(blob)
