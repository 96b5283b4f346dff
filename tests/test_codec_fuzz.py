"""Deterministic mutation fuzz over every from-scratch codec.

Real crawls feed the decode stage garbage; the graceful-degradation
contract (decode_status error rows, never task death) holds only if
every decoder either succeeds or raises its DECLARED error class.
This sweep takes one valid fixture per format and applies hundreds of
deterministic byte mutations (flips, truncations, zero-fills,
duplications) — any raw IndexError / struct.error / KeyError /
UnicodeDecodeError / OverflowError escaping a decoder is a latent
task-killer and fails the test. Mutations are seeded, so failures
reproduce exactly.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.functions.codec_errors import ImageDecodeError
from history_collector_spark.functions.jpeg import encode_jpeg, encode_jpeg_cmyk
from history_collector_spark.functions.jpeg_progressive import (
    encode_jpeg_progressive,
)
from history_collector_spark.queries.multimodal import (
    decode_image,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_png_palette,
)
from history_collector_spark.sources.tarball import (
    TarParseError,
    parse_tar,
    write_tar,
)
from history_collector_spark.sources.warc import (
    WarcParseError,
    parse_warc,
    write_warc,
)

_RGB = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
_GRAY = np.arange(64, dtype=np.uint8).reshape(8, 8)


def _mutations(blob: bytes, rng: np.random.Generator, n: int):
    """Yield n deterministic corruptions of blob."""
    b = np.frombuffer(blob, dtype=np.uint8)
    for _ in range(n):
        kind = rng.integers(0, 4)
        m = b.copy()
        if kind == 0 and len(m):  # flip 1-4 bytes
            idx = rng.integers(0, len(m), size=int(rng.integers(1, 5)))
            m[idx] ^= rng.integers(1, 256, size=len(idx)).astype(np.uint8)
            yield m.tobytes()
        elif kind == 1 and len(m) > 1:  # truncate
            yield m[: int(rng.integers(1, len(m)))].tobytes()
        elif kind == 2 and len(m):  # zero-fill a window
            lo = int(rng.integers(0, len(m)))
            hi = min(len(m), lo + int(rng.integers(1, 16)))
            m[lo:hi] = 0
            yield m.tobytes()
        else:  # duplicate a slice (grows the payload)
            lo = int(rng.integers(0, max(len(m), 1)))
            hi = min(len(m), lo + int(rng.integers(1, 32)))
            yield (m[:hi].tobytes() + m[lo:hi].tobytes()
                   + m[hi:].tobytes())


_IMAGE_FIXTURES = {
    "bmp": lambda: encode_bmp(_RGB),
    "ppm": lambda: b"P6\n6 4\n255\n" + _RGB.tobytes(),
    "png": lambda: encode_png(_RGB, row_filters=[0, 1, 2, 4]),
    "png_palette": lambda: encode_png_palette(
        (_GRAY % 4), np.arange(12, dtype=np.uint8).reshape(4, 3),
        trns=[0, 128], depth=2, interlace=1,
    ),
    "gif": lambda: encode_gif(_RGB),
    "jpeg": lambda: encode_jpeg(_RGB),
    "jpeg_gray": lambda: encode_jpeg(_GRAY),
    "jpeg_progressive": lambda: encode_jpeg_progressive(_RGB),
    "jpeg_cmyk": lambda: encode_jpeg_cmyk(
        np.dstack([_RGB, np.full((4, 6, 1), 200, np.uint8)])
    ),
    "webp": lambda: _encode_webp(_RGB),
    "webp_sg": lambda: _encode_webp(_RGB, subtract_green=True),
}


def _encode_webp(px, **kw):
    from history_collector_spark.functions.webp import encode_webp_vp8l

    return encode_webp_vp8l(px, **kw)

# the contract: these (and only these) may escape a decode attempt
_ALLOWED_IMG = (ImageDecodeError, NotImplementedError)


@pytest.mark.parametrize("fmt", sorted(_IMAGE_FIXTURES))
def test_image_codec_fuzz(fmt):
    blob = _IMAGE_FIXTURES[fmt]()
    rng = np.random.default_rng(hash(fmt) % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 250):
        try:
            px = decode_image(mutant)
            assert px.dtype == np.uint8 and px.ndim == 3
            ok += 1
        except _ALLOWED_IMG:
            err += 1
        # anything else propagates and fails the test with the
        # reproducible seed in the parametrized id
    assert ok + err == 250


@pytest.mark.parametrize("kind", ["warc", "warc_gz", "tar"])
def test_container_codec_fuzz(kind):
    recs = [
        {"warc_type": "response", "uri": f"http://x/{i}",
         "date": "2024-01-01", "payload": bytes(range(i * 7 % 250))}
        for i in range(5)
    ]
    if kind == "tar":
        blob = write_tar([(f"d/{i}.bin", r["payload"])
                          for i, r in enumerate(recs)])
        parse, allowed = parse_tar, (TarParseError,)
    else:
        blob = write_warc(recs, gzip_members=(kind == "warc_gz"))
        parse, allowed = parse_warc, (WarcParseError,)
    rng = np.random.default_rng(hash(kind) % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 300):
        try:
            parse(mutant)
            ok += 1
        except allowed:
            err += 1
    assert ok + err == 300


def test_xdr_parser_fuzz():
    """The XDR archive parsers follow the stall-don't-skip contract: a
    corrupt archive must fail LOUDLY but diagnosably — only ValueError
    (the module's declared class) may escape, never a raw struct.error
    or IndexError that would read as an engine bug."""
    from history_collector_spark.sources import xdr_codec as xc

    src, dst, iss = bytes(range(32)), bytes(range(32, 64)), bytes(
        range(64, 96)
    )
    tx = xc.build_transaction(
        src, fee=200, seq_num=42, memo_text="1-anon-t",
        operations=[
            xc.build_operation(
                xc.OP_PAYMENT, dst, 1500,
                asset_code="KIN", asset_issuer=iss,
            ),
            xc.build_operation(xc.OP_CREATE_ACCOUNT, dst, 10000),
        ],
    )
    entry = xc.build_transaction_entry(640, [xc.build_envelope(tx)])
    cases = {
        "tx": (
            xc.frame_record(entry) * 3,
            lambda b: xc.parse_transactions(
                b, with_hash=True, network_passphrase="x"
            ),
        ),
        "ledger": (
            xc.frame_record(xc.build_ledger_entry(640, 1535594286)) * 3,
            xc.parse_ledgers,
        ),
        "result": (
            xc.frame_record(
                xc.build_result_entry(
                    640, [(bytes(range(32)), 100, 0, [(1, 0)])]
                )
            ) * 3,
            xc.parse_results,
        ),
    }
    for name, (blob, fn) in cases.items():
        rng = np.random.default_rng(hash(name) % (2**32))
        ok = err = 0
        for mutant in _mutations(blob, rng, 300):
            try:
                fn(mutant)
                ok += 1
            except ValueError:
                err += 1
        assert ok + err == 300, name


def test_crc_valid_short_ihdr_degrades():
    """Round-10 ADVICE regression: a CRC-VALID IHDR chunk whose body is
    shorter than the mandatory 13 bytes must raise ImageDecodeError,
    not escape as a raw struct.error (which would kill the Spark task
    instead of yielding a decode_status error row)."""
    import struct
    import zlib

    from history_collector_spark.functions.codec_errors import (
        ImageDecodeError,
    )
    from history_collector_spark.queries.multimodal import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    for n in (0, 5, 12, 14):
        blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00" * n)
        with pytest.raises(ImageDecodeError):
            decode_png(blob)


def test_checksum_valid_non_utf8_tar_name_degrades():
    """Round-10 ADVICE regression: a checksum-valid USTAR header whose
    name field is not UTF-8 must raise TarParseError, not a raw
    UnicodeDecodeError."""
    from history_collector_spark.sources.tarball import (
        TarParseError,
        parse_tar,
        write_tar,
    )

    tar = bytearray(write_tar([("a.txt", b"hi")]))
    tar[0:4] = b"\xff\xfe\x80\x81"
    hdr = tar[0:512]
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\x00 "
    tar[0:512] = hdr
    with pytest.raises(TarParseError):
        parse_tar(bytes(tar))


def test_html_extractor_fuzz():
    """The HTML extractor is TOTAL — on any mutated page it must return
    a 4-tuple, never raise (crawl payloads are adversarial; an
    exception kills the task instead of yielding a row)."""
    from history_collector_spark.functions.html_extract import (
        extract_main_text,
    )
    from history_collector_spark.queries.corpus_html import render_page

    page = render_page(7, "srcX", "key agg row scan slow fast " * 20)
    blob = page.encode()
    rng = np.random.default_rng(0xC0FFEE)
    for mutant in _mutations(blob, rng, 400):
        title, text, n_content, n_boiler = extract_main_text(
            mutant.decode("utf-8", "replace")
        )
        assert isinstance(title, str) and isinstance(text, str)
        assert n_content >= 0 and n_boiler >= 0


def test_wav_parser_fuzz():
    import numpy as np

    from history_collector_spark.functions.codec_errors import (
        AudioDecodeError,
    )
    from history_collector_spark.functions.wav import (
        encode_wav,
        encode_wav_extensible,
        encode_wav_float,
        encode_wav_g711,
        encode_wav_ima_adpcm,
        encode_wav_ms_adpcm,
        parse_wav,
    )

    ints = np.arange(192, dtype=np.int64) * 113 % 4096 - 2048
    fixtures = {
        "wav": encode_wav(ints, 16000, 2),
        "wav_float": encode_wav_float(ints / 32767.0, 16000, 2),
        "wav_float64": encode_wav_float(ints / 32767.0, 8000, 1, bits=64),
        "wav_ext": encode_wav_extensible(ints, 44100, 2),
        "wav_adpcm": encode_wav_ima_adpcm(ints[:185], 8000,
                                          block_frames=185),
        "wav_ulaw": encode_wav_g711(ints, 8000, 2, "u"),
        "wav_alaw": encode_wav_g711(ints, 44100, 2, "a"),
        "wav_ms_adpcm": encode_wav_ms_adpcm(ints[:190], 16000,
                                            block_frames=190),
        # round-13 stereo ADPCM arms
        "wav_adpcm_st": encode_wav_ima_adpcm(ints[:178], 8000,
                                             block_frames=89,
                                             n_channels=2),
        "wav_ms_adpcm_st": encode_wav_ms_adpcm(ints[:188], 16000,
                                               block_frames=94,
                                               n_channels=2),
    }
    for name, blob in fixtures.items():
        rng = np.random.default_rng(hash(name) % (2**32))
        ok = err = 0
        for mutant in _mutations(blob, rng, 300):
            try:
                w = parse_wav(mutant)
                assert w["n_frames"] >= 0
                ok += 1
            except (AudioDecodeError, NotImplementedError):
                err += 1
        assert ok + err == 300, name


def test_tiff_parser_fuzz():
    import numpy as np

    from history_collector_spark.functions.tiff import (
        encode_tiff_meta,
        parse_tiff_meta,
    )

    blob = encode_tiff_meta(640, 480, 6, "camera3", big_endian=True)
    rng = np.random.default_rng(hash("tiff") % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 300):
        try:
            parse_tiff_meta(mutant)
            ok += 1
        except (ImageDecodeError, NotImplementedError):
            err += 1
    assert ok + err == 300


def test_sitemap_parser_fuzz():
    import numpy as np

    from history_collector_spark.functions.sitemap_xml import (
        SitemapParseError,
        parse_sitemap,
        render_sitemap,
    )

    blob = render_sitemap(7, "srcX").encode("utf-8")
    rng = np.random.default_rng(hash("sitemap") % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 300):
        try:
            parse_sitemap(mutant.decode("utf-8", "replace"))
            ok += 1
        except SitemapParseError:
            err += 1
    assert ok + err == 300


def test_webp_info_parser_fuzz():
    """parse_webp_info (the VP8/VP8X metadata-grade arm) must degrade
    to ImageDecodeError on any corruption — never IndexError /
    struct.error / OverflowError."""
    from history_collector_spark.functions.webp import parse_webp_info
    from history_collector_spark.queries.multimodal import (
        _vp8_header_only_blob,
        _vp8x_blob,
    )

    for name, blob in (
        ("vp8", _vp8_header_only_blob(640, 480)),
        ("vp8x", _vp8x_blob(1920, 1080, alpha=True)),
        ("vp8l", _encode_webp(_RGB)),
    ):
        rng = np.random.default_rng(hash(name) % (2**32))
        ok = err = 0
        for mutant in _mutations(blob, rng, 250):
            try:
                info = parse_webp_info(mutant)
                assert info["width"] >= 0 and info["height"] >= 0
                assert info["n_frames"] >= 1
                ok += 1
            except ImageDecodeError:
                err += 1
        assert ok + err == 250, name


def test_lz4_frame_fuzz():
    """decode_lz4_frame must degrade to Lz4DecodeError on any
    corruption — never IndexError / struct.error / MemoryError."""
    from history_collector_spark.functions.lz4 import (
        Lz4DecodeError,
        compress_frame,
        decode_lz4_frame,
    )

    payload = (b"crawl shard line one\n" * 40
               + bytes(range(256)) + b"\ntail")
    blob = compress_frame(payload, block_size=256)
    rng = np.random.default_rng(hash("lz4") % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 400):
        try:
            out = decode_lz4_frame(mutant)
            assert isinstance(out, bytes)
            ok += 1
        except Lz4DecodeError:
            err += 1
    assert ok + err == 400
    # checksums make silent corruption nearly impossible: flipped
    # payload bytes must be caught, not returned as wrong data
    assert err > 300, (ok, err)


def test_snappy_frame_fuzz():
    """decode_snappy_frame must degrade to SnappyDecodeError on any
    corruption; the per-chunk CRC32C makes silent corruption rare."""
    from history_collector_spark.functions.snappy import (
        SnappyDecodeError,
        compress_frame,
        decode_snappy_frame,
    )

    payload = (b"shard line with words\n" * 40
               + bytes(range(256)) + b"\ntail")
    blob = compress_frame(payload, chunk_size=300)
    rng = np.random.default_rng(hash("snappy") % (2**32))
    ok = err = 0
    for mutant in _mutations(blob, rng, 400):
        try:
            out = decode_snappy_frame(mutant)
            assert isinstance(out, bytes)
            ok += 1
        except SnappyDecodeError:
            err += 1
    assert ok + err == 400
    assert err > 300, (ok, err)
