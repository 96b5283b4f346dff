"""Round-14 additions: the driver-canonicalizer output contract
(scalar-only results), the quantized-Lloyd kmeans lockstep, the CRC-bit
and RIFF-clamp MP3 hardening, and the map-only compression-quality
rewrite's row-local equivalence."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


# ---------------------------------------------------------------------------
# MP3: CRC-protected frames shift the Xing/Info tag by the 2-byte CRC
# (ADVICE r13: fixtures never emitted CRC, so the offset bug was
# invisible to every earlier test).
# ---------------------------------------------------------------------------


def test_mp3_crc_protected_xing_detected():
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
    )

    for mono in (False, True):
        for src in ("xing", "info"):
            blob = build_mp3(9, 128, 44100, mono=mono, vbr_header=src,
                             crc_protect=True)
            i = parse_mp3_info(blob)
            assert i["vbr_source"] == src, (mono, src, i["vbr_source"])
            assert i["vbr_frames"] == 9 and i["n_frames"] == 10
            # the unprotected twin parses identically
            j = parse_mp3_info(
                build_mp3(9, 128, 44100, mono=mono, vbr_header=src)
            )
            assert (j["vbr_source"], j["vbr_frames"]) == (src, 9)


def test_mp3_crc_bit_does_not_false_positive():
    """A CRC-protected frame WITHOUT a VBR tag must stay 'none' — the
    +2 offset must not read garbage as a tag."""
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
    )

    i = parse_mp3_info(build_mp3(5, crc_protect=True))
    assert i["vbr_source"] == "none" and i["vbr_frames"] is None


def test_riff_mp3_declared_size_clamps_chunks():
    """A data chunk extending past the DECLARED RIFF size is truncated
    even when the file physically carries the bytes (ADVICE r13: the
    old reader sliced from the full buffer and honored out-of-container
    payloads)."""
    import struct

    from history_collector_spark.functions.codec_errors import (
        AudioDecodeError,
    )
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
        wrap_mp3_in_wav,
    )

    raw = build_mp3(6)
    wrapped = bytearray(wrap_mp3_in_wav(raw))
    # shrink the declared RIFF size by 10 bytes: the data chunk now
    # pokes past the container end while the bytes still exist on disk
    (declared,) = struct.unpack("<I", wrapped[4:8])
    wrapped[4:8] = struct.pack("<I", declared - 10)
    with pytest.raises(AudioDecodeError, match="truncated RIFF chunk"):
        parse_mp3_info(bytes(wrapped))
    # untampered wrapper still parses
    assert parse_mp3_info(wrap_mp3_in_wav(raw))["n_frames"] == 6


# ---------------------------------------------------------------------------
# Quantized-Lloyd kmeans: the fixed-point sufficient statistics that
# make the distributed reduction bitwise-reproducible (and thereby
# oracle-able) must themselves be exact.
# ---------------------------------------------------------------------------


def test_kmeans_train_history_shape_and_determinism(spark):
    rows = registry.QUERIES["cluster_kmeans_train"](
        spark, TEST_SF_DIR
    ).collect()
    from history_collector_spark.queries.clustering import (
        _KM_MAX_ITER,
        _KM_TRAIN_KS,
    )

    by_k: dict[int, list] = {}
    for r in rows:
        by_k.setdefault(r["k"], []).append(r)
    assert sorted(by_k) == sorted(_KM_TRAIN_KS)
    for k, hist in by_k.items():
        assert len(hist) <= _KM_MAX_ITER
        # convergence contract: only the LAST row may have shift2 == 0
        for r in hist[:-1]:
            assert r["shift2"] > 0.0
        # wss/shift2 are exact multiples of the fixed-point quantum
        for r in hist:
            assert r["wss"] >= 0 and r["n_empty"] >= 0


def test_kmeans_train_oracle_is_bit_exact(spark):
    """The DuckDB recursive CTE replays the training trajectory with
    BIT-equal floats — stronger than the round-6 hash discipline, and
    the property that justifies calling this a lockstep oracle."""
    import duckdb

    sdf = (
        registry.QUERIES["cluster_kmeans_train"](spark, TEST_SF_DIR)
        .toPandas()
        .sort_values(["k", "iter"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{TEST_SF_DIR}/embeddings.parquet'"
    )
    odf = (
        con.sql(registry.ORACLES["cluster_kmeans_train"])
        .df()
        .sort_values(["k", "iter"])
        .reset_index(drop=True)
    )
    assert len(sdf) == len(odf)
    for col in ("k", "iter", "n_empty"):
        assert (sdf[col].to_numpy() == odf[col].to_numpy()).all(), col
    for col in ("wss", "shift2"):
        a, b = sdf[col].to_numpy(), odf[col].to_numpy()
        assert (a == b).all(), (col, np.abs(a - b).max())


# ---------------------------------------------------------------------------
# Compression-quality rewrite: the row-local distinct-shingle count
# must equal the old explode+countDistinct plan's integers exactly.
# ---------------------------------------------------------------------------


def test_compression_quality_rowlocal_equals_explode_plan(spark):
    import pyspark.sql.functions as F

    from history_collector_spark.queries.text import _CQ_K

    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") >= _CQ_K)
        .limit(200)
    )
    rowlocal = docs.select(
        "doc_id",
        F.expr(
            f"size(array_distinct(transform(sequence(1, length(text) - {_CQ_K - 1}),"
            f" p -> substring(text, p, {_CQ_K}))))"
        ).alias("dd"),
    )
    exploded = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {_CQ_K - 1}),"
                    f" p -> substring(text, p, {_CQ_K}))"
                )
            ).alias("sh"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("dd2"))
    )
    diff = (
        rowlocal.join(exploded, "doc_id")
        .filter(F.col("dd") != F.col("dd2"))
        .count()
    )
    assert diff == 0


# ---------------------------------------------------------------------------
# Driver-canonicalizer contract: parity mode must REJECT list-valued
# columns (the round-13 embedding_quantize driver-red class) instead of
# silently tuple-izing them green.
# ---------------------------------------------------------------------------


def test_parity_mode_rejects_list_columns():
    import pandas as pd

    from tests.oracle_compare import assert_frames_match

    df = pd.DataFrame({"id": [1, 2], "v": [[1, 2], [3, 4]]})
    with pytest.raises(AssertionError, match="list/dict-valued"):
        assert_frames_match(df, df.copy(), name="x", mode="parity")
    # tolerance mode keeps the tuple-izing diagnostic behavior
    assert_frames_match(df, df.copy(), name="x", mode="tolerance")


# ---------------------------------------------------------------------------
# ALPH preprocessed-levels (pre=1): the flag records encoder-side level
# quantization; the DEFAULT libwebp decode path returns the plane as
# stored (WebPDequantizeLevels only runs under the opt-in
# alpha_dithering decoder option). Closing the last WebP plug point =
# matching that default path bit-exactly.
# ---------------------------------------------------------------------------


def _build_vp8x_alpha(vp8_body: bytes, alph_body: bytes, w: int, h: int):
    def chunk(tag, body):
        return (tag + len(body).to_bytes(4, "little") + body
                + (b"\0" if len(body) & 1 else b""))

    vp8x = (bytes([0x10, 0, 0, 0]) + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little"))
    payload = (chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph_body)
               + chunk(b"VP8 ", vp8_body))
    return b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload


def test_alph_preprocessed_levels_interop():
    """pre=1 containers (raw method, every filter) decode bit-equal to
    libwebp's WebPDecodeRGBA alpha channel AND to the stored plane."""
    import ctypes

    from tests.test_round12 import _alph_forward_filter, _load_libwebp

    lw = _load_libwebp()
    if lw is None:
        pytest.skip("libwebp unavailable")
    from history_collector_spark.functions.webp import decode_webp

    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    rng = np.random.default_rng(1414)
    h, w = 20, 31
    px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGBA(px.tobytes(), w, h, w * 4, 75.0,
                          ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    lw.WebPFree(out)
    pos, vp8 = 12, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            vp8 = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    assert vp8 is not None

    # a QUANTIZED-LEVELS plane, the payload pre=1 marks
    plane = (rng.integers(0, 4, (h, w)) * 85).astype(np.uint8)
    for filt in range(4):
        resid = plane if filt == 0 else _alph_forward_filter(plane, filt)
        alph = bytes([(1 << 4) | (filt << 2)]) + resid.tobytes()
        f = _build_vp8x_alpha(vp8, alph, w, h)
        W, H = ctypes.c_int(), ctypes.c_int()
        rp = lw.WebPDecodeRGBA(f, len(f), ctypes.byref(W), ctypes.byref(H))
        assert rp, f"libwebp rejected pre=1 container (filter {filt})"
        ref = np.ctypeslib.as_array(rp, (H.value, W.value, 4)).copy()
        lw.WebPFree(rp)
        mine = decode_webp(f)
        # reference default path returns the stored plane unchanged...
        assert np.array_equal(ref[:, :, 3], plane), filt
        # ...and our alpha matches it bit-exactly (RGB upsampling
        # flavors differ by design: libwebp's RGBA path uses the fancy
        # chroma upsampler; the YUV-level parity is pinned separately
        # in test_round12's VP8 interop)
        assert np.array_equal(mine[:, :, 3], ref[:, :, 3]), filt


# ---------------------------------------------------------------------------
# Distributed BPE training (the round-14 de-capping): the cluster-side
# trainer must reproduce the driver loop's merge sequence EXACTLY —
# same pairs, same order, same tie-breaks.
# ---------------------------------------------------------------------------


def test_distributed_bpe_matches_driver_loop(spark):
    import pyspark.sql.functions as F

    from history_collector_spark.functions.nlp import tokens
    from history_collector_spark.queries.bpe import (
        _learn_merges,
        _learn_merges_distributed,
    )

    words = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    wc = [(r["w"], r["wc"]) for r in words.collect()]
    driver_merges = _learn_merges(wc, n_merges=12)
    dist_merges = _learn_merges_distributed(words, n_merges=12)
    assert dist_merges == driver_merges


def test_distributed_bpe_fold_merge_semantics(spark):
    """The CASE-gated F.aggregate fold applies a merge left-to-right
    non-overlapping, exactly like the driver loop's index scan —
    pinned on the adversarial repetition shapes."""
    import pyspark.sql.functions as F

    from history_collector_spark.queries.bpe import (
        _learn_merges,
        _learn_merges_distributed,
    )

    cases = [
        ("aaaa", 3),   # overlapping candidate runs
        ("aaab", 2),
        ("abab", 5),   # merged token adjacency
        ("aab", 7),
        ("abb", 1),
        ("ab", 9),
        ("a", 4),      # single symbol: no pairs
        ("bbbaaa", 2),
    ]
    df = spark.createDataFrame(cases, "w string, wc long")
    assert _learn_merges_distributed(df, n_merges=6) == _learn_merges(
        cases, n_merges=6
    )


# ---------------------------------------------------------------------------
# ZIP container (round 14): from-scratch APPNOTE reader vs REAL stdlib
# zipfile archives — every decode is a reference-encoder interop check.
# ---------------------------------------------------------------------------


def _mkzip(members, comment=b"", unseekable=False):
    import io
    import zipfile

    class _NoSeek(io.RawIOBase):
        def __init__(self):
            self.buf = bytearray()

        def writable(self):
            return True

        def write(self, b):
            self.buf += b
            return len(b)

        def seekable(self):
            return False

    sink = _NoSeek() if unseekable else io.BytesIO()
    with zipfile.ZipFile(sink, "w") as z:
        for name, payload, method in members:
            z.writestr(name, payload, compress_type=method)
        z.comment = comment
    return bytes(sink.buf) if unseekable else sink.getvalue()


def test_zip_interop_stored_and_deflate():
    import zipfile

    from history_collector_spark.functions.zipfmt import iter_zip

    data = _mkzip(
        [
            ("a.txt", b"alpha " * 100, zipfile.ZIP_STORED),
            ("n/b.jsonl", b'{"k":1}\n' * 64, zipfile.ZIP_DEFLATED),
            ("café.txt", "näme".encode(), zipfile.ZIP_DEFLATED),
        ],
        comment=b"comment containing the sig PK\x05\x06 mid-way",
    )
    got = dict(iter_zip(data))
    assert got["a.txt"] == b"alpha " * 100
    assert got["n/b.jsonl"] == b'{"k":1}\n' * 64
    assert got["café.txt"] == "näme".encode()


def test_zip_data_descriptor_members():
    """Streaming zipfile writes (unseekable sink) emit flag-bit-3
    members whose LOCAL headers carry zero sizes — the reader must
    take sizes/CRC from the central directory."""
    import zipfile

    from history_collector_spark.functions.zipfmt import (
        iter_zip,
        parse_zip,
    )

    data = _mkzip(
        [("s.bin", b"x" * 999, zipfile.ZIP_DEFLATED)], unseekable=True
    )
    (e,) = parse_zip(data)
    assert e["flags"] & 0x0008, "fixture did not produce a descriptor"
    assert dict(iter_zip(data))["s.bin"] == b"x" * 999


def test_zip_rejects_damage():
    import zipfile

    from history_collector_spark.functions.zipfmt import (
        ZipDecodeError,
        iter_zip,
        parse_zip,
        read_zip_member,
    )

    data = _mkzip([("a.txt", b"payload-bytes" * 9, zipfile.ZIP_STORED)])
    with pytest.raises(ZipDecodeError):
        iter_zip(data[: len(data) // 2])  # torn archive
    with pytest.raises(ZipDecodeError):
        iter_zip(b"PK\x03\x04" + b"\0" * 40)  # no EOCD
    (e,) = parse_zip(data)
    bad = bytearray(data)
    bad[e["header_off"] + 30 + len(b"a.txt")] ^= 0xFF  # payload bit flip
    with pytest.raises(ZipDecodeError, match="CRC-32"):
        read_zip_member(bytes(bad), e)
    # desynced local header name
    bad2 = bytearray(data)
    bad2[e["header_off"] + 30] ^= 0xFF
    with pytest.raises(ZipDecodeError, match="name mismatch"):
        read_zip_member(bytes(bad2), e)


def test_zip_cp437_legacy_names():
    """Names written WITHOUT the UTF-8 flag decode as CP437 — the
    legacy encoding every unzip tool applies."""
    import io
    import zipfile

    from history_collector_spark.functions.zipfmt import parse_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("legacy.txt")
        z.writestr(zi, b"ascii body")
    (e,) = parse_zip(buf.getvalue())
    assert e["name"] == "legacy.txt" and not e["is_utf8"]


# ---------------------------------------------------------------------------
# XZ / LZMA2 / LZMA (round 14): from-scratch decoder vs REAL liblzma
# (stdlib lzma) output — range coder, matched literals, rep distances,
# every container CRC verified.
# ---------------------------------------------------------------------------


def test_xz_interop_checks_and_presets():
    import lzma
    import os

    from history_collector_spark.functions.xz import decompress_xz

    payloads = [
        b"hello hello hello xz world " * 60,
        os.urandom(4096),
        b"a",
        b"",
        b'{"doc": 1, "text": "the quick brown fox"}\n' * 300,
    ]
    for check in (lzma.CHECK_CRC64, lzma.CHECK_CRC32,
                  lzma.CHECK_SHA256, lzma.CHECK_NONE):
        for p in payloads:
            blob = lzma.compress(p, format=lzma.FORMAT_XZ, check=check)
            assert decompress_xz(blob) == p, check
    for preset in (0, 1, 6, 9):
        blob = lzma.compress(payloads[0], preset=preset)
        assert decompress_xz(blob) == payloads[0]


def test_xz_multichunk_and_uncompressed_arms():
    import lzma
    import os

    from history_collector_spark.functions.xz import decompress_xz

    rng = np.random.default_rng(99)
    words = [b"alpha", b"beta", b"gamma", b"delta"]
    # > 2 MiB forces multiple LZMA2 chunks with state continuation
    big = b" ".join(words[i] for i in rng.integers(0, 4, 500_000))
    assert decompress_xz(lzma.compress(big, preset=1)) == big
    # incompressible data at preset 0 emits UNCOMPRESSED chunks
    rnd = os.urandom(200_000)
    assert decompress_xz(lzma.compress(rnd, preset=0)) == rnd


def test_xz_lclppb_grid():
    import lzma

    from history_collector_spark.functions.xz import decompress_xz

    body = (b"abracadabra " * 2000) + bytes(range(256)) * 8
    for lc, lp, pb in ((0, 0, 2), (4, 0, 2), (0, 2, 2), (3, 0, 0),
                       (1, 1, 1), (2, 2, 4)):
        f = [{"id": lzma.FILTER_LZMA2, "preset": 6,
              "lc": lc, "lp": lp, "pb": pb}]
        blob = lzma.compress(body, format=lzma.FORMAT_XZ, filters=f)
        assert decompress_xz(blob) == body, (lc, lp, pb)


def test_xz_rejects_damage():
    import lzma
    import struct

    from history_collector_spark.functions.xz import (
        XzDecodeError,
        decompress_xz,
    )

    body = b"payload " * 500
    blob = lzma.compress(body, format=lzma.FORMAT_XZ,
                         check=lzma.CHECK_CRC64)
    with pytest.raises(XzDecodeError):
        decompress_xz(blob[: len(blob) // 2])  # torn stream
    with pytest.raises(XzDecodeError):
        decompress_xz(b"not an xz stream at all, sorry....")
    # flip one payload byte: the block CRC64 must catch it
    bad = bytearray(blob)
    bad[20] ^= 0x01
    with pytest.raises(XzDecodeError):
        decompress_xz(bytes(bad))
    # corrupt the stream-header CRC
    bad2 = bytearray(blob)
    bad2[8] ^= 0xFF
    with pytest.raises(XzDecodeError, match="stream header CRC"):
        decompress_xz(bytes(bad2))
    # corrupt the footer magic
    bad3 = bytearray(blob)
    bad3[-1] ^= 0xFF
    with pytest.raises(XzDecodeError, match="footer"):
        decompress_xz(bytes(bad3))
    # index record tamper (varint region after the 0x00 indicator)
    idx = blob.rfind(b"\x00", 0, len(blob) - 12)
    del idx
    # CRC64 self-check against a known vector: crc64 of b"123456789"
    from history_collector_spark.functions.xz import crc64

    assert crc64(b"123456789") == 0x995DC9BBDF1939FA


def test_xz_fuzz_never_hangs_or_crashes():
    """Random mutations either decode (rare) or raise XzDecodeError —
    never an unhandled exception or a runaway loop."""
    import lzma

    from history_collector_spark.functions.xz import (
        XzDecodeError,
        decompress_xz,
    )

    rng = np.random.default_rng(4321)
    blob = bytearray(lzma.compress(b"fuzz me gently " * 400, preset=1))
    ok = err = 0
    for _ in range(150):
        mutant = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            mutant[int(rng.integers(0, len(mutant)))] = int(
                rng.integers(0, 256)
            )
        try:
            decompress_xz(bytes(mutant))
            ok += 1
        except XzDecodeError:
            err += 1
    assert ok + err == 150


# ---------------------------------------------------------------------------
# HTTP response messages (round 14): the WARC payload layer — chunked
# transfer decode + content coding, pinned against CPython's
# http.client (the stdlib REFERENCE parser) over identical bytes.
# ---------------------------------------------------------------------------


class _FakeSock:
    def __init__(self, data):
        import io

        self._f = io.BytesIO(data)

    def makefile(self, *a, **k):
        return self._f


def test_http_response_all_arms_match_http_client():
    import gzip
    import http.client
    import zlib

    from history_collector_spark.sources.http_msg import (
        parse_http_response,
        write_http_response,
    )

    body = ("hello wörld! " * 120).encode()
    for chunked in (False, True):
        for ce in (None, "gzip", "deflate"):
            raw = write_http_response(
                body, chunked=chunked, content_encoding=ce,
                chunk_size=173,
            )
            mine = parse_http_response(raw)
            assert mine["status"] == 200 and mine["body"] == body
            r = http.client.HTTPResponse(_FakeSock(raw))
            r.begin()
            ref = r.read()  # http.client removes the TRANSFER coding
            if ce == "gzip":
                ref = gzip.decompress(ref)
            elif ce == "deflate":
                ref = zlib.decompress(ref)
            assert ref == body, (chunked, ce)
            assert r.status == mine["status"]


def test_http_response_edge_cases():
    from history_collector_spark.sources.http_msg import (
        HttpParseError,
        parse_http_response,
    )

    # bare-LF header endings (real-crawl tolerance)
    assert (
        parse_http_response(b"HTTP/1.1 200 OK\nContent-Length: 3\n\nabc")
        ["body"]
        == b"abc"
    )
    # repeated headers comma-join (RFC 9110 5.2)
    m = parse_http_response(
        b"HTTP/1.1 200 OK\r\nVary: A\r\nVary: B\r\n"
        b"Content-Length: 0\r\n\r\n"
    )
    assert m["headers"]["vary"] == "A, B"
    # connection-close delimited body (no length, no chunking)
    m = parse_http_response(b"HTTP/1.1 200 OK\r\n\r\nrest of capture")
    assert m["body"] == b"rest of capture"
    # chunked trailers after the 0-chunk
    m = parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"3\r\nabc\r\n0\r\nX-Trailer: 1\r\n\r\n"
    )
    assert m["body"] == b"abc"
    # raw-DEFLATE mislabeled as deflate (broken-server tolerance)
    import zlib

    raw_deflate = zlib.compressobj(wbits=-15)
    blob = raw_deflate.compress(b"tolerant") + raw_deflate.flush()
    m = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
        + f"Content-Length: {len(blob)}\r\n\r\n".encode()
        + blob
    )
    assert m["body"] == b"tolerant"
    # damage battery
    for bad in (
        b"",
        b"not http at all",
        b"HTTP/1.1 XX OK\r\n\r\n",
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n",
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nab",
        b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort",
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
        b"Content-Length: 2\r\n\r\nxx",
    ):
        with pytest.raises(HttpParseError):
            parse_http_response(bad)


def test_zip_member_payload_containing_zip64_sigs_still_parses():
    """Compressed/stored member DATA may legitimately contain the
    ZIP64 signature bytes — only the EOCD-adjacent locator position
    may trigger the ZIP64 rejection (round-14 fix: the first version
    scanned the whole file)."""
    import zipfile

    from history_collector_spark.functions.zipfmt import iter_zip

    payload = b"xx" + b"PK\x06\x06" + b"mid" + b"PK\x06\x07" + b"yy"
    data = _mkzip([("sig.bin", payload * 3, zipfile.ZIP_STORED)])
    assert dict(iter_zip(data))["sig.bin"] == payload * 3


# ---------------------------------------------------------------------------
# Row-group pruning audit (round 14): real parquet footer statistics
# against the closed-form recomputation, plus the planner invariants.
# ---------------------------------------------------------------------------


def test_rowgroup_pruning_audit_invariants(spark):
    pdf = registry.QUERIES["maintenance_rowgroup_pruning_audit"](
        spark, TEST_SF_DIR
    ).toPandas()
    from history_collector_spark.queries.maintenance import _RG_PROBES

    assert len(pdf) == _RG_PROBES
    # a min/max prune is SOUND: it never admits fewer rows than match
    assert (pdf["n_rows_scanned"] >= pdf["n_rows_matching"]).all()
    assert (pdf["n_groups_scanned"] <= pdf["n_groups_total"]).all()
    # the sorted-within-shard layout must actually prune: narrow probes
    # admit at most one group per shard (+1 for a boundary straddle)
    from history_collector_spark.queries.maintenance import _RG_SHARDS

    assert (pdf["n_groups_scanned"] <= 2 * _RG_SHARDS).all()
    assert (pdf["lo"] <= pdf["hi"]).all()


# ---------------------------------------------------------------------------
# Entity resolution (round 14): planted-duplicate recovery through the
# blocked match pipeline.
# ---------------------------------------------------------------------------


def test_er_audit_recovers_planted_duplicates(spark):
    pdf = registry.QUERIES["er_blocked_match_audit"](
        spark, TEST_SF_DIR
    ).toPandas()
    assert len(pdf) == 5  # one row per market segment
    # the planted duplicate shares its original's block and sits at
    # edit distance exactly 1 <= 2, so recall is 1.0 BY CONSTRUCTION
    assert (pdf["recall_"] == 1.0).all()
    assert (pdf["tp"] <= pdf["n_matched"]).all()
    assert (pdf["n_matched"] <= pdf["n_candidates"]).all()
    assert (pdf["precision_"] <= 1.0).all() and (pdf["precision_"] > 0).all()


def test_er_census_accounts_for_every_record(spark):
    import pyspark.sql.functions as F

    from history_collector_spark.queries.entity_resolution import _ER_EVERY

    pdf = registry.QUERIES["er_entity_cluster_census"](
        spark, TEST_SF_DIR
    ).toPandas()
    n_cust = spark.read.parquet(f"{TEST_SF_DIR}/customer.parquet").count()
    n_dups = (
        spark.read.parquet(f"{TEST_SF_DIR}/customer.parquet")
        .filter(F.col("c_custkey") % _ER_EVERY == 0)
        .count()
    )
    total = int((pdf["cluster_size"] * pdf["n_clusters"]).sum())
    assert total == n_cust + n_dups  # every record in exactly one cluster
    # at least the planted pairs form non-singleton clusters
    assert int(pdf.loc[pdf["cluster_size"] >= 2, "n_clusters"].sum()) > 0


def test_xz_concatenated_streams():
    """Concatenated .xz streams decode in order and join — the
    reference CLI behavior (`xz -d`). Plain concatenation matches
    stdlib lzma.decompress byte-for-byte; with stream PADDING between
    streams (4-byte null groups, legal per the spec) stdlib
    lzma.decompress silently stops at the padding, while this decoder
    (like the xz tool) continues — asserted against the known
    plaintext, not the stdlib quirk."""
    import lzma

    from history_collector_spark.functions.xz import (
        XzDecodeError,
        decompress_xz,
    )

    a, b = b"first stream " * 100, b"second one " * 77
    plain = lzma.compress(a) + lzma.compress(b, check=lzma.CHECK_CRC32)
    assert decompress_xz(plain) == a + b == lzma.decompress(plain)
    padded = lzma.compress(a) + b"\x00" * 8 + lzma.compress(b)
    assert decompress_xz(padded) == a + b
    # stdlib stops at the padding — document the divergence honestly
    assert lzma.decompress(padded) == a
    # trailing padding fine; trailing junk raises
    assert decompress_xz(lzma.compress(a) + b"\x00" * 4) == a
    with pytest.raises(XzDecodeError):
        decompress_xz(lzma.compress(a) + b"junkjun")
    with pytest.raises(XzDecodeError):
        decompress_xz(lzma.compress(a) + b"\x00" * 4 + b"garbage!")
