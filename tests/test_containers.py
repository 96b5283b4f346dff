"""WARC + USTAR container codecs: framing unit tests beneath the
oracle-gated ingest queries. The tar tests cross-validate the
from-scratch implementation against the stdlib ``tarfile`` module in
BOTH directions (our bytes must be readable by tarfile; tarfile's
bytes must be readable by our parser)."""

from __future__ import annotations

import gzip
import io
import os
import sys
import tarfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

RECS = [
    {"warc_type": "warcinfo", "uri": "file://x", "date": "2024-01-01",
     "payload": b"software: t\r\n"},
    {"warc_type": "response", "uri": "http://a/b/1", "date": "2024-01-01",
     "payload": b"hello world"},
    {"warc_type": "response", "uri": "http://a/b/2", "date": "2024-01-02",
     "payload": b""},  # empty payload is legal
    {"warc_type": "response", "uri": "http://a/b/3", "date": "2024-01-03",
     "payload": bytes(range(256))},  # binary payload
]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = write_warc(RECS, gzip_members=gz)
        back = parse_warc(blob)
        assert [r["payload"] for r in back] == [r["payload"] for r in RECS]
        assert [r["uri"] for r in back] == [r["uri"] for r in RECS]
        assert [r["warc_type"] for r in back] == [
            r["warc_type"] for r in RECS
        ]


def test_warc_gzip_members_are_individually_valid():
    """The .warc.gz layout is one gzip member PER record — seekable
    ingestion depends on it. Each member must decompress alone."""
    blob = write_warc(RECS, gzip_members=True)
    # split members on gzip magic (safe here: payloads are compressed)
    starts = [i for i in range(len(blob) - 1)
              if blob[i] == 0x1F and blob[i + 1] == 0x8B]
    assert len(starts) == len(RECS)
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(blob)
        rec = parse_warc(gzip.decompress(blob[s:e]))
        assert len(rec) == 1 and rec[0]["uri"] == RECS[i]["uri"]


def test_warc_malformed_inputs():
    blob = write_warc(RECS)
    with pytest.raises(WarcParseError, match="version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(WarcParseError, match="truncated"):
        parse_warc(blob[:-6])
    # declared Content-Length larger than the body
    bad = blob.replace(b"Content-Length: 11", b"Content-Length: 99", 1)
    with pytest.raises(WarcParseError):
        parse_warc(bad)
    with pytest.raises(WarcParseError, match="gzip"):
        parse_warc(b"\x1f\x8bnot really gzip at all")


FILES = [
    ("a/one.txt", b"first payload"),
    ("b/two.txt", b""),
    ("a/three.bin", bytes(range(200)) * 3),  # crosses a 512 block
]


def test_tar_roundtrip_self():
    assert parse_tar(write_tar(FILES)) == FILES


def test_tar_our_bytes_readable_by_stdlib():
    blob = write_tar(FILES)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
            if m.isfile()
        ]
    assert got == FILES


def test_tar_stdlib_bytes_readable_by_ours():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in FILES:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    got = parse_tar(buf.getvalue())
    assert got == FILES


def test_tar_malformed_inputs():
    blob = write_tar(FILES)
    # flip a header byte -> checksum mismatch
    bad = bytearray(blob)
    bad[0] ^= 0xFF
    with pytest.raises(TarParseError, match="checksum"):
        parse_tar(bytes(bad))
    # cut mid-payload (first file is 13 bytes at offset 512)
    with pytest.raises(TarParseError, match="truncated"):
        parse_tar(blob[:516])
    # cleanly cut after a record but before the two zero blocks
    with pytest.raises(TarParseError, match="end-of-archive"):
        parse_tar(blob[:1024])
