"""WARC (Web ARChive, ISO 28500) reader/writer — the container format
web crawls actually ship in (Common Crawl et al.), implemented from
the public spec: records framed by a `WARC/1.0` version line, CRLF
header block, `Content-Length`-delimited payload, and a blank-line
trailer; `.warc.gz` files are concatenated per-record gzip members
(stdlib `gzip.decompress` handles multi-member streams).

The writer exists to build deterministic fixtures (same role as
sources/xdr.py's archive writer); the parser is the ingest-side
operator the `corpus_warc_ingest` query runs inside Arrow batches.

Reference parity note: the reference ingests gzipped XDR archives from
object storage (python/main.py:241-266) — WARC is the web-corpus
analogue of that container boundary, LLM-pipeline extension tier.
"""

from __future__ import annotations

import gzip
import zlib


class WarcParseError(ValueError):
    """Malformed WARC payload."""


_MAGIC = b"WARC/1.0\r\n"


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records (dicts with ``warc_type``, ``uri``, ``date``,
    ``payload`` bytes) into WARC bytes; ``gzip_members=True`` emits the
    standard one-gzip-member-per-record `.warc.gz` layout."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        head = bytearray(_MAGIC)
        head += f"WARC-Type: {r['warc_type']}\r\n".encode()
        head += f"WARC-Target-URI: {r['uri']}\r\n".encode()
        head += f"WARC-Date: {r['date']}\r\n".encode()
        head += f"WARC-Record-ID: <urn:fixture:{i}>\r\n".encode()
        head += f"Content-Length: {len(payload)}\r\n".encode()
        head += b"\r\n"
        rec = bytes(head) + payload + b"\r\n\r\n"
        if gzip_members:
            # mtime pinned for byte-deterministic fixtures
            out += gzip.compress(rec, compresslevel=6, mtime=0)
        else:
            out += rec
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or multi-member gzip) into a list of
    {warc_type, uri, date, payload} dicts. Malformed framing raises
    WarcParseError."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # handles concatenated members
        except (OSError, EOFError, zlib.error) as exc:
            # gzip surfaces BadGzipFile(OSError) for framing problems
            # but lets zlib.error/EOFError escape for corrupt DEFLATE
            # payloads — all three are "bad member" to the caller
            raise WarcParseError(f"bad gzip member: {exc}") from exc
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + len(_MAGIC)] != _MAGIC:
            raise WarcParseError(
                f"expected WARC/1.0 version line at offset {pos}"
            )
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcParseError("unterminated WARC header block")
        headers = {}
        for line in data[pos + len(_MAGIC) : hdr_end].split(b"\r\n"):
            if b":" not in line:
                raise WarcParseError(f"malformed header line {line!r}")
            k, v = line.split(b":", 1)
            # latin-1 is total (any byte decodes) — header bytes are
            # ASCII in practice, but corrupt input must not escape as
            # UnicodeDecodeError from a decoder that promises
            # WarcParseError
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcParseError("missing/bad Content-Length") from exc
        if clen < 0:
            raise WarcParseError("negative Content-Length")
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise WarcParseError("truncated WARC record payload")
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            raise WarcParseError("missing WARC record trailer")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "payload": data[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records
