"""HTTP/1.1 response-message parser (RFC 9110/9112 subset) for WARC
response records.

A WARC `response` record's payload is the RAW HTTP message a crawler
captured: status line, header block, then a body that may be
Transfer-Encoding: chunked and/or Content-Encoding compressed. Every
real crawl pipeline (Common Crawl WET generation et al.) must strip
the message framing before any text processing — this module is that
step, implemented from the public RFCs:

- status line (`HTTP/1.x <code> <reason>`), CRLF header block
  (lenient about bare-LF separators, which real crawls contain),
  case-insensitive header names, repeated headers comma-joined
  (RFC 9110 §5.2);
- Transfer-Encoding: chunked — hex chunk sizes with optional chunk
  extensions, per-chunk CRLF framing, the 0-size terminator, and the
  optional trailer section (RFC 9112 §7.1);
- Content-Encoding: gzip / x-gzip (stdlib gzip) and deflate — tried
  first as the RFC-correct zlib stream, then as the raw DEFLATE
  stream many real servers send mislabeled (the tolerance every
  production HTTP client ships);
- bodies delimited by Content-Length, by chunked framing, or by
  end-of-message (connection-close capture).

The framing parser is pinned against CPython's ``http.client``
response machinery (the stdlib REFERENCE parser) over the same bytes
in tests — chunk framing, status, headers and body must agree.
Malformed messages raise :class:`HttpParseError`.

The writer exists to build deterministic fixtures (same role as
sources/warc.py's write_warc).

Reference parity note: extends the reference's archive ingestion
boundary (kinecosystem/history-collector python/main.py
get_history_file) one protocol layer deeper — from container framing
to the HTTP messages crawl containers actually hold.
"""

from __future__ import annotations

import gzip
import zlib


class HttpParseError(ValueError):
    """Malformed HTTP message."""


def write_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    chunked: bool = False,
    content_encoding: str | None = None,
    chunk_size: int = 256,
    content_type: str = "text/plain; charset=utf-8",
) -> bytes:
    """Deterministic HTTP/1.1 response bytes for fixtures: optional
    gzip/deflate Content-Encoding applied first, then either chunked
    framing (with a chunk extension on the first chunk, which parsers
    must ignore) or a Content-Length header."""
    payload = body
    headers = [f"Content-Type: {content_type}"]
    if content_encoding == "gzip":
        payload = gzip.compress(payload, mtime=0)
        headers.append("Content-Encoding: gzip")
    elif content_encoding == "deflate":
        payload = zlib.compress(payload)
        headers.append("Content-Encoding: deflate")
    elif content_encoding is not None:
        raise ValueError(f"unsupported encoding {content_encoding!r}")
    out = bytearray(f"HTTP/1.1 {status} {reason}\r\n".encode("ascii"))
    if chunked:
        headers.append("Transfer-Encoding: chunked")
    else:
        headers.append(f"Content-Length: {len(payload)}")
    for h in headers:
        out += h.encode("ascii") + b"\r\n"
    out += b"\r\n"
    if chunked:
        first = True
        for i in range(0, len(payload), chunk_size):
            chunk = payload[i : i + chunk_size]
            ext = b";fixture=1" if first else b""
            first = False
            out += f"{len(chunk):x}".encode("ascii") + ext + b"\r\n"
            out += chunk + b"\r\n"
        out += b"0\r\n\r\n"
    else:
        out += payload
    return bytes(out)


def _split_lines(block: bytes) -> list[bytes]:
    """Header-block lines, tolerant of bare-LF line endings."""
    return block.replace(b"\r\n", b"\n").split(b"\n")


def _decode_chunked(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while True:
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise HttpParseError("unterminated chunk-size line")
        size_line = data[pos:eol]
        semi = size_line.find(b";")  # chunk extensions are ignored
        if semi >= 0:
            size_line = size_line[:semi]
        try:
            size = int(size_line.strip(), 16)
        except ValueError as exc:
            raise HttpParseError(
                f"bad chunk size {size_line!r}"
            ) from exc
        if size < 0:
            raise HttpParseError("negative chunk size")
        pos = eol + 2
        if size == 0:
            # optional trailer section: header lines until a blank one
            while True:
                teol = data.find(b"\r\n", pos)
                if teol < 0:
                    raise HttpParseError("unterminated chunk trailer")
                if teol == pos:  # blank line: end of message
                    return bytes(out)
                pos = teol + 2
        if pos + size + 2 > n:
            raise HttpParseError("truncated chunk data")
        out += data[pos : pos + size]
        if data[pos + size : pos + size + 2] != b"\r\n":
            raise HttpParseError("missing CRLF after chunk data")
        pos += size + 2


def parse_http_response(data: bytes) -> dict:
    """Raw response bytes -> {status, reason, headers, body} with the
    transfer coding removed and the content coding decoded. ``headers``
    is a dict of lower-cased names; repeated headers are comma-joined
    in arrival order (RFC 9110 §5.2)."""
    # header/body split: CRLFCRLF per spec, bare LFLF tolerated
    hdr_end = data.find(b"\r\n\r\n")
    body_start = hdr_end + 4
    lf_end = data.find(b"\n\n")
    if hdr_end < 0 or (0 <= lf_end < hdr_end):
        if lf_end < 0:
            raise HttpParseError("no header/body separator")
        hdr_end, body_start = lf_end, lf_end + 2
    lines = _split_lines(data[:hdr_end])
    status_line = lines[0]
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/1."):
        raise HttpParseError(f"bad status line {status_line!r}")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise HttpParseError(f"bad status code {parts[1]!r}") from exc
    reason = parts[2].decode("latin-1") if len(parts) > 2 else ""
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        if b":" not in line:
            raise HttpParseError(f"malformed header line {line!r}")
        k, v = line.split(b":", 1)
        key = k.strip().lower().decode("latin-1")
        val = v.strip().decode("latin-1")
        headers[key] = f"{headers[key]}, {val}" if key in headers else val

    raw = data[body_start:]
    te = headers.get("transfer-encoding", "").lower()
    if "chunked" in te:
        body = _decode_chunked(raw)
    elif "content-length" in headers:
        try:
            clen = int(headers["content-length"].split(",")[0].strip())
        except ValueError as exc:
            raise HttpParseError("bad Content-Length") from exc
        if clen < 0 or clen > len(raw):
            raise HttpParseError(
                f"Content-Length {clen} vs {len(raw)} captured bytes"
            )
        body = raw[:clen]
    else:
        body = raw  # connection-close delimited capture

    ce = headers.get("content-encoding", "").lower()
    if ce in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error) as exc:
            raise HttpParseError(f"bad gzip body: {exc}") from exc
    elif ce == "deflate":
        # RFC says zlib-wrapped; many real servers send raw DEFLATE —
        # try the spec form first, then the tolerant raw fallback
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -15)
            except zlib.error as exc:
                raise HttpParseError(f"bad deflate body: {exc}") from exc
    elif ce not in ("", "identity"):
        raise HttpParseError(f"unsupported content-encoding {ce!r}")
    return {
        "status": status,
        "reason": reason,
        "headers": headers,
        "body": body,
    }
