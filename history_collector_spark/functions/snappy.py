"""From-scratch Snappy codec: block format, framing format, CRC32C.

Completes the stream-compression trio next to gzip/zlib and LZ4
(functions/lz4.py) — Snappy is the default codec of half the Hadoop
ecosystem, so a corpus stack meets ``.snappy`` shards constantly. All
three layers are implemented off the public specifications:

- Block format: varint uncompressed-length preamble, then tagged
  elements — literals (tag 00, 6-bit length or 1-4 extension bytes),
  and copies with 1/2/4-byte offsets (tags 01/10/11), overlap-allowed.
- Framing format: the 0xFF stream-identifier chunk ("sNaPpY"),
  compressed (0x00) / uncompressed (0x01) data chunks, each carrying
  the MASKED CRC32C of the uncompressed data, padding/skippable
  chunks skipped by declared size.
- CRC32C (Castagnoli, reflected poly 0x82F63B78) with the snappy
  mask rotation ((crc >> 15 | crc << 17) + 0xA282EAD8).

Totality: ``decode_snappy_frame`` / ``decompress_block`` raise
``SnappyDecodeError`` on any malformed input — never IndexError or
struct.error (fuzz-swept in tests/test_codec_fuzz.py). The encoder is
a deterministic greedy hash matcher, so fixtures reproduce
byte-for-byte.
"""

from __future__ import annotations

import struct

from history_collector_spark.functions.codec_errors import MediaDecodeError


class SnappyDecodeError(MediaDecodeError):
    """Malformed Snappy block or frame."""


_STREAM_ID = b"sNaPpY"

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), reflected, init/xorout 0xFFFFFFFF."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _read_varint(src: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if i >= len(src):
            raise SnappyDecodeError("truncated varint")
        b = src[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 35:
            raise SnappyDecodeError("varint too long")


def decompress_block(src: bytes, max_out: int = 1 << 26) -> bytes:
    """One Snappy block -> raw bytes (strict length/offset checks)."""
    want, i = _read_varint(src, 0)
    if want > max_out:
        raise SnappyDecodeError("declared size exceeds budget")
    out = bytearray()
    n = len(src)
    while i < n:
        b = src[i]
        i += 1
        tag = b & 3
        if tag == 0:  # literal
            v = b >> 2
            if v < 60:
                length = v + 1
            else:
                nb = v - 59
                if i + nb > n:
                    raise SnappyDecodeError("truncated literal length")
                length = int.from_bytes(src[i : i + nb], "little") + 1
                i += nb
            if i + length > n:
                raise SnappyDecodeError("literal past end of block")
            out += src[i : i + length]
            i += length
        else:
            if tag == 1:  # copy, 1-byte offset
                length = ((b >> 2) & 0x7) + 4
                if i >= n:
                    raise SnappyDecodeError("truncated copy-1 offset")
                offset = ((b >> 5) << 8) | src[i]
                i += 1
            elif tag == 2:  # copy, 2-byte offset
                length = (b >> 2) + 1
                if i + 2 > n:
                    raise SnappyDecodeError("truncated copy-2 offset")
                offset = int.from_bytes(src[i : i + 2], "little")
                i += 2
            else:  # copy, 4-byte offset
                length = (b >> 2) + 1
                if i + 4 > n:
                    raise SnappyDecodeError("truncated copy-4 offset")
                offset = int.from_bytes(src[i : i + 4], "little")
                i += 4
            if offset == 0 or offset > len(out):
                raise SnappyDecodeError(f"bad copy offset {offset}")
            pos = len(out) - offset
            for k in range(length):
                out.append(out[pos + k])
        if len(out) > want:
            raise SnappyDecodeError("output exceeds declared size")
    if len(out) != want:
        raise SnappyDecodeError(
            f"decoded {len(out)} bytes, preamble declared {want}"
        )
    return bytes(out)


def _emit_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def compress_block(src: bytes) -> bytes:
    """Greedy hash-table Snappy block encoder: min match 4, copy-2
    elements (64-byte chunks for longer matches), literals between."""
    n = len(src)
    out = bytearray(_emit_varint(n))

    def emit_literal(lo: int, hi: int) -> None:
        length = hi - lo
        if length <= 0:
            return
        v = length - 1
        if v < 60:
            out.append(v << 2)
        else:
            nb = (v.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out.extend(v.to_bytes(nb, "little"))
        out.extend(src[lo:hi])

    def emit_copy(offset: int, length: int) -> None:
        while length > 0:
            chunk = min(length, 64)
            if chunk < 4:
                # spec: copy length >= 4; borrow from the previous
                # chunk so the tail stays >= 4
                break
            out.append(((chunk - 1) << 2) | 2)
            out.extend(struct.pack("<H", offset))
            length -= chunk

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 4
    while i <= limit:
        key = int.from_bytes(src[i : i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and src[cand : cand + 4] == src[i : i + 4]
        ):
            mlen = 4
            while i + mlen < n and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            # keep match chunks >= 4: trim so the last chunk is full
            rem = mlen % 64
            if 0 < rem < 4:
                mlen -= rem
            emit_literal(anchor, i)
            emit_copy(i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit_literal(anchor, n)
    return bytes(out)


def compress_frame(data: bytes, chunk_size: int = 65536) -> bytes:
    """Raw bytes -> framed Snappy stream (stream id + compressed
    chunks with masked CRC32C; incompressible chunks stored as
    uncompressed chunks, per spec)."""
    out = bytearray(b"\xff\x06\x00\x00" + _STREAM_ID)
    for c0 in range(0, len(data), chunk_size):
        raw = data[c0 : c0 + chunk_size]
        crc = struct.pack("<I", _masked_crc(raw))
        comp = compress_block(raw)
        if len(comp) < len(raw):
            body = crc + comp
            out += b"\x00" + len(body).to_bytes(3, "little") + body
        else:
            body = crc + raw
            out += b"\x01" + len(body).to_bytes(3, "little") + body
    return bytes(out)


def decode_snappy_frame(blob: bytes) -> bytes:
    """Framed Snappy stream -> raw bytes, verifying stream identifier
    and every chunk's masked CRC32C."""
    if len(blob) < 10 or blob[0] != 0xFF:
        raise SnappyDecodeError("missing stream identifier chunk")
    ilen = int.from_bytes(blob[1:4], "little")
    if ilen != 6 or blob[4:10] != _STREAM_ID:
        raise SnappyDecodeError("bad stream identifier")
    i = 10
    out = bytearray()
    while i < len(blob):
        if i + 4 > len(blob):
            raise SnappyDecodeError("truncated chunk header")
        ctype = blob[i]
        clen = int.from_bytes(blob[i + 1 : i + 4], "little")
        i += 4
        if i + clen > len(blob):
            raise SnappyDecodeError("truncated chunk body")
        body = blob[i : i + clen]
        i += clen
        if ctype == 0x00 or ctype == 0x01:
            if clen < 4:
                raise SnappyDecodeError("chunk too short for checksum")
            (crc,) = struct.unpack_from("<I", body, 0)
            raw = (
                decompress_block(body[4:])
                if ctype == 0x00
                else body[4:]
            )
            if _masked_crc(raw) != crc:
                raise SnappyDecodeError("chunk checksum mismatch")
            out += raw
        elif ctype == 0xFF:
            if body != _STREAM_ID:
                raise SnappyDecodeError("bad repeated stream identifier")
        elif 0x80 <= ctype <= 0xFE:
            continue  # skippable chunk
        else:
            raise SnappyDecodeError(f"unknown unskippable chunk {ctype:#x}")
    return bytes(out)
