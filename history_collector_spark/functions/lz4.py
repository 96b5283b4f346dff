"""From-scratch LZ4 frame/block codec + xxHash32.

The remaining compression format a crawl/corpus stack routinely meets
(WARC/JSONL shards ship as .lz4 at several large public corpora; the
repo already owns gzip/zlib from scratch). Both halves are implemented
off the public specifications:

- LZ4 block format: token byte (literal-length nibble / match-length
  nibble, 15 => 255-extension bytes), literals, 2-byte little-endian
  match offset, overlap-allowed match copy; a block's last sequence is
  literals-only.
- LZ4 frame format: magic 0x184D2204, FLG/BD descriptor + xxh32 header
  checksum byte, 4-byte block sizes with the high bit marking
  uncompressed blocks, 0x00000000 end mark, optional xxh32 content
  checksum.
- xxHash32: the public 5-prime avalanche hash the frame format uses
  for its header and content checksums.

Totality contract (same as every codec here): `decode_lz4_frame`
raises ``Lz4DecodeError`` on any malformed input — never IndexError /
struct.error — so a torn shard degrades to an error row instead of
killing a Spark task (fuzz-swept in tests/test_codec_fuzz.py).

The encoder is a greedy hash-table matcher (the classic fast-LZ4
shape) — deterministic, so fixtures are reproducible byte-for-byte.
"""

from __future__ import annotations

import struct

from history_collector_spark.functions.codec_errors import MediaDecodeError


class Lz4DecodeError(MediaDecodeError):
    """Malformed LZ4 frame or block."""


_MAGIC = 0x184D2204

_XXH_P1 = 2654435761
_XXH_P2 = 2246822519
_XXH_P3 = 3266489917
_XXH_P4 = 668265263
_XXH_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 over ``data`` (public algorithm, from-scratch)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _M32
        v2 = (seed + _XXH_P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXH_P1) & _M32
        while i + 16 <= n:
            (a, b, c, d) = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + a * _XXH_P2) & _M32, 13) * _XXH_P1) & _M32
            v2 = (_rotl((v2 + b * _XXH_P2) & _M32, 13) * _XXH_P1) & _M32
            v3 = (_rotl((v3 + c * _XXH_P2) & _M32, 13) * _XXH_P1) & _M32
            v4 = (_rotl((v4 + d * _XXH_P2) & _M32, 13) * _XXH_P1) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _XXH_P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + k * _XXH_P3) & _M32, 17) * _XXH_P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _XXH_P5) & _M32, 11) * _XXH_P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _XXH_P2) & _M32
    h ^= h >> 13
    h = (h * _XXH_P3) & _M32
    h ^= h >> 16
    return h


def decompress_block(src: bytes, max_out: int = 1 << 26) -> bytes:
    """One LZ4 block -> raw bytes. Strict: any truncated token,
    literal run, offset, or out-of-window match is a decode error."""
    out = bytearray()
    i = 0
    n = len(src)
    while True:
        if i >= n:
            raise Lz4DecodeError("block ends without a final literal run")
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise Lz4DecodeError("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise Lz4DecodeError("literal run past end of block")
        out += src[i : i + lit_len]
        i += lit_len
        if len(out) > max_out:
            raise Lz4DecodeError("decoded size exceeds budget")
        if i == n:
            break  # last sequence: literals only
        if i + 2 > n:
            raise Lz4DecodeError("truncated match offset")
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4DecodeError(f"bad match offset {offset}")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise Lz4DecodeError("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        # overlap-allowed copy (byte-at-a-time semantics per spec)
        pos = len(out) - offset
        for k in range(match_len):
            out.append(out[pos + k])
        if len(out) > max_out:
            raise Lz4DecodeError("decoded size exceeds budget")
    return bytes(out)


def compress_block(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder (fast-LZ4 shape):
    4-byte-hash candidates, minimum match 4, matches end >= 12 bytes
    before the input end and the last 5+ bytes are always literals
    (the spec's end-of-block conditions)."""
    n = len(src)
    out = bytearray()
    table: dict[int, int] = {}
    anchor = 0
    i = 0

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        lit_len = lit_end - lit_start
        ml = mlen - 4 if mlen else 0
        token = (min(lit_len, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        rest = lit_len - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            rest = ml - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    # spec: the last match must start at least 12 bytes before the end
    limit = n - 12
    while i < limit:
        key = struct.unpack_from("<I", src, i)[0]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and src[cand : cand + 4] == src[i : i + 4]
        ):
            mlen = 4
            # matches may not cover the last 5 bytes of the block
            hard_end = n - 5
            while i + mlen < hard_end and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, 0, 0)  # final literals-only sequence
    return bytes(out)


def compress_frame(data: bytes, block_size: int = 1 << 16,
                   store_content_checksum: bool = True) -> bytes:
    """Raw bytes -> LZ4 frame (block-independent blocks; incompressible
    blocks stored uncompressed with the high size bit, per spec)."""
    flg = 0x40 | 0x20  # version 01, block-independent
    if store_content_checksum:
        flg |= 0x04
    bd = 0x40  # 64 KB max block size
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    for b0 in range(0, len(data), block_size):
        raw = data[b0 : b0 + block_size]
        comp = compress_block(raw)
        if len(comp) < len(raw):
            out += struct.pack("<I", len(comp)) + comp
        else:
            out += struct.pack("<I", len(raw) | 0x80000000) + raw
    out += struct.pack("<I", 0)  # end mark
    if store_content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decode_lz4_frame(blob: bytes) -> bytes:
    """LZ4 frame -> raw bytes, verifying the header-checksum byte and
    (when present) the xxh32 content checksum."""
    if len(blob) < 7:
        raise Lz4DecodeError("short LZ4 frame")
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != _MAGIC:
        raise Lz4DecodeError("bad LZ4 magic")
    flg = blob[4]
    if (flg >> 6) != 0b01:
        raise Lz4DecodeError(f"unsupported LZ4 frame version {flg >> 6}")
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_block_checksum = bool(flg & 0x10)
    has_dict_id = bool(flg & 0x01)
    i = 6
    if has_content_size:
        i += 8
    if has_dict_id:
        i += 4
    if i >= len(blob):
        raise Lz4DecodeError("truncated frame descriptor")
    hc = blob[i]
    i += 1
    if hc != ((xxh32(blob[4:i - 1]) >> 8) & 0xFF):
        raise Lz4DecodeError("frame descriptor checksum mismatch")
    out = bytearray()
    while True:
        if i + 4 > len(blob):
            raise Lz4DecodeError("truncated block size")
        (bsz,) = struct.unpack_from("<I", blob, i)
        i += 4
        if bsz == 0:
            break  # end mark
        uncompressed = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        if i + bsz > len(blob):
            raise Lz4DecodeError("truncated block")
        body = blob[i : i + bsz]
        i += bsz
        if has_block_checksum:
            if i + 4 > len(blob):
                raise Lz4DecodeError("truncated block checksum")
            (bchk,) = struct.unpack_from("<I", blob, i)
            i += 4
            if bchk != xxh32(body):
                raise Lz4DecodeError("block checksum mismatch")
        out += body if uncompressed else decompress_block(body)
    if has_content_checksum:
        if i + 4 > len(blob):
            raise Lz4DecodeError("truncated content checksum")
        (chk,) = struct.unpack_from("<I", blob, i)
        if chk != xxh32(bytes(out)):
            raise Lz4DecodeError("content checksum mismatch")
    return bytes(out)
