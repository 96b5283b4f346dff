"""Multimodal (binary) column handling.

Images/audio/video are opaque `binary` columns with typed metadata.
The decode plug point now carries REAL pure-Python codecs — BMP
(24-bit BI_RGB, padding/bottom-up/BGR handled), PPM (P6/P3), PNG
(stdlib-zlib inflate, all five scanline filters, color types 0/2/4/6),
and GIF (from-scratch variable-width LZW, palettes, 4-pass interlace)
pixel decode, plus 16-bit PCM audio framing — running through the same
Arrow-batched mapInPandas kernels as the deterministic-fake fixture
mode. Formats beyond those raise NotImplementedError at the documented
plug point (no media libs in this container); the Spark-side plumbing
— binary columns, explicit output schemas, partition-preserving batch
iteration — is identical either way.

Test binary payloads for the ORACLE path are derived from
documents.text (utf-8 encode) so DuckDB verifies byte lengths,
checksums and the fake-decoded metadata bit-for-bit; the REAL codec
path is pytest-verified pixel-for-pixel on hand-built BMP/PPM/PNG/GIF bytes
(tests/test_multimodal_codec.py).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register


# ---------------------------------------------------------------------------
# Real image codecs: pure-Python BMP (24-bit BI_RGB) and PPM (P6/P3)
# decode — no media libs needed. These sit behind the same plug point
# the deterministic fake uses, so the distributed kernels run either a
# REAL decode (magic-sniffed) or the fixture fake (oracle path),
# mirroring how sources/xdr_codec.py pairs a real RFC 4506 codec with
# the JSON fixture dual.
# ---------------------------------------------------------------------------


from history_collector_spark.functions.codec_errors import (  # noqa: E402
    ImageDecodeError,
)


def decode_bmp(data: bytes):
    """Decode a BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed
    BI_RGB) into an (height, width, 3) uint8 RGB numpy array.

    Handles the three spec quirks that matter: rows are padded to
    4-byte multiples, stored bottom-up when height > 0 (top-down when
    negative), and pixels are BGR order on disk.
    """
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ImageDecodeError("not a BMP payload")
    (pix_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ImageDecodeError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ImageDecodeError(
            f"only 24-bit BI_RGB supported, got bpp={bpp} comp={compression}"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ImageDecodeError(f"degenerate dimensions {width}x{height}")
    stride = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    need = pix_offset + stride * height
    if len(data) < need:
        raise ImageDecodeError(f"truncated pixel data: {len(data)} < {need}")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * height,
                        offset=pix_offset)
    rows = raw.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels) -> bytes:
    """Inverse of decode_bmp (24-bit bottom-up BI_RGB) — the fixture
    writer for tests, same role as xdr_codec's inline XDR writer."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    height, width, _ = px.shape
    stride = (width * 3 + 3) // 4 * 4
    body = np.zeros((height, stride), dtype=np.uint8)
    body[:, : width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
    pix = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
    return header + dib + pix


def decode_ppm(data: bytes):
    """Decode a PPM image (binary P6 or ASCII P3) into an
    (height, width, 3) uint8 RGB numpy array. Header tokens may be
    separated by arbitrary whitespace and '#' comments per the netpbm
    spec; only maxval <= 255 (1 byte/sample) is supported."""
    import numpy as np

    if data[:2] not in (b"P6", b"P3"):
        raise ImageDecodeError("not a PPM payload")
    binary = data[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(data):
            raise ImageDecodeError("truncated PPM header")
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            try:
                tokens.append(int(data[start:pos]))
            except ValueError as exc:  # non-digit garbage in header
                raise ImageDecodeError(
                    f"bad PPM header token {data[start:pos][:12]!r}"
                ) from exc
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ImageDecodeError(f"degenerate dimensions {width}x{height}")
    if maxval > 255:
        raise ImageDecodeError("16-bit PPM not supported")
    n = width * height * 3
    if binary:
        pos += 1  # exactly one whitespace byte after maxval
        if len(data) < pos + n:
            raise ImageDecodeError("truncated PPM pixel data")
        raw = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    else:
        raw = np.array(data[pos:].split()[:n], dtype=np.uint8)
        if raw.size != n:
            raise ImageDecodeError("truncated PPM pixel data")
    return raw.reshape(height, width, 3).copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit depth only): gray, RGB, gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw, height: int, stride: int, bpp: int):
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).

    raw holds height x (1 filter byte + stride pixel bytes). Up/None rows
    vectorize across the row; Sub/Average/Paeth carry a left-neighbor
    dependency so they walk bytes — fine for the tiny synthetic images in
    the kernel (the 100 TB path prunes by metadata before any decode)."""
    import numpy as np

    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = int(raw[pos])
        pos += 1
        row = raw[pos : pos + stride].astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ft == 1:  # Sub
                    pred = a
                elif ft == 3:  # Average
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ImageDecodeError(f"bad PNG filter type {ft} on row {y}")
        out[y] = cur.astype(np.uint8)
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unpack_subbyte(rows, width: int, depth: int):
    """(h, packed_stride) uint8 -> (h, width) palette indices for
    depth in {1, 2, 4} (big-endian bit packing within each byte)."""
    import numpy as np

    bits = np.unpackbits(rows, axis=1)
    n = bits.shape[1] // depth
    vals = np.zeros((rows.shape[0], n), dtype=np.uint8)
    for j in range(depth):
        vals = (vals << 1) | bits[:, j::depth][:, :n]
    return vals[:, :width]


def _png_decode_planes(plain, width, height, depth, ch, interlace):
    """Unfilter the inflated pixel stream into an (h, w, ch) uint8 array
    of RAW samples (palette indices when ch == 1 and depth < 8 callers
    pass ch=1). Handles both sequential and Adam7 layouts; each Adam7
    pass is an independently filtered sub-image scattered back onto the
    (dy, dx) grid."""
    import numpy as np

    def stride_of(w):
        return (w * ch * depth + 7) // 8

    bpp = max(1, ch * depth // 8)
    passes = (
        _ADAM7 if interlace else ((0, 0, 1, 1),)
    )
    expected = 0
    dims = []
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        dims.append((pw, ph))
        if pw and ph:
            expected += ph * (1 + stride_of(pw))
    if len(plain) != expected:
        raise ImageDecodeError(
            f"PNG pixel stream {len(plain)} != expected {expected}"
        )
    raw = np.frombuffer(plain, dtype=np.uint8)
    out = np.zeros((height, width, ch), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if not (pw and ph):
            continue
        stride = stride_of(pw)
        n = ph * (1 + stride)
        rows = _png_unfilter(raw[pos : pos + n], ph, stride, bpp=bpp)
        pos += n
        if depth == 8:
            px = rows.reshape(ph, pw, ch)
        elif depth == 16:
            # big-endian 16-bit samples -> high byte (the standard
            # 16->8 downconversion, v >> 8)
            px = (
                rows.reshape(ph, pw, ch, 2)[:, :, :, 0]
            )
        else:  # sub-byte palette indices, ch == 1
            px = _unpack_subbyte(rows, pw, depth)[:, :, None]
        out[y0::dy, x0::dx] = px
    return out


def decode_png(data: bytes):
    """Decode a PNG into an (height, width, channels) uint8 numpy array
    — stdlib zlib inflate of the concatenated IDAT stream plus full
    five-filter scanline unfiltering; no media libs. Supported: 8-bit
    and 16-bit color types 0/2/4/6 (16-bit downconverts to the high
    byte), palette (type 3) at depths 1/2/4/8 with optional tRNS
    alpha (-> RGBA), and Adam7 interlacing for all of those."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_MAGIC:
        raise ImageDecodeError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    plte, trns = None, None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        # the full chunk is length + 12 bytes (len, type, body, CRC);
        # a payload truncated INSIDE the trailing CRC must fail as a
        # decode error, not a raw struct.error
        if pos + 12 + length > len(data):
            raise ImageDecodeError("truncated PNG chunk")
        body = data[pos + 8 : pos + 8 + length]
        expect_crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect_crc:
            raise ImageDecodeError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            # a CRC-valid IHDR with the wrong body size must degrade to
            # a decode error, not escape as a raw struct.error
            if len(body) != 13:
                raise ImageDecodeError(
                    f"bad IHDR length {len(body)} (must be 13)"
                )
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ImageDecodeError(f"bad PLTE length {length}")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ImageDecodeError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if color_type == 3:
        if depth not in (1, 2, 4, 8):
            raise ImageDecodeError(
                f"bad palette PNG depth {depth} (must be 1/2/4/8)"
            )
    elif color_type in _PNG_CHANNELS:
        if depth not in (8, 16):
            raise ImageDecodeError(
                f"PNG depth {depth} unsupported for color type "
                f"{color_type} (must be 8 or 16)"
            )
    else:
        raise ImageDecodeError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ImageDecodeError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ImageDecodeError(f"bad PNG interlace method {interlace}")
    if width == 0 or height == 0:
        raise ImageDecodeError(f"degenerate dimensions {width}x{height}")
    if not idat:
        raise ImageDecodeError("PNG missing IDAT")
    try:
        plain = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ImageDecodeError(f"PNG inflate failed: {exc}") from exc
    if color_type == 3:
        if plte is None:
            raise ImageDecodeError("palette PNG missing PLTE")
        idx = _png_decode_planes(
            plain, width, height, depth, 1, interlace
        )[:, :, 0]
        if (idx >= len(plte)).any():
            raise ImageDecodeError(
                f"palette index out of range (PLTE has {len(plte)} entries)"
            )
        rgb = plte[idx]
        if trns is None:
            return rgb.copy()
        # tRNS: alpha per palette entry, opaque (255) past its length
        alpha_lut = np.full(len(plte), 255, dtype=np.uint8)
        alpha_lut[: min(len(trns), len(plte))] = trns[: len(plte)]
        return np.dstack([rgb, alpha_lut[idx]])
    ch = _PNG_CHANNELS[color_type]
    return _png_decode_planes(
        plain, width, height, depth, ch, interlace
    ).copy()


def encode_png(pixels, row_filters=None) -> bytes:
    """Inverse of decode_png (8-bit, non-interlaced). ``pixels`` is
    (h, w) gray or (h, w, c) with c in {1, 2, 3, 4}; ``row_filters``
    optionally picks the per-row filter type (default None filter) so
    tests can force every Sub/Up/Average/Paeth path through the
    decoder."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = width * ch
    flat = px.reshape(height, stride).astype(np.int32)
    lines = bytearray()
    for y in range(height):
        ft = int(row_filters[y]) if row_filters is not None else 0
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        filtered = np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ImageDecodeError(f"bad PNG filter type {ft}")
            filtered[x] = (int(row[x]) - pred) & 0xFF
        lines.append(ft)
        lines.extend(filtered.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _pack_subbyte(idx_rows, depth: int) -> bytes:
    """(h, w) uint8 indices -> packed big-endian depth-bit rows, each
    row padded to a byte boundary (inverse of _unpack_subbyte)."""
    import numpy as np

    h, w = idx_rows.shape
    per = 8 // depth
    padded_w = (w + per - 1) // per * per
    padded = np.zeros((h, padded_w), dtype=np.uint8)
    padded[:, :w] = idx_rows
    bits = np.zeros((h, padded_w * depth), dtype=np.uint8)
    for j in range(depth):
        bits[:, j::depth] = (padded >> (depth - 1 - j)) & 1
    return np.packbits(bits, axis=1).tobytes()


def encode_png_palette(
    indices, palette, trns=None, depth: int = 8, interlace: int = 0
) -> bytes:
    """Build a color-type-3 PNG from an (h, w) index array and an
    (n, 3) palette; optional tRNS per-entry alpha; depth in {1,2,4,8};
    optional Adam7 interlacing (filter type 0 on every scanline). A
    fixture builder for the decoder tests and the rotating driver
    fixtures — exercises the exact byte layout decode_png parses."""
    import struct
    import zlib

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    height, width = idx.shape
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    lines = bytearray()
    for x0, y0, dx, dy in passes:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        if depth == 8:
            rows = sub.tobytes()
            stride = sub.shape[1]
        else:
            rows = _pack_subbyte(sub, depth)
            stride = (sub.shape[1] * depth + 7) // 8
        for y in range(sub.shape[0]):
            lines.append(0)  # filter None
            lines.extend(rows[y * stride : (y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, interlace)
    out = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(
            b"tRNS", np.asarray(trns, dtype=np.uint8).tobytes()
        )
    out += _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    return out + _png_chunk(b"IEND", b"")


def encode_png_adam7(pixels) -> bytes:
    """Adam7-interlaced truecolor/gray PNG fixture builder (filter 0
    rows): same channel mapping as encode_png, interlace method 1."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    lines = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        flat = sub.reshape(ph, pw * ch)
        for y in range(ph):
            lines.append(0)
            lines.extend(flat[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _gif_lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF-variant LZW: variable-width codes packed LSB-first, CLEAR
    resets the table, widths grow to a 12-bit cap."""
    if not (1 <= min_code_size <= 8):
        # root codes are palette indices, so > 8 bits is malformed
        raise ImageDecodeError(
            f"bad GIF LZW minimum code size {min_code_size}"
        )
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + code_size <= total:
        code = 0
        for i in range(code_size):
            code |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ImageDecodeError(f"bad first LZW code {code}")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ImageDecodeError(f"LZW code {code} out of range")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def decode_gif(data: bytes):
    """Decode the FIRST frame of a GIF87a/89a into an (height, width, 3)
    uint8 RGB numpy array — from-scratch LZW (variable-width LSB-first
    codes, 12-bit cap), global/local color tables, and Adam-less GIF
    4-pass interlacing. Animation beyond frame one and transparency
    compositing are out of scope (the frame's palette pixels are
    returned as-is)."""
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF payload")
    if len(data) < 13:
        raise ImageDecodeError("truncated GIF header")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ImageDecodeError("truncated GIF global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ImageDecodeError(f"unexpected GIF block 0x{b0:02x}")
        if pos + 10 > len(data):
            raise ImageDecodeError("truncated GIF image descriptor")
        ileft, itop, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
        iflags = data[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ImageDecodeError("truncated GIF local color table")
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ImageDecodeError("GIF image has no color table")
        if iw == 0 or ih == 0:
            raise ImageDecodeError(f"degenerate dimensions {iw}x{ih}")
        if pos >= len(data):
            raise ImageDecodeError("truncated before GIF LZW stream")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(min_code, bytes(lzw))
        if len(idx) < iw * ih:
            raise ImageDecodeError(
                f"GIF pixel stream {len(idx)} < expected {iw * ih}"
            )
        rows = np.frombuffer(
            bytes(idx[: iw * ih]), np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter = np.zeros_like(rows)
            deinter[order] = rows
            rows = deinter
        if int(rows.max(initial=0)) >= len(pal):
            raise ImageDecodeError("GIF pixel index outside color table")
        # honor the logical screen: a first frame smaller than (or
        # offset within) the screen is composited onto a background-
        # color canvas of the SCREEN size — previously frame dims were
        # silently reported as image dims
        lw, lh = struct.unpack_from("<HH", data, 6)
        if ileft + iw > lw or itop + ih > lh:
            raise ImageDecodeError(
                f"GIF frame {iw}x{ih}+{ileft}+{itop} exceeds "
                f"logical screen {lw}x{lh}"
            )
        if (ileft, itop) != (0, 0) or (iw, ih) != (lw, lh):
            if gct is None:
                raise ImageDecodeError(
                    "GIF offset/partial frame without a global color "
                    "table to supply the background"
                )
            bg = data[11]
            if bg >= len(gct):
                raise ImageDecodeError(
                    "GIF background index outside global color table"
                )
            canvas = np.broadcast_to(
                gct[bg], (lh, lw, 3)
            ).copy()
            canvas[itop : itop + ih, ileft : ileft + iw] = pal[rows]
            return canvas
        return pal[rows].copy()
    raise ImageDecodeError("GIF has no image descriptor")


def decode_gif_anim(data: bytes, max_frames: int | None = None):
    """Decode EVERY frame of an animated GIF89a with compositing:
    returns a list of ``(delay_cs, canvas)`` where each canvas is an
    (screen_h, screen_w, 4) uint8 RGBA snapshot AFTER that frame is
    drawn. The Graphic Control Extension drives per-frame delay,
    transparency (transparent-index pixels leave the canvas
    untouched) and disposal: 0/1 none, 2 restore-to-background
    (the frame rect clears to transparent — the browser convention),
    3 restore-to-previous. The canvas starts fully transparent.
    Same LZW / color-table / interlace machinery as
    :func:`decode_gif`; structural damage raises ImageDecodeError."""
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF payload")
    if len(data) < 13:
        raise ImageDecodeError("truncated GIF header")
    lw, lh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ImageDecodeError("truncated GIF global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((lh, lw, 4), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    # pending Graphic Control Extension state (applies to next image)
    delay_cs, disposal, trans_idx = 0, 0, None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            if pos + 2 > len(data):
                raise ImageDecodeError("truncated GIF extension")
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                if pos >= len(data) or data[pos] != 4 or pos + 5 > len(data):
                    raise ImageDecodeError("bad GIF graphic control")
                packed = data[pos + 1]
                disposal = (packed >> 2) & 7
                delay_cs = struct.unpack_from("<H", data, pos + 2)[0]
                trans_idx = data[pos + 4] if packed & 1 else None
                pos += 5
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ImageDecodeError(f"unexpected GIF block 0x{b0:02x}")
        if max_frames is not None and len(frames) >= max_frames:
            break
        if pos + 10 > len(data):
            raise ImageDecodeError("truncated GIF image descriptor")
        ileft, itop, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
        iflags = data[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ImageDecodeError("truncated GIF local color table")
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ImageDecodeError("GIF image has no color table")
        if iw == 0 or ih == 0:
            raise ImageDecodeError(f"degenerate dimensions {iw}x{ih}")
        if ileft + iw > lw or itop + ih > lh:
            raise ImageDecodeError(
                f"GIF frame {iw}x{ih}+{ileft}+{itop} exceeds "
                f"logical screen {lw}x{lh}"
            )
        if pos >= len(data):
            raise ImageDecodeError("truncated before GIF LZW stream")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _gif_lzw_decode(min_code, bytes(lzw))
        if len(idx) < iw * ih:
            raise ImageDecodeError(
                f"GIF pixel stream {len(idx)} < expected {iw * ih}"
            )
        rows = np.frombuffer(bytes(idx[: iw * ih]), np.uint8).reshape(
            ih, iw
        )
        if iflags & 0x40:
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter = np.zeros_like(rows)
            deinter[order] = rows
            rows = deinter
        if int(rows.max(initial=0)) >= len(pal):
            raise ImageDecodeError("GIF pixel index outside color table")
        rect = canvas[itop : itop + ih, ileft : ileft + iw]
        saved = rect.copy() if disposal == 3 else None
        opaque = (
            np.ones((ih, iw), dtype=bool)
            if trans_idx is None
            else rows != trans_idx
        )
        rect[opaque, :3] = pal[rows][opaque]
        rect[opaque, 3] = 255
        frames.append((delay_cs, canvas.copy()))
        if disposal == 2:  # restore to background -> transparent
            rect[:] = 0
        elif disposal == 3:  # restore to previous
            rect[:] = saved
        delay_cs, disposal, trans_idx = 0, 0, None
    if not frames:
        raise ImageDecodeError("GIF has no image descriptor")
    return frames


def _gif_count_frames(data: bytes) -> int:
    """Cheap image-descriptor count (no LZW decode) — the GIF
    equivalent of parse_webp_info's ANMF count, used by decode_blob
    to report true n_frames for animations."""
    import struct

    if len(data) < 13:
        return 0
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    n = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C or pos + 10 > len(data):
            break
        n += 1
        iflags = data[pos + 9]
        pos += 10
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        if pos >= len(data):
            break
        pos += 1  # LZW min code size
        while pos < len(data) and data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
    return n


def _gif_palettize(px, mask):
    """(h, w, 3) + opaque mask -> (palette rows, index array,
    transparent index or None); the transparent slot is appended
    after the real colors."""
    import numpy as np

    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    idx = inv.reshape(px.shape[:2]).astype(np.uint8)
    trans = None
    if mask is not None and not mask.all():
        trans = len(pal)
        pal = np.concatenate([pal, [[0, 0, 0]]], axis=0)
        idx = idx.copy()
        idx[~mask] = trans
    if len(pal) > 256:
        raise ImageDecodeError("encode_gif needs <= 256 distinct colors")
    return pal, idx, trans


def _gif_literal_lzw(idx, bits: int) -> bytes:
    """Index array -> sub-blocked always-CLEAR literal LZW stream."""
    clear, end = 1 << bits, (1 << bits) + 1
    width = bits + 1
    stream = bytearray()
    acc = nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in idx.ravel():
        put(clear)
        put(int(v))
    put(end)
    if nbits:
        stream.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes([bits]) + bytes(blocks)


def encode_gif_anim(frames, screen_w: int, screen_h: int) -> bytes:
    """Animated-GIF writer for fixtures: GIF89a, one Graphic Control
    Extension + image descriptor per frame. ``frames`` is a list of
    dicts with keys px ((h, w, 3) uint8), left, top, delay_cs,
    disposal (0-3), and optional mask ((h, w) bool, True = opaque —
    masked-out pixels become the frame's transparent index). Each
    frame carries a LOCAL color table; there is no global one, so
    decoders must honor per-frame palettes."""
    import struct

    out = bytearray(
        b"GIF89a" + struct.pack("<HHBBB", screen_w, screen_h, 0, 0, 0)
    )
    for f in frames:
        pal, idx, trans = _gif_palettize(f["px"], f.get("mask"))
        bits = max(2, int(len(pal) - 1).bit_length())
        import numpy as np

        table = np.zeros((1 << bits, 3), np.uint8)
        table[: len(pal)] = pal
        packed = (f.get("disposal", 0) & 7) << 2
        if trans is not None:
            packed |= 1
        out += bytes([0x21, 0xF9, 4, packed])
        out += struct.pack("<H", f.get("delay_cs", 0))
        out += bytes([trans or 0, 0])
        h, w = idx.shape
        out += b"\x2C" + struct.pack(
            "<HHHH", f.get("left", 0), f.get("top", 0), w, h
        )
        out += bytes([0x80 | ((bits - 1) & 7)])  # local color table
        out += table.tobytes()
        out += _gif_literal_lzw(idx, bits)
    out += b"\x3B"
    return bytes(out)


def encode_gif(pixels, interlaced: bool = False) -> bytes:
    """Inverse for tests: palette-ize the (h, w, 3) array (<=256 distinct
    colors) and emit a GIF87a with an always-CLEAR LZW stream (each
    pixel as a literal code between CLEAR resets — valid, just
    uncompressed; the decoder's dictionary growth is exercised by
    hand-built streams in the test suite)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ImageDecodeError("encode_gif needs <= 256 distinct colors")
    bits = max(2, int(len(pal) - 1).bit_length())
    psize = 1 << bits
    table = np.zeros((psize, 3), np.uint8)
    table[: len(pal)] = pal
    idx = inv.reshape(h, w).astype(np.uint8)
    if interlaced:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]
    min_code = bits
    clear, end = 1 << bits, (1 << bits) + 1
    width = bits + 1
    stream = bytearray()
    acc = nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in idx.ravel():
        put(clear)
        put(int(v))
    put(end)
    if nbits:
        stream.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + table.tobytes()
        + b"\x2C"
        + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlaced else 0])
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3B"
    )


def decode_image(data: bytes):
    """Magic-sniffed pixel decode -> (height, width, 3) uint8 RGB.

    PNG gray / gray+alpha are broadcast to 3 channels and RGBA drops
    alpha, so every codec lands on the same RGB contract; use
    decode_png directly when the alpha plane matters. GIF decodes its
    first frame through the palette."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P3"):
        return decode_ppm(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data[:8] == _PNG_MAGIC:
        import numpy as np

        px = decode_png(data)
        ch = px.shape[2]
        if ch in (1, 2):  # gray / gray+alpha -> replicate luma
            return np.repeat(px[:, :, :1], 3, axis=2).copy()
        return px[:, :, :3].copy()  # RGB passthrough / RGBA drops alpha
    if data[:2] == b"\xff\xd8":
        from history_collector_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from history_collector_spark.functions.webp import decode_webp

        return decode_webp(data)[:, :, :3].copy()  # RGBA -> drop alpha
    raise NotImplementedError(
        f"no codec for magic {data[:4]!r}; BMP (24-bit), PPM, PNG "
        "(8-bit), GIF, WebP (VP8L lossless + VP8 lossy key frames), "
        "and baseline JPEG are built in, other formats plug in here"
    )


def decode_blob(data: bytes, fake: bool = False) -> dict:
    """Decode one media blob into metadata.

    ``fake=False`` (real mode) magic-sniffs the payload and runs the
    built-in pure-Python codec (BMP 24-bit BI_RGB; PPM P6/P3; PNG
    8/16-bit + palette + Adam7; GIF first-frame; JPEG baseline,
    progressive, and Adobe CMYK/YCCK); formats without a built-in
    codec raise NotImplementedError at the documented plug point —
    WebP variants that reach only metadata grade (e.g. an extended
    container whose sub-stream is header-only) come back as
    decode_status='ok-meta' with real dimensions/flags via
    functions/webp.py:parse_webp_info. Lossy VP8 key frames decode to
    real pixels through the from-scratch RFC 6386 decoder
    (functions/vp8.py), and animated VP8X containers composite to
    the first canvas frame (round 13) with n_frames reporting the
    true ANMF count. ``fake=True`` is the fixture mode: metadata
    derived from the payload's sha256, so the DuckDB oracles verify
    the full distributed path over synthetic text blobs.
    """
    if not fake:
        is_webp = data[:4] == b"RIFF" and data[8:12] == b"WEBP"
        try:
            px = decode_image(data)  # NotImplementedError: unknown magic
        except NotImplementedError:
            if is_webp:
                from history_collector_spark.functions.webp import (
                    parse_webp_info,
                )

                info = parse_webp_info(data)
                return {
                    "width": info["width"],
                    "height": info["height"],
                    "n_frames": info["n_frames"],
                    "decode_status": "ok-meta",
                }
            raise
        n_frames = 1
        if is_webp:
            from history_collector_spark.functions.webp import (
                parse_webp_info,
            )

            n_frames = parse_webp_info(data)["n_frames"]
        elif data[:6] in (b"GIF87a", b"GIF89a"):
            n_frames = max(1, _gif_count_frames(data))
        return {
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "n_frames": n_frames,
            "decode_status": "ok",
        }
    h = hashlib.sha256(data).hexdigest()
    return {
        "width": int(h[0:4], 16) % 1920,
        "height": int(h[4:8], 16) % 1080,
        "n_frames": int(h[8:12], 16) % 300,
        "decode_status": "ok",
    }


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("decode_status", StringType()),
    ]
)


_FEATURE_SCHEMA = (
    "doc_id bigint, "
    + ", ".join(f"hist_{b} double" for b in range(8))
    + ", mean_byte double"
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: 8-bin byte histogram + mean
    byte value per blob. Unlike the decode stub this is REAL signal
    computation — numpy bincount over the raw bytes, vectorized per
    blob, one batch in flight. (Bins land as scalar columns; the
    array-typed feature path is exercised by the `embeddings` table
    operators.)"""
    import numpy as np

    for pdf in batches:
        hists, means = [], []
        for b in pdf["data"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            counts = np.bincount(arr >> 5, minlength=8)[:8]
            hists.append(counts / arr.size)
            means.append(int(arr.sum()) / arr.size)
        hmat = np.stack(hists)
        out = {"doc_id": pdf["doc_id"].values}
        out.update({f"hist_{b}": hmat[:, b] for b in range(8)})
        out["mean_byte"] = means
        yield pd.DataFrame(out)


_RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "out_width int, out_height int, resize_status string"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-fit resize planning to a 256x256 box, integer math (so
    the oracle reproduces it bit-for-bit). The pixel resample kernel
    itself would sit at the marked point; dims come from the decode
    stub."""
    import numpy as np

    for pdf in batches:
        meta = [decode_blob(bytes(b), fake=True) for b in pdf["data"]]
        w = np.array([m["width"] for m in meta], dtype=np.int64)
        h = np.array([m["height"] for m in meta], dtype=np.int64)
        degenerate = (w == 0) | (h == 0)
        fits = (w <= 256) & (h <= 256)
        wide = w >= h
        # floor-div aspect fit, clamped to >= 1 on extreme ratios
        ow = np.where(fits, w, np.where(wide, 256, np.maximum(1, w * 256 // h)))
        oh = np.where(fits, h, np.where(wide, np.maximum(1, h * 256 // w), 256))
        status = np.where(
            degenerate, "skip", np.where(fits, "noop", "resized")
        )
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "out_width": pd.array(ow, dtype="Int32"),
                "out_height": pd.array(oh, dtype="Int32"),
                "resize_status": status,
            }
        )
        out.loc[degenerate, ["out_width", "out_height"]] = pd.NA
        # NOTE: real pixel resampling (PIL/cv2) plugs in HERE, mapping
        # pdf["data"] -> resized bytes at (out_width, out_height)
        yield out


def _decode_batches_mode(fake: bool):
    """Arrow-batched decode kernel factory: one pandas frame in, one
    out, per batch; never materializes more than one batch. The SAME
    kernel runs real (magic-sniffed BMP/PPM codec) or fixture-fake —
    only the closure flag differs, so the pytest that decodes a real
    hand-built BMP exercises the identical distributed path the
    oracle-verified query uses."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf["data"]:
                try:
                    metas.append(decode_blob(bytes(b), fake=fake))
                except (ImageDecodeError, NotImplementedError) as e:
                    metas.append(
                        {
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "decode_status": f"error: {type(e).__name__}",
                        }
                    )
            out = pd.DataFrame(metas)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["n_frames"] = out["n_frames"].astype("Int32")
            out.insert(0, "n_bytes", [len(b) for b in pdf["data"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in _DECODE_SCHEMA.fields]]

    return _decode_batches


_PIXEL_SCHEMA = "doc_id bigint, y int, x int, r int, g int, b int"


def _pixel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real pixel decode through the Arrow path: every blob becomes
    (doc_id, y, x, r, g, b) rows — the fan-out that feeds per-pixel /
    per-tile downstream ops. Row-major flatten is numpy-vectorized;
    undecodable blobs contribute zero rows (the metadata kernel is the
    place that reports errors)."""
    import numpy as np

    for pdf in batches:
        frames = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["data"]):
            try:
                px = decode_image(bytes(blob))
            except (ImageDecodeError, NotImplementedError):
                continue
            h, w, _ = px.shape
            yy, xx = np.divmod(np.arange(h * w), w)
            flat = px.reshape(-1, 3).astype("int32")
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": np.full(h * w, doc_id, dtype="int64"),
                        "y": yy.astype("int32"),
                        "x": xx.astype("int32"),
                        "r": flat[:, 0],
                        "g": flat[:, 1],
                        "b": flat[:, 2],
                    }
                )
            )
        yield (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {k: pd.Series(dtype=t) for k, t in [
                    ("doc_id", "int64"), ("y", "int32"), ("x", "int32"),
                    ("r", "int32"), ("g", "int32"), ("b", "int32"),
                ]}
            )
        )


def decode_images(blobs: DataFrame, fake: bool = False) -> DataFrame:
    """Public decode API: (doc_id, data: binary) -> typed metadata via
    the Arrow-batched kernel, real codec by default."""
    return blobs.mapInPandas(_decode_batches_mode(fake), schema=_DECODE_SCHEMA)


def decode_image_pixels(blobs: DataFrame) -> DataFrame:
    """Public pixel-decode API: (doc_id, data: binary) -> one row per
    pixel, real codec only."""
    return blobs.mapInPandas(_pixel_batches, schema=_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# REAL-codec roundtrip, driver-verified: deterministic BMPs are built
# per doc (encode_bmp), decoded back through the real magic-sniffed
# codec, and the pixels are checksummed — the DuckDB oracle computes
# every output (dims, file size incl. row padding, pixel sum) from the
# same closed-form generator, so the BMP bit layout itself is under
# the driver's oracle gate, not just pytest.
# ---------------------------------------------------------------------------


def _bmp_roundtrip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 3 + d % 5, 2 + d % 3
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.uint8)
            blob = encode_bmp(px)
            meta = decode_blob(blob)  # REAL decode: magic-sniffed BMP path
            back = decode_image(blob)
            rows.append(
                (
                    d,
                    len(blob),
                    meta["width"],
                    meta["height"],
                    int(back.astype(np.int64).sum()),
                    meta["decode_status"]
                    if np.array_equal(back, px)
                    else "pixel_mismatch",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_bytes", "width", "height", "pixel_sum",
                "decode_status",
            ],
        )


@register(
    "multimodal_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 7 = 0
    )
    -- fixed-bound grid (max 4x7x3), filtered per doc: this DuckDB
    -- build rejects lateral column bounds in range()
    SELECT d.doc_id,
           CAST(54 + ((d.w * 3 + 3) // 4 * 4) * d.h AS BIGINT) AS n_bytes,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(sum((d.doc_id * 31 + y.y * 7 + x.x * 3 + c.c) % 256)
                AS BIGINT) AS pixel_sum,
           'ok' AS decode_status
    FROM dims d, range(0, 4) y(y), range(0, 7) x(x), range(0, 3) c(c)
    WHERE y.y < d.h AND x.x < d.w
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-then-decode REAL BMPs (24-bit BI_RGB with 4-byte row
    padding) for a sampled doc set and verify pixel-for-pixel inside
    the kernel; the oracle recomputes file size (padding included),
    dimensions, and the exact pixel sum from the generator formula.
    Any bit-layout bug — stride, BGR order, bottom-up rows — breaks
    n_bytes or pixel_sum and fails the driver gate.

    Scale shape: pure map over the sampled ids through the Arrow
    path; per-row work is bounded by the tiny synthetic dims."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _bmp_roundtrip_batches,
        schema=(
            "doc_id bigint, n_bytes bigint, width int, height int, "
            "pixel_sum bigint, decode_status string"
        ),
    )


def _png_roundtrip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 2 + d % 6, 1 + d % 4
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 17 + yy * 11 + xx * 5 + cc * 2) % 256).astype(np.uint8)
            # rotate the LAYOUT per doc so all three container shapes
            # exercise in every driver run against ONE oracle formula:
            # 0 -> sequential truecolor with rotating scanline filters
            #      (None/Sub/Up/Average/Paeth all hit every run),
            # 1 -> color-type-3 palette: a 256-entry palette
            #      pal[v] = (v, v+2, v+4) mod 256 with index
            #      v = (d*17 + y*11 + x*5) % 256 reproduces the EXACT
            #      same pixels, so the oracle needs no palette branch,
            # 2 -> Adam7-interlaced truecolor (7-pass scatter).
            variant = d % 3
            if variant == 1:
                idx = ((d * 17 + yy[:, :, 0] * 11 + xx[:, :, 0] * 5)
                       % 256).astype(np.uint8)
                pal = np.stack(
                    [
                        np.arange(256, dtype=np.int64) + 2 * c
                        for c in range(3)
                    ],
                    axis=1,
                ) % 256
                blob = encode_png_palette(idx, pal.astype(np.uint8))
            elif variant == 2:
                blob = encode_png_adam7(px)
            else:
                filters = [(d + y) % 5 for y in range(h)]
                blob = encode_png(px, row_filters=filters)
            meta = decode_blob(blob)  # REAL decode: magic-sniffed PNG path
            back = decode_image(blob)
            rows.append(
                (
                    d,
                    meta["width"],
                    meta["height"],
                    int(back.astype(np.int64).sum()),
                    meta["decode_status"]
                    if np.array_equal(back, px)
                    else "pixel_mismatch",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "pixel_sum", "decode_status"],
        )


@register(
    "multimodal_decode_png",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 2 + doc_id % 6 AS w, 1 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 11 = 0
    )
    -- fixed-bound grid (max 4x7x3), filtered per doc: this DuckDB
    -- build rejects lateral column bounds in range()
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(sum((d.doc_id * 17 + y.y * 11 + x.x * 5 + c.c * 2) % 256)
                AS BIGINT) AS pixel_sum,
           'ok' AS decode_status
    FROM dims d, range(0, 4) y(y), range(0, 7) x(x), range(0, 3) c(c)
    WHERE y.y < d.h AND x.x < d.w
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-then-decode REAL PNGs (stdlib-zlib IDAT, per-doc rotating
    scanline filters so Sub/Up/Average/Paeth all exercise in every run)
    for a sampled doc set, verifying pixel-for-pixel inside the kernel;
    the oracle recomputes dimensions and the exact pixel sum from the
    generator formula. Any unfilter/inflate/chunk-layout bug breaks
    pixel_sum or flips decode_status and fails the driver gate.
    n_bytes is deliberately NOT emitted — compressed size depends on
    the zlib build, which the SQL oracle cannot reproduce.

    Scale shape: pure map over the sampled ids through the Arrow path;
    per-row work bounded by the tiny synthetic dims (max 4x7)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _png_roundtrip_batches,
        schema=(
            "doc_id bigint, width int, height int, "
            "pixel_sum bigint, decode_status string"
        ),
    )


def _webp_roundtrip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from history_collector_spark.functions.webp import (
        decode_webp,
        encode_webp_vp8l,
    )

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 2 + d % 6, 1 + d % 4
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 17 + yy * 11 + xx * 5 + cc * 2) % 256).astype(np.uint8)
            # rotate the STREAM SHAPE per doc so every driver run
            # exercises all three encoder paths against ONE oracle:
            # 0 -> plain literals, 1 -> subtract-green transform,
            # 2 -> RGBA input (alpha = 255 everywhere, so the pixel
            #      formula is unchanged; exercises the alpha plane)
            variant = d % 3
            if variant == 2:
                rgba = np.concatenate(
                    [px, np.full((h, w, 1), 255, np.uint8)], axis=2
                )
                blob = encode_webp_vp8l(rgba)
            else:
                blob = encode_webp_vp8l(px, subtract_green=variant == 1)
            meta = decode_blob(blob)  # REAL decode: magic-sniffed path
            back = decode_webp(blob)
            ok = (
                np.array_equal(back[:, :, :3], px)
                and (back[:, :, 3] == 255).all()
            )
            rows.append(
                (
                    d,
                    meta["width"],
                    meta["height"],
                    int(back[:, :, :3].astype(np.int64).sum()),
                    meta["decode_status"] if ok else "pixel_mismatch",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "pixel_sum", "decode_status"],
        )


@register(
    "multimodal_decode_webp",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 2 + doc_id % 6 AS w, 1 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(sum((d.doc_id * 17 + y.y * 11 + x.x * 5 + c.c * 2) % 256)
                AS BIGINT) AS pixel_sum,
           'ok' AS decode_status
    FROM dims d, range(0, 4) y(y), range(0, 7) x(x), range(0, 3) c(c)
    WHERE y.y < d.h AND x.x < d.w
    GROUP BY d.doc_id, d.w, d.h
    """,
)
def multimodal_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-then-decode REAL lossless WebP (from-scratch VP8L codec,
    functions/webp.py: RIFF framing, LSB-first bitstream, canonical
    prefix codes, per-doc rotating plain / subtract-green / RGBA
    stream shapes) for a sampled doc set, verifying pixel-for-pixel
    inside the kernel; the oracle recomputes dimensions and the exact
    pixel sum from the generator formula. Any bit-order, canonical-
    code, or transform-inverse bug breaks pixel_sum or flips
    decode_status and fails the driver gate. The LZ77 / color-cache /
    meta-code / predictor / palette DECODE paths (which this literal-
    only encoder never emits) are pinned by hand-built bitstreams in
    tests/test_round10_waves.py.

    Scale shape: pure map over the sampled ids through the Arrow path;
    per-row work bounded by the tiny synthetic dims (max 4x7)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id")
    )
    return spread(docs, spark).mapInPandas(
        _webp_roundtrip_batches,
        schema=(
            "doc_id bigint, width int, height int, "
            "pixel_sum bigint, decode_status string"
        ),
    )


# ---------------------------------------------------------------------------
# Decode-yield scorecard: per-format success/failure counts over a mixed
# asset corpus — the observability a real crawl's decode stage needs
# (what fraction of each format actually decodes, and how failures
# fail). Eight formats (incl. two deliberately undecodable classes) are
# built deterministically per doc and pushed through the REAL magic-
# sniffed codec dispatcher; the oracle predicts every row closed-form,
# so agreement proves each codec path succeeds/fails exactly as
# designed — including that corrupt inputs degrade to the error column
# rather than killing tasks (the graceful-degradation contract).
# ---------------------------------------------------------------------------

_YIELD_FORMATS = (
    "bmp", "ppm", "png", "jpeg", "png_truncated", "webp", "gif",
    "jpeg_cmyk", "webp_lossy", "webp_vp8x",
)


def _vp8_lossy_blob(w: int, h: int, alpha: bool = False) -> bytes:
    """Real lossy-WebP bytes (pinned libwebp encoder output) for the
    scorecard's tiny dimensions — decoded to pixels by the
    from-scratch RFC 6386 key-frame decoder (functions/vp8.py), so
    the lossy arm now lands in the 'ok' column with true dims.
    ``alpha=True`` returns the VP8X + compressed-ALPH still of the
    same dims (also a full pixel decode since round 12)."""
    from history_collector_spark.functions.vp8_fixtures import (
        yield_lossy_blob,
    )

    return yield_lossy_blob(w, h, alpha)


def _vp8_header_only_blob(w: int, h: int) -> bytes:
    """Bare keyframe tag + RFC 6386 start code + 14-bit dims with no
    coefficient partitions — used by the VP8X arm, whose sub-stream
    stays metadata-grade (parse_webp_info never reads past the
    header)."""
    body = (
        b"\x10\x00\x00"  # frame tag: keyframe, version 0, show_frame
        + b"\x9d\x01\x2a"
        + (w & 0x3FFF).to_bytes(2, "little")
        + (h & 0x3FFF).to_bytes(2, "little")
    )
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _still_frame_chunks(blob: bytes) -> bytes:
    """Still WebP -> its ALPH/VP8/VP8L chunk bytes (padded), i.e. the
    payload an ANMF frame carries; VP8X headers are dropped."""
    pos, out = 12, b""
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        clen = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        step = 8 + clen + (clen & 1)
        if tag in (b"ALPH", b"VP8 ", b"VP8L"):
            out += blob[pos : pos + 8 + clen]
            if clen & 1:
                out += b"\x00"
        pos += step
    return out


def _vp8x_blob(w: int, h: int, alpha: bool, real: bool = False) -> bytes:
    """ANIMATED extended-WebP container: VP8X flags + 24-bit canvas
    dims + ANIM/ANMF chunks (two full-canvas frames — the first
    no-blend, the second alpha-blended over it, so both compositing
    branches run). ``real=True`` carries REAL pinned libwebp frame
    payloads (yield_lossy_blob dims only) and decodes to pixels via
    decode_webp_anim (round 13); the default keeps the header-only
    VP8 sub-stream — the metadata-grade fixture parse_webp_info and
    the fuzz sweeps classify without pixel decode."""
    flags = (0x12 if alpha else 0x02).to_bytes(1, "big")  # alpha|anim
    vp8x = (
        b"VP8X" + (10).to_bytes(4, "little")
        + flags + b"\x00\x00\x00"
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )
    anim = b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    if real:
        frame = _still_frame_chunks(_vp8_lossy_blob(w, h, alpha))
    else:
        frame = _vp8_header_only_blob(w, h)[12:]  # VP8 chunk
    body = vp8x + anim
    for dur, fflags in ((40, 0x02), (60, 0x00)):  # no-blend, blend
        anmf_body = (
            b"\x00\x00\x00" * 2  # frame x/2, y/2
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little") + bytes([fflags])
            + frame
        )
        body += b"ANMF" + len(anmf_body).to_bytes(4, "little") + anmf_body
        if len(anmf_body) & 1:
            body += b"\x00"
    return (
        b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
    )


def _yield_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from history_collector_spark.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_cmyk,
    )

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            # sampled ids are multiples of 3, so index by d//3 (d % 9
            # would only ever hit formats 0/3/6 — gcd(3, 9) = 3)
            v = (d // 3) % len(_YIELD_FORMATS)
            fmt = _YIELD_FORMATS[v]
            w, h = 2 + d % 6, 1 + d % 4
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 17 + yy * 11 + xx * 5 + cc * 2) % 256).astype(
                np.uint8
            )
            if fmt == "bmp":
                blob = encode_bmp(px)
            elif fmt == "ppm":
                blob = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
            elif fmt == "png":
                blob = encode_png(px)
            elif fmt == "jpeg":
                blob = encode_jpeg(px)
            elif fmt == "png_truncated":
                whole = encode_png(px)
                blob = whole[: len(whole) // 2]
            elif fmt == "webp":  # VP8L lossless, alternating subtract-green
                from history_collector_spark.functions.webp import (
                    encode_webp_vp8l,
                )

                blob = encode_webp_vp8l(px, subtract_green=bool(d % 2))
            elif fmt == "webp_lossy":
                # pinned real libwebp output: full pixel decode via
                # the from-scratch RFC 6386 key-frame decoder; odd
                # docs take the VP8X+ALPH still of the same dims, so
                # the alpha path rides the same oracle cell
                blob = _vp8_lossy_blob(w, h, alpha=bool(d % 2))
            elif fmt == "webp_vp8x":
                # real two-frame animation since round 13: composites
                # to first-canvas pixels through decode_webp_anim
                blob = _vp8x_blob(w, h, alpha=bool(d % 2), real=True)
            elif fmt == "gif":
                blob = encode_gif(px)
            else:  # jpeg_cmyk: Adobe 4-component, transform 0
                cmyk = np.concatenate(
                    [px, np.full((h, w, 1), 200, np.uint8)], axis=2
                )
                blob = encode_jpeg_cmyk(cmyk, transform=0)
            try:
                meta = decode_blob(blob)
                status = meta["decode_status"]
                pixels = meta["width"] * meta["height"]
            except (ImageDecodeError, NotImplementedError) as e:
                status, pixels = f"error: {type(e).__name__}", 0
            rows.append((fmt, status, pixels))
        yield pd.DataFrame(
            rows, columns=["format", "decode_status", "pixels"]
        )


@register(
    "multimodal_decode_yield",
    oracle="""
    WITH s AS (
      SELECT doc_id, (doc_id // 3) % 10 AS v,
             2 + doc_id % 6 AS w, 1 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT CASE v WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 2 THEN 'png'
                  WHEN 3 THEN 'jpeg' WHEN 4 THEN 'png_truncated'
                  WHEN 5 THEN 'webp' WHEN 6 THEN 'gif'
                  WHEN 7 THEN 'jpeg_cmyk' WHEN 8 THEN 'webp_lossy'
                  ELSE 'webp_vp8x' END AS format,
           CASE WHEN v = 4 THEN 'error: ImageDecodeError'
                ELSE 'ok' END AS decode_status,
           CAST(count(*) AS BIGINT) AS n_assets,
           CAST(sum(CASE WHEN v = 4 THEN 0 ELSE w * h END)
                AS BIGINT) AS total_pixels
    FROM s GROUP BY 1, 2
    """,
)
def multimodal_decode_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format decode yield over a ten-format synthetic asset
    mix (BMP/PPM/PNG/JPEG/GIF/Adobe-CMYK/VP8L-WebP ok-paths, a
    truncated PNG, pinned REAL lossy-VP8 WebP decoded to pixels by
    the from-scratch RFC 6386 key-frame decoder, and — since round 13
    — a two-frame ANIMATED VP8X container carrying real libwebp
    frame payloads, composited to first-canvas pixels by
    decode_webp_anim):
    REAL decodes through the magic dispatcher, aggregated to (format,
    status, count, decoded pixels). The oracle predicts each cell
    closed-form from the generator arithmetic — a wrong-way failure
    (codec crash, wrong error class, wrong dimensions) flips a cell.

    Scale shape: pure map over sampled ids (Arrow batches), then a
    ~7-key aggregate — the map-side-combined scorecard a 100 TB decode
    stage emits per partition for free."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    per_doc = spread(docs, spark).mapInPandas(
        _yield_batches,
        schema="format string, decode_status string, pixels bigint",
    )
    return per_doc.groupBy("format", "decode_status").agg(
        F.count("*").alias("n_assets"),
        F.sum("pixels").alias("total_pixels"),
    )


# ---------------------------------------------------------------------------
# Lossy VP8 key-frame decode: pinned REAL libwebp encoder output pushed
# through the from-scratch RFC 6386 decoder (bool decoder, intra
# prediction, IDCT/WHT, loop filter). The oracle carries the decoded-
# plane ground truth (sums + Y-plane sha prefix) captured under a
# libwebp WebPDecodeYUV bit-equality assert, so any decoder drift —
# probability table, predictor formula, filter arithmetic — flips a
# hash here.
# ---------------------------------------------------------------------------


def _vp8_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from history_collector_spark.functions.vp8 import decode_vp8_frame
    from history_collector_spark.functions.vp8_fixtures import (
        FLAGSHIP_NAMES,
        flagship_blob,
    )
    from history_collector_spark.functions.webp import decode_alpha_chunk

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            name = FLAGSHIP_NAMES[(d // 149) % len(FLAGSHIP_NAMES)]
            blob = flagship_blob(name)
            # RIFF walk: the VP8 frame body + optional ALPH plane
            # (the 'alpha' vector is a VP8X still)
            pos, body, alph = 12, None, None
            while pos + 8 <= len(blob):
                tag = blob[pos : pos + 4]
                clen = int.from_bytes(blob[pos + 4 : pos + 8], "little")
                if tag == b"VP8 " and body is None:
                    body = blob[pos + 8 : pos + 8 + clen]
                elif tag == b"ALPH" and alph is None:
                    alph = blob[pos + 8 : pos + 8 + clen]
                pos += 8 + clen + (clen & 1)
            y, u, v = decode_vp8_frame(body)
            h, w = y.shape
            a_sum = (
                int(decode_alpha_chunk(alph, w, h).astype(np.int64).sum())
                if alph is not None
                else 255 * w * h
            )
            rows.append(
                (
                    name,
                    int(w),
                    int(h),
                    int(y.astype(np.int64).sum()),
                    int(u.astype(np.int64).sum()),
                    int(v.astype(np.int64).sum()),
                    hashlib.sha256(y.tobytes()).hexdigest()[:8],
                    a_sum,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "img", "width", "height", "y_sum", "u_sum", "v_sum",
                "y_sha8", "a_sum",
            ],
        )


@register(
    "multimodal_decode_vp8",
    oracle="""
    WITH s AS (
      SELECT (doc_id // 149) % 5 AS v
      FROM documents WHERE doc_id % 149 = 0
    ),
    p(v, img, width, height, y_sum, u_sum, v_sum, y_sha8, a_sum) AS (
      VALUES
        (0, 'alpha',    48, 32, 192446, 48210, 48662, '4a1b88e5', 193536),
        (1, 'gradient', 48, 32, 187680, 43864, 50015, '68b83152', 391680),
        (2, 'mixed',    48, 32, 185305, 49138, 49133, '6a8e57a4', 391680),
        (3, 'noise',    48, 32, 191288, 48775, 49224, 'ccd98041', 391680),
        (4, 'smooth',   48, 32, 193077, 49259, 47922, 'e70843d9', 391680)
    )
    SELECT p.img, CAST(p.width AS INT) AS width,
           CAST(p.height AS INT) AS height,
           CAST(p.y_sum AS BIGINT) AS y_sum,
           CAST(p.u_sum AS BIGINT) AS u_sum,
           CAST(p.v_sum AS BIGINT) AS v_sum,
           p.y_sha8,
           CAST(p.a_sum AS BIGINT) AS a_sum,
           CAST(count(*) AS BIGINT) AS n_assets
    FROM s JOIN p ON s.v = p.v
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
    """,
)
def multimodal_decode_vp8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-WebP (VP8 key-frame) pixel decode over a sampled asset
    stream: five pinned REAL libwebp-encoded 48x32 vectors (gradient /
    mixed / dense-noise / smooth at qualities 30-90, together
    exercising every coefficient band, whole-block and B_PRED
    prediction, and the normal loop filter — plus a VP8X still whose
    compressed ALPH plane drives the headerless-VP8L alpha decoder)
    are decoded per row by the from-scratch RFC 6386 decoder
    (functions/vp8.py) and reduced to per-image plane sums (incl. the
    alpha plane) + a Y-plane sha prefix. The oracle holds the decoded
    ground truth captured under a libwebp bit-equality assert — this
    is a real-encoder interop gate on every run, like the libzstd arm
    of corpus_zstd_ingest.

    Scale shape: map-only Arrow decode kernel, one ~7-wide aggregate;
    per-asset cost is the honest unit (pure-Python bit loop, so the
    intended corpus grain is thumbnails — a JVM/SIMD kernel slots in
    behind the same contract at 100 TB)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 149 == 0)
        .select("doc_id")
    )
    per_doc = spread(docs, spark).mapInPandas(
        _vp8_decode_batches,
        schema=(
            "img string, width int, height int, y_sum bigint, "
            "u_sum bigint, v_sum bigint, y_sha8 string, a_sum bigint"
        ),
    )
    return per_doc.groupBy(
        "img", "width", "height", "y_sum", "u_sum", "v_sum", "y_sha8",
        "a_sum",
    ).agg(F.count("*").alias("n_assets"))


# ---------------------------------------------------------------------------
# Animated WebP (round 13): ANIM/ANMF containers built from the SAME
# pinned real-libwebp flagship payloads plus VP8L-encoded RGBA tiles,
# composited frame by frame via functions/webp.py:decode_webp_anim.
# The four variants cover every compositing branch: full-canvas
# overwrite sequences, alpha-BLENDED sub-rectangle placement,
# dispose-to-background, and fractional-alpha self-blend through the
# compressed ALPH plane. The oracle carries pinned per-variant canvas
# ground truth (final-canvas sha prefix + all-frame RGBA sums);
# tests/test_round13.py recomputes every canvas INDEPENDENTLY from
# still decodes + a numpy reference composer.
# ---------------------------------------------------------------------------

_ANIM_VARIANTS = ("overwrite2", "blend_tile", "dispose", "alpha_blend")


def _anim_tile_px(w: int, h: int, opaque: bool):
    """Deterministic RGBA tile for the VP8L-encoded animation frames."""
    import numpy as np

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = np.empty((h, w, 4), dtype=np.uint8)
    px[:, :, 0] = (xx * 7 + yy * 3) % 256
    px[:, :, 1] = (xx * 5 + yy * 11 + 40) % 256
    px[:, :, 2] = (xx * 13 + yy * 2 + 80) % 256
    px[:, :, 3] = 255 if opaque else (64 + xx * 16 + yy * 8) % 256
    return px


def _anim_fixture_blob(variant: str) -> bytes:
    """One pinned 48x32 animated container per variant (see module
    comment). Frame payloads are real pinned libwebp output
    (flagship_blob) or exact VP8L tiles; the container framing is the
    spec's VP8X + ANIM + ANMF layout."""
    from history_collector_spark.functions.vp8_fixtures import (
        flagship_blob,
    )
    from history_collector_spark.functions.webp import encode_webp_vp8l

    W, H = 48, 32

    def anmf(x2, y2, fw, fh, dur, fflags, payload):
        body = (
            x2.to_bytes(3, "little") + y2.to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little") + bytes([fflags]) + payload
        )
        out = b"ANMF" + len(body).to_bytes(4, "little") + body
        return out + (b"\x00" if len(body) & 1 else b"")

    still = lambda name: _still_frame_chunks(flagship_blob(name))  # noqa: E731
    tile = lambda px: _still_frame_chunks(encode_webp_vp8l(px))  # noqa: E731

    if variant == "overwrite2":
        frames = [
            anmf(0, 0, W, H, 40, 0x02, still("gradient")),
            anmf(0, 0, W, H, 60, 0x02, still("mixed")),
        ]
    elif variant == "blend_tile":
        frames = [
            anmf(0, 0, W, H, 40, 0x02, still("smooth")),
            anmf(4, 3, 16, 8, 50, 0x00,
                 tile(_anim_tile_px(16, 8, opaque=False))),
        ]
    elif variant == "dispose":
        frames = [
            anmf(0, 0, W, H, 40, 0x02 | 0x01, still("noise")),
            anmf(1, 1, 8, 4, 70, 0x02,
                 tile(_anim_tile_px(8, 4, opaque=True))),
        ]
    else:  # alpha_blend: fractional-alpha still blended over itself
        frames = [
            anmf(0, 0, W, H, 40, 0x02, still("alpha")),
            anmf(0, 0, W, H, 80, 0x00, still("alpha")),
        ]
    vp8x = (
        b"VP8X" + (10).to_bytes(4, "little")
        + bytes([0x12]) + b"\x00\x00\x00"
        + (W - 1).to_bytes(3, "little") + (H - 1).to_bytes(3, "little")
    )
    anim = b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    body = vp8x + anim + b"".join(frames)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def _anim_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from history_collector_spark.functions.webp import decode_webp_anim

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            variant = _ANIM_VARIANTS[(d // 151) % len(_ANIM_VARIANTS)]
            frames = decode_webp_anim(_anim_fixture_blob(variant))
            h, w = frames[0][1].shape[:2]
            rows.append(
                (
                    variant,
                    len(frames),
                    int(w),
                    int(h),
                    int(sum(dur for dur, _ in frames)),
                    hashlib.sha256(frames[-1][1].tobytes()).hexdigest()[:8],
                    int(
                        sum(
                            c.astype(np.int64).sum() for _, c in frames
                        )
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "variant", "n_frames", "width", "height", "dur_ms",
                "last_sha8", "rgba_sum",
            ],
        )


@register(
    "multimodal_decode_anim",
    oracle="""
    WITH s AS (
      SELECT (doc_id // 151) % 4 AS v
      FROM documents WHERE doc_id % 151 = 0
    ),
    p(v, variant, n_frames, width, height, dur_ms, last_sha8,
      rgba_sum) AS (
      VALUES
        (0, 'overwrite2',  2, 48, 32, 100, '6c514ec1', 1882430),
        (1, 'blend_tile',  2, 48, 32,  90, 'a425ac39', 1948197),
        (2, 'dispose',     2, 48, 32, 110, '7348179a',  987622),
        (3, 'alpha_blend', 2, 48, 32, 120, 'f5d7d12b', 1600854)
    )
    SELECT p.variant, CAST(p.n_frames AS INT) AS n_frames,
           CAST(p.width AS INT) AS width,
           CAST(p.height AS INT) AS height,
           CAST(p.dur_ms AS BIGINT) AS dur_ms,
           p.last_sha8,
           CAST(p.rgba_sum AS BIGINT) AS rgba_sum,
           CAST(count(*) AS BIGINT) AS n_assets
    FROM s JOIN p ON s.v = p.v
    GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
)
def multimodal_decode_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-WebP frame decode + compositing over a sampled asset
    stream: four pinned two-frame 48x32 containers (full-canvas
    overwrite, alpha-blended sub-rect tile, dispose-to-background,
    fractional-ALPH self-blend) walk ANIM/ANMF framing and the canvas
    arithmetic of decode_webp_anim, reducing to per-variant frame
    counts, duration sums, all-frame RGBA sums and a final-canvas sha
    prefix. Frame payloads are the SAME real-libwebp pinned vectors
    the still decoder is interop-gated on; the compositing ground
    truth is pinned against an independent numpy reference composer
    (tests/test_round13.py).

    Scale shape: map-only Arrow decode kernel over the sampled ids,
    one bounded (4-variant) aggregate — zero wide exchange; per-asset
    cost is the honest unit, as with multimodal_decode_vp8."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 151 == 0)
        .select("doc_id")
    )
    per_doc = spread(docs, spark).mapInPandas(
        _anim_decode_batches,
        schema=(
            "variant string, n_frames int, width int, height int, "
            "dur_ms bigint, last_sha8 string, rgba_sum bigint"
        ),
    )
    return per_doc.groupBy(
        "variant", "n_frames", "width", "height", "dur_ms",
        "last_sha8", "rgba_sum",
    ).agg(F.count("*").alias("n_assets"))


# ---------------------------------------------------------------------------
# Animated GIF (round 13): the second animated container, through the
# same roundtrip discipline as multimodal_decode_real — deterministic
# three-frame GIF89a animations are BUILT per doc (solid-color frames,
# a transparency-masked tile, disposal none / restore-to-background)
# and decoded back through decode_gif_anim; because the frames are
# solid colors, every composited canvas RGBA sum is stated CLOSED-FORM
# by the oracle, so the GCE parse, transparency masking, disposal
# arithmetic and LZW/palette machinery are all under the driver's
# hash gate, not just pytest.
# ---------------------------------------------------------------------------


def _gif_anim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            W, H = 8 + d % 8, 5 + d % 5
            cA = ((d * 11) % 256, (d * 7) % 256, (d * 3) % 256)
            cB = ((d * 13 + 1) % 256, (d * 5 + 2) % 256,
                  (d * 17 + 3) % 256)
            cC = ((d * 19 + 4) % 256, (d * 23 + 5) % 256,
                  (d * 29 + 6) % 256)
            f1 = np.empty((H, W, 3), np.uint8)
            f1[:] = cA
            t2 = np.empty((3, 4, 3), np.uint8)
            t2[:] = cB
            mask = np.ones((3, 4), bool)
            mask[:, 0] = False  # column 0 transparent
            t3 = np.empty((1, 2, 3), np.uint8)
            t3[:] = cC
            blob = encode_gif_anim(
                [
                    dict(px=f1, delay_cs=d % 10, disposal=1),
                    dict(px=t2, left=2, top=1, delay_cs=d % 7,
                         disposal=2, mask=mask),
                    dict(px=t3, left=6, top=4, delay_cs=d % 5,
                         disposal=1),
                ],
                W, H,
            )
            frames = decode_gif_anim(blob)
            sums = [int(c.astype(np.int64).sum()) for _, c in frames]
            rows.append(
                (
                    d,
                    len(frames),
                    W,
                    H,
                    int(sum(dc for dc, _ in frames)),
                    sums[0],
                    sums[1],
                    sums[2],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "width", "height", "total_delay_cs",
                "sum1", "sum2", "sum3",
            ],
        )


@register(
    "multimodal_decode_gif_anim",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             8 + doc_id % 8 AS W, 5 + doc_id % 5 AS H,
             (doc_id * 11) % 256 + (doc_id * 7) % 256
               + (doc_id * 3) % 256 AS sA,
             (doc_id * 13 + 1) % 256 + (doc_id * 5 + 2) % 256
               + (doc_id * 17 + 3) % 256 AS sB,
             (doc_id * 19 + 4) % 256 + (doc_id * 23 + 5) % 256
               + (doc_id * 29 + 6) % 256 AS sC
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT doc_id,
           CAST(3 AS INT) AS n_frames,
           CAST(W AS INT) AS width, CAST(H AS INT) AS height,
           CAST(doc_id % 10 + doc_id % 7 + doc_id % 5 AS BIGINT)
             AS total_delay_cs,
           -- frame 1: full-screen solid A, fully opaque
           CAST(W * H * (sA + 255) AS BIGINT) AS sum1,
           -- frame 2: 4x3 tile of B at (2,1), column 0 transparent:
           -- 9 opaque pixels replace A
           CAST(W * H * (sA + 255) + 9 * (sB - sA) AS BIGINT) AS sum2,
           -- frame 3: frame 2's rect cleared to transparent
           -- (disposal 2: 9 B-pixels + 3 still-A pixels vanish), then
           -- a 2x1 C tile overwrites A-ground at disjoint (6,4)
           CAST(W * H * (sA + 255) + 9 * (sB - sA)
                - 9 * (sB + 255) - 3 * (sA + 255)
                + 2 * (sC - sA) AS BIGINT) AS sum3
    FROM g
    """,
)
def multimodal_decode_gif_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF decode + compositing over a sampled doc set:
    per doc, a deterministic three-frame GIF89a (full-screen ground,
    a transparency-masked tile with restore-to-background disposal,
    a disjoint second tile) is encoded and decoded back through
    decode_gif_anim, emitting per-frame composited canvas RGBA sums.
    The oracle states every sum closed-form from the generator
    colors, so a single mis-masked pixel, wrong disposal rectangle,
    or off-by-one frame delay flips a row under the driver's hash
    gate. The WebP twin (multimodal_decode_anim) pins real-encoder
    payloads; this one pins the compositing ARITHMETIC exactly.

    Scale shape: pure map over sampled ids through the Arrow path,
    no exchange until the driver collects the tiny result."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id")
    )
    return spread(docs, spark).mapInPandas(
        _gif_anim_batches,
        schema=(
            "doc_id bigint, n_frames int, width int, height int, "
            "total_delay_cs bigint, sum1 bigint, sum2 bigint, "
            "sum3 bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Pure-JVM metadata over binary columns: byte length, sha256 checksum,
# magic-byte prefix — the filter/partition layer that runs BEFORE any
# expensive decode at scale (prune by checksum/dedup first).
# ---------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum,
           lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.encode("text", "utf-8").alias("data")
    )
    return docs.select(
        "doc_id",
        F.length("data").cast("long").alias("n_bytes"),
        F.sha2("data", 256).alias("checksum"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# mapInPandas decode: binary -> typed metadata through the Arrow batch
# path. The oracle recomputes the sha256-derived fake metadata in SQL.
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CAST(concat('0x', substr(sha256(text), 1, 4)) AS INT)
                % 1920 AS INT) AS width,
           CAST(CAST(concat('0x', substr(sha256(text), 5, 4)) AS INT)
                % 1080 AS INT) AS height,
           CAST(CAST(concat('0x', substr(sha256(text), 9, 4)) AS INT)
                % 300 AS INT) AS n_frames,
           'ok' AS decode_status
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return decode_images(docs, fake=True)


# ---------------------------------------------------------------------------
# Frame-sampling plan: pick every k-th frame index up to n_frames — the
# array-expression layer that fans a video row out into frame tasks.
# ---------------------------------------------------------------------------


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(sha256(text), 9, 4)) AS INT)
                  % 300 AS INT) AS n_frames
      FROM documents
    )
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 30)) AS INT) AS frame_idx
    FROM meta WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    n_frames = (
        F.conv(F.substring(F.sha2("data", 256), 9, 4), 16, 10).cast("int") % 300
    )
    meta = docs.select("doc_id", n_frames.alias("n_frames")).filter(
        F.col("n_frames") > 0
    )
    return meta.select(
        "doc_id", "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(30))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# Feature extraction: real numpy signal computation through the Arrow
# batch path — the embed-the-modality step of a training-data pipeline.
# Byte histograms are exact integer counts, so the double division is
# bit-identical between numpy and the oracle.
# ---------------------------------------------------------------------------


@register(
    "multimodal_feature_extract",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(text[i])) AS bytes
      FROM documents
    )
    SELECT doc_id,
           """
    + ",\n           ".join(
        f"CAST(len(list_filter(bytes, x -> x // 32 = {b})) AS DOUBLE)"
        f" / len(bytes) AS hist_{b}"
        for b in range(8)
    )
    + """,
           CAST(list_sum(bytes) AS DOUBLE) / len(bytes) AS mean_byte
    FROM b
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bin byte histogram + mean byte per blob (test payloads are
    ASCII, so the oracle can recompute byte values with ascii()).

    Scale shape: mapInPandas is a pure map stage — no exchange, batches
    stream through Arrow one at a time, and column pruning keeps only
    (doc_id, data) in the scan. At 100 TB this is embarrassingly
    parallel; the feature column lands ready for the ANN/dedup
    operators downstream.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return docs.mapInPandas(_feature_batches, schema=_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize planning: integer aspect-fit into a 256x256 box. The pixel
# kernel is the stubbed point (no media libs in this container); the
# dimension math, null handling for degenerate inputs, and Arrow batch
# plumbing are real and oracle-verified.
# ---------------------------------------------------------------------------


@register(
    "multimodal_resize",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(sha256(text), 1, 4)) AS INT)
                  % 1920 AS INT) AS width,
             CAST(CAST(concat('0x', substr(sha256(text), 5, 4)) AS INT)
                  % 1080 AS INT) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
      CAST(CASE WHEN width = 0 OR height = 0 THEN NULL
                WHEN width <= 256 AND height <= 256 THEN width
                WHEN width >= height THEN 256
                ELSE greatest(1, (width * 256) // height) END AS INT)
        AS out_width,
      CAST(CASE WHEN width = 0 OR height = 0 THEN NULL
                WHEN width <= 256 AND height <= 256 THEN height
                WHEN width >= height THEN greatest(1, (height * 256) // width)
                ELSE 256 END AS INT) AS out_height,
      CASE WHEN width = 0 OR height = 0 THEN 'skip'
           WHEN width <= 256 AND height <= 256 THEN 'noop'
           ELSE 'resized' END AS resize_status
    FROM meta
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return docs.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


@register(
    "multimodal_binary_dedup",
    oracle="""
    WITH hashed AS (
      -- this DuckDB build hashes VARCHAR only; the fixture blob IS the
      -- utf-8 encoding of text, so sha256(text) hashes the same bytes
      SELECT doc_id, sha256(text) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes
    FROM hashed
    QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
    """,
)
def multimodal_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of MEDIA blobs by content digest — the first pass
    any image/video corpus runs (identical bytes are rife in crawls).
    The shuffle key is the 32-byte sha256 of the binary column, never
    the payload: at 100 TB of media the exchange moves digests while
    the blobs stay in place. Keeper is the lowest doc_id per digest,
    exactly like text dedup_exact."""
    blobs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    hashed = blobs.select(
        "doc_id",
        F.sha2(F.col("data"), 256).alias("h"),
        F.octet_length(F.col("data")).cast("long").alias("n_bytes"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_bytes")
    )


# ---------------------------------------------------------------------------
# Audio energy windows: treat the blob as 16-bit LE PCM and compute
# per-window RMS/peak — the framing/VAD front-end of any audio
# pipeline, with a hard per-asset frame budget.
# ---------------------------------------------------------------------------

_AUDIO_WIN = 64  # samples per window
_AUDIO_MAX_WIN = 8  # per-asset frame budget

_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "window_idx": [], "rms": [], "peak": []
        }
        for doc_id, blob in zip(pdf["doc_id"], pdf["data"]):
            arr = np.frombuffer(blob[: 2 * (len(blob) // 2)], dtype="<i2")
            n_win = min(len(arr) // _AUDIO_WIN, _AUDIO_MAX_WIN)
            for wi in range(n_win):
                win = arr[wi * _AUDIO_WIN : (wi + 1) * _AUDIO_WIN].astype(
                    "float64"
                )
                out["doc_id"].append(doc_id)
                out["window_idx"].append(wi)
                out["rms"].append(float(np.sqrt((win * win).mean())))
                out["peak"].append(int(win.max()))
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, wi,
             list_transform(range(1, {_AUDIO_WIN + 1}),
               j -> ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j) - 1, 1))
                  + 256 * ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j), 1))
             ) AS samp
      FROM documents, (SELECT unnest(range({_AUDIO_MAX_WIN})) AS wi)
      WHERE octet_length(encode(text)) >= 2 * {_AUDIO_WIN} * (wi + 1)
    )
    SELECT doc_id, CAST(wi AS INT) AS window_idx,
           sqrt(list_sum(list_transform(samp, x -> (1.0 * x) * x))
                / {_AUDIO_WIN}) AS rms,
           CAST(list_max(samp) AS INT) AS peak
    FROM w
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window RMS energy + peak over the blob read as 16-bit
    little-endian PCM, capped at the first 8 windows per asset (frame
    budgets keep per-row work bounded no matter how long a recording
    is — the same discipline as multimodal_frame_sample). Arrow-batched
    mapInPandas, numpy-vectorized per window, no exchange at all: the
    operator is pure scan + map, the profile a 100 TB audio sweep
    needs. The fixture blob is ASCII text bytes, so the oracle can
    reconstruct each sample as b0 + 256*b1 (ASCII < 128 means no sign
    bit) and verify RMS/peak bit-for-bit."""
    blobs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    return blobs.mapInPandas(_audio_batches, schema=_AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Patchify: the ViT preprocessing step — tile each decoded image into
# PxP patches and emit per-patch statistics, the row shape a vision
# encoder's data loader consumes (one row per patch, fan-out bounded
# by image area / P^2).
# ---------------------------------------------------------------------------

_PATCH = 2  # patch side; synthetic dims are tiny, real corpora use 14/16


def _patchify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 3 + d % 5, 2 + d % 3
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.uint8)
            blob = encode_bmp(px)
            img = decode_image(blob).astype(np.int64)  # REAL decode path
            for py in range(h // _PATCH):
                for qx in range(w // _PATCH):
                    block = img[
                        py * _PATCH : (py + 1) * _PATCH,
                        qx * _PATCH : (qx + 1) * _PATCH,
                    ]
                    rows.append(
                        (
                            d,
                            py,
                            qx,
                            int(block.sum()),
                            int(block.max()),
                            int(block.min()),
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "patch_y", "patch_x", "patch_sum",
                "patch_max", "patch_min",
            ],
        )


@register(
    "multimodal_patch_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 7 = 0
    )
    -- fixed-bound patch/offset grid (max 1x3 patches of 2x2x3),
    -- filtered per doc: this DuckDB build rejects lateral range()
    SELECT d.doc_id,
           CAST(py.py AS INT) AS patch_y, CAST(qx.qx AS INT) AS patch_x,
           CAST(sum((d.doc_id * 31 + (py.py * 2 + dy.dy) * 7
                     + (qx.qx * 2 + dx.dx) * 3 + c.c) % 256)
                AS BIGINT) AS patch_sum,
           CAST(max((d.doc_id * 31 + (py.py * 2 + dy.dy) * 7
                     + (qx.qx * 2 + dx.dx) * 3 + c.c) % 256)
                AS BIGINT) AS patch_max,
           CAST(min((d.doc_id * 31 + (py.py * 2 + dy.dy) * 7
                     + (qx.qx * 2 + dx.dx) * 3 + c.c) % 256)
                AS BIGINT) AS patch_min
    FROM dims d,
         range(0, 2) py(py), range(0, 3) qx(qx),
         range(0, 2) dy(dy), range(0, 2) dx(dx), range(0, 3) c(c)
    WHERE py.py < d.h // 2 AND qx.qx < d.w // 2
    GROUP BY d.doc_id, py.py, qx.qx
    """,
)
def multimodal_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile each (real-decoded) image into 2x2 patches and emit one row
    per patch with integer sum/max/min — the patch-token fan-out a ViT
    data loader performs, with the closed-form oracle recomputing
    every patch from the generator formula through the SAME BMP
    encode -> magic-sniff -> decode path as multimodal_decode_real.

    Scale shape: pure map over pruned doc_ids through the Arrow
    kernel; fan-out is area/P^2 rows per image (bounded, explicit),
    and all outputs are integers — bit-exact by construction.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _patchify_batches,
        schema=(
            "doc_id bigint, patch_y int, patch_x int, "
            "patch_sum bigint, patch_max bigint, patch_min bigint"
        ),
    )


def _gif_roundtrip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h, ncol = 2 + d % 5, 1 + d % 3, 4 + d % 5
            pal = np.stack(
                [
                    np.array([(d * 7 + c * 3) % 256 for c in range(ncol)]),
                    np.array([(d * 11 + c * 5) % 256 for c in range(ncol)]),
                    np.array([(d * 13 + c * 7) % 256 for c in range(ncol)]),
                ],
                axis=1,
            ).astype(np.uint8)
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            idx = (d + yy * w + xx) % ncol
            px = pal[idx]
            blob = encode_gif(px, interlaced=bool(d % 2))
            back = decode_image(blob)  # REAL decode: magic-sniffed GIF path
            rows.append(
                (
                    d,
                    back.shape[1],
                    back.shape[0],
                    ncol,
                    int(back.astype(np.int64).sum()),
                    "ok" if np.array_equal(back, px) else "pixel_mismatch",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "n_colors", "pixel_sum",
                "decode_status",
            ],
        )


@register(
    "multimodal_decode_gif",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 2 + doc_id % 5 AS w, 1 + doc_id % 3 AS h,
             4 + doc_id % 5 AS ncol
      FROM documents WHERE doc_id % 13 = 0
    ), cells AS (
      -- fixed-bound grid (max 3x6), filtered per doc; idx is the
      -- palette index the generator assigns to each pixel
      SELECT d.doc_id, d.w, d.h, d.ncol,
             (d.doc_id + y.y * d.w + x.x) % d.ncol AS idx
      FROM dims d, range(0, 3) y(y), range(0, 6) x(x)
      WHERE y.y < d.h AND x.x < d.w
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ncol AS INT) AS n_colors,
           CAST(sum((doc_id * 7 + idx * 3) % 256
                    + (doc_id * 11 + idx * 5) % 256
                    + (doc_id * 13 + idx * 7) % 256) AS BIGINT) AS pixel_sum,
           'ok' AS decode_status
    FROM cells GROUP BY doc_id, w, h, ncol
    """,
)
def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-then-decode REAL GIFs (palette + from-scratch LZW; odd
    doc_ids take the 4-pass interlaced layout) for a sampled doc set,
    verifying pixel-for-pixel inside the kernel; the oracle recomputes
    dimensions, palette size, and the exact pixel sum from the
    generator formulas. Any LZW bit-packing, palette-mapping, or
    deinterlacing bug breaks pixel_sum or flips decode_status.

    Scale shape: pure map over the pruned sample through the Arrow
    path, bounded per-row work — the BMP/PNG roundtrips' GIF sibling.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _gif_roundtrip_batches,
        schema=(
            "doc_id bigint, width int, height int, n_colors int, "
            "pixel_sum bigint, decode_status string"
        ),
    )


# ---------------------------------------------------------------------------
# Voice-activity segmentation (VAD): threshold the per-window energy and
# emit maximal ACTIVE runs — the segmentation step an ASR data pipeline
# runs to cut recordings into speech spans before transcription.
# ---------------------------------------------------------------------------

_VAD_THRESHOLD = 9000  # mean squared-sample threshold per window (integer)


def _audio_ssq_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Integer sum-of-squares per PCM window (exact int64 math — the
    activity threshold then compares integers, so segmentation is
    bit-deterministic; rms floats never enter the decision)."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "window_idx": [], "ssq": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["data"]):
            b = bytes(blob)
            # SIGNED 16-bit PCM, matching _audio_batches: reading "<u2"
            # here would turn quiet negative samples (-1 = 0xFFFF) into
            # near-maximal unsigned energy and mark silence as speech
            arr = np.frombuffer(b[: len(b) // 2 * 2], dtype="<i2")
            n_win = min(len(arr) // _AUDIO_WIN, _AUDIO_MAX_WIN)
            for wi in range(n_win):
                win = arr[wi * _AUDIO_WIN : (wi + 1) * _AUDIO_WIN].astype(
                    np.int64
                )
                out["doc_id"].append(int(doc_id))
                out["window_idx"].append(wi)
                out["ssq"].append(int((win * win).sum()))
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_vad_segments",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, wi,
             -- SIGNED 16-bit LE PCM: (u + 32768) % 65536 - 32768
             -- mirrors the kernel's "<i2" read exactly
             list_sum(list_transform(range(1, {_AUDIO_WIN + 1}),
               j -> ((1 * ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j) - 1, 1))
                      + 256 * ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j), 1))
                      + 32768) % 65536 - 32768)
                  * ((1 * ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j) - 1, 1))
                      + 256 * ascii(substr(text, 2 * (wi * {_AUDIO_WIN} + j), 1))
                      + 32768) % 65536 - 32768)
             )) AS ssq
      FROM documents, (SELECT unnest(range({_AUDIO_MAX_WIN})) AS wi)
      WHERE octet_length(encode(text)) >= 2 * {_AUDIO_WIN} * (wi + 1)
    ), flags AS (
      SELECT doc_id, wi, ssq,
             (ssq >= {_VAD_THRESHOLD} * {_AUDIO_WIN}) AS active
      FROM w
    ), marked AS (
      SELECT doc_id, wi, ssq,
             CASE WHEN wi - 1 = lag(wi) OVER (PARTITION BY doc_id ORDER BY wi)
                  THEN 0 ELSE 1 END AS new_run
      FROM flags WHERE active
    ), runs AS (
      SELECT doc_id, wi, ssq,
             sum(new_run) OVER (PARTITION BY doc_id ORDER BY wi
                                ROWS UNBOUNDED PRECEDING) AS seg
      FROM marked
    )
    SELECT doc_id, CAST(seg AS INT) AS seg_idx,
           CAST(min(wi) AS INT) AS start_win,
           CAST(max(wi) AS INT) AS end_win,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(ssq) AS BIGINT) AS energy_sum
    FROM runs GROUP BY doc_id, seg
    """,
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each PCM asset into maximal runs of ACTIVE windows (integer
    mean-square >= {_VAD_THRESHOLD}): the kernel emits exact int64
    window energies under the same per-asset frame budget as
    multimodal_audio_energy, and a per-doc gaps-and-islands window
    turns the active flags into segments. Because the activity
    decision compares INTEGERS, segmentation is bit-deterministic —
    no float threshold flip can move a boundary.

    Scale shape: map-only kernel (budgeted windows per asset) + one
    doc-keyed window pass + bounded (doc, segment) reduce — the ASR
    pre-segmentation profile at corpus scale.
    """
    blobs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    wins = blobs.mapInPandas(
        _audio_ssq_batches, schema="doc_id long, window_idx int, ssq long"
    )
    active = wins.filter(
        F.col("ssq") >= F.lit(_VAD_THRESHOLD * _AUDIO_WIN)
    )
    w = Window.partitionBy("doc_id").orderBy("window_idx")
    runs = active.withColumn(
        "new_run",
        F.when(
            F.col("window_idx") - 1 == F.lag("window_idx").over(w), 0
        ).otherwise(1),
    ).withColumn(
        "seg",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return runs.groupBy("doc_id", F.col("seg").cast("int").alias("seg_idx")).agg(
        F.min("window_idx").alias("start_win"),
        F.max("window_idx").alias("end_win"),
        F.count("*").alias("n_windows"),
        F.sum("ssq").alias("energy_sum"),
    )


# ---------------------------------------------------------------------------
# Perceptual hash (average-hash family): a content fingerprint that
# survives re-encoding — the image analogue of text near-dup hashing.
# One bit per pixel: is this pixel brighter than the image mean?
# ---------------------------------------------------------------------------


def _ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 3 + d % 5, 2 + d % 3
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.uint8)
            img = decode_image(encode_bmp(px)).astype(np.int64)  # REAL path
            gray3 = img.sum(axis=2)  # 3x the mean-free gray, exact ints
            npix = w * h
            total = int(gray3.sum())
            # integer cross-multiply avoids any float mean: bit set iff
            # gray3 * npix >= total  <=>  gray >= mean(gray)
            bits = (gray3 * npix >= total).astype(np.int64)
            pos = (yy[:, :, 0] * w + xx[:, :, 0]).astype(np.int64)
            phash = int((bits << pos).sum())
            rows.append((d, w, h, phash, int(bits.sum())))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "phash", "n_bits_set"]
        )


@register(
    "multimodal_image_ahash",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 7 = 0
    ), px AS (
      SELECT d.doc_id, d.w, d.h, y.y, x.x,
             (d.doc_id * 31 + y.y * 7 + x.x * 3 + 0) % 256
             + (d.doc_id * 31 + y.y * 7 + x.x * 3 + 1) % 256
             + (d.doc_id * 31 + y.y * 7 + x.x * 3 + 2) % 256 AS gray3
      FROM dims d, range(0, 4) y(y), range(0, 7) x(x)
      WHERE y.y < d.h AND x.x < d.w
    ), tot AS (
      SELECT doc_id, sum(gray3) AS total, count(*) AS npix FROM px
      GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(min(p.w) AS INT) AS width, CAST(min(p.h) AS INT) AS height,
           CAST(sum(CASE WHEN p.gray3 * t.npix >= t.total
                    THEN CAST(1 AS BIGINT) << (p.y * p.w + p.x)
                    ELSE 0 END) AS BIGINT) AS phash,
           CAST(sum(CASE WHEN p.gray3 * t.npix >= t.total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bits_set
    FROM px p JOIN tot t USING (doc_id)
    GROUP BY p.doc_id
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash fingerprints computed through the REAL
    encode->decode path: one bit per pixel (brighter than the image
    mean, decided by integer cross-multiplication so no float mean can
    flip a bit), packed into a bigint — the content-level image
    near-dup key that byte-exact digests can't provide (a re-encoded
    copy keeps its aHash; its md5 changes). Downstream dedup buckets
    on the hash or on band substrings for Hamming-tolerant matching,
    exactly like dedup_simhash does for text.

    Scale shape: pure map over pruned ids; fingerprints are 8 bytes a
    row. Bit-exact by construction (all-integer pipeline).
    """
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _ahash_batches,
        schema=(
            "doc_id bigint, width int, height int, "
            "phash bigint, n_bits_set bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Laplacian sharpness (variance-of-Laplacian blur detector): the
# standard cheap focus/blur score a vision-data curation pass runs to
# drop unusable frames before any expensive model sees them.
# ---------------------------------------------------------------------------


def _sharpness_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 3 + d % 5, 2 + d % 3
            yy, xx, cc = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((d * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.uint8)
            img = decode_image(encode_bmp(px)).astype(np.int64)  # REAL path
            gray3 = img.sum(axis=2)  # integer 3x-gray
            # 4-neighbor Laplacian on interior pixels — pure int math
            lap = (
                4 * gray3[1:-1, 1:-1]
                - gray3[:-2, 1:-1]
                - gray3[2:, 1:-1]
                - gray3[1:-1, :-2]
                - gray3[1:-1, 2:]
            )
            n_int = lap.size
            rows.append(
                (
                    d,
                    w,
                    h,
                    int(n_int),
                    int(lap.sum()) if n_int else 0,
                    int((lap * lap).sum()) if n_int else 0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "n_interior",
                "lap_sum", "lap_sq_sum",
            ],
        )


@register(
    "multimodal_sharpness_audit",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 7 = 0
    ), g AS (
      -- integer 3x-gray of the generator pixel at (y, x)
      SELECT d.doc_id, d.w, d.h, y.y, x.x,
             (d.doc_id * 31 + y.y * 7 + x.x * 3 + 0) % 256
             + (d.doc_id * 31 + y.y * 7 + x.x * 3 + 1) % 256
             + (d.doc_id * 31 + y.y * 7 + x.x * 3 + 2) % 256 AS g3
      FROM dims d, range(0, 4) y(y), range(0, 7) x(x)
      WHERE y.y < d.h AND x.x < d.w
    ), lap AS (
      SELECT c.doc_id, c.w, c.h,
             4 * c.g3 - up.g3 - dn.g3 - lf.g3 - rt.g3 AS lv
      FROM g c
      JOIN g up ON up.doc_id = c.doc_id AND up.y = c.y - 1 AND up.x = c.x
      JOIN g dn ON dn.doc_id = c.doc_id AND dn.y = c.y + 1 AND dn.x = c.x
      JOIN g lf ON lf.doc_id = c.doc_id AND lf.y = c.y AND lf.x = c.x - 1
      JOIN g rt ON rt.doc_id = c.doc_id AND rt.y = c.y AND rt.x = c.x + 1
      WHERE c.y BETWEEN 1 AND c.h - 2 AND c.x BETWEEN 1 AND c.w - 2
    )
    SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(coalesce(l.n_interior, 0) AS BIGINT) AS n_interior,
           CAST(coalesce(l.lap_sum, 0) AS BIGINT) AS lap_sum,
           CAST(coalesce(l.lap_sq_sum, 0) AS BIGINT) AS lap_sq_sum
    FROM dims d LEFT JOIN (
      SELECT doc_id, count(*) AS n_interior, sum(lv) AS lap_sum,
             sum(lv * lv) AS lap_sq_sum
      FROM lap GROUP BY doc_id
    ) l USING (doc_id)
    """,
)
def multimodal_sharpness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-of-Laplacian sharpness statistics per sampled image,
    computed through the REAL encode->decode path: integer 4-neighbor
    Laplacian over interior pixels, exact integer sum and
    sum-of-squares (variance = sq/n - (sum/n)^2 is one consumer
    division away, kept integer here so the driver hash is
    bit-deterministic). Images too small for an interior (h or w < 3)
    report zero interior pixels — the degenerate guard the oracle's
    LEFT JOIN mirrors.

    Scale shape: pure map over pruned ids; the convolution is numpy
    slicing over the tiny synthetic raster, per-row bounded.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _sharpness_batches,
        schema=(
            "doc_id bigint, width int, height int, n_interior bigint, "
            "lap_sum bigint, lap_sq_sum bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Baseline JPEG roundtrip: encode -> magic-sniffed decode -> pixel pin.
# JPEG is lossy, so the fixture is built to make the decoded image
# CLOSED-FORM predictable: per-8x8-block constant grayscale with EVEN
# offsets from 128. With the Annex K luma table (q00 = 16), the DC
# quantizer round((v-128)*8/16)*16/8 reproduces v-128 exactly for even
# offsets (and AC stays zero), so the full Huffman/DCT path must
# return the original pixels bit-for-bit — any entropy-coding,
# dequant, zigzag, or IDCT bug breaks pixel_sum or decode_status.
# ---------------------------------------------------------------------------


def _jpeg_roundtrip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from history_collector_spark.functions.jpeg import encode_jpeg

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            wb, hb = 2 + d % 3, 1 + d % 2
            by, bx = np.meshgrid(
                np.arange(hb, dtype=np.int64),
                np.arange(wb, dtype=np.int64),
                indexing="ij",
            )
            vals = 128 + 2 * (((d * 7 + by * 5 + bx * 3) % 64) - 32)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
                np.uint8
            )
            # rotate the container per doc: baseline SOF0 vs
            # progressive SOF2 (6-scan spectral-selection + successive-
            # approximation progression). Both carry the SAME quantized
            # coefficients, so the closed-form oracle needs no branch —
            # the driver gate now exercises the full progressive scan
            # machinery (DC/AC first + refine, EOB runs) every run.
            if d % 2:
                from history_collector_spark.functions.jpeg_progressive import (  # noqa: E501
                    encode_jpeg_progressive,
                )

                blob = encode_jpeg_progressive(img)
            else:
                blob = encode_jpeg(img)
            back = decode_image(blob)  # REAL decode: magic-sniffed JPEG
            exact = (
                back.shape == (8 * hb, 8 * wb, 3)
                and np.array_equal(back[:, :, 0], img)
                and np.array_equal(back[:, :, 0], back[:, :, 1])
                and np.array_equal(back[:, :, 0], back[:, :, 2])
            )
            rows.append(
                (
                    d,
                    back.shape[1],
                    back.shape[0],
                    int(back.astype(np.int64).sum()),
                    "ok" if exact else "pixel_mismatch",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "pixel_sum",
                     "decode_status"],
        )


@register(
    "multimodal_decode_jpeg",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 2 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      FROM documents WHERE doc_id % 11 = 0
    ), cells AS (
      -- fixed-bound block grid (max 2x4), filtered per doc; v is the
      -- generator's constant block value (even offset from 128, so
      -- the Annex-K DC quantizer is exact — see the kernel comment)
      SELECT d.doc_id, d.wb, d.hb,
             128 + 2 * (((d.doc_id * 7 + y.y * 5 + x.x * 3) % 64) - 32) AS v
      FROM dims d,
           (SELECT unnest(range(2)) AS y) y,
           (SELECT unnest(range(4)) AS x) x
      WHERE y.y < d.hb AND x.x < d.wb
    )
    SELECT doc_id,
           CAST(8 * wb AS INT) AS width,
           CAST(8 * hb AS INT) AS height,
           CAST(3 * 64 * sum(v) AS BIGINT) AS pixel_sum,
           'ok' AS decode_status
    FROM cells GROUP BY doc_id, wb, hb
    """,
)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-then-decode REAL baseline JPEGs (SOF0, Annex K example
    quant + Huffman tables, JFIF wrapper) for a sampled doc set; the
    kernel verifies pixel-for-pixel against the generator mosaic and
    the oracle recomputes dimensions and the exact pixel sum from the
    generator formulas. Exactness is by construction: constant 8x8
    blocks with even offsets from 128 survive DC quantization at
    q00=16 losslessly and carry zero AC energy.

    Scale shape: pure map over the pruned sample through the Arrow
    path, bounded per-row work — the BMP/PNG/GIF roundtrips' JPEG
    sibling (functions/jpeg.py holds the codec; progressive JPEG and
    chroma-subsampled color paths are exercised by the local pytest
    suite, which decodes hand-assembled coefficient streams against an
    independent numpy IDCT)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _jpeg_roundtrip_batches,
        schema=(
            "doc_id bigint, width int, height int, pixel_sum bigint, "
            "decode_status string"
        ),
    )


# ---------------------------------------------------------------------------
# Spectral tone energy: power at fixed DFT bins over the first PCM
# window — the feature a voice/music/tone triage computes per asset
# before any heavier audio model runs. The twiddle factors are
# PYTHON-GENERATED LITERALS shared verbatim by both engines (repr()
# round-trips doubles), so the only cross-engine float surface is the
# ordered fold itself — the DSIR list_sum idiom.
# ---------------------------------------------------------------------------

_TONE_N = 24  # samples in the analysis window (48 fixture bytes)
_TONE_BINS = (1, 2, 3)
_TONE_COS = {
    k: [math.cos(2 * math.pi * k * n / _TONE_N) for n in range(_TONE_N)]
    for k in _TONE_BINS
}
_TONE_SIN = {
    k: [math.sin(2 * math.pi * k * n / _TONE_N) for n in range(_TONE_N)]
    for k in _TONE_BINS
}


def _tone_sql() -> str:
    s = (
        "list_transform(range(0, %d), n -> CAST("
        "ascii(substr(text, CAST(2 * n + 1 AS INT), 1))"
        " + 256 * ascii(substr(text, CAST(2 * n + 2 AS INT), 1))"
        " AS DOUBLE) / 32768)" % _TONE_N
    )
    cols = []
    for k in _TONE_BINS:
        cw = "[" + ", ".join(repr(v) for v in _TONE_COS[k]) + "]::DOUBLE[]"
        sw = "[" + ", ".join(repr(v) for v in _TONE_SIN[k]) + "]::DOUBLE[]"
        c = (f"list_sum(list_transform(range(1, {_TONE_N + 1}),"
             f" i -> s[i] * ({cw})[i]))")
        sn = (f"list_sum(list_transform(range(1, {_TONE_N + 1}),"
              f" i -> s[i] * ({sw})[i]))")
        cols.append(f"({c}) * ({c}) + ({sn}) * ({sn}) AS power_{k}")
    return (
        f"SELECT doc_id, {', '.join(cols)} "
        f"FROM (SELECT doc_id, {s} AS s FROM documents "
        f"      WHERE length(text) >= {2 * _TONE_N})"
    )


@register(
    "multimodal_audio_tone_energy",
    oracle=f"""
    WITH base AS ({{inner}})
    SELECT doc_id, power_1, power_2, power_3,
           CASE WHEN power_1 >= power_2 AND power_1 >= power_3 THEN 1
                WHEN power_2 >= power_3 THEN 2 ELSE 3 END AS dominant_bin
    FROM base
    """.format(inner=_tone_sql()),
)
def multimodal_audio_tone_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT-bin power at 3 fixed frequencies over each asset's first
    {_TONE_N}-sample PCM window (fixture bytes read as 16-bit LE, same
    convention as multimodal_audio_energy), plus the dominant bin —
    per-asset tone triage.

    Parity: samples are exact integers (ASCII fixture bytes), twiddle
    factors are python-repr literals identical in both plans, and each
    C_k/S_k is an ordered left fold (F.aggregate over the zip here,
    ordered list_sum in the oracle) over samples normalized by the
    exact power-of-two 1/32768 — normalization keeps the powers O(100)
    so the residual last-ulp fold drift (4e-15, zero flips in
    float_audit; DuckDB's list_sum is not guaranteed bit-sequential)
    sits ten orders of magnitude under the driver's 1e-6 hash quantum.
    Flip-free drift class, same as the TPC-H revenue sums.

    Scale shape: pure scan + map — zero shuffle, the window cap bounds
    per-row work regardless of recording length.
    """
    docs = table(spark, sf_dir, "documents").filter(
        F.length("text") >= 2 * _TONE_N
    )
    # split ONLY the analysis prefix: `chars` is re-evaluated per
    # transform element under projection collapse (the dsir._gram_expr
    # trap), so splitting the full text would cost O(len * N) per row —
    # the 48-char prefix makes the re-evaluation O(N^2) = trivial
    chars = F.split(F.substring(F.col("text"), 1, 2 * _TONE_N), "")
    s = F.transform(
        F.sequence(F.lit(0), F.lit(_TONE_N - 1)),
        lambda n: (
            F.ascii(F.get(chars, 2 * n))
            + F.lit(256) * F.ascii(F.get(chars, 2 * n + 1))
        ).cast("double")
        / F.lit(32768),
    )
    d = docs.select("doc_id", s.alias("s"))

    def bin_power(k: int):
        cw = F.array(*[F.lit(v) for v in _TONE_COS[k]])
        sw = F.array(*[F.lit(v) for v in _TONE_SIN[k]])
        c = F.aggregate(
            F.zip_with("s", cw, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sn = F.aggregate(
            F.zip_with("s", sw, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (c * c + sn * sn).alias(f"power_{k}")

    base = d.select("doc_id", *[bin_power(k) for k in _TONE_BINS])
    dom = (
        F.when(
            (F.col("power_1") >= F.col("power_2"))
            & (F.col("power_1") >= F.col("power_3")),
            1,
        )
        .when(F.col("power_2") >= F.col("power_3"), 2)
        .otherwise(3)
    )
    return base.select(
        "doc_id", "power_1", "power_2", "power_3", dom.alias("dominant_bin")
    )


# ---------------------------------------------------------------------------
# Mel filterbank band energies: the standard speech/audio front-end
# (power spectrum -> triangular mel-spaced filters) over the same
# fixed PCM analysis window as the tone-energy triage. All spectral
# constants (twiddles AND filter weights) are python-repr literals
# shared verbatim by both engines; band energies are fixed literal
# combinations of the bin powers in matched evaluation order, so the
# only cross-engine float surface remains the ordered fold (the
# flip-free tone-energy class).
# ---------------------------------------------------------------------------

_MEL_BINS = tuple(range(1, 9))  # DFT bins 1..8 over the 24-sample window
_MEL_N_BANDS = 4
_MEL_SR = 8000.0  # nominal sample rate for the mel grid
_MEL_COS = {
    k: [math.cos(2 * math.pi * k * n / _TONE_N) for n in range(_TONE_N)]
    for k in _MEL_BINS
}
_MEL_SIN = {
    k: [math.sin(2 * math.pi * k * n / _TONE_N) for n in range(_TONE_N)]
    for k in _MEL_BINS
}


def _mel_weights() -> list[list[float]]:
    """Triangular mel-spaced filters over the bin-center frequencies:
    standard HTK mel scale, _MEL_N_BANDS filters spanning bin 1..8."""

    def mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = [k * _MEL_SR / _TONE_N for k in _MEL_BINS]
    lo, hi = mel(freqs[0]), mel(freqs[-1])
    edges = [
        imel(lo + (hi - lo) * j / (_MEL_N_BANDS + 1))
        for j in range(_MEL_N_BANDS + 2)
    ]
    out = []
    for b in range(_MEL_N_BANDS):
        left, mid, right = edges[b], edges[b + 1], edges[b + 2]
        w = []
        for f in freqs:
            if left < f <= mid:
                w.append((f - left) / (mid - left))
            elif mid < f < right:
                w.append((right - f) / (right - mid))
            else:
                w.append(0.0)
        out.append(w)
    return out


_MEL_W = _mel_weights()


def _mel_sql() -> str:
    s = (
        "list_transform(range(0, %d), n -> CAST("
        "ascii(substr(text, CAST(2 * n + 1 AS INT), 1))"
        " + 256 * ascii(substr(text, CAST(2 * n + 2 AS INT), 1))"
        " AS DOUBLE) / 32768)" % _TONE_N
    )
    pcols = []
    for k in _MEL_BINS:
        cw = "[" + ", ".join(repr(v) for v in _MEL_COS[k]) + "]::DOUBLE[]"
        sw = "[" + ", ".join(repr(v) for v in _MEL_SIN[k]) + "]::DOUBLE[]"
        c = (f"list_sum(list_transform(range(1, {_TONE_N + 1}),"
             f" i -> s[i] * ({cw})[i]))")
        sn = (f"list_sum(list_transform(range(1, {_TONE_N + 1}),"
              f" i -> s[i] * ({sw})[i]))")
        pcols.append(f"({c}) * ({c}) + ({sn}) * ({sn}) AS p{k}")
    bands = []
    for b in range(_MEL_N_BANDS):
        terms = [
            f"{repr(_MEL_W[b][i])} * p{k}"
            for i, k in enumerate(_MEL_BINS)
            if _MEL_W[b][i] != 0.0
        ]
        bands.append("(" + " + ".join(terms) + f") AS mel_{b + 1}")
    return (
        f"SELECT doc_id, {', '.join(bands)} FROM ("
        f"SELECT doc_id, {', '.join(pcols)} FROM ("
        f"SELECT doc_id, {s} AS s FROM documents "
        f"WHERE length(text) >= {2 * _TONE_N}))"
    )


@register(
    "multimodal_audio_mel_energies",
    oracle=f"""
    WITH base AS ({{inner}})
    SELECT doc_id, mel_1, mel_2, mel_3, mel_4,
           CASE WHEN mel_1 >= mel_2 AND mel_1 >= mel_3 AND mel_1 >= mel_4
                  THEN 1
                WHEN mel_2 >= mel_3 AND mel_2 >= mel_4 THEN 2
                WHEN mel_3 >= mel_4 THEN 3 ELSE 4 END AS dominant_band
    FROM base
    """.format(inner=_mel_sql()),
)
def multimodal_audio_mel_energies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-band triangular mel filterbank over the 8-bin power spectrum
    of each asset's first {_TONE_N}-sample PCM window, plus the
    dominant band — the classic audio front-end feature (what an MFCC
    pipeline computes before the log+DCT), here with every constant a
    shared python-repr literal and band arithmetic in matched
    evaluation order on both engines. Same flip-free parity class as
    multimodal_audio_tone_energy (powers O(100), fold drift ~1e-15,
    ten orders under the hash quantum).

    Scale shape: pure scan + map, zero shuffle; the fixed window caps
    per-row work at 8 bins x 2 folds x {_TONE_N} elements regardless
    of recording length — at 100 TB this is embarrassingly parallel
    feature extraction.
    """
    docs = table(spark, sf_dir, "documents").filter(
        F.length("text") >= 2 * _TONE_N
    )
    chars = F.split(F.substring(F.col("text"), 1, 2 * _TONE_N), "")
    s = F.transform(
        F.sequence(F.lit(0), F.lit(_TONE_N - 1)),
        lambda n: (
            F.ascii(F.get(chars, 2 * n))
            + F.lit(256) * F.ascii(F.get(chars, 2 * n + 1))
        ).cast("double")
        / F.lit(32768),
    )
    d = docs.select("doc_id", s.alias("s"))

    def bin_power(k: int):
        cw = F.array(*[F.lit(v) for v in _MEL_COS[k]])
        sw = F.array(*[F.lit(v) for v in _MEL_SIN[k]])
        c = F.aggregate(
            F.zip_with("s", cw, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sn = F.aggregate(
            F.zip_with("s", sw, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (c * c + sn * sn).alias(f"p{k}")

    powers = d.select("doc_id", *[bin_power(k) for k in _MEL_BINS])
    bands = []
    for b in range(_MEL_N_BANDS):
        expr = None
        for i, k in enumerate(_MEL_BINS):
            w = _MEL_W[b][i]
            if w == 0.0:
                continue
            term = F.lit(w) * F.col(f"p{k}")
            expr = term if expr is None else expr + term
        bands.append(expr.alias(f"mel_{b + 1}"))
    base = powers.select("doc_id", *bands)
    dom = (
        F.when(
            (F.col("mel_1") >= F.col("mel_2"))
            & (F.col("mel_1") >= F.col("mel_3"))
            & (F.col("mel_1") >= F.col("mel_4")),
            1,
        )
        .when(
            (F.col("mel_2") >= F.col("mel_3"))
            & (F.col("mel_2") >= F.col("mel_4")),
            2,
        )
        .when(F.col("mel_3") >= F.col("mel_4"), 3)
        .otherwise(4)
    )
    return base.select(
        "doc_id", "mel_1", "mel_2", "mel_3", "mel_4",
        dom.alias("dominant_band"),
    )


# ---------------------------------------------------------------------------
# Video shot-boundary detection: decode each sampled frame (REAL
# BMP roundtrip through the codec), aHash it, and flag frames whose
# Hamming distance to the previous frame exceeds the cut threshold —
# the pre-filter a video curation pipeline runs before any expensive
# shot-level model. Frames are synthetic-deterministic (the patchify
# pixel formula), so the oracle can state the expected integers
# CLOSED-FORM without any decoder.
# ---------------------------------------------------------------------------

_SHOT_MAX_FRAMES = 8  # decode budget per asset (frame-sampling discipline)
_SHOT_SIDE = 4  # frame is SIDE x SIDE x 3
_SHOT_THRESHOLD = 6  # Hamming cut threshold over 16 aHash bits


def _shot_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    side = _SHOT_SIDE
    # the (yy*7 + xx*3 + cc) lattice is frame- and doc-invariant:
    # hoist it once per task (the probe measured the per-frame
    # meshgrid rebuild at ~2/3 of this kernel's whole constant)
    yy, xx, cc = np.meshgrid(
        np.arange(side), np.arange(side), np.arange(3), indexing="ij"
    )
    base = (yy * 7 + xx * 3 + cc).astype(np.int64)
    fidx = np.arange(_SHOT_MAX_FRAMES, dtype=np.int64)
    for pdf in batches:
        out = []
        for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
            d, nf = int(doc_id), min(int(n_frames), _SHOT_MAX_FRAMES)
            # synthesize all sampled frames in one vectorized shot
            pxs = (
                (d * 31 + 17 * fidx[:nf, None, None, None] + base) % 256
            ).astype(np.uint8)
            grays = np.empty((nf, side, side), dtype=np.int64)
            for f in range(nf):
                img = decode_image(encode_bmp(pxs[f])).astype(np.int64)
                grays[f] = img.sum(axis=2) // 3  # REAL roundtrip
            n_bound, max_h, first_b = 0, 0, -1
            if nf > 0:
                bits = (
                    16 * grays >= grays.sum(axis=(1, 2), keepdims=True)
                ).astype(np.int64)
                if nf > 1:
                    hams = np.abs(bits[1:] - bits[:-1]).sum(axis=(1, 2))
                    max_h = int(hams.max())
                    cuts = np.flatnonzero(hams >= _SHOT_THRESHOLD)
                    n_bound = int(cuts.size)
                    if cuts.size:
                        first_b = int(cuts[0]) + 1
            out.append((d, nf, n_bound, max_h, first_b))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "n_frames_scanned", "n_boundaries",
                "max_hamming", "first_boundary_idx",
            ],
        )


@register(
    "multimodal_video_shot_boundaries",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             least(CAST(CAST(concat('0x', substr(sha256(text), 9, 4)) AS INT)
                        % 300 AS INT), {_SHOT_MAX_FRAMES}) AS nf
      FROM documents
    ),
    grays AS (
      SELECT doc_id, nf, f,
             list_transform(range(0, 16), i ->
               (((doc_id * 31 + f * 17 + (i // 4) * 7 + (i % 4) * 3) % 256)
                + ((doc_id * 31 + f * 17 + (i // 4) * 7 + (i % 4) * 3 + 1)
                   % 256)
                + ((doc_id * 31 + f * 17 + (i // 4) * 7 + (i % 4) * 3 + 2)
                   % 256)) // 3) AS gray
      FROM meta, unnest(range(0, nf)) AS t(f)
      WHERE nf > 0
    ),
    bits AS (
      SELECT doc_id, nf, f,
             list_transform(gray, x ->
               CASE WHEN 16 * x >= list_sum(gray) THEN 1 ELSE 0 END) AS bv
      FROM grays
    ),
    ham AS (
      SELECT a.doc_id, a.nf, a.f,
             list_sum(list_transform(range(1, 17),
               i -> abs(a.bv[i] - b.bv[i]))) AS h
      FROM bits a JOIN bits b
        ON a.doc_id = b.doc_id AND b.f = a.f - 1
    )
    SELECT m.doc_id,
           CAST(m.nf AS BIGINT) AS n_frames_scanned,
           CAST(coalesce(sum(CASE WHEN ham.h >= {_SHOT_THRESHOLD}
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_boundaries,
           CAST(coalesce(max(ham.h), 0) AS BIGINT) AS max_hamming,
           CAST(coalesce(min(CASE WHEN ham.h >= {_SHOT_THRESHOLD}
                                  THEN ham.f END), -1) AS BIGINT)
             AS first_boundary_idx
    FROM meta m LEFT JOIN ham ON ham.doc_id = m.doc_id
    GROUP BY m.doc_id, m.nf
    """,
)
def multimodal_video_shot_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-asset shot-boundary scorecard: decode up to
    {_SHOT_MAX_FRAMES} frames (REAL BMP encode -> codec decode per
    frame — the plumbing under test), aHash each 4x4 frame
    (mean-threshold bits, integer compare 16*gray >= sum so no
    division), and count frames whose Hamming distance to their
    predecessor reaches the cut threshold — plus the max distance and
    the first cut index.

    The oracle states the same integers CLOSED-FORM from the synthetic
    pixel formula (no decoder in SQL) — agreement proves the whole
    encode/decode/hash chain is pixel-exact, the same pattern as
    multimodal_decode_real. All-integer output, EXACT.

    Scale shape: Arrow-batched mapInPandas, zero shuffle; the frame
    budget bounds per-asset work however long the video is (the
    multimodal_frame_sample discipline).
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    n_frames = (
        F.conv(F.substring(F.sha2("data", 256), 9, 4), 16, 10).cast("int")
        % 300
    )
    meta = docs.select("doc_id", n_frames.alias("n_frames"))
    return spread(meta, spark).mapInPandas(
        _shot_batches,
        schema=(
            "doc_id long, n_frames_scanned long, n_boundaries long,"
            " max_hamming long, first_boundary_idx long"
        ),
    )
