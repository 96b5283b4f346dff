"""Baseline JPEG (JFIF, SOF0) codec — pure Python + numpy, no media
libraries, for the multimodal pipeline's dominant real-world format.

Decoder scope: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), multiple
DQT/DHT segments, restart intervals (DRI + RSTn), byte-stuffing
(0xFF00), APPn/COM skip. Progressive (SOF2) dispatches to the sibling
jpeg_progressive module, and 4-component Adobe CMYK/YCCK (APP14
transform flag) composites onto white (both round 9); arithmetic
coding and 12-bit precision are rejected with JpegDecodeError.

The encoder exists to build deterministic fixtures: baseline 4:4:4 (or
grayscale) with the Annex K example quantization and Huffman tables
from the public JPEG specification (ITU-T T.81). Because JPEG is
lossy, tests never assert encode->decode == original pixels; they
assert the decoder against closed-form reconstructions (constant 8x8
blocks survive the DCT path exactly, modulo one predictable quantize/
dequantize rounding) and against an independent numpy IDCT of a
hand-assembled coefficient stream.

Reference parity note: kinecosystem/history-collector has no image
surface at all — this module belongs to the LLM-training-data
extension tier (SURVEY.md §2.8 multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

from history_collector_spark.functions.codec_errors import ImageDecodeError


class JpegDecodeError(ImageDecodeError):
    """Malformed or unsupported JPEG payload.

    Subclasses :class:`ImageDecodeError` so the Arrow decode kernels'
    ``except (ImageDecodeError, NotImplementedError)`` graceful-
    degradation path catches JPEG failures the same way it catches
    BMP/PPM/PNG/GIF failures (a corrupt blob must yield a
    ``decode_status`` error row, never kill the Spark task).
    """


ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example quantization tables (ITU-T T.81, public spec data)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list) — public spec data
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical Huffman."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for the bit reader."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# 8x8 DCT basis: row k of _A is the k-th cosine basis vector, so
# IDCT(S) = _A.T @ S @ _A and DCT(s) = _A @ s @ _A.T
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise JpegDecodeError("entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise JpegDecodeError("entropy stream truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # RSTn markers are only legal at MCU-aligned restart
                # boundaries, which _decode_scan consumes explicitly
                # via expect_restart(); one appearing mid-entropy-data
                # means the stream is malformed.
                raise JpegDecodeError(
                    f"unexpected restart marker 0xFF{nxt:02X} in "
                    "entropy data"
                )
            else:
                raise JpegDecodeError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        self.nbits = 0
        self.acc = 0

    def expect_restart(self, n: int):
        """Consume the RSTn marker at the current (aligned) position."""
        d = self.data
        if not (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0xD0 + (n & 7)
        ):
            raise JpegDecodeError(
                f"expected RST{n & 7} at offset {self.pos}"
            )
        self.pos += 2


def _read_symbol(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegDecodeError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t raw bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes into an (h, w, 3) uint8 RGB array
    (grayscale broadcasts to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise JpegDecodeError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    adobe_transform = None  # APP14: 0=CMYK, 1=YCbCr, 2=YCCK
    while True:
        if pos + 4 > len(data):
            raise JpegDecodeError("truncated before SOS")
        if data[pos] != 0xFF:
            raise JpegDecodeError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise JpegDecodeError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data):
            raise JpegDecodeError("truncated marker segment")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0:
                    raise JpegDecodeError("16-bit quant tables unsupported")
                if len(b) < 65:
                    raise JpegDecodeError("truncated DQT")
                qt[tq] = np.frombuffer(b[1:65], np.uint8).astype(np.int64)
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0x0F
                if len(b) < 17:
                    raise JpegDecodeError("truncated DHT")
                bits = list(b[1:17])
                n = sum(bits)
                if len(b) < 17 + n:
                    raise JpegDecodeError("truncated DHT values")
                vals = list(b[17 : 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(
                    bits, vals
                )
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise JpegDecodeError("truncated SOF0 header")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise JpegDecodeError(
                    f"truncated SOF0: {len(body)} bytes for "
                    f"{nc} components"
                )
            if prec != 8:
                raise JpegDecodeError("only 8-bit precision supported")
            if nc not in (1, 3, 4):
                raise JpegDecodeError(f"{nc}-component JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise JpegDecodeError(
                        f"sampling factors {hi}x{vi} unsupported"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:  # SOF2: delegate to the progressive path
            from history_collector_spark.functions.jpeg_progressive import (
                decode_progressive,
            )

            return decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegDecodeError(
                f"non-baseline frame type 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegDecodeError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE:  # APP14 (Adobe): color transform flag
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegDecodeError("SOS before SOF0")
            if not body:
                raise JpegDecodeError("empty SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise JpegDecodeError(
                    f"truncated SOS: {len(body)} bytes for {ns} scans"
                )
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise JpegDecodeError(f"scan references unknown id {cs}")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame["comps"]):
                raise JpegDecodeError("partial scans unsupported")
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval, adobe_transform,
            )
        # APPn / COM / others: skipped
    raise JpegDecodeError("no SOS marker")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, adobe_transform=None):
    import numpy as np

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegDecodeError(f"missing quant table {c['tq']}")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.align()
                br.expect_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                if td not in huff_dc or ta not in huff_ac:
                    raise JpegDecodeError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        t = _read_symbol(br, huff_dc[td])
                        if t > 15:
                            # a corrupt DHT can map codes to symbols
                            # up to 255; reading that many magnitude
                            # bits would overflow the coefficient math
                            raise JpegDecodeError(
                                f"DC category {t} out of range"
                            )
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegDecodeError("AC run overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, np.int64)
                        blk[ZIGZAG] = zz * qt[c["tq"]][np.arange(64)]
                        px = idct2(blk.reshape(8, 8).astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    out = []
    for c, plane in zip(comps, planes):
        # upsample subsampled chroma to full resolution, crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(out) == 4:
        # Adobe CMYK family. Stored channels follow the Adobe INVERTED
        # convention (stored = 255 - ink). transform 2 (YCCK) first
        # maps the leading three channels through the standard YCbCr
        # inversion (yielding inverted C, M, Y); transform 0 stores
        # them directly. Final composite onto white:
        # rgb = stored_cmy * stored_k / 255.
        if adobe_transform == 2:  # YCCK
            y, cb, cr = out[0] + 128, out[1], out[2]
            c = y + 1.402 * cr
            m = y - 0.344136 * cb - 0.714136 * cr
            ylw = y + 1.772 * cb
        else:  # plain (inverted) CMYK
            c, m, ylw = out[0] + 128, out[1] + 128, out[2] + 128
        k = np.clip(np.round(out[3] + 128), 0, 255)
        cmy = np.clip(
            np.round(np.stack([c, m, ylw], axis=2)), 0, 255
        )
        rgb = np.round(cmy * k[:, :, None] / 255.0)
        return np.clip(rgb, 0, 255).astype(np.uint8)
    y, cb, cr = out[0] + 128, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (fixture builder)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | (
                (1 << (8 - self.nbits)) - 1
            )  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int):
    """Signed coefficient -> (category t, t raw bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    t, bits = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg_cmyk(cmyk: np.ndarray, transform: int = 0) -> bytes:
    """4-component Adobe JPEG fixture: ``cmyk`` is (h, w, 4) uint8 in
    the Adobe INVERTED storage convention (stored = 255 - ink).
    transform 0 stores the channels directly; transform 2 (YCCK) runs
    the leading three through the forward YCbCr transform. 1x1
    sampling, luma tables for every component, APP14 Adobe marker."""
    px = np.asarray(cmyk, dtype=np.float64)
    h, w = px.shape[:2]
    if transform == 2:
        c, m, y_ = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        yy = 0.299 * c + 0.587 * m + 0.114 * y_
        cb = -0.168736 * c - 0.331264 * m + 0.5 * y_
        cr = 0.5 * c - 0.418688 * m - 0.081312 * y_
        planes = [yy - 128.0, cb, cr, px[:, :, 3] - 128.0]
    elif transform == 0:
        planes = [px[:, :, i] - 128.0 for i in range(4)]
    else:
        raise ValueError(f"unsupported Adobe transform {transform}")
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    by, bx = (h + 7) // 8, (w + 7) // 8
    bw_ = _BitWriter()
    preds = [0] * 4
    for myy in range(by):
        for mxx in range(bx):
            for ci, plane in enumerate(planes):
                blk = np.zeros((8, 8))
                ys, xs = myy * 8, mxx * 8
                tile = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: tile.shape[0], : tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1] :] = blk[
                        :, tile.shape[1] - 1
                    ][:, None]
                zz = np.round(
                    dct2(blk).reshape(-1)[ZIGZAG] / QUANT_LUMA[ZIGZAG]
                ).astype(np.int64)
                preds[ci] = _encode_block(bw_, zz, preds[ci], dc, ac)
    bw_.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xEE,
        b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform]),
    )
    zq = QUANT_LUMA[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xDB, bytes([0]) + zq)
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for i in range(4):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
               + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
               + bytes(AC_LUMA_VALS))
    sos = bytes([4])
    for i in range(4):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Baseline 4:4:4 JFIF encode of an (h, w, 3) RGB or (h, w) gray
    uint8 array with the Annex K example tables."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        ycc = [px.astype(np.float64) - 128.0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        ycc = [y - 128.0, cb, cr]
    qts = [QUANT_LUMA] if gray else [QUANT_LUMA, QUANT_CHROMA]
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_codes.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    by = (h + 7) // 8
    bx = (w + 7) // 8
    bw_ = _BitWriter()
    preds = [0] * len(ycc)
    for myy in range(by):
        for mxx in range(bx):
            for ci, plane in enumerate(ycc):
                blk = np.zeros((8, 8))
                ys, xs = myy * 8, mxx * 8
                tile = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: tile.shape[0], : tile.shape[1]] = tile
                # edge-extend partial blocks (replicate last row/col)
                if tile.shape[0] < 8:
                    blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1] :] = blk[
                        :, tile.shape[1] - 1
                    ][:, None]
                q = qts[min(ci, len(qts) - 1)]
                S = dct2(blk)
                # both S-selection and q must be in zigzag order here
                zz = np.round(S.reshape(-1)[ZIGZAG] / q[ZIGZAG])
                zz = zz.astype(np.int64)
                tsel = min(ci, 1)
                preds[ci] = _encode_block(
                    bw_, zz, preds[ci], dc_codes[tsel], ac_codes[tsel]
                )
    bw_.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        zq = np.zeros(64, np.uint8)
        zq[np.arange(64)] = q[ZIGZAG].astype(np.uint8)  # store zigzagged
        out += seg(0xDB, bytes([i]) + zq.tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, min(i, len(qts) - 1)])
    out += seg(0xC0, sof)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tid, bits, vals in tables:
        out += seg(
            0xC4, bytes([tid]) + bytes(bits) + bytes(vals)
        )
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)
