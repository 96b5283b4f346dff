"""Progressive JPEG (SOF2) codec — pure Python + numpy, extending the
baseline module (functions/jpeg.py) with the spectral-selection +
successive-approximation scan machinery of ITU-T T.81 Annex G.

Decoder scope: SOF2, 8-bit, 1 or 3 components, sampling factors 1-2,
all four scan kinds (DC first / DC refine / AC first / AC refine),
EOB-run coding, multiple DQT/DHT between scans, restart intervals,
byte stuffing. Coefficients accumulate across scans in per-component
block buffers; finalize dequantizes + IDCTs exactly like the baseline
path, so a fully-refined progressive file decodes BIT-IDENTICAL to the
baseline encoding of the same quantized coefficients — which is what
the roundtrip tests assert.

The encoder is the fixture builder: 4:4:4 (or grayscale) with a
6-scan progression (DC first Al=1 -> per-component AC first split at
Ss=6, Al=1 -> DC refine -> per-component AC refine). AC scans use a
flat 256-symbol Huffman table (254 codes at 8 bits + 2 at 9 — Kraft
exactly 1) because the Annex K baseline tables lack the EOBn symbols
(0x10..0xE0) progressive scans need.

Reference parity note: kinecosystem/history-collector has no image
surface — LLM-training-data extension tier (SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

import numpy as np

from history_collector_spark.functions.jpeg import (
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    JpegDecodeError,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _decode_table,
    _extend,
    _magnitude,
    _read_symbol,
    dct2,
    idct2,
)

# Flat AC table: every symbol 0..255 gets a code (254 at 8 bits, 2 at
# 9: Kraft sum 254/256 + 2/512 == 1). Progressive refinement needs
# EOBn symbols the Annex K tables don't carry.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0]
_FLAT_VALS = list(range(256))


def _entropy_end(data: bytes, pos: int) -> int:
    """End of the entropy-coded segment starting at pos: the offset of
    the next marker that is not byte-stuffing (FF00) or RSTn."""
    i = pos
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return i
            i += 2
        else:
            i += 1
    raise JpegDecodeError("entropy segment runs past end of data")


def decode_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG into (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise JpegDecodeError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] = []
    dims: list[tuple] = []  # per comp: (by, bx, nby, nbx) padded + real
    mcu = (0, 0)

    while True:
        if pos + 2 > len(data):
            raise JpegDecodeError("truncated before EOI")
        if data[pos] != 0xFF:
            raise JpegDecodeError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise JpegDecodeError("truncated marker segment")
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
                if len(b) < 17:
                    raise JpegDecodeError("truncated DHT")
                tc, th = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                if len(b) < 17 + n:
                    raise JpegDecodeError("truncated DHT values")
                vals = list(b[17 : 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(
                    bits, vals
                )
                b = b[17 + n :]
        elif marker == 0xC2:  # SOF2
            if len(body) < 6:
                raise JpegDecodeError("truncated SOF2 header")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegDecodeError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise JpegDecodeError(f"{nc}-component JPEG unsupported")
            if len(body) < 6 + 3 * nc:
                raise JpegDecodeError("truncated SOF2 components")
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            mcu = (mcux, mcuy)
            for c in comps:
                by, bx = mcuy * c["v"], mcux * c["h"]  # MCU-padded grid
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                nby, nbx = (ch + 7) // 8, (cw + 7) // 8  # real grid
                coefs.append(np.zeros((by, bx, 64), dtype=np.int64))
                dims.append((by, bx, nby, nbx))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegDecodeError(
                f"frame type 0xFF{marker:02X} in progressive decoder"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegDecodeError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegDecodeError("SOS before SOF2")
            if not body:
                raise JpegDecodeError("empty SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise JpegDecodeError("truncated SOS header")
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    (
                        j
                        for j, c in enumerate(frame["comps"])
                        if c["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    raise JpegDecodeError(f"scan references unknown id {cs}")
                scomps.append((ci, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not (0 <= ss <= se <= 63):
                raise JpegDecodeError(
                    f"bad spectral selection Ss={ss} Se={se}"
                )
            end = _entropy_end(data, pos)
            _decode_one_scan(
                data[pos:end], frame, scomps, ss, se, ah, al,
                huff_dc, huff_ac, coefs, dims, mcu, restart_interval,
            )
            pos = end
        # APPn / COM: skipped

    if frame is None:
        raise JpegDecodeError("no SOF2 frame")
    return _finalize(frame, coefs, dims, qt)


def _decode_one_scan(ent, frame, scomps, ss, se, ah, al, huff_dc,
                     huff_ac, coefs, dims, mcu, restart_interval):
    br = _BitReader(ent, 0)
    if ss == 0:
        if se != 0:
            raise JpegDecodeError("DC scan must have Se=0")
        _decode_dc_scan(br, frame, scomps, ah, al, huff_dc, coefs,
                        dims, mcu, restart_interval)
    else:
        if len(scomps) != 1:
            raise JpegDecodeError("AC scans must be single-component")
        _decode_ac_scan(br, scomps[0], ss, se, ah, al, huff_ac, coefs,
                        dims, restart_interval)


def _decode_dc_scan(br, frame, scomps, ah, al, huff_dc, coefs, dims,
                    mcu, restart_interval):
    mcux, mcuy = mcu
    preds = [0] * len(scomps)
    rst_n = 0
    if len(scomps) == 1:
        # non-interleaved: the component's REAL block grid
        ci, td, _ = scomps[0]
        _, _, nby, nbx = dims[ci]
        units = [(ci, td, y, x) for y in range(nby) for x in range(nbx)]
        groups = [[u] for u in units]  # one block per "MCU"
    else:
        groups = []
        for my in range(mcuy):
            for mx in range(mcux):
                g = []
                for ci, td, _ in scomps:
                    c = frame["comps"][ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            g.append(
                                (ci, td, my * c["v"] + by,
                                 mx * c["h"] + bx)
                            )
                groups.append(g)
    ci_index = {sc[0]: i for i, sc in enumerate(scomps)}
    n_units = 0
    for g in groups:
        if restart_interval and n_units and (
            n_units % restart_interval == 0
        ):
            br.align()
            br.expect_restart(rst_n)
            rst_n = (rst_n + 1) & 7
            preds = [0] * len(scomps)
        for ci, td, y, x in g:
            blk = coefs[ci][y, x]
            if ah == 0:
                if td not in huff_dc:
                    raise JpegDecodeError("missing DC Huffman table")
                t = _read_symbol(br, huff_dc[td])
                if t > 15:
                    raise JpegDecodeError(
                        f"DC category {t} out of range"
                    )
                diff = _extend(br.bits(t), t) if t else 0
                preds[ci_index[ci]] += diff
                blk[0] = preds[ci_index[ci]] << al
            else:
                if br.bit():
                    blk[0] = int(blk[0]) | (1 << al)
        n_units += 1


def _decode_ac_scan(br, scomp, ss, se, ah, al, huff_ac, coefs, dims,
                    restart_interval):
    ci, _, ta = scomp
    if ta not in huff_ac:
        raise JpegDecodeError("missing AC Huffman table")
    table = huff_ac[ta]
    _, _, nby, nbx = dims[ci]
    eobrun = 0
    rst_n = 0
    n_units = 0
    for y in range(nby):
        for x in range(nbx):
            if restart_interval and n_units and (
                n_units % restart_interval == 0
            ):
                br.align()
                br.expect_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                eobrun = 0
            blk = coefs[ci][y, x]
            if ah == 0:
                eobrun = _ac_first_block(br, blk, ss, se, al, table,
                                         eobrun)
            else:
                eobrun = _ac_refine_block(br, blk, ss, se, al, table,
                                          eobrun)
            n_units += 1


def _ac_first_block(br, blk, ss, se, al, table, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise JpegDecodeError("AC run overflow in progressive scan")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, blk, ss, se, al, table, eobrun):
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                s_val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegDecodeError(
                        "AC refinement symbol with s != 1"
                    )
                s_val = p1 if br.bit() else -p1
            # advance over r zero-HISTORY coefficients, emitting
            # correction bits for nonzero-history ones passed over
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + p1 if c >= 0 else c - p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    blk[k] = c + p1 if c >= 0 else c - p1
            k += 1
        eobrun -= 1
    return eobrun


def _finalize(frame, coefs, dims, qt):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    zig_order = np.arange(64)
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise JpegDecodeError(f"missing quant table {c['tq']}")
        q = qt[c["tq"]]
        by, bx, _, _ = dims[ci]
        plane = np.zeros((by * 8, bx * 8), np.float64)
        for y in range(by):
            for x in range(bx):
                zz = coefs[ci][y, x]
                blk = np.zeros(64, np.int64)
                blk[ZIGZAG] = zz * q[zig_order]
                px = idct2(blk.reshape(8, 8).astype(np.float64))
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = px
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out[0] + 128, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (fixture builder): 4:4:4 / grayscale, 6-scan progression.
# ---------------------------------------------------------------------------


class _ScanWriter:
    """Per-scan bit writer with EOB-run + buffered correction bits
    (the jcphuff bookkeeping, restated)."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending = []  # correction bits awaiting the next symbol

    def sym(self, s):
        code, ln = self.ac[s]
        self.bw.write(code, ln)

    def flush_pending(self):
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.flush_pending()


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_ac_first(sw: _ScanWriter, blk, ss, se, al):
    tvals = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
    if not any(tvals):
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.emit_eobrun()
        return
    sw.emit_eobrun()
    r = 0
    for t in tvals:
        if t == 0:
            r += 1
            continue
        while r > 15:
            sw.sym(0xF0)
            r -= 16
        s, bits = _magnitude(t)
        sw.sym((r << 4) | s)
        sw.bw.write(bits, s)
        r = 0
    if r > 0:
        sw.eobrun = 1  # trailing zeroes: an EOB starts accumulating
        # (merged with subsequent all-zero blocks before emission)


def _encode_ac_refine(sw: _ScanWriter, blk, ss, se, al):
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index (1-based within window) AFTER last newly-nonzero
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    br_bits = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # ZRLs must be emitted at the FIRST nonzero (history or new)
        # after the zero-run passes 15 — and only when a newly-nonzero
        # lies ahead (i < eob; otherwise the run folds into the EOB) —
        # flushing the buffered correction bits with each ZRL keeps
        # the bit batching aligned with the decoder's 16-zero advance.
        while r > 15 and i < eob:
            sw.emit_eobrun()
            sw.sym(0xF0)
            r -= 16
            for b in br_bits:
                sw.bw.write(b, 1)
            br_bits = []
        if t > 1:  # history-nonzero: correction bit only
            br_bits.append(t & 1)
            continue
        # newly nonzero (t == 1)
        sw.emit_eobrun()
        sw.sym((r << 4) | 1)
        sw.bw.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
        for b in br_bits:
            sw.bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        sw.eobrun += 1
        sw.pending.extend(br_bits)
        if sw.eobrun == 0x7FFF or len(sw.pending) > 900:
            sw.emit_eobrun()


def encode_jpeg_progressive(pixels: np.ndarray) -> bytes:
    """Progressive 4:4:4 / grayscale JFIF encode: DC(Al=1) ->
    AC(Ss=1..5, Al=1) + AC(Ss=6..63, Al=1) per component ->
    DC refine -> AC refine per component. Decodes bit-identical to
    the baseline encoding's pixels (same quantized coefficients)."""
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
    nc = len(ycc)
    qts = [QUANT_LUMA] if gray else [QUANT_LUMA, QUANT_CHROMA]
    by = (h + 7) // 8
    bx = (w + 7) // 8
    # quantized zigzag-order coefficient blocks per component
    zz_blocks = [
        np.zeros((by, bx, 64), np.int64) for _ in range(nc)
    ]
    for ci, plane in enumerate(ycc):
        q = qts[min(ci, len(qts) - 1)]
        for yy in range(by):
            for xx in range(bx):
                blk = np.zeros((8, 8))
                ys, xs = yy * 8, xx * 8
                tile = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: tile.shape[0], : tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1] :] = blk[
                        :, tile.shape[1] - 1
                    ][:, None]
                S = dct2(blk)
                zz = np.round(S.reshape(-1)[ZIGZAG] / q[ZIGZAG])
                zz_blocks[ci][yy, xx] = zz.astype(np.int64)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if not gray:
        dc_codes.append(
            _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        )
    flat = _canonical_codes(_FLAT_BITS, _FLAT_VALS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        zq = np.zeros(64, np.uint8)
        zq[np.arange(64)] = q[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, min(i, len(qts) - 1)])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
               + bytes(DC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS)
                   + bytes(DC_CHROMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_FLAT_BITS)
               + bytes(_FLAT_VALS))

    def sos_header(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    # scan 1: DC first, all components interleaved, Al=1
    out += sos_header(
        [(i + 1, min(i, len(dc_codes) - 1), 0) for i in range(nc)],
        0, 0, 0, 1,
    )
    bw = _BitWriter()
    preds = [0] * nc
    for yy in range(by):
        for xx in range(bx):
            for ci in range(nc):
                dcv = int(zz_blocks[ci][yy, xx, 0]) >> 1  # Al=1
                diff = dcv - preds[ci]
                preds[ci] = dcv
                t, bits = _magnitude(diff)
                code, ln = dc_codes[min(ci, len(dc_codes) - 1)][t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
    bw.flush()
    out += bw.out

    # scans 2..: AC first per component, split spectral bands, Al=1
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([(ci + 1, 0, 0)], ss, se, 0, 1)
            sw = _ScanWriter(flat)
            for yy in range(by):
                for xx in range(bx):
                    _encode_ac_first(
                        sw, zz_blocks[ci][yy, xx], ss, se, 1
                    )
            sw.emit_eobrun()
            sw.bw.flush()
            out += sw.bw.out

    # DC refine (Ah=1, Al=0): one raw bit per block, interleaved
    out += sos_header(
        [(i + 1, 0, 0) for i in range(nc)], 0, 0, 1, 0
    )
    bw = _BitWriter()
    for yy in range(by):
        for xx in range(bx):
            for ci in range(nc):
                bw.write(int(zz_blocks[ci][yy, xx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # AC refine per component (Ah=1, Al=0)
    for ci in range(nc):
        out += sos_header([(ci + 1, 0, 0)], 1, 63, 1, 0)
        sw = _ScanWriter(flat)
        for yy in range(by):
            for xx in range(bx):
                _encode_ac_refine(sw, zz_blocks[ci][yy, xx], 1, 63, 0)
        sw.emit_eobrun()
        sw.bw.flush()
        out += sw.bw.out

    out += b"\xff\xd9"
    return bytes(out)
