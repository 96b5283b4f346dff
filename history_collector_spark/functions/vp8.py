"""From-scratch lossy VP8 key-frame decoder (RFC 6386).

Decodes the intra-only key frames that still WebP images carry
(`'VP8 '` chunk) to YUV 4:2:0 planes, bit-exactly matching libwebp's
`WebPDecodeYUV` output (the interop tests encode with the real
libwebp via ctypes and assert plane equality). The full pipeline is
implemented from the RFC:

- boolean arithmetic decoder (§7) over the two partition classes,
- frame header / segmentation / loop-filter / quantizer parse (§9),
- key-frame intra mode decoding with the tree coder (§8, §11),
- DCT/WHT coefficient token decoding with the band/context model
  (§13), per-segment dequantization (§14.1),
- inverse WHT for the Y2 block and the 4x4 inverse DCT (§14.3-4),
- 16x16 / 8x8 / 4x4 intra prediction incl. the B_PRED above-right
  rules (§12),
- the normal and simple in-place loop filters (§15).

Reference parity note: kinecosystem/history-collector has no image
path at all (its scope is ledger ETL — see python/main.py); this
module belongs to the training-data tier, where real crawls are
dominated by lossy WebP and a yield scorecard must decode it rather
than charge it as an error.

Scale shape: pure per-blob kernel (no Spark state), called from
Arrow-batched `mapInPandas` decode kernels; pure-Python bit loop, so
the intended corpus grain is thumbnails/small assets — the honest
cost model is documented at the query site.
"""

from __future__ import annotations

import numpy as np

from history_collector_spark.functions.codec_errors import ImageDecodeError
from history_collector_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# --- mode enums (RFC 6386 §11.2) -------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# subblock-mode numbering follows the extracted probability table's
# row order (RD/VR before LD/VL) so that decoded mode values index
# KF_BMODE_PROBS directly; the tree below lists leaves positionally
# (DC, TM, VE, HE, RD, VR, LD, VL, HD, HU), the RFC 6386 bit layout
(
    B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_RD_PRED,
    B_VR_PRED, B_LD_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED,
) = range(10)

# trees: positive entry = next node index, <=0 entry = -leaf (§8.2)
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_PROBS = (142, 114, 183)
_BMODE_TREE = (
    -B_DC_PRED, 2, -B_TM_PRED, 4, -B_VE_PRED, 6, 8, 12,
    -B_HE_PRED, 10, -B_RD_PRED, -B_VR_PRED, -B_LD_PRED, 14,
    -B_VL_PRED, 16, -B_HD_PRED, -B_HU_PRED,
)
_SEGMENT_TREE = (2, 4, 0, -1, -2, -3)  # leaves 0..3 (0 stored as -0)

# token decode (§13.2-3)
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

# implied subblock mode of a whole-block-predicted key-frame MB, used
# as the above/left context for neighbouring B_PRED mode decode (§11.4)
_IMPLIED_BMODE = {
    DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
    H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED,
}


class BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder.

    Reading past the end of the buffer yields zero bytes (the RFC's
    convention); more than 32 phantom bytes raises, so a truncated
    partition degrades to ImageDecodeError instead of looping."""

    __slots__ = ("buf", "pos", "value", "range", "bit_count", "overrun")

    def __init__(self, buf: bytes):
        self.buf = buf
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0
        self.overrun = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                else:
                    self.overrun += 1
                    if self.overrun > 32:
                        raise ImageDecodeError(
                            "VP8 partition exhausted mid-decode"
                        )
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.get(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = tree[start + self.get(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.get(probs[i >> 1])]
        return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


class _FrameHeader:
    __slots__ = (
        "width", "height", "first_part_size", "show_frame", "version",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant",
        "seg_lf", "seg_tree_probs", "filter_simple", "filter_level",
        "sharpness", "lf_delta_enabled", "ref_lf_deltas",
        "mode_lf_deltas", "n_parts", "quant", "quant_indices",
        "skip_enabled", "prob_skip_false", "coeff_probs",
    )


def parse_frame_header(body: bytes) -> _FrameHeader:
    """Uncompressed frame tag + first-partition header (RFC 6386 §9).

    Returns the parsed header with the boolean decoder NOT included;
    use :func:`decode_vp8_frame` for the full pixel path. Raises
    ImageDecodeError on interframes or malformed headers."""
    hdr, _bd, _mb = _parse_headers(body)
    return hdr


def _parse_headers(body: bytes):
    if len(body) < 10:
        raise ImageDecodeError("VP8 payload truncated")
    b0, b1, b2 = body[0], body[1], body[2]
    if b0 & 1:
        raise ImageDecodeError("VP8 interframe: key frame required")
    version = (b0 >> 1) & 7
    show_frame = (b0 >> 4) & 1
    first_part_size = (b0 >> 5) | (b1 << 3) | (b2 << 11)
    if body[3:6] != b"\x9d\x01\x2a":
        raise ImageDecodeError("bad VP8 key-frame start code")
    width = int.from_bytes(body[6:8], "little") & 0x3FFF
    height = int.from_bytes(body[8:10], "little") & 0x3FFF
    if width == 0 or height == 0:
        raise ImageDecodeError("VP8 zero dimension")
    if 10 + first_part_size > len(body):
        raise ImageDecodeError("VP8 first partition overruns payload")

    bd = BoolDecoder(body[10 : 10 + first_part_size])
    hdr = _FrameHeader()
    hdr.version = version
    hdr.show_frame = show_frame
    hdr.width, hdr.height = width, height
    hdr.first_part_size = first_part_size

    bd.get(128)  # color_space (must be 0; tolerated)
    bd.get(128)  # clamping_type (we always clamp)

    # segmentation (§9.3)
    hdr.seg_enabled = bd.get(128)
    hdr.seg_update_map = 0
    hdr.seg_abs = 0
    hdr.seg_quant = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_tree_probs = [255, 255, 255]
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            hdr.seg_abs = bd.get(128)
            for i in range(4):
                if bd.get(128):
                    hdr.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.get(128):
                    hdr.seg_lf[i] = bd.signed_literal(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.get(128):
                    hdr.seg_tree_probs[i] = bd.literal(8)

    # loop filter (§9.4)
    hdr.filter_simple = bd.get(128)
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bd.get(128)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.get(128):  # delta update
            for i in range(4):
                if bd.get(128):
                    hdr.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.get(128):
                    hdr.mode_lf_deltas[i] = bd.signed_literal(6)

    hdr.n_parts = 1 << bd.literal(2)  # §9.5

    # quantizer indices (§9.6)
    y_ac_qi = bd.literal(7)
    y1dc_d = bd.signed_literal(4) if bd.get(128) else 0
    y2dc_d = bd.signed_literal(4) if bd.get(128) else 0
    y2ac_d = bd.signed_literal(4) if bd.get(128) else 0
    uvdc_d = bd.signed_literal(4) if bd.get(128) else 0
    uvac_d = bd.signed_literal(4) if bd.get(128) else 0
    # raw indices kept for the re-packer (functions/vp8_repack.py)
    hdr.quant_indices = (
        y_ac_qi, (y1dc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d)
    )

    quants = []
    for seg in range(4):
        if hdr.seg_enabled:
            qi = hdr.seg_quant[seg] if hdr.seg_abs else (
                y_ac_qi + hdr.seg_quant[seg]
            )
        else:
            qi = y_ac_qi
        qi = _clamp_q(qi)
        y1dc = DC_QLOOKUP[_clamp_q(qi + y1dc_d)]
        y1ac = AC_QLOOKUP[qi]
        y2dc = DC_QLOOKUP[_clamp_q(qi + y2dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(qi + y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(qi + uvdc_d)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(qi + uvac_d)]
        quants.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    hdr.quant = quants

    bd.get(128)  # refresh_entropy_probs (key frame: value irrelevant)

    # coefficient probability updates (§13.4)
    probs = [
        [[list(ctx) for ctx in band] for band in plane]
        for plane in COEFF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                upd = COEFF_UPDATE_PROBS[i][j][k]
                row = probs[i][j][k]
                for t in range(11):
                    if bd.get(upd[t]):
                        row[t] = bd.literal(8)
    hdr.coeff_probs = probs

    hdr.skip_enabled = bd.get(128)
    hdr.prob_skip_false = bd.literal(8) if hdr.skip_enabled else 0

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    return hdr, bd, (mb_w, mb_h)


# ---------------------------------------------------------------------------
# per-macroblock mode decode (first partition, §10-11)
# ---------------------------------------------------------------------------


def _decode_modes(hdr, bd, mb_w, mb_h):
    """Raster-order key-frame mode parse. Returns per-MB lists:
    (segment, skip_flag, ymode, uvmode, bmodes-or-None)."""
    out = []
    above_b = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for _my in range(mb_h):
        left_b = [B_DC_PRED] * 4
        for mx in range(mb_w):
            seg = 0
            if hdr.seg_enabled and hdr.seg_update_map:
                seg = bd.tree(_SEGMENT_TREE, hdr.seg_tree_probs)
            skip = bd.get(hdr.prob_skip_false) if hdr.skip_enabled else 0
            ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            bmodes = None
            if ymode == B_PRED:
                bmodes = [0] * 16
                for i in range(16):
                    a = above_b[mx][i & 3] if i < 4 else bmodes[i - 4]
                    l = left_b[i >> 2] if (i & 3) == 0 else bmodes[i - 1]
                    m = bd.tree(_BMODE_TREE, KF_BMODE_PROBS[a][l])
                    bmodes[i] = m
                above_b[mx] = bmodes[12:16]
                left_b = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                imp = _IMPLIED_BMODE[ymode]
                above_b[mx] = [imp] * 4
                left_b = [imp] * 4
            uvmode = bd.tree(_UV_MODE_TREE, _KF_UV_PROBS)
            out.append((seg, skip, ymode, uvmode, bmodes))
    return out


# ---------------------------------------------------------------------------
# coefficient token decode (§13)
# ---------------------------------------------------------------------------


def _decode_block(bd, probs, first_coeff, ctx, dq_dc, dq_ac, coeffs):
    """Decode one 4x4 block's tokens into ``coeffs`` (len-16 list,
    zigzag-inverted, dequantized). Returns 1 if any nonzero."""
    c = first_coeff
    skip_eob = False
    nz = 0
    while c < 16:
        p = probs[_COEFF_BANDS[c]][ctx]
        if not skip_eob:
            if not bd.get(p[0]):
                break
        if not bd.get(p[1]):
            ctx = 0
            skip_eob = True
            c += 1
            continue
        skip_eob = False
        if not bd.get(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.get(p[3]):
                if not bd.get(p[4]):
                    val = 2
                else:
                    val = 3 + bd.get(p[5])
            else:
                if not bd.get(p[6]):
                    cat = 0 if not bd.get(p[7]) else 1
                elif not bd.get(p[8]):
                    cat = 2 if not bd.get(p[9]) else 3
                else:
                    cat = 4 if not bd.get(p[10]) else 5
                val = _CAT_BASE[cat]
                bits = 0
                for cp in _CAT_PROBS[cat]:
                    bits = (bits << 1) | bd.get(cp)
                val += bits
        if bd.get(128):
            val = -val
        dq = dq_dc if c == 0 else dq_ac
        coeffs[_ZIGZAG[c]] = val * dq
        nz = 1
        c += 1
    return nz


# ---------------------------------------------------------------------------
# inverse transforms (§14.3-4)
# ---------------------------------------------------------------------------

_C1 = 20091  # cospi8sqrt2 - 1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def _idct4x4(b):
    """In-place RFC 6386 §14.4 inverse DCT on a len-16 row-major list."""
    t = [0] * 16
    for i in range(4):
        i0, i4, i8, i12 = b[i], b[i + 4], b[i + 8], b[i + 12]
        a1 = i0 + i8
        b1 = i0 - i8
        c1 = ((i4 * _C2) >> 16) - (i12 + ((i12 * _C1) >> 16))
        d1 = (i4 + ((i4 * _C1) >> 16)) + ((i12 * _C2) >> 16)
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1
        t[i + 8] = b1 - c1
    for i in range(4):
        r = i * 4
        i0, i1, i2, i3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
        d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
        b[r] = (a1 + d1 + 4) >> 3
        b[r + 3] = (a1 - d1 + 4) >> 3
        b[r + 1] = (b1 + c1 + 4) >> 3
        b[r + 2] = (b1 - c1 + 4) >> 3


def _iwalsh(b):
    """RFC 6386 §14.3 inverse WHT; returns the 16 Y-subblock DCs."""
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 12]
        b1 = b[i + 4] + b[i + 8]
        c1 = b[i + 4] - b[i + 8]
        d1 = b[i] - b[i + 12]
        t[i] = a1 + b1
        t[i + 4] = c1 + d1
        t[i + 8] = a1 - b1
        t[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# intra prediction (§12)
# ---------------------------------------------------------------------------


def _whole_block_predict(plane, y0, x0, size, mode, have_above, have_left):
    """16x16 / 8x8 prediction into an int array; ``plane`` carries a
    1-px top/left border (127 above row / 129 left col)."""
    above = plane[y0 - 1, x0 : x0 + size].astype(np.int32)
    left = plane[y0 : y0 + size, x0 - 1].astype(np.int32)
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                size.bit_length() + 0
            )
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED: the predictor itself saturates to pixel range (§12.2)
    p = int(plane[y0 - 1, x0 - 1])
    return np.clip(left[:, None] + above[None, :] - p, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _bpred(mode, A, L, P, AR):
    """4x4 subblock prediction (§12.3). A/L are len-4 int lists, P the
    above-left pixel, AR the four above-right pixels."""
    o = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                o[r][c] = dc
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                o[r][c] = 0 if v < 0 else 255 if v > 255 else v
    elif mode == B_VE_PRED:
        e = [P] + A + [AR[0]]
        row = [_avg3(e[c], e[c + 1], e[c + 2]) for c in range(4)]
        for r in range(4):
            o[r] = row[:]
    elif mode == B_HE_PRED:
        e = [P] + L + [L[3]]
        for r in range(4):
            v = _avg3(e[r], e[r + 1], e[r + 2])
            o[r] = [v] * 4
    elif mode == B_LD_PRED:
        e = A + AR
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    o[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    o[r][c] = _avg3(e[6], e[7], e[7])
    elif mode == B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                o[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR_PRED:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        o[3][0] = _avg3(e[1], e[2], e[3])
        o[2][0] = _avg3(e[2], e[3], e[4])
        o[3][1] = o[1][0] = _avg3(e[3], e[4], e[5])
        o[2][1] = o[0][0] = _avg2(e[4], e[5])
        o[3][2] = o[1][1] = _avg3(e[4], e[5], e[6])
        o[2][2] = o[0][1] = _avg2(e[5], e[6])
        o[3][3] = o[1][2] = _avg3(e[5], e[6], e[7])
        o[2][3] = o[0][2] = _avg2(e[6], e[7])
        o[1][3] = _avg3(e[6], e[7], e[8])
        o[0][3] = _avg2(e[7], e[8])
    elif mode == B_VL_PRED:
        e = A + AR
        o[0][0] = _avg2(e[0], e[1])
        o[1][0] = _avg3(e[0], e[1], e[2])
        o[2][0] = o[0][1] = _avg2(e[1], e[2])
        o[1][1] = o[3][0] = _avg3(e[1], e[2], e[3])
        o[2][1] = o[0][2] = _avg2(e[2], e[3])
        o[3][1] = o[1][2] = _avg3(e[2], e[3], e[4])
        o[2][2] = o[0][3] = _avg2(e[3], e[4])
        o[3][2] = o[1][3] = _avg3(e[3], e[4], e[5])
        o[2][3] = _avg3(e[4], e[5], e[6])
        o[3][3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HD_PRED:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        o[3][0] = _avg2(e[0], e[1])
        o[3][1] = _avg3(e[0], e[1], e[2])
        o[3][2] = o[2][0] = _avg2(e[1], e[2])
        o[3][3] = o[2][1] = _avg3(e[1], e[2], e[3])
        o[2][2] = o[1][0] = _avg2(e[2], e[3])
        o[2][3] = o[1][1] = _avg3(e[2], e[3], e[4])
        o[1][2] = o[0][0] = _avg2(e[3], e[4])
        o[1][3] = o[0][1] = _avg3(e[3], e[4], e[5])
        o[0][2] = _avg3(e[4], e[5], e[6])
        o[0][3] = _avg3(e[5], e[6], e[7])
    else:  # B_HU_PRED
        o[0][0] = _avg2(L[0], L[1])
        o[0][1] = _avg3(L[0], L[1], L[2])
        o[0][2] = o[1][0] = _avg2(L[1], L[2])
        o[0][3] = o[1][1] = _avg3(L[1], L[2], L[3])
        o[1][2] = o[2][0] = _avg2(L[2], L[3])
        o[1][3] = o[2][1] = _avg3(L[2], L[3], L[3])
        o[2][2] = o[2][3] = L[3]
        o[3] = [L[3]] * 4
    return o


# ---------------------------------------------------------------------------
# loop filter (§15)
# ---------------------------------------------------------------------------


def _s(x):
    return x.astype(np.int32) - 128


def _c(x):
    return np.clip(x, -128, 127)


def _u(x):
    return (np.clip(x, -128, 127) + 128).astype(np.uint8)


def _normal_filter(px, mb_edge, interior, edge_limit, hev_thr):
    """Filter one edge: ``px`` is an (8, n) int array of the pixels
    p3 p2 p1 p0 q0 q1 q2 q3 across the edge. Returns filtered uint8."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i].astype(np.int32) for i in range(8))
    mask = (
        (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_limit)
    )
    hev = (np.abs(p1 - p0) > hev_thr) | (np.abs(q1 - q0) > hev_thr)
    P1, P0, Q0, Q1, P2, Q2 = _s(p1), _s(p0), _s(q0), _s(q1), _s(p2), _s(q2)

    # common_adjust with outer taps (hev path / subblock hev)
    a_o = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
    f_o = _c(a_o + 4) >> 3
    e_o = _c(a_o + 3) >> 3
    q0_o = Q0 - f_o
    p0_o = P0 + e_o
    # common_adjust without outer taps (subblock non-hev path)
    a_i = _c(3 * (Q0 - P0))
    f_i = _c(a_i + 4) >> 3
    e_i = _c(a_i + 3) >> 3
    q0_i = Q0 - f_i
    p0_i = P0 + e_i
    fi_half = (f_i + 1) >> 1
    q1_i = Q1 - fi_half
    p1_i = P1 + fi_half

    if mb_edge:
        w = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
        a27 = _c((27 * w + 63) >> 7)
        a18 = _c((18 * w + 63) >> 7)
        a9 = _c((9 * w + 63) >> 7)
        sel = mask & ~hev
        out_p2 = np.where(sel, _u(P2 + a9), p2.astype(np.uint8))
        out_p1 = np.where(sel, _u(P1 + a18), p1.astype(np.uint8))
        out_p0 = np.where(sel, _u(P0 + a27), p0.astype(np.uint8))
        out_q0 = np.where(sel, _u(Q0 - a27), q0.astype(np.uint8))
        out_q1 = np.where(sel, _u(Q1 - a18), q1.astype(np.uint8))
        out_q2 = np.where(sel, _u(Q2 - a9), q2.astype(np.uint8))
        selh = mask & hev
        out_p0 = np.where(selh, _u(p0_o), out_p0)
        out_q0 = np.where(selh, _u(q0_o), out_q0)
        return np.stack([
            p3.astype(np.uint8), out_p2, out_p1, out_p0,
            out_q0, out_q1, out_q2, q3.astype(np.uint8),
        ])
    # subblock edge
    out_p0 = np.where(mask, np.where(hev, _u(p0_o), _u(p0_i)),
                      p0.astype(np.uint8))
    out_q0 = np.where(mask, np.where(hev, _u(q0_o), _u(q0_i)),
                      q0.astype(np.uint8))
    out_p1 = np.where(mask & ~hev, _u(p1_i), p1.astype(np.uint8))
    out_q1 = np.where(mask & ~hev, _u(q1_i), q1.astype(np.uint8))
    return np.stack([
        p3.astype(np.uint8), p2.astype(np.uint8), out_p1, out_p0,
        out_q0, out_q1, q2.astype(np.uint8), q3.astype(np.uint8),
    ])


def _simple_filter(px, edge_limit):
    """Simple loop filter (§15.1) on an (4, n) p1 p0 q0 q1 window."""
    p1, p0, q0, q1 = (px[i].astype(np.int32) for i in range(4))
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_limit
    P1, P0, Q0, Q1 = _s(p1), _s(p0), _s(q0), _s(q1)
    a = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    out_q0 = np.where(mask, _u(Q0 - f), q0.astype(np.uint8))
    out_p0 = np.where(mask, _u(P0 + e), p0.astype(np.uint8))
    return np.stack([p1.astype(np.uint8), out_p0, out_q0,
                     q1.astype(np.uint8)])


def _filter_v_edge(plane, y0, x0, n, mb_edge, interior, edge, hev, simple):
    """Vertical edge at column x0 (pixels rows y0..y0+n)."""
    if simple:
        win = plane[y0 : y0 + n, x0 - 2 : x0 + 2].T.copy()
        plane[y0 : y0 + n, x0 - 2 : x0 + 2] = _simple_filter(win, edge).T
    else:
        win = plane[y0 : y0 + n, x0 - 4 : x0 + 4].T.copy()
        plane[y0 : y0 + n, x0 - 4 : x0 + 4] = _normal_filter(
            win, mb_edge, interior, edge, hev
        ).T


def _filter_h_edge(plane, y0, x0, n, mb_edge, interior, edge, hev, simple):
    """Horizontal edge at row y0 (pixels cols x0..x0+n)."""
    if simple:
        win = plane[y0 - 2 : y0 + 2, x0 : x0 + n].copy()
        plane[y0 - 2 : y0 + 2, x0 : x0 + n] = _simple_filter(win, edge)
    else:
        win = plane[y0 - 4 : y0 + 4, x0 : x0 + n].copy()
        plane[y0 - 4 : y0 + 4, x0 : x0 + n] = _normal_filter(
            win, mb_edge, interior, edge, hev
        )


def _loop_filter(hdr, ypl, upl, vpl, mb_w, mb_h, mb_info):
    """Full-frame in-place loop filter, MB raster order (§15.2)."""
    for my in range(mb_h):
        for mx in range(mb_w):
            seg, ymode, has_coeffs = mb_info[my * mb_w + mx]
            level = hdr.filter_level
            if hdr.seg_enabled:
                level = hdr.seg_lf[seg] if hdr.seg_abs else (
                    level + hdr.seg_lf[seg]
                )
                level = 0 if level < 0 else 63 if level > 63 else level
            if hdr.lf_delta_enabled:
                level += hdr.ref_lf_deltas[0]  # INTRA_FRAME
                if ymode == B_PRED:
                    level += hdr.mode_lf_deltas[0]
                level = 0 if level < 0 else 63 if level > 63 else level
            if level == 0:
                continue
            interior = level
            if hdr.sharpness:
                interior >>= 2 if hdr.sharpness > 4 else 1
                cap = 9 - hdr.sharpness
                if interior > cap:
                    interior = cap
            if interior < 1:
                interior = 1
            hev = 0
            if level >= 40:
                hev = 2
            elif level >= 15:
                hev = 1
            mb_lim = ((level + 2) * 2) + interior
            sb_lim = (level * 2) + interior
            filt_sub = has_coeffs or ymode == B_PRED
            simple = bool(hdr.filter_simple)

            yy, xx = 1 + my * 16, 1 + mx * 16
            cy, cx = 1 + my * 8, 1 + mx * 8
            if mx > 0:
                _filter_v_edge(ypl, yy, xx, 16, True, interior, mb_lim,
                               hev, simple)
                if not simple:
                    _filter_v_edge(upl, cy, cx, 8, True, interior,
                                   mb_lim, hev, False)
                    _filter_v_edge(vpl, cy, cx, 8, True, interior,
                                   mb_lim, hev, False)
            if filt_sub:
                for dx in (4, 8, 12):
                    _filter_v_edge(ypl, yy, xx + dx, 16, False, interior,
                                   sb_lim, hev, simple)
                if not simple:
                    _filter_v_edge(upl, cy, cx + 4, 8, False, interior,
                                   sb_lim, hev, False)
                    _filter_v_edge(vpl, cy, cx + 4, 8, False, interior,
                                   sb_lim, hev, False)
            if my > 0:
                _filter_h_edge(ypl, yy, xx, 16, True, interior, mb_lim,
                               hev, simple)
                if not simple:
                    _filter_h_edge(upl, cy, cx, 8, True, interior,
                                   mb_lim, hev, False)
                    _filter_h_edge(vpl, cy, cx, 8, True, interior,
                                   mb_lim, hev, False)
            if filt_sub:
                for dy in (4, 8, 12):
                    _filter_h_edge(ypl, yy + dy, xx, 16, False, interior,
                                   sb_lim, hev, simple)
                if not simple:
                    _filter_h_edge(upl, cy + 4, cx, 8, False, interior,
                                   sb_lim, hev, False)
                    _filter_h_edge(vpl, cy + 4, cx, 8, False, interior,
                                   sb_lim, hev, False)


# ---------------------------------------------------------------------------
# full frame decode
# ---------------------------------------------------------------------------


def decode_vp8_frame(body: bytes):
    """VP8 key-frame payload ('VP8 ' chunk body) -> (y, u, v) uint8
    planes of shape (h, w), ((h+1)//2, (w+1)//2) x2 — bit-exact with
    libwebp's WebPDecodeYUV on the same bytes."""
    hdr, bd, (mb_w, mb_h) = _parse_headers(body)

    # token partitions (§9.5): sizes trailer then data
    rest = body[10 + hdr.first_part_size :]
    nparts = hdr.n_parts
    sizes_len = 3 * (nparts - 1)
    if len(rest) < sizes_len:
        raise ImageDecodeError("VP8 partition size trailer truncated")
    offs = sizes_len
    parts = []
    for i in range(nparts):
        if i < nparts - 1:
            sz = int.from_bytes(rest[3 * i : 3 * i + 3], "little")
            if offs + sz > len(rest):
                raise ImageDecodeError("VP8 token partition overruns")
        else:
            sz = len(rest) - offs
            if sz < 0:
                raise ImageDecodeError("VP8 token partition overruns")
        parts.append(BoolDecoder(rest[offs : offs + sz]))
        offs += sz

    modes = _decode_modes(hdr, bd, mb_w, mb_h)

    # planes with 1-px prediction border (top 127 / left 129) plus a
    # 4-px right apron on Y for the B_PRED above-right reads
    ypl = np.empty((1 + mb_h * 16, 1 + mb_w * 16 + 4), dtype=np.uint8)
    upl = np.empty((1 + mb_h * 8, 1 + mb_w * 8), dtype=np.uint8)
    vpl = np.empty_like(upl)
    for pl in (ypl, upl, vpl):
        pl[0, :] = 127
        pl[1:, 0] = 129

    # nonzero-coefficient contexts (§13.3)
    above_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_y2 = np.zeros(mb_w, dtype=np.int8)

    mb_info = []
    probs = hdr.coeff_probs
    for my in range(mb_h):
        td = parts[my % nparts]
        left_y = [0, 0, 0, 0]
        left_u = [0, 0]
        left_v = [0, 0]
        left_y2 = 0
        for mx in range(mb_w):
            seg, skip, ymode, uvmode, bmodes = modes[my * mb_w + mx]
            has_y2 = ymode != B_PRED
            coeffs = [[0] * 16 for _ in range(25)]
            total_nz = 0
            if not skip:
                dq = hdr.quant[seg]
                y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq
                if has_y2:
                    ctx = int(above_y2[mx]) + left_y2
                    nz = _decode_block(td, probs[1], 0, ctx, y2dc, y2ac,
                                       coeffs[24])
                    above_y2[mx] = left_y2 = nz
                    total_nz += nz
                    first, ptype = 1, 0
                else:
                    first, ptype = 0, 3
                for i in range(16):
                    r, c = i >> 2, i & 3
                    ctx = int(above_y[mx][c]) + left_y[r]
                    nz = _decode_block(td, probs[ptype], first, ctx,
                                       y1dc, y1ac, coeffs[i])
                    above_y[mx][c] = left_y[r] = nz
                    total_nz += nz
                for i in range(4):
                    r, c = i >> 1, i & 1
                    ctx = int(above_u[mx][c]) + left_u[r]
                    nz = _decode_block(td, probs[2], 0, ctx, uvdc, uvac,
                                       coeffs[16 + i])
                    above_u[mx][c] = left_u[r] = nz
                    total_nz += nz
                for i in range(4):
                    r, c = i >> 1, i & 1
                    ctx = int(above_v[mx][c]) + left_v[r]
                    nz = _decode_block(td, probs[2], 0, ctx, uvdc, uvac,
                                       coeffs[20 + i])
                    above_v[mx][c] = left_v[r] = nz
                    total_nz += nz
            else:
                above_y[mx][:] = 0
                left_y = [0, 0, 0, 0]
                above_u[mx][:] = 0
                above_v[mx][:] = 0
                left_u = [0, 0]
                left_v = [0, 0]
                if has_y2:
                    above_y2[mx] = left_y2 = 0
                # B_PRED skip leaves the Y2 contexts untouched (§13.3)

            _reconstruct_mb(
                hdr, ypl, upl, vpl, my, mx, mb_w, mb_h, ymode, uvmode,
                bmodes, coeffs, has_y2,
            )
            mb_info.append((seg, ymode, total_nz > 0))
        # refresh the Y right apron from the rightmost column so the
        # next row's rightmost B_PRED above-right reads replication
        ypl[1 + my * 16 : 1 + (my + 1) * 16, 1 + mb_w * 16 :] = ypl[
            1 + my * 16 : 1 + (my + 1) * 16, mb_w * 16 : 1 + mb_w * 16
        ]

    if hdr.filter_level > 0 or hdr.seg_enabled or hdr.lf_delta_enabled:
        _loop_filter(hdr, ypl, upl, vpl, mb_w, mb_h, mb_info)

    w, h = hdr.width, hdr.height
    y = ypl[1 : 1 + h, 1 : 1 + w].copy()
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    u = upl[1 : 1 + ch, 1 : 1 + cw].copy()
    v = vpl[1 : 1 + ch, 1 : 1 + cw].copy()
    return y, u, v


def _reconstruct_mb(hdr, ypl, upl, vpl, my, mx, mb_w, mb_h, ymode,
                    uvmode, bmodes, coeffs, has_y2):
    yy, xx = 1 + my * 16, 1 + mx * 16
    have_above, have_left = my > 0, mx > 0

    if has_y2:
        dcs = _iwalsh(coeffs[24])
        for i in range(16):
            coeffs[i][0] = dcs[i]

    if ymode != B_PRED:
        pred = _whole_block_predict(ypl, yy, xx, 16, ymode,
                                    have_above, have_left)
        for i in range(16):
            b = coeffs[i]
            _idct4x4(b)
            r0, c0 = (i >> 2) * 4, (i & 3) * 4
            blk = pred[r0 : r0 + 4, c0 : c0 + 4] + np.array(
                b, dtype=np.int32
            ).reshape(4, 4)
            ypl[yy + r0 : yy + r0 + 4, xx + c0 : xx + c0 + 4] = np.clip(
                blk, 0, 255
            ).astype(np.uint8)
    else:
        for i in range(16):
            sr, sc = i >> 2, i & 3
            by, bx = yy + sr * 4, xx + sc * 4
            A = [int(v) for v in ypl[by - 1, bx : bx + 4]]
            L = [int(v) for v in ypl[by : by + 4, bx - 1]]
            P = int(ypl[by - 1, bx - 1])
            if sc < 3 or sr == 0:
                AR = [int(v) for v in ypl[by - 1, bx + 4 : bx + 8]]
            else:
                # right-column subblocks below the top row reuse the
                # whole-MB above-right pixels (§12.3)
                AR = [int(v) for v in ypl[yy - 1, xx + 16 : xx + 20]]
            pred = _bpred(bmodes[i], A, L, P, AR)
            b = coeffs[i]
            _idct4x4(b)
            for r in range(4):
                row = ypl[by + r, bx : bx + 4]
                for c in range(4):
                    v = pred[r][c] + b[r * 4 + c]
                    row[c] = 0 if v < 0 else 255 if v > 255 else v

    cy, cx = 1 + my * 8, 1 + mx * 8
    for plane, base in ((upl, 16), (vpl, 20)):
        pred = _whole_block_predict(plane, cy, cx, 8, uvmode,
                                    have_above, have_left)
        for i in range(4):
            b = coeffs[base + i]
            _idct4x4(b)
            r0, c0 = (i >> 1) * 4, (i & 1) * 4
            blk = pred[r0 : r0 + 4, c0 : c0 + 4] + np.array(
                b, dtype=np.int32
            ).reshape(4, 4)
            plane[cy + r0 : cy + r0 + 4, cx + c0 : cx + c0 + 4] = np.clip(
                blk, 0, 255
            ).astype(np.uint8)


def vp8_yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    """BT.601 limited-range YUV 4:2:0 -> (h, w, 3) uint8 RGB with
    nearest-neighbour chroma upsampling. This is the documented
    display conversion for :func:`decode_webp`'s lossy arm — the
    bit-exact interop contract is at the YUV plane level (libwebp's
    fancy upsampler is a renderer choice, not part of the bitstream)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = (y.astype(np.int32) - 16) * 298
    ud = uu.astype(np.int32) - 128
    vd = vv.astype(np.int32) - 128
    r = (yf + 409 * vd + 128) >> 8
    g = (yf - 100 * ud - 208 * vd + 128) >> 8
    b = (yf + 516 * ud + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
