"""VP8 key-frame stream re-packer (RFC 6386 writer side).

Re-emits a parsed key frame bit-for-bit SEMANTICALLY — same modes,
same quantized coefficient levels, same reconstruction — while
changing the stream's PACKAGING: the token-partition count (1/2/4/8),
an added do-nothing segmentation map (all segments carry the same
quantizer, exercising the segment-tree decode path), and an added
zero-delta loop-filter adjustment block. Its purpose is coverage the
reference encoder never produces through the simple API: the decoder
in functions/vp8.py must reproduce identical planes from the repacked
stream, and the REAL libwebp must decode our re-emitted bytes to the
same planes too (tests/test_round12.py) — a two-sided interop proof
of the header/partition writer.

The boolean encoder keeps `low` as an exact big integer and
serializes once at flush (no carry propagation logic to get subtly
wrong); the round-trip property against functions/vp8.py's
BoolDecoder pins it.
"""

from __future__ import annotations

from history_collector_spark.functions.codec_errors import ImageDecodeError
from history_collector_spark.functions.vp8 import (
    _BMODE_TREE,
    _KF_UV_PROBS,
    _CAT_BASE,
    _CAT_PROBS,
    _COEFF_BANDS,
    _IMPLIED_BMODE,
    _KF_YMODE_PROBS,
    _KF_YMODE_TREE,
    _SEGMENT_TREE,
    _UV_MODE_TREE,
    _ZIGZAG,
    B_PRED,
    _decode_modes,
    _parse_headers,
)
from history_collector_spark.functions.vp8_tables import (
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    KF_BMODE_PROBS,
)


class BoolEncoder:
    """RFC 6386 boolean arithmetic encoder, big-int formulation: the
    interval [low, low + range) lives at scale 2**nbits; flush picks
    the stream integer = low (the decoder's zero-padded tail always
    lands inside the interval)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.range <<= 1
            self.nbits += 1

    def literal(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put(128, (value >> k) & 1)

    def signed_literal(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.put(128, 1 if value < 0 else 0)

    def tree(self, tree, probs, leaf: int, start: int = 0) -> None:
        path = _tree_path(tree, leaf, start)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    def flush(self) -> bytes:
        # the interval [low, low+range) lives at width nbits + 8 bits
        # (the initial range spans the top byte); emitting low at that
        # width, zero-padded to whole bytes, leaves every decoder read
        # at the interval's inclusive lower bound — the decoder's
        # EOF-as-zeros convention keeps the tail in-interval
        width = self.nbits + 8
        nbytes = (width + 7) // 8
        return (self.low << (8 * nbytes - width)).to_bytes(nbytes, "big")


def _tree_path(tree, leaf: int, start: int = 0):
    """DFS the RFC tree form for the (node, bit) path to ``leaf``."""
    out: list[tuple[int, int]] = []

    def walk(i: int, path) -> bool:
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt <= 0:
                if -nxt == leaf:
                    out.extend(path + [(i, bit)])
                    return True
            elif walk(nxt, path + [(i, bit)]):
                return True
        return False

    if not walk(start, []):
        raise ValueError(f"leaf {leaf} not in tree")
    return out


# ---------------------------------------------------------------------------
# stream collection: modes + quantized levels (no reconstruction)
# ---------------------------------------------------------------------------


def _collect_levels(hdr, parts, modes, mb_w, mb_h):
    """Token-decode every macroblock, keeping quantized LEVELS (the
    dequantized coefficient divided back by its quantizer — exact, the
    decoder multiplies integers). Mirrors decode_vp8_frame's context
    bookkeeping."""
    from history_collector_spark.functions.vp8 import _decode_block

    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    all_levels = []
    probs = hdr.coeff_probs
    nparts = len(parts)
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
            if not skip:
                y1dc, y1ac, y2dc, y2ac, uvdc, uvac = hdr.quant[seg]
                if has_y2:
                    ctx = above_y2[mx] + left_y2
                    nz = _decode_block(td, probs[1], 0, ctx, y2dc, y2ac,
                                       coeffs[24])
                    above_y2[mx] = left_y2 = nz
                    first, ptype = 1, 0
                else:
                    first, ptype = 0, 3
                for i in range(16):
                    r, c = i >> 2, i & 3
                    ctx = above_y[mx][c] + left_y[r]
                    nz = _decode_block(td, probs[ptype], first, ctx,
                                       y1dc, y1ac, coeffs[i])
                    above_y[mx][c] = left_y[r] = nz
                for i in range(4):
                    r, c = i >> 1, i & 1
                    ctx = above_u[mx][c] + left_u[r]
                    nz = _decode_block(td, probs[2], 0, ctx, uvdc, uvac,
                                       coeffs[16 + i])
                    above_u[mx][c] = left_u[r] = nz
                for i in range(4):
                    r, c = i >> 1, i & 1
                    ctx = above_v[mx][c] + left_v[r]
                    nz = _decode_block(td, probs[2], 0, ctx, uvdc, uvac,
                                       coeffs[20 + i])
                    above_v[mx][c] = left_v[r] = nz
                # back to quantized levels (coeff = level * quantizer)
                levels = []
                for bi in range(25):
                    blk = coeffs[bi]
                    lv = [0] * 16
                    for pos in range(16):
                        v = blk[pos]
                        if v:
                            if bi == 24:
                                dq = y2dc if pos == 0 else y2ac
                            elif bi >= 16:
                                dq = uvdc if pos == 0 else uvac
                            else:
                                dq = y1dc if pos == 0 else y1ac
                            lv[pos] = v // dq if v > 0 else -((-v) // dq)
                    levels.append(lv)
            else:
                levels = [[0] * 16 for _ in range(25)]
                above_y[mx] = [0] * 4
                left_y = [0, 0, 0, 0]
                above_u[mx] = [0, 0]
                above_v[mx] = [0, 0]
                left_u = [0, 0]
                left_v = [0, 0]
                if has_y2:
                    above_y2[mx] = left_y2 = 0
            all_levels.append(levels)
    return all_levels


# ---------------------------------------------------------------------------
# token / mode / header writers
# ---------------------------------------------------------------------------


def _write_block(be, probs, first_coeff, ctx, levels):
    """Mirror of vp8._decode_block: emit the token stream for one
    block's zigzag-position levels. Returns the nonzero flag."""
    # levels indexed by RASTER position; regain zigzag order
    zz = [levels[_ZIGZAG[c]] for c in range(16)]
    last = -1
    for c in range(first_coeff, 16):
        if zz[c]:
            last = c
    c = first_coeff
    skip_eob = False
    while c < 16:
        p = probs[_COEFF_BANDS[c]][ctx]
        if not skip_eob:
            if last < c:
                be.put(p[0], 0)  # EOB
                return 1 if last >= first_coeff else 0
            be.put(p[0], 1)
        val = zz[c]
        av = abs(val)
        if av == 0:
            be.put(p[1], 0)
            ctx = 0
            skip_eob = True
            c += 1
            continue
        be.put(p[1], 1)
        skip_eob = False
        if av == 1:
            be.put(p[2], 0)
            ctx = 1
        else:
            be.put(p[2], 1)
            ctx = 2
            if av <= 4:
                be.put(p[3], 0)
                if av == 2:
                    be.put(p[4], 0)
                else:
                    be.put(p[4], 1)
                    be.put(p[5], av - 3)
            else:
                be.put(p[3], 1)
                cat = next(
                    k for k in range(5, -1, -1) if av >= _CAT_BASE[k]
                )
                if cat <= 1:
                    be.put(p[6], 0)
                    be.put(p[7], cat)
                else:
                    be.put(p[6], 1)
                    if cat <= 3:
                        be.put(p[8], 0)
                        be.put(p[9], cat - 2)
                    else:
                        be.put(p[8], 1)
                        be.put(p[10], cat - 4)
                extra = av - _CAT_BASE[cat]
                cps = _CAT_PROBS[cat]
                for k in range(len(cps) - 1, -1, -1):
                    be.put(cps[len(cps) - 1 - k], (extra >> k) & 1)
        be.put(128, 1 if val < 0 else 0)
        c += 1
    return 1 if last >= first_coeff else 0


def repack_vp8(body: bytes, nparts: int = 1,
               add_segmentation: bool = False,
               add_lf_deltas: bool = False,
               force_simple_filter: bool = False) -> bytes:
    """Parse a key-frame payload and re-emit it with ``nparts`` token
    partitions (1/2/4/8), optionally adding a round-robin
    segmentation map whose four segments all carry the base quantizer
    (decode-identical pixels, real segment-tree bits) and a zero-delta
    loop-filter adjustment header. ``force_simple_filter`` flips the
    header's filter-type bit to the SIMPLE loop filter — the one
    packaging change that is NOT pixel-identical to the input (the
    simple filter smooths differently); its value is that libwebp and
    functions/vp8.py must still agree on the result bit-for-bit,
    covering the simple-filter path no reference encoder emits. The
    input must itself decode cleanly."""
    if nparts not in (1, 2, 4, 8):
        raise ValueError("nparts must be 1, 2, 4 or 8")
    hdr, bd, (mb_w, mb_h) = _parse_headers(body)
    if hdr.seg_enabled and add_segmentation:
        raise ValueError("input already segmented")
    rest = body[10 + hdr.first_part_size:]
    sizes_len = 3 * (hdr.n_parts - 1)
    offs = sizes_len
    parts = []
    from history_collector_spark.functions.vp8 import BoolDecoder

    for i in range(hdr.n_parts):
        if i < hdr.n_parts - 1:
            sz = int.from_bytes(rest[3 * i: 3 * i + 3], "little")
        else:
            sz = len(rest) - offs
        if sz < 0 or offs + sz > len(rest):
            raise ImageDecodeError("VP8 token partition overruns")
        parts.append(BoolDecoder(rest[offs: offs + sz]))
        offs += sz
    modes = _decode_modes(hdr, bd, mb_w, mb_h)
    levels = _collect_levels(hdr, parts, modes, mb_w, mb_h)

    seg_ids = None
    seg_tree_probs = (110, 140, 170)
    if add_segmentation:
        seg_ids = [
            (my * mb_w + mx) % 4
            for my in range(mb_h) for mx in range(mb_w)
        ]

    # ---- first partition ----
    be = BoolEncoder()
    be.put(128, 0)  # color_space
    be.put(128, 0)  # clamping_type
    if add_segmentation:
        be.put(128, 1)  # segmentation_enabled
        be.put(128, 1)  # update_mb_segmentation_map
        be.put(128, 1)  # update_segment_feature_data
        be.put(128, 0)  # feature mode: delta
        for _ in range(4):
            be.put(128, 0)  # quantizer delta absent (all segs = base)
        for _ in range(4):
            be.put(128, 0)  # loop-filter delta absent
        for pval in seg_tree_probs:
            be.put(128, 1)
            be.literal(pval, 8)
    else:
        be.put(128, 1 if hdr.seg_enabled else 0)
        if hdr.seg_enabled:
            # re-emit the parsed segmentation verbatim
            be.put(128, 1 if hdr.seg_update_map else 0)
            be.put(128, 1)  # update data (values re-stated)
            be.put(128, 1 if hdr.seg_abs else 0)
            for v in hdr.seg_quant:
                if v:
                    be.put(128, 1)
                    be.signed_literal(v, 7)
                else:
                    be.put(128, 0)
            for v in hdr.seg_lf:
                if v:
                    be.put(128, 1)
                    be.signed_literal(v, 6)
                else:
                    be.put(128, 0)
            if hdr.seg_update_map:
                for pval in hdr.seg_tree_probs:
                    if pval != 255:
                        be.put(128, 1)
                        be.literal(pval, 8)
                    else:
                        be.put(128, 0)
    be.put(128, 1 if force_simple_filter else hdr.filter_simple)
    be.literal(hdr.filter_level, 6)
    be.literal(hdr.sharpness, 3)
    if add_lf_deltas and not hdr.lf_delta_enabled:
        be.put(128, 1)  # enabled
        be.put(128, 1)  # update
        for _ in range(8):
            be.put(128, 0)  # all eight deltas absent -> zero
    else:
        be.put(128, 1 if hdr.lf_delta_enabled else 0)
        if hdr.lf_delta_enabled:
            be.put(128, 1)
            for v in list(hdr.ref_lf_deltas) + list(hdr.mode_lf_deltas):
                if v:
                    be.put(128, 1)
                    be.signed_literal(v, 6)
                else:
                    be.put(128, 0)
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[nparts], 2)
    # quantizer indices: re-derive from the parsed per-segment tuples
    # is lossy (lookups), so carry them through the parse fields
    y_ac_qi, deltas = hdr.quant_indices
    be.literal(y_ac_qi, 7)
    for dv in deltas:
        if dv:
            be.put(128, 1)
            be.signed_literal(dv, 4)
        else:
            be.put(128, 0)
    be.put(128, 0)  # refresh_entropy_probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                upd = COEFF_UPDATE_PROBS[i][j][k]
                cur = hdr.coeff_probs[i][j][k]
                for t in range(11):
                    if cur[t] != COEFF_PROBS[i][j][k][t]:
                        be.put(upd[t], 1)
                        be.literal(cur[t], 8)
                    else:
                        be.put(upd[t], 0)
    be.put(128, hdr.skip_enabled)
    if hdr.skip_enabled:
        be.literal(hdr.prob_skip_false, 8)

    # per-MB modes (and the new segment ids)
    above_b = [[0] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_b = [0] * 4
        for mx in range(mb_w):
            seg, skip, ymode, uvmode, bmodes = modes[my * mb_w + mx]
            if add_segmentation:
                be.tree(_SEGMENT_TREE, seg_tree_probs,
                        seg_ids[my * mb_w + mx])
            elif hdr.seg_enabled and hdr.seg_update_map:
                be.tree(_SEGMENT_TREE, hdr.seg_tree_probs, seg)
            if hdr.skip_enabled:
                be.put(hdr.prob_skip_false, skip)
            be.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS, ymode)
            if ymode == B_PRED:
                for i in range(16):
                    a = above_b[mx][i & 3] if i < 4 else bmodes[i - 4]
                    left = (left_b[i >> 2] if (i & 3) == 0
                            else bmodes[i - 1])
                    be.tree(_BMODE_TREE, KF_BMODE_PROBS[a][left],
                            bmodes[i])
                above_b[mx] = bmodes[12:16]
                left_b = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                imp = _IMPLIED_BMODE[ymode]
                above_b[mx] = [imp] * 4
                left_b = [imp] * 4
            be.tree(_UV_MODE_TREE, _KF_UV_PROBS, uvmode)
    first_part = be.flush()

    # ---- token partitions ----
    encs = [BoolEncoder() for _ in range(nparts)]
    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    probs = hdr.coeff_probs
    for my in range(mb_h):
        te = encs[my % nparts]
        left_y = [0, 0, 0, 0]
        left_u = [0, 0]
        left_v = [0, 0]
        left_y2 = 0
        for mx in range(mb_w):
            seg, skip, ymode, uvmode, bmodes = modes[my * mb_w + mx]
            has_y2 = ymode != B_PRED
            lv = levels[my * mb_w + mx]
            if skip:
                above_y[mx] = [0] * 4
                left_y = [0, 0, 0, 0]
                above_u[mx] = [0, 0]
                above_v[mx] = [0, 0]
                left_u = [0, 0]
                left_v = [0, 0]
                if has_y2:
                    above_y2[mx] = left_y2 = 0
                continue
            if has_y2:
                ctx = above_y2[mx] + left_y2
                nz = _write_block(te, probs[1], 0, ctx, lv[24])
                above_y2[mx] = left_y2 = nz
                first, ptype = 1, 0
            else:
                first, ptype = 0, 3
            for i in range(16):
                r, c = i >> 2, i & 3
                ctx = above_y[mx][c] + left_y[r]
                nz = _write_block(te, probs[ptype], first, ctx, lv[i])
                above_y[mx][c] = left_y[r] = nz
            for i in range(4):
                r, c = i >> 1, i & 1
                ctx = above_u[mx][c] + left_u[r]
                nz = _write_block(te, probs[2], 0, ctx, lv[16 + i])
                above_u[mx][c] = left_u[r] = nz
            for i in range(4):
                r, c = i >> 1, i & 1
                ctx = above_v[mx][c] + left_v[r]
                nz = _write_block(te, probs[2], 0, ctx, lv[20 + i])
                above_v[mx][c] = left_v[r] = nz
    part_bytes = [e.flush() for e in encs]

    # ---- assemble ----
    fps = len(first_part)
    b0 = (0 << 0) | (0 << 1) | (1 << 4) | ((fps & 7) << 5)
    tag = bytes([b0, (fps >> 3) & 0xFF, (fps >> 11) & 0xFF])
    out = (
        tag + b"\x9d\x01\x2a"
        + (hdr.width & 0x3FFF).to_bytes(2, "little")
        + (hdr.height & 0x3FFF).to_bytes(2, "little")
        + first_part
    )
    for p in part_bytes[:-1]:
        out += len(p).to_bytes(3, "little")
    for p in part_bytes:
        out += p
    return out
