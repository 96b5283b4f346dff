"""From-scratch WebP VP8L (lossless) codec.

Closes the last big decode gap the yield scorecard deliberately
surfaced (`multimodal_decode_yield` routed WebP blobs to the
NotImplementedError plug point): WebP is a large share of modern
crawls, and its lossless half is tractable in pure Python.

Implemented per the public WebP Lossless Bitstream Specification
(RFC 9649). Decoder coverage:

- RIFF container framing: 'VP8L' lossless here; lossy 'VP8 ' key
  frames decode via the from-scratch RFC 6386 decoder in
  functions/vp8.py, extended 'VP8X' stills (incl. the ALPH alpha
  plane, raw or headerless-VP8L) decode below, and since round 13
  ANIMATED containers (ANIM/ANMF) composite to per-frame canvases
  via decode_webp_anim (blend/no-blend, dispose-to-background),
- LSB-first bitstream, canonical prefix codes (simple 1/2-symbol and
  normal code-length-coded forms, incl. 16/17/18 repeat codes and the
  optional max_symbol short-circuit),
- color cache, LZ77 backward references with the 120-entry 2D
  distance neighborhood map,
- meta prefix codes (the "huffman image" spatial code-group map),
- all four transforms: PREDICTOR (14 modes), COLOR (per-block
  cross-channel deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette,
  incl. sub-byte pixel bundling for palettes <= 16 entries).

The encoder is deliberately minimal — literal-only (no LZ77, no
cache), optional subtract-green, canonical codes from per-channel
histograms — because its job is to produce valid streams whose decode
is pixel-exact for the roundtrip oracles; LZ77 / cache / transform /
meta-code decode paths are exercised by hand-built bitstreams in the
test suite (tests/test_round10_waves.py) since no reference WebP
implementation exists in this environment.

Error contract: any malformed payload raises ImageDecodeError (shared
base in functions/codec_errors.py) so Arrow decode kernels degrade to
decode_status='error: ...' rows instead of killing tasks; the
mutation-fuzz sweep in tests/test_codec_fuzz.py pins this.
"""

from __future__ import annotations

from history_collector_spark.functions.codec_errors import ImageDecodeError

# order in which the 19 code-length-code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40

# transform tags
_PREDICTOR_TRANSFORM = 0
_COLOR_TRANSFORM = 1
_SUBTRACT_GREEN = 2
_COLOR_INDEXING = 3


def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry close-neighborhood (dx, dy) table: exactly the
    offsets with dy in 0..7 and dx in -7..8 (dy=0 rows require dx>=1),
    ordered by squared euclidean distance, ties broken larger dy
    first, then positive dx before negative.

    This is the spec's literal table: decoding the plane codes
    (y = v >> 4, x = 8 - (v & 0xF)) reproduces it entry for entry
    (pinned, all 120, in tests/test_round11.py). The former generator
    admitted dy=8 / dx=-8 offsets the spec excludes and truncated to
    120, displacing 24 far entries — real streams using distance
    codes 97-120 would have decoded to wrong pixel offsets."""
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    assert len(cands) == 120
    return cands


_DIST_MAP = _distance_map()


class _BitReader:
    """LSB-first bit reader; reading past the payload is a decode
    error (strict: truncated streams must degrade, not wrap)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ImageDecodeError("VP8L bitstream truncated")
        v = 0
        pos = self.pos
        for k in range(n):
            p = pos + k
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << k
        self.pos = end
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= 8 * len(self.data):
            raise ImageDecodeError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for k in range(n):
            self.bits.append((value >> k) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


class _PrefixCode:
    """Canonical prefix code. Decoding accumulates bits MSB-first
    (code = code*2 + next stream bit), the spec's ReadSymbol."""

    __slots__ = (
        "single",
        "first_code",
        "first_symbol_index",
        "counts",
        "symbols",
        "max_len",
        "_codes",
    )

    def __init__(self, code_lengths: list[int], single: int | None = None):
        if single is not None:
            self.single = single
            return
        used = [(l, s) for s, l in enumerate(code_lengths) if l > 0]
        if not used:
            raise ImageDecodeError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        used.sort()
        self.max_len = used[-1][0]
        # Kraft check: the code must not be over-subscribed
        kraft = sum(1 << (self.max_len - l) for l, _ in used)
        if kraft > (1 << self.max_len):
            raise ImageDecodeError("over-subscribed prefix code")
        self.symbols = [s for _, s in used]
        self.counts = [0] * (self.max_len + 1)
        for l, _ in used:
            self.counts[l] += 1
        self.first_code = [0] * (self.max_len + 1)
        self.first_symbol_index = [0] * (self.max_len + 1)
        code = 0
        idx = 0
        for l in range(1, self.max_len + 1):
            self.first_code[l] = code
            self.first_symbol_index[l] = idx
            code = (code + self.counts[l]) << 1
            idx += self.counts[l]
        # canonical codes per symbol (encoder side)
        self._codes = {}
        next_code = list(self.first_code)
        for l, s in used:
            self._codes[s] = (next_code[l], l)
            next_code[l] += 1

    def code_of(self, symbol: int) -> tuple[int, int]:
        return self._codes[symbol]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            off = code - self.first_code[l]
            if 0 <= off < self.counts[l]:
                return self.symbols[self.first_symbol_index[l] + off]
        raise ImageDecodeError("invalid prefix code word")


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Symbol -> code length from frequencies; falls back to a
    balanced complete code if the Huffman depth exceeds max_len."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, i2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i2, g1 + g2))
    if max(depth.values()) <= max_len:
        return depth
    # balanced complete code: x symbols at k-1 bits, rest at k
    n = len(syms)
    k = (n - 1).bit_length()
    x = (1 << k) - n
    by_freq = sorted(syms, key=lambda s: (-freqs[s], s))
    return {s: (k - 1 if i < x else k) for i, s in enumerate(by_freq)}


# ---------------------------------------------------------------------------
# prefix-code (de)serialization
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_8bits = br.read_bit()
        s0 = br.read(8 if first_8bits else 1)
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ImageDecodeError("simple-code symbol out of range")
            return _PrefixCode([], single=s0)
        s1 = br.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ImageDecodeError("bad simple-code symbols")
        lengths = [0] * alphabet_size
        lengths[s0] = 1
        lengths[s1] = 1
        return _PrefixCode(lengths)
    # normal code: code lengths are themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CLC_ORDER):
        raise ImageDecodeError("bad code-length count")
    clc_lengths = [0] * 19
    for i in range(num_code_lengths):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # limited max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            if symbol + rep > alphabet_size:
                raise ImageDecodeError("code-length repeat overflow")
            for _ in range(rep):
                lengths[symbol] = prev_len
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise ImageDecodeError("code-length zeros overflow")
    return _PrefixCode(lengths)


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int],
                       alphabet_size: int) -> _PrefixCode:
    """Encoder twin of _read_prefix_code (simple when possible, else
    normal with direct per-symbol code-length symbols)."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] <= 255:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        return _PrefixCode([], single=syms[0])
    if len(syms) == 2 and max(syms) <= 255 and all(
        lengths[s] == 1 for s in syms
    ):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)
        bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        full = [0] * alphabet_size
        full[syms[0]] = 1
        full[syms[1]] = 1
        return _PrefixCode(full)
    bw.write(0, 1)  # normal
    full = [0] * alphabet_size
    for s, l in lengths.items():
        full[s] = l
    used_cl = sorted({l for l in full})
    if len(used_cl) == 1:
        # degenerate: every symbol shares one length; a 1-symbol
        # code-length code cannot be transmitted (its 3-bit table
        # would be all zeros), so pad with a never-emitted sibling
        pad = 0 if used_cl[0] != 0 else 8
        cl_lengths = {used_cl[0]: 1, pad: 1}
    else:
        freqs: dict[int, int] = {}
        for l in full:
            freqs[l] = freqs.get(l, 0) + 1
        cl_lengths = _huffman_lengths(freqs, max_len=7)
    clc = [0] * 19
    for s, l in cl_lengths.items():
        clc[s] = l
    num_code_lengths = max(
        4, max(i for i, s in enumerate(_CLC_ORDER) if clc[s]) + 1
    )
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(clc[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol short-circuit
    code = _PrefixCode(clc)
    for l in full:
        c, n = code.code_of(l)
        for k in range(n - 1, -1, -1):  # MSB-first into the stream
            bw.write((c >> k) & 1, 1)
    return _PrefixCode(full)


def _write_symbol(bw: _BitWriter, code: _PrefixCode, symbol: int) -> None:
    if code.single is not None:
        return
    c, n = code.code_of(symbol)
    for k in range(n - 1, -1, -1):
        bw.write((c >> k) & 1, 1)


# ---------------------------------------------------------------------------
# entropy-coded image decode (shared by main image, transform data,
# palettes, and the meta-prefix "huffman image")
# ---------------------------------------------------------------------------


def _lz77_value(prefix_code: int, br: _BitReader) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _decode_entropy_image(
    br: _BitReader, xsize: int, ysize: int, allow_meta: bool
) -> list[int]:
    """Decode one entropy-coded ARGB image (list of xsize*ysize uint32
    pixels). Handles color cache, LZ77 refs, and (when allow_meta)
    spatial code-group selection via the huffman image."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ImageDecodeError(f"bad color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_codes: list[int] | None = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        mx = (xsize + (1 << meta_bits) - 1) >> meta_bits
        my = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, mx, my, allow_meta=False)
        meta_codes = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta_codes) + 1

    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, _NUM_DISTANCE_CODES)
        groups.append((g, r, b, a, d))

    n = xsize * ysize
    out: list[int] = []
    budget = 8 * len(br.data) + 64  # hard stop for corrupt streams

    def insert_cache(px: int) -> None:
        if cache is not None:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while len(out) < n:
        if br.pos > budget:
            raise ImageDecodeError("VP8L stream overruns payload")
        if meta_codes is not None:
            x = len(out) % xsize
            y = len(out) // xsize
            mx = (xsize + (1 << meta_bits) - 1) >> meta_bits
            gidx = meta_codes[(y >> meta_bits) * mx + (x >> meta_bits)]
            if gidx >= n_groups:
                raise ImageDecodeError("meta code out of range")
            gcode, rcode, bcode, acode, dcode = groups[gidx]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.read(br)
        if s < 256:  # literal
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            insert_cache(px)
        elif s < 256 + _NUM_LENGTH_CODES:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dcode.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > len(out) or len(out) + length > n:
                raise ImageDecodeError("bad LZ77 reference")
            start = len(out) - dist
            for k in range(length):
                px = out[start + k]
                out.append(px)
                insert_cache(px)
        else:  # color cache hit
            if cache is None:
                raise ImageDecodeError("cache symbol without cache")
            idx = s - 256 - _NUM_LENGTH_CODES
            out.append(cache[idx])
    return out


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _px_avg2(p1: int, p2: int) -> int:
    return (
        (_avg2((p1 >> 24) & 0xFF, (p2 >> 24) & 0xFF) << 24)
        | (_avg2((p1 >> 16) & 0xFF, (p2 >> 16) & 0xFF) << 16)
        | (_avg2((p1 >> 8) & 0xFF, (p2 >> 8) & 0xFF) << 8)
        | _avg2(p1 & 0xFF, p2 & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:
    p_alpha = ((l >> 24) & 0xFF) + ((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - ((l >> 24) & 0xFF))
        + abs(p_red - ((l >> 16) & 0xFF))
        + abs(p_green - ((l >> 8) & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - ((t >> 24) & 0xFF))
        + abs(p_red - ((t >> 16) & 0xFF))
        + abs(p_green - ((t >> 8) & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    return l if pl < pt else t


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
        out |= _clamp(v) << shift
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        x = (ab >> shift) & 0xFF
        cc = (c >> shift) & 0xFF
        # Clamp(x + (x - c) / 2) with C truncation-toward-zero division
        v = x + int((x - cc) / 2)
        out |= _clamp(v) << shift
    return out


_PREDICTORS = {
    5: lambda l, t, tr, tl: _px_avg2(_px_avg2(l, tr), t),
    6: lambda l, t, tr, tl: _px_avg2(l, tl),
    7: lambda l, t, tr, tl: _px_avg2(l, t),
    8: lambda l, t, tr, tl: _px_avg2(tl, t),
    9: lambda l, t, tr, tl: _px_avg2(t, tr),
    10: lambda l, t, tr, tl: _px_avg2(_px_avg2(l, tl), _px_avg2(t, tr)),
    11: lambda l, t, tr, tl: _select(l, t, tl),
    12: lambda l, t, tr, tl: _clamp_add_sub_full(l, t, tl),
    13: lambda l, t, tr, tl: _clamp_add_sub_half(_px_avg2(l, t), tl),
}


def _add_pixels(px: int, pred: int) -> int:
    return (
        ((((px >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
        | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inverse_predictor(px: list[int], xsize: int, ysize: int,
                       bits: int, pred_img: list[int]) -> None:
    pxs = (xsize + (1 << bits) - 1) >> bits
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # L
            elif x == 0:
                pred = px[i - xsize]  # T
            else:
                mode = (pred_img[(y >> bits) * pxs + (x >> bits)] >> 8) & 0xFF
                if mode > 13:
                    raise ImageDecodeError(f"bad predictor mode {mode}")
                l = px[i - 1]
                t = px[i - xsize]
                tl = px[i - xsize - 1]
                # TR at the rightmost column is the flat-buffer
                # wraparound px[i - xsize + 1] (= the leftmost pixel of
                # the CURRENT row) — normative behavior, not a clamp to
                # T: modes 3/5/9/10/11/13 predict the right edge from
                # it (pinned in tests/test_round11.py)
                tr = px[i - xsize + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                else:
                    pred = _PREDICTORS[mode](l, t, tr, tl)
            px[i] = _add_pixels(px[i], pred)


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(px: list[int], xsize: int, ysize: int,
                             bits: int, ct_img: list[int]) -> None:
    cxs = (xsize + (1 << bits) - 1) >> bits
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            cp = ct_img[(y >> bits) * cxs + (x >> bits)]
            # multipliers ride the low three channels of the ARGB
            # transform pixel: g2r in blue, g2b in green, r2b in red
            g2r = cp & 0xFF
            g2b = (cp >> 8) & 0xFF
            r2b = (cp >> 16) & 0xFF
            p = px[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green) & 0xFF
            blue = ((p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _inverse_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_color_index(packed: list[int], xsize: int, ysize: int,
                       palette: list[int], width_bits: int) -> list[int]:
    # out-of-range palette indices decode as transparent black
    # 0x00000000 per the spec (permissive encoders emit them), not as
    # a decode error
    if width_bits == 0:
        out = []
        for p in packed:
            idx = (p >> 8) & 0xFF
            out.append(palette[idx] if idx < len(palette) else 0)
        return out
    per = 1 << width_bits
    ibits = 8 >> width_bits
    mask = (1 << ibits) - 1
    pxs = (xsize + per - 1) >> width_bits
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        for x in range(xsize):
            g = (packed[y * pxs + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> (ibits * (x % per))) & mask
            out[y * xsize + x] = palette[idx] if idx < len(palette) else 0
    return out


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes):
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA array."""
    import numpy as np

    if not payload or payload[0] != 0x2F:
        raise ImageDecodeError("bad VP8L signature")
    br = _BitReader(payload[1:])
    xsize = br.read(14) + 1
    ysize = br.read(14) + 1
    br.read_bit()  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ImageDecodeError(f"unsupported VP8L version {version}")
    px = _decode_vp8l_pixels(br, xsize, ysize)

    arr = np.array(px, dtype=np.uint32).reshape(ysize, xsize)
    out = np.empty((ysize, xsize, 4), dtype=np.uint8)
    out[:, :, 0] = (arr >> 16) & 0xFF  # R
    out[:, :, 1] = (arr >> 8) & 0xFF  # G
    out[:, :, 2] = arr & 0xFF  # B
    out[:, :, 3] = (arr >> 24) & 0xFF  # A
    return out


def _decode_vp8l_pixels(br: "_BitReader", xsize: int, ysize: int):
    """Shared VP8L image-stream decode (transform loop + entropy image
    + inverse transforms) -> flat ARGB pixel list. Entered after the
    signature/dimension header by :func:`decode_vp8l`, and directly
    (headerless, dims known from the container) by the ALPH-chunk
    alpha decoder."""
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_x = xsize
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ImageDecodeError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (_PREDICTOR_TRANSFORM, _COLOR_TRANSFORM):
            bits = br.read(3) + 2
            tx = (cur_x + (1 << bits) - 1) >> bits
            ty = (ysize + (1 << bits) - 1) >> bits
            timg = _decode_entropy_image(br, tx, ty, allow_meta=False)
            transforms.append((ttype, bits, timg))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_deltas = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            palette = []
            prev = 0
            for d in pal_deltas:
                prev = _add_pixels(d, prev)
                palette.append(prev)
            width_bits = (
                3 if n_colors <= 2 else 2 if n_colors <= 4
                else 1 if n_colors <= 16 else 0
            )
            transforms.append((ttype, width_bits, palette))
            cur_x = (cur_x + (1 << width_bits) - 1) >> width_bits

    px = _decode_entropy_image(br, cur_x, ysize, allow_meta=True)

    for tr in reversed(transforms):
        if tr[0] == _COLOR_INDEXING:
            _, width_bits, palette = tr
            px = _apply_color_index(px, xsize, ysize, palette, width_bits)
            cur_x = xsize
        elif tr[0] == _SUBTRACT_GREEN:
            _inverse_subtract_green(px)
        elif tr[0] == _PREDICTOR_TRANSFORM:
            _inverse_predictor(px, cur_x, ysize, tr[1], tr[2])
        else:
            _inverse_color_transform(px, cur_x, ysize, tr[1], tr[2])

    return px


def decode_alpha_chunk(body: bytes, w: int, h: int):
    """ALPH chunk body -> (h, w) uint8 alpha plane.

    Header byte (low to high): 2-bit compression (0 raw, 1 headerless
    VP8L whose green channel carries alpha), 2-bit per-row filter
    (none / horizontal / vertical / gradient, inverted here exactly as
    libwebp's unfilters), 2-bit preprocessing (0 none, 1 = the encoder
    quantized the alpha levels), 2 reserved bits.

    Preprocessing = 1 closed round 14: the flag only RECORDS that the
    encoder reduced the level count — the decoded plane IS the alpha
    data. libwebp's optional level re-smoothing (WebPDequantizeLevels)
    is gated on the decoder-side WebPDecoderOptions.alpha_dithering_
    strength option, default 0, and is NOT applied by the default
    decode path; verified empirically against WebPDecodeRGBA on
    crafted pre=1 containers (bit-equal to the stored plane; see
    tests/test_round14.py::test_alph_preprocessed_levels_interop).
    Matching the reference decoder's default path means decoding the
    plane as stored."""
    import numpy as np

    if len(body) < 1:
        raise ImageDecodeError("empty ALPH chunk")
    method = body[0] & 3
    filt = (body[0] >> 2) & 3
    pre = (body[0] >> 4) & 3
    if pre > 1:
        raise ImageDecodeError(f"bad ALPH preprocessing {pre}")
    data = body[1:]
    if method == 0:
        if len(data) < w * h:
            raise ImageDecodeError("raw ALPH data truncated")
        plane = np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
    elif method == 1:
        br = _BitReader(data)
        px = _decode_vp8l_pixels(br, w, h)
        arr = np.array(px, dtype=np.uint32).reshape(h, w)
        plane = ((arr >> 8) & 0xFF).astype(np.uint8)  # green channel
    else:
        raise ImageDecodeError(f"bad ALPH compression method {method}")
    if filt == 0:
        return plane.copy()
    out = np.empty_like(plane)
    resid = plane.astype(np.int32)
    if filt == 1:  # horizontal
        for y in range(h):
            pred = 0 if y == 0 else int(out[y - 1, 0])
            for x in range(w):
                pred = (pred + int(resid[y, x])) & 0xFF
                out[y, x] = pred
    elif filt == 2:  # vertical (row 0 falls back to horizontal)
        pred = 0
        for x in range(w):
            pred = (pred + int(resid[0, x])) & 0xFF
            out[0, x] = pred
        for y in range(1, h):
            out[y] = ((out[y - 1].astype(np.int32) + resid[y]) & 0xFF
                      ).astype(np.uint8)
    else:  # gradient (row 0 falls back to horizontal)
        pred = 0
        for x in range(w):
            pred = (pred + int(resid[0, x])) & 0xFF
            out[0, x] = pred
        for y in range(1, h):
            top_left = int(out[y - 1, 0])
            left = top_left
            for x in range(w):
                top = int(out[y - 1, x])
                g = left + top - top_left
                g = 0 if g < 0 else 255 if g > 255 else g
                left = (g + int(resid[y, x])) & 0xFF
                out[y, x] = left
                top_left = top
    return out


def parse_webp_info(data: bytes) -> dict:
    """RIFF walk -> container metadata WITHOUT pixel decode: kind
    ('vp8l' | 'vp8' | 'vp8x'), width, height, has_alpha, has_anim,
    n_frames. Dimensions come from the real headers — VP8L's 14-bit
    packed dims, the VP8 keyframe start code + 14-bit dims (RFC 6386
    §9.1), VP8X's 24-bit canvas dims — and animation frames are
    counted from ANMF chunks. Since round 12 the pixel decoders cover
    everything except animation, so this metadata-grade arm's
    remaining pixel-less customer is the ANIMATED container (classify
    and size it honestly instead of charging it as an error); it also
    stays the cheap classify-before-decode pass for the rest.
    Raises ImageDecodeError on malformed containers."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ImageDecodeError("not a WebP payload")
    riff_len = int.from_bytes(data[4:8], "little")
    if riff_len + 8 > len(data) or riff_len < 4:
        raise ImageDecodeError("bad RIFF length")
    pos = 12
    info: dict | None = None
    n_anmf = 0
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ImageDecodeError("truncated WebP chunk")
        if tag == b"VP8L" and info is None:
            if len(body) < 5 or body[0] != 0x2F:
                raise ImageDecodeError("bad VP8L signature")
            br = _BitReader(body[1:])
            w = br.read(14) + 1
            h = br.read(14) + 1
            alpha = br.read_bit()
            info = {
                "kind": "vp8l", "width": w, "height": h,
                "has_alpha": bool(alpha), "has_anim": False,
            }
        elif tag == b"VP8 " and info is None:
            # RFC 6386 §9.1: 3-byte frame tag (bit 0 = interframe),
            # keyframe start code 9D 01 2A, then 14-bit dims + 2-bit
            # scale in two little-endian uint16s
            if len(body) < 10:
                raise ImageDecodeError("VP8 header truncated")
            if body[0] & 1:
                raise ImageDecodeError("VP8 stream starts mid-GOP")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ImageDecodeError("bad VP8 keyframe start code")
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            info = {
                "kind": "vp8", "width": w, "height": h,
                "has_alpha": False, "has_anim": False,
            }
        elif tag == b"VP8X" and info is None:
            if len(body) < 10:
                raise ImageDecodeError("VP8X header truncated")
            flags = body[0]
            info = {
                "kind": "vp8x",
                "width": 1 + int.from_bytes(body[4:7], "little"),
                "height": 1 + int.from_bytes(body[7:10], "little"),
                "has_alpha": bool((flags >> 4) & 1),
                "has_anim": bool((flags >> 1) & 1),
            }
        elif tag == b"ANMF":
            n_anmf += 1
        pos += 8 + clen + (clen & 1)
    if info is None:
        raise ImageDecodeError("WebP payload has no image chunk")
    info["n_frames"] = n_anmf if (info["has_anim"] and n_anmf) else 1
    return info


def decode_webp(data: bytes):
    """RIFF-framed WebP -> (h, w, 4) uint8 RGBA.

    VP8L lossless decodes exactly; lossy 'VP8 ' key frames decode
    through the from-scratch RFC 6386 decoder in functions/vp8.py
    (YUV planes bit-exact with libwebp, then BT.601 + nearest chroma
    upsample to RGB, alpha 255); extended VP8X stills decode too,
    with the ALPH alpha plane (raw or headerless-VP8L compressed,
    all four per-row filters inverted) bit-exact with libwebp's A
    channel. Animated VP8X composites and returns the FIRST canvas
    frame (decode_webp_anim yields every frame;
    :func:`parse_webp_info` stays the cheap metadata-only pass)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ImageDecodeError("not a WebP payload")
    riff_len = int.from_bytes(data[4:8], "little")
    if riff_len + 8 > len(data) or riff_len < 4:
        raise ImageDecodeError("bad RIFF length")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ImageDecodeError("truncated WebP chunk")
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            from history_collector_spark.functions.vp8 import (
                decode_vp8_frame,
                vp8_yuv_to_rgb,
            )

            import numpy as np

            y, u, v = decode_vp8_frame(body)
            rgb = vp8_yuv_to_rgb(y, u, v)
            out = np.empty(rgb.shape[:2] + (4,), dtype=np.uint8)
            out[:, :, :3] = rgb
            out[:, :, 3] = 255
            return out
        if tag == b"VP8X":
            return _decode_webp_extended(data, pos)
        pos += 8 + clen + (clen & 1)
    raise ImageDecodeError("WebP payload has no image chunk")


def _decode_webp_extended(data: bytes, vp8x_pos: int):
    """Extended (VP8X) still decode: optional ALPH alpha plane over a
    lossy VP8 frame, or a VP8L sub-stream (which carries its own
    alpha). Animated containers (ANIM/ANMF) route to
    :func:`decode_webp_anim` and return the FIRST composited canvas
    frame — the single-image convention; callers wanting every frame
    use decode_webp_anim directly."""
    import numpy as np

    pos = vp8x_pos
    alph = vp8_body = vp8l_body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ImageDecodeError("truncated WebP chunk")
        if tag in (b"ANIM", b"ANMF"):
            return decode_webp_anim(data, max_frames=1)[0][1]
        if tag == b"ALPH" and alph is None:
            alph = body
        elif tag == b"VP8 " and vp8_body is None:
            vp8_body = body
        elif tag == b"VP8L" and vp8l_body is None:
            vp8l_body = body
        pos += 8 + clen + (clen & 1)
    if vp8l_body is not None:
        return decode_vp8l(vp8l_body)  # VP8L carries its own alpha
    if vp8_body is None:
        raise ImageDecodeError("VP8X container has no image sub-stream")
    from history_collector_spark.functions.vp8 import (
        decode_vp8_frame,
        vp8_yuv_to_rgb,
    )

    y, u, v = decode_vp8_frame(vp8_body)
    rgb = vp8_yuv_to_rgb(y, u, v)
    h, w = rgb.shape[:2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, :3] = rgb
    if alph is not None:
        out[:, :, 3] = decode_alpha_chunk(alph, w, h)
    else:
        out[:, :, 3] = 255
    return out


# ---------------------------------------------------------------------------
# Animated WebP (round 13): ANIM/ANMF frame decode + canvas
# compositing per the public WebP container spec. Frame payloads ride
# the SAME still decoders proven bit-exact against libwebp (VP8L /
# VP8 / ALPH); the new code is only the 16-byte ANMF header walk and
# the canvas arithmetic, both pinned by hand-computed fixtures in
# tests/test_round13.py.
# ---------------------------------------------------------------------------


def _decode_frame_payload(data: bytes):
    """Chunk list (optional ALPH + VP8/VP8L) -> (h, w, 4) RGBA, the
    shared sub-stream decode for ANMF frame data."""
    import numpy as np

    pos, alph, vp8_body, vp8l_body = 0, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ImageDecodeError("truncated ANMF sub-chunk")
        if tag == b"ALPH" and alph is None:
            alph = body
        elif tag == b"VP8 " and vp8_body is None:
            vp8_body = body
        elif tag == b"VP8L" and vp8l_body is None:
            vp8l_body = body
        pos += 8 + clen + (clen & 1)
    if vp8l_body is not None:
        return decode_vp8l(vp8l_body)
    if vp8_body is None:
        raise ImageDecodeError("ANMF frame has no image sub-stream")
    from history_collector_spark.functions.vp8 import (
        decode_vp8_frame,
        vp8_yuv_to_rgb,
    )

    y, u, v = decode_vp8_frame(vp8_body)
    rgb = vp8_yuv_to_rgb(y, u, v)
    h, w = rgb.shape[:2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, :3] = rgb
    out[:, :, 3] = (
        decode_alpha_chunk(alph, w, h) if alph is not None else 255
    )
    return out


def _blend_over(dst, src):
    """Non-premultiplied 'source over' per the container spec's
    blending formulas, in exact integer arithmetic (round half up).
    With sa = Sa/255, da = Da/255 the spec states

        A   = sa + da * (1 - sa)
        RGB = (Sc * sa + Dc * da * (1 - sa)) / A

    multiplying numerator and denominator by 255^2 gives the integer
    forms below; A == 0 pixels come out fully transparent black."""
    import numpy as np

    sa = src[:, :, 3].astype(np.int64)
    da = dst[:, :, 3].astype(np.int64)
    den = sa * 255 + da * (255 - sa)  # = A * 255^2 / 255
    a_out = (den + 127) // 255
    out = np.zeros_like(dst)
    num = (
        src[:, :, :3].astype(np.int64) * sa[:, :, None] * 255
        + dst[:, :, :3].astype(np.int64) * (da * (255 - sa))[:, :, None]
    )
    nz = den > 0
    d3 = den[:, :, None]
    rgb = np.zeros_like(num)
    np.divide(2 * num + d3, 2 * d3, out=rgb, where=d3 > 0, casting="unsafe")
    out[:, :, :3] = np.where(nz[:, :, None], rgb, 0).astype(np.uint8)
    out[:, :, 3] = a_out.astype(np.uint8)
    return out


def decode_webp_anim(data: bytes, max_frames: int | None = None):
    """Animated WebP (VP8X + ANIM/ANMF) -> list of
    ``(duration_ms, canvas)`` with each canvas an (H, W, 4) uint8
    RGBA snapshot AFTER that frame is composited.

    Container walk per the public WebP container spec: VP8X carries
    the canvas dims, ANIM the (advisory) background color and loop
    count, and each ANMF a 16-byte header — 24-bit frame x/2 and y/2,
    24-bit width-1 / height-1, 24-bit duration, one flags byte with
    blending method (bit 1: 0 = alpha-blend over the canvas, 1 =
    overwrite) and disposal method (bit 0: 1 = restore the frame
    rectangle to transparent black afterwards) — followed by the
    frame's still sub-stream (optional ALPH + VP8/VP8L), decoded by
    the existing libwebp-bit-exact still paths. The canvas starts
    fully transparent, matching libwebp's WebPAnimDecoder (the ANIM
    background color is advisory for players). ``max_frames`` bounds
    the decode for sampled scans; structural damage raises
    ImageDecodeError."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ImageDecodeError("not a WebP payload")
    pos = 12
    canvas = None
    frames: list[tuple[int, "np.ndarray"]] = []
    saw_anim = False
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ImageDecodeError("truncated WebP chunk")
        if tag == b"VP8X":
            if len(body) < 10:
                raise ImageDecodeError("VP8X header truncated")
            if not (body[0] >> 1) & 1:
                raise ImageDecodeError("VP8X animation flag not set")
            cw = 1 + int.from_bytes(body[4:7], "little")
            ch = 1 + int.from_bytes(body[7:10], "little")
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ImageDecodeError("ANIM chunk truncated")
            saw_anim = True
        elif tag == b"ANMF":
            if canvas is None or not saw_anim:
                raise ImageDecodeError("ANMF before VP8X/ANIM")
            if max_frames is not None and len(frames) >= max_frames:
                break
            if len(body) < 16:
                raise ImageDecodeError("ANMF header truncated")
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            ch_, cw_ = canvas.shape[:2]
            if fx + fw > cw_ or fy + fh > ch_:
                raise ImageDecodeError("ANMF frame exceeds canvas")
            tile = _decode_frame_payload(body[16:])
            if tile.shape[:2] != (fh, fw):
                raise ImageDecodeError(
                    "ANMF dims disagree with frame sub-stream"
                )
            rect = canvas[fy : fy + fh, fx : fx + fw]
            if flags & 2:  # no-blend: overwrite the rectangle
                canvas[fy : fy + fh, fx : fx + fw] = tile
            else:
                canvas[fy : fy + fh, fx : fx + fw] = _blend_over(
                    rect, tile
                )
            frames.append((dur, canvas.copy()))
            if flags & 1:  # dispose to background (transparent black)
                canvas[fy : fy + fh, fx : fx + fw] = 0
        pos += 8 + clen + (clen & 1)
    if canvas is None or not frames:
        raise ImageDecodeError("no animation frames decoded")
    return frames


# ---------------------------------------------------------------------------
# encode (literal-only VP8L)
# ---------------------------------------------------------------------------


def encode_webp_vp8l(pixels, subtract_green: bool = False) -> bytes:
    """(h, w, 3|4) uint8 array -> lossless WebP bytes.

    Literal-only (no LZ77 / cache / meta codes) with canonical prefix
    codes built from per-channel histograms; optional subtract-green
    transform. Decode is pixel-exact."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w = px.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    alpha = (
        px[:, :, 3].astype(np.int64)
        if px.shape[2] == 4
        else np.full((h, w), 255, dtype=np.int64)
    )
    red = px[:, :, 0].astype(np.int64)
    green = px[:, :, 1].astype(np.int64)
    blue = px[:, :, 2].astype(np.int64)
    if subtract_green:
        red = (red - green) % 256
        blue = (blue - green) % 256

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if px.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(_SUBTRACT_GREEN, 2)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes

    def hist(vals) -> dict[int, int]:
        u, c = np.unique(vals, return_counts=True)
        return {int(s): int(n) for s, n in zip(u, c)}

    green_alpha = 256 + _NUM_LENGTH_CODES
    gcode = _write_prefix_code(bw, _huffman_lengths(hist(green)), green_alpha)
    rcode = _write_prefix_code(bw, _huffman_lengths(hist(red)), 256)
    bcode = _write_prefix_code(bw, _huffman_lengths(hist(blue)), 256)
    acode = _write_prefix_code(bw, _huffman_lengths(hist(alpha)), 256)
    dcode = _write_prefix_code(bw, {0: 1}, _NUM_DISTANCE_CODES)
    del dcode

    gf = green.ravel()
    rf = red.ravel()
    bf = blue.ravel()
    af = alpha.ravel()
    for i in range(h * w):
        _write_symbol(bw, gcode, int(gf[i]))
        _write_symbol(bw, rcode, int(rf[i]))
        _write_symbol(bw, bcode, int(bf[i]))
        _write_symbol(bw, acode, int(af[i]))

    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
