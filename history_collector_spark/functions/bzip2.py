"""From-scratch bzip2 (.bz2) decoder.

The remaining big-corpus codec after gzip/LZ4/Snappy/zstd: public-data
dumps (Wikipedia, Common Crawl index slices, many academic corpora)
ship as .bz2, so a crawl-scale ingest needs the format. Implemented
from the public stream description (the format has no RFC; the layout
is fixed by the reference implementation and documented openly):

- stream header ``BZh`` + level digit (block size = level * 100k),
- per block: 48-bit magic 0x314159265359, 32-bit block CRC (bzip2's
  MSB-first CRC-32, poly 0x04C11DB7, non-reflected), the deprecated
  "randomized" bit (rejected), 24-bit BWT origin pointer,
- symbol map (16-bit group mask + 16-bit per-group masks),
- 2..6 Huffman groups, 15-bit selector count, selectors MTF-coded in
  unary, per-group code lengths delta-coded (5-bit start, +/-1 steps),
- the MTF+RLE2 symbol stream (RUNA/RUNB zero-run codes, EOB), Huffman
  group switching every 50 symbols,
- inverse move-to-front, inverse Burrows-Wheeler transform (single
  left-pass T-vector walk from origPtr), RLE1 (4 equal bytes +
  count byte) — then the stream footer 0x177245385090 with the
  combined CRC (rotate-left-1 fold of block CRCs).

Every decode verifies both per-block and stream CRCs, so the pytest
interop sweep against stdlib ``bz2.compress`` (the real libbz2) is a
bit-exact reference-encoder gate. Malformed input raises
:class:`Bzip2DecodeError`; the mutation fuzz row pins graceful
degradation.

Reference parity note: the reference repo has no compression layer at
all (kinecosystem/history-collector reads XDR over gzip only) — this
module is extension-tier, built for the corpus-ingest matrix.
"""

from __future__ import annotations

from history_collector_spark.functions.codec_errors import MediaDecodeError


class Bzip2DecodeError(MediaDecodeError):
    pass


_BLOCK_MAGIC = 0x314159265359
_EOS_MAGIC = 0x177245385090

# bzip2's CRC-32: poly 0x04C11DB7, MSB-first (non-reflected),
# init/final 0xFFFFFFFF — NOT the zlib/IEEE reflected variant
_CRC_TABLE = []
for _b in range(256):
    _c = _b << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)


def _crc32_bz(data, crc: int = 0xFFFFFFFF) -> int:
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) ^ byte) & 0xFF
        ]
    return crc


class _MsbBits:
    """MSB-first bit reader (bzip2 is big-endian at the bit level)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.total = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.total:
            raise Bzip2DecodeError("bit stream exhausted")
        v = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v


def _read_huffman_group(br: _MsbBits, n_sym: int):
    """Delta-coded lengths -> canonical decode structure (limit[],
    base[], perm[] in the reference layout)."""
    lengths = []
    length = br.read(5)
    for _ in range(n_sym):
        while True:
            if length < 1 or length > 20:
                raise Bzip2DecodeError(f"code length {length} out of range")
            if not br.read(1):
                break
            length = length - 1 if br.read(1) else length + 1
        lengths.append(length)
    min_len, max_len = min(lengths), max(lengths)
    # canonical code assignment, shorter codes first, symbol order
    # within a length = symbol index order
    limit = [0] * (max_len + 2)
    base = [0] * (max_len + 2)
    perm = []
    for ln in range(min_len, max_len + 1):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                perm.append(sym)
    count = [0] * (max_len + 1)
    for sl in lengths:
        count[sl] += 1
    code = 0
    total = 0
    for ln in range(min_len, max_len + 1):
        base[ln] = code - total
        total += count[ln]
        code += count[ln]
        limit[ln] = code - 1
        code <<= 1
    return min_len, max_len, limit, base, perm


def _huff_decode(br: _MsbBits, grp) -> int:
    min_len, max_len, limit, base, perm = grp
    ln = min_len
    code = br.read(min_len)
    while code > limit[ln]:
        if ln >= max_len:
            raise Bzip2DecodeError("Huffman code overruns max length")
        code = (code << 1) | br.read(1)
        ln += 1
    idx = code - base[ln]
    if idx < 0 or idx >= len(perm):
        raise Bzip2DecodeError("Huffman code outside table")
    return perm[idx]


def _decode_block(br: _MsbBits, block_size: int):
    """One block (after its magic) -> (plain bytes, block CRC), the
    CRC already verified (returned so the stream-combined checksum
    does not recompute it)."""
    want_crc = br.read(32)
    if br.read(1):
        raise Bzip2DecodeError("deprecated randomized blocks unsupported")
    orig_ptr = br.read(24)
    # symbol map: which byte values are used
    used = []
    groups16 = br.read(16)
    for g in range(16):
        if groups16 & (0x8000 >> g):
            bits16 = br.read(16)
            for j in range(16):
                if bits16 & (0x8000 >> j):
                    used.append((g << 4) | j)
    if not used:
        raise Bzip2DecodeError("empty symbol map")
    n_sym = len(used) + 2  # + RUNA/RUNB folded in, + EOB
    n_groups = br.read(3)
    if not 2 <= n_groups <= 6:
        raise Bzip2DecodeError(f"bad Huffman group count {n_groups}")
    n_selectors = br.read(15)
    if n_selectors == 0:
        raise Bzip2DecodeError("zero selectors")
    # selectors, MTF-coded in unary
    mtf_g = list(range(n_groups))
    selectors = []
    for _ in range(n_selectors):
        j = 0
        while br.read(1):
            j += 1
            if j >= n_groups:
                raise Bzip2DecodeError("selector unary overruns groups")
        sel = mtf_g.pop(j)
        mtf_g.insert(0, sel)
        selectors.append(sel)
    tables = [_read_huffman_group(br, n_sym) for _ in range(n_groups)]
    eob = n_sym - 1
    # MTF + RLE2 symbol stream -> BWT byte string
    mtf = list(used)
    bwt = bytearray()
    run = 0
    run_bit = 0
    sel_idx = 0
    group = None
    countdown = 0
    while True:
        if countdown == 0:
            if sel_idx >= len(selectors):
                raise Bzip2DecodeError("selectors exhausted mid-block")
            group = tables[selectors[sel_idx]]
            sel_idx += 1
            countdown = 50
        countdown -= 1
        sym = _huff_decode(br, group)
        if sym <= 1:  # RUNA / RUNB: bijective base-2 zero-run length
            run += (sym + 1) << run_bit
            run_bit += 1
            continue
        if run:
            if len(bwt) + run > block_size:
                raise Bzip2DecodeError("zero run overruns block size")
            bwt += bytes([mtf[0]]) * run
            run = 0
            run_bit = 0
        if sym == eob:
            break  # any pending zero-run was flushed just above
        # MTF symbol: index sym-1 into the current list
        j = sym - 1
        if j >= len(mtf):
            raise Bzip2DecodeError("MTF index outside used alphabet")
        v = mtf.pop(j)
        mtf.insert(0, v)
        if len(bwt) >= block_size:
            raise Bzip2DecodeError("block overruns declared size")
        bwt.append(v)
    n = len(bwt)
    if orig_ptr >= n:
        raise Bzip2DecodeError("BWT origin pointer outside block")
    # inverse BWT: counting sort T-vector, one left-pass walk
    counts = [0] * 256
    for byte in bwt:
        counts[byte] += 1
    starts = [0] * 256
    s = 0
    for v in range(256):
        starts[v] = s
        s += counts[v]
    t = [0] * n
    seen = [0] * 256
    for i, byte in enumerate(bwt):
        t[starts[byte] + seen[byte]] = i
        seen[byte] += 1
    out = bytearray(n)
    p = t[orig_ptr]
    for i in range(n):
        out[i] = bwt[p]
        p = t[p]
    # RLE1: 4 identical bytes are followed by a count byte (0..251)
    plain = bytearray()
    i = 0
    while i < n:
        byte = out[i]
        run_len = 1
        while run_len < 4 and i + run_len < n and out[i + run_len] == byte:
            run_len += 1
        if run_len == 4:
            if i + 4 >= n:
                raise Bzip2DecodeError("RLE1 run missing count byte")
            extra = out[i + 4]
            plain += bytes([byte]) * (4 + extra)
            i += 5
        else:
            plain += bytes([byte]) * run_len
            i += run_len
    got = _crc32_bz(plain) ^ 0xFFFFFFFF
    if got != want_crc:
        raise Bzip2DecodeError(
            f"block CRC mismatch: 0x{got:08X} != 0x{want_crc:08X}"
        )
    return bytes(plain), got


def decompress_bz2(blob: bytes, max_out: int = 1 << 26) -> bytes:
    """.bz2 stream(s) -> plain bytes, block and stream CRCs verified.
    Concatenated streams (the multi-member convention, like gzip)
    decode end to end."""
    if len(blob) < 4:
        raise Bzip2DecodeError("truncated bzip2 header")
    out_all = bytearray()
    br = _MsbBits(blob)
    while True:
        if br.read(8) != 0x42 or br.read(8) != 0x5A or br.read(8) != 0x68:
            raise Bzip2DecodeError("bad bzip2 magic")
        level = br.read(8) - 0x30
        if not 1 <= level <= 9:
            raise Bzip2DecodeError(f"bad bzip2 level {level}")
        block_size = level * 100_000
        combined = 0
        while True:
            magic = br.read(48)
            if magic == _BLOCK_MAGIC:
                block, block_crc = _decode_block(br, block_size)
                if len(out_all) + len(block) > max_out:
                    raise Bzip2DecodeError("output exceeds size guard")
                out_all += block
                combined = (
                    ((combined << 1) | (combined >> 31)) & 0xFFFFFFFF
                ) ^ block_crc
            elif magic == _EOS_MAGIC:
                want = br.read(32)
                if want != combined:
                    raise Bzip2DecodeError(
                        f"stream CRC mismatch: 0x{combined:08X} != "
                        f"0x{want:08X}"
                    )
                break
            else:
                raise Bzip2DecodeError(f"bad block magic 0x{magic:012X}")
        # byte-align for a possible following stream
        br.pos = (br.pos + 7) & ~7
        if br.pos >= br.total:
            break
    return bytes(out_all)
