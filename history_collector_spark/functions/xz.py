"""From-scratch XZ container + LZMA2/LZMA decoder.

.xz is the modern academic/data-dump codec (Wikipedia dumps, software
corpora, many HuggingFace mirrors ship .jsonl.xz) — the last member of
the compression-ingest matrix this repo had not decoded from scratch.
Implemented directly from the two public specifications:

- the XZ file format (tukaani xz-file-format.txt): stream header magic
  + flags + CRC32, block headers (filter chain, optional size fields,
  header CRC32), block padding, per-block integrity check (none /
  CRC32 / CRC64 / SHA-256 — all four verified here), the block index,
  and the stream footer with its backward-size cross-check;
- LZMA2 chunking (control byte, dict/state/props reset semantics,
  uncompressed chunks) over the classic LZMA core (Igor Pavlov's
  public algorithm): binary range coder with 11-bit adaptive
  probabilities, the 12-state match/rep state machine, matched-literal
  decoding, length and position-slot bit trees, aligned/direct
  distance bits, and the four recent-distance registers.

CRC64 is the ECMA-182 reflected polynomial the XZ spec mandates,
table-built here; CRC32 and SHA-256 reuse stdlib primitives (zlib /
hashlib), the same posture as the PNG decoder's inflate.

Fixtures are REAL liblzma output (stdlib ``lzma``), so every test and
ingest run is a reference-encoder interop check — same contract as the
bzip2/zstd/LZ4/Snappy twins. Malformed payloads raise
:class:`XzDecodeError`.

Performance posture (same caveat as bzip2.py): a pure-Python
bit-model loop prices per-byte cost honestly for correctness testing;
at 100 TB a JVM/SIMD kernel slots behind the same iter/ingest
contract.

Reference parity note: extends the reference's gzip ingestion boundary
(kinecosystem/history-collector python/main.py get_history_file) to
the .xz dumps public corpora ship.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from history_collector_spark.functions.codec_errors import MediaDecodeError


class XzDecodeError(MediaDecodeError):
    pass


# ---------------------------------------------------------------------------
# CRC64 (ECMA-182, reflected) — the xz default integrity check
# ---------------------------------------------------------------------------

_CRC64_POLY = 0xC96C5795D7870F42
_CRC64_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC64_POLY if _c & 1 else _c >> 1
    _CRC64_TABLE.append(_c)


def crc64(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc = _CRC64_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# LZMA core: binary range decoder + the public probability models
# ---------------------------------------------------------------------------

_KNUM_STATES = 12
_PROB_INIT = 1024  # 2048 / 2


class _RangeDecoder:
    __slots__ = ("data", "pos", "range", "code")

    def __init__(self, data: bytes, pos: int):
        if pos + 5 > len(data):
            raise XzDecodeError("LZMA stream too short for rc init")
        if data[pos] != 0:
            raise XzDecodeError("LZMA rc init byte must be 0")
        self.data = data
        self.range = 0xFFFFFFFF
        self.code = int.from_bytes(data[pos + 1 : pos + 5], "big")
        self.pos = pos + 5

    def _norm(self):
        if self.range < (1 << 24):
            if self.pos >= len(self.data):
                raise XzDecodeError("LZMA range coder ran out of input")
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self.data[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def bit(self, probs: list, i: int) -> int:
        self._norm()
        p = probs[i]
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[i] = p + ((2048 - p) >> 5)
            return 0
        self.range -= bound
        self.code -= bound
        probs[i] = p - (p >> 5)
        return 1

    def bittree(self, probs: list, nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.bit(probs, m)
        return m - (1 << nbits)

    def bittree_rev(self, probs: list, nbits: int) -> int:
        m = 1
        sym = 0
        for i in range(nbits):
            b = self.bit(probs, m)
            m = (m << 1) | b
            sym |= b << i
        return sym

    def direct(self, nbits: int) -> int:
        res = 0
        for _ in range(nbits):
            self._norm()
            self.range >>= 1
            self.code = (self.code - self.range) & 0xFFFFFFFF
            t = 0 - (self.code >> 31)
            self.code = (self.code + (self.range & t)) & 0xFFFFFFFF
            res = (res << 1) + t + 1
        return res


class _LenDecoder:
    __slots__ = ("choice", "choice2", "low", "mid", "high")

    def __init__(self):
        self.choice = _PROB_INIT
        self.choice2 = _PROB_INIT
        self.low = [[_PROB_INIT] * 8 for _ in range(16)]
        self.mid = [[_PROB_INIT] * 8 for _ in range(16)]
        self.high = [_PROB_INIT] * 256

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        c = [self.choice]
        if not rc.bit(c, 0):
            self.choice = c[0]
            return rc.bittree(self.low[pos_state], 3)
        self.choice = c[0]
        c2 = [self.choice2]
        if not rc.bit(c2, 0):
            self.choice2 = c2[0]
            return 8 + rc.bittree(self.mid[pos_state], 3)
        self.choice2 = c2[0]
        return 16 + rc.bittree(self.high, 8)


class _LzmaState:
    """Everything an LZMA2 state reset re-initializes (props survive a
    state reset unless the chunk carries a new props byte)."""

    def __init__(self, lc: int, lp: int, pb: int):
        if lc + lp > 4 or lc > 8 or lp > 4 or pb > 4:
            raise XzDecodeError(f"bad LZMA props lc={lc} lp={lp} pb={pb}")
        self.lc, self.lp, self.pb = lc, lp, pb
        self.state = 0
        self.rep0 = self.rep1 = self.rep2 = self.rep3 = 0
        n_lit = 1 << (lc + lp)
        self.lit = [[_PROB_INIT] * 0x300 for _ in range(n_lit)]
        self.is_match = [_PROB_INIT] * (_KNUM_STATES << 4)
        self.is_rep = [_PROB_INIT] * _KNUM_STATES
        self.is_rep_g0 = [_PROB_INIT] * _KNUM_STATES
        self.is_rep_g1 = [_PROB_INIT] * _KNUM_STATES
        self.is_rep_g2 = [_PROB_INIT] * _KNUM_STATES
        self.is_rep0_long = [_PROB_INIT] * (_KNUM_STATES << 4)
        self.pos_slot = [[_PROB_INIT] * 64 for _ in range(4)]
        self.spec_pos = [_PROB_INIT] * 115
        self.align = [_PROB_INIT] * 16
        self.len_dec = _LenDecoder()
        self.rep_len_dec = _LenDecoder()


def _lzma_decode_chunk(
    data: bytes,
    pos: int,
    comp_size: int,
    out: bytearray,
    unpacked: int,
    st: _LzmaState,
    dict_start: int,
) -> None:
    """Decode exactly ``unpacked`` bytes of one LZMA2 chunk into
    ``out``, whose suffix from ``dict_start`` is the live dictionary
    (positions, the previous-byte literal context, and the match
    window all count from there, per the LZMA2 dict-reset rule)."""
    rc = _RangeDecoder(data, pos)
    end_pos = pos + comp_size
    limit = len(out) + unpacked
    pb_mask = (1 << st.pb) - 1
    lp_mask = (1 << st.lp) - 1
    while len(out) < limit:
        dpos = len(out) - dict_start
        pos_state = dpos & pb_mask
        if not rc.bit(st.is_match, (st.state << 4) | pos_state):
            # literal
            prev = out[-1] if len(out) > dict_start else 0
            lit_state = ((dpos & lp_mask) << st.lc) + (
                prev >> (8 - st.lc) if st.lc else 0
            )
            probs = st.lit[lit_state]
            if st.state < 7:
                sym = 1
                while sym < 0x100:
                    sym = (sym << 1) | rc.bit(probs, sym)
            else:
                # matched literal: steer with the dictionary byte
                if st.rep0 + 1 > dpos:
                    raise XzDecodeError("matched literal before window")
                match_byte = out[len(out) - st.rep0 - 1]
                sym = 1
                while sym < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    b = rc.bit(
                        probs, ((1 + match_bit) << 8) + sym
                    )
                    sym = (sym << 1) | b
                    if match_bit != b:
                        while sym < 0x100:
                            sym = (sym << 1) | rc.bit(probs, sym)
                        break
            out.append(sym & 0xFF)
            # literal next-state: {<4: 0, 4..9: -3, 10..11: -6}
            st.state = (
                0 if st.state < 4
                else st.state - 3 if st.state < 10
                else st.state - 6
            )
            continue
        # match / rep
        if rc.bit(st.is_rep, st.state):
            # rep match
            if rc.bit(st.is_rep_g0, st.state):
                if rc.bit(st.is_rep_g1, st.state):
                    if rc.bit(st.is_rep_g2, st.state):
                        dist = st.rep3
                        st.rep3 = st.rep2
                    else:
                        dist = st.rep2
                    st.rep2 = st.rep1
                    st.rep1 = st.rep0
                    st.rep0 = dist
                else:
                    st.rep1, st.rep0 = st.rep0, st.rep1
                length = st.rep_len_dec.decode(rc, pos_state) + 2
                st.state = 8 if st.state < 7 else 11
            else:
                if not rc.bit(
                    st.is_rep0_long, (st.state << 4) | pos_state
                ):
                    # short rep: one byte at rep0
                    if st.rep0 + 1 > dpos:
                        raise XzDecodeError("short rep before window")
                    out.append(out[len(out) - st.rep0 - 1])
                    st.state = 9 if st.state < 7 else 11
                    continue
                length = st.rep_len_dec.decode(rc, pos_state) + 2
                st.state = 8 if st.state < 7 else 11
        else:
            # new match
            st.rep3, st.rep2, st.rep1 = st.rep2, st.rep1, st.rep0
            length = st.len_dec.decode(rc, pos_state) + 2
            len_state = min(length - 2, 3)
            slot = rc.bittree(st.pos_slot[len_state], 6)
            if slot < 4:
                dist = slot
            else:
                nd = (slot >> 1) - 1
                dist = (2 | (slot & 1)) << nd
                if slot < 14:
                    dist += _bittree_rev_offset(
                        rc, st.spec_pos, dist - slot - 1, nd
                    )
                else:
                    dist += rc.direct(nd - 4) << 4
                    dist += rc.bittree_rev(st.align, 4)
                    dist &= 0xFFFFFFFF
            if dist == 0xFFFFFFFF:
                raise XzDecodeError(
                    "LZMA end marker inside a sized LZMA2 chunk"
                )
            st.rep0 = dist
            st.state = 7 if st.state < 7 else 10
        if st.rep0 + 1 > len(out) - dict_start:
            raise XzDecodeError("match distance exceeds window")
        if len(out) + length > limit:
            raise XzDecodeError("match overruns chunk unpacked size")
        src = len(out) - st.rep0 - 1
        for k in range(length):
            out.append(out[src + k])
    if rc.pos > end_pos:
        raise XzDecodeError("LZMA chunk read past its compressed size")


def _bittree_rev_offset(
    rc: _RangeDecoder, probs: list, base: int, nbits: int
) -> int:
    m = 1
    sym = 0
    for i in range(nbits):
        b = rc.bit(probs, base + m)
        m = (m << 1) | b
        sym |= b << i
    return sym


# ---------------------------------------------------------------------------
# LZMA2 chunk layer
# ---------------------------------------------------------------------------


def _lzma2_decode(data: bytes, pos: int, end: int) -> tuple[bytes, int]:
    """LZMA2 chunk sequence -> (decoded bytes, position after the 0x00
    end marker). ``end`` bounds the walk (the declared compressed size
    when the block header carries one, else the stream end)."""
    out = bytearray()
    st = None
    props = None
    dict_start = 0
    have_dict = False
    while True:
        if pos >= end:
            raise XzDecodeError("LZMA2 stream missing end marker")
        ctrl = data[pos]
        pos += 1
        if ctrl == 0x00:
            return bytes(out), pos
        if ctrl in (0x01, 0x02):
            if ctrl == 0x01:
                dict_start = len(out)
                have_dict = True
            elif not have_dict:
                raise XzDecodeError(
                    "LZMA2 first chunk must reset the dictionary"
                )
            if pos + 2 > end:
                raise XzDecodeError("LZMA2 uncompressed chunk truncated")
            size = int.from_bytes(data[pos : pos + 2], "big") + 1
            pos += 2
            if pos + size > end:
                raise XzDecodeError("LZMA2 uncompressed data truncated")
            out += data[pos : pos + size]
            pos += size
            st = None  # an uncompressed chunk invalidates LZMA state
            continue
        if ctrl < 0x80:
            raise XzDecodeError(f"bad LZMA2 control byte {ctrl:#x}")
        unpacked = ((ctrl & 0x1F) << 16) + 1
        if pos + 4 > end:
            raise XzDecodeError("LZMA2 chunk header truncated")
        unpacked += int.from_bytes(data[pos : pos + 2], "big")
        comp = int.from_bytes(data[pos + 2 : pos + 4], "big") + 1
        pos += 4
        reset = (ctrl >> 5) & 3
        if reset >= 2:
            if pos >= end:
                raise XzDecodeError("LZMA2 props byte truncated")
            pv = data[pos]
            pos += 1
            if pv >= 225:
                raise XzDecodeError(f"bad LZMA2 props byte {pv}")
            props = (pv % 9, (pv // 9) % 5, pv // 45)
        if reset == 3:
            dict_start = len(out)
            have_dict = True
        elif not have_dict:
            raise XzDecodeError("LZMA2 first chunk must reset dictionary")
        if reset >= 1:
            if props is None:
                raise XzDecodeError("LZMA2 state reset before any props")
            st = _LzmaState(*props)
        if st is None:
            raise XzDecodeError(
                "LZMA2 chunk continues state after an uncompressed chunk"
            )
        if pos + comp > end:
            raise XzDecodeError("LZMA2 compressed data truncated")
        _lzma_decode_chunk(data, pos, comp, out, unpacked, st, dict_start)
        pos += comp


# ---------------------------------------------------------------------------
# XZ container layer
# ---------------------------------------------------------------------------

_XZ_MAGIC = b"\xfd7zXZ\x00"
_XZ_FOOTER_MAGIC = b"YZ"
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}  # none, crc32, crc64, sha256


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(9):
        if pos + i >= len(data):
            raise XzDecodeError("truncated varint")
        b = data[pos + i]
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return v, pos + i + 1
    raise XzDecodeError("varint too long")


def _decompress_stream(data: bytes, start: int) -> tuple[bytes, int]:
    """One .xz stream beginning at ``start`` -> (decompressed bytes,
    position after the stream footer), verifying every CRC the
    container carries (header/block-header/index/footer CRC32s plus
    the per-block integrity check)."""
    # memoryview slice is O(1) — a bytes slice here would copy the whole
    # remaining buffer per stream, O(total^2) for many-stream files
    data = memoryview(data)[start:]
    if len(data) < 12 + 12:
        raise XzDecodeError("too short for an XZ stream")
    if data[:6] != _XZ_MAGIC:
        raise XzDecodeError("bad XZ magic")
    flags = data[6:8]
    if flags[0] != 0 or (flags[1] & 0xF0):
        raise XzDecodeError("bad XZ stream flags")
    check_type = flags[1] & 0x0F
    if check_type not in _CHECK_SIZES:
        raise XzDecodeError(f"unsupported check type {check_type}")
    if struct.unpack("<I", data[8:12])[0] != zlib.crc32(flags):
        raise XzDecodeError("stream header CRC mismatch")

    pos = 12
    out = bytearray()
    block_records: list[tuple[int, int]] = []
    while True:
        if pos >= len(data):
            raise XzDecodeError("unexpected end before index")
        first = data[pos]
        if first == 0x00:
            break  # index indicator
        header_size = (first + 1) * 4
        hdr_end = pos + header_size
        if hdr_end > len(data):
            raise XzDecodeError("block header truncated")
        hdr = data[pos:hdr_end]
        if (
            struct.unpack("<I", hdr[-4:])[0]
            != zlib.crc32(hdr[:-4])
        ):
            raise XzDecodeError("block header CRC mismatch")
        bflags = hdr[1]
        n_filters = (bflags & 3) + 1
        if bflags & 0x3C:
            raise XzDecodeError("reserved block flag bits set")
        p = 2
        comp_size = unc_size = None
        if bflags & 0x40:
            comp_size, p = _varint(hdr, p)
        if bflags & 0x80:
            unc_size, p = _varint(hdr, p)
        filters = []
        for _ in range(n_filters):
            fid, p = _varint(hdr, p)
            psize, p = _varint(hdr, p)
            fprops = hdr[p : p + psize]
            if len(fprops) != psize:
                raise XzDecodeError("filter props truncated")
            p += psize
            filters.append((fid, fprops))
        for pad in hdr[p:-4]:
            if pad != 0:
                raise XzDecodeError("nonzero block header padding")
        if len(filters) != 1 or filters[0][0] != 0x21:
            raise XzDecodeError(
                "only a single LZMA2 filter is supported "
                f"(got {[hex(f[0]) for f in filters]})"
            )
        if len(filters[0][1]) != 1:
            raise XzDecodeError("bad LZMA2 filter props size")
        dict_bits = filters[0][1][0]
        if dict_bits & 0xC0:
            raise XzDecodeError("reserved LZMA2 dict-size bits")

        body_start = hdr_end
        before = len(out)
        chunk_out, bpos = _lzma2_decode(
            data, body_start,
            len(data) if comp_size is None else body_start + comp_size,
        )
        out += chunk_out
        unpadded = bpos - pos  # header + body (no padding, no check yet)
        if comp_size is not None and bpos - body_start != comp_size:
            raise XzDecodeError("block compressed-size mismatch")
        if unc_size is not None and len(out) - before != unc_size:
            raise XzDecodeError("block uncompressed-size mismatch")
        while (bpos - pos) % 4:
            if bpos >= len(data):
                raise XzDecodeError("block padding truncated")
            if data[bpos] != 0:
                raise XzDecodeError("nonzero block padding")
            bpos += 1
        csize = _CHECK_SIZES[check_type]
        check = data[bpos : bpos + csize]
        if len(check) != csize:
            raise XzDecodeError("block check truncated")
        blk = bytes(out[before:])
        if check_type == 1 and struct.unpack("<I", check)[0] != zlib.crc32(blk):
            raise XzDecodeError("block CRC32 mismatch")
        if check_type == 4 and struct.unpack("<Q", check)[0] != crc64(blk):
            raise XzDecodeError("block CRC64 mismatch")
        if check_type == 10 and check != hashlib.sha256(blk).digest():
            raise XzDecodeError("block SHA-256 mismatch")
        block_records.append((unpadded + csize, len(out) - before))
        bpos += csize
        pos = bpos

    # index
    index_start = pos
    pos += 1
    nrec, pos = _varint(data, pos)
    if nrec != len(block_records):
        raise XzDecodeError(
            f"index says {nrec} blocks, stream carried {len(block_records)}"
        )
    for want_unpadded, want_unc in block_records:
        got_unpadded, pos = _varint(data, pos)
        got_unc, pos = _varint(data, pos)
        if (got_unpadded, got_unc) != (want_unpadded, want_unc):
            raise XzDecodeError("index record mismatch")
    while (pos - index_start) % 4:
        if pos >= len(data):
            raise XzDecodeError("index padding truncated")
        if data[pos] != 0:
            raise XzDecodeError("nonzero index padding")
        pos += 1
    if pos + 4 > len(data):
        raise XzDecodeError("index CRC truncated")
    if struct.unpack("<I", data[pos : pos + 4])[0] != zlib.crc32(
        data[index_start:pos]
    ):
        raise XzDecodeError("index CRC mismatch")
    pos += 4

    # footer
    if pos + 12 > len(data):
        raise XzDecodeError("stream footer truncated")
    f_crc, back_size = struct.unpack("<II", data[pos : pos + 8])
    if data[pos + 8 : pos + 10] != flags:
        raise XzDecodeError("footer flags disagree with header")
    if data[pos + 10 : pos + 12] != _XZ_FOOTER_MAGIC:
        raise XzDecodeError("bad footer magic")
    if f_crc != zlib.crc32(data[pos + 4 : pos + 10]):
        raise XzDecodeError("footer CRC mismatch")
    real_back = (pos - index_start) // 4 - 1
    if back_size != real_back:
        raise XzDecodeError("footer backward-size mismatch")
    return bytes(out), start + pos + 12


def decompress_xz(data: bytes) -> bytes:
    """Full .xz payload -> decompressed bytes. CONCATENATED streams
    are supported exactly as the reference decoders accept them
    (stdlib lzma / `xz -d`): streams separated by optional stream
    padding (4-byte groups of null bytes), decoded in order and their
    outputs joined. Anything after a footer that is neither padding
    nor another stream header raises."""
    out = bytearray()
    pos = 0
    n = len(data)
    data = memoryview(data)
    first = True
    while True:
        if not first:
            # stream padding between (or after) streams: 4-byte null
            # groups. Padding BEFORE the first stream is rejected by
            # both stdlib lzma and `xz -d`, so only consume it once at
            # least one stream has been decoded.
            while (
                pos + 4 <= n and data[pos : pos + 4] == b"\x00\x00\x00\x00"
            ):
                pos += 4
            if pos == n:
                return bytes(out)
            if n - pos < 4:
                raise XzDecodeError(
                    f"{n - pos} trailing bytes after the last stream"
                )
        chunk, pos = _decompress_stream(data, pos)
        out += chunk
        first = False
