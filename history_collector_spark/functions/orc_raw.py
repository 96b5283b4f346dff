"""From-scratch Apache ORC file reader (no pyarrow at decode time).

Implements, from the public ORC v1 specification, everything a flat
(non-nested) ORC file written by a real-world writer needs:

- the **protobuf wire format** (varint, length-delimited, fixed64/32,
  packed repeated) for PostScript, Footer, StripeFooter — parsed
  generically into field-id keyed dicts, no generated code;
- the **compression framing** (3-byte chunk headers with the
  is-original bit) over NONE / ZLIB (raw DEFLATE via stdlib — the
  PNG/PDF posture) / SNAPPY / LZ4 / ZSTD, the latter three through
  this package's own from-scratch block decoders;
- **Byte-RLE** and **boolean RLE** (MSB-first bit order) for PRESENT
  streams and TINYINT columns;
- **integer RLE v2** — all four sub-encodings (SHORT_REPEAT, DIRECT,
  PATCHED_BASE, DELTA) with MSB-first bit packing, the 5-bit
  closest-fixed-bits width table, zigzag for signed streams and the
  sign-bit base of patched-base;
- column readers for BOOLEAN, TINYINT, SMALLINT/INT/LONG, FLOAT,
  DOUBLE, STRING/BINARY in both **DIRECT_V2** and **DICTIONARY_V2**
  encodings, DATE, with PRESENT-stream null weaving and multi-stripe
  concatenation.

Nested types (list/map/struct-below-root/union), timestamps and
decimals raise ``OrcDecodeError`` cleanly.

The interop oracle is pyarrow's ORC writer (liborc): every fixture
the tests and ``corpus_orc_raw_ingest`` decode is real ORC-C++
output, so each run is an independent conformance check — the sibling
of ``functions/parquet_raw.py`` for the other open columnar format.
"""

from __future__ import annotations

import struct
import zlib

from history_collector_spark.functions.codec_errors import MediaDecodeError


class OrcDecodeError(MediaDecodeError):
    """Structural or unsupported-feature failure in an .orc payload."""


_MAGIC = b"ORC"

# type kinds
_K_BOOLEAN = 0
_K_BYTE = 1
_K_SHORT = 2
_K_INT = 3
_K_LONG = 4
_K_FLOAT = 5
_K_DOUBLE = 6
_K_STRING = 7
_K_BINARY = 8
_K_STRUCT = 12
_K_DATE = 15
_K_VARCHAR = 16
_K_CHAR = 17

_INT_KINDS = {_K_SHORT, _K_INT, _K_LONG, _K_DATE}
_STR_KINDS = {_K_STRING, _K_BINARY, _K_VARCHAR, _K_CHAR}

# stream kinds
_S_PRESENT = 0
_S_DATA = 1
_S_LENGTH = 2
_S_DICT_DATA = 3

# column encodings
_E_DIRECT = 0
_E_DICTIONARY = 1
_E_DIRECT_V2 = 2
_E_DICTIONARY_V2 = 3

# 5-bit width code -> bit width (closest fixed bits)
_WIDTHS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


# ---------------------------------------------------------------------------
# protobuf
# ---------------------------------------------------------------------------


def _uvarint(b, p: int) -> tuple[int, int]:
    v = s = 0
    while True:
        if p >= len(b):
            raise OrcDecodeError("truncated protobuf varint")
        x = b[p]
        p += 1
        v |= (x & 0x7F) << s
        if not x & 0x80:
            return v, p
        s += 7
        if s > 70:
            raise OrcDecodeError("protobuf varint too long")


def _pb(b, p: int = 0, end: int | None = None) -> dict[int, list]:
    """Generic message -> {field_id: [values...]}; length-delimited
    fields come back as bytes (caller re-parses per schema)."""
    end = len(b) if end is None else end
    out: dict[int, list] = {}
    while p < end:
        tag, p = _uvarint(b, p)
        fid, wt = tag >> 3, tag & 7
        if wt == 0:
            v, p = _uvarint(b, p)
        elif wt == 2:
            ln, p = _uvarint(b, p)
            if p + ln > end:
                raise OrcDecodeError("truncated protobuf field")
            v = bytes(b[p : p + ln])
            p += ln
        elif wt == 5:
            v = bytes(b[p : p + 4])
            p += 4
        elif wt == 1:
            v = bytes(b[p : p + 8])
            p += 8
        else:
            raise OrcDecodeError(f"unsupported protobuf wire type {wt}")
        out.setdefault(fid, []).append(v)
    return out


def _packed_uints(raw) -> list[int]:
    if isinstance(raw, int):  # single unpacked varint
        return [raw]
    out, p = [], 0
    while p < len(raw):
        v, p = _uvarint(raw, p)
        out.append(v)
    return out


def _one(msg: dict, fid: int, default=None):
    vals = msg.get(fid)
    return vals[0] if vals else default


# ---------------------------------------------------------------------------
# compression framing
# ---------------------------------------------------------------------------


def _decompress_chunk(codec: int, data: bytes) -> bytes:
    if codec == 1:  # ZLIB = raw DEFLATE in ORC
        try:
            return zlib.decompress(data, -15)
        except zlib.error as exc:
            raise OrcDecodeError(f"zlib chunk: {exc}") from exc
    if codec == 2:
        from history_collector_spark.functions.snappy import (
            SnappyDecodeError,
            decompress_block,
        )

        try:
            return decompress_block(data)
        except SnappyDecodeError as exc:
            raise OrcDecodeError(f"snappy chunk: {exc}") from exc
    if codec == 4:
        from history_collector_spark.functions.lz4 import (
            Lz4DecodeError,
            decompress_block,
        )

        try:
            return decompress_block(data)
        except Lz4DecodeError as exc:
            raise OrcDecodeError(f"lz4 chunk: {exc}") from exc
    if codec == 5:
        from history_collector_spark.functions.zstd import (
            ZstdDecodeError,
            decompress,
        )

        try:
            return decompress(data)
        except ZstdDecodeError as exc:
            raise OrcDecodeError(f"zstd chunk: {exc}") from exc
    raise OrcDecodeError(f"unsupported ORC compression kind {codec}")


def _region(blob, start: int, length: int, codec: int) -> bytes:
    """A (possibly compression-framed) byte region -> plain bytes."""
    raw = blob[start : start + length]
    if len(raw) != length:
        raise OrcDecodeError("region extends past end of file")
    if codec == 0:
        return bytes(raw)
    out = bytearray()
    p = 0
    while p < len(raw):
        if p + 3 > len(raw):
            raise OrcDecodeError("truncated compression chunk header")
        hdr = raw[p] | (raw[p + 1] << 8) | (raw[p + 2] << 16)
        p += 3
        ln = hdr >> 1
        if p + ln > len(raw):
            raise OrcDecodeError("truncated compression chunk body")
        body = bytes(raw[p : p + ln])
        p += ln
        out += body if hdr & 1 else _decompress_chunk(codec, body)
    return bytes(out)


# ---------------------------------------------------------------------------
# RLE decoders
# ---------------------------------------------------------------------------


def _byte_rle(data: bytes, n: int) -> list[int]:
    out: list[int] = []
    p = 0
    while len(out) < n:
        if p >= len(data):
            raise OrcDecodeError("truncated byte-RLE stream")
        h = data[p]
        p += 1
        if h < 128:  # run
            if p >= len(data):
                raise OrcDecodeError("truncated byte-RLE run")
            out.extend([data[p]] * (h + 3))
            p += 1
        else:  # literals
            cnt = 256 - h
            if p + cnt > len(data):
                raise OrcDecodeError("truncated byte-RLE literals")
            out.extend(data[p : p + cnt])
            p += cnt
    return out[:n]


def _bool_rle(data: bytes, n: int) -> list[bool]:
    nbytes = (n + 7) // 8
    bts = _byte_rle(data, nbytes)
    out = []
    for b in bts:
        for i in range(7, -1, -1):  # MSB-first
            out.append(bool((b >> i) & 1))
    return out[:n]


class _BitReader:
    """MSB-first bit reader over a byte buffer."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self.pos >= len(self.data):
                raise OrcDecodeError("bit stream exhausted")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _varint_sig(data: bytes, p: int) -> tuple[int, int]:
    v, p = _uvarint(data, p)
    return _zigzag(v), p


def _rle_v2(data: bytes, n: int, signed: bool) -> list[int]:
    """ORC RunLength v2: SHORT_REPEAT / DIRECT / PATCHED_BASE /
    DELTA."""
    out: list[int] = []
    p = 0
    while len(out) < n:
        if p >= len(data):
            raise OrcDecodeError("truncated RLEv2 stream")
        h = data[p]
        enc = h >> 6
        if enc == 0:  # SHORT_REPEAT
            width = ((h >> 3) & 7) + 1
            rep = (h & 7) + 3
            if p + 1 + width > len(data):
                raise OrcDecodeError("truncated SHORT_REPEAT value")
            v = int.from_bytes(data[p + 1 : p + 1 + width], "big")
            if signed:
                v = _zigzag(v)
            out.extend([v] * rep)
            p += 1 + width
        elif enc == 1:  # DIRECT
            wcode = (h >> 1) & 0x1F
            width = _WIDTHS[wcode]
            if p + 2 > len(data):
                raise OrcDecodeError("truncated DIRECT header")
            length = (((h & 1) << 8) | data[p + 1]) + 1
            br = _BitReader(data, p + 2)
            vals = [br.read(width) for _ in range(length)]
            p = br.align()
            if signed:
                vals = [_zigzag(v) for v in vals]
            out.extend(vals)
        elif enc == 2:  # PATCHED_BASE
            wcode = (h >> 1) & 0x1F
            width = _WIDTHS[wcode]
            if p + 4 > len(data):
                raise OrcDecodeError("truncated PATCHED_BASE header")
            length = (((h & 1) << 8) | data[p + 1]) + 1
            b3, b4 = data[p + 2], data[p + 3]
            bw = ((b3 >> 5) & 7) + 1
            pw = _WIDTHS[b3 & 0x1F]
            pgw = ((b4 >> 5) & 7) + 1
            pll = b4 & 0x1F
            if p + 4 + bw > len(data):
                raise OrcDecodeError("truncated PATCHED_BASE base")
            base = int.from_bytes(data[p + 4 : p + 4 + bw], "big")
            sign_mask = 1 << (bw * 8 - 1)
            if base & sign_mask:
                base = -(base & (sign_mask - 1))
            br = _BitReader(data, p + 4 + bw)
            vals = [br.read(width) for _ in range(length)]
            br.align()
            patch_unit = pgw + pw
            gap_acc = 0
            for _ in range(pll):
                entry = br.read(patch_unit)
                gap = entry >> pw
                patch = entry & ((1 << pw) - 1)
                gap_acc += gap
                if gap_acc >= length:
                    raise OrcDecodeError("PATCHED_BASE gap out of range")
                vals[gap_acc] |= patch << width
            p = br.align()
            out.extend(base + v for v in vals)
        else:  # DELTA
            wcode = (h >> 1) & 0x1F
            width = 0 if wcode == 0 else _WIDTHS[wcode]
            if p + 2 > len(data):
                raise OrcDecodeError("truncated DELTA header")
            length = (((h & 1) << 8) | data[p + 1]) + 1
            q = p + 2
            if signed:
                base, q = _varint_sig(data, q)
            else:
                base, q = _uvarint(data, q)
            delta0, q = _varint_sig(data, q)
            vals = [base]
            if length > 1:
                vals.append(base + delta0)
            if length > 2:
                br = _BitReader(data, q)
                sign = 1 if delta0 >= 0 else -1
                for _ in range(length - 2):
                    d = br.read(width) if width else abs(delta0)
                    vals.append(vals[-1] + sign * d)
                q = br.align()
            p = q
            out.extend(vals)
    if len(out) > n:
        raise OrcDecodeError("RLEv2 stream overran expected count")
    return out


# ---------------------------------------------------------------------------
# column assembly
# ---------------------------------------------------------------------------


def _weave(vals: list, present: list[bool] | None) -> list:
    if present is None:
        return vals
    out = []
    it = iter(vals)
    for ok in present:
        out.append(next(it) if ok else None)
    return out


def _read_column(kind: int, enc: dict, streams: dict, n_rows: int) -> list:
    """One column of one stripe -> python list (None for nulls)."""
    ekind = _one(enc, 1, 0)
    present = None
    if _S_PRESENT in streams:
        present = _bool_rle(streams[_S_PRESENT], n_rows)
        n_vals = sum(present)
    else:
        n_vals = n_rows
    if kind == _K_BOOLEAN:
        vals = _bool_rle(streams.get(_S_DATA, b""), n_vals)
        return _weave(vals, present)
    if kind == _K_BYTE:
        vals = _byte_rle(streams.get(_S_DATA, b""), n_vals)
        return _weave(vals, present)
    if kind in _INT_KINDS:
        if ekind not in (_E_DIRECT_V2,):
            raise OrcDecodeError(
                f"integer encoding {ekind} unsupported (RLEv1 writer?)"
            )
        vals = _rle_v2(streams.get(_S_DATA, b""), n_vals, signed=True)
        return _weave(vals, present)
    if kind == _K_FLOAT:
        raw = streams.get(_S_DATA, b"")
        if len(raw) < 4 * n_vals:
            raise OrcDecodeError("truncated FLOAT data")
        vals = list(struct.unpack(f"<{n_vals}f", raw[: 4 * n_vals]))
        return _weave(vals, present)
    if kind == _K_DOUBLE:
        raw = streams.get(_S_DATA, b"")
        if len(raw) < 8 * n_vals:
            raise OrcDecodeError("truncated DOUBLE data")
        vals = list(struct.unpack(f"<{n_vals}d", raw[: 8 * n_vals]))
        return _weave(vals, present)
    if kind in _STR_KINDS:
        as_text = kind != _K_BINARY
        if ekind == _E_DIRECT_V2:
            lens = _rle_v2(streams.get(_S_LENGTH, b""), n_vals, signed=False)
            raw = streams.get(_S_DATA, b"")
            vals, q = [], 0
            for ln in lens:
                if q + ln > len(raw):
                    raise OrcDecodeError("truncated string data")
                vals.append(raw[q : q + ln])
                q += ln
        elif ekind == _E_DICTIONARY_V2:
            dict_size = _one(enc, 2, 0)
            lens = _rle_v2(
                streams.get(_S_LENGTH, b""), dict_size, signed=False
            )
            raw = streams.get(_S_DICT_DATA, b"")
            dictionary, q = [], 0
            for ln in lens:
                if q + ln > len(raw):
                    raise OrcDecodeError("truncated dictionary data")
                dictionary.append(raw[q : q + ln])
                q += ln
            idx = _rle_v2(streams.get(_S_DATA, b""), n_vals, signed=False)
            try:
                vals = [dictionary[i] for i in idx]
            except IndexError as exc:
                raise OrcDecodeError("dictionary index range") from exc
        else:
            raise OrcDecodeError(f"string encoding {ekind} unsupported")
        if as_text:
            vals = [v.decode("utf-8") for v in vals]
        return _weave(vals, present)
    raise OrcDecodeError(f"unsupported ORC type kind {kind}")


# ---------------------------------------------------------------------------
# file reader
# ---------------------------------------------------------------------------


def read_orc_raw(blob: bytes) -> dict:
    """Decode a whole .orc payload.

    Returns ``{"columns": {name: list}, "num_rows": int,
    "compression": str, "n_stripes": int}``. STRING/CHAR/VARCHAR
    columns come back as ``str``, BINARY as ``bytes``. Raises
    OrcDecodeError for anything structurally wrong, truncated, or
    unsupported.
    """
    try:
        return _read_orc_raw(blob)
    except OrcDecodeError:
        raise
    except (
        AttributeError,
        IndexError,
        KeyError,
        TypeError,
        UnicodeDecodeError,
        ValueError,
        OverflowError,
        MemoryError,
        struct.error,
    ) as exc:
        raise OrcDecodeError(
            f"malformed ORC structure: {type(exc).__name__}: {exc}"
        ) from exc


def _read_orc_raw(blob: bytes) -> dict:
    if len(blob) < 16 or blob[:3] != _MAGIC:
        raise OrcDecodeError("bad ORC magic")
    ps_len = blob[-1]
    ps_start = len(blob) - 1 - ps_len
    if ps_len == 0 or ps_start <= 3:
        raise OrcDecodeError("postscript length out of range")
    view = memoryview(blob)
    ps = _pb(view[ps_start : len(blob) - 1])
    if _one(ps, 8000) != _MAGIC:
        raise OrcDecodeError("postscript magic mismatch")
    footer_len = _one(ps, 1)
    codec = _one(ps, 2, 0)
    if footer_len is None:
        raise OrcDecodeError("postscript missing footer length")
    f_start = ps_start - footer_len
    if f_start < 3:
        raise OrcDecodeError("footer length out of range")
    footer = _pb(_region(view, f_start, footer_len, codec))

    types = [_pb(t) for t in footer.get(4, [])]
    if not types or _one(types[0], 1) != _K_STRUCT:
        raise OrcDecodeError("root type must be a struct")
    subtypes = _packed_uints(types[0].get(2, [b""])[0])
    names = [x.decode("utf-8") for x in types[0].get(3, [])]
    if len(subtypes) != len(names):
        raise OrcDecodeError("schema name/subtype count mismatch")
    col_kinds = []
    for st in subtypes:
        if st >= len(types):
            raise OrcDecodeError("subtype index out of range")
        k = _one(types[st], 1)
        if types[st].get(2):
            raise OrcDecodeError("nested ORC schemas are unsupported")
        col_kinds.append(k)

    num_rows = _one(footer, 6)
    if num_rows is None:
        raise OrcDecodeError("footer missing row count")
    cols: dict[str, list] = {n: [] for n in names}
    stripes = [_pb(s) for s in footer.get(3, [])]
    for si in stripes:
        off = _one(si, 1)
        ilen = _one(si, 2, 0)
        dlen = _one(si, 3, 0)
        sflen = _one(si, 4)
        srows = _one(si, 5)
        if off is None or sflen is None or srows is None:
            raise OrcDecodeError("stripe information incomplete")
        sf = _pb(_region(view, off + ilen + dlen, sflen, codec))
        streams = [_pb(s) for s in sf.get(1, [])]
        encodings = [_pb(e) for e in sf.get(2, [])]
        if len(encodings) != len(types):
            raise OrcDecodeError("stripe encoding count mismatch")
        # walk stream layout: index region first, then data region
        pos = off
        col_streams: dict[int, dict[int, bytes]] = {}
        for s in streams:
            skind = _one(s, 1, 0)
            scol = _one(s, 2, 0)
            slen = _one(s, 3, 0)
            if skind in (_S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT_DATA):
                col_streams.setdefault(scol, {})[skind] = _region(
                    view, pos, slen, codec
                )
            pos += slen
        if pos != off + ilen + dlen:
            raise OrcDecodeError("stream lengths disagree with stripe size")
        for ci, (name, kind) in enumerate(zip(names, col_kinds)):
            col_id = subtypes[ci]
            vals = _read_column(
                kind,
                encodings[col_id],
                col_streams.get(col_id, {}),
                srows,
            )
            if len(vals) != srows:
                raise OrcDecodeError("column row count mismatch")
            cols[name].extend(vals)
    for name, vals in cols.items():
        if len(vals) != num_rows:
            raise OrcDecodeError(
                f"column {name!r}: {len(vals)} values for {num_rows} rows"
            )
    return {
        "columns": cols,
        "num_rows": num_rows,
        "compression": {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO",
                        4: "LZ4", 5: "ZSTD"}.get(codec, str(codec)),
        "n_stripes": len(stripes),
    }


# ---------------------------------------------------------------------------
# From-scratch writer (round 15): the dual conformance direction for
# ORC, sibling of parquet_raw.write_parquet_raw. Emits NONE
# compression, RLEv2 DIRECT runs (a legal subset any reader must
# take), byte-RLE boolean PRESENT streams, and hand-assembled
# protobuf metadata. liborc (pyarrow.orc) and this module's own
# reader are pinned in tests to read the output byte-faithfully.
# ---------------------------------------------------------------------------


def _w_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            return bytes(out)


def _w_zigzag(v: int) -> bytes:
    return _w_uvarint((v << 1) if v >= 0 else ((-v) << 1) - 1)


def _pb_varint(fid: int, v: int) -> bytes:
    return _w_uvarint((fid << 3) | 0) + _w_uvarint(v)


def _pb_bytes(fid: int, b: bytes) -> bytes:
    return _w_uvarint((fid << 3) | 2) + _w_uvarint(len(b)) + b


def _w_rle_v2_direct(vals: list[int], signed: bool) -> bytes:
    """RLEv2 DIRECT runs of <=512 values, MSB-first packing at the
    smallest legal table width per run."""
    out = bytearray()
    i = 0
    while i < len(vals):
        run = vals[i : i + 512]
        if signed:
            zz = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in run]
        else:
            zz = list(run)
            if any(v < 0 for v in zz):
                raise OrcDecodeError("writer: negative unsigned value")
        need = max(max(v.bit_length() for v in zz), 1)
        width = next(w for w in _WIDTHS if w >= need)
        wcode = _WIDTHS.index(width)
        ln = len(run) - 1
        out.append(0x40 | (wcode << 1) | (ln >> 8))
        out.append(ln & 0xFF)
        acc = nb = 0
        for v in zz:
            acc = (acc << width) | v
            nb += width
            while nb >= 8:
                nb -= 8
                out.append((acc >> nb) & 0xFF)
                acc &= (1 << nb) - 1
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        i += 512
    return bytes(out)


def _w_byte_rle(data: bytes) -> bytes:
    """Byte-RLE as literal groups of <=128 (always legal)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        grp = data[i : i + 128]
        out.append(256 - len(grp))
        out += grp
    return bytes(out)


def _w_bool_rle(bits: list[bool]) -> bytes:
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, v in enumerate(bits[i : i + 8]):
            if v:
                b |= 1 << (7 - j)  # MSB-first
        by.append(b)
    return _w_byte_rle(bytes(by))


_WK_LONG = "long"
_WK_STRING = "string"
_WK_DOUBLE = "double"
_WK_BOOLEAN = "boolean"
_W_KINDS = {
    _WK_LONG: _K_LONG,
    _WK_STRING: _K_STRING,
    _WK_DOUBLE: _K_DOUBLE,
    _WK_BOOLEAN: _K_BOOLEAN,
}


def write_orc_raw(columns: list[tuple[str, str, list]]) -> bytes:
    """``[(name, type, values), ...]`` -> a complete .orc payload
    (one stripe, NONE compression, RLEv2 DIRECT / byte-RLE streams).
    ``type`` is long/string/double/boolean; ``None`` entries become
    nulls via a PRESENT stream. liborc (pyarrow.orc) and this
    module's reader are — and in tests must stay — byte-faithful on
    the output."""
    if not columns:
        raise OrcDecodeError("writer: at least one column required")
    n_rows = len(columns[0][2])
    stream_msgs: list[bytes] = []
    data_region = bytearray()
    enc_msgs: list[bytes] = [_pb_bytes(2, _pb_varint(1, _E_DIRECT))]  # root

    def emit(col_id: int, skind: int, payload: bytes):
        stream_msgs.append(
            _pb_bytes(
                1,
                _pb_varint(1, skind)
                + _pb_varint(2, col_id)
                + _pb_varint(3, len(payload)),
            )
        )
        data_region.extend(payload)

    for ci, (name, tname, vals) in enumerate(columns, start=1):
        if len(vals) != n_rows:
            raise OrcDecodeError("writer: ragged columns")
        if tname not in _W_KINDS:
            raise OrcDecodeError(f"writer: unknown type {tname!r}")
        nonnull = [v for v in vals if v is not None]
        if len(nonnull) < n_rows:
            emit(ci, _S_PRESENT,
                 _w_bool_rle([v is not None for v in vals]))
        if tname == _WK_LONG:
            emit(ci, _S_DATA,
                 _w_rle_v2_direct([int(v) for v in nonnull], signed=True))
            enc = _E_DIRECT_V2
        elif tname == _WK_STRING:
            bs = [v.encode("utf-8") for v in nonnull]
            emit(ci, _S_DATA, b"".join(bs))
            emit(ci, _S_LENGTH,
                 _w_rle_v2_direct([len(b) for b in bs], signed=False))
            enc = _E_DIRECT_V2
        elif tname == _WK_DOUBLE:
            emit(ci, _S_DATA,
                 struct.pack(f"<{len(nonnull)}d", *map(float, nonnull)))
            enc = _E_DIRECT
        else:  # boolean
            emit(ci, _S_DATA, _w_bool_rle([bool(v) for v in nonnull]))
            enc = _E_DIRECT
        enc_msgs.append(_pb_bytes(2, _pb_varint(1, enc)))

    stripe_footer = b"".join(stream_msgs) + b"".join(enc_msgs)
    body = bytearray(_MAGIC)
    stripe_off = len(body)
    body += data_region
    body += stripe_footer
    stripe_info = (
        _pb_varint(1, stripe_off)
        + _pb_varint(2, 0)
        + _pb_varint(3, len(data_region))
        + _pb_varint(4, len(stripe_footer))
        + _pb_varint(5, n_rows)
    )
    subtypes = b"".join(_w_uvarint(i) for i in range(1, len(columns) + 1))
    t_root = _pb_varint(1, _K_STRUCT) + _pb_bytes(2, subtypes)
    for name, _, _ in columns:
        t_root += _pb_bytes(3, name.encode("utf-8"))
    type_msgs = [_pb_bytes(4, t_root)] + [
        _pb_bytes(4, _pb_varint(1, _W_KINDS[tname]))
        for _, tname, _ in columns
    ]
    footer = (
        _pb_varint(1, 3)  # headerLength (the magic)
        + _pb_varint(2, len(body))  # contentLength
        + _pb_bytes(3, stripe_info)
        + b"".join(type_msgs)
        + _pb_varint(6, n_rows)
    )
    body += footer
    ps = (
        _pb_varint(1, len(footer))
        + _pb_varint(2, 0)  # compression NONE
        + _pb_varint(3, 65536)
        + _pb_bytes(4, _w_uvarint(0) + _w_uvarint(12))
        + _pb_varint(5, 0)
        + _pb_varint(6, 1)
        + _pb_bytes(8000, _MAGIC)
    )
    body += ps
    body.append(len(ps))
    return bytes(body)
