"""From-scratch Apache Parquet file reader (no pyarrow at decode time).

Implements, from the public parquet-format specification, everything a
flat (non-nested) Parquet file written by a real-world writer needs:

- the **Thrift compact protocol** (varint + zigzag ints, field-id
  deltas, short/long form field headers, inline booleans, lists,
  nested structs) for the file footer ``FileMetaData`` and the
  per-page ``PageHeader`` — parsed generically into field-id keyed
  dicts so the reader carries no generated code;
- the **RLE/bit-packed hybrid** decoder (LSB-first bit packing, both
  run forms) used by definition levels and dictionary indices;
- **PLAIN** decoders for BOOLEAN (bit-packed), INT32/INT64,
  FLOAT/DOUBLE (IEEE-754 LE), BYTE_ARRAY (length-prefixed) and
  FIXED_LEN_BYTE_ARRAY;
- **RLE_DICTIONARY / PLAIN_DICTIONARY** data pages with their
  PLAIN-encoded dictionary page;
- the **v2 value encodings**: DELTA_BINARY_PACKED (zigzag header,
  per-miniblock bit widths, LSB-first packed delta offsets,
  padding-aware final block), DELTA_LENGTH_BYTE_ARRAY,
  DELTA_BYTE_ARRAY (incremental front coding) and BYTE_STREAM_SPLIT;
- **data pages v1 and v2** (v2 keeps its levels uncompressed outside
  the compressed values section, lengths taken from the header);
- per-chunk **compression**: UNCOMPRESSED, SNAPPY and ZSTD through
  this package's own from-scratch decoders (`functions/snappy.py`,
  `functions/zstd.py`), GZIP through stdlib zlib inflate (the same
  dependency posture as the PNG/PDF decoders).

Nested or repeated schemas, INT96, and the codecs a modern writer no
longer emits (LZO, BROTLI) raise ``ParquetDecodeError`` cleanly.

The interop oracle is pyarrow's writer: every fixture file the tests
and the ``corpus_parquet_raw_ingest`` query decode is real
parquet-cpp output, so each run is an independent conformance check
(the same posture as stdlib-lzma for functions/xz.py and
stdlib-zipfile for functions/zipfmt.py).

Reference behavior parity: the reference engine stores its output as
ledger-partitioned files consumed by downstream scanners
(`python/adapters/s3_storage_adapter.py:28`); this module gives the
Spark rebuild byte-level auditability of the columnar format those
scans stand on.
"""

from __future__ import annotations

import struct
import zlib

from history_collector_spark.functions.codec_errors import MediaDecodeError


class ParquetDecodeError(MediaDecodeError):
    """Structural, CRC, or unsupported-feature failure in a .parquet
    payload."""


_MAGIC = b"PAR1"

# thrift compact element types
_CT_BOOL_TRUE = 1
_CT_BOOL_FALSE = 2
_CT_I8 = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12

# parquet physical types
_T_BOOLEAN = 0
_T_INT32 = 1
_T_INT64 = 2
_T_INT96 = 3
_T_FLOAT = 4
_T_DOUBLE = 5
_T_BYTE_ARRAY = 6
_T_FIXED = 7

_CODEC_NAMES = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}

# page types
_PG_DATA = 0
_PG_DICT = 2
_PG_DATA_V2 = 3

# encodings
_ENC_PLAIN = 0
_ENC_PLAIN_DICT = 2
_ENC_RLE = 3
_ENC_DELTA_BP = 5
_ENC_DELTA_LEN_BA = 6
_ENC_DELTA_BA = 7
_ENC_RLE_DICT = 8
_ENC_BYTE_STREAM_SPLIT = 9


# ---------------------------------------------------------------------------
# Thrift compact protocol
# ---------------------------------------------------------------------------


def _uvarint(buf, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if pos >= len(buf):
            raise ParquetDecodeError("truncated varint in thrift data")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ParquetDecodeError("thrift varint too long")


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _thrift_value(buf, pos: int, ctype: int):
    """One compact-protocol value of element type ``ctype``."""
    if ctype == _CT_BOOL_TRUE:
        return True, pos
    if ctype == _CT_BOOL_FALSE:
        return False, pos
    if ctype in (_CT_I8,):
        if pos >= len(buf):
            raise ParquetDecodeError("truncated thrift byte")
        return struct.unpack("b", buf[pos : pos + 1])[0], pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        v, pos = _uvarint(buf, pos)
        return _zigzag(v), pos
    if ctype == _CT_DOUBLE:
        if pos + 8 > len(buf):
            raise ParquetDecodeError("truncated thrift double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _uvarint(buf, pos)
        if pos + n > len(buf):
            raise ParquetDecodeError("truncated thrift binary")
        return bytes(buf[pos : pos + n]), pos + n
    if ctype in (_CT_LIST, _CT_SET):
        if pos >= len(buf):
            raise ParquetDecodeError("truncated thrift list header")
        hdr = buf[pos]
        pos += 1
        size = hdr >> 4
        etype = hdr & 0x0F
        if size == 15:
            size, pos = _uvarint(buf, pos)
        out = []
        for _ in range(size):
            # element bools carry the value in the ELEMENT TYPE slot
            # only for field headers; list elements of bool type use
            # one byte each (1=true, 2=false) per the compact spec
            if etype in (_CT_BOOL_TRUE, _CT_BOOL_FALSE):
                if pos >= len(buf):
                    raise ParquetDecodeError("truncated thrift bool")
                out.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _thrift_value(buf, pos, etype)
                out.append(v)
        return out, pos
    if ctype == _CT_STRUCT:
        return _thrift_struct(buf, pos)
    if ctype == _CT_MAP:
        raise ParquetDecodeError("thrift map fields are not used by parquet")
    raise ParquetDecodeError(f"unknown thrift compact type {ctype}")


def _thrift_struct(buf, pos: int) -> tuple[dict, int]:
    """Generic struct -> {field_id: value}; nested structs become
    dicts, lists become lists."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        if pos >= len(buf):
            raise ParquetDecodeError("truncated thrift struct")
        b = buf[pos]
        pos += 1
        if b == 0:  # STOP
            return fields, pos
        delta = b >> 4
        ctype = b & 0x0F
        if delta:
            fid += delta
        else:  # long form: explicit zigzag field id
            v, pos = _uvarint(buf, pos)
            fid = _zigzag(v)
        val, pos = _thrift_value(buf, pos, ctype)
        fields[fid] = val


# ---------------------------------------------------------------------------
# RLE/bit-packed hybrid + PLAIN decoders
# ---------------------------------------------------------------------------


def _rle_bp_hybrid(buf, pos: int, end: int, bit_width: int, n: int) -> list[int]:
    """Decode ``n`` values from the RLE / bit-packed hybrid encoding
    in ``buf[pos:end]``. LSB-first bit packing; RLE values are
    ceil(bit_width/8) bytes little-endian."""
    out: list[int] = []
    if bit_width == 0:
        return [0] * n
    byte_w = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < n:
        if pos >= end:
            raise ParquetDecodeError("truncated RLE/bit-packed run")
        header, pos = _uvarint(buf, pos)
        if header & 1:  # bit-packed groups of 8
            groups = header >> 1
            nbytes = groups * bit_width
            if pos + nbytes > end:
                raise ParquetDecodeError("truncated bit-packed run")
            acc = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            cnt = min(groups * 8, n - len(out))
            for i in range(cnt):
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            count = header >> 1
            if pos + byte_w > end:
                raise ParquetDecodeError("truncated RLE run value")
            val = int.from_bytes(buf[pos : pos + byte_w], "little")
            pos += byte_w
            out.extend([val] * min(count, n - len(out)))
    return out


def _plain_values(buf, pos: int, end: int, ptype: int, n: int,
                  type_length: int = 0) -> list:
    """``n`` PLAIN-encoded values of physical type ``ptype``."""
    if ptype == _T_BOOLEAN:
        nbytes = (n + 7) // 8
        if pos + nbytes > end:
            raise ParquetDecodeError("truncated PLAIN boolean run")
        acc = int.from_bytes(buf[pos : pos + nbytes], "little")
        return [bool((acc >> i) & 1) for i in range(n)]
    if ptype in (_T_INT32, _T_INT64, _T_FLOAT, _T_DOUBLE):
        fmt, w = {
            _T_INT32: ("<i", 4),
            _T_INT64: ("<q", 8),
            _T_FLOAT: ("<f", 4),
            _T_DOUBLE: ("<d", 8),
        }[ptype]
        if pos + n * w > end:
            raise ParquetDecodeError("truncated PLAIN fixed-width values")
        return list(struct.unpack(f"<{n}{fmt[1]}", buf[pos : pos + n * w]))
    if ptype == _T_BYTE_ARRAY:
        out = []
        for _ in range(n):
            if pos + 4 > end:
                raise ParquetDecodeError("truncated BYTE_ARRAY length")
            ln = struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
            if pos + ln > end:
                raise ParquetDecodeError("truncated BYTE_ARRAY value")
            out.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return out
    if ptype == _T_FIXED:
        if type_length <= 0:
            raise ParquetDecodeError("FIXED_LEN_BYTE_ARRAY without length")
        if pos + n * type_length > end:
            raise ParquetDecodeError("truncated FIXED values")
        return [
            bytes(buf[pos + i * type_length : pos + (i + 1) * type_length])
            for i in range(n)
        ]
    raise ParquetDecodeError(f"unsupported physical type {ptype}")


def _delta_binary_packed(buf, pos: int, end: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet v2 integer encoding) -> (values,
    position after the stream). Header: block size / miniblocks per
    block / total count / zigzag first value; each block carries a
    zigzag min-delta, per-miniblock bit widths, then LSB-first-packed
    delta offsets. The final block may pack padding values — dropped
    here by the total count."""
    block_size, pos = _uvarint(buf, pos)
    n_mini, pos = _uvarint(buf, pos)
    total, pos = _uvarint(buf, pos)
    if (
        n_mini == 0
        or block_size == 0
        or block_size % n_mini
        or (block_size // n_mini) % 8
    ):
        # a zero block size would make every miniblock empty and the
        # fill loop endless on crafted input
        raise ParquetDecodeError("bad DELTA_BINARY_PACKED geometry")
    per_mini = block_size // n_mini
    first, pos = _uvarint(buf, pos)
    first = _zigzag(first)
    out = [first]
    while len(out) < total:
        md, pos = _uvarint(buf, pos)
        min_delta = _zigzag(md)
        if pos + n_mini > end:
            raise ParquetDecodeError("truncated DELTA bit widths")
        widths = list(buf[pos : pos + n_mini])
        pos += n_mini
        for bw in widths:
            nbytes = per_mini * bw // 8
            if pos + nbytes > end:
                raise ParquetDecodeError("truncated DELTA miniblock")
            if len(out) >= total:
                # trailing miniblocks of the last block still occupy
                # their packed bytes even when fully padding
                pos += nbytes
                continue
            acc = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bw) - 1
            for i in range(per_mini):
                if len(out) >= total:
                    break
                d = (acc >> (i * bw)) & mask if bw else 0
                out.append(out[-1] + min_delta + d)
    return out[:total], pos


def _delta_length_byte_array(buf, pos: int, end: int,
                             n: int) -> tuple[list[bytes], int]:
    lens, pos = _delta_binary_packed(buf, pos, end)
    if len(lens) != n:
        raise ParquetDecodeError("DELTA_LENGTH count disagrees with page")
    out = []
    for ln in lens:
        if ln < 0 or pos + ln > end:
            raise ParquetDecodeError("truncated DELTA_LENGTH data")
        out.append(bytes(buf[pos : pos + ln]))
        pos += ln
    return out, pos


def _delta_byte_array(buf, pos: int, end: int, n: int) -> list[bytes]:
    prefixes, pos = _delta_binary_packed(buf, pos, end)
    if len(prefixes) != n:
        raise ParquetDecodeError("DELTA_BYTE_ARRAY count disagrees")
    suffixes, _ = _delta_length_byte_array(buf, pos, end, n)
    out: list[bytes] = []
    prev = b""
    for pl, suf in zip(prefixes, suffixes):
        if pl < 0 or pl > len(prev):
            raise ParquetDecodeError("DELTA_BYTE_ARRAY prefix overrun")
        prev = prev[:pl] + suf
        out.append(prev)
    return out


def _byte_stream_split(buf, pos: int, end: int, ptype: int,
                       n: int) -> list:
    width = {_T_FLOAT: 4, _T_DOUBLE: 8, _T_INT32: 4, _T_INT64: 8}.get(ptype)
    if width is None:
        raise ParquetDecodeError("BYTE_STREAM_SPLIT on unsupported type")
    if pos + n * width > end:
        raise ParquetDecodeError("truncated BYTE_STREAM_SPLIT data")
    streams = [buf[pos + k * n : pos + (k + 1) * n] for k in range(width)]
    fmt = {_T_FLOAT: "<f", _T_DOUBLE: "<d",
           _T_INT32: "<i", _T_INT64: "<q"}[ptype]
    return [
        struct.unpack(fmt, bytes(bytearray(s[i] for s in streams)))[0]
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# Compression
# ---------------------------------------------------------------------------


def _decompress(codec: int, data: bytes, uncompressed_size: int) -> bytes:
    if codec == 0:
        return data
    if codec == 1:
        from history_collector_spark.functions.snappy import (
            SnappyDecodeError,
            decompress_block,
        )

        try:
            return decompress_block(data)
        except SnappyDecodeError as exc:
            raise ParquetDecodeError(f"snappy page: {exc}") from exc
    if codec == 2:
        try:
            # parquet GZIP pages are full gzip members
            return zlib.decompress(data, 16 + 15)
        except zlib.error as exc:
            raise ParquetDecodeError(f"gzip page: {exc}") from exc
    if codec == 6:
        from history_collector_spark.functions.zstd import (
            ZstdDecodeError,
            decompress,
        )

        try:
            return decompress(data, max_out=max(uncompressed_size, 1 << 20))
        except ZstdDecodeError as exc:
            raise ParquetDecodeError(f"zstd page: {exc}") from exc
    name = _CODEC_NAMES.get(codec, str(codec))
    raise ParquetDecodeError(f"unsupported parquet codec {name}")


# ---------------------------------------------------------------------------
# File reader
# ---------------------------------------------------------------------------


def _parse_schema(elems: list[dict]) -> list[dict]:
    """Flat schema only: root + N leaf children. SchemaElement fields:
    1 type, 2 type_length, 3 repetition, 4 name, 5 num_children,
    6 converted_type."""
    if not elems:
        raise ParquetDecodeError("empty parquet schema")
    root = elems[0]
    n = root.get(5, 0)
    if n != len(elems) - 1:
        raise ParquetDecodeError(
            "nested parquet schemas are not supported (flat columns only)"
        )
    cols = []
    for e in elems[1:]:
        if e.get(5, 0):
            raise ParquetDecodeError("nested column groups are unsupported")
        rep = e.get(3, 0)
        if rep == 2:
            raise ParquetDecodeError("repeated columns are unsupported")
        if 1 not in e:
            raise ParquetDecodeError("schema leaf without a physical type")
        cols.append(
            {
                "name": e[4].decode("utf-8"),
                "type": e[1],
                "type_length": e.get(2, 0),
                "optional": rep == 1,
                "converted": e.get(6),
            }
        )
    return cols


def _read_chunk(blob, col: dict, meta: dict) -> list:
    """One column chunk -> python list with None for nulls."""
    ptype = meta.get(1)
    codec = meta.get(4, 0)
    num_values = meta.get(5)
    data_off = meta.get(9)
    dict_off = meta.get(11)
    if ptype != col["type"]:
        raise ParquetDecodeError("column chunk type disagrees with schema")
    if num_values is None or data_off is None:
        raise ParquetDecodeError("column chunk missing offsets/counts")
    pos = dict_off if dict_off is not None and dict_off < data_off else data_off
    dictionary: list | None = None
    values: list = []
    max_def = 1 if col["optional"] else 0
    n_read = 0
    while n_read < num_values:
        hdr, body = _thrift_struct(blob, pos)
        page_type = hdr.get(1)
        unc_size = hdr.get(2, 0)
        comp_size = hdr.get(3, 0)
        if comp_size < 0 or body + comp_size > len(blob):
            raise ParquetDecodeError("page body exceeds file size")
        page = blob[body : body + comp_size]
        pos = body + comp_size
        if page_type == _PG_DICT:
            raw = _decompress(codec, bytes(page), unc_size)
            dh = hdr.get(7, {})
            n_dict = dh.get(1)
            if n_dict is None:
                raise ParquetDecodeError("dictionary page without a count")
            dictionary = _plain_values(
                raw, 0, len(raw), ptype, n_dict, col["type_length"]
            )
            continue
        if page_type == _PG_DATA:
            dph = hdr.get(5, {})
            n_page = dph.get(1)
            enc = dph.get(2)
            if n_page is None or enc is None:
                raise ParquetDecodeError("data page header incomplete")
            raw = _decompress(codec, bytes(page), unc_size)
            p = 0
            if max_def:
                if p + 4 > len(raw):
                    raise ParquetDecodeError("truncated def-level prefix")
                lvl_len = struct.unpack("<I", raw[p : p + 4])[0]
                p += 4
                if p + lvl_len > len(raw):
                    raise ParquetDecodeError("truncated def levels")
                defs = _rle_bp_hybrid(raw, p, p + lvl_len, 1, n_page)
                p += lvl_len
            else:
                defs = [1] * n_page
            n_nonnull = sum(defs)
            vals = _decode_values(
                raw, p, len(raw), enc, ptype, n_nonnull,
                col["type_length"], dictionary,
            )
            values.extend(_weave(vals, defs, max_def))
            n_read += n_page
            continue
        if page_type == _PG_DATA_V2:
            dph = hdr.get(8, {})
            n_page = dph.get(1)
            enc = dph.get(4)
            def_len = dph.get(5, 0)
            rep_len = dph.get(6, 0)
            compressed = dph.get(7, True)
            if n_page is None or enc is None:
                raise ParquetDecodeError("data page v2 header incomplete")
            if rep_len:
                raise ParquetDecodeError("repetition levels are unsupported")
            if def_len > len(page):
                raise ParquetDecodeError("truncated v2 def levels")
            if max_def:
                defs = _rle_bp_hybrid(page, 0, def_len, 1, n_page)
            else:
                defs = [1] * n_page
            body_bytes = bytes(page[def_len:])
            if compressed:
                body_bytes = _decompress(
                    codec, body_bytes, max(unc_size - def_len, 0)
                )
            n_nonnull = sum(defs)
            vals = _decode_values(
                body_bytes, 0, len(body_bytes), enc, ptype, n_nonnull,
                col["type_length"], dictionary,
            )
            values.extend(_weave(vals, defs, max_def))
            n_read += n_page
            continue
        raise ParquetDecodeError(f"unsupported page type {page_type}")
    if n_read != num_values:
        raise ParquetDecodeError("column chunk value count mismatch")
    return values


def _decode_values(buf, pos, end, enc, ptype, n, type_length, dictionary):
    if n == 0:
        return []
    if enc == _ENC_PLAIN:
        return _plain_values(buf, pos, end, ptype, n, type_length)
    if enc == _ENC_RLE:
        # RLE-encoded values (BOOLEAN only, v2 writers): 4-byte LE
        # length prefix, then the hybrid runs at bit width 1
        if ptype != _T_BOOLEAN:
            raise ParquetDecodeError("RLE value encoding is boolean-only")
        if pos + 4 > end:
            raise ParquetDecodeError("truncated RLE boolean prefix")
        ln = struct.unpack("<I", bytes(buf[pos : pos + 4]))[0]
        pos += 4
        if pos + ln > end:
            raise ParquetDecodeError("truncated RLE boolean values")
        return [bool(v) for v in _rle_bp_hybrid(buf, pos, pos + ln, 1, n)]
    if enc == _ENC_DELTA_BP:
        if ptype not in (_T_INT32, _T_INT64):
            raise ParquetDecodeError("DELTA_BINARY_PACKED is int-only")
        vals, _ = _delta_binary_packed(buf, pos, end)
        if len(vals) != n:
            raise ParquetDecodeError("DELTA count disagrees with page")
        return vals
    if enc == _ENC_DELTA_LEN_BA:
        if ptype != _T_BYTE_ARRAY:
            raise ParquetDecodeError("DELTA_LENGTH needs BYTE_ARRAY")
        vals, _ = _delta_length_byte_array(buf, pos, end, n)
        return vals
    if enc == _ENC_DELTA_BA:
        if ptype not in (_T_BYTE_ARRAY, _T_FIXED):
            raise ParquetDecodeError("DELTA_BYTE_ARRAY needs BYTE_ARRAY")
        return _delta_byte_array(buf, pos, end, n)
    if enc == _ENC_BYTE_STREAM_SPLIT:
        return _byte_stream_split(buf, pos, end, ptype, n)
    if enc in (_ENC_PLAIN_DICT, _ENC_RLE_DICT):
        if dictionary is None:
            raise ParquetDecodeError("dictionary-encoded page before dict")
        if pos >= end:
            raise ParquetDecodeError("truncated dict-index page")
        bw = buf[pos]
        idx = _rle_bp_hybrid(buf, pos + 1, end, bw, n)
        try:
            return [dictionary[i] for i in idx]
        except IndexError as exc:
            raise ParquetDecodeError("dict index out of range") from exc
    raise ParquetDecodeError(f"unsupported value encoding {enc}")


def _weave(vals: list, defs: list[int], max_def: int) -> list:
    if not max_def:
        return vals
    out = []
    it = iter(vals)
    for d in defs:
        out.append(next(it) if d == max_def else None)
    return out


def read_parquet_raw(blob: bytes) -> dict:
    """Decode a whole .parquet payload.

    Returns ``{"columns": {name: list}, "num_rows": int,
    "codecs": [names...], "n_row_groups": int}`` — BYTE_ARRAY columns
    with a UTF8 converted type come back as ``str``, raw BYTE_ARRAY as
    ``bytes``. Raises ParquetDecodeError for anything structurally
    wrong, truncated, or unsupported.
    """
    try:
        return _read_parquet_raw(blob)
    except ParquetDecodeError:
        raise
    except (
        # corrupted footer bytes can flip a thrift field's TYPE, so a
        # generically-parsed dict holds the wrong python shape at some
        # field — surface every such confusion as ParquetDecodeError
        # so ingest kernels degrade to their per-shard error row
        AttributeError,
        IndexError,
        KeyError,
        TypeError,
        UnicodeDecodeError,
        ValueError,
        struct.error,
    ) as exc:
        raise ParquetDecodeError(
            f"malformed parquet structure: {type(exc).__name__}: {exc}"
        ) from exc


def _read_parquet_raw(blob: bytes) -> dict:
    if len(blob) < 12:
        raise ParquetDecodeError("too short for a parquet file")
    if blob[:4] != _MAGIC or blob[-4:] != _MAGIC:
        raise ParquetDecodeError("bad parquet magic")
    meta_len = struct.unpack("<I", blob[-8:-4])[0]
    meta_start = len(blob) - 8 - meta_len
    if meta_len <= 0 or meta_start < 4:
        raise ParquetDecodeError("parquet footer length out of range")
    view = memoryview(blob)
    fmeta, _ = _thrift_struct(view[meta_start : len(blob) - 8], 0)
    schema = _parse_schema(fmeta.get(2, []))
    num_rows = fmeta.get(3)
    row_groups = fmeta.get(4, [])
    if num_rows is None:
        raise ParquetDecodeError("footer missing row count")
    cols: dict[str, list] = {c["name"]: [] for c in schema}
    codecs: set[str] = set()
    for rg in row_groups:
        chunks = rg.get(1, [])
        if len(chunks) != len(schema):
            raise ParquetDecodeError("row group column count mismatch")
        rg_rows = rg.get(3)
        for col, chunk in zip(schema, chunks):
            meta = chunk.get(3)
            if meta is None:
                raise ParquetDecodeError("column chunk without metadata")
            path = [p.decode("utf-8") for p in meta.get(3, [])]
            if path != [col["name"]]:
                raise ParquetDecodeError(
                    f"column path {path} disagrees with schema order"
                )
            codecs.add(_CODEC_NAMES.get(meta.get(4, 0), "?"))
            vals = _read_chunk(view, col, meta)
            if rg_rows is not None and len(vals) != rg_rows:
                raise ParquetDecodeError("row group row-count mismatch")
            if col["type"] == _T_BYTE_ARRAY and col["converted"] == 0:
                vals = [
                    v.decode("utf-8") if v is not None else None
                    for v in vals
                ]
            cols[col["name"]].extend(vals)
    for name, vals in cols.items():
        if len(vals) != num_rows:
            raise ParquetDecodeError(
                f"column {name!r}: {len(vals)} values for {num_rows} rows"
            )
    return {
        "columns": cols,
        "num_rows": num_rows,
        "codecs": sorted(codecs),
        "n_row_groups": len(row_groups),
    }


# ---------------------------------------------------------------------------
# From-scratch writer (round 15): the dual conformance direction. The
# reader above proves this engine understands files real writers
# produce; the writer proves real READERS (pyarrow, DuckDB — pinned
# in tests) accept files this engine produces, byte-assembled from
# the same spec: thrift compact metadata, v1 data pages, RLE
# definition levels, PLAIN values, UNCOMPRESSED pages.
# ---------------------------------------------------------------------------


def _w_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_zigzag(v: int) -> bytes:
    return _w_uvarint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


class _ThriftWriter:
    """Minimal thrift compact struct writer (short-form field headers
    only — parquet field ids are small)."""

    def __init__(self):
        self.buf = bytearray()
        self._last = [0]

    def _hdr(self, fid: int, ctype: int):
        delta = fid - self._last[-1]
        if not 0 < delta <= 15:
            raise ValueError("field id delta out of short-form range")
        self.buf.append((delta << 4) | ctype)
        self._last[-1] = fid

    def i32(self, fid: int, v: int):
        self._hdr(fid, _CT_I32)
        self.buf += _w_zigzag(v)

    def i64(self, fid: int, v: int):
        self._hdr(fid, _CT_I64)
        self.buf += _w_zigzag(v)

    def binary(self, fid: int, v: bytes):
        self._hdr(fid, _CT_BINARY)
        self.buf += _w_uvarint(len(v)) + v

    def list_of(self, fid: int, etype: int, items: list[bytes]):
        self._hdr(fid, _CT_LIST)
        if len(items) < 15:
            self.buf.append((len(items) << 4) | etype)
        else:
            self.buf.append(0xF0 | etype)
            self.buf += _w_uvarint(len(items))
        for it in items:
            self.buf += it

    def struct(self, fid: int, body: bytes):
        self._hdr(fid, _CT_STRUCT)
        self.buf += body

    def done(self) -> bytes:
        return bytes(self.buf) + b"\x00"


def _i32_item(v: int) -> bytes:
    return _w_zigzag(v)


def _rle_levels(levels: list[int]) -> bytes:
    """Definition levels as 4-byte-length-prefixed RLE runs at bit
    width 1 (runs of consecutive equal values — always legal)."""
    body = bytearray()
    i = 0
    while i < len(levels):
        j = i
        while j < len(levels) and levels[j] == levels[i]:
            j += 1
        body += _w_uvarint((j - i) << 1)
        body.append(levels[i])
        i = j
    return struct.pack("<I", len(body)) + bytes(body)


def _plain_encode(ptype: int, vals: list) -> bytes:
    if ptype == _T_BOOLEAN:
        acc = 0
        for i, v in enumerate(vals):
            if v:
                acc |= 1 << i
        return acc.to_bytes((len(vals) + 7) // 8, "little")
    if ptype in (_T_INT32, _T_INT64, _T_FLOAT, _T_DOUBLE):
        fmt = {_T_INT32: "i", _T_INT64: "q",
               _T_FLOAT: "f", _T_DOUBLE: "d"}[ptype]
        return struct.pack(f"<{len(vals)}{fmt}", *vals)
    if ptype == _T_BYTE_ARRAY:
        out = bytearray()
        for v in vals:
            out += struct.pack("<I", len(v)) + v
        return bytes(out)
    raise ParquetDecodeError(f"writer: unsupported type {ptype}")


_W_TYPES = {
    "int32": (_T_INT32, None),
    "int64": (_T_INT64, None),
    "float": (_T_FLOAT, None),
    "double": (_T_DOUBLE, None),
    "boolean": (_T_BOOLEAN, None),
    "binary": (_T_BYTE_ARRAY, None),
    "string": (_T_BYTE_ARRAY, 0),  # converted_type UTF8
}


def write_parquet_raw(columns: list[tuple[str, str, list]]) -> bytes:
    """``[(name, type, values), ...]`` -> a complete .parquet payload
    (one row group, v1 PLAIN data pages, UNCOMPRESSED). ``type`` is
    one of int32/int64/float/double/boolean/binary/string; ``None``
    entries become nulls (the column is written optional with RLE
    definition levels). pyarrow and DuckDB must — and in tests do —
    read the output byte-faithfully."""
    if not columns:
        raise ParquetDecodeError("writer: at least one column required")
    n_rows = len(columns[0][2])
    out = bytearray(_MAGIC)
    chunk_meta = []
    for name, tname, vals in columns:
        if len(vals) != n_rows:
            raise ParquetDecodeError("writer: ragged columns")
        if tname not in _W_TYPES:
            raise ParquetDecodeError(f"writer: unknown type {tname!r}")
        ptype, conv = _W_TYPES[tname]
        defs = [0 if v is None else 1 for v in vals]
        nonnull = [v for v in vals if v is not None]
        if tname == "string":
            nonnull = [v.encode("utf-8") for v in nonnull]
        body = _rle_levels(defs) + _plain_encode(ptype, nonnull)
        ph = _ThriftWriter()
        ph.i32(1, _PG_DATA)
        ph.i32(2, len(body))
        ph.i32(3, len(body))
        dph = _ThriftWriter()
        dph.i32(1, n_rows)
        dph.i32(2, _ENC_PLAIN)
        dph.i32(3, _ENC_RLE)  # definition level encoding
        dph.i32(4, _ENC_RLE)  # repetition level encoding
        ph.struct(5, dph.done())
        page = ph.done() + body
        data_off = len(out)
        out += page
        chunk_meta.append((name, ptype, conv, data_off, len(page)))

    # schema
    root = _ThriftWriter()
    root.binary(4, b"schema")
    root.i32(5, len(columns))
    schema_items = [root.done()]
    for name, ptype, conv, _, _ in chunk_meta:
        el = _ThriftWriter()
        el.i32(1, ptype)
        el.i32(3, 1)  # optional
        el.binary(4, name.encode("utf-8"))
        if conv is not None:
            el.i32(6, conv)
        schema_items.append(el.done())

    # row group
    col_items = []
    total_bytes = 0
    for name, ptype, conv, off, ln in chunk_meta:
        md = _ThriftWriter()
        md.i32(1, ptype)
        md.list_of(2, _CT_I32, [_i32_item(_ENC_PLAIN), _i32_item(_ENC_RLE)])
        md.list_of(
            3, _CT_BINARY,
            [_w_uvarint(len(name.encode())) + name.encode()],
        )
        md.i32(4, 0)  # UNCOMPRESSED
        md.i64(5, n_rows)
        md.i64(6, ln)
        md.i64(7, ln)
        md.i64(9, off)
        cc = _ThriftWriter()
        cc.i64(2, off)
        cc.struct(3, md.done())
        col_items.append(cc.done())
        total_bytes += ln
    rg = _ThriftWriter()
    rg.list_of(1, _CT_STRUCT, col_items)
    rg.i64(2, total_bytes)
    rg.i64(3, n_rows)

    fm = _ThriftWriter()
    fm.i32(1, 2)  # format version
    fm.list_of(2, _CT_STRUCT, schema_items)
    fm.i64(3, n_rows)
    fm.list_of(4, _CT_STRUCT, [rg.done()])
    fm.binary(6, b"history-collector-spark parquet_raw writer")
    meta = fm.done()
    out += meta
    out += struct.pack("<I", len(meta)) + _MAGIC
    return bytes(out)
