"""Minimal from-scratch TIFF/EXIF IFD reader + writer.

TIFF's IFD structure is the metadata backbone of the imaging world:
EXIF blocks inside JPEGs, DNG/RAW camera files, and GeoTIFF all walk
the same (byte-order, magic 42, offset -> entry table) layout. A
training-data pipeline rarely needs TIFF *pixels* (crawl images are
JPEG/PNG/WebP) but constantly needs TIFF *metadata* — dimensions,
orientation, camera make — so this module implements the IFD walk
completely (both byte orders, SHORT/LONG/ASCII types, inline vs
offset-stored values, multi-IFD chaining) and leaves pixel decoding
as the documented plug point.

Error contract: malformed structure raises ``ImageDecodeError``
(shared base, so the existing Arrow decode kernels degrade corrupt
blobs to error rows); valid-but-unsupported features raise
``NotImplementedError``. Bounded walks everywhere — entry counts and
IFD chains are capped so a crafted blob cannot loop or allocate
unboundedly (the 100 TB requirement: one hostile file costs an error
row, not an executor).
"""

from __future__ import annotations

import struct

from history_collector_spark.functions.codec_errors import ImageDecodeError

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_MAKE = 271
TAG_ORIENTATION = 274

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG
_MAX_ENTRIES = 512
_MAX_IFDS = 8


def encode_tiff_meta(
    width: int,
    height: int,
    orientation: int,
    make: str,
    big_endian: bool = False,
) -> bytes:
    """Write a pixel-less metadata TIFF (IFD0 with 4 entries). The
    make string is stored via the offset path whenever its NUL-padded
    length exceeds the 4 inline bytes — real writers do both."""
    bo = ">" if big_endian else "<"
    magic = (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    header = magic + struct.pack(bo + "I", 8)
    make_b = make.encode("ascii") + b"\x00"
    entries = []
    # entries must be ascending by tag in a valid TIFF
    entries.append((TAG_WIDTH, 4, 1, struct.pack(bo + "I", width)))
    entries.append((TAG_HEIGHT, 4, 1, struct.pack(bo + "I", height)))
    tail = b""
    ifd_size = 2 + 12 * 4 + 4
    if len(make_b) <= 4:
        make_val = make_b.ljust(4, b"\x00")
    else:
        make_val = struct.pack(bo + "I", 8 + ifd_size)
        tail = make_b
    entries.append((TAG_MAKE, 2, len(make_b), make_val))
    entries.append(
        (TAG_ORIENTATION, 3, 1,
         struct.pack(bo + "H", orientation) + b"\x00\x00")
    )
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    return header + ifd + tail


def parse_tiff_meta(blob: bytes) -> dict:
    """TIFF blob -> {byte_order, width, height, orientation, make}.

    Walks every IFD (bounded), collecting the four supported tags from
    IFD0; unknown tags are skipped by the fixed 12-byte entry size —
    that totality is what makes the walker safe on arbitrary EXIF."""
    if len(blob) < 8:
        raise ImageDecodeError("short TIFF header")
    if blob[0:2] == b"II":
        bo = "<"
    elif blob[0:2] == b"MM":
        bo = ">"
    else:
        raise ImageDecodeError("bad TIFF byte-order mark")
    (magic,) = struct.unpack(bo + "H", blob[2:4])
    if magic != 42:
        raise ImageDecodeError(f"bad TIFF magic {magic}")
    (off,) = struct.unpack(bo + "I", blob[4:8])
    out = {
        "byte_order": "MM" if bo == ">" else "II",
        "width": None,
        "height": None,
        "orientation": None,
        "make": None,
    }
    seen = 0
    first = True
    while off:
        seen += 1
        if seen > _MAX_IFDS:
            raise ImageDecodeError("IFD chain too long")
        if off + 2 > len(blob):
            raise ImageDecodeError("IFD offset past end")
        (n,) = struct.unpack(bo + "H", blob[off : off + 2])
        if n > _MAX_ENTRIES:
            raise ImageDecodeError(f"implausible IFD entry count {n}")
        base = off + 2
        if base + 12 * n + 4 > len(blob):
            raise ImageDecodeError("IFD table past end")
        for i in range(n):
            e = blob[base + 12 * i : base + 12 * i + 12]
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            if typ not in _TYPE_SIZES:
                continue  # unknown value type: skip, per spec
            nbytes = _TYPE_SIZES[typ] * cnt
            if nbytes <= 4:
                raw = e[8 : 8 + nbytes]
            else:
                (voff,) = struct.unpack(bo + "I", e[8:12])
                if voff + nbytes > len(blob):
                    raise ImageDecodeError("value offset past end")
                raw = blob[voff : voff + nbytes]
            if not first:
                continue  # only IFD0 carries the primary-image tags
            if tag in (TAG_WIDTH, TAG_HEIGHT, TAG_ORIENTATION) and (
                len(raw) < _TYPE_SIZES[typ]
            ):
                # count 0 (or a short tail) on a value we must read
                raise ImageDecodeError(f"empty value for tag {tag}")
            if tag in (TAG_WIDTH, TAG_HEIGHT):
                if typ == 3:
                    (v,) = struct.unpack(bo + "H", raw[:2])
                elif typ == 4:
                    (v,) = struct.unpack(bo + "I", raw[:4])
                else:
                    raise ImageDecodeError(
                        f"dimension tag {tag} with type {typ}"
                    )
                out["width" if tag == TAG_WIDTH else "height"] = v
            elif tag == TAG_ORIENTATION and typ == 3:
                (v,) = struct.unpack(bo + "H", raw[:2])
                if not 1 <= v <= 8:
                    raise ImageDecodeError(f"orientation {v} out of range")
                out["orientation"] = v
            elif tag == TAG_MAKE and typ == 2:
                out["make"] = raw.split(b"\x00", 1)[0].decode(
                    "ascii", "replace"
                )
        (off,) = struct.unpack(
            bo + "I", blob[base + 12 * n : base + 12 * n + 4]
        )
        first = False
    return out
