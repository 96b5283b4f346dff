"""From-scratch ZIP container reader (PKWARE APPNOTE layout).

ZIP is the other lingua-franca bundle format real corpora arrive in —
scanned-document drops, code datasets (GitHub exports), government
open-data portals. The reader implements the subset a corpus ingest
actually touches, directly from the public APPNOTE.TXT structures:

- End of Central Directory (EOCD) discovery by backward signature scan
  through the maximal 64 KiB comment tail,
- central-directory walk (the AUTHORITATIVE member list — local
  headers are deliberately untrusted for sizes/offsets, matching how
  real unzippers defend against desynced archives),
- local-file-header validation per member (signature + name match),
- compression methods 0 (stored) and 8 (DEFLATE, inflated with the
  same stdlib-zlib primitive the PNG/PDF decoders use — raw stream,
  wbits=-15),
- mandatory CRC-32 verification of every decoded member,
- data-descriptor members (general-purpose flag bit 3: sizes/CRC come
  from the central directory, which is always populated),
- UTF-8 name flag (bit 11) vs CP437 legacy names.

Out of scope, rejected cleanly: ZIP64 (signatures and 0xFFFFFFFF
sentinels), encryption (flag bit 0), every other compression method.
Multi-disk archives are rejected via the EOCD disk fields.

Fixtures are written with stdlib ``zipfile`` (the real encoder), so
every test run is a reference-encoder interop check — same posture as
the bz2/zstd/LZ4/Snappy ingest twins.

Reference parity note: like sources/warc.py (ISO 28500) and
sources/tarball.py (USTAR), this extends the reference's gzip-archive
ingestion boundary (kinecosystem/history-collector python/main.py
get_history_file) to the container formats public corpora actually
ship in.
"""

from __future__ import annotations

import struct
import zlib

from history_collector_spark.functions.codec_errors import MediaDecodeError


class ZipDecodeError(MediaDecodeError):
    pass


_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"
_ZIP64_LOC_SIG = b"PK\x06\x07"

_METHOD_STORED = 0
_METHOD_DEFLATE = 8

_FLAG_ENCRYPTED = 0x0001
_FLAG_DESCRIPTOR = 0x0008
_FLAG_UTF8 = 0x0800


def _find_eocd(data: bytes) -> int:
    """Offset of the EOCD record: last occurrence of the signature in
    the final 22 + 65535 bytes whose comment length is consistent with
    the file end (APPNOTE 4.3.16; the consistency check rejects
    signature bytes that merely appear inside a comment or payload)."""
    if len(data) < 22:
        raise ZipDecodeError("too short for a ZIP EOCD record")
    lo = max(0, len(data) - 22 - 65535)
    pos = data.rfind(_EOCD_SIG, lo)
    while pos != -1:
        if pos + 22 <= len(data):
            (clen,) = struct.unpack("<H", data[pos + 20 : pos + 22])
            if pos + 22 + clen == len(data):
                return pos
        pos = data.rfind(_EOCD_SIG, lo, pos)
    raise ZipDecodeError("no EOCD record found")


def parse_zip(data: bytes) -> list[dict]:
    """Archive bytes -> central-directory member list (files only,
    directory entries excluded), each a dict with name, method, flags,
    crc32, csize, usize, header_off, is_utf8. Raises ZipDecodeError on
    structural damage, ZIP64, encryption, or multi-disk archives."""
    eocd = _find_eocd(data)
    (disk, cd_disk, n_disk, n_total, cd_size, cd_off) = struct.unpack(
        "<HHHHII", data[eocd + 4 : eocd + 20]
    )
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        raise ZipDecodeError("multi-disk archives not supported")
    # ZIP64 detection: the sentinel values in the EOCD, or the ZIP64
    # EOCD locator that sits in the 20 bytes immediately before the
    # EOCD. Never scan the whole file for the signatures — compressed
    # member payloads can legitimately contain those 4 bytes.
    if (
        n_total == 0xFFFF
        or cd_size == 0xFFFFFFFF
        or cd_off == 0xFFFFFFFF
        or (eocd >= 20 and data[eocd - 20 : eocd - 16] == _ZIP64_LOC_SIG)
    ):
        raise ZipDecodeError("ZIP64 archives not supported")
    if cd_off + cd_size > eocd:
        raise ZipDecodeError("central directory overruns EOCD")
    pos = cd_off
    entries: list[dict] = []
    for _ in range(n_total):
        if data[pos : pos + 4] != _CEN_SIG:
            raise ZipDecodeError(f"bad central-directory signature at {pos}")
        (
            _ver_made, _ver_need, flags, method, _mtime, _mdate,
            crc, csize, usize, nlen, xlen, clen,
            _dstart, _iattr, _eattr, header_off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", data[pos + 4 : pos + 46])
        name_raw = data[pos + 46 : pos + 46 + nlen]
        if len(name_raw) != nlen:
            raise ZipDecodeError("truncated central-directory entry")
        is_utf8 = bool(flags & _FLAG_UTF8)
        name = name_raw.decode("utf-8" if is_utf8 else "cp437")
        pos += 46 + nlen + xlen + clen
        if pos > eocd:
            raise ZipDecodeError("central-directory entry overruns EOCD")
        if name.endswith("/") and usize == 0:
            continue  # directory marker
        entries.append(
            {
                "name": name,
                "method": method,
                "flags": flags,
                "crc32": crc,
                "csize": csize,
                "usize": usize,
                "header_off": header_off,
                "is_utf8": is_utf8,
            }
        )
    return entries


def read_zip_member(data: bytes, entry: dict) -> bytes:
    """Decode one member through its local header, with mandatory
    CRC-32 verification. Sizes and CRC always come from the CENTRAL
    directory entry — under flag bit 3 (data descriptor) the local
    header legitimately carries zeros, and in a desynced archive the
    local values are the forged ones."""
    off = entry["header_off"]
    if data[off : off + 4] != _LOC_SIG:
        raise ZipDecodeError(f"bad local header signature at {off}")
    flags, method = struct.unpack("<HH", data[off + 6 : off + 10])
    (nlen, xlen) = struct.unpack("<HH", data[off + 26 : off + 30])
    if flags & _FLAG_ENCRYPTED:
        raise ZipDecodeError("encrypted members not supported")
    if method != entry["method"]:
        raise ZipDecodeError(
            f"local/central method mismatch for {entry['name']!r}"
        )
    name_raw = data[off + 30 : off + 30 + nlen]
    want = entry["name"].encode("utf-8" if entry["is_utf8"] else "cp437")
    if name_raw != want:
        raise ZipDecodeError(
            f"local/central name mismatch for {entry['name']!r}"
        )
    start = off + 30 + nlen + xlen
    comp = data[start : start + entry["csize"]]
    if len(comp) != entry["csize"]:
        raise ZipDecodeError(f"member {entry['name']!r} truncated")
    if entry["method"] == _METHOD_STORED:
        if entry["csize"] != entry["usize"]:
            raise ZipDecodeError("stored member size mismatch")
        raw = comp
    elif entry["method"] == _METHOD_DEFLATE:
        try:
            d = zlib.decompressobj(-15)
            raw = d.decompress(comp) + d.flush()
        except zlib.error as exc:
            raise ZipDecodeError(
                f"DEFLATE error in {entry['name']!r}: {exc}"
            ) from exc
    else:
        raise ZipDecodeError(
            f"unsupported compression method {entry['method']}"
        )
    if len(raw) != entry["usize"]:
        raise ZipDecodeError(
            f"member {entry['name']!r} inflated to {len(raw)} bytes, "
            f"central directory says {entry['usize']}"
        )
    if zlib.crc32(raw) & 0xFFFFFFFF != entry["crc32"]:
        raise ZipDecodeError(f"CRC-32 mismatch in {entry['name']!r}")
    return raw


def iter_zip(data: bytes) -> list[tuple[str, bytes]]:
    """Archive bytes -> [(member name, decoded bytes)] in
    central-directory order."""
    return [(e["name"], read_zip_member(data, e)) for e in parse_zip(data)]
