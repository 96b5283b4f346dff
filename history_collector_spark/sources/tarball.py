"""USTAR (POSIX.1-1988 tar) reader/writer from scratch — the other
container corpora commonly arrive in (model dumps, dataset releases).
512-byte headers (name@0:100, size as octal ASCII @124:12, typeflag
@156, magic 'ustar' @257), payload padded to 512-byte blocks, archive
terminated by two zero blocks. The test suite cross-checks both
directions against the stdlib ``tarfile`` module, so the from-scratch
framing is independently validated.

Reference parity note: container-boundary analogue of the reference's
gzip archive ingestion — LLM-pipeline extension tier.
"""

from __future__ import annotations


class TarParseError(ValueError):
    """Malformed tar payload."""


def _octal(v: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % v).encode() + b"\x00"


def write_tar(files: list[tuple[str, bytes]]) -> bytes:
    """(name, payload) pairs -> USTAR bytes."""
    out = bytearray()
    for name, payload in files:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError(f"name too long: {name!r}")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal(0o644, 8)  # mode
        hdr[108:116] = _octal(0, 8)  # uid
        hdr[116:124] = _octal(0, 8)  # gid
        hdr[124:136] = _octal(len(payload), 12)
        hdr[136:148] = _octal(0, 12)  # mtime: pinned for determinism
        hdr[148:156] = b" " * 8  # checksum placeholder (spaces)
        hdr[156] = ord("0")  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = (f"%06o" % chk).encode() + b"\x00 "
        out += hdr
        out += payload
        pad = (-len(payload)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """USTAR bytes -> (name, payload) pairs; validates the header
    checksum and framing."""
    out = []
    pos = 0
    n = len(data)
    while pos + 512 <= n:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:  # end-of-archive marker
            break
        stored = hdr[148:156]
        try:
            chk = int(stored.rstrip(b"\x00 ").strip() or b"0", 8)
        except ValueError as exc:
            raise TarParseError("bad checksum field") from exc
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if chk != calc:
            raise TarParseError(
                f"header checksum mismatch at offset {pos}"
            )
        try:
            name = hdr[0:100].split(b"\x00", 1)[0].decode()
        except UnicodeDecodeError as exc:
            raise TarParseError("non-UTF8 name field") from exc
        try:
            size = int(hdr[124:136].rstrip(b"\x00 ").strip() or b"0", 8)
        except ValueError as exc:
            raise TarParseError("bad size field") from exc
        body_start = pos + 512
        if body_start + size > n:
            raise TarParseError("truncated tar payload")
        if hdr[156] in (0, ord("0")):  # regular file
            out.append((name, data[body_start : body_start + size]))
        pos = body_start + size + ((-size) % 512)
    else:
        raise TarParseError("missing end-of-archive blocks")
    return out
