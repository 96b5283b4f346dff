"""From-scratch PDF text extraction (structure-level parser).

PDFs are one of the largest real-world sources of training text, and
the extraction path is pure container logic: cross-reference table ->
trailer -> document catalog -> page tree -> per-page content streams
(FlateDecode per the stream dictionary) -> BT/ET text blocks -> Tj/TJ
string operators. This module implements that walk from the public
PDF 1.4 specification subset that text extractors actually touch:

- header + ``startxref`` discovery, classic xref tables (multiple
  sections, ``trailer`` dictionaries, /Prev chains),
- indirect object parsing (dictionaries, arrays, names, numbers,
  literal and hex strings, references), object streams excluded
  (classic layout only — the fixture writer emits it),
- content streams with optional /Filter /FlateDecode (stdlib zlib
  inflate, the same dependency the PNG decoder uses),
- text extraction from Tj and TJ operators inside BT/ET blocks with
  full literal-string unescaping (the 8 named escapes, octal escapes,
  line continuations) and hex strings.

The matching :func:`write_pdf` emits real, viewer-openable PDFs with
correct xref byte offsets — fixtures are genuine PDF syntax, so the
parser is exercised against the real layout, not a toy framing.

Malformed payloads raise :class:`PdfDecodeError` (graceful
degradation, like every codec kernel here).
"""

from __future__ import annotations

import re
import zlib

from history_collector_spark.functions.codec_errors import MediaDecodeError


class PdfDecodeError(MediaDecodeError):
    pass


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def _escape_pdf_string(s: bytes) -> bytes:
    out = bytearray()
    for b in s:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        elif b == 0x09:
            out += b"\\t"
        else:
            out.append(b)
    return bytes(out)


def write_pdf(pages: list, compress: bool = True) -> bytes:
    """``pages`` is a list of pages, each a list of text lines ->
    a complete one-font PDF 1.4 file with a correct xref table.
    Content streams are FlateDecode-compressed unless ``compress``
    is False."""
    objects: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append(b"0 -14 Td")
            ops.append(
                b"(" + _escape_pdf_string(line.encode("utf-8")) + b") Tj"
            )
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream, 6)
            head = (
                b"<< /Length " + str(len(stream)).encode()
                + b" /Filter /FlateDecode >>"
            )
        else:
            head = b"<< /Length " + str(len(stream)).encode() + b" >>"
        content_ids.append(
            add(head + b"\nstream\n" + stream + b"\nendstream")
        )
    pages_id = len(objects) + len(pages) + 1  # assigned after the pages
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Contents "
                + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
                + str(font).encode() + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    )
    if real_pages_id != pages_id:  # never an assert: survives python -O
        raise ValueError(
            f"/Pages id drifted: forward-computed {pages_id}, "
            f"assigned {real_pages_id} - page tree would dangle"
        )
    catalog = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# --------------------------------------------------------------------------
# object parser
# --------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d = self.data
        while self.pos < len(d):
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < len(d) and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                break

    def peek_raw(self, n: int) -> bytes:
        return self.data[self.pos : self.pos + n]

    def token(self) -> bytes:
        """Next regular token (name, number, keyword) or delimiter."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfDecodeError("unexpected end of PDF data")
        c = d[self.pos]
        if c == 0x3C and d[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            return b"<<"
        if c == 0x3E and d[self.pos : self.pos + 2] == b">>":
            self.pos += 2
            return b">>"
        if c in _DELIM:
            self.pos += 1
            return bytes([c])
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        if self.pos == start:
            raise PdfDecodeError(f"stray delimiter at {start}")
        return d[start : self.pos]

    def parse_object(self):
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfDecodeError("unexpected end of PDF object")
        c = d[self.pos]
        if c == 0x28:  # literal string
            return self._parse_literal_string()
        if d[self.pos : self.pos + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # hex string
            return self._parse_hex_string()
        if c == 0x5B:  # array
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos >= len(d):
                    raise PdfDecodeError("unterminated array")
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if c == 0x2F:  # name
            self.pos += 1
            start = self.pos
            while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
                self.pos += 1
            return ("name", d[start : self.pos].decode("latin-1"))
        tok = self.token()
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        # number, possibly an indirect reference "n g R"
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            raise PdfDecodeError(f"unexpected token {tok!r}")
        save = self.pos
        try:
            tok2 = self.token()
            tok3 = self.token()
            if tok3 == b"R" and not b"." in tok2:
                return ("ref", num, int(tok2))
        except (PdfDecodeError, ValueError):
            pass
        self.pos = save
        return num

    def _parse_dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.peek_raw(2) == b">>":
                self.pos += 2
                return out
            key = self.parse_object()
            if not (isinstance(key, tuple) and key[0] == "name"):
                raise PdfDecodeError("dictionary key is not a name")
            out[key[1]] = self.parse_object()

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                if e in b"nrtbf()\\":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f", 0x28: b"(",
                        0x29: b")", 0x5C: b"\\",
                    }[e]
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = 0
                    for _ in range(3):
                        if (
                            self.pos < len(d)
                            and 0x30 <= d[self.pos] <= 0x37
                        ):
                            val = val * 8 + (d[self.pos] - 0x30)
                            self.pos += 1
                        else:
                            break
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise PdfDecodeError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        digits = []
        while self.pos < len(d):
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:
                if len(digits) % 2:
                    digits.append(0x30)  # odd count: pad with 0
                return bytes(
                    int(chr(digits[i]) + chr(digits[i + 1]), 16)
                    for i in range(0, len(digits), 2)
                )
            if c in _WS:
                continue
            if not (chr(c) in "0123456789abcdefABCDEF"):
                raise PdfDecodeError("bad hex-string digit")
            digits.append(c)
        raise PdfDecodeError("unterminated hex string")


# --------------------------------------------------------------------------
# document walk
# --------------------------------------------------------------------------


def _parse_xref(data: bytes):
    """startxref -> {obj_num: offset}, trailer dict (with /Prev
    chains followed)."""
    tail = data[-200:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        raise PdfDecodeError("startxref not found")
    offsets: dict[int, int] = {}
    trailer: dict = {}
    xref_at = int(m.group(1))
    seen = set()
    while True:
        if xref_at in seen or xref_at >= len(data):
            raise PdfDecodeError("bad xref offset")
        seen.add(xref_at)
        lex = _Lexer(data, xref_at)
        if lex.token() != b"xref":
            raise PdfDecodeError("xref keyword missing (object streams "
                                 "unsupported)")
        # THIS section's Prev, not the merged view: trailer keys merge
        # newest-wins, but the /Prev chain must step per section or a
        # 3+-section incremental-update file stops one hop short
        section_prev = None
        while True:
            lex._skip_ws()
            if lex.peek_raw(7) == b"trailer":
                lex.pos += 7
                t = lex.parse_object()
                if not isinstance(t, dict):
                    raise PdfDecodeError("trailer is not a dictionary")
                section_prev = t.get("Prev")
                for k, v in t.items():
                    trailer.setdefault(k, v)
                break
            first = lex.token()
            count = lex.token()
            try:
                first_n, count_n = int(first), int(count)
            except ValueError:
                raise PdfDecodeError("bad xref subsection header")
            for k in range(count_n):
                lex._skip_ws()
                entry = lex.data[lex.pos : lex.pos + 18]
                if len(entry) < 18:
                    raise PdfDecodeError("truncated xref entry")
                lex.pos += 18
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n":
                    try:
                        offsets.setdefault(first_n + k, int(off))
                    except ValueError:
                        raise PdfDecodeError("corrupt xref offset digits")
                elif kind != b"f":
                    raise PdfDecodeError("bad xref entry type")
        if isinstance(section_prev, (int, float)) and int(
            section_prev
        ) not in seen:
            xref_at = int(section_prev)
            continue
        return offsets, trailer


def _load_object(data: bytes, offsets: dict, ref, _depth: int = 0):
    if not (isinstance(ref, tuple) and ref[0] == "ref"):
        return ref, None
    if _depth > 4:  # indirect-Length chains cannot legitimately nest
        raise PdfDecodeError("indirect reference chain too deep")
    num = ref[1]
    if num not in offsets:
        raise PdfDecodeError(f"object {num} missing from xref")
    lex = _Lexer(data, offsets[num])
    tok = lex.token()
    if tok != str(num).encode():
        raise PdfDecodeError(f"xref offset for {num} is wrong")
    lex.token()  # generation
    if lex.token() != b"obj":
        raise PdfDecodeError("obj keyword missing")
    obj = lex.parse_object()
    # stream payload?
    lex._skip_ws()
    stream = None
    if lex.peek_raw(6) == b"stream":
        lex.pos += 6
        if lex.peek_raw(2) == b"\r\n":
            lex.pos += 2
        elif lex.peek_raw(1) == b"\n":
            lex.pos += 1
        if not isinstance(obj, dict) or "Length" not in obj:
            raise PdfDecodeError("stream without /Length")
        length = obj["Length"]
        if isinstance(length, tuple):  # indirect length
            length, _ = _load_object(data, offsets, length, _depth + 1)
        if not isinstance(length, (int, float)) or int(length) < 0:
            raise PdfDecodeError("bad stream /Length")
        length = int(length)
        stream = data[lex.pos : lex.pos + length]
        if len(stream) < length:
            raise PdfDecodeError("stream payload truncated")
    return obj, stream


def _decode_stream(obj: dict, stream: bytes) -> bytes:
    filt = obj.get("Filter")
    if filt is None:
        return stream
    filters = filt if isinstance(filt, list) else [filt]
    for f in filters:
        if not (isinstance(f, tuple) and f[0] == "name"):
            raise PdfDecodeError("bad /Filter entry")
        if f[1] != "FlateDecode":
            raise PdfDecodeError(f"filter /{f[1]} not implemented")
        try:
            stream = zlib.decompress(stream)
        except zlib.error as ex:
            raise PdfDecodeError(f"FlateDecode failed: {ex}")
    return stream


_TEXT_OPS = (b"Tj", b"TJ")


def _extract_content_text(content: bytes) -> str:
    """Content stream -> concatenated Tj/TJ string text (reading
    order as emitted; positioning operators are not interpreted)."""
    lex = _Lexer(content)
    stack: list = []
    out: list[bytes] = []
    while True:
        lex._skip_ws()
        if lex.pos >= len(lex.data):
            break
        c = lex.data[lex.pos]
        if c in b"([</" or (0x30 <= c <= 0x39) or c in b"+-.":
            try:
                stack.append(lex.parse_object())
            except PdfDecodeError:
                raise
            continue
        op = lex.token()
        if op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                out.append(stack[-1])
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        out.append(el)
        stack.clear()
    return b"".join(out).decode("utf-8", "replace")


def extract_pdf_text(data: bytes) -> list[str]:
    """Full-document text extraction -> one string per page, in page
    tree order. Classic xref layout; raises PdfDecodeError on
    structural damage."""
    if not data.startswith(b"%PDF-"):
        raise PdfDecodeError("missing %PDF header")
    offsets, trailer = _parse_xref(data)
    root_ref = trailer.get("Root")
    if root_ref is None:
        raise PdfDecodeError("trailer has no /Root")
    catalog, _ = _load_object(data, offsets, root_ref)
    if not isinstance(catalog, dict):
        raise PdfDecodeError("catalog is not a dictionary")
    pages_obj, _ = _load_object(data, offsets, catalog.get("Pages"))
    texts: list[str] = []
    seen_nodes = [0]  # cycle guard: a mutated Kids ref can loop

    def walk(node):
        seen_nodes[0] += 1
        if seen_nodes[0] > 10_000:
            raise PdfDecodeError("page tree too deep (cycle?)")
        if not isinstance(node, dict):
            raise PdfDecodeError("page tree node is not a dictionary")
        ntype = node.get("Type")
        ntype = ntype[1] if isinstance(ntype, tuple) else None
        if ntype == "Pages":
            kids = node.get("Kids")
            if not isinstance(kids, list):
                raise PdfDecodeError("/Pages without /Kids")
            for kid_ref in kids:
                kid, _ = _load_object(data, offsets, kid_ref)
                walk(kid)
        elif ntype == "Page":
            contents = node.get("Contents")
            refs = contents if isinstance(contents, list) else [contents]
            page_text = []
            for ref in refs:
                if ref is None:
                    continue
                obj, stream = _load_object(data, offsets, ref)
                if stream is None:
                    raise PdfDecodeError("/Contents is not a stream")
                page_text.append(
                    _extract_content_text(_decode_stream(obj, stream))
                )
            texts.append("".join(page_text))
        else:
            raise PdfDecodeError(f"unexpected page tree type {ntype}")

    walk(pages_obj)
    return texts
