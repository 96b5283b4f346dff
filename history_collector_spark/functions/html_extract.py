"""From-scratch HTML main-content extraction.

The reference pipeline's parse stage (reference `python/main.py:263-266`)
turns raw ingested payloads into structured rows; at the web-corpus tier
the analogous operator is HTML -> main text: strip tags/scripts/styles/
comments, decode entities, segment the page into text blocks, and drop
boilerplate (navigation, headers, footers, link farms) by link density —
the classic text-density heuristic (Kohlschuetter et al., "Boilerplate
Detection Using Shallow Text Features", WSDM 2010; public method).

Design constraints:

- **Total**: `extract_main_text` never raises on any input string —
  malformed markup degrades to best-effort text (crawl payloads are
  adversarial; a parser exception would kill a Spark task instead of
  yielding a row). The mutation-fuzz sweep in tests/test_codec_fuzz.py
  pins this.
- **Deterministic & closed-form**: block segmentation and the
  link-density rule are exact integer/ratio arithmetic so fixtures can
  compute expected outputs in SQL (the DuckDB oracle twin).
- **From scratch**: no html.parser / html.unescape; the test suite
  cross-validates tag stripping against a stdlib-`html.parser` reference
  implementation the same way sources/tarball.py is cross-validated
  against stdlib tarfile.
"""

from __future__ import annotations

from dataclasses import dataclass

# Content of these elements is never page text — skipped wholesale up to
# the matching close tag (case-insensitive).
_SKIP_CONTENT = ("script", "style", "noscript", "textarea", "svg")

# Opening OR closing any of these flushes the current text block: they
# delimit visual blocks, which is the grain boilerplate detection needs.
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td
    th br hr section article header footer nav aside main blockquote pre
    form fieldset figure figcaption address title body html head option
    select""".split()
)

_NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}


def escape_html(text: str) -> str:
    """Minimal escaping for fixture generation (& first, then angles)."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _decode_entity(s: str, i: int) -> tuple[str, int]:
    """Decode the entity starting at ``s[i] == '&'``; returns
    (replacement, next_index). Unknown/malformed entities pass through
    as literal text (browser behavior, and keeps the function total)."""
    j = s.find(";", i + 1, i + 12)
    if j < 0:
        return "&", i + 1
    body = s[i + 1 : j]
    if body.startswith("#"):
        try:
            cp = (
                int(body[2:], 16)
                if body[1:2] in ("x", "X")
                else int(body[1:], 10)
            )
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                return chr(cp), j + 1
        except ValueError:
            pass
        return "&", i + 1
    rep = _NAMED_ENTITIES.get(body.lower())
    if rep is None:
        return "&", i + 1
    return rep, j + 1


def unescape_entities(s: str) -> str:
    """Decode named (&amp; &lt; &gt; &quot; &apos; &nbsp;) and numeric
    (&#97; &#x61;) entities; anything else is literal text."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "&":
            rep, i = _decode_entity(s, i)
            out.append(rep)
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _scan_tag(s: str, i: int) -> tuple[str, bool, int]:
    """Parse the tag starting at ``s[i] == '<'``. Returns
    (lowercased tag name, is_closing, index past '>'). Respects quoted
    attribute values so a literal '>' inside href="a>b" does not
    terminate the tag. Malformed tails consume to end-of-input."""
    n = len(s)
    j = i + 1
    closing = False
    if j < n and s[j] == "/":
        closing = True
        j += 1
    k = j
    while k < n and (s[k].isalnum() or s[k] in "-:"):
        k += 1
    name = s[j:k].lower()
    # attribute scan: quotes shield '>'
    quote = ""
    while k < n:
        c = s[k]
        if quote:
            if c == quote:
                quote = ""
        elif c in ('"', "'"):
            quote = c
        elif c == ">":
            return name, closing, k + 1
        k += 1
    return name, closing, n


@dataclass
class Block:
    """One visual text block with its link-density evidence."""

    text: str
    n_chars: int
    link_chars: int
    n_links: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.n_chars if self.n_chars else 0.0


def _flush(parts, link_chars, n_links, blocks) -> None:
    raw = "".join(parts)
    text = " ".join(raw.split())
    if text:
        blocks.append(
            Block(
                text=text,
                n_chars=len(text),
                # collapse-safe approximation: densities compare char
                # counts BEFORE whitespace collapse on both numerator
                # and denominator, so the ratio is consistent
                link_chars=min(link_chars, len(text)),
                n_links=n_links,
            )
        )


def parse_blocks(html: str) -> tuple[str, list[Block]]:
    """HTML -> (title, text blocks). Never raises.

    Comments, doctypes, processing instructions, and the content of
    script/style/noscript/textarea/svg are dropped; block-level tags
    flush the running block; anchor depth attributes each character to
    link or body text for the density classifier; entities decode via
    :func:`unescape_entities`; whitespace collapses per block.
    """
    n = len(html)
    i = 0
    low: str | None = None  # html.lower(), computed once on first use
    title_parts: list[str] = []
    in_title = False
    anchor_depth = 0
    parts: list[str] = []
    link_chars = 0
    n_links = 0
    blocks: list[Block] = []

    def emit(text: str) -> None:
        nonlocal link_chars
        if in_title:
            title_parts.append(text)
            return
        parts.append(text)
        if anchor_depth > 0:
            link_chars += len(" ".join(text.split()))

    while i < n:
        c = html[i]
        if c != "<":
            j = html.find("<", i)
            if j < 0:
                j = n
            emit(unescape_entities(html[i:j]))
            i = j
            continue
        if html.startswith("<!--", i):
            j = html.find("-->", i + 4)
            i = n if j < 0 else j + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            j = html.find(">", i + 2)
            i = n if j < 0 else j + 1
            continue
        if i + 1 < n and not (html[i + 1].isalpha() or html[i + 1] == "/"):
            # stray '<' that opens no tag: literal text
            emit("<")
            i += 1
            continue
        name, closing, i = _scan_tag(html, i)
        if not closing and name in _SKIP_CONTENT:
            close = f"</{name}"
            if low is None:  # one O(n) lower, not one per script tag
                low = html.lower()
            j = low.find(close, i)
            if j < 0:
                i = n
            else:
                _, _, i = _scan_tag(html, j)
            continue
        if name == "title":
            if not closing:
                in_title = True
            else:
                in_title = False
            continue
        if name == "a":
            if not closing:
                anchor_depth += 1
                n_links += 1
            elif anchor_depth > 0:
                anchor_depth -= 1
            continue
        if name in _BLOCK_TAGS:
            _flush(parts, link_chars, n_links, blocks)
            parts, link_chars, n_links = [], 0, 0
            if closing and name in ("body", "html"):
                anchor_depth = 0
            continue
        # inline / unknown tags contribute nothing and break no block
    _flush(parts, link_chars, n_links, blocks)
    title = " ".join("".join(title_parts).split())
    return title, blocks


def extract_main_text(
    html: str,
    max_link_density: float = 0.35,
    min_chars: int = 1,
) -> tuple[str, str, int, int]:
    """HTML -> (title, main_text, n_content_blocks, n_boilerplate_blocks).

    A block is content iff it is at least ``min_chars`` long AND its
    link density (chars inside <a> / total chars) is <= the threshold;
    content blocks join with a single space. Total: never raises.
    """
    title, blocks = parse_blocks(html)
    content, boiler = [], 0
    for b in blocks:
        if b.n_chars >= min_chars and b.link_density <= max_link_density:
            content.append(b.text)
        else:
            boiler += 1
    return title, " ".join(content), len(content), boiler


# ---------------------------------------------------------------------------
# Outlink + anchor-text extraction: the operator that feeds a crawl
# frontier (queries/crawl.py) from fetched pages, and the standard
# anchor-text retrieval/quality signal. Same totality contract as
# extract_main_text: never raises, malformed markup degrades.
# ---------------------------------------------------------------------------


def _scan_tag_with_attrs(
    s: str, i: int
) -> tuple[str, bool, dict[str, str], int]:
    """Like :func:`_scan_tag`, but also parses ``name=value`` attribute
    pairs (quoted or bare values; entity references inside values
    decode via :func:`unescape_entities`, per the HTML attribute-value
    grammar). First occurrence of an attribute wins. Returns
    (lowercased tag name, is_closing, attrs, index past '>')."""
    n = len(s)
    j = i + 1
    closing = False
    if j < n and s[j] == "/":
        closing = True
        j += 1
    k = j
    while k < n and (s[k].isalnum() or s[k] in "-:"):
        k += 1
    name = s[j:k].lower()
    attrs: dict[str, str] = {}
    while k < n:
        # skip whitespace / stray slashes between attributes
        while k < n and (s[k].isspace() or s[k] == "/"):
            k += 1
        if k >= n:
            break
        if s[k] == ">":
            return name, closing, attrs, k + 1
        a = k
        while k < n and not s[k].isspace() and s[k] not in ("=", ">", "/"):
            k += 1
        aname = s[a:k].lower()
        while k < n and s[k].isspace():
            k += 1
        val = ""
        if k < n and s[k] == "=":
            k += 1
            while k < n and s[k].isspace():
                k += 1
            if k < n and s[k] in ('"', "'"):
                q = s[k]
                k += 1
                v = k
                while k < n and s[k] != q:
                    k += 1
                val = s[v:k]
                k += 1  # past the closing quote (or end of input)
            else:
                v = k
                while k < n and not s[k].isspace() and s[k] != ">":
                    k += 1
                val = s[v:k]
        if aname and aname not in attrs:
            attrs[aname] = unescape_entities(val)
    return name, closing, attrs, n


def resolve_url(base: str, href: str) -> str:
    """RFC 3986-lite reference resolution, enough for crawl hrefs:
    absolute URLs pass through; ``//host/...`` adopts the base scheme;
    ``/path`` is root-relative; anything else merges with the base
    path's directory; ``.``/``..`` segments resolve by stack fold
    (mirroring the pure-Catalyst canonicalizer's dot-segment rule,
    queries/urls.py). Fragments are dropped (a crawler fetches the
    resource, not the anchor position). Total: returns '' for
    non-fetchable schemes (mailto:, javascript:, data:)."""
    h = href.strip()
    low = h.lower()
    for bad in ("mailto:", "javascript:", "data:", "tel:"):
        if low.startswith(bad):
            return ""
    # split off fragment
    frag = h.find("#")
    if frag >= 0:
        h = h[:frag]
    if not h:
        return base.split("#", 1)[0]
    scheme_end = h.find("://")
    if scheme_end > 0 and h[:scheme_end].isalpha():
        return h
    b = base.split("#", 1)[0]
    bscheme_end = b.find("://")
    bscheme = b[:bscheme_end] if bscheme_end > 0 else "http"
    rest = b[bscheme_end + 3 :] if bscheme_end > 0 else b
    slash = rest.find("/")
    bhost = rest if slash < 0 else rest[:slash]
    bpath = "" if slash < 0 else rest[slash:]
    bpath = bpath.split("?", 1)[0]
    if h.startswith("//"):
        return f"{bscheme}:{h}"
    if h.startswith("?"):
        # query-only reference: keep the base path (RFC 3986 §5.3)
        return f"{bscheme}://{bhost}{bpath or '/'}{h}"
    if h.startswith("/"):
        merged = h
    else:
        bdir = bpath[: bpath.rfind("/") + 1] if "/" in bpath else "/"
        merged = bdir + h
    path_q = merged.split("?", 1)
    segs = path_q[0].split("/")
    stack: list[str] = []
    for seg in segs:
        if seg == "..":
            if stack:
                stack.pop()
        elif seg in (".", ""):
            continue
        else:
            stack.append(seg)
    out = "/" + "/".join(stack)
    if path_q[0].endswith("/") and out != "/":
        out += "/"
    if len(path_q) > 1:
        out += "?" + path_q[1]
    return f"{bscheme}://{bhost}{out}"


def extract_links(html: str, base_url: str = "") -> list[tuple[str, str]]:
    """HTML -> ordered [(resolved_url, anchor_text)] for every
    ``<a href=...>`` in document order. Anchor text is the
    entity-decoded, whitespace-collapsed text up to the matching
    ``</a>`` (a new ``<a`` implicitly closes the previous one, per the
    HTML5 no-nested-anchors rule); script/style/comment content never
    contributes hrefs or text. Links whose href is empty or a
    non-fetchable scheme are dropped. Total: never raises."""
    n = len(html)
    i = 0
    low: str | None = None  # html.lower(), computed once on first use
    links: list[tuple[str, str]] = []
    cur_href: str | None = None
    cur_text: list[str] = []

    def close_anchor() -> None:
        nonlocal cur_href, cur_text
        if cur_href is not None:
            url = resolve_url(base_url, cur_href) if base_url else cur_href
            if url:
                links.append((url, " ".join("".join(cur_text).split())))
        cur_href, cur_text = None, []

    while i < n:
        c = html[i]
        if c != "<":
            j = html.find("<", i)
            if j < 0:
                j = n
            if cur_href is not None:
                cur_text.append(unescape_entities(html[i:j]))
            i = j
            continue
        if html.startswith("<!--", i):
            j = html.find("-->", i + 4)
            i = n if j < 0 else j + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            j = html.find(">", i + 2)
            i = n if j < 0 else j + 1
            continue
        if i + 1 < n and not (html[i + 1].isalpha() or html[i + 1] == "/"):
            if cur_href is not None:
                cur_text.append("<")
            i += 1
            continue
        name, closing, attrs, i = _scan_tag_with_attrs(html, i)
        if not closing and name in _SKIP_CONTENT:
            close = f"</{name}"
            if low is None:  # one O(n) lower, not one per script tag
                low = html.lower()
            j = low.find(close, i)
            if j < 0:
                i = n
            else:
                _, _, i = _scan_tag(html, j)
            continue
        if name == "a":
            close_anchor()  # implicit close on nested/repeated <a>
            if not closing:
                href = attrs.get("href")
                if href is not None and href.strip():
                    cur_href = href
            continue
        if name in _BLOCK_TAGS and cur_href is not None:
            # block boundary inside an anchor: keep collecting text
            # but add a separator so words don't fuse across blocks
            cur_text.append(" ")
    close_anchor()
    return links
