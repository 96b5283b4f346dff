"""From-scratch parser for the sitemaps.org XML protocol (urlset and
sitemapindex documents) — the URL-discovery input a crawler reads
right after robots.txt.

Deliberately NOT a general XML parser: the sitemap protocol needs
exactly tag open/close tracking for a known vocabulary, character
data, entity decoding, and tolerance of XML declarations, namespaces,
and comments. The tokenizer is total over arbitrary bytes in the
sense that every malformed input raises the declared
``SitemapParseError`` (mutation-fuzz-proven), never a raw slice or
decode error — one hostile sitemap costs an error row, not a task.

Entity decoding reuses the HTML extractor's table
(``functions/html_extract.unescape_entities``): the five XML
predefined entities are a subset of it, and sitemap generators in the
wild emit the HTML set anyway.
"""

from __future__ import annotations

import re

from history_collector_spark.functions.html_extract import (
    unescape_entities,
)


class SitemapParseError(ValueError):
    """Malformed sitemap XML."""


_TAG_RE = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9:_-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>")
_PRIORITY_RE = re.compile(r"^(0|1)(?:\.([0-9]{1,3}))?$")
_LASTMOD_RE = re.compile(r"^\d{4}-\d{2}-\d{2}")


def _strip_ns(name: str) -> str:
    return name.rsplit(":", 1)[-1].lower()


def parse_sitemap(text: str) -> dict:
    """Sitemap XML -> {kind: 'urlset'|'index', urls: [...], children:
    [...]}.

    urls entries are dicts with loc (entity-decoded), lastmod (date
    string or None), priority_milli (int 0..1000 or None); children
    are the loc strings of a sitemapindex. Unknown tags are skipped;
    unclosed or mis-nested known structure raises SitemapParseError."""
    # strip XML declaration / processing instructions / comments
    body = re.sub(r"<\?.*?\?>", "", text, flags=re.S)
    body = re.sub(r"<!--.*?-->", "", body, flags=re.S)
    root = None
    stack: list[str] = []
    cur: dict | None = None
    texts: dict[str, str] = {}
    capture: str | None = None
    buf: list[str] = []
    urls: list[dict] = []
    children: list[str] = []
    pos = 0
    for m in _TAG_RE.finditer(body):
        if capture is not None:
            buf.append(body[pos : m.start()])
        pos = m.end()
        closing, name, _attrs, selfclose = m.groups()
        tag = _strip_ns(name)
        if selfclose and not closing:
            continue
        if not closing:
            if root is None:
                if tag not in ("urlset", "sitemapindex"):
                    raise SitemapParseError(f"unexpected root <{tag}>")
                root = tag
                stack.append(tag)
                continue
            stack.append(tag)
            if tag in ("url", "sitemap"):
                if cur is not None:
                    raise SitemapParseError(f"nested <{tag}>")
                cur = {}
                texts = {}
            elif tag in ("loc", "lastmod", "changefreq", "priority"):
                capture = tag
                buf = []
        else:
            if not stack or stack[-1] != tag:
                raise SitemapParseError(f"mismatched </{tag}>")
            stack.pop()
            if capture == tag:
                if cur is None:
                    raise SitemapParseError(f"<{tag}> outside entry")
                texts[tag] = "".join(buf).strip()
                capture = None
            elif tag in ("url", "sitemap"):
                if cur is None:
                    raise SitemapParseError(f"stray </{tag}>")
                if "loc" not in texts:
                    raise SitemapParseError(f"<{tag}> without <loc>")
                loc = unescape_entities(texts["loc"])
                if tag == "sitemap":
                    if root != "sitemapindex":
                        raise SitemapParseError("<sitemap> under urlset")
                    children.append(loc)
                else:
                    if root != "urlset":
                        raise SitemapParseError("<url> under sitemapindex")
                    entry = {"loc": loc, "lastmod": None,
                             "priority_milli": None}
                    lm = texts.get("lastmod")
                    if lm is not None:
                        if not _LASTMOD_RE.match(lm):
                            raise SitemapParseError(f"bad lastmod {lm!r}")
                        entry["lastmod"] = lm[:10]
                    pr = texts.get("priority")
                    if pr is not None:
                        pm = _PRIORITY_RE.match(pr)
                        if not pm:
                            raise SitemapParseError(f"bad priority {pr!r}")
                        milli = int(pm.group(1)) * 1000 + int(
                            (pm.group(2) or "0").ljust(3, "0")
                        )
                        if milli > 1000:
                            raise SitemapParseError(f"priority {pr} > 1.0")
                        entry["priority_milli"] = milli
                    urls.append(entry)
                cur = None
    if root is None:
        raise SitemapParseError("no sitemap root element")
    if stack:
        raise SitemapParseError(f"unclosed <{stack[-1]}>")
    if capture is not None:
        raise SitemapParseError(f"unclosed <{capture}>")
    return {
        "kind": "index" if root == "sitemapindex" else "urlset",
        "urls": urls,
        "children": children,
    }


def render_sitemap(doc_id: int, source: str) -> str:
    """Deterministic fixture: doc_id%5==0 -> a 2-child sitemapindex,
    else a urlset with 3 + doc_id%3 urls carrying derived lastmod and
    priority (priority present on even url ordinals only; loc carries
    an &amp; that must decode)."""
    if doc_id % 5 == 0:
        subs = "".join(
            f"<sitemap><loc>https://{source}.example/map{doc_id}-{k}.xml"
            f"</loc></sitemap>"
            for k in range(2)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
            f'sitemap/0.9">{subs}</sitemapindex>'
        )
    n = 3 + doc_id % 3
    entries = []
    for k in range(n):
        pr = (
            f"<priority>0.{(doc_id + k) % 10}</priority>"
            if k % 2 == 0
            else ""
        )
        entries.append(
            f"<url><loc>https://{source}.example/p?id={doc_id}"
            f"&amp;k={k}</loc>"
            f"<lastmod>2024-0{1 + (doc_id + k) % 9}-11</lastmod>"
            f"{pr}<changefreq>daily</changefreq></url>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<!-- generator: fixture -->\n"
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(entries)
        + "</urlset>"
    )
