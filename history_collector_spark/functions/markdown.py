"""From-scratch Markdown -> text cleaning kernel.

The markdown sibling of functions/html_extract.py: a large share of a
code/docs-heavy training corpus arrives as Markdown (READMEs, wikis,
forum exports), and the standard cleaning transform recovers the prose
stream while dropping fenced code and markup sugar. Subset handled
(the constructs the fixture renderer emits, each a real CommonMark
construct): ATX headings, fenced code blocks, unordered/ordered list
markers, blockquote markers, emphasis (*x*, **x**, _x_), inline code
spans, links [text](url) (anchor text kept, target counted), images
![alt](url) (alt kept). Total: never raises on any input string.

Like the HTML kernel, extraction is built to INVERT the deterministic
fixture renderer exactly, so DuckDB oracles can state expected output
closed-form over `documents` without ever parsing Markdown.
"""

from __future__ import annotations

import re

_FENCE_RE = re.compile(r"^\s*```")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_LIST_RE = re.compile(r"^\s*(?:[-*+]|\d+\.)\s+(.*)$")
_QUOTE_RE = re.compile(r"^\s*>\s?(.*)$")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*")
# CommonMark: intraword underscores do NOT open emphasis
# (snake_case identifiers survive cleaning untouched)
_EMPH_RE = re.compile(
    r"\*([^*]+)\*|(?<![A-Za-z0-9_])_([^_]+)_(?![A-Za-z0-9_])"
)
_CODE_RE = re.compile(r"`([^`]*)`")


def markdown_to_text(md: str) -> dict:
    """Markdown -> {title, text, n_links, n_images, n_code_blocks,
    n_headings, n_list_items}.

    ``title`` is the first heading's text; later headings join the
    body stream. Fenced code blocks are dropped wholesale (counted);
    inline code keeps its content. The body joins line texts with
    single spaces and collapses whitespace, so a renderer emitting a
    word stream across paragraphs/lists gets the identical stream
    back."""
    title = ""
    parts: list[str] = []
    n_links = n_images = n_code_blocks = n_headings = n_items = 0
    in_fence = False
    for line in md.split("\n"):
        if _FENCE_RE.match(line):
            if not in_fence:
                n_code_blocks += 1
            in_fence = not in_fence
            continue
        if in_fence:
            continue
        m = _HEADING_RE.match(line)
        if m:
            n_headings += 1
            if not title:
                title = " ".join(m.group(2).split())
                continue
            line = m.group(2)
        else:
            m = _LIST_RE.match(line)
            if m:
                n_items += 1
                line = m.group(1)
            else:
                m = _QUOTE_RE.match(line)
                if m:
                    line = m.group(1)

        def img(mo: re.Match) -> str:
            nonlocal n_images
            n_images += 1
            return mo.group(1)

        def link(mo: re.Match) -> str:
            nonlocal n_links
            n_links += 1
            return mo.group(1)

        line = _IMAGE_RE.sub(img, line)
        line = _LINK_RE.sub(link, line)
        line = _BOLD_RE.sub(r"\1", line)
        line = _EMPH_RE.sub(lambda mo: mo.group(1) or mo.group(2), line)
        line = _CODE_RE.sub(r"\1", line)
        if line.strip():
            parts.append(line)
    text = " ".join(" ".join(parts).split())
    return {
        "title": title,
        "text": text,
        "n_links": n_links,
        "n_images": n_images,
        "n_code_blocks": n_code_blocks,
        "n_headings": n_headings,
        "n_list_items": n_items,
    }


def render_markdown(doc_id: int, text: str) -> str:
    """Deterministic document -> Markdown page (fixture side). The
    word stream survives extraction EXACTLY: every construct either
    wraps a word (emphasis/link/code keep content) or adds droppable
    structure (heading handled as title, fences dropped, markers
    stripped). Assumes plain [a-z0-9 .,] words (the synthetic corpus;
    asserted), so no metacharacter escaping is needed."""
    assert not re.search(r"[^a-z0-9 .,]", text), "renderer needs plain text"
    words = text.split(" ")

    def style(j: int, w: str) -> str:
        if j % 11 == 0:
            return f"[{w}](http://md.example/w/{j})"
        if j % 7 == 0:
            return f"**{w}**"
        if j % 5 == 0:
            return f"*{w}*"
        if j % 13 == 0:
            return f"`{w}`"
        return w

    styled = [style(j, w) for j, w in enumerate(words)]

    def para_safe(line: str) -> str:
        # A plain paragraph whose first token is a bare "12."-style
        # word would read back as an ordered-list marker (the
        # extractor's _LIST_RE handles \d+\. because real CommonMark
        # does) and be stripped, silently breaking the byte-exact
        # inversion. Today this is unreachable — every line-initial
        # word index is a multiple of 5, so style() always wraps it —
        # but that invariant lives in per_para/item-width constants,
        # so guard it live: emphasis-wrap the token (emphasis content
        # survives extraction exactly, and "*12.*" matches no marker).
        if re.match(r"\d+\.(\s|$)", line):
            first, _, rest = line.partition(" ")
            line = f"*{first}*" + (f" {rest}" if rest else "")
        return line

    out = [f"# Doc {doc_id}", ""]
    per_para = 30
    for p0 in range(0, len(styled), per_para):
        para_no = p0 // per_para
        chunk = styled[p0 : p0 + per_para]
        if para_no % 3 == 2:
            # every third paragraph is a list, 10 words per item
            for i0 in range(0, len(chunk), 10):
                out.append("- " + " ".join(chunk[i0 : i0 + 10]))
        elif para_no % 3 == 1:
            out.append("> " + " ".join(chunk))
        else:
            out.append(para_safe(" ".join(chunk)))
        out.append("")
        if para_no == 0:
            out += ["```", f"junk = fake(*md*) [not](a-link) {doc_id}",
                    "```", ""]
    if doc_id % 2 == 1:
        out += ["```", "tail code block", "```", ""]
    return "\n".join(out)
