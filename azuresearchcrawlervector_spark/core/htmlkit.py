"""HTML link + text extraction kernels (stdlib ``html.parser`` — no lxml
in this environment).

Reproduces the reference's extraction semantics:

- Title: first ``<title>`` element's text, HTML-entity-decoded, trimmed;
  first title wins on multi-title documents
  (``TextExtractor.cs:31-35``; multi-title test ``TextExtractorTests.cs:149-159``).
- Body text: everything under ``<body>`` except ``script|style|svg|path``
  subtrees; leaf text chunks are entity-decoded + trimmed, blank chunks
  dropped, joined with a single space; then ``[\\r\\n]+`` → " ",
  ``[ \\t]+`` → " ", final trim (``TextExtractor.cs:38-80``).
- Raw-HTML mode (extract_text=False): inner HTML of ``<body>`` passed
  through, scripts kept (``TextExtractor.cs:45-48``).
- Links: anchors in document order with their position and whether they
  fall inside a DOM-selector scope. The reference scopes headless
  extraction with ``"{sel} a[href]"`` (``HeadlessBrowserCrawler.cs:177-181``)
  and filters Abot-scheduled links by selector containment
  (``AbotCrawler.cs:68-88``). Selector support covers the subset the
  reference's fixtures use: ``tag``, ``.class``, ``tag.class``.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style", "svg", "path"})
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "source", "track", "wbr"}
)
_CRLF_RE = re.compile(r"[\r\n]+")
_SPACETAB_RE = re.compile(r"[ \t]+")


def _selector_parts(selector: str | None) -> tuple[str | None, str | None]:
    """Parse ``tag``, ``.class`` or ``tag.class`` → (tag, cls)."""
    if not selector or not selector.strip():
        return None, None
    sel = selector.strip()
    if "." in sel:
        tag, _, cls = sel.partition(".")
        return (tag.lower() or None), (cls or None)
    return sel.lower(), None


class _Extractor(HTMLParser):
    def __init__(self, sel_tag: str | None, sel_cls: str | None):
        super().__init__(convert_charrefs=False)
        self.sel_tag = sel_tag
        self.sel_cls = sel_cls
        self.has_selector = sel_tag is not None or sel_cls is not None
        self.title: str | None = None
        self._title_depth = 0
        self._title_buf: list[str] = []
        self._skip_depth = 0
        self._in_body = 0
        self._sel_depth = 0          # >0 while inside a selector-matched subtree
        self._stack: list[tuple[str, bool, bool]] = []  # (tag, was_skip, was_sel)
        self.text_chunks: list[str] = []
        self._pending_text: list[str] = []  # contiguous data+entities = ONE text node
        self.links: list[tuple[str, int, bool]] = []  # (href, link_pos, in_selector)
        self._link_pos = 0

    def _flush_text(self):
        """A tag boundary ends the current text node — entity references
        inside a node must NOT split it (DOM semantics: AngleSharp decodes
        entities within a single text node)."""
        if self._pending_text:
            chunk = unescape("".join(self._pending_text)).strip()
            self._pending_text.clear()
            if chunk:
                self.text_chunks.append(chunk)

    def _matches_selector(self, tag: str, attrs: dict[str, str | None]) -> bool:
        if not self.has_selector:
            return False
        if self.sel_tag is not None and tag != self.sel_tag:
            return False
        if self.sel_cls is not None:
            classes = (attrs.get("class") or "").split()
            if self.sel_cls not in classes:
                return False
        return True

    def handle_starttag(self, tag, attrs):
        self._flush_text()
        attrs_d = dict(attrs)
        if tag in _VOID_TAGS:
            return
        is_skip = tag in _SKIP_TAGS
        is_sel = self._matches_selector(tag, attrs_d)
        self._stack.append((tag, is_skip, is_sel))
        if is_skip:
            self._skip_depth += 1
        if is_sel:
            self._sel_depth += 1
        if tag == "title" and self.title is None:
            self._title_depth += 1
        if tag == "body":
            self._in_body += 1
        if tag == "a":
            href = attrs_d.get("href")
            if href is not None:
                self.links.append((href, self._link_pos, self._sel_depth > 0))
                self._link_pos += 1

    def handle_endtag(self, tag):
        self._flush_text()
        # pop back to the matching open tag, tolerating malformed nesting
        for i in range(len(self._stack) - 1, -1, -1):
            t, was_skip, was_sel = self._stack[i]
            if t == tag:
                for _t, s, sel in self._stack[i:]:
                    if s:
                        self._skip_depth -= 1
                    if sel:
                        self._sel_depth -= 1
                del self._stack[i:]
                break
        if tag == "title" and self._title_depth > 0:
            self._title_depth -= 1
            if self.title is None:
                self.title = unescape("".join(self._title_buf)).strip()
        if tag == "body" and self._in_body > 0:
            self._in_body -= 1

    def _text(self, data: str):
        if self._title_depth > 0 and self.title is None:
            self._title_buf.append(data)
            return
        if self._in_body > 0 and self._skip_depth == 0:
            self._pending_text.append(data)

    def handle_data(self, data):
        self._text(data)

    def handle_entityref(self, name):
        self._text(f"&{name};")

    def handle_charref(self, name):
        self._text(f"&#{name};")


def extract_page(
    html: str | None, selector: str | None = None
) -> tuple[str, str, list[tuple[str, int, bool]]]:
    """→ (title, content, links) with the reference's T1/T2/F5/F6 semantics.

    ``links`` is every anchor with an href attribute, in document order,
    as (href, link_pos, in_selector). When ``selector`` is None,
    ``in_selector`` is True for every link (no scoping — matches the
    reference's pass-through default, AbotCrawler.cs:80-83).
    """
    if html is None:
        return "", "", []
    sel_tag, sel_cls = _selector_parts(selector)
    p = _Extractor(sel_tag, sel_cls)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted (TextExtractorTests.cs:68,188)
    p._flush_text()
    if p.title is None and p._title_buf:
        p.title = unescape("".join(p._title_buf)).strip()
    title = p.title or ""
    content = " ".join(p.text_chunks)
    content = _CRLF_RE.sub(" ", content)
    content = _SPACETAB_RE.sub(" ", content).strip()
    if not p.has_selector:
        links = [(h, i, True) for (h, i, _s) in p.links]
    else:
        links = p.links
    return title, content, links


def extract_body_html(html: str | None) -> str:
    """Raw-HTML mode: inner HTML of <body>, scripts kept (T3,
    TextExtractor.cs:45-48)."""
    if not html:
        return ""
    m = re.search(r"<body[^>]*>(.*?)</body>", html, re.IGNORECASE | re.DOTALL)
    return m.group(1) if m else ""
