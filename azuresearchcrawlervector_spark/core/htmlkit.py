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
  (``AbotCrawler.cs:68-88``). The selector engine covers the CSS subset
  the reference's own suites exercise (AngleSharp/Playwright
  QuerySelectorAll): compound selectors ``tag#id.a.b[attr*=v]``,
  attribute operators ``= *= ^= $= ~= |=`` and bare presence,
  descendant and child (``>``) combinators, and comma-separated lists —
  including the integration suite's ``div[class*="blog-teaser"]``
  (``TestWebsiteIntegrationTests.cs:306``).
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


# --------------------------------------------------------- CSS selectors
class _Simple:
    """One compound selector: tag + #ids + .classes + [attr op value]s."""

    __slots__ = ("tag", "ids", "classes", "attrs")

    def __init__(self, tag, ids, classes, attrs):
        self.tag = tag          # str | None ('*' → None)
        self.ids = ids          # list[str]
        self.classes = classes  # list[str]
        self.attrs = attrs      # list[(name, op|None, value|None)]

    def matches(self, tag: str, attrs: dict[str, str | None]) -> bool:
        if self.tag is not None and tag != self.tag:
            return False
        if self.ids and any(attrs.get("id") != i for i in self.ids):
            return False
        if self.classes:
            classes = (attrs.get("class") or "").split()
            if any(c not in classes for c in self.classes):
                return False
        for name, op, val in self.attrs:
            if name not in attrs:
                return False
            if op is None:
                continue
            a = attrs.get(name) or ""
            if op == "=" and a != val:
                return False
            if op == "*=" and val not in a:
                return False
            if op == "^=" and not a.startswith(val):
                return False
            if op == "$=" and not a.endswith(val):
                return False
            if op == "~=" and val not in a.split():
                return False
            if op == "|=" and not (a == val or a.startswith(val + "-")):
                return False
        return True


_QUAL_RE = re.compile(r"#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]")
_ATTR_RE = re.compile(r"^\s*([\w-]+)\s*(?:([*^$~|]?=)\s*(.*?)\s*)?$")
_COMPOUND_RE = re.compile(r"^([a-zA-Z][\w-]*|\*)?((?:#[\w-]+|\.[\w-]+|\[[^\]]*\])*)$")


def _parse_compound(text: str) -> _Simple | None:
    m = _COMPOUND_RE.match(text)
    if not m or (not m.group(1) and not m.group(2)):
        return None
    tag = m.group(1)
    tag = None if tag in (None, "*") else tag.lower()
    ids, classes, attrs = [], [], []
    for qm in _QUAL_RE.finditer(m.group(2) or ""):
        if qm.group(1):
            ids.append(qm.group(1))
        elif qm.group(2):
            classes.append(qm.group(2))
        else:
            am = _ATTR_RE.match(qm.group(3))
            if am is None:
                return None
            name, op, val = am.group(1).lower(), am.group(2), am.group(3)
            if val is not None and len(val) >= 2 and val[0] in "'\"" and val[-1] == val[0]:
                val = val[1:-1]
            attrs.append((name, op, val))
    return _Simple(tag, ids, classes, attrs)


def parse_selector(selector: str | None) -> list[list[tuple[str, _Simple]]] | None:
    """CSS selector list → chains of (combinator, compound); combinator
    is ' ' (descendant) or '>' (child); the first compound's combinator
    is ' '. Returns None for an empty selector (no scoping). Raises
    ValueError on syntax outside the supported subset — a selector that
    silently matched everything (or nothing) would corrupt a crawl's
    link discovery without a trace."""
    if not selector or not selector.strip():
        return None
    chains = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            raise ValueError(f"empty selector in list: {selector!r}")
        toks = re.split(r"\s*(>)\s*|\s+", part)
        chain: list[tuple[str, _Simple]] = []
        comb = " "
        for tok in toks:
            if tok is None or tok == "":
                continue
            if tok == ">":
                comb = ">"
                continue
            simple = _parse_compound(tok)
            if simple is None:
                raise ValueError(f"unsupported CSS selector: {part!r}")
            chain.append((comb, simple))
            comb = " "
        if not chain:
            raise ValueError(f"unsupported CSS selector: {part!r}")
        chains.append(chain)
    return chains


class _Extractor(HTMLParser):
    def __init__(self, chains: list[list[tuple[str, _Simple]]] | None):
        super().__init__(convert_charrefs=False)
        self.chains = chains
        self.has_selector = chains is not None
        self.title: str | None = None
        self._title_depth = 0
        self._title_buf: list[str] = []
        self._skip_depth = 0
        self._in_body = 0
        self._sel_depth = 0          # >0 while inside a selector-matched subtree
        # ancestor prefix-match counts: (chain_idx, prefix_idx) → #open
        # elements completing that selector prefix
        self._prefix: dict[tuple[int, int], int] = {}
        # stack: (tag, was_skip, completed prefixes, fully_matched)
        self._stack: list[tuple[str, bool, list[tuple[int, int]], bool]] = []
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

    def _match_chains(self, tag, attrs_d, parent_completed):
        """→ (completed prefixes, any chain fully matched). A prefix i
        completes on this element when the element matches compound i and
        the combinator's context holds: descendant → some open ancestor
        completed prefix i-1; child → the immediate parent did."""
        completed: list[tuple[int, int]] = []
        full = False
        for ci, chain in enumerate(self.chains):
            for i, (comb, simple) in enumerate(chain):
                if i > 0:
                    if comb == ">":
                        if (ci, i - 1) not in parent_completed:
                            continue
                    elif self._prefix.get((ci, i - 1), 0) <= 0:
                        continue
                if simple.matches(tag, attrs_d):
                    completed.append((ci, i))
                    if i == len(chain) - 1:
                        full = True
        return completed, full

    def handle_starttag(self, tag, attrs):
        self._flush_text()
        attrs_d = dict(attrs)
        if tag in _VOID_TAGS:
            return
        is_skip = tag in _SKIP_TAGS
        completed: list[tuple[int, int]] = []
        is_sel = False
        if self.has_selector:
            parent_completed = self._stack[-1][2] if self._stack else []
            completed, is_sel = self._match_chains(tag, attrs_d, parent_completed)
            for key in completed:
                self._prefix[key] = self._prefix.get(key, 0) + 1
        self._stack.append((tag, is_skip, completed, is_sel))
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
            t, _was_skip, _c, _sel = self._stack[i]
            if t == tag:
                for _t, s, comp, sel in self._stack[i:]:
                    if s:
                        self._skip_depth -= 1
                    if sel:
                        self._sel_depth -= 1
                    for key in comp:
                        self._prefix[key] -= 1
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
    p = _Extractor(parse_selector(selector))
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
