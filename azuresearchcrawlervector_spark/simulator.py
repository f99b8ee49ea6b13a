"""Pure-Python reference simulator — the golden oracle for crawl ordering,
seen-set, and document output (FIXTURES.md §6; SURVEY.md §5 carry-over).

Implements the reference's §2.5 traversal semantics directly:

- STANDARD: FIFO-BFS schedule order = the single-thread-equivalent of
  Abot's FIFO frontier (AbotCrawler.cs:163-172), with the per-host
  politeness budget re-expressed exactly as the engine's P1 operator.
- HEADLESS: strict sequential DFS preorder with seen-on-success
  (HeadlessBrowserCrawler.cs:102-227; order asserted by the reference's
  own tests, HeadlessBrowserCrawlerTests.cs:343-348). Implemented as the
  literal recursion — NOT the engine's algorithm — so an engine/simulator
  match is meaningful evidence.
- SITEMAP: document order (SitemapCrawler.cs:127-133).

Shares the row-level kernels (canonicalize, extract_page, url filters)
with the engine via core/, so any divergence a test finds is in the
DATAFLOW, which is exactly what the oracle is for.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig, CrawlMode, SeenOn
from .core.htmlkit import extract_page
from .core.urls import canonicalize, host_of, href_is_crawlable
from .sources.fixtures import SiteGraph, render_html


@dataclass
class SimResult:
    visit_order: list[tuple[int, str, int]] = field(default_factory=list)  # (seq, url, depth)
    seen: set[str] = field(default_factory=set)
    documents: list[dict] = field(default_factory=list)
    attempted: int = 0


def _page_html(graph: SiteGraph, url: str,
               rendered: bool = False) -> tuple[int, str] | None:
    """``rendered=True`` = the post-JS DOM (S5) — what headless mode
    fetches; static HTML otherwise."""
    spec = graph.pages.get(url)
    if spec is None:
        return None
    cls = None
    if graph.selector and "." in graph.selector:
        cls = graph.selector.partition(".")[2]
    return spec.status, render_html(spec, cls, rendered=rendered)


def _extract_links(graph: SiteGraph, url: str, html: str, cfg: CrawlConfig):
    """(href, link_pos) list after selector + F1 + canonicalize + F2 filters."""
    _t, _c, links = extract_page(html, cfg.dom_selector)
    out = []
    root_host = host_of(url)
    for href, pos, in_sel in links:
        if cfg.dom_selector and not in_sel:
            continue
        if not href_is_crawlable(href):
            continue
        child = canonicalize(url, href)
        if child is None:
            continue
        if cfg.same_host_only and host_of(child) != root_host:
            continue
        out.append((child, pos))
    return out


def _emit_doc(res: SimResult, url: str, depth: int, html: str, cfg: CrawlConfig):
    title, content, _ = extract_page(html, cfg.dom_selector)
    seq = len(res.visit_order) + 1
    res.visit_order.append((seq, url, depth))
    if content:  # F4 empty-content skip
        res.documents.append(
            {"seq": seq, "url": url, "depth": depth, "title": title, "content": content}
        )


# --------------------------------------------------------------------- BFS
def simulate_standard(graph: SiteGraph, cfg: CrawlConfig,
                      robots_delay: dict[str, int] | None = None) -> SimResult:
    """Wave-based FIFO-BFS with per-host politeness budgets — mirrors the
    engine's wave algorithm step for step (the canonical O1 contract)."""
    res = SimResult()
    robots_delay = robots_delay or {}
    seeds = [canonicalize(None, cfg.root_url)]
    pending: dict[str, tuple] = {}  # url -> (priority, depth, path)
    for idx, u in enumerate(s for s in seeds if s):
        path = f"{idx:05d}"
        pending[u] = (f"{0:03d}|{path}", 0, path)
    seen: set[str] = set()
    fetched = 0
    while pending and fetched < cfg.max_pages:
        cand = sorted(pending.items(), key=lambda kv: kv[1][0])
        due, carry = [], {}
        if cfg.politeness:
            host_counts: dict[str, int] = {}
            for url, row in cand:
                h = host_of(url)
                delay = robots_delay.get(h, 100)
                budget = max(1, cfg.iter_window_ms // delay)
                if host_counts.get(h, 0) < budget:
                    host_counts[h] = host_counts.get(h, 0) + 1
                    due.append((url, row))
                else:
                    carry[url] = row
        else:
            due = cand
        remaining = cfg.max_pages - fetched
        overflow = due[remaining:]
        due = due[:remaining]
        for url, row in overflow:
            carry[url] = row
        wave_new: dict[str, tuple] = {}
        for url, (prio, depth, path) in due:
            page = _page_html(graph, url)
            ok = page is not None and page[0] == 200
            if ok:
                _emit_doc(res, url, depth, page[1], cfg)
            if cfg.seen_on_effective == SeenOn.SCHEDULE or ok:
                seen.add(url)
            if ok and depth < cfg.max_depth:
                for child, pos in _extract_links(graph, url, page[1], cfg):
                    cpath = f"{path}.{pos:05d}"
                    cprio = f"{depth + 1:03d}|{cpath}"
                    if child in seen or child in carry or child in wave_new:
                        continue
                    # also dedupe vs URLs due in this same wave (they enter
                    # seen above before children are merged)
                    wave_new[child] = (cprio, depth + 1, cpath)
        fetched += len(due)
        # drop children that became seen later in the wave loop
        for u in list(wave_new):
            if u in seen:
                del wave_new[u]
        carry.update(wave_new)
        pending = carry
    res.seen = seen
    res.attempted = fetched
    return res


# --------------------------------------------------------------------- DFS
def simulate_headless(graph: SiteGraph, cfg: CrawlConfig) -> SimResult:
    """Literal recursive DFS preorder (HeadlessBrowserCrawler.cs:102-227):
    depth guard, maxPages on SUCCESSFUL visits, seen on success only,
    link extraction suppressed at depth == maxDepth."""
    res = SimResult()
    seen: set[str] = set()

    def visit(url: str, depth: int):
        if depth > cfg.max_depth:          # :104-107
            return
        if len(seen) >= cfg.max_pages:     # :109-113
            return
        if url in seen:                    # :114-118
            return
        page = _page_html(graph, url, rendered=True)  # S5: post-JS DOM
        if page is None or page[0] != 200:  # :127-143 non-OK skip, retriable
            return
        seen.add(url)                      # :161 — only after successful fetch
        _emit_doc(res, url, depth, page[1], cfg)
        if depth >= cfg.max_depth:         # :171-175 fetch but don't extract
            return
        for child, _pos in _extract_links(graph, url, page[1], cfg):
            visit(child, depth + 1)        # :218-227 sequential preorder

    root = canonicalize(None, cfg.root_url)
    if root:
        visit(root, 0)
    res.seen = seen
    res.attempted = len(res.visit_order)
    return res


# ------------------------------------------------------------------ sitemap
def simulate_sitemap(graph: SiteGraph, cfg: CrawlConfig) -> SimResult:
    """Document-order fetch of the graph's sitemap URL list
    (SitemapCrawler.cs:127-189): same-host filter, per-URL failures
    skipped, maxPages cap on processed pages."""
    res = SimResult()
    seen: set[str] = set()
    root_host = host_of(canonicalize(None, cfg.root_url))
    processed = 0
    for loc in graph.sitemap_urls:
        if processed >= cfg.max_pages:      # :135-139
            break
        url = canonicalize(None, loc)
        if url is None:                     # :148-157
            continue
        if host_of(url) != root_host:       # :159-163 same-host filter
            continue
        if url in seen:                     # intentional divergence: the
            continue                        # engine dedupes repeated <loc>s
        page = _page_html(graph, url)
        if page is None or page[0] != 200:  # :183-187 per-URL failure skip
            continue
        seen.add(url)
        _emit_doc(res, url, 0, page[1], cfg)
        processed += 1
    res.seen = seen
    res.attempted = processed
    return res


def simulate(graph: SiteGraph, cfg: CrawlConfig, **kw) -> SimResult:
    if cfg.mode == CrawlMode.STANDARD:
        return simulate_standard(graph, cfg, **kw)
    if cfg.mode == CrawlMode.HEADLESS:
        return simulate_headless(graph, cfg)
    return simulate_sitemap(graph, cfg)
