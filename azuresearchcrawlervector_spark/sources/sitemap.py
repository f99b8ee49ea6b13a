"""Sitemap / robots.txt discovery (SURVEY.md §2.1 S6/S7, §3.2).

Discovery is per-host METADATA work — a handful of small XML documents —
so it runs driver-side exactly like the reference's sequential probe loop
(SitemapCrawler.cs:204-274); the resulting URL list then feeds the
Spark fetch pipeline (the heavy stage). The XML/robots parsing kernels are
pure functions, reused by fixtures and tests.

Semantics reproduced:
- probe paths in fixed order, first success wins (S7, SitemapCrawler.cs:17-24)
- robots.txt: first "Sitemap:" line, case-insensitive, split on the FIRST
  colon only so "https://" survives (T7, SitemapCrawler.cs:221-229)
- namespace-aware parse, root localname dispatch urlset/sitemapindex
  (T8, SitemapCrawler.cs:103-117,240-257)
- sitemapindex recursion capped at depth 10 (SitemapCrawler.cs:59-63)
- circular-reference dedup, case-insensitive (J2, SitemapCrawler.cs:89-93)
- blank <loc> guard (F8, SitemapCrawler.cs:78-82,141-146)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..config import SITEMAP_RECURSION_CAP
from ..core.urls import canonicalize, sitemap_loc_normalize

SITEMAP_PROBE_PATHS = [
    "/sitemap.xml",
    "/sitemap_index.xml",
    "/sitemaps/sitemap.xml",
    "/sitemap/sitemap.xml",
    "/robots.txt",
]


def _localname(tag: str) -> str:
    return tag.rpartition("}")[2]


def parse_sitemap_xml(xml_text: str) -> tuple[str, list[str]] | None:
    """→ ("urlset"|"sitemapindex", [loc,...]) in document order, or None on
    malformed XML (warned + skipped by the caller)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return None
    locs = []
    for child in root:
        if _localname(child.tag) not in ("url", "sitemap"):
            continue
        for sub in child:
            if _localname(sub.tag) == "loc":
                text = (sub.text or "").strip()
                if text:  # F8 blank-loc guard
                    locs.append(text)
                break
    return kind, locs


def parse_robots_sitemap_line(robots_text: str) -> str | None:
    """First 'Sitemap:' line (case-insensitive), split on the first colon."""
    for line in robots_text.splitlines():
        if line.strip().lower().startswith("sitemap:"):
            return line.split(":", 1)[1].strip()
    return None


def discover_sitemap_urls(
    root_url: str, fetch: "callable", max_index_depth: int = SITEMAP_RECURSION_CAP
) -> list[str]:
    """Reference discovery loop: probe fixed paths, follow robots redirect,
    recurse into sitemapindex (depth cap + circular dedup), return page
    URLs in document order. ``fetch(url) -> str | None`` resolves a URL to
    its body (in the graft: a lookup in the sitemaps fixture table)."""
    root = canonicalize(None, root_url)
    if root is None:
        return []
    processed: set[str] = set()  # case-insensitive circular-ref dedup (J2)
    out: list[str] = []

    def process(sm_url: str, depth: int) -> bool:
        """→ True iff THIS document fetched AND parsed as a sitemap —
        a malformed/invalid-format body must NOT stop the probe loop
        (the reference continues to the next probe path on parse
        failure, SitemapCrawler.cs:240-257)."""
        if depth > max_index_depth:
            return False
        key = sm_url.lower()
        if key in processed:
            return False
        processed.add(key)
        body = fetch(sm_url)
        if body is None:
            return False
        parsed = parse_sitemap_xml(body)
        if parsed is None:
            return False
        kind, locs = parsed
        for loc in locs:
            # <loc> resolves against the crawl ROOT, not the sub-sitemap
            # URL — SitemapCrawler.ResolveUrl(rootUri, ...) semantics
            resolved = sitemap_loc_normalize(root, loc)
            if resolved is None:
                continue
            if kind == "sitemapindex":
                process(resolved, depth + 1)
            else:
                out.append(resolved)
        return True

    for probe in SITEMAP_PROBE_PATHS:
        probe_url = canonicalize(root, probe)
        if probe_url is None:
            continue
        body = fetch(probe_url)
        if body is None:
            continue
        if probe.endswith("robots.txt"):
            target = parse_robots_sitemap_line(body)
            if not target:
                continue
            resolved = sitemap_loc_normalize(root, target)
            if resolved is None:
                continue
            parsed_ok = process(resolved, 0)
        else:
            parsed_ok = process(probe_url, 0)
        if parsed_ok:
            return out  # first PARSED probe wins (SitemapCrawler.cs:259-261)
    return out


# -------------------------------------------------------- fixture builders
SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def make_urlset(urls: list[str]) -> str:
    rows = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset xmlns="{SM_NS}">{rows}</urlset>'


def make_sitemapindex(locs: list[str]) -> str:
    rows = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
    return f'<?xml version="1.0" encoding="UTF-8"?><sitemapindex xmlns="{SM_NS}">{rows}</sitemapindex>'
