"""URL canonicalization + link-shape filtering kernels.

Semantics reproduce the reference's .NET ``Uri`` behavior where the
reference relies on it (SURVEY.md §2.6 T6):

- absolute-ize relative hrefs against the parent URL
  (``HeadlessBrowserCrawler.cs:204``; ``SitemapCrawler.cs:40-55``)
- scheme + host lowercased, default port (80/443) removed
- empty path on a root URL becomes "/" (tests in the reference assert
  ``http://example.com`` → ``http://example.com/``,
  ``HeadlessBrowserCrawlerTests.cs:116,177``)
- fragments dropped (``#...`` links are filtered before ever joining)

Link-shape filter reproduces ``HeadlessBrowserCrawler.cs:236-246`` (F1):
keep an href only if it is non-empty, not ``#...``/``javascript:``/
``mailto:``/``tel:``, and is ``http://``-, ``https://``- or ``/``-shaped.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_BAD_PREFIXES = ("javascript:", "mailto:", "tel:")
_DEFAULT_PORTS = {"http": 80, "https": 443}


def href_is_crawlable(href: str | None) -> bool:
    """F1: the reference's scheme/shape filter, HeadlessBrowserCrawler.cs:236-246."""
    if not href:
        return False
    h = href.strip()
    if not h or h.startswith("#"):
        return False
    low = h.lower()
    if any(low.startswith(p) for p in _BAD_PREFIXES):
        return False
    return low.startswith("http://") or low.startswith("https://") or h.startswith("/")


def canonicalize(parent_url: str | None, href: str | None) -> str | None:
    """Absolute-ize ``href`` against ``parent_url`` and normalize.

    Returns None on malformed input (the F7 malformed-URL guard — callers
    drop NULLs and count them in metrics, SitemapCrawler.cs:148-157).
    """
    if href is None:
        return None
    try:
        absolute = urljoin(parent_url, href.strip()) if parent_url else href.strip()
        scheme, netloc, path, query, _frag = urlsplit(absolute)
        scheme = scheme.lower()
        if scheme not in ("http", "https"):
            return None
        host, sep, port = netloc.partition(":")
        host = host.lower()
        if not host:
            return None
        if sep:
            try:
                port_i = int(port)
            except ValueError:
                return None
            if port_i != _DEFAULT_PORTS[scheme]:
                host = f"{host}:{port_i}"
        if not path:
            path = "/"
        return urlunsplit((scheme, host, path, query, ""))
    except ValueError:
        return None


def host_of(url: str | None) -> str | None:
    """Lower-cased host (without default port) of an already-canonical URL."""
    if not url:
        return None
    try:
        netloc = urlsplit(url).netloc
    except ValueError:
        return None
    return netloc.partition(":")[0].lower() or None


def sitemap_loc_normalize(base_url: str, loc: str) -> str | None:
    """Sitemap <loc> normalization: the reference trims leading '.' and
    ensures a leading '/' on relative locs before resolving
    (SitemapCrawler.cs:40-55)."""
    loc = (loc or "").strip()
    if not loc:
        return None
    if not (loc.startswith("http://") or loc.startswith("https://")):
        loc = loc.lstrip(".")
        if not loc.startswith("/"):
            loc = "/" + loc
    return canonicalize(base_url, loc)
