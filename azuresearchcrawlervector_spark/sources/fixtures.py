"""Deterministic fixture site graphs (pure Python, seed-stable).

Reproduces the shape of the reference's three checked-in fixture websites
(/root/reference/IntegrationTests/{TestWebsite,TestWebsite2,test-spa-website},
see FIXTURES.md §7) plus a hot-host skew graph for the politeness/salting
operators (P1/P2). The HTML for every page is GENERATED from the link
spec — anchors in order, noise <script>/<style>/<svg> blocks and
entity-encoded text so the extraction UDF (TextExtractor.cs:58-61
semantics) has real work to do.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


@dataclass
class PageSpec:
    url: str
    title: str
    body_text: str                      # human text (pre-entity-encoding)
    links: list[tuple[str, bool]]       # (href, in_selector_scope)
    status: int = 200
    image_id: str | None = None
    # links present ONLY in the JS-rendered DOM (S5: the reference's
    # headless mode crawls the rendered page, HeadlessBrowserCrawler.cs:
    # 127-150 — a static fetch never sees these)
    rendered_links: list[tuple[str, bool]] = field(default_factory=list)


@dataclass
class SiteGraph:
    name: str
    root: str
    pages: dict[str, PageSpec] = field(default_factory=dict)
    selector: str | None = None         # DOM selector the fixture exercises
    sitemap_urls: list[str] = field(default_factory=list)

    def add(self, spec: PageSpec):
        self.pages[spec.url] = spec


_NOISE = (
    "<script>var tracker = {id: 42, fire: function(){}};</script>"
    "<style>.hidden{display:none} body{margin:0}</style>"
    '<svg viewBox="0 0 10 10"><path d="M0 0 L10 10"/></svg>'
)


def render_html(spec: PageSpec, selector_cls: str | None = None,
                rendered: bool = False) -> str:
    """Generate the page HTML: title, noise blocks, entity-encoded text,
    anchors in link order. Links flagged in_selector are wrapped in
    <div class="{selector_cls}">. ``rendered=True`` produces the
    post-JS DOM: static links followed by the page's rendered_links
    (what the reference's headless browser sees)."""
    parts = [
        "<html><head>",
        f"<title>{spec.title}</title>",
        "</head><body>",
        _NOISE,
        f"<h1>{spec.title}</h1>",
        # entity-encoded text exercises HtmlDecode (TextExtractorTests.cs:161-173)
        f"<p>{spec.body_text.replace('&', '&amp;').replace('<', '&lt;')}</p>",
    ]
    # document order MUST equal spec order (link_pos ground truth): each
    # selector-scoped link gets its own wrapping div
    links = spec.links + (spec.rendered_links if rendered else [])
    for h, s in links:
        if selector_cls and s:
            parts.append(f'<div class="{selector_cls}"><a href="{h}">{h}</a></div>')
        else:
            parts.append(f'<a href="{h}">{h}</a>')
    # invalid hrefs every page — exercises F1 (HeadlessBrowserCrawler.cs:236-246)
    parts.append('<a href="#top">top</a><a href="javascript:void(0)">js</a>')
    parts.append('<a href="mailto:x@example.com">mail</a><a href="tel:+123">tel</a>')
    parts.append("</body></html>")
    return "".join(parts)


def expected_extraction(spec: PageSpec) -> tuple[str, str]:
    """Ground-truth (title, content) for the generated HTML — what the
    reference's TextExtractor would produce on render_html(spec)."""
    chunks = [spec.title, spec.body_text]
    for h, _s in spec.links:
        chunks.append(h)
    chunks += ["top", "js", "mail", "tel"]
    return spec.title, " ".join(c.strip() for c in chunks if c.strip())


def image_id_for(url: str) -> str:
    return f"img-{zlib.crc32(url.encode()) & 0xFFFFFFFF:08x}"


def caption_for(image_id: str) -> str:
    return f"synthetic caption for {image_id}"


def fmt_for(url: str) -> str:
    return "png" if zlib.crc32(url.encode()) % 2 == 0 else "jpeg"


def _page(site: SiteGraph, path: str, title: str, text: str,
          links: list[tuple[str, bool]], status: int = 200):
    url = site.root.rstrip("/") + path
    site.add(PageSpec(url=url, title=title, body_text=text, links=links,
                      status=status, image_id=image_id_for(url)))


def link_edges(g: SiteGraph) -> list[tuple[str, str]]:
    """The graph's internal link edges as (src_url, dst_url) — the ONE
    definition shared by the pagerank query, its VALUES oracle, and
    tests, so edge semantics cannot silently diverge between them.
    External links (targets not in the graph) are excluded."""
    return [(u, g.root + href) for u, p in g.pages.items()
            for href, _ in p.links if g.root + href in g.pages]


def test_website() -> SiteGraph:
    """TestWebsite: 17 pages, global nav, blog w/ selector div.blog-content
    (FIXTURES.md §7; reference IntegrationTests/TestWebsite/wwwroot/)."""
    g = SiteGraph(name="TestWebsite", root="http://testsite1.example.com",
                  selector="div.blog-content")
    nav = [("/", False), ("/about.html", False), ("/blog/", False),
           ("/products/", False), ("/contact.html", False)]
    posts = ["ai-and-webcrawling", "azure-search-integration",
             "crawling-optimization", "testing-web-crawlers"]
    _page(g, "/", "Home & Welcome", "Welcome to the test site <v1>", nav)
    _page(g, "/about.html", "About Us", "About page body text", nav)
    _page(g, "/blog/", "Blog Index",
          "All blog posts", nav + [(f"/blog/{p}.html", True) for p in posts])
    for i, p in enumerate(posts):
        cross = [(f"/blog/{posts[(i + 1) % len(posts)]}.html", True),
                 ("/products/product1.html", True)]
        _page(g, f"/blog/{p}.html", f"Post: {p}",
              f"Blog post about {p.replace('-', ' ')}", nav + cross)
    _page(g, "/products/", "Products", "Product catalog", nav +
          [("/products/product1.html", False), ("/products/product2.html", False)])
    _page(g, "/products/product1.html", "Product One", "First product", nav)
    _page(g, "/products/product2.html", "Product Two", "Second product", nav)
    contacts = [f"/contact/office{i}.html" for i in range(1, 9)]
    _page(g, "/contact.html", "Contact", "Contact channels", nav +
          [(c, False) for c in contacts])
    for i, c in enumerate(contacts, 1):
        _page(g, c, f"Office {i}", f"Office number {i}", nav)
    return g


def test_website2() -> SiteGraph:
    """TestWebsite2: 7 pages, full nav mesh, selector div.case-header."""
    g = SiteGraph(name="TestWebsite2", root="http://testsite2.example.com",
                  selector="div.case-header")
    mesh = [("/", False), ("/about.html", False), ("/services.html", False),
            ("/cases.html", False), ("/contact.html", False)]
    _page(g, "/", "W2 Home", "Second test site", mesh)
    _page(g, "/about.html", "W2 About", "About the agency", mesh)
    _page(g, "/services.html", "W2 Services", "Service list", mesh)
    _page(g, "/cases.html", "W2 Cases", "Case studies", mesh +
          [("/cases/ecommerce-giant.html", True), ("/cases/news-agency.html", True)])
    _page(g, "/cases/ecommerce-giant.html", "Case: Ecommerce", "Big shop case", mesh)
    _page(g, "/cases/news-agency.html", "Case: News", "News agency case", mesh)
    _page(g, "/contact.html", "W2 Contact", "Reach us", mesh)
    return g


def rendered_spa_site() -> SiteGraph:
    """SPA site whose navigation exists ONLY in the JS-rendered DOM:
    the root's static HTML has no anchors; the rendered DOM links to
    /app/alpha.html and /app/beta.html. Headless (rendered-DOM) crawling
    discovers them; a static-HTML crawl sees only the root (S5)."""
    g = SiteGraph(name="RenderedSpa", root="http://rspa.example.com")
    url = g.root + "/"
    g.add(PageSpec(url=url, title="RSPA Shell", body_text="app shell",
                   links=[], image_id=image_id_for(url),
                   rendered_links=[("/app/alpha.html", False),
                                   ("/app/beta.html", False)]))
    _page(g, "/app/alpha.html", "RSPA Alpha", "client route alpha",
          [("/app/beta.html", False)])
    _page(g, "/app/beta.html", "RSPA Beta", "client route beta", [])
    return g


def spa_website() -> SiteGraph:
    """SPA site: 3 URLs known only via sitemap.xml (no cross-links in
    static HTML — exercises sitemap mode)."""
    g = SiteGraph(name="SpaSite", root="http://spa.example.com")
    urls = ["/", "/blog/testing-dynamic-content", "/blog/crawling-spas"]
    for u in urls:
        _page(g, u if u != "/" else "/", f"SPA {u}", f"SPA page at {u}", [])
    g.sitemap_urls = [g.root + u for u in urls]
    return g


def broken_links_site() -> SiteGraph:
    """Small site with 404/500 rows — exercises F3 + retriability of
    failed fetches under seen_on=success (AbotCrawler.cs:136-146)."""
    g = SiteGraph(name="BrokenSite", root="http://broken.example.com")
    _page(g, "/", "B Home", "has broken links",
          [("/ok.html", False), ("/gone.html", False), ("/err.html", False)])
    _page(g, "/ok.html", "B OK", "fine page", [("/", False)])
    _page(g, "/gone.html", "B Gone", "not found", [], status=404)
    _page(g, "/err.html", "B Err", "server error", [], status=500)
    return g


def hot_host_graph(n_hosts: int = 10, n_urls: int = 2000,
                   hot_share: float = 0.9, fanout: int = 8) -> SiteGraph:
    """Skew fixture: one host holds hot_share of all URLs; every host is a
    k-ary link tree rooted at /  (validates P1 global budgets + P2 salting)."""
    g = SiteGraph(name="HotHost", root="http://host0.example.com")
    hot = int(n_urls * hot_share)
    rest = n_urls - hot
    per_cold = max(rest // max(n_hosts - 1, 1), 1)
    sizes = [hot] + [per_cold] * (n_hosts - 1)
    for hi, size in enumerate(sizes):
        root = f"http://host{hi}.example.com"
        for j in range(size):
            path = "/" if j == 0 else f"/p{j}.html"
            kids = [f"/p{j * fanout + k}.html"
                    for k in range(1, fanout + 1) if j * fanout + k < size]
            url = root + path
            g.add(PageSpec(url=url, title=f"h{hi} p{j}",
                           body_text=f"page {j} of host {hi}",
                           links=[(k, False) for k in kids],
                           image_id=image_id_for(url)))
    return g


ALL_FIXTURES = {
    "test_website": test_website,
    "test_website2": test_website2,
    "spa": spa_website,
    "broken": broken_links_site,
}
