"""Sources: deterministic synthetic fixture tables (pages/images/robots/
sitemaps — no external data, seed-stable) and the sitemap/robots parsers."""
