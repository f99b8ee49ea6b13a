"""azuresearchcrawlervector_spark — a PySpark-native URL-frontier + fetch
scheduler with the query/data-processing capabilities of the reference
crawler (lulielmo/AzureSearchCrawlerVector), re-expressed Spark-first.

Layout
------
core/       pure-Python kernels (no Spark imports) shared by the vectorized
            pandas UDFs and the golden-oracle simulator: URL canonicalization,
            xxhash64, HTML link/text extraction, PNG + fake-lossy codecs,
            deterministic pseudo-embeddings.
functions/  Arrow/pandas UDF wrappers + built-in-function compositions.
operators/  seen-sketch (Bloom), politeness scheduler, dedup family,
            similarity search.
sources/    synthetic fixture generator (pages/images/robots/sitemaps),
            sitemap/robots parsing.
plans/      the iterative frontier engine (BFS / DFS / sitemap traversal
            policies) + snapshot checkpointing.
streaming/  Structured Streaming variant of the page-processing stage.

Design stance (SURVEY.md §7.0): ONE engine, three traversal policies
expressed as priority keys over an explicit frontier table — not three
engines like the reference. All state lives in snapshot-versioned parquet
tables (Iceberg-style manifest; the Iceberg runtime jar is not available
offline); all per-row compute is vectorized pandas/Arrow UDFs; the driver
loop is the only imperative code.
"""

__version__ = "0.1.0"
