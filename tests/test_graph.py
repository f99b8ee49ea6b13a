"""PageRank (operators/graph.py): golden parity, invariants, scale
shape."""
import pytest
from pyspark.sql import functions as F

from azuresearchcrawlervector_spark.operators.graph import (
    pagerank, pagerank_local)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_matches_local_golden(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = _run(spark, edges, iters=15)
    want = pagerank_local(edges, iters=15)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_ranks_sum_to_one_with_dangling(spark):
    # 'sink' has no out-edges: its mass must be redistributed, keeping
    # the distribution normalized
    edges = [("a", "sink"), ("b", "sink"), ("a", "b")]
    got = _run(spark, edges, iters=25)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["sink"] == max(got.values())


def test_duplicate_edges_and_self_loops_ignored(spark):
    base = [("a", "b"), ("b", "a")]
    noisy = base + [("a", "b")] * 5 + [("a", "a")]
    assert _run(spark, noisy) == pytest.approx(_run(spark, base))


def test_symmetric_cycle_is_uniform(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _run(spark, edges, iters=30)
    for v in got.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-9)


def test_fixture_site_ranks(spark):
    # the flagship fixture's link graph: blog posts cross-link, so
    # product1 (linked from every post) outranks leaf products
    from azuresearchcrawlervector_spark.sources.fixtures import (
        link_edges, test_website)
    g = test_website()
    edges = link_edges(g)
    got = _run(spark, edges, iters=20)
    want = pagerank_local(edges, iters=20)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # every page carries the global nav -> a nav target dominates
    assert max(got, key=got.get).startswith(g.root)
    nav = {g.root + p for p in
           ("/", "/about.html", "/blog/", "/products/", "/contact.html")}
    assert max(got, key=got.get) in nav


def test_rank_priorities_from_crawl_log(spark, tmp_ckpt):
    # end-to-end: crawl the fixture site, rank its own frontier_log,
    # check the priority contract (lexicographic asc == rank desc)
    from azuresearchcrawlervector_spark.config import CrawlConfig, CrawlMode
    from azuresearchcrawlervector_spark.operators.graph import rank_priorities
    from azuresearchcrawlervector_spark.plans.crawl import CrawlEngine
    from azuresearchcrawlervector_spark.sources.fixtures import test_website
    from azuresearchcrawlervector_spark.sources.synthetic import pages_df

    g = test_website()
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD)
    eng = CrawlEngine(spark, pages_df(spark, g), cfg, tmp_ckpt,
                      validate_images=False)
    res = eng.run()
    log = res.frontier_log(spark)
    pr = rank_priorities(log, iters=10).collect()
    assert len(pr) > 5
    by_prio = sorted(pr, key=lambda r: (r["priority"], r["url"]))
    ranks = [r["rank"] for r in by_prio]
    assert ranks == sorted(ranks, reverse=True)
    urls = {r["url"] for r in pr}
    assert g.root + "/" in urls or g.root in urls


# --------------------------------------------------------------- HITS

def _hits_run(spark, edges, **kw):
    from azuresearchcrawlervector_spark.operators.graph import hits
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["hub"], r["authority"])
            for r in hits(df, **kw).collect()}


def test_hits_matches_local_golden(spark):
    from azuresearchcrawlervector_spark.operators.graph import hits_local
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "d"),
             ("c", "d"), ("d", "a")]
    got = _hits_run(spark, edges, iters=15)
    want = hits_local(edges, iters=15)
    assert set(got) == set(want)
    for v in got:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9)


def test_hits_hub_authority_structure(spark):
    # 'hub' links to every authority; authorities all point at 'top'
    edges = [("hub", "p1"), ("hub", "p2"), ("hub", "p3"),
             ("p1", "top"), ("p2", "top"), ("p3", "top")]
    got = _hits_run(spark, edges, iters=20)
    assert got["hub"][0] == max(h for h, _a in got.values())   # best hub
    assert got["top"][1] == max(a for _h, a in got.values())   # best auth
    assert got["top"][0] == 0.0                                # no out-links


def test_hits_l2_normalized(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    got = _hits_run(spark, edges, iters=10)
    assert sum(h * h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a * a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)
