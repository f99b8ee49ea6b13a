"""frontier_log compaction keeps results identical and bounds delta fan-in."""

from azuresearchcrawlervector_spark.config import CrawlConfig, CrawlMode
from azuresearchcrawlervector_spark.plans.crawl import CrawlEngine
from azuresearchcrawlervector_spark.sources.fixtures import test_website as website1_graph
from azuresearchcrawlervector_spark.sources.synthetic import pages_df
from dataclasses import replace


def test_compaction_preserves_results(spark, tmp_path):
    g = website1_graph()
    pages = pages_df(spark, g)
    # DFS mode = one page per wave → many waves → compaction triggers
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.HEADLESS, max_pages=8,
                      log_compaction_files=3)
    res_c = CrawlEngine(spark, pages, cfg, str(tmp_path / "a"),
                        validate_images=False).run()
    cfg2 = replace(cfg, log_compaction_files=10_000)
    res_n = CrawlEngine(spark, pages, cfg2, str(tmp_path / "b"),
                        validate_images=False).run()
    assert len(res_c.manifest.deltas["frontier_log"]) <= 3
    assert len(res_n.manifest.deltas["frontier_log"]) == 8
    a = sorted((r["seq"], r["url"]) for r in res_c.documents(spark).collect())
    b = sorted((r["seq"], r["url"]) for r in res_n.documents(spark).collect())
    assert a == b
    assert {r["url"] for r in res_c.seen(spark).collect()} == \
        {r["url"] for r in res_n.seen(spark).collect()}
