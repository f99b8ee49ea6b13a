"""Checkpoint/resume: kill-and-resume must be bit-identical (north_rule).

The reference loses all state on crash (in-memory HashSets — SURVEY.md
§2.7 P8); snapshot resume is the new capability the north_rule requires.
"""

from azuresearchcrawlervector_spark.config import CrawlConfig, CrawlMode
from azuresearchcrawlervector_spark.plans.checkpoint import SnapshotStore
from azuresearchcrawlervector_spark.plans.crawl import CrawlEngine
from azuresearchcrawlervector_spark.sources.fixtures import test_website as website1_graph
from azuresearchcrawlervector_spark.sources.synthetic import pages_df


def _collect_state(spark, res):
    docs = sorted(
        (r["seq"], r["url"], r["id"], r["title"], r["content"])
        for r in res.documents(spark).collect()
    )
    seen = sorted((r["url_hash"], r["url"], r["iter"]) for r in res.seen(spark).collect())
    return docs, seen


def test_kill_and_resume_bit_identical(spark, tmp_path):
    g = website1_graph()
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD)
    pages = pages_df(spark, g)

    # uninterrupted reference run
    full = CrawlEngine(spark, pages, cfg, str(tmp_path / "full"),
                       validate_images=False).run()
    want = _collect_state(spark, full)

    # "killed" run: stop after 2 waves (simulates a mid-crawl crash — the
    # manifest for wave 2 is the last committed snapshot)
    killed = CrawlEngine(spark, pages, cfg, str(tmp_path / "crash"),
                         validate_images=False, max_iters=2)
    killed.run()
    m = killed.store.latest()
    assert m.iter == 2 and not m.finished  # mid-crawl snapshot, resumable

    resumed = CrawlEngine(spark, pages, cfg, str(tmp_path / "crash"),
                          validate_images=False).run(resume=True)
    got = _collect_state(spark, resumed)
    assert got == want


def test_resume_of_finished_run_is_noop(spark, tmp_path):
    g = website1_graph()
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD, max_pages=5)
    pages = pages_df(spark, g)
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "c"), validate_images=False)
    first = eng.run()
    again = CrawlEngine(spark, pages, cfg, str(tmp_path / "c"),
                        validate_images=False).run(resume=True)
    assert again.manifest.iter == first.manifest.iter
    assert again.manifest.pages_fetched == first.manifest.pages_fetched


def test_snapshot_rollback(spark, tmp_path):
    g = website1_graph()
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD)
    pages = pages_df(spark, g)
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "c"), validate_images=False)
    res = eng.run()
    last = res.manifest.iter
    store = SnapshotStore(str(tmp_path / "c"))
    store.rollback_to(1)
    assert store.latest().iter == 1 and not store.latest().finished
    # resume from the rolled-back snapshot reaches the same final state
    res2 = CrawlEngine(spark, pages, cfg, str(tmp_path / "c"),
                       validate_images=False).run(resume=True)
    assert _collect_state(spark, res2) == _collect_state(spark, res)
    assert res2.manifest.iter == last


def test_truncated_tmp_manifest_ignored(tmp_path):
    """A crash between tmp write and os.replace leaves a vNNNNN.json.tmp
    that must be invisible to latest()/all_manifests() and cleaned by
    rollback_to() — resume reads only COMMITTED manifests."""
    from azuresearchcrawlervector_spark.plans.checkpoint import Manifest

    store = SnapshotStore(str(tmp_path / "ck"))
    store.commit(Manifest(iter=0, pending_path=None))
    store.commit(Manifest(iter=1, pending_path=None))
    mdir = tmp_path / "ck" / "manifest"
    # truncated tmp that sorts AFTER the last committed manifest
    (mdir / "v00002.json.tmp").write_text('{"iter": 2, "pend')
    assert store.latest().iter == 1
    assert [m.iter for m in store.all_manifests()] == [0, 1]
    store.rollback_to(0)
    assert store.latest().iter == 0
    assert not list(mdir.glob("*.tmp"))


def test_incremental_seen_sketch_exact_and_resumable(spark, tmp_path):
    """Sketch path forced on at fixture scale (seen_sketch_min_pages=0):
    dedup stays EXACT (engine ≡ simulator), the sketch snapshot rides
    the manifest, and a killed crawl resumes loading the sketch from the
    checkpoint (fresh engine instance, no rebuild from the log)."""
    from dataclasses import replace

    from azuresearchcrawlervector_spark.simulator import simulate
    from azuresearchcrawlervector_spark.sources.synthetic import pages_df

    g = website1_graph()
    cfg = replace(
        CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD),
        seen_sketch_min_pages=0)
    pages = pages_df(spark, g)

    # one-shot reference run
    ref = CrawlEngine(spark, pages, cfg, str(tmp_path / "one"),
                      validate_images=False).run()
    assert ref.manifest.seen_sketch_path  # snapshot referenced

    # killed-after-2-waves + resume with a FRESH engine
    CrawlEngine(spark, pages, cfg, str(tmp_path / "two"),
                validate_images=False, max_iters=2).run()
    eng2 = CrawlEngine(spark, pages, cfg, str(tmp_path / "two"),
                       validate_images=False)
    res2 = eng2.run(resume=True)

    sim = simulate(g, cfg)
    for res in (ref, res2):
        got = sorted((r["seq"], r["url"]) for r in res.documents(spark).collect())
        want = sorted((d["seq"], d["url"]) for d in sim.documents)
        assert got == want
        assert {r["url"] for r in res.seen(spark).collect()} == sim.seen


def test_crawl_timeout_leaves_resumable_state(spark, tmp_path):
    """P5 (AbotCrawler.cs:165 analog): the wall-clock guard stops the
    loop mid-crawl with finished=False — exactly the state a kill
    leaves — and run(resume=True) completes to the same result as an
    uninterrupted crawl."""
    g = website1_graph()
    cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD,
                      crawl_timeout_s=1)  # expires during wave 1
    eng = CrawlEngine(spark, pages_df(spark, g), cfg, str(tmp_path / "t"),
                      validate_images=False)
    res = eng.run()
    assert not res.manifest.finished
    assert res.manifest.pages_fetched < 19
    cfg2 = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD)
    eng2 = CrawlEngine(spark, pages_df(spark, g), cfg2, str(tmp_path / "t"),
                       validate_images=False)
    res2 = eng2.run(resume=True)
    assert res2.manifest.finished
    urls = sorted(r["url"] for r in res2.documents(spark).collect())
    full = CrawlEngine(spark, pages_df(spark, g), cfg2,
                       str(tmp_path / "full"), validate_images=False).run()
    assert urls == sorted(r["url"] for r in full.documents(spark).collect())
    assert len(urls) == 19
