"""Sharded seen-sketch: the 10^10-key path, wired into the engine.

Contract (VERDICT round-2 #2): above seen_sketch_cap_bits the engine
switches to power-of-two Bloom shards snapshotted as per-shard files
(dirty shards only) and probed shard-aligned from the checkpoint store
— no monolithic broadcast — with crawl output identical to the
monolithic/plain paths and bit-identical resume.
"""

import json
import os
from dataclasses import replace

import numpy as np
import pytest
from pyspark.sql import functions as F

from azuresearchcrawlervector_spark.config import CrawlConfig, CrawlMode
from azuresearchcrawlervector_spark.operators.seen import (
    BloomFilter, ShardedBloom, ShardedSketchFiles, anti_join_seen,
    merged_sharded_sketch,
)
from azuresearchcrawlervector_spark.plans.crawl import CrawlEngine
from azuresearchcrawlervector_spark.sources.fixtures import test_website as website1_graph
from azuresearchcrawlervector_spark.sources.synthetic import pages_df

# max_pages=2048 at 16 bits/key sizes the sketch to 2^15 bits; cap 2^13
# forces the sharded layout with 2^13-bit shards -> 4 shards
SHARDED_KW = dict(max_pages=2048, seen_sketch_min_pages=1,
                  seen_sketch_cap_bits=1 << 13,
                  seen_sketch_shard_bits=1 << 13)


def test_sharded_bloom_requires_power_of_two():
    with pytest.raises(AssertionError):
        ShardedBloom(3, 1 << 13)


def test_merge_delta_reports_dirty_shards_only():
    sk = ShardedBloom(4, 1 << 13)
    sk.add_many(np.array([4, 8, 12], dtype=np.int64))       # all shard 0
    delta = ShardedBloom(4, 1 << 13)
    delta.add_many(np.array([5, 9], dtype=np.int64))        # all shard 1
    assert sk.merge_delta_(delta) == [1]
    # re-merging the same delta changes nothing -> no dirty shards
    assert sk.merge_delta_(delta) == []
    assert sk.contains_many(np.array([4, 5, 9, 12], dtype=np.int64)).all()


def test_sharded_file_probe_no_false_negatives(spark, tmp_path):
    """anti_join_seen over a ShardedSketchFiles handle must equal the
    plain exact anti-join — Bloom FPs are absorbed by the confirm join,
    false negatives are impossible."""
    rng = np.random.default_rng(11)
    seen_h = rng.integers(-(1 << 62), 1 << 62, size=400, dtype=np.int64)
    cand_h = np.concatenate([seen_h[:200],
                             rng.integers(-(1 << 62), 1 << 62, size=300,
                                          dtype=np.int64)])
    n_shards, shard_bits = 8, 1 << 13
    sk = merged_sharded_sketch(
        spark.createDataFrame([(int(h),) for h in seen_h], "url_hash long"),
        "url_hash", n_shards, shard_bits)
    index = {}
    for s, shard in enumerate(sk.shards):
        if shard.bits.any():
            p = str(tmp_path / f"shard{s}.bin")
            with open(p, "wb") as fh:
                fh.write(shard.bits.tobytes())
            index[s] = p
    handle = ShardedSketchFiles(n_shards, shard_bits, index)
    cand = spark.createDataFrame([(int(h),) for h in cand_h], "url_hash long")
    seen = spark.createDataFrame([(int(h),) for h in seen_h], "url_hash long")
    got = {r["url_hash"]
           for r in anti_join_seen(cand, seen, handle).collect()}
    want = {r["url_hash"]
            for r in anti_join_seen(cand, seen, None).collect()}
    assert got == want


def _run(spark, tmp_path, tag, cfg, max_iters=1000, resume=False):
    g = website1_graph()
    eng = CrawlEngine(spark, pages_df(spark, g), cfg, str(tmp_path / tag),
                      validate_images=False, max_iters=max_iters)
    return eng.run(resume=resume), g


def test_engine_sharded_matches_plain(spark, tmp_path):
    g = website1_graph()
    base_cfg = CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD)
    sharded_cfg = replace(base_cfg, **SHARDED_KW)
    res_p, _ = _run(spark, tmp_path, "plain", base_cfg)
    res_s, _ = _run(spark, tmp_path, "shard", sharded_cfg)
    a = sorted((r["seq"], r["url"], r["id"])
               for r in res_p.documents(spark).collect())
    b = sorted((r["seq"], r["url"], r["id"])
               for r in res_s.documents(spark).collect())
    assert a == b and len(a) == 19
    assert {r["url"] for r in res_p.seen(spark).collect()} == \
        {r["url"] for r in res_s.seen(spark).collect()}
    # the sharded snapshot really was active: JSON index + shard files,
    # and clean shards keep their previous file across waves
    idx_path = res_s.manifest.seen_sketch_path
    assert idx_path and idx_path.endswith(".json")
    with open(idx_path) as fh:
        index = json.load(fh)
    assert index and all(os.path.exists(p) for p in index.values())
    assert len({int(s) for s in index}) <= 4


def test_engine_sharded_resume_identical(spark, tmp_path):
    g = website1_graph()
    cfg = replace(CrawlConfig(root_url=g.root, mode=CrawlMode.STANDARD),
                  **SHARDED_KW)
    res_full, _ = _run(spark, tmp_path, "full", cfg)
    # kill after 2 waves, then resume in a FRESH engine (driver state
    # lost -> sharded snapshot must reload from the index)
    _run(spark, tmp_path, "kr", cfg, max_iters=2)
    res_kr, _ = _run(spark, tmp_path, "kr", cfg, resume=True)
    a = sorted((r["seq"], r["url"], r["id"])
               for r in res_full.documents(spark).collect())
    b = sorted((r["seq"], r["url"], r["id"])
               for r in res_kr.documents(spark).collect())
    assert a == b and len(a) == 19
