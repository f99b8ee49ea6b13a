"""Product quantization: encode, ADC top-k, trained codebooks."""
import math
import random

import pytest
from pyspark.sql import functions as F

from azuresearchcrawlervector_spark.operators.pq import (
    adc_lut, pq_adc_topk, pq_encode, pq_train, quantize_py,
)


def _emb_df(spark, n=60, dim=16, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_encode(vec, books):
    m, d = len(books), len(books[0][0])
    iv = [quantize_py(x) for x in vec]
    codes = []
    for s in range(m):
        sub = iv[s * d:(s + 1) * d]
        dists = [sum((a - b) * (a - b) for a, b in zip(sub, c))
                 for c in books[s]]
        codes.append(dists.index(min(dists)))
    return codes


def test_quantize_py_half_away_from_zero():
    assert quantize_py(0.0015) == 2      # 1.5 -> 2
    assert quantize_py(-0.0015) == -2    # -1.5 -> -2
    assert quantize_py(0.25) == 250


def test_pq_encode_matches_python_reference(spark):
    rows, df = _emb_df(spark, n=40, dim=16)
    books = pq_train(df, m=4, k=8, mode="positional")
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    got = {r["vec_id"]: list(r["codes"]) for r in
           pq_encode(df, books).collect()}
    # float->float32->double path: re-read what Spark stored as float32
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in df.collect()}
    for vid, vec in stored.items():
        assert got[vid] == _py_encode(vec, books), vid
    # codes are valid indices
    assert all(0 <= c < 8 for cs in got.values() for c in cs)


def test_pq_adc_topk_matches_python_reference(spark):
    rows, df = _emb_df(spark, n=60, dim=16, seed=5)
    books = pq_train(df, m=4, k=8, mode="positional")
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in df.collect()}
    q = stored[0]
    lut = adc_lut(books, q)
    want = sorted(
        ((sum(lut[s][c] for s, c in enumerate(_py_encode(v, books))), vid)
         for vid, v in stored.items()))[:10]
    got = [(r["adc_dist"], r["vec_id"]) for r in
           pq_adc_topk(pq_encode(df, books), books, q, topk=10).collect()]
    assert got == want


def test_pq_adc_recall_vs_exact(spark):
    # clustered data: ADC top-10 must recover most of the exact top-10
    rng = random.Random(11)
    centers = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(5)]
    rows = []
    for i in range(200):
        c = centers[i % 5]
        rows.append((i, [x + rng.uniform(-0.2, 0.2) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=4, k=16, mode="kmeans", sample_n=200, iters=4)
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in df.collect()}
    q = stored[7]
    # within a tight 40-point cluster exact top-10 membership is
    # tie-noise; the property PQ must deliver is CLUSTER recall: every
    # ADC top-10 hit comes from the query's cluster (i % 5 == 2)
    got = {r["vec_id"] for r in
           pq_adc_topk(pq_encode(df, books), books, q, topk=10).collect()}
    assert 7 in got                       # the query itself is nearest
    assert all(vid % 5 == 2 for vid in got)


def test_pq_kmeans_beats_positional_distortion(spark):
    # skewed data: trained codebooks must cut mean quantization error
    rng = random.Random(23)
    centers = [[rng.uniform(-3, 3) for _ in range(8)] for _ in range(8)]
    rows = []
    # block layout (i // 40): the k lowest ids all sit in ONE cluster,
    # so positional codebooks are maximally wrong — the skew a trained
    # codebook must overcome on real data
    for i in range(320):
        c = centers[i // 40]
        rows.append((i, [x + rng.uniform(-0.1, 0.1) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def distortion(books):
        m, d = len(books), len(books[0][0])
        enc = {r["vec_id"]: list(r["codes"]) for r in
               pq_encode(df, books).collect()}
        tot = 0
        for r in df.collect():
            iv = [quantize_py(float(x)) for x in r["embedding"]]
            for s in range(m):
                cent = books[s][enc[r["vec_id"]][s]]
                tot += sum((a - b) * (a - b)
                           for a, b in zip(iv[s * d:(s + 1) * d], cent))
        return tot

    pos = distortion(pq_train(df, m=2, k=8, mode="positional"))
    km = distortion(pq_train(df, m=2, k=8, mode="kmeans",
                             sample_n=320, iters=5))
    assert km < pos * 0.5


def test_pq_encode_plan_is_narrow(spark):
    _, df = _emb_df(spark, n=20, dim=16)
    books = pq_train(df, m=4, k=4, mode="positional")
    enc = pq_encode(df, books)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # pure projection
    topk_plan = (pq_adc_topk(enc, books, [0.0] * 16, topk=5)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in topk_plan


def test_pq_train_validates(spark):
    _, df = _emb_df(spark, n=5, dim=16)
    with pytest.raises(ValueError):
        pq_train(df, m=4, k=8, mode="positional")   # too few rows
    with pytest.raises(ValueError):
        pq_train(df, m=4, k=2, mode="nope")


def test_ivfpq_layout_and_search(spark, tmp_path):
    import os
    from azuresearchcrawlervector_spark.operators.pq import (
        ann_topk_ivfpq_partitioned, write_ivfpq_partitioned,
    )
    rng = random.Random(31)
    centers = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(4)]
    rows = [(i, [x + rng.uniform(-0.2, 0.2) for x in centers[i % 4]])
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_partitioned(df, path, n_centroids=4, m=4, k_codes=8)
    # layout: ivf_cid partition dirs, NO raw vector column inside
    dirs = sorted(d for d in os.listdir(path) if d.startswith("ivf_cid="))
    assert len(dirs) == 4
    inner = spark.read.parquet(path)
    assert set(inner.columns) == {"vec_id", "codes", "ivf_cid"}
    # search: top-10 for a cluster-2 query stays in cluster 2 and is
    # ADC-ordered with id tiebreak
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in df.collect()}
    got = ann_topk_ivfpq_partitioned(spark, path, stored[2], k=10,
                                     nprobe=1).collect()
    assert [c for c in got[0].asDict()] == ["vec_id", "adc_dist"]
    assert got[0]["vec_id"] == 2            # the query row itself
    assert all(r["vec_id"] % 4 == 2 for r in got)
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)


def test_ivfpq_prunes_partitions(spark, tmp_path):
    from azuresearchcrawlervector_spark.operators.pq import (
        ann_topk_ivfpq_partitioned, write_ivfpq_partitioned,
    )
    rng = random.Random(37)
    centers = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(4)]
    rows = [(i, [x + rng.uniform(-0.2, 0.2) for x in centers[i % 4]])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_partitioned(df, path, n_centroids=4, m=4, k_codes=8)
    q = [float(x) for x in rows[1][1]]
    topk = ann_topk_ivfpq_partitioned(spark, path, q, k=5, nprobe=2)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cid" in plan
