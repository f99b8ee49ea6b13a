"""Evidence that bucketed payload pruning makes per-wave fetch I/O scale
with WAVE size, not TABLE size (VERDICT round-2 item #1 "done" bar).

Method: generate the Zipf synthetic web at several table sizes, write it
flat AND bucketed (sources/payload.py) with CONSTANT bucket size — B
scales with the table (B = n / bucket_target), which is the layout
contract that makes pruned I/O ∝ wave: a wave of w keys touches ≤ w
buckets of ~bucket_target rows each, so pruned fetch I/O is bounded by
w × bucket_target REGARDLESS of table size, while the flat scan grows
linearly with the table. Then time the engine's actual small-wave fetch
plan (broadcast probe of the wave against the payload scan) on each.

Honest scope: pruning pays when the wave's bucket coverage < B —
ramp-up, DFS, politeness-bound, and resume waves. A wave that touches
every bucket degenerates to the full scan (which at that point is
proportional to useful work).

Usage: python tools/payload_prune_bench.py [wave_n] [table_sizes_csv]
Env: BENCH_BUCKET_TARGET (urls/bucket, default 500), BENCH_REPEATS.
Prints one JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    wave_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sizes = [int(s) for s in (sys.argv[2].split(",") if len(sys.argv) > 2
                              else ["100000", "400000"])]
    bucket_target = int(os.environ.get("BENCH_BUCKET_TARGET", "500"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import functions as F

    from azuresearchcrawlervector_spark.session import get_spark
    from azuresearchcrawlervector_spark.sources.payload import (
        prune_by_buckets, wave_bucket_ids, write_bucketed_payload,
    )
    from azuresearchcrawlervector_spark.sources.synthetic import bench_pages_df

    spark = get_spark("payload-prune-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="payload_prune_")
    out = {"wave_n": wave_n, "bucket_target": bucket_target,
           "repeats": repeats, "tables": []}
    try:
        for n in sizes:
            buckets = max(8, n // bucket_target)
            pages = bench_pages_df(spark, n, 100)
            flat_p = f"{work}/flat_{n}"
            buck_p = f"{work}/buck_{n}"
            pages.write.mode("overwrite").parquet(flat_p)
            write_bucketed_payload(pages, buck_p, "url", buckets)

            # the wave: a deterministic sample of wave_n URLs (same set
            # for both layouts), carrying url_hash like pending does
            wave = (
                spark.read.parquet(flat_p).select("url")
                .withColumn("url_hash", F.xxhash64("url"))
                .orderBy(F.pmod(F.col("url_hash"), F.lit(997)), "url")
                .limit(wave_n)
            )
            wave.write.mode("overwrite").parquet(f"{work}/wave_{n}")
            wave_r = spark.read.parquet(f"{work}/wave_{n}")
            wb = wave_bucket_ids(wave_r, F.col("url_hash"), buckets)

            def fetch_time(table_df):
                # sum(length(html)) forces the payload column through
                # the scan — a bare count() would let Catalyst prune
                # html and time only the key columns
                best = float("inf")
                for _ in range(repeats):
                    t0 = time.monotonic()
                    row = (table_df.select("url", "status", "html")
                           .join(F.broadcast(wave_r.select("url")), "url")
                           .agg(F.count("*").alias("n"),
                                F.sum(F.length("html")).alias("payload"))
                           ).collect()[0]
                    best = min(best, time.monotonic() - t0)
                    assert row["n"] == wave_n, (row["n"], wave_n)
                return best

            t_flat = fetch_time(spark.read.parquet(flat_p))
            t_buck = fetch_time(
                prune_by_buckets(spark.read.parquet(buck_p), wb))
            out["tables"].append({
                "table_urls": n,
                "buckets": buckets,
                "wave_buckets_touched": len(wb),
                "fetch_flat_sec": round(t_flat, 3),
                "fetch_pruned_sec": round(t_buck, 3),
                "speedup": round(t_flat / t_buck, 2),
            })
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
