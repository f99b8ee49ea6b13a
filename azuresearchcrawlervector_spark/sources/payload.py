"""Bucketed payload-table layout: file-level pruning for the per-wave fetch.

The crawl's fetch (J5) resolves the wave against the pages/images
payload tables. Whatever the join strategy (broadcast probe for small
waves, Bloom-sketch row filter for big ones), a flat layout means every
wave READS the whole payload table — at 100 TB × hundreds of waves that
scan dominates the crawl. (The reference never faces this: it fetches
each URL over the network, SitemapCrawler.cs:169 — the scan cost is an
artifact of the join-based graft, so it must be engineered away.)

Fix = the same pattern proven for ANN (``write_lsh_partitioned``):
materialize ``bucket = pmod(xxhash64(key), B)`` as a PARTITION column.
A wave's pending set occupies a bounded set of buckets; filtering the
scan on ``bucket IN (wave's buckets)`` becomes a partition-pruning
predicate (``PartitionFilters`` in the scan — non-probed bucket
directories are never opened), so per-wave payload I/O scales with the
wave's bucket coverage, not the table size. Once waves are large enough
to touch every bucket, the wave is also large enough that the full scan
is proportional to useful work.

``url`` buckets use ``xxhash64(url)`` — identical to the frontier's
``url_hash`` column (functions/urls.url_hash_col), so the engine can
compute a wave's bucket set from pending's url_hash without touching
the payload table. Image buckets use ``xxhash64(image_id)``, matching
the engine's image-sketch key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_payload_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Add the layout's ``bucket`` column: pmod(xxhash64(key), B)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int"))


def write_bucketed_payload(df: DataFrame, path: str, key_col: str,
                           n_buckets: int) -> None:
    """Write a payload table partitioned by bucket.

    The write repartitions by bucket first — without it, partitionBy
    emits one file per (writer task × bucket), i.e. up to tasks×B tiny
    files whose listing/open overhead erases the pruning win. One
    shuffle at build time (write-once, read-every-wave) buys ~1 file
    per bucket.

    Choosing B: hold BUCKET SIZE constant as the table grows (B ≈
    table/bucket_target). That is what makes pruned per-wave I/O ∝ wave
    size — a wave of w keys opens ≤ w buckets of ~bucket_target each,
    independent of table size. A fixed small B would make every bucket
    grow with the table and the pruning asymptotically worthless.
    """
    bucketed = with_payload_bucket(df, key_col, n_buckets)
    bucketed.repartition(n_buckets, F.col("bucket")).write.mode("overwrite") \
        .partitionBy("bucket").parquet(path)


def wave_bucket_ids(df: DataFrame, hash_col, n_buckets: int) -> list[int]:
    """The distinct payload buckets a wave can touch — a bounded
    (≤ n_buckets) driver collect off a single-column scan. ``hash_col``
    is a Column of the SAME hash the layout used (url_hash for pages,
    xxhash64(image_id) for images)."""
    rows = (
        df.select(F.pmod(hash_col, F.lit(n_buckets)).cast("int").alias("b"))
        .where(F.col("b").isNotNull()).distinct().collect()
    )
    return sorted(r["b"] for r in rows)


def prune_by_buckets(table: DataFrame, bucket_ids: list[int]) -> DataFrame:
    """Restrict a bucket-partitioned payload table to the wave's buckets.
    On a partitioned parquet read this is a partition-pruning predicate
    (file-level skip), visible as PartitionFilters in the scan plan."""
    return table.filter(F.col("bucket").isin([int(b) for b in bucket_ids]))
