"""URL-seen set at scale: per-partition Bloom sketches, broadcast-merged,
with an exact confirm join so correctness is never probabilistic.

The reference's seen set is an in-memory ``HashSet`` (one per crawler,
HeadlessBrowserCrawler.cs:14 / SitemapCrawler.cs:15 / Abot's internal
repository) — fine for 100 pages, impossible at the 10^10-URL frontier the
north_rule targets. Design here (north_star architecture):

1. Each iteration, the newly-seen url_hash partition slices each build a
   numpy Bloom bitmap (mapInPandas — Arrow batches, no per-row Python),
   the driver ORs the per-partition bitmaps, and the merged sketch is
   broadcast for the next iteration.
2. The candidate wave is split by the sketch: rows the Bloom says
   DEFINITELY-UNSEEN (no false negatives) bypass the join entirely; only
   the "maybe seen" sliver takes the exact ``left_anti`` join against the
   seen table. False positives therefore cost a join lookup, never a
   wrongly-dropped URL — dedup stays EXACT while the shuffle join input
   shrinks to ~the true-duplicate rate + FP rate.

At 10^10 keys a single sketch at 16 bits/key is ~20 GB — too big to
broadcast whole; the same design shards the sketch by ``pmod(url_hash,
n_shards)`` with each executor holding only resident shards (documented
scale path; the sharding math is identical, see ShardedBloom below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULT = 0x9E3779B97F4A7C15
MASK64 = (1 << 64) - 1


class BloomFilter:
    """Fixed-size Bloom over 64-bit hashes; double hashing, k probes."""

    def __init__(self, n_bits: int, k: int = 7, bits: np.ndarray | None = None):
        assert n_bits % 8 == 0
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    @staticmethod
    def sized_for(n_keys: int, bits_per_key: int = 16) -> "BloomFilter":
        n_bits = max(1 << 13, 1 << int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
        return BloomFilter(n_bits)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing h1 + i*h2.

        n_bits is a power of two, so the modulo keeps only LOW bits — h2
        must not be a pure function of h's low bits or all k probes
        collapse to ~log2(n_bits) bits of entropy. A splitmix64-style
        finalizer folds the high bits in first.
        """
        h = hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = h.copy()
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            h1 = x
            h2 = ((x >> np.uint64(32)) ^ (h * np.uint64(MULT))) | np.uint64(1)
            i = np.arange(self.k, dtype=np.uint64)
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)
        return pos.astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes))
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes))
        hit = (self.bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        return hit.all(axis=1)

    def merge_(self, other_bits: bytes | np.ndarray) -> None:
        arr = np.frombuffer(other_bits, dtype=np.uint8) if isinstance(other_bits, (bytes, bytearray)) else other_bits
        np.bitwise_or(self.bits, arr, out=self.bits)

    def fp_rate(self, n_keys: int) -> float:
        return float((1 - np.exp(-self.k * n_keys / self.n_bits)) ** self.k)


def build_partition_sketches(df: DataFrame, hash_col: str, n_bits: int, k: int = 7) -> list[bytes]:
    """Per-partition Bloom bitmaps over ``hash_col`` (mapInPandas), returned
    for the driver-side OR-merge. One row (partition_id, bitmap) per task."""
    def build(batches):
        bf = BloomFilter(n_bits, k)
        for pdf in batches:
            bf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        yield pd.DataFrame({"bitmap": [bf.bits.tobytes()]})

    rows = (
        df.select(hash_col)
        .mapInPandas(build, "bitmap binary")
        .collect()
    )
    return [r["bitmap"] for r in rows]


def merged_sketch(df: DataFrame, hash_col: str, n_bits: int, k: int = 7) -> BloomFilter:
    bf = BloomFilter(n_bits, k)
    for bm in build_partition_sketches(df, hash_col, n_bits, k):
        bf.merge_(bm)
    return bf


def split_by_sketch(candidates: DataFrame, sketch: BloomFilter,
                    hash_col: str = "url_hash",
                    broadcasts: list | None = None) -> DataFrame:
    """Add ``maybe_seen`` from the broadcast sketch (Arrow-batched probe).

    ``broadcasts``: optional caller-owned list the underlying broadcast
    handle is appended to — an iterative caller (the wave loop) should
    ``unpersist()`` them once the wave's jobs finish, or a 1000-wave
    crawl accumulates a thousand stale sketch broadcasts on the driver
    and executors."""
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((sketch.n_bits, sketch.k, sketch.bits.tobytes()))
    if broadcasts is not None:
        broadcasts.append(b)

    @F.pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        n_bits, k, bits = b.value
        bf = BloomFilter(n_bits, k, np.frombuffer(bits, dtype=np.uint8))
        return pd.Series(bf.contains_many(h.to_numpy(dtype=np.int64)))

    return candidates.withColumn("maybe_seen", probe(F.col(hash_col)))


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame | None,
    sketch,
    hash_col: str = "url_hash",
    broadcasts: list | None = None,
) -> DataFrame:
    """EXACT dedup against the seen set, Bloom-accelerated.

    definite-new rows (sketch says absent — Bloom has no false negatives)
    skip the join; only maybe-seen rows take the exact left_anti join.
    ``sketch`` is a BloomFilter (broadcast probe), a ShardedSketchFiles
    handle (shard-aligned file probe — the 10^10 path), or None.
    """
    if seen is None:
        return candidates
    if sketch is None:
        return candidates.join(
            seen.select(hash_col).distinct(), on=hash_col, how="left_anti"
        )
    if isinstance(sketch, ShardedSketchFiles):
        tagged = sketch.split(candidates, hash_col)
    else:
        tagged = split_by_sketch(candidates, sketch, hash_col, broadcasts)
    definite_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(
        seen.select(hash_col).distinct(), on=hash_col, how="left_anti"
    )
    return definite_new.unionByName(confirmed_new)


class ShardedBloom:
    """Scale path for 10^10 keys: shard the sketch by pmod(url_hash, S).

    Each shard is an independent BloomFilter; an executor probing a hash
    touches exactly one shard. At 16 bits/key and 2048 shards, a
    10^10-key seen set is 32 GB total / 16 MB per shard — the engine
    never broadcasts it: shards are SNAPSHOT FILES on the checkpoint
    store, probe tasks are repartitioned by shard and read only theirs
    (split_by_sharded_files below), and only DIRTY shards are rewritten
    per wave. The driver holds the shards resident for the incremental
    merge (32 GB = a driver-sized box at the extreme; an mmap swap
    touches only this class).

    ``n_shards`` MUST be a power of two: shard id is computed as
    uint64(hash) % S in numpy and pmod(hash, S) in Spark SQL, and the
    two agree for signed hashes exactly when S divides 2^64.
    """

    def __init__(self, n_shards: int, n_bits_per_shard: int, k: int = 7):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
        self.n_shards = n_shards
        self.n_bits_per_shard = n_bits_per_shard
        self.k = k
        self.shards = [BloomFilter(n_bits_per_shard, k) for _ in range(n_shards)]

    def _sid(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) % np.uint64(self.n_shards)).astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> None:
        sid = self._sid(hashes)
        for s in np.unique(sid):
            self.shards[int(s)].add_many(hashes[sid == s])

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        sid = self._sid(np.asarray(hashes))
        for s in np.unique(sid):
            m = sid == s
            out[m] = self.shards[int(s)].contains_many(np.asarray(hashes)[m])
        return out

    def merge_delta_(self, other: "ShardedBloom") -> list[int]:
        """OR another sharded sketch in; returns the DIRTY shard ids
        (shards whose bits actually changed) so the caller snapshots
        only those — per-wave sketch write I/O is bounded by the delta's
        shard coverage, not the sketch size."""
        assert other.n_shards == self.n_shards
        dirty = []
        for s, (mine, theirs) in enumerate(zip(self.shards, other.shards)):
            if np.any(theirs.bits & ~mine.bits):
                np.bitwise_or(mine.bits, theirs.bits, out=mine.bits)
                dirty.append(s)
        return dirty


def merged_sharded_sketch(df: DataFrame, hash_col: str, n_shards: int,
                          bits_per_shard: int, k: int = 7) -> ShardedBloom:
    """Distributed build of a ShardedBloom: repartition by shard id (each
    shard lands in exactly one task), build per-shard bitmaps in numpy,
    collect one (shard, bitmap) row per non-empty shard for the driver
    OR-merge. Collected bytes = non-empty shards × shard size."""
    spark = df.sparkSession
    P = min(n_shards, spark.sparkContext.defaultParallelism)
    parted = df.select(hash_col).repartition(
        P, F.pmod(F.col(hash_col), F.lit(n_shards)))

    def build(batches):
        local: dict[int, BloomFilter] = {}
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            sid = (h.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
            for s in np.unique(sid):
                bf = local.setdefault(int(s), BloomFilter(bits_per_shard, k))
                bf.add_many(h[sid == s])
        yield pd.DataFrame({
            "shard": np.asarray(list(local.keys()), dtype=np.int32),
            "bitmap": [b.bits.tobytes() for b in local.values()],
        })

    sk = ShardedBloom(n_shards, bits_per_shard, k)
    for r in parted.mapInPandas(build, "shard int, bitmap binary").collect():
        sk.shards[int(r["shard"])].merge_(r["bitmap"])
    return sk


def merge_delta_sharded_files(
    df: DataFrame,
    hash_col: str,
    n_shards: int,
    bits_per_shard: int,
    index: dict[int, str],
    out_dir: str,
    iteration: int,
    k: int = 7,
) -> dict[int, str]:
    """EXECUTOR-SIDE merge of a wave's delta into the sharded-sketch
    snapshot: each task builds its shards' delta bitmaps, reads the
    previous snapshot shard file (from ``index``), ORs, and writes the
    new version file DIRECTLY to the (shared) checkpoint store — the
    driver sees only the returned ``{shard: new_path}`` rows for shards
    that actually changed. Clean shards (delta adds no bits) write
    nothing and keep their previous immutable file.

    This is the 10^10-scale path: no sketch bits ever reside on the
    driver (its state is the tiny path index), per-wave merge I/O is
    dirty-shards × shard-size and runs data-parallel across shards.
    Executors write the store directly — the same shared-store
    assumption the probe path (ShardedSketchFiles.split) already makes
    by reading shard files from tasks. Writes are tmp-file + atomic
    rename with version-stamped names, so task retries/speculation
    rewrite identical content harmlessly.

    File naming matches plans.checkpoint.SnapshotStore.write_sketch_shard
    (``shard%05d_v%05d.bin`` under the store's seen_sketch dir) so
    driver- and executor-written shards share one namespace.

    Expected shards per task ≈ 1 (numPartitions = n_shards), so task
    memory is ~one shard bitmap; worst-case hash collisions put a small
    constant number of shards in one task.
    """
    import os
    import uuid

    # The Spark-side partitioner uses pmod(int64 hash, n_shards) while the
    # task-side shard id uses uint64 % n_shards; for NEGATIVE hashes these
    # agree only when n_shards divides 2^64.  A non-power-of-two n_shards
    # would split one shard's rows across two tasks whose last rename
    # silently drops the other's bits — lost dedup.  Same invariant as
    # ShardedBloom / ShardedSketchFiles.
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"

    spark = df.sparkSession
    b_index = spark.sparkContext.broadcast(
        {int(s): p for s, p in index.items()})
    parted = df.select(hash_col).repartition(
        n_shards, F.pmod(F.col(hash_col), F.lit(n_shards)))

    def build_merge(batches):
        local: dict[int, BloomFilter] = {}
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            sid = (h.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
            for s in np.unique(sid):
                bf = local.setdefault(int(s), BloomFilter(bits_per_shard, k))
                bf.add_many(h[sid == s])
        idx = b_index.value
        out_s, out_p = [], []
        for s, bf in local.items():
            prev_path = idx.get(s)
            if prev_path is not None:
                prev = _shard_bits_cached(prev_path)  # immutable, cacheable
                if not np.any(bf.bits & ~prev):
                    continue  # clean: keep the previous file
                np.bitwise_or(bf.bits, prev, out=bf.bits)
            path = os.path.join(
                out_dir, f"shard{s:05d}_v{iteration:05d}.bin")
            tmp = f"{path}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(bf.bits.tobytes())
            os.replace(tmp, path)
            out_s.append(s)
            out_p.append(path)
        yield pd.DataFrame({
            "shard": np.asarray(out_s, dtype=np.int32), "path": out_p})

    os.makedirs(out_dir, exist_ok=True)
    rows = parted.mapInPandas(build_merge, "shard int, path string").collect()
    b_index.unpersist()
    return {int(r["shard"]): r["path"] for r in rows}


# per-executor-process cache of immutable shard snapshot files (paths are
# versioned, so a path's content never changes); bounded FIFO eviction
_SHARD_FILE_CACHE: dict[str, np.ndarray] = {}
_SHARD_FILE_CACHE_MAX = 32


def _shard_bits_cached(path: str) -> np.ndarray:
    bits = _SHARD_FILE_CACHE.get(path)
    if bits is None:
        with open(path, "rb") as fh:
            bits = np.frombuffer(fh.read(), dtype=np.uint8)
        while len(_SHARD_FILE_CACHE) >= _SHARD_FILE_CACHE_MAX:
            _SHARD_FILE_CACHE.pop(next(iter(_SHARD_FILE_CACHE)))
        _SHARD_FILE_CACHE[path] = bits
    return bits


class ShardedSketchFiles:
    """Probe handle over a sharded-sketch SNAPSHOT: (shard → bin path).

    Probing repartitions the candidates by shard id, so each task needs
    only its shards' files — read from the (shared) checkpoint store
    and cached per executor process. No driver broadcast of sketch bits
    at any size; per-task sketch traffic is bounded by shard size.
    A shard absent from the index has never been written = empty =
    definitely-unseen (correct: dirty-only snapshots skip untouched
    shards, and an untouched shard holds no keys).
    """

    def __init__(self, n_shards: int, n_bits_per_shard: int,
                 index: dict[int, str], k: int = 7):
        assert n_shards & (n_shards - 1) == 0
        self.n_shards = n_shards
        self.n_bits_per_shard = n_bits_per_shard
        self.index = {int(s): p for s, p in index.items()}
        self.k = k

    def split(self, candidates: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        from pyspark.sql.types import BooleanType, StructField, StructType
        spark = candidates.sparkSession
        n_shards, n_bits, k = self.n_shards, self.n_bits_per_shard, self.k
        b_index = spark.sparkContext.broadcast(self.index)  # tiny dict
        P = min(n_shards, spark.sparkContext.defaultParallelism)
        parted = candidates.repartition(
            P, F.pmod(F.col(hash_col), F.lit(n_shards)))
        out_schema = StructType(
            candidates.schema.fields + [StructField("maybe_seen", BooleanType())])

        def probe(batches):
            idx = b_index.value
            for pdf in batches:
                h = pdf[hash_col].to_numpy(dtype=np.int64)
                sid = (h.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
                out = np.zeros(len(h), dtype=bool)
                for s in np.unique(sid):
                    path = idx.get(int(s))
                    if path is None:
                        continue  # never-written shard = empty
                    bf = BloomFilter(n_bits, k, _shard_bits_cached(path))
                    m = sid == s
                    out[m] = bf.contains_many(h[m])
                res = pdf.copy()
                res["maybe_seen"] = out
                yield res

        return parted.mapInPandas(probe, out_schema)
