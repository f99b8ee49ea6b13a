"""Deduplication family for large-scale training-data pipelines.

Five strategies, scale-ranked. All are DataFrame compositions; Python
appears only in the MinHash signature kernel (Arrow-vectorized numpy).

- exact_dedup          hash-groupBy on sha2(text)          exact, cheapest
- ngram_jaccard_pairs  inverted-index similarity join      exact, prunable
- minhash_lsh_pairs    shingle→minhash→band→bucket-join    approx, 10^10-scale
- simhash_pairs        64-bit sign-sum + hamming buckets   approx, cheap
- embedding_neardup    cosine over an embedding column     semantic near-dup

Scale notes: the inverted-index join's blow-up driver is token document
frequency — ``max_df`` prunes stop-tokens before the self-join (standard
prefix-filter trick). MinHash-LSH replaces the O(candidate²) verify with
banded bucket joins: only same-bucket pairs shuffle. Both paths end in a
groupBy on pair keys → map-side combine applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE61 = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: the surviving (min) id + group size."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document — pure built-ins
    (split → sequence → transform → explode), JVM-side end to end."""
    # NB: Spark's sequence(1, n) with n < 1 produces a DESCENDING sequence,
    # so short texts must be short-circuited to an empty array explicitly.
    toks = f"split(lower({text_col}), '\\\\s+')"
    shingle_arr = F.expr(
        f"CASE WHEN size({toks}) < {k} THEN array()"
        f" ELSE transform(sequence(1, size({toks}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({toks}, i, {k}))) END"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, threshold: float = 0.2, max_df: int | None = None,
) -> DataFrame:
    """EXACT Jaccard similarity join via inverted index on word k-grams.

    shingles → (optional) stop-shingle pruning → self-join on shingle →
    per-pair intersection counts → |A∪B| from per-doc sizes → filter.
    ``max_df`` drops shingles appearing in more than max_df docs (prefix
    filter) — deterministic, documented recall impact.
    """
    sh = word_shingles(df, text_col, id_col, k)
    if max_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    pairs = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("n_shingles", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_shingles", "nb"), "id_b")
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


# ------------------------------------------------------------------ MinHash
def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61 - 1, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE61 - 1, size=n_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 64, k: int = 3, seed: int = 42,
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>) — numpy kernel over Arrow batches.

    Shingle hashing uses Python's stable hash of the shingle bytes via
    blake2b-to-int64 (deterministic across executors), then n_hashes
    universal-hash permutations (a*h+b mod 2^61-1), column-wise min.
    """
    import hashlib

    a_params, b_params = _minhash_params(n_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            words = (t or "").lower().split()
            if len(words) < k:
                shingles = {" ".join(words)} if words else set()
            else:
                shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
            if not shingles:
                out.append([0] * n_hashes)
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") % MERSENNE61
                 for s in shingles),
                dtype=np.int64, count=len(shingles),
            )
            # (n_shingles, n_hashes) permuted values, min over shingles
            perm = (hs[:, None].astype(object) * a_params[None, :] + b_params[None, :]) % MERSENNE61
            out.append(perm.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 64, bands: int = 16, k: int = 3, threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + banded LSH candidate generation + exact signature-estimate
    filter. bands=16 × rows=4 over 64 hashes → S-curve midpoint ~0.5.

    The 10^10-scale path: only same-(band, band-hash) rows join; the final
    estimate is sig-agreement fraction (no second pass over raw text).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, k, seed).persist()
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(f"transform(sequence(0, {bands - 1}),"
                   f" b -> hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band})))")
        ).alias("band", "band_hash"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "band_hash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    est = (
        cand.join(sig.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
        .join(sig.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.expr(f"size(filter(zip_with(sig_a, sig_b, (p, q) -> p = q), v -> v)) / {n_hashes}"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )
    return est


# ------------------------------------------------------------------ SimHash
def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens: per-token xxhash64, sign-sum per
    bit, pack. Pure built-ins: explode → bit ops → groupBy-sum → pack."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    bits = hashed.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(sequence(0, 63), i -> CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END)")
        ).alias("bit", "sign"),
    )
    return (
        bits.groupBy("doc_id", "bit").agg(F.sum("sign").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("shiftleft(CAST(bitval AS BIGINT), bit)")).alias("simhash"))
    )


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, candidate-
    generated by 4×16-bit block buckets (pigeonhole: ≤3 differing blocks
    guarantees one equal block for hamming ≤ 16)."""
    sh = simhash64(df, text_col, id_col).persist()
    blocks = sh.select(
        "doc_id", "simhash",
        F.posexplode(
            F.expr("transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535)")
        ).alias("block", "block_val"),
    )
    cand = (
        blocks.alias("x").join(blocks.alias("y"), on=["block", "block_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"),
                F.col("x.simhash").alias("ha"), F.col("y.simhash").alias("hb"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- embedding near-dup
def embedding_neardup_pairs(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicates, brute-force (exact baseline; the LSH-bucketed
    scale path lives in operators/similarity.py). Dot products via
    zip_with/aggregate — JVM-side, no UDF."""
    withnorm = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.sqrt(F.expr(f"aggregate({vec_col}, CAST(0.0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")).alias("nrm"),
    )
    a, b = withnorm.alias("a"), withnorm.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.vid") < F.col("b.vid"))
        .withColumn(
            "cosine",
            F.round(
                F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, p) -> s + p)")
                / (F.col("a.nrm") * F.col("b.nrm")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"), "cosine")
    )
