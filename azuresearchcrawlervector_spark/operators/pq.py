"""Product quantization (PQ) for embedding columns: encode + ADC top-k.

At 10^10 rows a float32[64] embedding column is ~2.5 TB; PQ compresses
it to m single-byte codes per row (m=8 ⇒ 32× smaller) while keeping
an asymmetric-distance (ADC) top-k that only touches the codes — the
standard IVF-PQ recipe (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011). This module is the PQ half; it
composes with operators/similarity.py's IVF partitioned layout (route
by centroid partition, then ADC-scan only the probed lists).

Spark shape — everything JVM-side, zero UDFs, zero shuffles:

- Vectors are quantized to FIXED-POINT integers (``round(x * 1000)``)
  first, so every distance below is EXACT int64 arithmetic: encode and
  ADC are bit-reproducible across engines (the DuckDB oracle runs the
  identical math), argmin ties break deterministically to the lowest
  code, and no float-summation-order hazard exists. Real PQ quantizes
  to uint8 codes anyway; fixed-point training input is standard.
- ``pq_encode`` is a pure projection: per subspace, squared-L2 to each
  of the k centroids via ``zip_with``/``aggregate`` over literal
  centroid arrays, argmin via ``array_position(dists, array_min)``.
  Whole-stage codegen, narrow, scales with the scan.
- ``pq_adc_topk`` builds the m×k lookup table driver-side from the
  query (O(m·k·d) ints), inlines it as a literal, and the per-row
  distance is an ``aggregate(transform(codes, ...))`` — followed by a
  global top-k, which Spark executes as TakeOrderedAndProject (per-
  partition heaps, no sort shuffle).

Codebook modes (mirrors similarity.py's IVF centroid contract):
- "positional": centroids are the subvectors of the k lowest-id rows —
  deterministic and derivable INSIDE ANSI SQL, the oracle-twin mode.
- "kmeans": deterministic sampled Lloyd per subspace (fixed seed,
  bounded sample via the md5-60 deviate, fixed iterations) — the
  quality mode for skewed real data; exercised by tests/bench.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

QUANT = 1000  # fixed-point scale: int value = round(float * QUANT)


def quantize_py(x: float) -> int:
    """Python twin of the SQL ``CAST(round(x * 1000) AS BIGINT)`` —
    round-half-away-from-zero, matching Spark and DuckDB ``round``."""
    v = float(x) * QUANT
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _ivec_sql(vec_col: str) -> str:
    return (f"transform({vec_col},"
            f" x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))")


def with_ivec(df: DataFrame, vec_col: str = "embedding",
              out_col: str = "_iv") -> DataFrame:
    """Fixed-point integer copy of the embedding column."""
    return df.withColumn(out_col, F.expr(_ivec_sql(vec_col)))


def _sq_l2(iv: list[int], cent: list[int]) -> int:
    return sum((a - b) * (a - b) for a, b in zip(iv, cent))


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "positional",
    sample_n: int = 2048,
    iters: int = 5,
) -> list[list[list[int]]]:
    """Codebooks: m subspaces × k centroids × (dim/m) ints.

    "positional": subvectors of the k lowest-id rows (collect of k
    rows — bounded; SQL-derivable, the oracle twin). "kmeans":
    deterministic Lloyd per subspace over the ``sample_n`` rows with
    the smallest md5-60 deviate (a TakeOrdered, bounded collect —
    never a full sort at scale)."""
    if mode == "positional":
        rows = (with_ivec(df, vec_col).select(id_col, "_iv")
                .orderBy(id_col).limit(k).collect())
        ivecs = [list(r["_iv"]) for r in rows]
    elif mode == "kmeans":
        from .sampling import uniform_hash_col
        rows = (with_ivec(df, vec_col)
                .select("_iv", uniform_hash_col(F.col(id_col), "pq").alias("_u"))
                .orderBy("_u").limit(sample_n).collect())
        ivecs = [list(r["_iv"]) for r in rows]
    else:
        raise ValueError(f"unknown pq_train mode: {mode}")
    if len(ivecs) < k:
        raise ValueError(f"need >= {k} rows to train k={k} codebooks")
    dim = len(ivecs[0])
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    d = dim // m
    books: list[list[list[int]]] = []
    n = len(ivecs)
    for s in range(m):
        subs = [iv[s * d:(s + 1) * d] for iv in ivecs]
        if mode == "kmeans":
            # spread the init across the (hash-ordered) sample instead
            # of taking a contiguous prefix — decorrelates init cells
            cents = [list(subs[(c * n) // k]) for c in range(k)]
            for _ in range(iters):
                sums = [[0] * d for _ in range(k)]
                cnts = [0] * k
                far = [(-1, 0)] * k  # (dist, sample idx) farthest member
                for i, v in enumerate(subs):
                    best = min(range(k), key=lambda c: (_sq_l2(v, cents[c]), c))
                    cnts[best] += 1
                    for j in range(d):
                        sums[best][j] += v[j]
                    dd = _sq_l2(v, cents[best])
                    if dd > far[best][0]:
                        far[best] = (dd, i)
                # deterministic empty-cell re-seed: steal the farthest
                # member of the currently-worst (max in-cell distance)
                # populated cell, so dead centroids cannot persist
                for c in range(k):
                    if cnts[c]:
                        cents[c] = [
                            quantize_py(sums[c][j] / cnts[c] / QUANT)
                            for j in range(d)
                        ]
                    else:
                        donor = max(range(k), key=lambda x: far[x][0])
                        if far[donor][0] > 0:
                            cents[c] = list(subs[far[donor][1]])
                            far[donor] = (-1, 0)
        else:
            cents = [list(c) for c in subs[:k]]
        books.append(cents)
    return books


def _arr_lit(xs: list[int]) -> str:
    return "array(" + ", ".join(f"{int(x)}L" for x in xs) + ")"


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes_col: str = "codes",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<bigint>[m], *keep): per subspace, the index of
    the squared-L2-nearest centroid (tie → lowest code). Pure
    projection — literal centroid arrays, zip_with/aggregate distances,
    argmin via array_position. No shuffle, no UDF."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    out = with_ivec(df, vec_col)
    code_exprs = []
    for s in range(m):
        cents = "array(" + ", ".join(_arr_lit(c) for c in codebooks[s]) + ")"
        dists = (f"transform({cents}, c -> aggregate("
                 f"zip_with(slice(_iv, {s * d + 1}, {d}), c,"
                 f" (a, b) -> (a - b) * (a - b)),"
                 f" 0L, (acc, x) -> acc + x))")
        code_exprs.append(
            f"array_position({dists}, array_min({dists})) - 1")
    codes = "array(" + ", ".join(code_exprs) + ")"
    return out.select(id_col, F.expr(codes).alias(codes_col), *keep)


def adc_lut(codebooks: list[list[list[int]]],
            query_vec: list[float]) -> list[list[int]]:
    """m×k ADC table: LUT[s][c] = squared L2 between the query's s-th
    fixed-point subvector and centroid c. Driver-side python ints."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    q = [quantize_py(x) for x in query_vec]
    return [
        [_sq_l2(q[s * d:(s + 1) * d], c) for c in codebooks[s]]
        for s in range(m)
    ]


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[int]]],
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: distance = sum over
    subspaces of the literal LUT entry for that subspace's code.
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k heaps, only topk rows per partition cross the wire."""
    lut = adc_lut(codebooks, query_vec)
    lut_lit = ("array(" + ", ".join(_arr_lit(row) for row in lut) + ")")
    dist = (f"aggregate(transform({codes_col}, (c, s) ->"
            f" element_at(element_at({lut_lit}, CAST(s + 1 AS INT)),"
            f" CAST(c + 1 AS INT))), 0L, (acc, x) -> acc + x)")
    return (encoded
            .select(id_col, F.expr(dist).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
            .limit(topk))


# ------------------------------------------------------------- IVF-PQ

def _ivfpq_sidecar(path: str) -> str:
    return path.rstrip("/") + "_ivfpq.json"


def write_ivfpq_partitioned(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: str = "positional",
    pq_mode: str = "positional",
) -> None:
    """The full 10^10-row ANN serving layout: rows are routed to their
    IVF inverted list (max-cosine centroid, similarity.py semantics)
    AND compressed to PQ codes, then written partitioned by ``ivf_cid``
    with ONLY (id, codes) inside — the raw vector column never reaches
    the serving table (m int8-range codes vs dim floats: ~32× smaller
    at m=8, dim=64). A query prunes non-probed list directories at the
    FILE level and ADC-scans codes, so probe cost ∝ probed-list bytes,
    not corpus bytes. Centroids + codebooks persist in a JSON sidecar
    (the index metadata: n_centroids×dim floats + m×k×dsub ints)."""
    import json

    from .similarity import _resolve_centroids, with_ivf_assignment

    cents = _resolve_centroids(df, n_centroids, vec_col, id_col, centroids)
    books = pq_train(df, m=m, k=k_codes, vec_col=vec_col, id_col=id_col,
                     mode=pq_mode)
    assigned = with_ivf_assignment(df, cents, vec_col)
    pq_encode(assigned, books, vec_col, id_col, keep=("ivf_cid",)) \
        .write.mode("overwrite").partitionBy("ivf_cid").parquet(path)
    with open(_ivfpq_sidecar(path), "w") as fh:
        json.dump({"centroid_mode": centroids, "pq_mode": pq_mode,
                   "centroids": cents, "codebooks": books}, fh)


def ann_topk_ivfpq_partitioned(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the IVF-PQ layout: probe the nprobe max-cosine
    inverted lists (partition pruning — non-probed directories are
    never opened), then asymmetric-distance scan of the codes. Returns
    (id, adc_dist); ties break to the lowest id."""
    import json

    from .similarity import _ivf_probe

    with open(_ivfpq_sidecar(path)) as fh:
        meta = json.load(fh)
    cents = [(int(c), list(map(float, v))) for c, v in meta["centroids"]]
    books = [[[int(x) for x in cent] for cent in sub]
             for sub in meta["codebooks"]]
    probe = _ivf_probe(cents, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("ivf_cid").isin(probe))
    return pq_adc_topk(cand, books, query_vec, topk=k, id_col=id_col)
