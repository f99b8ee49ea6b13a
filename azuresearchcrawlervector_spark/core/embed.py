"""Deterministic pseudo-embeddings (no network — the reference calls
Azure OpenAI per page, ``AzureSearchIndexer.cs:185-191``; BASELINE.json
replaces that with a deterministic synthetic equivalent).

Same call signature as the reference's embedding path: text → float[dim],
input truncated to 8,000 chars first (``AzureSearchIndexer.cs:174-177``).
The vector is derived from BLAKE2b(text) expanded blockwise, then
L2-normalized — so equal texts get equal vectors, near-duplicate texts do
NOT (it is a hash, not a semantic model; semantic similarity ops use the
``embeddings`` test table instead).
"""

from __future__ import annotations

import hashlib

import numpy as np

TRUNCATE_CHARS = 8000  # AzureSearchIndexer.cs:174-177
DEFAULT_DIM = 128      # CLI-tunable in the reference (--azureOpenAIEmbeddingDimensions)


def pseudo_embed(text: str | None, dim: int = DEFAULT_DIM) -> np.ndarray:
    """text → float32[dim], unit-norm, deterministic."""
    t = (text or "")[:TRUNCATE_CHARS].encode("utf-8")
    n_u32 = dim
    out = np.empty(n_u32, dtype=np.uint32)
    pos = 0
    counter = 0
    while pos < n_u32:
        block = hashlib.blake2b(t, digest_size=64, salt=counter.to_bytes(8, "little")).digest()
        vals = np.frombuffer(block, dtype="<u4")
        take = min(len(vals), n_u32 - pos)
        out[pos : pos + take] = vals[:take]
        pos += take
        counter += 1
    vec = (out.astype(np.float64) / 2**31) - 1.0  # uniform in [-1, 1)
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec = vec / norm
    return vec.astype(np.float32)
