"""Multimodal column handling: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched UDFs over mapInPandas.

What is REAL here (fully implemented + tested):
- image decode (PNG/qpng via core/images.py), resize (area/block-mean),
  grayscale feature vector, phash — the full Spark-side plumbing: schema,
  partitioning, UDF signatures, Arrow batch shapes.

What is a clearly-marked STUB (no codec libraries in this container):
- JPEG DCT decode (core/images.py qpng stands in, see its docstring),
- audio decode + video frame-sample: ``NotImplementedError`` for real
  codecs, with a deterministic fake behind ``allow_fake=True`` so the
  batch plumbing is exercised end-to-end by tests. Swapping in
  PIL/ffmpeg touches ONLY the kernel bodies, never the Spark plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.images import decode, phash64

RESIZE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "out_w int, out_h int, pixels binary")
FEATURE_SCHEMA = "image_id string, feature array<float>, phash long"
FRAME_SCHEMA = "media_id string, frame_idx int, frame binary"


def block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resize (real implementation, numpy only)."""
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
    return out


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """mapInPandas image resize: decode → block-mean → raw RGB out.
    Input df needs (image_id, bytes, w, h, fmt)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for buf, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = decode(buf, fmt)
                pixels.append(block_mean_resize(px, out_w, out_h).tobytes())
            pdf = pdf[["image_id", "bytes", "w", "h", "fmt"]].copy()
            pdf["out_w"] = np.int32(out_w)
            pdf["out_h"] = np.int32(out_h)
            pdf["pixels"] = pixels
            yield pdf

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, RESIZE_SCHEMA)


def image_features(df: DataFrame, grid: int = 4) -> DataFrame:
    """Decode → grid×grid grayscale block means as the feature vector +
    phash. The cheap CPU-only stand-in for a vision-model embedding; the
    plumbing (binary in, array<float> out, Arrow batches) is the real part."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes = [], []
            for buf, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = decode(buf, fmt)
                small = block_mean_resize(px, grid, grid).astype(np.float32)
                gray = small.mean(axis=2) / 255.0
                feats.append(gray.flatten().tolist())
                hashes.append(phash64(px))
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "feature": feats,
                "phash": pd.Series(hashes, dtype="int64"),
            })

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, FEATURE_SCHEMA)


def decode_audio(buf: bytes, fmt: str, allow_fake: bool = False) -> np.ndarray:
    """STUB: no audio codec in this container. With allow_fake, returns a
    deterministic pseudo-waveform derived from the byte content so the
    Spark plumbing can be tested; raises otherwise."""
    if not allow_fake:
        raise NotImplementedError(
            "audio decode requires an external codec (not in this container); "
            "pass allow_fake=True for the deterministic test stand-in")
    seed = int.from_bytes(buf[:8].ljust(8, b"\0"), "little", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(1600).astype(np.float32)


def sample_frames(df: DataFrame, every_n: int = 10, n_frames: int = 3,
                  allow_fake: bool = False) -> DataFrame:
    """Frame sampling over a video BINARY column (media_id, bytes, fmt).

    STUB codec: with allow_fake the 'frames' are deterministic byte slices
    of the container payload (so batch shape, explode-like fan-out and
    partitioning are all real); raises NotImplementedError otherwise.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["bytes"]):
                if not allow_fake:
                    raise NotImplementedError(
                        "video decode requires an external codec; "
                        "pass allow_fake=True for the test stand-in")
                data = bytes(buf)
                for fi in range(n_frames):
                    off = (fi * every_n) % max(len(data), 1)
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(data[off : off + 64])
            yield pd.DataFrame({
                "media_id": ids,
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": frames,
            })

    return df.select(F.col("media_id"), F.col("bytes")).mapInPandas(run, FRAME_SCHEMA)
