"""Compiled JPEG entropy kernel (core/cjpeg.py): bit-parity with the
pure-python engines, error-mode parity, batch isolation, and the
lane-path fallback staying equivalent when the kernel is disabled.

The kernel compiles the per-symbol Huffman loop with the system cc at
first use; everything else (headers, de-stuff, dequant, IDCT, color)
is the SAME numpy tail for every engine, so parity here pins the only
code that differs."""
import numpy as np
import pytest

from azuresearchcrawlervector_spark.core import cjpeg, jpeg

pytestmark = pytest.mark.skipif(
    not cjpeg.available(), reason="no C compiler on this host")


def _images(seed=11):
    rng = np.random.default_rng(seed)
    cases = []
    for shape, q in [((8, 8, 3), 50), ((16, 16, 3), 90), ((31, 17, 3), 70),
                     ((64, 48, 3), 85), ((128, 96, 3), 95)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        cases.append((px, q, jpeg.jpeg_encode(px, q)))
    return cases


def test_c_engine_matches_reconstruct_and_python_engines():
    for px, q, enc in _images():
        rec = jpeg.reconstruct(px, q)
        c = jpeg.jpeg_decode(enc, engine="c")
        assert np.array_equal(c, rec)
        assert np.array_equal(c, jpeg.jpeg_decode(enc, engine="lut"))
        assert np.array_equal(c, jpeg.jpeg_decode(enc, engine="bitwise"))


def test_c_engine_error_parity():
    _px, _q, enc = _images()[3]
    for corrupt in (enc[:len(enc) - 8], enc[:40]):
        errs = {}
        for eng in ("lut", "c"):
            try:
                jpeg.jpeg_decode(corrupt, engine=eng)
                errs[eng] = None
            except ValueError as e:
                errs[eng] = str(e)
        assert errs["lut"] == errs["c"], corrupt[:8]


def test_batch_c_path_parity_isolation_and_flush():
    rng = np.random.default_rng(3)
    datas = [jpeg.jpeg_encode(
        rng.integers(0, 256, (64, 48, 3), dtype=np.uint8), 85)
        for _ in range(40)]
    datas[5] = datas[5][:60]     # truncated scan
    datas[17] = b"not a jpeg"    # bad headers
    # tiny flush budget exercises the mid-batch _assemble_rgb flush
    old = jpeg._BATCH_MAX_COEFF
    jpeg._BATCH_MAX_COEFF = 3 * 48 * 128 * 4  # ~4 images per flush
    try:
        res = jpeg.jpeg_decode_batch(datas)
    finally:
        jpeg._BATCH_MAX_COEFF = old
    for i, d in enumerate(datas):
        if i in (5, 17):
            assert res[i] is None
        else:
            assert np.array_equal(res[i], jpeg.jpeg_decode(d, engine="c"))


def test_batch_position_independence():
    """An image decodes identically alone, in a small batch, and in a
    large mixed batch — the tail is per-block deterministic (no
    height-dependent GEMM summation order)."""
    rng = np.random.default_rng(9)
    datas = [jpeg.jpeg_encode(
        rng.integers(0, 256, (64, 48, 3), dtype=np.uint8), 85)
        for _ in range(120)]
    alone = jpeg.jpeg_decode_batch(datas[:1])[0]
    small = jpeg.jpeg_decode_batch(datas[:10])[0]
    large = jpeg.jpeg_decode_batch(datas)[0]
    assert np.array_equal(alone, small)
    assert np.array_equal(alone, large)


def test_lane_fallback_equivalent_when_kernel_disabled(monkeypatch):
    """ACS_CJPEG=0 hosts (no compiler) take the lane decoder — same
    bytes out."""
    rng = np.random.default_rng(5)
    datas = [jpeg.jpeg_encode(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8), q)
        for h, w, q in [(16, 16, 90), (64, 48, 85), (24, 24, 95)]]
    datas.append(datas[0][:50])
    with_c = jpeg.jpeg_decode_batch(datas)
    monkeypatch.setattr(cjpeg, "_lib", None)
    monkeypatch.setattr(cjpeg, "_lib_tried", True)
    assert not cjpeg.available()
    without_c = jpeg.jpeg_decode_batch(datas)
    for a, b in zip(with_c, without_c):
        if a is None:
            assert b is None
        else:
            assert np.array_equal(a, b)


def test_auto_engine_prefers_c():
    _px, q, enc = _images()[1]
    assert np.array_equal(jpeg.jpeg_decode(enc),
                          jpeg.jpeg_decode(enc, engine="c"))
