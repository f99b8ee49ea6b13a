"""Optional C kernel for the baseline-JPEG entropy decoder.

The pure-python/numpy decoder in core/jpeg.py plateaus at ~1 us per
Huffman symbol per core — an interpreter floor, not an algorithmic one
(BENCH/BASELINE.md "jpeg decode"). This module removes that floor when
a C compiler is present: the per-symbol loop of ``_decode_scan_lut``
— and ONLY that loop; header parse, de-stuffing, dequant, IDCT and
color stay in numpy — is compiled at first use with the system ``cc``
into a ~60-line shared object and called through ctypes.

Design constraints:

- **Bit-identical to the python LUT path.** The C loop consumes the
  same de-stuffed scan bytes and the same packed ``(sym << 5) | len``
  2^16 LUTs (core/jpeg._lut16_arr) and implements the same window
  semantics, including the 16-bit zero-padded tail and the same three
  failure modes (invalid code, AC run past block end, truncated scan).
  tests/test_cjpeg.py pins decode parity against engine="lut".
- **Zero install, graceful fallback.** The C source is embedded in
  this .py file (so ``spark-submit --py-files`` ships it to every
  executor like any other module); each host compiles it once into a
  content-addressed .so under the system temp dir. No compiler, a
  failed compile, or ``ACS_CJPEG=0`` → ``available()`` is False and
  core/jpeg.py keeps using the pure-python engines. Nothing is ever
  pip/apt installed.
- **Race-safe.** Concurrent Spark python workers may compile at once:
  each compiles to a unique temp name and ``os.replace``s it into
  place (atomic on POSIX), so the winner is a complete .so.

Reference provenance: this accelerates the decode half of the fetch
invariant (BASELINE.json input_hint: decoded-pixel PSNR >= 40 dB for
lossy formats) — the reference crawler delegates image handling to
Azure services (AzureSearchCrawler/AzureSearchIndexer.cs), so the
codec itself is built from the public JPEG standard (ITU-T T.81).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>

/* 16-bit window starting at bit p over seg[0..n_bytes), zero-padded
   past the end; mirrors core/jpeg._scan_windows exactly.  Reads at
   p >= n_bits + 16 are the python path's IndexError -> truncated. */
#define WIN(out)                                                   \
    do {                                                           \
        if (p >= lim) return 3;                                    \
        int64_t by = p >> 3;                                       \
        int sh = (int)(p & 7);                                     \
        uint32_t v = 0;                                            \
        for (int i_ = 0; i_ < 4; i_++)                             \
            v = (v << 8) |                                         \
                (by + i_ < n_bytes ? seg[by + i_] : 0u);           \
        (out) = (v >> (16 - sh)) & 0xFFFFu;                        \
    } while (0)

/* Interleaved 1x1-MCU baseline scan decode.
   seg     : de-stuffed entropy-coded scan bytes
   luts    : 6 x 65536 int32, (sym << 5) | code_len, 0 = invalid,
             order dc0, ac0, dc1, ac1, dc2, ac2
   coeffs  : 3 * n_mcus * 64 int32, zero-initialised, zigzag order,
             component-major ([c][mcu][k])
   returns : 0 ok, 1 invalid Huffman code, 2 AC run past block end,
             3 truncated scan  (same cases as _decode_scan_lut) */
int64_t acs_decode_scan(const uint8_t *seg, int64_t n_bytes,
                        const int32_t *luts, int64_t n_mcus,
                        int32_t *coeffs)
{
    const int64_t lim = n_bytes * 8 + 16;
    int64_t p = 0;
    int32_t prev_dc[3] = {0, 0, 0};
    for (int64_t mcu = 0; mcu < n_mcus; mcu++) {
        for (int c = 0; c < 3; c++) {
            const int32_t *dlut = luts + (int64_t)(2 * c) * 65536;
            const int32_t *alut = dlut + 65536;
            int32_t *blk = coeffs + ((int64_t)c * n_mcus + mcu) * 64;
            uint32_t w;
            int32_t e, s;
            WIN(w);
            e = dlut[w];
            if (!e) return 1;
            p += e & 31;
            s = e >> 5;
            if (s) {
                WIN(w);
                int32_t v = (int32_t)(w >> (16 - s));
                p += s;
                prev_dc[c] += (v >= (1 << (s - 1)))
                                  ? v : v - (1 << s) + 1;
            }
            blk[0] = prev_dc[c];
            int k = 1;
            while (k < 64) {
                WIN(w);
                e = alut[w];
                if (!e) return 1;
                p += e & 31;
                int32_t rs = e >> 5;
                s = rs & 0xF;
                if (s == 0) {
                    if (rs == 0xF0) { k += 16; continue; } /* ZRL */
                    break;                                 /* EOB */
                }
                k += rs >> 4;
                if (k > 63) return 2;
                WIN(w);
                int32_t v = (int32_t)(w >> (16 - s));
                p += s;
                blk[k] = (v >= (1 << (s - 1))) ? v : v - (1 << s) + 1;
                k++;
            }
        }
    }
    return 0;
}
"""

_ERRORS = {
    1: "invalid Huffman code",
    2: "AC run past block end",
    3: "truncated entropy-coded scan",
}

_lib: ctypes.CDLL | None = None
_lib_tried = False


def _build() -> ctypes.CDLL | None:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    sha = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"acs_cjpeg_{sha}.so")
    if not os.path.exists(so_path):
        tmpdir = tempfile.mkdtemp(prefix="acs_cjpeg_")
        try:
            src = os.path.join(tmpdir, "acs_cjpeg.c")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            tmp_so = os.path.join(tmpdir, "acs_cjpeg.so")
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp_so, so_path)  # atomic: losers overwrite alike
        except Exception:
            return None
        finally:
            shutil.rmtree(tmpdir, ignore_errors=True)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.acs_decode_scan.restype = ctypes.c_int64
    lib.acs_decode_scan.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    return lib


def available() -> bool:
    """True iff the compiled kernel is usable in this process."""
    global _lib, _lib_tried
    if not _lib_tried:
        _lib_tried = True
        if os.environ.get("ACS_CJPEG", "1") not in ("0", "false", ""):
            _lib = _build()
    return _lib is not None


def decode_scan(seg: np.ndarray, luts: np.ndarray,
                n_mcus: int) -> np.ndarray:
    """De-stuffed scan bytes + packed LUT bank -> (3, n_mcus, 64) int32
    zigzag coefficients. Raises ValueError with the same messages as
    core/jpeg._decode_scan_lut on malformed streams."""
    if not available():  # pragma: no cover - callers gate on available()
        raise RuntimeError("C jpeg kernel unavailable")
    seg = np.ascontiguousarray(seg, dtype=np.uint8)
    assert luts.dtype == np.int32 and luts.size == 6 * 65536
    coeffs = np.zeros(3 * n_mcus * 64, dtype=np.int32)
    rc = _lib.acs_decode_scan(
        seg.ctypes.data, seg.size, luts.ctypes.data, n_mcus,
        coeffs.ctypes.data)
    if rc:
        raise ValueError(_ERRORS.get(int(rc), f"decode error {rc}"))
    return coeffs.reshape(3, n_mcus, 64)
