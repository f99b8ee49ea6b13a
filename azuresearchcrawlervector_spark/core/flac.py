"""FLAC codec — REAL lossless compressed audio, from the public spec
(RFC 9639 / the classic flac.sourceforge format document), pure
numpy + stdlib.  No codec library: every bit below is written and read
by this module.

Why it belongs here: the multimodal audio family so far carries real
WAVE/PCM, G.711 µ-law, IMA ADPCM (all lossy-or-uncompressed) plus
container-level metadata for Ogg and MPEG audio.  FLAC is the missing
kind — a genuinely *compressed lossless* web-native format — and it is
the one compressed codec whose correctness can be pinned EXACTLY:
decode(encode(pcm)) == pcm bit-for-bit, plus three independent
spec-integrity layers (CRC-8 per frame header, CRC-16 per frame,
MD5 of the raw PCM in STREAMINFO).

Coverage of the format, honestly stated:
- encoder: 16-bit PCM, mono/stereo; CONSTANT / FIXED(0-4) / LPC
  (Levinson-Durbin, error-feedback coefficient quantization) / VERBATIM
  subframes chosen per channel per frame by estimated cost; rice and
  rice2 partitioned residuals (escape partitions when cheaper); wasted
  bits-per-sample detection; independent / left-side / right-side /
  mid-side stereo decorrelation with per-frame auto selection.
- decoder: everything the spec allows for 8/12/16/20/24-bit streams
  EXCEPT >2 channels (training-audio scope; raises clearly), all four
  channel assignments, all blocksize/sample-rate/sample-size header
  codes, wasted bits, escape partitions, CRC-8 + CRC-16 + MD5 verified.

Scale note (same disclosure as the JPEG path): rice bit-unpacking and
LPC restoration are per-sample Python inside an Arrow batch kernel —
fixture-scale throughput, embarrassingly parallel across rows; a
production deployment swaps libFLAC into the same kernel body.

Reference scope: the reference crawler (AzureSearchCrawler/*.cs) has no
media pipeline — this belongs to the beyond-the-reference multimodal
family (SURVEY.md "multimodal columns").
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs
# CRC-8 poly x^8+x^2+x+1 (0x07), init 0; CRC-16 poly 0x8005, init 0 —
# both defined by the FLAC spec, tables built here.
_CRC8_TABLE = np.zeros(256, dtype=np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE[_i] = _c

_CRC16_TABLE = np.zeros(256, dtype=np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE[_i] = _c


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------ bit I/O
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos          # byte position of the NEXT unread byte
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        out = (self.acc >> self.nbits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


# ------------------------------------------------- header code tables
_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                      22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                      96000: 11}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SAMPLE_SIZE_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE = 8, 9, 10


def _utf8_code(n: int) -> bytes:
    """The spec's 'UTF-8 style' extended coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):   # n-byte seq carries 5n+1 bits
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | n)
    return bytes(reversed(out))


def _utf8_decode(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8-coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ------------------------------------------------------- rice residual
def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.uint64)


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int((u >> np.uint64(param)).sum()) + len(u) * (param + 1)


def _best_rice_param(u: np.ndarray, max_param: int) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, max_param + 1):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_residual(w: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int) -> None:
    """Partitioned rice coding: pick partition order (≥64 samples per
    partition when the blocksize allows), per-partition optimal param,
    escape to raw when cheaper, rice2 when a param needs 5 bits."""
    p_order = 0
    while (p_order < 4 and blocksize % (1 << (p_order + 1)) == 0
           and (blocksize >> (p_order + 1)) >= max(order + 1, 64)):
        p_order += 1
    n_part = 1 << p_order
    part_len = blocksize >> p_order
    u = _zigzag(res)
    # choose method: rice2 iff some partition's optimal param exceeds 14
    parts = []
    use_rice2 = False
    idx = 0
    for k in range(n_part):
        ln = part_len - (order if k == 0 else 0)
        pu = u[idx:idx + ln]
        idx += ln
        param, cost = _best_rice_param(pu, 30)
        raw_bits = int(pu.max()).bit_length() + 1 if len(pu) and pu.max() else 0
        esc_cost = 5 + raw_bits * len(pu)
        parts.append((pu, param, cost, raw_bits, esc_cost))
        if param > 14 and esc_cost >= cost:
            use_rice2 = True
    pbits = 5 if use_rice2 else 4
    esc = (1 << pbits) - 1
    w.write(1 if use_rice2 else 0, 2)
    w.write(p_order, 4)
    for pu, param, cost, raw_bits, esc_cost in parts:
        if esc_cost < cost or param >= esc:
            w.write(esc, pbits)              # escape partition
            w.write(raw_bits, 5)
            if raw_bits:
                signed = pu.astype(np.int64)
                vals = np.where(signed & 1, -((signed + 1) >> 1), signed >> 1)
                for v in vals.tolist():
                    w.write_signed(int(v), raw_bits)
        else:
            w.write(param, pbits)
            sh = np.uint64(param)
            qs = (pu >> sh).tolist()
            lows = (pu & np.uint64((1 << param) - 1)).tolist()
            for q, low in zip(qs, lows):
                w.write_unary(int(q))
                w.write(int(low), param)


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    p_order = r.read(4)
    n_part = 1 << p_order
    if blocksize % n_part:
        raise ValueError("flac: blocksize not divisible by partitions")
    part_len = blocksize >> p_order
    out: list[int] = []
    for k in range(n_part):
        ln = part_len - (order if k == 0 else 0)
        if ln < 0:
            raise ValueError("flac: predictor order exceeds partition")
        param = r.read(pbits)
        if param == esc:
            raw_bits = r.read(5)
            if raw_bits == 0:
                out.extend([0] * ln)
            else:
                out.extend(r.read_signed(raw_bits) for _ in range(ln))
        else:
            for _ in range(ln):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append(-((u + 1) >> 1) if u & 1 else u >> 1)
    return np.asarray(out, dtype=np.int64)


# -------------------------------------------------- fixed predictors
# residual of FIXED order k is the k-th finite difference; restoring is
# k cumulative sums seeded by the warmup samples — fully vectorized.
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    d = x.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    return d


def _fixed_restore(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    if order == 0:
        return res.copy()
    # integrate one level at a time: D^(j)(x)[0] is computable from the
    # warmup alone, and D^(j)(x)[i+1] = D^(j)(x)[i] + D^(j+1)(x)[i]
    cur = res
    for j in range(order - 1, -1, -1):
        seed = warm.astype(np.int64)
        for _ in range(j):
            seed = np.diff(seed)
        cur = seed[0] + np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(cur)])
    return cur


# ------------------------------------------------------------- LPC
def _lpc_coeffs(x: np.ndarray, order: int) -> np.ndarray | None:
    """Levinson-Durbin on the autocorrelation; float coefficients."""
    f = x.astype(np.float64)
    n = len(f)
    if n <= order:
        return None
    ac = np.array([np.dot(f[:n - k], f[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1])
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            return None
    return a


def _quantize_lpc(a: np.ndarray, precision: int = 12) -> tuple[np.ndarray, int]:
    """Error-feedback quantization; returns (int coeffs, shift)."""
    cmax = float(np.abs(a).max())
    if cmax <= 0:
        return np.zeros(len(a), dtype=np.int64), 0
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.zeros(len(a), dtype=np.int64)
    err = 0.0
    lo, hi = -(1 << (precision - 1)), (1 << (precision - 1)) - 1
    for i, c in enumerate(a):
        v = c * (1 << shift) + err
        qi = int(np.clip(round(v), lo, hi))
        err = v - qi
        q[i] = qi
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """Integer prediction residual, exactly the decoder's arithmetic."""
    order = len(q)
    xi = x.astype(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(xi[:-1], order)
    pred = (win @ q[::-1]) >> shift
    return xi[order:] - pred


def _lpc_restore(warm: np.ndarray, res: np.ndarray, q: np.ndarray,
                 shift: int) -> np.ndarray:
    # IIR feedback — inherently sequential; python ints (exact, any bps)
    order = len(q)
    out = [int(v) for v in warm]
    coefs = [int(c) for c in q]
    for e in res.tolist():
        acc = 0
        for j in range(order):
            acc += coefs[j] * out[-1 - j]
        out.append(int(e) + (acc >> shift))
    return np.asarray(out, dtype=np.int64)


# ------------------------------------------------------ subframe codec
def _subframe_cost_fixed(x: np.ndarray, order: int) -> int:
    res = _fixed_residual(x, order)
    if not len(res):
        return 0
    u = _zigzag(res)
    _, c = _best_rice_param(u, 30)
    return c


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = len(x)
    # wasted bits: common trailing zeros across all samples
    wasted = 0
    orv = int(np.bitwise_or.reduce(x.astype(np.int64)) & ((1 << bps) - 1))
    if orv:
        wasted = (orv & -orv).bit_length() - 1
    if wasted:
        x = (x.astype(np.int64) >> wasted)
    eff_bps = bps - wasted

    def emit_header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if n and np.all(x == x[0]):
        emit_header(0)
        w.write_signed(int(x[0]), eff_bps)
        return

    # candidates: FIXED 0-4, LPC(8)
    best = None  # (cost, kind, payload)
    max_fixed = min(4, n - 1) if n > 1 else 0
    for order in range(0, max_fixed + 1):
        c = _subframe_cost_fixed(x, order) + order * eff_bps
        if best is None or c < best[0]:
            best = (c, "fixed", order)
    lpc_order = min(8, n - 1)
    if lpc_order >= 1 and n > lpc_order * 2:
        a = _lpc_coeffs(x, lpc_order)
        if a is not None and np.isfinite(a).all():
            q, shift = _quantize_lpc(a)
            if np.any(q):
                res = _lpc_residual(x, q, shift)
                u = _zigzag(res)
                _, c = _best_rice_param(u, 30)
                c += lpc_order * eff_bps + 4 + 5 + lpc_order * 12
                if c < best[0]:
                    best = (c, "lpc", (q, shift))
    verbatim_cost = n * eff_bps
    if best[0] >= verbatim_cost:
        emit_header(1)
        for v in x.tolist():
            w.write_signed(int(v), eff_bps)
        return
    if best[1] == "fixed":
        order = best[2]
        emit_header(8 + order)
        for v in x[:order].tolist():
            w.write_signed(int(v), eff_bps)
        _write_residual(w, _fixed_residual(x, order), n, order)
    else:
        q, shift = best[2]
        order = len(q)
        emit_header(32 + order - 1)
        for v in x[:order].tolist():
            w.write_signed(int(v), eff_bps)
        w.write(12 - 1, 4)              # qlp precision-1
        w.write(shift, 5)               # signed field, we emit >= 0
        for c in q.tolist():
            w.write_signed(int(c), 12)
        _write_residual(w, _lpc_residual(x, q, shift), n, order)


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    type_code = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff_bps = bps - wasted
    if type_code == 0:                                    # CONSTANT
        v = r.read_signed(eff_bps)
        x = np.full(blocksize, v, dtype=np.int64)
    elif type_code == 1:                                  # VERBATIM
        x = np.asarray([r.read_signed(eff_bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= type_code <= 12:                            # FIXED
        order = type_code - 8
        warm = np.asarray([r.read_signed(eff_bps) for _ in range(order)],
                          dtype=np.int64)
        res = _read_residual(r, blocksize, order)
        x = _fixed_restore(warm, res, order)
    elif type_code >= 32:                                 # LPC
        order = (type_code & 31) + 1
        warm = np.asarray([r.read_signed(eff_bps) for _ in range(order)],
                          dtype=np.int64)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read(5)
        if shift & 0x10:
            shift -= 32
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        q = np.asarray([r.read_signed(prec) for _ in range(order)],
                       dtype=np.int64)
        res = _read_residual(r, blocksize, order)
        x = _lpc_restore(warm, res, q, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {type_code}")
    if wasted:
        x = x << wasted
    return x


# ------------------------------------------------------- stereo modes
def _stereo_channels(l: np.ndarray, r: np.ndarray, mode: str):
    li, ri = l.astype(np.int64), r.astype(np.int64)
    if mode == "independent":
        return [li, ri]
    if mode == "left_side":
        return [li, li - ri]
    if mode == "right_side":
        return [li - ri, ri]
    if mode == "mid_side":
        return [(li + ri) >> 1, li - ri]
    raise ValueError(f"unknown stereo mode {mode!r}")


def _pick_stereo_mode(l: np.ndarray, r: np.ndarray) -> str:
    def est(x: np.ndarray) -> float:
        d = np.diff(np.diff(x.astype(np.int64)))
        m = float(np.abs(d).mean()) if len(d) else 0.0
        return np.log2(m + 1.0) + 1.0
    li, ri = l.astype(np.int64), r.astype(np.int64)
    side = li - ri
    mid = (li + ri) >> 1
    costs = {"independent": est(li) + est(ri),
             "left_side": est(li) + est(side),
             "right_side": est(side) + est(ri),
             "mid_side": est(mid) + est(side)}
    return min(costs, key=costs.get)


_MODE_TO_CODE = {"left_side": _CH_LEFT_SIDE, "right_side": _CH_RIGHT_SIDE,
                 "mid_side": _CH_MID_SIDE}


# --------------------------------------------------------- encoder
def flac_encode(samples: np.ndarray, sample_rate: int = 16_000,
                stereo_mode: str = "auto", block_size: int = 4096) -> bytes:
    """mono/stereo int16 PCM → FLAC bytes. Lossless by construction;
    tests pin decode(encode(x)) == x exactly plus the spec's CRC/MD5."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("flac_encode expects int16 PCM")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if ch not in (1, 2):
        raise ValueError("flac_encode supports mono/stereo")
    bps = 16
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    frames = bytearray()
    for fi, b0 in enumerate(range(0, max(n, 1), block_size)):
        blk = s[b0:b0 + block_size]
        bs = len(blk)
        if bs == 0:
            break
        if ch == 2:
            mode = (_pick_stereo_mode(blk[:, 0], blk[:, 1])
                    if stereo_mode == "auto" else stereo_mode)
            chans = _stereo_channels(blk[:, 0], blk[:, 1], mode)
            ch_code = _MODE_TO_CODE.get(mode, 1)
            side_idx = {_CH_LEFT_SIDE: 1, _CH_RIGHT_SIDE: 0,
                        _CH_MID_SIDE: 1}.get(ch_code, -1)
        else:
            chans = [blk[:, 0].astype(np.int64)]
            ch_code, side_idx = 0, -1

        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)                      # reserved
        w.write(0, 1)                      # fixed-blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs)
        explicit_bs = None
        if bs_code is None:
            bs_code, explicit_bs = (6, bs - 1) if bs <= 256 else (7, bs - 1)
        w.write(bs_code, 4)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_CODES[bps], 3)
        w.write(0, 1)                      # reserved
        for b in _utf8_code(fi):
            w.write(b, 8)
        if explicit_bs is not None:
            w.write(explicit_bs, 8 if bs_code == 6 else 16)
        w.align()              # header is byte-aligned by construction
        w.write(crc8(bytes(w.buf)), 8)
        for ci, x in enumerate(chans):
            _write_subframe(w, x, bps + (1 if ci == side_idx else 0))
        w.align()
        body = w.getvalue()
        frames += body + struct.pack(">H", crc16(body))

    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size if n else 0, 16)       # min blocksize
    si.write(block_size if n else 0, 16)       # max blocksize
    si.write(0, 24)                            # min framesize unknown
    si.write(0, 24)                            # max framesize unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    info = si.getvalue() + md5
    header = _MAGIC + bytes([0x80 | 0]) + len(info).to_bytes(3, "big") + info
    return header + bytes(frames)


# --------------------------------------------------------- decoder
def is_flac(data: bytes) -> bool:
    return bytes(data[:4]) == _MAGIC


def flac_parse(data: bytes) -> dict:
    """STREAMINFO metadata — the cheap audit read (no frame decode)."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: missing STREAMINFO")
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        block = data[pos + 4:pos + 4 + size]
        if hdr & 0x7F == 0:
            r = _BitReader(block)
            r.read(16), r.read(16), r.read(24), r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = block[18:34]
            return {"codec": "flac", "channels": ch, "sample_rate": rate,
                    "bits_per_sample": bps, "total_samples": total,
                    "duration_s": round(total / rate, 6) if rate else 0.0,
                    "md5": md5.hex()}
        pos += 4 + size
        if hdr & 0x80:
            raise ValueError("flac: missing STREAMINFO")


def flac_decode(data: bytes, verify: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n, ch) int16 PCM, sample_rate). Verifies CRC-8 on
    every frame header, CRC-16 on every frame, and the STREAMINFO MD5
    over the decoded PCM (verify=False skips only the MD5)."""
    data = bytes(data)
    info = flac_parse(data)
    rate, n_ch, bps = (info["sample_rate"], info["channels"],
                       info["bits_per_sample"])
    if n_ch > 2:
        raise ValueError("flac: >2 channels out of scope")
    # skip metadata blocks
    pos = 4
    while True:
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        pos += 4 + size
        if hdr & 0x80:
            break

    total = info["total_samples"]
    chans_out: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        start = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if r.read(1):
            raise ValueError("flac: reserved bit set")
        strategy = r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved bit set")
        _num = _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        if ss_code == 3:
            raise ValueError("flac: reserved sample-size code")
        frame_bps = _SAMPLE_SIZE_BITS[ss_code] if ss_code else bps
        hdr_end = r.pos
        stored_crc8 = r.read(8)
        if crc8(data[start:hdr_end]) != stored_crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_sub, side_idx = ch_code + 1, -1
        elif ch_code in (_CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE):
            n_sub = 2
            side_idx = 0 if ch_code == _CH_RIGHT_SIDE else 1
        else:
            raise ValueError("flac: reserved channel assignment")
        if n_sub != n_ch:
            raise ValueError("flac: frame channel count != STREAMINFO")

        subs = []
        for ci in range(n_sub):
            sub_bps = frame_bps + (1 if ci == side_idx else 0)
            subs.append(_read_subframe(r, bs, sub_bps))
        r.align()
        body_end = r.pos
        stored_crc16 = r.read(16)
        if crc16(data[start:body_end]) != stored_crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.pos

        if ch_code == _CH_LEFT_SIDE:
            left = subs[0]
            right = left - subs[1]
            subs = [left, right]
        elif ch_code == _CH_RIGHT_SIDE:
            right = subs[1]
            subs = [right + subs[0], right]
        elif ch_code == _CH_MID_SIDE:
            mid2 = (subs[0] << 1) | (subs[1] & 1)
            subs = [(mid2 + subs[1]) >> 1, (mid2 - subs[1]) >> 1]
        chans_out.append(np.stack(subs, axis=1))
        got += bs

    pcm64 = (np.concatenate(chans_out, axis=0) if chans_out
             else np.zeros((0, n_ch), dtype=np.int64))
    if total:
        pcm64 = pcm64[:total]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if len(pcm64) and (pcm64.min() < lo or pcm64.max() > hi):
        raise ValueError("flac: decoded sample out of range")
    pcm = pcm64.astype(np.int16) if bps <= 16 else pcm64.astype(np.int32)
    if verify and bps == 16:
        want = info["md5"]
        if want != "0" * 32:
            have = hashlib.md5(pcm.astype("<i2").tobytes()).hexdigest()
            if have != want:
                raise ValueError("flac: PCM MD5 mismatch")
    return pcm, rate
