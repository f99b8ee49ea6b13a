"""WAV PCM audio kernels — REAL codec, stdlib-only (`wave` + numpy).

Upgrades the audio half of the multimodal family from stub to real: WAV
is an actual container format and the stdlib parses it byte-for-byte, so
decode → feature-extract runs with no external codec libraries. MP3/OGG
etc. remain out of scope for this container (no codec libs) and raise.

Kernels are pure functions over numpy arrays, shared by the Arrow UDFs
(operators/multimodal.py) and the tests — the same twin-kernel pattern
as core/images.py.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """mono/stereo int16 PCM → WAV bytes. samples: (n,) or (n, ch)."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("wav_encode expects int16 PCM")
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) int16 PCM, sample_rate). Real parsing — a
    truncated/invalid RIFF header raises, it does not 'fake through'."""
    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {w.getsampwidth() * 8}-bit")
        n, ch, rate = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = w.readframes(n)
    pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return pcm, rate


def synth_tone(seed_id: str, duration_s: float = 0.1,
               sample_rate: int = 16_000) -> np.ndarray:
    """Deterministic test-signal: two seeded sine partials + low noise,
    int16 mono. Same role as images.generate_pixels."""
    seed = int.from_bytes(seed_id.encode()[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed % (2**32))
    f0 = float(rng.integers(200, 2000))
    t = np.arange(int(duration_s * sample_rate)) / sample_rate
    sig = (0.6 * np.sin(2 * np.pi * f0 * t)
           + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
           + 0.02 * rng.standard_normal(t.shape))
    return np.clip(sig * 32767 / 1.2, -32768, 32767).astype(np.int16)


# ------------------------------------------------------------- G.711 µ-law
# Real COMPRESSED audio (2:1): ITU-T G.711 µ-law companding, the
# public-domain Sun g711.c algorithm vectorized in numpy. Mini
# container: b"G711U" + u32le sample_rate + companded payload.
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
_ULAW_MAGIC = b"G711U"
# segment number = floor(log2(high byte)) (0 for 0) — Sun's seg lookup
_ULAW_SEG = np.zeros(256, dtype=np.int32)
for _v in range(1, 256):
    _ULAW_SEG[_v] = int(_v).bit_length() - 1


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → µ-law bytes (uint8), vectorized linear2ulaw."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = _ULAW_SEG[(mag >> 7) & 0xFF]
    mant = (mag >> (exp + 3)) & 0xF
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_expand(data: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 PCM, vectorized ulaw2linear."""
    u = ~np.asarray(data, dtype=np.uint8) & 0xFF
    t = (((u & 0xF).astype(np.int32) << 3) + _ULAW_BIAS) << ((u >> 4) & 7)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def g711u_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """mono int16 PCM → µ-law container bytes (half the size of 16-bit
    WAV — genuine compression with genuine segment-quantization loss)."""
    s = np.asarray(samples)
    if s.dtype != np.int16 or s.ndim != 1:
        raise ValueError("g711u_encode expects mono int16 PCM")
    return (_ULAW_MAGIC + int(sample_rate).to_bytes(4, "little")
            + ulaw_compress(s).tobytes())


def g711u_decode(data: bytes) -> tuple[np.ndarray, int]:
    data = bytes(data)
    if data[:5] != _ULAW_MAGIC:
        raise ValueError("not a G711U payload")
    rate = int.from_bytes(data[5:9], "little")
    pcm = ulaw_expand(np.frombuffer(data[9:], dtype=np.uint8))
    return pcm[:, None], rate


def audio_features(pcm: np.ndarray, sample_rate: int) -> dict:
    """RMS, zero-crossing rate (Hz), spectral centroid (Hz), duration —
    vectorized numpy over the mono mixdown."""
    mono = pcm.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    if n == 0:
        return {"rms": 0.0, "zcr_hz": 0.0, "centroid_hz": 0.0,
                "duration_s": 0.0, "sample_rate": sample_rate}
    rms = float(np.sqrt(np.mean(mono**2)))
    crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    zcr_hz = crossings / 2.0 / (n / sample_rate)
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    denom = float(spec.sum())
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {"rms": rms, "zcr_hz": float(zcr_hz), "centroid_hz": centroid,
            "duration_s": n / sample_rate, "sample_rate": sample_rate}


# --------------------------- IMA ADPCM (WAVE_FORMAT_IMA_ADPCM = 0x0011)
# A REAL predictive compressed-audio codec from the public IMA/DVI spec:
# 4 bits/sample (4:1 vs 16-bit PCM) via an adaptive-step-size delta
# quantizer with decoder-tracked state — unlike G.711's memoryless
# companding this has genuine prediction feedback, and it ships in the
# REAL WAVE container (fmt tag 0x11 + fact chunk + block-aligned data),
# which the stdlib `wave` module cannot parse — the RIFF walk below is
# the actual format, not a private wrapper. Per-sample loop is
# inherently sequential (predictor feedback); fixture-scale throughput,
# same disclosure as the pre-vectorization JPEG path.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                       -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_ADPCM_BLOCK_ALIGN = 256                      # mono: 4-byte header + 252 data
_ADPCM_SPB = (_ADPCM_BLOCK_ALIGN - 4) * 2 + 1  # 505 samples per block


def _adpcm_encode_block(samples: np.ndarray, predictor: int, index: int):
    """One mono block → (bytes, predictor', index'). samples[0] is
    stored verbatim in the header (IMA block format)."""
    out = bytearray(struct.pack("<hBB", int(samples[0]), index, 0))
    predictor = int(samples[0])
    nibbles = []
    for s in samples[1:]:
        step = int(_IMA_STEPS[index])
        diff = int(s) - predictor
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        vpdiff = step >> 3
        if code & 4:
            vpdiff += step
        if code & 2:
            vpdiff += step >> 1
        if code & 1:
            vpdiff += step >> 2
        predictor += -vpdiff if code & 8 else vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + int(_IMA_INDEX[code])))
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))  # low nibble first (IMA order)
    return bytes(out), predictor, index


def _adpcm_decode_block(block: bytes) -> np.ndarray:
    predictor, index, _rsv = struct.unpack("<hBB", block[:4])
    index = max(0, min(88, index))
    out = [predictor]
    for byte in block[4:]:
        for code in (byte & 0xF, byte >> 4):
            step = int(_IMA_STEPS[index])
            vpdiff = step >> 3
            if code & 4:
                vpdiff += step
            if code & 2:
                vpdiff += step >> 1
            if code & 1:
                vpdiff += step >> 2
            predictor += -vpdiff if code & 8 else vpdiff
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + int(_IMA_INDEX[code])))
            out.append(predictor)
    return np.asarray(out, dtype=np.int16)


def adpcm_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """mono int16 PCM → IMA-ADPCM WAV bytes (RIFF/WAVE, fmt tag 0x0011,
    fact chunk, 256-byte blocks — the real on-disk format)."""
    s = np.asarray(samples)
    if s.dtype != np.int16 or s.ndim != 1 or len(s) == 0:
        raise ValueError("adpcm_encode expects non-empty mono int16 PCM")
    data = bytearray()
    pred, idx = int(s[0]), 0
    for b0 in range(0, len(s), _ADPCM_SPB):
        chunk = s[b0:b0 + _ADPCM_SPB]
        block, pred, idx = _adpcm_encode_block(chunk, pred, idx)
        data += block.ljust(
            4 + (_ADPCM_SPB - 1 + 1) // 2, b"\x00")  # full block align
    fmt = struct.pack("<HHIIHHH H", 0x0011, 1, sample_rate,
                      sample_rate * _ADPCM_BLOCK_ALIGN // _ADPCM_SPB,
                      _ADPCM_BLOCK_ALIGN, 4, 2, _ADPCM_SPB)
    fact = struct.pack("<I", len(s))
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + bytes(data))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(data: bytes) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV bytes → ((n, 1) int16 PCM, sample_rate). Real RIFF
    walk; non-0x0011 format tags and truncated chunks raise."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(8 + struct.unpack("<I", data[4:8])[0], len(data))
    rate = block_align = n_samples = None
    blocks = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError("chunk overruns container")
        payload = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _bps, block_align = struct.unpack(
                "<HHIIH", payload[:14])
            if tag != 0x0011:
                raise ValueError(f"not IMA ADPCM (fmt tag 0x{tag:04X})")
            if ch != 1:
                raise ValueError("mono only")
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", payload[:4])
        elif cid == b"data":
            blocks = payload
        pos += 8 + size + (size % 2)
    if rate is None or blocks is None:
        raise ValueError("missing fmt /data chunks")
    out = []
    for b0 in range(0, len(blocks), block_align):
        out.append(_adpcm_decode_block(blocks[b0:b0 + block_align]))
    pcm = np.concatenate(out) if out else np.zeros(0, dtype=np.int16)
    if n_samples is not None:
        pcm = pcm[:n_samples]
    return pcm[:, None], rate
