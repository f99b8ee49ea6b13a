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
