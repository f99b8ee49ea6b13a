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
