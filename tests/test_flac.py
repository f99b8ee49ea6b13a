"""FLAC codec (core/flac.py): exact lossless round-trips across all
subframe types and stereo modes, spec integrity layers (CRC-8 / CRC-16
/ MD5), rice/rice2/escape residual coding, and the Spark operators."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azuresearchcrawlervector_spark.core import flac  # noqa: E402
from azuresearchcrawlervector_spark.core.audio import synth_tone  # noqa: E402


def _probe_subframe_types(data: bytes, monkeypatch) -> list[int]:
    """Decode while recording each subframe's 6-bit type code."""
    seen: list[int] = []
    orig = flac._read_subframe

    def spy(r, blocksize, bps):
        save = (r.pos, r.acc, r.nbits)
        r.read(1)
        seen.append(r.read(6))
        r.pos, r.acc, r.nbits = save
        return orig(r, blocksize, bps)

    monkeypatch.setattr(flac, "_read_subframe", spy)
    flac.flac_decode(data)
    return seen


def test_roundtrip_mono_exact():
    x = synth_tone("flac-mono", duration_s=0.5)
    enc = flac.flac_encode(x, 16_000)
    pcm, rate = flac.flac_decode(enc)
    assert rate == 16_000 and pcm.shape == (len(x), 1)
    assert np.array_equal(pcm[:, 0], x)
    assert len(enc) < 2 * len(x)          # actually compressed


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side", "auto"])
def test_roundtrip_stereo_all_modes(mode):
    l = synth_tone("flac-L", duration_s=0.3)
    r = synth_tone("flac-R", duration_s=0.3)
    st = np.stack([l, r], axis=1)
    enc = flac.flac_encode(st, 44_100, stereo_mode=mode)
    pcm, rate = flac.flac_decode(enc)
    assert rate == 44_100
    assert np.array_equal(pcm, st)


def test_decorrelation_beats_independent_on_correlated_stereo():
    l = synth_tone("flac-corr", duration_s=0.3)
    r = (l.astype(np.int32) - (l.astype(np.int32) >> 4)).astype(np.int16)
    st = np.stack([l, r], axis=1)
    e_ind = flac.flac_encode(st, 16_000, stereo_mode="independent")
    e_auto = flac.flac_encode(st, 16_000, stereo_mode="auto")
    assert len(e_auto) < len(e_ind)
    assert np.array_equal(flac.flac_decode(e_auto)[0], st)


def test_partial_block_constant_and_empty():
    x = np.random.default_rng(1).integers(-2000, 2000, 5003).astype(np.int16)
    pcm, _ = flac.flac_decode(flac.flac_encode(x, 8_000))
    assert np.array_equal(pcm[:, 0], x)        # 4096 + partial 907

    c = np.full(3000, -123, dtype=np.int16)
    enc_c = flac.flac_encode(c, 8_000)
    assert len(enc_c) < 100                    # CONSTANT subframe
    assert np.array_equal(flac.flac_decode(enc_c)[0][:, 0], c)

    e0 = flac.flac_encode(np.zeros(0, dtype=np.int16), 16_000)
    p0, _ = flac.flac_decode(e0)
    assert p0.shape == (0, 1)


def test_wasted_bits_roundtrip_and_gain():
    x = synth_tone("flac-wb", duration_s=0.3)
    xw = (x.astype(np.int32) // 16 * 16).astype(np.int16)  # 4 trailing zeros
    enc = flac.flac_encode(xw, 16_000)
    enc_full = flac.flac_encode(x, 16_000)
    assert np.array_equal(flac.flac_decode(enc)[0][:, 0], xw)
    assert len(enc) < len(enc_full)            # wasted bits detected


def test_subframe_type_selection(monkeypatch):
    # resonant AR(2): LPC must win
    rng = np.random.default_rng(7)
    e = rng.standard_normal(8192) * 300
    x = np.zeros(8192)
    for i in range(2, 8192):
        x[i] = 1.8 * x[i - 1] - 0.95 * x[i - 2] + e[i]
    x = np.clip(x, -32768, 32767).astype(np.int16)
    types = _probe_subframe_types(flac.flac_encode(x, 16_000), monkeypatch)
    assert any(t >= 32 for t in types), "LPC subframe not selected on AR(2)"

    # ultra-smooth sine: FIXED wins
    s = (np.sin(np.arange(8192) / 20) * 12000).astype(np.int16)
    types = _probe_subframe_types(flac.flac_encode(s, 16_000), monkeypatch)
    assert any(8 <= t <= 12 for t in types)

    # white noise at full scale: VERBATIM (incompressible, still exact)
    n = np.random.default_rng(3).integers(-32768, 32768, 4096).astype(np.int16)
    enc = flac.flac_encode(n, 16_000)
    types = _probe_subframe_types(enc, monkeypatch)
    assert 1 in types
    assert np.array_equal(flac.flac_decode(enc)[0][:, 0], n)


def test_integrity_crc8_crc16_md5():
    x = synth_tone("flac-crc", duration_s=0.2)
    enc = bytearray(flac.flac_encode(x, 16_000))
    frame0 = 4 + 4 + 34                        # magic + block hdr + STREAMINFO

    bad = enc.copy()
    bad[frame0 + 4] ^= 0x01                    # frame-number byte (pre-CRC8)
    with pytest.raises(ValueError, match="CRC-8"):
        flac.flac_decode(bytes(bad))

    bad = enc.copy()
    bad[frame0 + 40] ^= 0x40                   # inside subframe payload
    with pytest.raises(ValueError, match="CRC-16"):
        flac.flac_decode(bytes(bad))

    bad = enc.copy()
    bad[8 + 18] ^= 0xFF                        # STREAMINFO MD5 byte
    with pytest.raises(ValueError, match="MD5"):
        flac.flac_decode(bytes(bad))
    pcm, _ = flac.flac_decode(bytes(bad), verify=False)
    assert np.array_equal(pcm[:, 0], x)        # frames themselves intact


def test_residual_escape_and_rice2_paths():
    # spike among zeros: escape partition is cheaper than any rice param
    res = np.zeros(256, dtype=np.int64)
    res[100] = 10_000
    w = flac._BitWriter()
    flac._write_residual(w, res, 256, 0)
    w.align()
    data = w.getvalue()
    r = flac._BitReader(data)
    assert r.read(2) == 0                      # 4-bit rice method
    p_order = r.read(4)
    assert r.read(4) == 15                     # first partition escaped
    r2 = flac._BitReader(data)
    assert np.array_equal(flac._read_residual(r2, 256, 0), res)

    # huge residuals: optimal param > 14 forces the rice2 (5-bit) method
    big = (np.random.default_rng(5).integers(-1, 2, 512) * 2**20
           + np.random.default_rng(6).integers(-2**18, 2**18, 512))
    w = flac._BitWriter()
    flac._write_residual(w, big, 512, 0)
    w.align()
    data = w.getvalue()
    assert flac._BitReader(data).read(2) == 1  # rice2
    assert np.array_equal(
        flac._read_residual(flac._BitReader(data), 512, 0), big)

    # multi-partition order is used on large smooth blocks
    smooth = np.arange(4096, dtype=np.int64) % 7 - 3
    w = flac._BitWriter()
    flac._write_residual(w, smooth, 4096, 0)
    w.align()
    r = flac._BitReader(w.getvalue())
    r.read(2)
    assert r.read(4) >= 1                      # partitioned
    assert np.array_equal(
        flac._read_residual(flac._BitReader(w.getvalue()), 4096, 0), smooth)


def test_flac_parse_metadata():
    x = synth_tone("flac-meta", duration_s=0.25)
    m = flac.flac_parse(flac.flac_encode(x, 16_000))
    assert m["codec"] == "flac" and m["channels"] == 1
    assert m["sample_rate"] == 16_000 and m["bits_per_sample"] == 16
    assert m["total_samples"] == len(x)
    assert m["duration_s"] == pytest.approx(len(x) / 16_000, abs=1e-6)
    assert not flac.is_flac(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.flac_parse(b"OggS")


def test_fixed_restore_matches_residual_all_orders():
    x = np.random.default_rng(2).integers(-1000, 1000, 200).astype(np.int64)
    for order in range(5):
        res = flac._fixed_residual(x, order)
        out = flac._fixed_restore(x[:order], res, order)
        assert np.array_equal(out, x), f"order {order}"


# ---------------------------------------------------------------- spark
def test_audio_metadata_table_flac(spark):
    from azuresearchcrawlervector_spark.core.audio import wav_encode
    from azuresearchcrawlervector_spark.operators.multimodal import (
        audio_metadata_table,
    )
    tone = synth_tone("flac-spark", duration_s=0.4)
    st = np.stack([tone, tone[::-1]], axis=1)
    rows = [
        ("f1", bytearray(flac.flac_encode(tone, 16_000))),
        ("f2", bytearray(flac.flac_encode(st, 44_100))),
        ("w1", bytearray(wav_encode(tone, 16_000))),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r for r in audio_metadata_table(df).collect()}
    assert got["f1"]["container"] == "flac" and got["f1"]["codec"] == "flac"
    assert got["f1"]["channels"] == 1 and got["f1"]["sample_rate"] == 16_000
    assert got["f1"]["duration_s"] == pytest.approx(len(tone) / 16_000,
                                                    abs=1e-6)
    assert got["f2"]["channels"] == 2 and got["f2"]["sample_rate"] == 44_100
    assert got["w1"]["container"] == "wave"


def test_audio_feature_table_dispatches_flac(spark):
    """Features from the FLAC bytes equal features from the WAV bytes of
    the SAME pcm — losslessness observed end-to-end through Spark."""
    from azuresearchcrawlervector_spark.core.audio import wav_encode
    from azuresearchcrawlervector_spark.operators.multimodal import (
        audio_feature_table, decode_audio,
    )
    tone = synth_tone("flac-feat", duration_s=0.3)
    rows = [("flac", bytearray(flac.flac_encode(tone, 16_000))),
            ("wav", bytearray(wav_encode(tone, 16_000)))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r for r in audio_feature_table(df).collect()}
    for k in ("rms", "zcr_hz", "centroid_hz", "duration_s"):
        assert got["flac"][k] == pytest.approx(got["wav"][k], rel=1e-12), k

    mono = decode_audio(bytes(rows[0][1]), "flac")
    ref = decode_audio(bytes(rows[1][1]), "wav")
    assert np.allclose(mono, ref)
