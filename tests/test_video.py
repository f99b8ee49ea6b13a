"""MJPEG-in-AVI codec (core/video.py) + the real frame-sample path.

The reference crawler has no media pipeline — this is the
beyond-the-reference multimodal family (SURVEY §2 / round-3 VERDICT
"What's missing #1": real compressed video). Contract mirrors the
still-JPEG one: container + entropy layers are a lossless inverse over
the lossy-DCT model (decoded frame == jpeg reconstruct(frame, q)).
"""

import numpy as np
import pytest

from azuresearchcrawlervector_spark.core.images import png_decode
from azuresearchcrawlervector_spark.core.jpeg import reconstruct
from azuresearchcrawlervector_spark.core.video import (
    is_avi, mjpeg_avi_decode, mjpeg_avi_encode,
)


def _frames(n=5, h=24, w=32, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : (i + 1) * w // (n + 1)] = (i * 40) % 256  # moving wipe
        out.append(f)
    return out


def test_avi_container_structure_and_roundtrip():
    frames = _frames()
    buf = mjpeg_avi_encode(frames, fps=12, quality=90)
    # real RIFF/AVI container markers
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert b"avih" in buf and b"strh" in buf and b"MJPG" in buf
    assert b"movi" in buf and b"idx1" in buf
    assert is_avi(buf) and not is_avi(b"\x00" * 16)

    dec, meta = mjpeg_avi_decode(buf)
    assert meta == {"fps": 12, "n_frames": 5, "w": 32, "h": 24}
    assert len(dec) == 5
    # bitstream+container are a lossless inverse over the lossy model
    for f, d in zip(frames, dec):
        assert np.array_equal(d, reconstruct(f, 90))


def test_avi_selective_frame_decode():
    frames = _frames(n=7)
    buf = mjpeg_avi_encode(frames, fps=10, quality=97)
    dec, meta = mjpeg_avi_decode(buf, frame_indices=[0, 3, 6])
    assert meta["n_frames"] == 7 and len(dec) == 3
    for i, d in zip([0, 3, 6], dec):
        assert np.array_equal(d, reconstruct(frames[i], 97))
    with pytest.raises(ValueError):
        mjpeg_avi_decode(buf, frame_indices=[7])


def test_avi_error_paths():
    with pytest.raises(ValueError):
        mjpeg_avi_decode(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    buf = mjpeg_avi_encode(_frames(2), 10, 90)
    with pytest.raises(ValueError):
        mjpeg_avi_decode(buf[: len(buf) // 2])  # truncated mid-stream
    with pytest.raises(ValueError):
        # a non-MJPG stream must be refused, not misdecoded
        mjpeg_avi_decode(buf.replace(b"MJPG", b"H264", 1))


def test_sample_frames_real_mjpeg_path(spark):
    """The Spark operator takes the REAL path on AVI payloads: sampled
    frame indices, PNG-encoded pixel-exact frames, stub untouched for
    other formats."""
    from azuresearchcrawlervector_spark.operators.multimodal import (
        sample_frames,
    )

    vids = {f"vid-{k}": _frames(n=6, seed=k) for k in range(2)}
    rows = [(mid, mjpeg_avi_encode(fs, fps=10, quality=90))
            for mid, fs in vids.items()]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = sample_frames(df, every_n=2, n_frames=3).collect()
    # 2 videos x frames {0, 2, 4}
    assert sorted((r["media_id"], r["frame_idx"]) for r in got) == [
        ("vid-0", 0), ("vid-0", 2), ("vid-0", 4),
        ("vid-1", 0), ("vid-1", 2), ("vid-1", 4),
    ]
    for r in got:
        want = reconstruct(vids[r["media_id"]][r["frame_idx"]], 90)
        assert np.array_equal(png_decode(bytes(r["frame"])), want)

    # non-AVI payloads still refuse without allow_fake
    junk = spark.createDataFrame([("x", b"\x00" * 100)],
                                 "media_id string, bytes binary")
    with pytest.raises(Exception):
        sample_frames(junk, allow_fake=False).collect()


# ------------------------------------------------------------------ mp4
def test_mp4_container_roundtrip_and_sample_table():
    """ISO BMFF writer/parser: box structure, codec-agnostic sample
    table (stsc x stco x stsz byte ranges reproduce the exact encoded
    samples), sync set, and MJPEG decode parity with the still codec."""
    from azuresearchcrawlervector_spark.core.jpeg import (
        jpeg_decode, jpeg_encode,
    )
    from azuresearchcrawlervector_spark.core.mp4 import (
        is_mp4, mjpeg_mp4_decode, mjpeg_mp4_encode, mp4_parse,
        mp4_sample_bytes,
    )

    frames = _frames(n=7)
    buf = mjpeg_mp4_encode(frames, fps=8, quality=90)
    assert is_mp4(buf) and not is_mp4(b"\x00" * 16)
    assert b"moov" in buf and b"stsd" in buf and b"mdat" in buf

    (t,) = mp4_parse(buf)
    assert t["handler"] == "vide" and t["codec"] == "jpeg"
    assert t["n_samples"] == 7 and (t["w"], t["h"]) == (32, 24)
    assert t["fps"] == 8 and t["sync"] == set(range(7))
    jp = [jpeg_encode(f, 90) for f in frames]
    for i in range(7):
        assert mp4_sample_bytes(buf, t, i) == jp[i]

    dec, meta = mjpeg_mp4_decode(buf, frame_indices=[0, 3, 6])
    assert meta == {"w": 32, "h": 24, "fps": 8, "n_frames": 7}
    for d, i in zip(dec, (0, 3, 6)):
        assert np.array_equal(d, jpeg_decode(jp[i]))
        assert np.array_equal(d, reconstruct(frames[i], 90))


def test_mp4_error_paths():
    from azuresearchcrawlervector_spark.core.mp4 import (
        mjpeg_mp4_decode, mp4_parse,
    )

    with pytest.raises(ValueError):
        mp4_parse(b"\x00" * 64)                  # no ftyp
    with pytest.raises(ValueError):
        mp4_parse(b"\x00\x00\x00\x08ftyp" + b"\x00\x00\x00\x20mdat")
    # moov-less / truncated
    with pytest.raises(ValueError):
        mjpeg_mp4_decode(b"\x00\x00\x00\x08ftypisom")


def test_sample_frames_mp4_paths(spark):
    """The Spark operator on MP4: real pixels for 'jpeg' tracks; raw
    keyframe byte ranges (no codec needed) for any other codec —
    retiring allow_fake for ISO containers."""
    from azuresearchcrawlervector_spark.core.jpeg import jpeg_encode
    from azuresearchcrawlervector_spark.core.mp4 import mjpeg_mp4_encode
    from azuresearchcrawlervector_spark.operators.multimodal import (
        sample_frames,
    )

    vids = {f"m-{k}": _frames(n=6, seed=10 + k) for k in range(2)}
    mp4s = {mid: mjpeg_mp4_encode(fs, fps=10, quality=90)
            for mid, fs in vids.items()}
    # a second "codec": same container, sample entry patched to avc1 —
    # the parser must still resolve the byte ranges
    avc = mp4s["m-0"].replace(b"jpeg", b"avc1", 1)

    rows = [(mid, buf) for mid, buf in mp4s.items()] + [("m-avc", avc)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = sample_frames(df, every_n=2, n_frames=3).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in got) == [
        ("m-0", 0), ("m-0", 2), ("m-0", 4),
        ("m-1", 0), ("m-1", 2), ("m-1", 4),
        ("m-avc", 0), ("m-avc", 2), ("m-avc", 4),
    ]
    for r in got:
        if r["media_id"] == "m-avc":
            # raw keyframe sample bytes == the original encoded samples
            want = jpeg_encode(vids["m-0"][r["frame_idx"]], 90)
            assert bytes(r["frame"]) == want
        else:
            want = reconstruct(vids[r["media_id"]][r["frame_idx"]], 90)
            assert np.array_equal(png_decode(bytes(r["frame"])), want)
