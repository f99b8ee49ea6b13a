"""Matroska/WebM container (core/mkv.py): writer/parser round-trip,
codec-agnostic sample tables, lacing modes, keyframe semantics, and
MJPEG decode bit-exactness vs core.jpeg.reconstruct."""
import numpy as np
import pytest

from azuresearchcrawlervector_spark.core import mkv
from azuresearchcrawlervector_spark.core.images import generate_pixels
from azuresearchcrawlervector_spark.core.jpeg import reconstruct


def _clip(n=6, w=48, h=32, fps=5, q=88):
    frames = [generate_pixels(f"mkv-{i}", w, h) for i in range(n)]
    return frames, mkv.mjpeg_mkv_encode(frames, fps=fps, quality=q)


def test_roundtrip_metadata_and_sample_table():
    frames, data = _clip()
    assert mkv.is_mkv(data)
    (t,) = mkv.mkv_parse(data)
    assert t["handler"] == "vide" and t["codec"] == "V_MJPEG"
    assert (t["w"], t["h"], t["fps"], t["n_samples"]) == (48, 32, 5, 6)
    assert t["duration_s"] == pytest.approx(1.2)
    assert t["sync"] == set(range(6))
    # every sample range is a standalone JPEG (SOI marker)
    for i in range(6):
        assert mkv.mkv_sample_bytes(data, t, i)[:2] == b"\xff\xd8"


def test_mjpeg_decode_bit_exact_and_o_sampled():
    frames, data = _clip(q=90)
    dec, meta = mkv.mjpeg_mkv_decode(data, [0, 3, 5])
    assert meta == {"w": 48, "h": 32, "fps": 5, "n_frames": 6}
    for got, fi in zip(dec, [0, 3, 5]):
        assert np.array_equal(got, reconstruct(frames[fi], 90))
    with pytest.raises(ValueError, match="out of range"):
        mkv.mjpeg_mkv_decode(data, [6])


def test_lacing_modes():
    one = mkv._vint_encode(1)
    # Xiph: sizes 3, 300 (255+45), remainder 7
    p = one + b"\x00\x00" + bytes([0x82, 2, 3, 255, 45]) \
        + b"A" * 3 + b"B" * 300 + b"C" * 7
    flags, fr = mkv._block_frames(p, 0, len(p))
    assert [s for _o, s in fr] == [3, 300, 7] and flags & 0x80
    # fixed: 4 equal laces
    p = one + b"\x00\x00" + bytes([0x84, 3]) + b"X" * 40
    _f, fr = mkv._block_frames(p, 0, len(p))
    assert [s for _o, s in fr] == [10, 10, 10, 10]
    # EBML: first 500, delta -4 (signed vint), remainder 11
    p = one + b"\x00\x00" + bytes([0x86, 2]) + mkv._vint_encode(500) \
        + bytes([0x80 | 59]) + b"a" * 500 + b"b" * 496 + b"c" * 11
    _f, fr = mkv._block_frames(p, 0, len(p))
    assert [s for _o, s in fr] == [500, 496, 11]
    # overrun is rejected
    p = one + b"\x00\x00" + bytes([0x82, 1, 200]) + b"s" * 10
    with pytest.raises(ValueError, match="overrun"):
        mkv._block_frames(p, 0, len(p))


def test_blockgroup_keyframe_iff_no_reference():
    # hand-build a cluster with BlockGroup variants
    frames, data = _clip(n=2)
    (t,) = mkv.mkv_parse(data)
    f0 = mkv.mkv_sample_bytes(data, t, 0)
    block = mkv._elem(mkv._BLOCK,
                      mkv._vint_encode(1) + b"\x00\x00\x00" + f0)
    ref = mkv._uint_elem(mkv._REF_BLOCK, 1)
    keyed = mkv._elem(mkv._BLOCK_GROUP, block)
    non_keyed = mkv._elem(mkv._BLOCK_GROUP, block + ref)
    cluster = mkv._elem(mkv._CLUSTER,
                        mkv._uint_elem(mkv._CLUSTER_TS, 0)
                        + keyed + non_keyed)
    # splice: reuse header/info/tracks from the encoder, new cluster
    seg_children = []
    for eid, p, e in mkv._walk(data, 0, len(data)):
        if eid == mkv._SEGMENT:
            for eid2, p2, e2 in mkv._walk(data, p, e):
                if eid2 != mkv._CLUSTER:
                    hdr = data[:data.index(
                        eid2.to_bytes(4, "big"))] if False else None
            seg = (p, e)
    # simpler: rebuild the file from parts
    info_tracks = b""
    for eid, p, e in mkv._walk(data, *seg):
        if eid in (mkv._INFO, mkv._TRACKS):
            nid = max(1, (eid.bit_length() + 7) // 8)
            info_tracks += mkv._elem(eid, data[p:e])
    rebuilt = data[:data.index(mkv._SEGMENT.to_bytes(4, "big"))] \
        + mkv._elem(mkv._SEGMENT, info_tracks + cluster)
    (t2,) = mkv.mkv_parse(rebuilt)
    assert t2["n_samples"] == 2
    assert t2["sync"] == {0}  # only the group WITHOUT ReferenceBlock


def test_unknown_size_segment_and_errors():
    frames, data = _clip(n=2)
    # rewrite the Segment size to the reserved all-ones 1-byte VINT
    sid = mkv._SEGMENT.to_bytes(4, "big")
    at = data.index(sid) + 4
    size, nxt = mkv._vint_read(data, at)
    patched = data[:at] + b"\xff" + data[nxt:]
    (t,) = mkv.mkv_parse(patched)
    assert t["n_samples"] == 2
    with pytest.raises(ValueError, match="EBML"):
        mkv.mkv_parse(b"\x00\x01\x02\x03garbage")
    with pytest.raises(ValueError, match="no MJPEG"):
        # audio-only codec id: rewrite V_MJPEG -> A_OPUSX (same length)
        mkv.mjpeg_mkv_decode(data.replace(b"V_MJPEG", b"A_OPUSX"))


def test_sample_frames_mkv_paths(spark):
    """The Spark operator on Matroska/WebM: real pixels for V_MJPEG
    tracks; raw keyframe block bytes (no codec needed) for any other
    CodecID — retiring allow_fake for EBML containers."""
    from azuresearchcrawlervector_spark.core.images import (
        generate_pixels, png_decode,
    )
    from azuresearchcrawlervector_spark.core.jpeg import jpeg_encode
    from azuresearchcrawlervector_spark.operators.multimodal import (
        sample_frames,
    )

    vids = {f"k-{k}": [generate_pixels(f"sfm-{k}-{i}", 48, 32)
                       for i in range(6)] for k in range(2)}
    mkvs = {mid: mkv.mjpeg_mkv_encode(fs, fps=10, quality=90)
            for mid, fs in vids.items()}
    # a second "codec": same container, CodecID patched to V_MJPG0 —
    # the block index must still resolve the byte ranges
    vp9ish = mkvs["k-0"].replace(b"V_MJPEG", b"V_MJPG0", 1)

    rows = [(mid, buf) for mid, buf in mkvs.items()] + [("k-raw", vp9ish)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = sample_frames(df, every_n=2, n_frames=3).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in got) == [
        ("k-0", 0), ("k-0", 2), ("k-0", 4),
        ("k-1", 0), ("k-1", 2), ("k-1", 4),
        ("k-raw", 0), ("k-raw", 2), ("k-raw", 4),
    ]
    for r in got:
        if r["media_id"] == "k-raw":
            # raw keyframe block bytes == the original encoded samples
            want = jpeg_encode(vids["k-0"][r["frame_idx"]], 90)
            assert bytes(r["frame"]) == want
        else:
            want = reconstruct(vids[r["media_id"]][r["frame_idx"]], 90)
            assert np.array_equal(png_decode(bytes(r["frame"])), want)
