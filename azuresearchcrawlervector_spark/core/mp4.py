"""ISO BMFF (MP4) container — pure Python, no ffmpeg.

Built entirely from the public ISO/IEC 14496-12 box structure: ftyp /
mdat / moov { mvhd, trak { tkhd, mdia { mdhd, hdlr, minf { vmhd, dinf,
stbl { stsd, stts, stsc, stsz, stco, stss }}}}}.

Two halves:

- ``mp4_parse``: CODEC-AGNOSTIC metadata + sample-table extraction for
  any mp4 — per-track handler + sample-entry fourcc, timescale /
  duration / fps, width / height, per-sample (offset, size) byte
  ranges resolved through stsc/stco/stsz, and the stss sync-sample
  (keyframe) set. This is the container half a frame-sampling
  pipeline needs: keyframe byte ranges WITHOUT decoding anything.
- ``mjpeg_mp4_encode``: an MP4 writer carrying one baseline JPEG
  (core/jpeg.py — ITU-T T.81) per sample under a ``jpeg`` visual
  sample entry (the QuickTime/ISO motion-JPEG layout) — every sample
  a sync sample, so sampled frames decode in O(sampled), mirroring
  the MJPEG/AVI codec (core/video.py).

This retires the round-4 ``allow_fake`` stand-in for CONTAINER-level
mp4 operations in operators/multimodal.py (reference scope: the
reference crawler has no media pipeline — this belongs to the
beyond-the-reference multimodal family). Decoding non-MJPEG codecs
(avc1/vp9/…) to pixels still needs an external codec; sampling their
keyframe BYTE RANGES does not, and works here.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def mjpeg_mp4_encode(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """HxWx3 uint8 RGB frames (uniform shape) → MP4 bytes with one
    baseline-JPEG sample per frame ('jpeg' sample entry), every sample
    a sync sample. Layout ftyp + mdat + moov, so stco offsets are
    known before moov is built."""
    assert frames, "at least one frame"
    h, w = frames[0].shape[:2]
    assert all(f.shape == frames[0].shape for f in frames), "uniform shape"
    jpegs = [jpeg_encode(f, quality) for f in frames]
    n = len(jpegs)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(jpegs)
    mdat = _box(b"mdat", mdat_payload)
    mdat_off = len(ftyp) + 8  # absolute offset of the first sample

    # stsd 'jpeg' VisualSampleEntry (ISO 14496-12 §12.1.3)
    entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # SampleEntry
        + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off))
    stss = _full(b"stss", 0, 0,
                 struct.pack(">I", n)
                 + b"".join(struct.pack(">I", i + 1) for i in range(n)))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)

    url = _full(b"url ", 0, 1, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, timescale, duration,
                             0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3,
                 struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + _MATRIX + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8 + _MATRIX + b"\x00" * 24
                 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) over a box run;
    handles size==0 (to end) and size==1 (64-bit largesize)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        p = pos + 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            p = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4 box overruns container")
        yield fourcc, p, pos + size
        pos += size


def _find(data, start, end, fourcc):
    for fc, p, e in _walk_boxes(data, start, end):
        if fc == fourcc:
            return p, e
    return None


def mp4_parse(data: bytes) -> list[dict]:
    """→ one dict per track: {handler, codec, timescale, duration,
    fps, n_samples, w, h, samples: [(offset, size)], sync: set of
    0-based keyframe indices}. Codec-agnostic — the sample table
    (stsc × stco × stsz) resolves every sample's byte range without
    touching the codec."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("missing moov")
    tracks = []
    for fc, p, e in _walk_boxes(data, *moov):
        if fc != b"trak":
            continue
        t: dict = {"handler": None, "codec": None, "w": None, "h": None}
        mdia = _find(data, p, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is not None:
            ver = data[mdhd[0]]
            if ver == 1:
                ts, dur = struct.unpack(
                    ">IQ", data[mdhd[0] + 20:mdhd[0] + 32])
            else:
                ts, dur = struct.unpack(
                    ">II", data[mdhd[0] + 12:mdhd[0] + 20])
            t["timescale"], t["duration"] = ts, dur
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is not None:
            t["handler"] = data[hdlr[0] + 8:hdlr[0] + 12].decode(
                "latin1")
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            continue
        sizes: list[int] = []
        chunk_offs: list[int] = []
        stsc_runs: list[tuple[int, int]] = []
        sync: set[int] | None = None
        delta = None
        for fc2, p2, e2 in _walk_boxes(data, *stbl):
            body = p2 + 4  # past fullbox version/flags
            if fc2 == b"stsd":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                if cnt >= 1:
                    t["codec"] = data[body + 8:body + 12].decode("latin1")
                    # VisualSampleEntry width/height at +24/+26 boxwise
                    if e2 - body >= 40:
                        t["w"], t["h"] = struct.unpack(
                            ">HH", data[body + 36:body + 40])
            elif fc2 == b"stsz":
                fixed, cnt = struct.unpack(">II", data[body:body + 8])
                if fixed:
                    sizes = [fixed] * cnt
                else:
                    sizes = list(struct.unpack(
                        f">{cnt}I", data[body + 8:body + 8 + 4 * cnt]))
            elif fc2 == b"stco":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                chunk_offs = list(struct.unpack(
                    f">{cnt}I", data[body + 4:body + 4 + 4 * cnt]))
            elif fc2 == b"co64":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                chunk_offs = list(struct.unpack(
                    f">{cnt}Q", data[body + 4:body + 4 + 8 * cnt]))
            elif fc2 == b"stsc":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                for i in range(cnt):
                    first, spc, _desc = struct.unpack(
                        ">III", data[body + 4 + 12 * i:body + 16 + 12 * i])
                    stsc_runs.append((first, spc))
            elif fc2 == b"stss":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                sync = {s - 1 for s in struct.unpack(
                    f">{cnt}I", data[body + 4:body + 4 + 4 * cnt])}
            elif fc2 == b"stts":
                (cnt,) = struct.unpack(">I", data[body:body + 4])
                if cnt >= 1:
                    _, delta = struct.unpack(
                        ">II", data[body + 4:body + 12])
        # resolve per-sample byte ranges: stsc maps chunks → sample
        # counts; offsets accumulate within each chunk
        samples: list[tuple[int, int]] = []
        si = 0
        for ci, coff in enumerate(chunk_offs):
            spc = 0
            for first, run_spc in stsc_runs:
                if ci + 1 >= first:
                    spc = run_spc
            off = coff
            for _ in range(spc):
                if si >= len(sizes):
                    break
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
        t["samples"] = samples
        t["n_samples"] = len(samples)
        t["sync"] = sync if sync is not None else set(range(len(samples)))
        ts = t.get("timescale") or 0
        t["fps"] = (round(ts / delta) if delta else None)
        tracks.append(t)
    if not tracks:
        raise ValueError("no tracks in moov")
    return tracks


def mp4_sample_bytes(data: bytes, track: dict, index: int) -> bytes:
    off, size = track["samples"][index]
    if off + size > len(data):
        raise ValueError("sample range outside file")
    return data[off:off + size]


def mjpeg_mp4_decode(data: bytes, frame_indices: list[int] | None = None):
    """MP4 bytes → (frames, meta) for a 'jpeg'-codec video track —
    mirror of core.video.mjpeg_avi_decode: only the requested samples
    are entropy-decoded (every sample is intra, O(sampled))."""
    tracks = [t for t in mp4_parse(data)
              if t["handler"] == "vide" and t["codec"] == "jpeg"]
    if not tracks:
        raise ValueError("no MJPEG ('jpeg' sample entry) video track")
    t = tracks[0]
    meta = {"w": t["w"], "h": t["h"], "fps": t["fps"],
            "n_frames": t["n_samples"]}
    want = (range(t["n_samples"]) if frame_indices is None
            else frame_indices)
    frames = []
    for i in want:
        if not 0 <= i < t["n_samples"]:
            raise ValueError(f"frame index {i} out of range")
        frames.append(jpeg_decode(mp4_sample_bytes(data, t, i)))
    return frames, meta


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"
