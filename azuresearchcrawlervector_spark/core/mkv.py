"""Matroska / WebM container — pure Python, no ffmpeg.

Built entirely from the public EBML (RFC 8794) + Matroska element
specs: EBML header / Segment { Info, Tracks { TrackEntry { TrackNumber,
TrackType, CodecID, DefaultDuration, Video { PixelWidth, PixelHeight },
Audio { SamplingFrequency, Channels }}}, Cluster { Timestamp,
SimpleBlock | BlockGroup { Block, ReferenceBlock }}}.

Two halves, mirroring core/mp4.py:

- ``mkv_parse``: CODEC-AGNOSTIC metadata + per-frame byte-range
  extraction for any mkv/webm — per-track handler + CodecID, duration
  / fps, width / height / audio params, per-frame (offset, size) byte
  ranges resolved from SimpleBlock / BlockGroup payloads (all four
  lacing modes: none, Xiph, fixed, EBML), and the keyframe set
  (SimpleBlock keyframe flag; a BlockGroup is a keyframe iff it has
  no ReferenceBlock). This is the container half a frame-sampling
  pipeline needs: keyframe byte ranges WITHOUT decoding anything.
- ``mjpeg_mkv_encode``: a Matroska writer carrying one baseline JPEG
  (core/jpeg.py — ITU-T T.81) per SimpleBlock under CodecID
  ``V_MJPEG``, every block a keyframe, so sampled frames decode in
  O(sampled) — mirroring the MJPEG/AVI (core/video.py) and
  MJPEG-in-MP4 (core/mp4.py) codecs.

This retires the ``allow_fake`` stand-in for CONTAINER-level webm/mkv
operations in operators/multimodal.py (reference scope: the reference
crawler has no media pipeline — this belongs to the
beyond-the-reference multimodal family). Decoding non-MJPEG codecs
(V_VP9/V_AV1/…) to pixels still needs an external codec; sampling
their keyframe BYTE RANGES does not, and works here.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode

# Matroska element IDs (public registry), as raw on-the-wire ints
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DUR = 0x23E383
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMP_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REF_BLOCK = 0xFB

_TYPE_HANDLER = {1: "vide", 2: "soun", 17: "subt"}


# ------------------------------------------------------------- EBML IO
def _vint_encode(value: int) -> bytes:
    """EBML size VINT: minimal-length, marker bit in the first byte."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:  # all-ones is reserved
            raw = value | (1 << (7 * length))
            return raw.to_bytes(length, "big")
    raise ValueError("size too large for VINT")


def _vint_read(data: bytes, pos: int, keep_marker: bool = False):
    """→ (value, next_pos); value is None for the reserved all-ones
    ('unknown size') pattern when keep_marker is False."""
    first = data[pos]
    if first == 0:
        raise ValueError("invalid VINT (zero first byte)")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("truncated VINT")
    raw = int.from_bytes(data[pos:pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw & ((1 << (7 * length)) - 1)
    if value == (1 << (7 * length)) - 1:
        return None, pos + length  # unknown size
    return value, pos + length


def _walk(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) for the children
    of [start, end). Unknown-size elements extend to the parent end
    (the streaming-Segment case)."""
    pos = start
    while pos < end:
        eid, pos = _vint_read(data, pos, keep_marker=True)
        size, pos = _vint_read(data, pos)
        pend = end if size is None else pos + size
        if pend > end:
            raise ValueError("element overruns parent")
        yield eid, pos, pend
        pos = pend


def _uint(data: bytes, start: int, end: int) -> int:
    return int.from_bytes(data[start:end], "big")


def _float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"bad float size {n}")


def _elem(eid: int, payload: bytes) -> bytes:
    nid = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nid, "big") + _vint_encode(len(payload)) + payload


def _uint_elem(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


# ------------------------------------------------------------- writer
def mjpeg_mkv_encode(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """HxWx3 uint8 RGB frames (uniform shape) → Matroska bytes with one
    V_MJPEG SimpleBlock per frame, every block a keyframe."""
    assert frames, "at least one frame"
    h, w = frames[0].shape[:2]
    assert all(f.shape == frames[0].shape for f in frames), "uniform shape"
    jpegs = [jpeg_encode(f, quality) for f in frames]

    header = _elem(_EBML, b"".join([
        _uint_elem(0x4286, 1),            # EBMLVersion
        _uint_elem(0x42F7, 1),            # EBMLReadVersion
        _uint_elem(0x42F2, 4),            # EBMLMaxIDLength
        _uint_elem(0x42F3, 8),            # EBMLMaxSizeLength
        _elem(0x4282, b"matroska"),       # DocType
        _uint_elem(0x4287, 2),            # DocTypeVersion
        _uint_elem(0x4285, 2),            # DocTypeReadVersion
    ]))
    # TimestampScale 1_000_000 ns -> block/cluster timestamps in ms
    dur_ms = len(frames) * 1000.0 / fps
    info = _elem(_INFO, b"".join([
        _uint_elem(_TS_SCALE, 1_000_000),
        _elem(_DURATION, struct.pack(">d", dur_ms)),
    ]))
    tracks = _elem(_TRACKS, _elem(_TRACK_ENTRY, b"".join([
        _uint_elem(_TRACK_NUM, 1),
        _uint_elem(_TRACK_UID, 1),
        _uint_elem(_TRACK_TYPE, 1),       # video
        _elem(_CODEC_ID, b"V_MJPEG"),
        _uint_elem(_DEFAULT_DUR, 1_000_000_000 // fps),
        _elem(_VIDEO, _uint_elem(_PIX_W, w) + _uint_elem(_PIX_H, h)),
    ])))
    blocks = []
    for i, j in enumerate(jpegs):
        ts = round(i * 1000.0 / fps)
        payload = (_vint_encode(1) + struct.pack(">h", ts)
                   + b"\x80" + j)        # track 1, rel ts, keyframe flag
        blocks.append(_elem(_SIMPLE_BLOCK, payload))
    cluster = _elem(_CLUSTER,
                    _uint_elem(_CLUSTER_TS, 0) + b"".join(blocks))
    segment = _elem(_SEGMENT, info + tracks + cluster)
    return header + segment


# ------------------------------------------------------------- parser
def _block_frames(data: bytes, p: int, e: int):
    """SimpleBlock/Block payload [p, e) → (keyframe_flag_bits, list of
    (offset, size) frame ranges). All four lacing modes."""
    _track, p = _vint_read(data, p)
    p += 2                                  # s16 relative timestamp
    flags = data[p]
    p += 1
    lacing = flags & 0x06
    if lacing == 0x00:
        return flags, [(p, e - p)]
    n = data[p] + 1                         # frame count
    p += 1
    sizes: list[int] = []
    if lacing == 0x02:                      # Xiph: 255-terminated sums
        for _ in range(n - 1):
            s = 0
            while data[p] == 255:
                s += 255
                p += 1
            s += data[p]
            p += 1
            sizes.append(s)
    elif lacing == 0x04:                    # fixed: n equal parts
        total = e - p
        if total % n:
            raise ValueError("fixed lacing: uneven frame sizes")
        sizes = [total // n] * (n - 1)
    else:                                   # 0x06 EBML: vint + s-deltas
        first, p = _vint_read(data, p)
        sizes.append(first)
        prev = first
        for _ in range(n - 2):
            raw, q = _vint_read(data, p, keep_marker=True)
            length = q - p
            # signed vint: value minus the mid-range bias
            delta = (raw & ((1 << (7 * length)) - 1)) \
                - ((1 << (7 * length - 1)) - 1)
            prev += delta
            sizes.append(prev)
            p = q
    frames = []
    for s in sizes:
        frames.append((p, s))
        p += s
    frames.append((p, e - p))               # last lace = remainder
    if frames[-1][1] < 0:
        raise ValueError("laced frames overrun block")
    return flags, frames


def mkv_parse(data: bytes) -> list[dict]:
    """→ one dict per track: {handler, codec, track_num, duration_s,
    fps, w, h, sample_rate, channels, n_samples, samples: [(offset,
    size)], sync: set of 0-based keyframe indices}. Codec-agnostic —
    block payloads resolve every frame's byte range without touching
    the codec."""
    if not is_mkv(data):
        raise ValueError("not a Matroska/WebM stream (no EBML header)")
    segment = None
    for eid, p, e in _walk(data, 0, len(data)):
        if eid == _SEGMENT:
            segment = (p, e)
            break
    if segment is None:
        raise ValueError("missing Segment")
    ts_scale = 1_000_000
    duration_ticks = None
    tracks: dict[int, dict] = {}
    for eid, p, e in _walk(data, *segment):
        if eid == _INFO:
            for eid2, p2, e2 in _walk(data, p, e):
                if eid2 == _TS_SCALE:
                    ts_scale = _uint(data, p2, e2)
                elif eid2 == _DURATION:
                    duration_ticks = _float(data, p2, e2)
        elif eid == _TRACKS:
            for eid2, p2, e2 in _walk(data, p, e):
                if eid2 != _TRACK_ENTRY:
                    continue
                t: dict = {"handler": None, "codec": None, "w": None,
                           "h": None, "sample_rate": None,
                           "channels": None, "fps": None,
                           "track_num": None}
                for eid3, p3, e3 in _walk(data, p2, e2):
                    if eid3 == _TRACK_NUM:
                        t["track_num"] = _uint(data, p3, e3)
                    elif eid3 == _TRACK_TYPE:
                        t["handler"] = _TYPE_HANDLER.get(
                            _uint(data, p3, e3))
                    elif eid3 == _CODEC_ID:
                        t["codec"] = data[p3:e3].decode("latin1")
                    elif eid3 == _DEFAULT_DUR:
                        ns = _uint(data, p3, e3)
                        t["fps"] = round(1e9 / ns) if ns else None
                    elif eid3 == _VIDEO:
                        for eid4, p4, e4 in _walk(data, p3, e3):
                            if eid4 == _PIX_W:
                                t["w"] = _uint(data, p4, e4)
                            elif eid4 == _PIX_H:
                                t["h"] = _uint(data, p4, e4)
                    elif eid3 == _AUDIO:
                        for eid4, p4, e4 in _walk(data, p3, e3):
                            if eid4 == _SAMP_FREQ:
                                t["sample_rate"] = _float(data, p4, e4)
                            elif eid4 == _CHANNELS:
                                t["channels"] = _uint(data, p4, e4)
                if t["track_num"] is not None:
                    t["samples"] = []
                    t["sync"] = set()
                    tracks[t["track_num"]] = t
        elif eid == _CLUSTER:
            for eid2, p2, e2 in _walk(data, p, e):
                if eid2 == _SIMPLE_BLOCK:
                    tn, _q = _vint_read(data, p2)
                    t = tracks.get(tn)
                    if t is None:
                        continue
                    flags, frames = _block_frames(data, p2, e2)
                    for off, sz in frames:
                        if flags & 0x80:    # SimpleBlock keyframe bit
                            t["sync"].add(len(t["samples"]))
                        t["samples"].append((off, sz))
                elif eid2 == _BLOCK_GROUP:
                    block = None
                    has_ref = False
                    for eid3, p3, e3 in _walk(data, p2, e2):
                        if eid3 == _BLOCK:
                            block = (p3, e3)
                        elif eid3 == _REF_BLOCK:
                            has_ref = True
                    if block is None:
                        continue
                    tn, _q = _vint_read(data, block[0])
                    t = tracks.get(tn)
                    if t is None:
                        continue
                    _flags, frames = _block_frames(data, *block)
                    for off, sz in frames:
                        if not has_ref:     # keyframe iff no reference
                            t["sync"].add(len(t["samples"]))
                        t["samples"].append((off, sz))
    if not tracks:
        raise ValueError("no tracks in Segment")
    out = []
    for t in tracks.values():
        t["n_samples"] = len(t["samples"])
        t["duration_s"] = (duration_ticks * ts_scale / 1e9
                           if duration_ticks is not None else None)
        out.append(t)
    return out


def mkv_sample_bytes(data: bytes, track: dict, index: int) -> bytes:
    off, size = track["samples"][index]
    if off + size > len(data):
        raise ValueError("sample range outside file")
    return data[off:off + size]


def mjpeg_mkv_decode(data: bytes, frame_indices: list[int] | None = None):
    """Matroska bytes → (frames, meta) for a V_MJPEG video track —
    mirror of core.mp4.mjpeg_mp4_decode: only the requested samples
    are entropy-decoded (every sample is intra, O(sampled))."""
    tracks = [t for t in mkv_parse(data)
              if t["handler"] == "vide" and t["codec"] == "V_MJPEG"]
    if not tracks:
        raise ValueError("no MJPEG (V_MJPEG) video track")
    t = tracks[0]
    meta = {"w": t["w"], "h": t["h"], "fps": t["fps"],
            "n_frames": t["n_samples"]}
    want = (range(t["n_samples"]) if frame_indices is None
            else frame_indices)
    frames = []
    for i in want:
        if not 0 <= i < t["n_samples"]:
            raise ValueError(f"frame index {i} out of range")
        frames.append(jpeg_decode(mkv_sample_bytes(data, t, i)))
    return frames, meta


def is_mkv(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == b"\x1a\x45\xdf\xa3"
