"""MPEG audio (mp3) frame-header parsing — pure Python, no codec.

Built from the public MPEG-1/2 audio framing spec (ISO/IEC 11172-3 /
13818-3): 32-bit frame headers carry version / layer / bitrate index /
sample-rate index / padding / channel mode, and the frame LENGTH is
fully determined by those fields, so a parser can walk every frame of
a stream and report codec, channels, sample rate, bitrate profile
(CBR vs VBR + average) and EXACT duration (frames x samples-per-frame
/ sample rate) without decoding a single audio sample. ID3v2 (syncsafe
size) and ID3v1 (trailing 128-byte TAG) metadata tags are skipped.

This is the metadata half a training-data audit pipeline needs (the
same split as core/ogg.py for Vorbis/Opus): WAVEFORM decode of mp3
payloads still requires an external codec and remains the disclosed
stub in operators/multimodal.py.

``mp3_build_stream`` synthesizes structurally-valid frame sequences
(correct headers + correct frame lengths; payload bytes are a
deterministic filler, clearly NOT decodable audio) so the walker's
length/duration math is testable hermetically — parsing depends only
on headers, never on payload content.

Reference provenance: the reference crawler has no media pipeline
(AzureSearchCrawler/*.cs); this belongs to the beyond-the-reference
multimodal family.
"""

from __future__ import annotations

# bitrate_kbps[(version_group, layer)][index]; 0 = "free format"
# (unsupported here, documented), index 15 invalid. version_group:
# 1 = MPEG-1, 2 = MPEG-2/2.5 (they share tables).
_BITRATES = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
# sample_rate[version_bits][index]; version_bits: 0=MPEG2.5, 2=MPEG2,
# 3=MPEG1 (1 is reserved)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}
_VERSION_NAME = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}
_CHANNELS = {0: 2, 1: 2, 2: 2, 3: 1}  # stereo/joint/dual/mono


def _frame_info(hdr: int):
    """32-bit header -> (frame_len, samples, sample_rate, bitrate_kbps,
    channels, version_bits, layer) or None if not a valid audio frame
    header. Free-format (bitrate index 0) is treated as invalid — its
    frame length is not derivable from the header alone."""
    if hdr >> 21 != 0x7FF:
        return None
    vb = (hdr >> 19) & 3
    layer_bits = (hdr >> 17) & 3
    if vb == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits            # 3->I, 2->II, 1->III
    br_ix = (hdr >> 12) & 0xF
    sr_ix = (hdr >> 10) & 3
    if br_ix in (0, 15) or sr_ix == 3:
        return None
    pad = (hdr >> 9) & 1
    mode = (hdr >> 6) & 3
    vgroup = 1 if vb == 3 else 2
    br = _BITRATES[(vgroup, layer)][br_ix] * 1000
    sr = _RATES[vb][sr_ix]
    if layer == 1:
        samples = 384
        flen = (12 * br // sr + pad) * 4
    else:
        # layer II always 1152; layer III: 1152 MPEG-1, 576 MPEG-2/2.5
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        flen = samples // 8 * br // sr + pad
    return flen, samples, sr, br // 1000, _CHANNELS[mode], vb, layer


def _skip_id3v2(data: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (0 when absent)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            return 0                  # not a syncsafe size -> not ID3v2
        size = (size << 7) | b
    return 10 + size


def is_mp3(data: bytes) -> bool:
    """True iff the stream starts (after an optional ID3v2 tag) with a
    valid MPEG audio frame header followed by a second one at the
    frame-length boundary — two consecutive valid headers make random
    0xFFE byte coincidences vanishingly unlikely."""
    p = _skip_id3v2(data)
    if p + 4 > len(data):
        return False
    info = _frame_info(int.from_bytes(data[p:p + 4], "big"))
    if info is None:
        return False
    q = p + info[0]
    if q == len(data) or (len(data) - q == 128 and data[q:q + 3] == b"TAG"):
        return True                   # single-frame stream
    return (q + 4 <= len(data)
            and _frame_info(int.from_bytes(data[q:q + 4], "big")) is not None)


def mp3_parse(data: bytes) -> dict:
    """Walk every frame -> {codec, version, layer, channels,
    sample_rate, bitrate_kbps (average), bitrate_mode ('cbr'|'vbr'),
    n_frames, duration_s}. Exact duration by summing per-frame sample
    counts — no reliance on a Xing/VBRI estimate. Raises ValueError on
    streams that are not wall-to-wall valid frames (modulo ID3 tags)."""
    pos = _skip_id3v2(data)
    end = len(data)
    if end - pos >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128                    # trailing ID3v1
    first = None
    n_frames = 0
    seconds = 0.0
    bitrates = set()
    bitrate_sum = 0
    while pos < end:
        if pos + 4 > end:
            raise ValueError("trailing garbage after last mp3 frame")
        info = _frame_info(int.from_bytes(data[pos:pos + 4], "big"))
        if info is None:
            raise ValueError(f"invalid mp3 frame header at byte {pos}")
        flen, samples, sr, br, ch, vb, layer = info
        if first is None:
            first = (sr, ch, vb, layer)
        elif (sr, ch, vb, layer) != first:
            raise ValueError("mp3 stream changes version/layer/rate "
                             "mid-stream")
        if pos + flen > end:
            raise ValueError("truncated final mp3 frame")
        n_frames += 1
        seconds += samples / sr
        bitrates.add(br)
        bitrate_sum += br
        pos += flen
    if first is None:
        raise ValueError("no mp3 frames")
    sr, ch, vb, layer = first
    return {
        "codec": f"{_VERSION_NAME[vb]}_layer{layer}",
        "version": _VERSION_NAME[vb],
        "layer": layer,
        "channels": ch,
        "sample_rate": sr,
        "bitrate_kbps": round(bitrate_sum / n_frames, 3),
        "bitrate_mode": "cbr" if len(bitrates) == 1 else "vbr",
        "n_frames": n_frames,
        "duration_s": round(seconds, 6),
    }


def mp3_build_stream(n_frames: int, bitrate_kbps: int | list[int] = 128,
                     sample_rate: int = 44100, channels: int = 2,
                     id3v2: bytes | None = None,
                     id3v1: bool = False) -> bytes:
    """Structurally-valid MPEG-1 Layer III frame sequence for parser
    tests: correct headers and frame lengths; payloads are a
    deterministic byte filler (NOT decodable audio — header-only
    consumers never look at them). Pass a list of per-frame bitrates
    to synthesize a VBR stream."""
    sr_ix = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    mode = 0 if channels == 2 else 3
    brs = ([bitrate_kbps] * n_frames
           if isinstance(bitrate_kbps, int) else list(bitrate_kbps))
    assert len(brs) == n_frames
    out = []
    if id3v2 is not None:
        size = len(id3v2)
        assert size < 1 << 28
        ss = bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
        out.append(b"ID3\x03\x00\x00" + ss + id3v2)
    for fi, br in enumerate(brs):
        br_ix = _BITRATES[(1, 3)].index(br)
        hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (br_ix << 12) | (sr_ix << 10) | (mode << 6)
        flen = 144 * br * 1000 // sample_rate
        body = bytes((fi + j) & 0xFF for j in range(flen - 4))
        out.append(hdr.to_bytes(4, "big") + body)
    if id3v1:
        out.append(b"TAG" + bytes(125))
    return b"".join(out)
