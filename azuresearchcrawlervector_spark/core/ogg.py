"""Ogg container (RFC 3533) — pure Python/numpy, no libvorbis/libopus.

The container half of compressed-audio handling, mirroring what
core/mp4.py does for video: page-level parsing with REAL per-page CRC
validation (the Ogg CRC-32: polynomial 0x04C11DB7, init 0, no
reflection, no final xor), plus the codec IDENTIFICATION headers both
common codecs put in their first page — Vorbis (``\\x01vorbis``: I.D.
header with channels + sample rate, Vorbis I spec §4.2.2) and Opus
(``OpusHead``, RFC 7845 §5.1). Duration comes from the last page's
granule position (PCM sample count for both codecs; Opus granules are
at 48 kHz per RFC 7845 §4).

What this gives the pipeline WITHOUT any codec: container validation,
codec name, channels, sample rate, duration — the metadata a
training-data audit needs. Decoding Vorbis/Opus packets to waveforms
still requires the external codec (the disclosed stub in
operators/multimodal.py); the writer here emits spec-valid pages so
the parser is tested against real container structure, not itself.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC_TABLE = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tab = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            r = np.uint32(i << 24)
            for _ in range(8):
                r = np.uint32((r << np.uint32(1)) ^ np.uint32(
                    0x04C11DB7 if int(r) & 0x80000000 else 0))
            tab[i] = r
        _CRC_TABLE = tab
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    """Ogg page CRC (MSB-first CRC-32, poly 0x04C11DB7, init/xorout 0)."""
    tab = _crc_table()
    r = np.uint32(0)
    for b in data:
        r = np.uint32((r << np.uint32(8))
                      ^ tab[(int(r) >> 24) ^ b])
    return int(r)


def ogg_write_page(serial: int, seq: int, granule: int, payload: bytes,
                   header_type: int = 0) -> bytes:
    """One spec-valid Ogg page (payload must fit 255 segments)."""
    n_full, rem = divmod(len(payload), 255)
    segs = bytes([255] * n_full + [rem])
    assert len(segs) <= 255, "payload too large for one page"
    head = (b"OggS" + bytes([0, header_type])
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes([len(segs)]) + segs)
    crc = ogg_crc(head + payload)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + payload


def vorbis_ident_payload(channels: int, sample_rate: int) -> bytes:
    """Vorbis I identification header (§4.2.2)."""
    return (b"\x01vorbis" + struct.pack("<IB", 0, channels)
            + struct.pack("<IiiiB", sample_rate, 0, 128_000, 0, 0xB8)
            + b"\x01")


def opus_ident_payload(channels: int, sample_rate: int) -> bytes:
    """OpusHead identification header (RFC 7845 §5.1)."""
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", 312, sample_rate, 0, 0))


def ogg_encode_stream(codec: str, channels: int = 1,
                      sample_rate: int = 16_000, n_data_pages: int = 3,
                      total_samples: int = 16_000, serial: int = 42,
                      payload_seed: int = 7) -> bytes:
    """Deterministic spec-valid Ogg stream: BOS ident page + data pages
    (opaque payloads — we carry no codec) + EOS page whose granule
    position encodes ``total_samples``."""
    ident = (vorbis_ident_payload(channels, sample_rate) if codec == "vorbis"
             else opus_ident_payload(channels, sample_rate))
    rng = np.random.default_rng(payload_seed)
    out = [ogg_write_page(serial, 0, 0, ident, header_type=0x02)]  # BOS
    for i in range(1, n_data_pages + 1):
        payload = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
        gran = (total_samples * i) // n_data_pages
        ht = 0x04 if i == n_data_pages else 0          # EOS on last
        out.append(ogg_write_page(serial, i, gran, payload, header_type=ht))
    return b"".join(out)


def ogg_parse(data: bytes) -> dict:
    """→ {codec, channels, sample_rate, duration_s, n_pages, serial}.
    Validates the magic, version, and EVERY page's CRC; reads the codec
    ident header from the BOS page and the duration from the final
    granule position (Opus granules run at 48 kHz)."""
    if not is_ogg(data):
        raise ValueError("not an Ogg stream (no OggS capture pattern)")
    pos, n_pages, last_granule, first_payload, serial = 0, 0, 0, None, None
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"bad page capture at {pos}")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        granule, ser, _seq, crc = struct.unpack(
            "<qIII", data[pos + 6:pos + 26])
        nseg = data[pos + 26]
        segs = data[pos + 27:pos + 27 + nseg]
        body_len = sum(segs)
        end = pos + 27 + nseg + body_len
        if end > len(data):
            raise ValueError("page overruns stream")
        page = bytearray(data[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"CRC mismatch on page {n_pages}")
        if first_payload is None:
            first_payload = data[pos + 27 + nseg:end]
            serial = ser
        if granule > 0:
            last_granule = granule
        n_pages += 1
        pos = end
    if first_payload is None:
        raise ValueError("no pages")
    if first_payload[:7] == b"\x01vorbis":
        codec = "vorbis"
        channels = first_payload[11]
        (sample_rate,) = struct.unpack("<I", first_payload[12:16])
        duration = last_granule / sample_rate if sample_rate else 0.0
    elif first_payload[:8] == b"OpusHead":
        codec = "opus"
        channels = first_payload[9]
        (sample_rate,) = struct.unpack("<I", first_payload[12:16])
        duration = last_granule / 48_000.0  # RFC 7845 §4
    else:
        codec, channels, sample_rate, duration = "unknown", None, None, None
    return {"codec": codec, "channels": channels,
            "sample_rate": sample_rate,
            "duration_s": round(duration, 6) if duration is not None else None,
            "n_pages": n_pages, "serial": serial}


def is_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"
