"""TIFF codec — from scratch, stdlib + numpy only (TIFF 6.0 baseline
RGB/grayscale).

Scope (all REAL, no codec library):
- decode: both byte orders (II/MM), IFD tag walk, multi-strip images,
  Compression 1 (none), 5 (TIFF-LZW: MSB-first variable-width codes
  with the EARLY-CHANGE quirk — width grows one code sooner than
  GIF-LZW — clear/EOI codes, 12-bit cap) and 32773 (PackBits),
  Predictor 2 (horizontal differencing), PhotometricInterpretation
  2 (RGB) and 1 (grayscale, expanded to RGB to match the repo's
  HxWx3 pixel model).
- encode: little-endian baseline RGB with selectable compression
  (lzw default — LOSSLESS roundtrip — none, packbits) and optional
  predictor, strip-chunked so strips stay seekable units.
- `tiff_parse`: header/IFD metadata without touching strip data.

The LZW table-reset convention follows libtiff: the encoder emits a
ClearCode when the next free code reaches 4094, and the decoder
handles a clear wherever it appears, so streams from stricter writers
decode too.
"""
from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"
_MM = b"MM\x00*"

# tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT, _PRED = 273, 277, 278, 279, 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# -------------------------------------------------------------- LZW
_CLEAR, _EOI = 256, 257


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        # EARLY CHANGE: the writer widens when the next code to assign
        # is 2^width - 1 (one sooner than GIF)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        emit(table[seq])
    emit(_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    buf = np.frombuffer(data, dtype=np.uint8)
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(buf):
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | int(buf[pos])
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
            if not entry and code >= 256:
                raise ValueError("tiff: LZW reference to empty slot")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("tiff: LZW code out of range")
        out += entry
        prev = entry
        # early change mirrored on the read side: the decoder's table
        # is ONE entry behind the encoder's (it learns each entry from
        # the following code), so it widens at 2^width - 2 where the
        # encoder widens at 2^width - 1 — the classic TIFF-LZW
        # off-by-one (libtiff's maxcode = CODE_MAX(nbits) - 1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("tiff: LZW output short of strip size")
    return bytes(out[:expected])


# --------------------------------------------------------- PackBits
def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i]
                        and i + 2 < n and data[i + 2] == data[i])):
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("tiff: PackBits stream truncated")
        n = data[i]
        i += 1
        if n < 128:                    # n+1 literal bytes
            chunk = data[i : i + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("tiff: PackBits literal truncated")
            out += chunk
            i += n + 1
        elif n > 128:                  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("tiff: PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out[:expected])


# ----------------------------------------------------------- encode
def tiff_encode(pixels: np.ndarray, compression: str = "lzw",
                predictor: bool = False,
                rows_per_strip: int = 64) -> bytes:
    """HxWx3 uint8 → little-endian baseline TIFF. Lossless for every
    compression mode."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("tiff_encode expects HxWx3 uint8")
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = pixels[y0 : y0 + rows_per_strip]
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:, :] -= rows[:, :-1, :].astype(np.int16)
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = rows.tobytes()
        if comp_id == 5:
            strips.append(_lzw_encode(raw))
        elif comp_id == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, ttype, count, value)

    # layout: header(8) | strip data | [strip offset/count arrays] | IFD
    # — each strip padded to EVEN length so every offset (strip starts,
    # value arrays, the IFD) lands on a word boundary as TIFF 6.0
    # requires; StripByteCounts record the TRUE unpadded lengths
    header_sz = 8
    data_off = header_sz
    strip_offsets = []
    padded = []
    off = data_off
    for s in strips:
        strip_offsets.append(off)
        pad = s + (b"\x00" if len(s) & 1 else b"")
        padded.append(pad)
        off += len(pad)
    arrays = b""
    if n_strips > 1:
        off_arr_pos = off
        arrays += struct.pack(f"<{n_strips}I", *strip_offsets)
        cnt_arr_pos = off + 4 * n_strips
        arrays += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))
        bits_pos = cnt_arr_pos + 4 * n_strips
    else:
        off_arr_pos = strip_offsets[0]
        cnt_arr_pos = len(strips[0])    # true (unpadded) byte count
        bits_pos = off
    arrays += struct.pack("<HHH", 8, 8, 8)    # BitsPerSample triple
    ifd_off = bits_pos + 6
    tags = [
        tag(_W, 4, 1, w),
        tag(_H, 4, 1, h),
        tag(_BITS, 3, 3, bits_pos),
        tag(_COMP, 3, 1, comp_id),
        tag(_PHOTO, 3, 1, 2),                 # RGB
        tag(_STRIP_OFF, 4, n_strips, off_arr_pos),
        tag(_SPP, 3, 1, 3),
        tag(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        tag(_STRIP_CNT, 4, n_strips, cnt_arr_pos),
    ]
    if predictor:
        tags.append(tag(_PRED, 3, 1, 2))
    tags.sort(key=lambda t: struct.unpack("<H", t[:2])[0])
    ifd = struct.pack("<H", len(tags)) + b"".join(tags) + b"\x00\x00\x00\x00"
    return (_II[:4] + struct.pack("<I", ifd_off)
            + b"".join(padded) + arrays + ifd)


# ----------------------------------------------------------- decode
def is_tiff(data: bytes) -> bool:
    return data[:4] in (_II, _MM)


def _read_ifd(data: bytes):
    if not is_tiff(data):
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("tiff: IFD offset out of range")
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags = {}
    pos = ifd_off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("tiff: IFD truncated")
        tid, ttype, count = struct.unpack(bo + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZE.get(ttype, 1) * count
        if size <= 4:
            raw = data[pos + 8 : pos + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[pos + 8 : pos + 12])
            raw = data[voff : voff + size]
            if len(raw) != size:
                raise ValueError("tiff: tag value out of range")
        if ttype == 3:
            vals = list(struct.unpack(bo + f"{count}H", raw))
        elif ttype == 4:
            vals = list(struct.unpack(bo + f"{count}I", raw))
        elif ttype == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tid] = vals
        pos += 12
    return bo, tags


def _require(tags: dict, tid: int, name: str) -> list:
    vals = tags.get(tid)
    if not vals:
        raise ValueError(f"tiff: missing required tag {name} ({tid})")
    return vals


def tiff_parse(data: bytes) -> dict:
    """Header/IFD metadata without touching strip data. Raises
    ValueError (never KeyError) on malformed input — the contract
    sniff_image and the metadata operators rely on."""
    data = bytes(data)
    bo, tags = _read_ifd(data)
    comp = tags.get(_COMP, [1])[0]
    return {
        "w": _require(tags, _W, "ImageWidth")[0],
        "h": _require(tags, _H, "ImageLength")[0],
        "bits_per_sample": tags.get(_BITS, [8])[0],
        "channels": tags.get(_SPP, [1])[0],
        "compression": {1: "none", 5: "lzw", 32773: "packbits"}.get(
            comp, f"unknown({comp})"),
        "photometric": tags.get(_PHOTO, [1])[0],
        "predictor": tags.get(_PRED, [1])[0],
        "n_strips": len(tags.get(_STRIP_OFF, [])),
        "byte_order": "little" if bo == "<" else "big",
    }


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF bytes → HxWx3 uint8 (grayscale expanded to RGB)."""
    data = bytes(data)
    bo, tags = _read_ifd(data)
    w = _require(tags, _W, "ImageWidth")[0]
    h = _require(tags, _H, "ImageLength")[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    if any(b != 8 for b in bits[:spp]):
        raise ValueError("tiff: only 8 bits per sample supported")
    comp = tags.get(_COMP, [1])[0]
    if comp not in (1, 5, 32773):
        raise ValueError(f"tiff: unsupported compression {comp}")
    photo = tags.get(_PHOTO, [1])[0]
    if photo not in (1, 2):
        raise ValueError(f"tiff: unsupported photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("tiff: RGB needs 3 samples/pixel")
    pred = tags.get(_PRED, [1])[0]
    if pred not in (1, 2):
        raise ValueError(f"tiff: unsupported predictor {pred}")
    offsets = _require(tags, _STRIP_OFF, "StripOffsets")
    counts = _require(tags, _STRIP_CNT, "StripByteCounts")
    rps = tags.get(_ROWS_PER_STRIP, [h])[0]
    rows = []
    for k, (soff, scnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - k * rps)
        expected = n_rows * w * spp
        raw = data[soff : soff + scnt]
        if len(raw) != scnt:
            raise ValueError("tiff: strip out of range")
        if comp == 5:
            raw = _lzw_decode(raw, expected)
        elif comp == 32773:
            raw = _packbits_decode(raw, expected)
        elif len(raw) < expected:
            raise ValueError("tiff: strip shorter than image data")
        strip = np.frombuffer(raw[:expected], dtype=np.uint8).reshape(
            n_rows, w, spp)
        if pred == 2:
            strip = np.cumsum(strip.astype(np.int64), axis=1).astype(
                np.uint8)  # mod-256 undo of horizontal differencing
        rows.append(strip)
    img = np.concatenate(rows)
    if img.shape[0] != h:
        raise ValueError("tiff: strips do not cover image height")
    if photo == 1:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()
