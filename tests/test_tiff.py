"""TIFF codec (core/tiff.py): LZW early-change, PackBits, predictor,
strips, byte order, metadata, corruption guards."""
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azuresearchcrawlervector_spark.core import tiff
from azuresearchcrawlervector_spark.core.images import generate_pixels


@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_lossless(compression, predictor):
    px = generate_pixels("tiff-rt", 64, 48)
    data = tiff.tiff_encode(px, compression=compression,
                            predictor=predictor)
    assert tiff.is_tiff(data)
    assert np.array_equal(tiff.tiff_decode(data), px)


def test_multistrip_and_partial_last_strip():
    px = generate_pixels("tiff-strips", 33, 70)   # 70 rows, rps 16
    data = tiff.tiff_encode(px, rows_per_strip=16)
    meta = tiff.tiff_parse(data)
    assert meta["n_strips"] == 5                  # 4*16 + 6
    assert np.array_equal(tiff.tiff_decode(data), px)


def test_lzw_early_change_table_growth():
    # enough distinct material to push the code width up and force the
    # 4094 reset — the early-change off-by-one shows up here if wrong
    rng = np.random.default_rng(11)
    raw = bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))
    assert tiff._lzw_decode(tiff._lzw_encode(raw), len(raw)) == raw


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=80, deadline=None)
def test_lzw_roundtrip_property(raw):
    assert tiff._lzw_decode(tiff._lzw_encode(raw), len(raw)) == raw


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=80, deadline=None)
def test_packbits_roundtrip_property(raw):
    assert tiff._packbits_decode(
        tiff._packbits_encode(raw), len(raw)) == raw


def test_packbits_compresses_runs():
    raw = b"\x00" * 500 + b"\x07" * 300
    enc = tiff._packbits_encode(raw)
    assert len(enc) < 20
    assert tiff._packbits_decode(enc, len(raw)) == raw


def test_parse_metadata():
    px = generate_pixels("tiff-meta", 40, 20)
    meta = tiff.tiff_parse(tiff.tiff_encode(px, compression="lzw",
                                            predictor=True))
    assert meta["w"] == 40 and meta["h"] == 20
    assert meta["compression"] == "lzw"
    assert meta["predictor"] == 2
    assert meta["channels"] == 3
    assert meta["byte_order"] == "little"


def test_big_endian_and_grayscale_decode():
    # handcrafted MM (big-endian) uncompressed grayscale 2x3
    gray = bytes([10, 20, 30, 40, 50, 60])
    ifd_off = 8 + len(gray)
    tags = [
        (256, 4, 1, 3), (257, 4, 1, 2), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 1 << 16),
        (273, 4, 1, 8), (277, 3, 1, 1 << 16), (278, 4, 1, 2),
        (279, 4, 1, len(gray)),
    ]
    ifd = struct.pack(">H", len(tags))
    for tid, ttype, count, val in tags:
        ifd += struct.pack(">HHII", tid, ttype, count, val)
    ifd += b"\x00" * 4
    data = b"MM\x00*" + struct.pack(">I", ifd_off) + gray + ifd
    out = tiff.tiff_decode(data)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0].reshape(-1),
                          np.frombuffer(gray, dtype=np.uint8))
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    meta = tiff.tiff_parse(data)
    assert meta["byte_order"] == "big" and meta["photometric"] == 1


def test_corruption_guards():
    px = generate_pixels("tiff-bad", 16, 16)
    data = tiff.tiff_encode(px)
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff.tiff_decode(b"XXXX" + data[4:])
    with pytest.raises(ValueError):
        tiff.tiff_decode(data[:40])
    # unsupported compression id
    bad = bytearray(data)
    ifd = struct.unpack("<I", data[4:8])[0]
    (n,) = struct.unpack("<H", data[ifd : ifd + 2])
    for k in range(n):
        pos = ifd + 2 + 12 * k
        tid = struct.unpack("<H", data[pos : pos + 2])[0]
        if tid == 259:
            bad[pos + 8 : pos + 10] = struct.pack("<H", 7)  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="unsupported compression"):
        tiff.tiff_decode(bytes(bad))


def test_images_dispatch_and_sniff():
    from azuresearchcrawlervector_spark.core.images import (
        decode, encode, sniff_image)
    px = generate_pixels("tiff-disp", 48, 32)
    data = encode(px, "tiff")
    assert np.array_equal(decode(data, "tiff"), px)   # lossless
    m = sniff_image(data)
    assert (m["fmt"], m["w"], m["h"], m["channels"]) == ("tiff", 48, 32, 3)


def test_missing_required_tags_raise_valueerror():
    # valid magic, empty IFD — must be ValueError, never KeyError
    hostile = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0) + b"\x00" * 4
    with pytest.raises(ValueError, match="missing required tag"):
        tiff.tiff_parse(hostile)
    with pytest.raises(ValueError, match="missing required tag"):
        tiff.tiff_decode(hostile)
    from azuresearchcrawlervector_spark.core.images import sniff_image
    with pytest.raises(ValueError):
        sniff_image(hostile)


def test_word_alignment_of_offsets():
    # odd-sized strips must not push value arrays / IFD to odd offsets
    px = generate_pixels("tiff-align", 1, 1)    # 3-byte strip
    for comp in ("none", "lzw", "packbits"):
        data = tiff.tiff_encode(px, compression=comp)
        (ifd_off,) = struct.unpack("<I", data[4:8])
        assert ifd_off % 2 == 0
        meta = tiff.tiff_parse(data)
        assert np.array_equal(tiff.tiff_decode(data), px)
        assert meta["w"] == 1
