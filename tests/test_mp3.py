"""MPEG audio frame-header parser (core/mp3.py): frame-length math,
CBR/VBR walk, ID3 tag skipping, detection, and error paths."""
import pytest

from azuresearchcrawlervector_spark.core import mp3


def test_cbr_roundtrip_exact_duration():
    data = mp3.mp3_build_stream(10, bitrate_kbps=128, sample_rate=44100)
    assert mp3.is_mp3(data)
    m = mp3.mp3_parse(data)
    assert m["codec"] == "mpeg1_layer3" and m["layer"] == 3
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert m["n_frames"] == 10
    assert m["bitrate_mode"] == "cbr" and m["bitrate_kbps"] == 128
    assert m["duration_s"] == pytest.approx(10 * 1152 / 44100, abs=1e-6)
    # spec frame length: 144 * 128000 / 44100 = 417 (no padding)
    assert len(data) == 10 * 417


def test_vbr_average_and_mode():
    brs = [320, 128, 64, 128, 96, 160]
    data = mp3.mp3_build_stream(6, bitrate_kbps=brs, sample_rate=32000,
                                channels=1)
    m = mp3.mp3_parse(data)
    assert m["bitrate_mode"] == "vbr"
    assert m["bitrate_kbps"] == pytest.approx(sum(brs) / 6, abs=1e-3)
    assert m["channels"] == 1 and m["sample_rate"] == 32000
    assert m["duration_s"] == pytest.approx(6 * 1152 / 32000, abs=1e-6)


def test_id3_tags_skipped():
    data = mp3.mp3_build_stream(4, id3v2=b"TIT2\x00\x00\x00\x05\x00\x00hello",
                                id3v1=True)
    assert data[:3] == b"ID3" and data[-128:-125] == b"TAG"
    assert mp3.is_mp3(data)
    m = mp3.mp3_parse(data)
    assert m["n_frames"] == 4
    # ID3v2 size field is syncsafe: a high bit set means "not ID3v2"
    assert mp3._skip_id3v2(b"ID3\x03\x00\x00\x00\x00\x80\x00") == 0


def test_is_mp3_requires_second_header():
    one = mp3.mp3_build_stream(1)
    assert mp3.is_mp3(one)                       # exactly one frame: ok
    assert mp3.is_mp3(one + b"TAG" + bytes(125))  # frame + ID3v1: ok
    assert not mp3.is_mp3(one + b"\x00garbage")  # junk where frame 2 due
    assert not mp3.is_mp3(b"RIFF\x00\x00\x00\x00WAVE")
    assert not mp3.is_mp3(b"\xff\xfb")           # truncated header


def test_error_paths():
    data = mp3.mp3_build_stream(3)
    with pytest.raises(ValueError, match="truncated final"):
        mp3.mp3_parse(data[:-10])
    with pytest.raises(ValueError, match="invalid mp3 frame"):
        mp3.mp3_parse(data + bytes(417))
    a = mp3.mp3_build_stream(2, sample_rate=44100)
    b = mp3.mp3_build_stream(2, sample_rate=48000)
    with pytest.raises(ValueError, match="mid-stream"):
        mp3.mp3_parse(a + b)
    with pytest.raises(ValueError, match="no mp3 frames"):
        mp3.mp3_parse(b"")
    # free-format (bitrate index 0) is rejected, not mis-sized
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
    assert mp3._frame_info(hdr) is None


def test_layer_tables():
    # MPEG-1 layer I: 384 samples, (12*br/sr + pad)*4 bytes
    hdr = (0x7FF << 21) | (3 << 19) | (3 << 17) | (4 << 12) | (0 << 10)
    flen, samples, sr, br, _ch, _vb, layer = mp3._frame_info(hdr)
    assert (layer, samples, sr, br) == (1, 384, 44100, 128)
    assert flen == 12 * 128000 // 44100 * 4
    # MPEG-2 layer III: 576 samples, half-rate table
    hdr = (0x7FF << 21) | (2 << 19) | (1 << 17) | (4 << 12) | (0 << 10)
    flen, samples, sr, br, _ch, _vb, layer = mp3._frame_info(hdr)
    assert (layer, samples, sr, br) == (3, 576, 22050, 32)
    assert flen == 576 // 8 * 32000 // 22050


def test_audio_metadata_table_mp3(spark):
    """The Spark metadata operator reports mp3 codec/channels/rate/
    duration from headers alone — mirroring the Ogg path."""
    from azuresearchcrawlervector_spark.operators.multimodal import (
        audio_metadata_table,
    )
    rows = [
        ("c", bytearray(mp3.mp3_build_stream(20, bitrate_kbps=128))),
        ("v", bytearray(mp3.mp3_build_stream(
            5, bitrate_kbps=[64, 128, 192, 128, 64], sample_rate=48000,
            channels=1, id3v2=b"\x00" * 16, id3v1=True))),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r for r in audio_metadata_table(df).collect()}
    assert got["c"]["container"] == "mpeg"
    assert got["c"]["codec"] == "mpeg1_layer3"
    assert got["c"]["channels"] == 2 and got["c"]["sample_rate"] == 44100
    assert got["c"]["duration_s"] == pytest.approx(20 * 1152 / 44100,
                                                   abs=1e-5)
    assert got["v"]["channels"] == 1 and got["v"]["sample_rate"] == 48000
    assert got["v"]["duration_s"] == pytest.approx(5 * 1152 / 48000,
                                                   abs=1e-5)
