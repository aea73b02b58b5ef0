"""MP4/QuickTime container metadata (extract/video.py)."""

import struct

import pytest

from docvault_ocr_service_spark.extract.video import (
    VideoFormatError, encode_mp4_stub, parse_mp4, sniff_video_format)


def test_roundtrip_and_track_selection():
    b = encode_mp4_stub(90500, timescale=600,
                        tracks=((1280, 720), (0, 0)), brand="mp42")
    m = parse_mp4(b)
    assert m == {"duration_ms": 90500, "timescale": 600,
                 "n_tracks": 2, "width": 1280, "height": 720,
                 "brand": "mp42"}


def test_version1_mvhd():
    mvhd_body = bytes([1]) + bytes(3) \
        + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7) + bytes(80)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" \
        + struct.pack(">I", 0)
    m = parse_mp4(ftyp + moov)
    assert m["duration_ms"] == 7000 and m["timescale"] == 90000


def test_error_taxonomy():
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" \
        + struct.pack(">I", 0)
    for bad in (b"", b"\x00" * 8, ftyp,               # no moov
                b"\x00\x00\x00\x01moov" + b"\x00" * 4,
                encode_mp4_stub(1000)[:-5]):
        with pytest.raises(VideoFormatError):
            parse_mp4(bad)
    assert sniff_video_format(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert sniff_video_format(ftyp[:16]) == "mp4"


def test_box_bomb_bounded():
    """Thousands of zero-length-payload boxes must abort, not spin."""
    spam = (struct.pack(">I", 8) + b"free") * 10000
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" \
        + struct.pack(">I", 0)
    with pytest.raises(VideoFormatError, match="box count"):
        parse_mp4(ftyp + spam)


def test_media_row_integration():
    from docvault_ocr_service_spark.functions.multimodal import (
        _decode_row)

    row = _decode_row("v1", "video", encode_mp4_stub(
        5000, tracks=((640, 360),)))
    assert row["decode_status"] == "metadata_only:mp4"
    assert (row["width"], row["height"]) == (640, 360)
    assert row["features"] == [5000.0, 1000.0, 1.0]
    bad = _decode_row("v2", "video", b"\x00\x00\x00\x10ftypisom" + b"junk")
    assert bad["decode_status"].startswith("corrupted:")
    unk = _decode_row("v3", "video", b"not a video at all")
    assert unk["decode_status"] == "unknown_format"


def test_truncated_boxes_raise_video_format_error():
    """Totality contract (review finding): truncated mvhd/tkhd must be
    VideoFormatError, never IndexError/struct.error."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" \
        + struct.pack(">I", 0)
    bare_mvhd = struct.pack(">I", 8) + b"mvhd"        # empty payload
    moov = struct.pack(">I", 8 + len(bare_mvhd)) + b"moov" + bare_mvhd
    with pytest.raises(VideoFormatError):
        parse_mp4(ftyp + moov)
    short_v1 = struct.pack(">I", 8 + 24) + b"mvhd" + bytes([1]) \
        + bytes(23)
    moov = struct.pack(">I", 8 + len(short_v1)) + b"moov" + short_v1
    with pytest.raises(VideoFormatError):
        parse_mp4(ftyp + moov)


def test_short_tkhd_skipped_not_garbage():
    """A 4-byte tkhd payload must not read header bytes as dims."""
    good = encode_mp4_stub(1000, tracks=())
    tiny_tkhd = struct.pack(">I", 12) + b"tkhd" + bytes(4)
    trak = struct.pack(">I", 8 + len(tiny_tkhd)) + b"trak" + tiny_tkhd
    # splice the bogus trak into moov: rebuild moov with extra payload
    moov_at = good.index(b"moov") - 4
    (moov_size,) = struct.unpack_from(">I", good, moov_at)
    new_moov = struct.pack(">I", moov_size + len(trak)) \
        + good[moov_at + 4:moov_at + moov_size] + trak
    m = parse_mp4(good[:moov_at] + new_moov)
    assert (m["width"], m["height"]) == (0, 0)
    assert m["n_tracks"] == 1
