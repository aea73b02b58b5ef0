"""EXIF extraction (extract/exif.py)."""

import struct

import numpy as np

from docvault_ocr_service_spark.extract.exif import (
    build_exif_app1, parse_exif)
from docvault_ocr_service_spark.extract.jpeg import encode_jpeg


def _jpeg_with(app1: bytes) -> bytes:
    jpg = encode_jpeg(np.full((8, 8, 3), 90, np.uint8))
    return jpg[:2] + app1 + jpg[2:]


def test_roundtrip_all_fields():
    app1 = build_exif_app1(
        orientation=6, make="ACME", model="Cam 9000",
        datetime_str="2024:03:01 12:00:00",
        datetime_original="2024:02:28 08:30:00",
        pixel_x=640, pixel_y=480, with_gps=True)
    m = parse_exif(_jpeg_with(app1))
    assert m == {"orientation": 6, "make": "ACME", "model": "Cam 9000",
                 "datetime": "2024:03:01 12:00:00",
                 "datetime_original": "2024:02:28 08:30:00",
                 "pixel_x": 640, "pixel_y": 480, "has_gps": True}


def test_bare_tiff_and_no_exif():
    app1 = build_exif_app1(orientation=3)
    tiff = app1[10:]                        # strip marker+len+Exif\0\0
    assert parse_exif(tiff)["orientation"] == 3
    # plain JPEG without APP1 → empty shape
    m = parse_exif(encode_jpeg(np.zeros((4, 4), np.uint8)))
    assert m["orientation"] is None and m["has_gps"] is False


def test_short_ascii_inlines():
    """ASCII values ≤4 bytes are stored inline, not via pointer."""
    m = parse_exif(_jpeg_with(build_exif_app1(make="abc")))
    assert m["make"] == "abc"


def test_invalid_orientation_rejected():
    app1 = bytearray(build_exif_app1(orientation=2))
    # corrupt the orientation SHORT to 99 (out of the 1..8 range)
    idx = app1.find(struct.pack("<HH", 274, 3))
    app1[idx + 8:idx + 10] = struct.pack("<H", 99)
    assert parse_exif(_jpeg_with(bytes(app1)))["orientation"] is None


def test_totality_on_garbage():
    cases = (None, b"", b"\xff\xd8", b"II", b"MM\x00\x2a",
             b"II*\x00\xff\xff\xff\xff",
             b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00",
             b"\xff\xd8\xff\xe1\x00\x01",
             encode_jpeg(np.zeros((2, 2), np.uint8))[:-3])
    for bad in cases:
        m = parse_exif(bad)
        assert set(m) == {"orientation", "make", "model", "datetime",
                          "datetime_original", "pixel_x", "pixel_y",
                          "has_gps"}


def test_big_endian_tiff():
    """A hand-built MM (big-endian) IFD0 with just orientation."""
    tiff = (b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 274, 3, 1)
            + struct.pack(">H", 8) + b"\x00\x00"
            + struct.pack(">I", 0))
    assert parse_exif(tiff)["orientation"] == 8


def test_fill_bytes_before_marker():
    """Spec-legal 0xFF fill bytes before APP1 must not lose the EXIF
    (review finding: the walk misread the length from the marker)."""
    app1 = build_exif_app1(orientation=6)
    jpg = encode_jpeg(np.full((4, 4), 9, np.uint8))
    padded = jpg[:2] + b"\xff" + app1 + jpg[2:]
    assert parse_exif(padded)["orientation"] == 6
    padded3 = jpg[:2] + b"\xff\xff\xff" + app1 + jpg[2:]
    assert parse_exif(padded3)["orientation"] == 6
