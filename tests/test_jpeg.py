"""Baseline JPEG codec: IDCT identity, round-trips, restart markers,
4:2:0 subsampling, honest unsupported taxonomy."""

import numpy as np
import pytest

from docvault_ocr_service_spark.extract.images import (
    ImageDecodeError, UnsupportedImageError)
from docvault_ocr_service_spark.extract.jpeg import (
    ZIGZAG, dct2, decode_jpeg, encode_jpeg, idct2)


def test_idct_matches_textbook_definition():
    rng = np.random.RandomState(7)
    blk = rng.randint(-800, 800, (8, 8)).astype(float)
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (cu * cv * blk[u, v]
                          * np.cos((2 * y + 1) * u * np.pi / 16)
                          * np.cos((2 * x + 1) * v * np.pi / 16))
            ref[y, x] = s / 4
    assert np.abs(idct2(blk) - ref).max() < 1e-9
    assert np.abs(idct2(dct2(blk)) - blk).max() < 1e-9


def test_zigzag_is_spec_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-pin the spec's published order
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-3:].tolist() == [47, 55, 62, 63][-3:]


@pytest.fixture(scope="module")
def smooth():
    img = np.fromfunction(
        lambda y, x: 128 + 90 * np.sin(x / 6) + 30 * np.cos(y / 4),
        (45, 61))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_gray_roundtrip(smooth):
    dec = decode_jpeg(encode_jpeg(smooth, quality=92))
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4
    flat = np.full((17, 23), 77, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat)) == 77).all()


def test_color_roundtrip_and_subsampling(smooth):
    rgb = np.dstack([smooth, 255 - smooth, np.roll(smooth, 7, axis=1)])
    for kw, tol in (({}, 3.0), ({"subsampling": "420"}, 8.0)):
        dec = decode_jpeg(encode_jpeg(rgb, quality=90, **kw))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(float) - rgb).mean() < tol


def test_restart_markers(smooth):
    rgb = np.dstack([smooth] * 3)
    a = decode_jpeg(encode_jpeg(rgb, quality=90))
    b = decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=2))
    assert (a == b).all()        # restarts change framing, not pixels
    c = decode_jpeg(encode_jpeg(smooth, quality=90, restart_interval=3))
    d = decode_jpeg(encode_jpeg(smooth, quality=90))
    assert (c == d).all()


def test_unsupported_and_corrupted_taxonomy(smooth):
    import struct

    data = bytearray(encode_jpeg(smooth))
    pos = 2                                    # walk real segment bounds
    while data[pos + 1] != 0xC0:
        pos += 2 + struct.unpack_from(">H", data, pos + 2)[0]
    data[pos + 1] = 0xC2                       # pretend progressive
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(bytes(data))
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(ImageDecodeError):
        decode_jpeg(encode_jpeg(smooth)[:40])  # truncated


def test_jpeg_media_and_thumbnail(spark, smooth):
    from docvault_ocr_service_spark.functions.multimodal import (
        extract_media_features, generate_thumbnails)

    big = np.clip(np.fromfunction(
        lambda y, x: 100 + 60 * np.sin(x / 9) + 40 * np.cos(y / 7),
        (200, 400)), 0, 255).astype(np.uint8)
    media = spark.createDataFrame(
        [("j", "image", encode_jpeg(big, quality=90))],
        ["media_id", "kind", "payload"])
    feats = extract_media_features(media, fake=False).first()
    assert feats["decode_status"] == "ok"
    assert (feats["width"], feats["height"]) == (400, 200)
    assert abs(feats["brightness"] - big.mean()) < 1.5
    thumb = generate_thumbnails(media.select("media_id", "payload"),
                                max_size=128).first()
    assert thumb["status"] == "ok"
    assert (thumb["width"], thumb["height"]) == (128, 64)


def test_fill_bytes_before_markers(smooth):
    """T.81 allows any number of 0xFF fill bytes before a marker."""
    data = encode_jpeg(smooth)
    # inject fill bytes before the SOF segment
    import struct as st

    pos = 2
    while data[pos + 1] != 0xC0:
        pos += 2 + st.unpack_from(">H", data, pos + 2)[0]
    padded = data[:pos] + b"\xff\xff\xff" + data[pos:]
    assert (decode_jpeg(padded) == decode_jpeg(data)).all()


def test_decode_scales_linearly_not_quadratically():
    """The bit accumulator must stay bounded: decoding 4x the pixels
    should cost ~4x, not ~16x (guards the acc-masking fix)."""
    import time

    rng = np.random.RandomState(3)
    small = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    big = rng.randint(0, 256, (128, 128), dtype=np.uint8)
    es, eb = encode_jpeg(small, quality=85), encode_jpeg(big, quality=85)
    t0 = time.monotonic(); decode_jpeg(es); ts = time.monotonic() - t0
    t0 = time.monotonic(); decode_jpeg(eb); tb = time.monotonic() - t0
    assert tb < ts * 10                          # quadratic would be ~16x
