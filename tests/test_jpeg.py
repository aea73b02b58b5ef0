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
    # SOF9/SOF10 (arithmetic) are supported since round 5; SOF3
    # (lossless) remains outside the envelope
    data[pos + 1] = 0xC3
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(bytes(data))
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(ImageDecodeError):
        decode_jpeg(encode_jpeg(smooth)[:40])  # truncated


# -- progressive (SOF2) ------------------------------------------------------

SCRIPTS = [
    {},                                        # DC 1+1, AC bands at Al=1
    {"bands": ((1, 63),), "dc_al": 0, "ac_al": 0},  # spectral-select only
    {"bands": ((1, 2), (3, 10), (11, 63)), "dc_al": 2, "ac_al": 2},
    {"bands": ((1, 63),), "ac_al": 2},
]


def test_progressive_matches_baseline_exactly(smooth):
    """Progressive reorders the SAME quantized coefficients, so every
    scan script must decode byte-identically to the baseline encoding."""
    from docvault_ocr_service_spark.extract.jpeg import (
        encode_jpeg_progressive)

    rgb = np.dstack([smooth, 255 - smooth, np.roll(smooth, 7, axis=1)])
    rng = np.random.RandomState(1)
    noise = rng.randint(0, 256, (40, 56), dtype=np.uint8)
    cases = [(smooth, {}), (rgb, {}), (noise, {}),
             (rgb, {"subsampling": "420"})]
    for src, kw in cases:
        base = decode_jpeg(encode_jpeg(src, quality=80, **kw))
        for script in SCRIPTS:
            prog = decode_jpeg(
                encode_jpeg_progressive(src, quality=80, **kw, **script))
            assert (base == prog).all(), (kw, script)


def test_progressive_eob_runs_and_restarts():
    """Sparse blocks produce multi-block EOB runs; restart markers reset
    DC prediction and the EOB run without changing pixels."""
    from docvault_ocr_service_spark.extract.jpeg import (
        encode_jpeg_progressive)

    sparse = np.full((128, 120), 119, dtype=np.uint8)
    sparse[5, 7], sparse[100, 90], sparse[64, 64] = 250, 10, 180
    base = decode_jpeg(encode_jpeg(sparse, quality=90))
    assert (base == decode_jpeg(
        encode_jpeg_progressive(sparse, quality=90))).all()
    assert (base == decode_jpeg(
        encode_jpeg_progressive(sparse, quality=90,
                                restart_interval=3))).all()


def test_progressive_handwritten_bitstream():
    """Spec-level pin independent of our progressive ENCODER: a
    hand-assembled SOF2 stream (DC first at Al=1, DC refinement, AC
    first at Al=1, AC refinement with a correction bit) must decode to
    the exact IDCT of the hand-chosen coefficients."""
    import struct

    from docvault_ocr_service_spark.extract.jpeg import (
        QUANT_LUMA, ZIGZAG, idct2)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    def dht(tc, th, bits16, values):
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits16)
                   + bytes(values))

    q = QUANT_LUMA
    # DQT: Annex-K luma table, zigzag order
    dqt = seg(0xDB, bytes([0]) + bytes(int(v) for v in q.reshape(64)[ZIGZAG]))
    sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))

    # target coefficients (zigzag): DC=2, first AC (zigzag k=1) = 3
    # scan 1 — DC first, Al=1: encodes 2>>1 = 1 → size-1 symbol + bit 1
    # DC table: symbol {1} at code length 1 (code '0')
    dc_dht = dht(0, 0, [1] + [0] * 15, [1])
    sos1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    scan1 = bytes([0b0_1_111111])              # sym '0', diff bit '1', pad
    # scan 2 — DC refinement to Al=0: raw bit (2 & 1) = 0
    sos2 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    scan2 = bytes([0b0_1111111])
    # scan 3 — AC first, band 1..63, Al=1: t = 3>>1 = 1 at k=1
    # AC table: symbols {0x00 (EOB0), 0x01} at length 2 (codes '00','01')
    ac_dht = dht(1, 0, [0, 2] + [0] * 14, [0x00, 0x01])
    sos3 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    # sym 0x01 ('01') + sign '1' + EOB0 ('00') + pad
    scan3 = bytes([0b01_1_00_111])
    # scan 4 — AC refinement to Al=0: coef 3 is history-nonzero
    # (|3|>>0 > 1): whole band is one EOB0 + correction bit (3 & 1) = 1
    sos4 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    scan4 = bytes([0b00_1_11111])              # EOB0 '00' + correction '1'
    data = (b"\xff\xd8" + dqt + sof
            + dc_dht + sos1 + scan1 + sos2 + scan2
            + ac_dht + sos3 + scan3 + sos4 + scan4 + b"\xff\xd9")

    coef = np.zeros((8, 8))
    coef[0, 0] = 2 * q[0, 0]
    coef[0, 1] = 3 * q[0, 1]                   # zigzag k=1 → natural (0,1)
    expected = np.clip(np.rint(idct2(coef) + 128.0), 0, 255).astype(np.uint8)
    got = decode_jpeg(data)
    assert got.shape == (8, 8)
    assert (got == expected).all()


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
