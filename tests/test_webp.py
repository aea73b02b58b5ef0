"""VP8L (lossless WebP) codec: roundtrips across shapes and
palettes, container/error taxonomy, spec-surface details (simple
codes, color cache, unsupported variants)."""

import struct

import numpy as np
import pytest

from docvault_ocr_service_spark.extract.images import (
    ImageDecodeError, UnsupportedImageError, sniff_image_format)
from docvault_ocr_service_spark.extract.webp import (
    _BitWriter, decode_webp, encode_webp_lossless)


def _expect(img: np.ndarray) -> np.ndarray:
    """What decode should return for an encode of ``img``."""
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1)
    if img.shape[2] == 2:
        rgb = np.stack([img[..., 0]] * 3, axis=-1)
        if bool(np.any(img[..., 1] != 255)):
            return np.dstack([rgb, img[..., 1]])
        return rgb
    if img.shape[2] == 4 and not np.any(img[..., 3] != 255):
        return img[..., :3]
    return img


def test_roundtrip_shapes_and_palettes():
    rng = np.random.default_rng(20260817)
    cases = [
        np.zeros((1, 1), np.uint8),
        np.full((5, 3, 3), 77, np.uint8),               # constant
        np.where(rng.random((31, 17)) < 0.5, 0, 255).astype(np.uint8),
        rng.integers(0, 4, (16, 16, 3)).astype(np.uint8),   # tiny palette
        rng.integers(0, 256, (25, 40, 3)).astype(np.uint8),  # dense
        rng.integers(0, 256, (12, 9, 4)).astype(np.uint8),   # alpha
        np.dstack([rng.integers(0, 256, (8, 8)),
                   rng.integers(0, 255, (8, 8))]).astype(np.uint8),  # LA
        (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8),
    ]
    for img in cases:
        back = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(back, _expect(img)), img.shape


def test_roundtrip_fuzz_small():
    rng = np.random.default_rng(99)
    for _ in range(25):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 20))
        c = int(rng.choice([0, 2, 3, 4]))
        shape = (h, w) if c == 0 else (h, w, c)
        # mixed palette sizes stress simple vs normal code selection
        hi = int(rng.choice([2, 3, 17, 256]))
        img = rng.integers(0, hi, shape).astype(np.uint8)
        back = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(back, _expect(img)), (shape, hi)


def test_sniff_and_container_taxonomy():
    img = np.full((4, 4, 3), 5, np.uint8)
    data = encode_webp_lossless(img)
    assert sniff_image_format(data[:16]) == "webp"
    assert sniff_image_format(b"RIFF\x00\x00\x00\x00WAVE") is None

    with pytest.raises(ImageDecodeError, match="RIFF"):
        decode_webp(b"not a webp")
    # lossy VP8 and extended VP8X raise honest Unsupported
    for fourcc in (b"VP8 ", b"VP8X"):
        payload = b"RIFF" + struct.pack("<I", 12) + b"WEBP" \
            + fourcc + struct.pack("<I", 0)
        with pytest.raises(UnsupportedImageError):
            decode_webp(payload)
    # truncated VP8L chunk
    with pytest.raises(ImageDecodeError):
        decode_webp(data[:20])


def test_corrupt_transform_bits_rejected():
    img = np.full((2, 2, 3), 1, np.uint8)
    good = encode_webp_lossless(img)
    # flip the no-transform bit (first bit after the 37-bit header
    # inside the VP8L payload): signature byte + 14+14+1+3 = bit 40
    # of the payload → byte 5, bit 0 — the following bits then parse
    # as a bogus transform and must fail loudly, never as garbage
    start = good.index(b"VP8L") + 8
    broken = bytearray(good)
    broken[start + 5] |= 0x01
    with pytest.raises(ImageDecodeError):
        decode_webp(bytes(broken))


def test_distance_map_matches_spec_table():
    """The generated 120-entry neighbor map must reproduce the table
    listed in RFC 9649 §3.7.2.3 — pinned at both ends and across the
    distance-tie boundaries where the ordering rule could slip."""
    from docvault_ocr_service_spark.extract.webp import _DIST_MAP

    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    assert _DIST_MAP[34:40] == [
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert _DIST_MAP[96:104] == [
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2),
        (6, 6)]
    assert _DIST_MAP[112:] == [
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6),
        (8, 7)]


def test_backref_roundtrip():
    """The backref encoder emits real dist-1/dist-width references;
    the decoder must reproduce the literal-path pixels exactly."""
    rng = np.random.default_rng(20260818)
    img = np.zeros((40, 37, 3), np.uint8)
    img[:, :10] = 200                       # horizontal runs
    img[5] = img[4]                         # row copy
    img[20:30] = rng.integers(0, 256, (10, 37, 3))
    img[31] = img[30]
    data = encode_webp_lossless(img, backrefs=True)
    assert np.array_equal(decode_webp(data), img)
    # refs must actually fire: the token stream compresses
    assert len(data) < len(encode_webp_lossless(img))

    for _ in range(20):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        c = int(rng.choice([0, 2, 3, 4]))
        shape = (h, w) if c == 0 else (h, w, c)
        im = rng.integers(0, int(rng.choice([2, 5, 256])),
                          shape).astype(np.uint8)
        if h > 2:
            im[1] = im[0]
        got = decode_webp(encode_webp_lossless(im, backrefs=True))
        exp = decode_webp(encode_webp_lossless(im))
        assert np.array_equal(got, exp), shape


def test_backref_long_run_crosses_length_codes():
    """Runs longer than 4096 px split into max-length refs; extra-bit
    length codes (length ≥ 5) decode correctly."""
    img = np.full((3, 2000, 3), 9, np.uint8)      # 6000-px run
    data = encode_webp_lossless(img, backrefs=True)
    assert np.array_equal(decode_webp(data), img)


def _normal_green_code(bw, lengths_by_symbol, alphabet):
    """Emit a normal (code-length-coded) prefix code whose used
    lengths are all ≤2 — enough for the hand-built streams below."""
    lengths = [0] * alphabet
    for s, ln in lengths_by_symbol.items():
        lengths[s] = ln
    used = sorted(set(lengths))
    cl_lengths = {ln: 1 for ln in used} if len(used) == 2 else None
    assert cl_lengths is not None, "helper supports 2 used cl lengths"
    order = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
             9, 10, 11, 12, 13, 14, 15, 16]
    bw.write(0, 1)                       # normal code
    num_cl = max(order.index(ln) for ln in used) + 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(order[i], 0), 3)
    bw.write(0, 1)                       # no max_symbol shortcut
    # cl canonical over two 1-bit symbols: smaller symbol → code 0
    lo = min(used)
    for ln in lengths:
        bw.write(0 if ln == lo else 1, 1)


def test_backref_pixels_enter_color_cache():
    """Spec: every produced pixel — including backref copies — is
    inserted into the color cache.  Distinguishing stream: literal A,
    literal B (same cache index, evicts A), a dist-2 backref copying
    A (must re-insert A), then a cache hit → must yield A, not B."""
    # (r=1,g=0,b=3,a=255) and (r=1,g=1,b=3,a=255) collide at
    # cache_bits=1 (both index 0)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)          # w=2
    bw.write(1, 14)          # h=2
    bw.write(0, 1)           # alpha unused
    bw.write(0, 3)           # version
    bw.write(0, 1)           # no transform
    bw.write(1, 1)           # color cache present
    bw.write(1, 4)           # cache_bits = 1
    bw.write(0, 1)           # no meta codes
    alphabet = 256 + 24 + 2
    # green: {0:lit A, 1:lit B, 256:len-1 ref, 280:cache idx 0}, 2 bits
    _normal_green_code(bw, {0: 2, 1: 2, 256: 2, 280: 2}, alphabet)
    # r/b/a single-symbol simple codes (1 / 3 / 255)
    for sym in (1, 3, 255):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance tree: single symbol 0 → dist_code 1 → plane (0,1) →
    # dist = width = 2
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # canonical 2-bit codes: 0→00, 1→01, 256→10, 280→11
    bw.write_code(0b00, 2)   # literal A (g=0)
    bw.write_code(0b01, 2)   # literal B (g=1)
    bw.write_code(0b10, 2)   # backref: length code 0 → len 1, dist 2
    bw.write_code(0b11, 2)   # cache hit at index 0
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    img = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [1, 0, 3]     # A
    assert img[0, 1].tolist() == [1, 1, 3]     # B
    assert img[1, 0].tolist() == [1, 0, 3]     # copied A
    assert img[1, 1].tolist() == [1, 0, 3], \
        "cache hit must see the re-inserted copied pixel, not stale B"


def test_backref_out_of_range_rejected():
    """A backref reaching before the first pixel is corrupt, not UB."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)          # w=2
    bw.write(0, 14)          # h=1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)           # no transform
    bw.write(0, 1)           # no cache
    bw.write(0, 1)           # no meta
    # green: single symbol 256 (needs a normal code: >255)
    _normal_green_code(bw, {256: 1}, 256 + 24)
    for sym in (0, 0, 0):    # r/b/a single-symbol codes
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(sym, 1)
    bw.write(1, 1)           # dist: single symbol 0
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixel stream: green single → immediate backref at i=0, dist 2
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    with pytest.raises(ImageDecodeError, match="out of range"):
        decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_parse_webp_meta_variants():
    """Dims without pixel decode for all three container variants —
    the metadata-only path for wild lossy/extended files."""
    from docvault_ocr_service_spark.extract.webp import parse_webp_meta

    img = np.full((7, 5, 3), 4, np.uint8)
    m = parse_webp_meta(encode_webp_lossless(img))
    assert m == {"variant": "vp8l", "width": 5, "height": 7}

    # crafted lossy VP8 keyframe header (RFC 6386 §9.1): 640×480 with
    # a horizontal-rescale hint in the upper width bits
    body = bytes(3) + b"\x9d\x01\x2a" \
        + struct.pack("<HH", 640 | (1 << 14), 480)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    m = parse_webp_meta(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert m == {"variant": "vp8", "width": 640, "height": 480}

    # VP8X extended: 24-bit canvas dims minus one
    body = bytes(4) + bytes([0x3F, 0x01, 0x00]) + bytes([0xDF, 0, 0])
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    m = parse_webp_meta(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert m == {"variant": "vp8x", "width": 320, "height": 224}

    with pytest.raises(ImageDecodeError):
        parse_webp_meta(b"RIFF\x04\x00\x00\x00WEBP")
    # interframe-first VP8 stream is malformed, not metadata
    body = bytes([1, 0, 0]) + b"\x9d\x01\x2a" + struct.pack("<HH", 1, 1)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    with pytest.raises(ImageDecodeError, match="interframe"):
        parse_webp_meta(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_decode_row_lossy_webp_metadata_only():
    """The media pipeline lands wild lossy-VP8 files as honest
    metadata_only rows with real header dims (the audio precedent)."""
    from docvault_ocr_service_spark.functions.multimodal import \
        _decode_row

    body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    row = _decode_row("m1", "image", payload)
    assert row["decode_status"] == "metadata_only:webp_vp8"
    assert (row["width"], row["height"]) == (64, 48)
    assert row["format"] == "webp"


def test_decoder_reads_color_cache_stream():
    """Hand-build a minimal cache-bearing VP8L stream: 2×1, second
    pixel served from the color cache — decoder support for external
    encoders' files."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)          # width-1 = 1 -> w=2
    bw.write(0, 14)          # height 1
    bw.write(0, 1)           # alpha unused
    bw.write(0, 3)           # version
    bw.write(0, 1)           # no transform
    bw.write(1, 1)           # color cache present
    bw.write(1, 4)           # cache_bits = 1 (2 entries)
    bw.write(0, 1)           # no meta codes
    argb = (255 << 24) | (10 << 16) | (20 << 8) | 30
    cache_idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> 31
    cache_sym = 256 + 24 + 2 + cache_idx - 2  # 280 + idx
    # green tree: simple 2-symbol {20 (literal), 280+idx (cache hit)}
    # -> but simple codes carry 8-bit symbols only, so cache syms >255
    # need a normal code; build one with symbols 20 and cache_sym at
    # length 1 each via the code-length code
    alphabet = 256 + 24 + 2
    lengths = [0] * alphabet
    lengths[20] = 1
    lengths[cache_sym] = 1
    bw.write(0, 1)           # normal code
    # cl code: lengths used {0,1} -> two 1-bit cl codes
    cl_lengths = {0: 1, 1: 1}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
             9, 10, 11, 12, 13, 14, 15, 16]
    num_cl = order.index(1) + 1  # cover symbols 0 and 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(order[i], 0), 3)
    bw.write(0, 1)           # no max_symbol shortcut
    # cl canonical: symbol 0 -> code 0, symbol 1 -> code 1 (len 1 each)
    for ln in lengths:
        bw.write(ln, 1)
    # red / blue / alpha: simple 1-symbol codes (10 / 30 / 255)
    for sym in (10, 30, 255):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance: simple 1-symbol code, symbol 0
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixels: literal (g=20,r=10,b=30,a=255) then cache hit
    # green codes: canonical over {20, cache_sym} -> 20 gets 0
    bw.write(0, 1)           # literal green=20
    # r/b/a are single-symbol codes: zero bits
    bw.write(1, 1)           # green symbol = cache_sym -> cache[idx]
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    img = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[0, 1].tolist() == [10, 20, 30]


def test_dimension_limits():
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((1, 16385), np.uint8))
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((0, 4), np.uint8))


def test_decode_bomb_rejected_fast():
    """A ~40-byte crafted VP8L header declaring 16384×16384 with
    zero-bit-per-pixel codes must be rejected by the decode-envelope
    guard BEFORE the pixel loop, not after minutes of CPU."""
    import time

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(16383, 14)
    bw.write(16383, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)          # no transform
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta
    for sym in (1, 2, 3, 4, 0):    # five 1-symbol simple codes
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    p = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(p)) + p
    riff = b"WEBP" + chunk
    bomb = b"RIFF" + struct.pack("<I", len(riff)) + riff
    t0 = time.monotonic()
    with pytest.raises(UnsupportedImageError, match="decode envelope"):
        decode_webp(bomb)
    assert time.monotonic() - t0 < 1.0


# -- transform tests ----------------------------------------------------------

def _wrap_vp8l(payload):
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _ref_predict(mode, px, x, y, w):
    """Channel-wise (a, r, g, b) reference predictor — written from
    the spec pseudocode independently of the decoder's packed-int
    arithmetic, so packed-add/avg bugs can't self-confirm."""
    L = px[y * w + x - 1]
    T = px[(y - 1) * w + x]
    TL = px[(y - 1) * w + x - 1]
    # TR: contiguous addressing — for x = w-1 this is the first pixel
    # of the CURRENT row
    TR = px[(y - 1) * w + x + 1]

    def avg2(p, q):
        return tuple((pc + qc) >> 1 for pc, qc in zip(p, q))

    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg2(avg2(L, TR), T)
    if mode == 6:
        return avg2(L, TL)
    if mode == 7:
        return avg2(L, T)
    if mode == 8:
        return avg2(TL, T)
    if mode == 9:
        return avg2(T, TR)
    if mode == 10:
        return avg2(avg2(L, TL), avg2(T, TR))
    if mode == 11:
        pT = sum(abs(lc - cc) for lc, cc in zip(L, TL))
        pL = sum(abs(tc - cc) for tc, cc in zip(T, TL))
        return T if pT <= pL else L
    if mode == 12:
        return tuple(min(255, max(0, lc + tc - cc))
                     for lc, tc, cc in zip(L, T, TL))
    if mode == 13:
        av = tuple((lc + tc) >> 1 for lc, tc in zip(L, T))
        outp = []
        for ac, cc in zip(av, TL):
            q = ac - cc
            half = (q // 2) if q >= 0 else -((-q) // 2)
            outp.append(min(255, max(0, ac + half)))
        return tuple(outp)
    raise AssertionError(mode)


def _predictor_residual_argbs(img, sb, modes, tw):
    """Forward predictor pass (test-side reference) → residual ARGBs
    in scan order."""
    h, w = img.shape[:2]
    px = [(int(img[y, x, 3]), int(img[y, x, 0]), int(img[y, x, 1]),
           int(img[y, x, 2]))
          for y in range(h) for x in range(w)]
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0 and x == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[(y >> sb) * tw + (x >> sb)]
                pred = _ref_predict(mode, px, x, y, w)
            a8, r8, g8, b8 = ((pc - qc) & 0xFF
                              for pc, qc in zip(px[i], pred))
            res.append((a8 << 24) | (r8 << 16) | (g8 << 8) | b8)
    return res


def _build_transform_stream(w, h, writer_fns, payload_argbs):
    """Header + transform chunks (each fn writes one transform after
    its 1-bit presence flag) + cache/meta bits + literal payload."""
    from docvault_ocr_service_spark.extract.webp import (
        _BitWriter, _encode_spatial)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)               # alpha hint: keep 4 channels
    bw.write(0, 3)
    for fn in writer_fns:
        bw.write(1, 1)
        fn(bw)
    bw.write(0, 1)               # end of transforms
    bw.write(0, 1)               # no cache
    bw.write(0, 1)               # no meta
    _encode_spatial(bw, payload_argbs)
    return _wrap_vp8l(bw.done())


def test_predictor_transform_all_modes():
    """Each of the 14 predictor modes reconstructs exactly from
    residuals computed by the channel-wise reference."""
    from docvault_ocr_service_spark.extract.webp import _encode_subimage

    rng = np.random.default_rng(5)
    for mode in range(14):
        img = rng.integers(0, 256, (6, 9, 4)).astype(np.uint8)
        sb, tw = 4, 1                 # one 16x16 block
        res = _predictor_residual_argbs(img, sb, [mode], tw)

        def t_pred(bw, mode=mode, sb=sb):
            bw.write(0, 2)            # PREDICTOR
            bw.write(sb - 2, 3)
            _encode_subimage(bw, [mode << 8])

        got = decode_webp(_build_transform_stream(9, 6, [t_pred], res))
        assert np.array_equal(got, img), f"mode {mode}"


def test_predictor_transform_mixed_block_grid():
    """A 3x2 grid of different modes over a 12x9 image — block
    addressing, rightmost-column TR wrap, and mode switches."""
    from docvault_ocr_service_spark.extract.webp import _encode_subimage

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (9, 12, 4)).astype(np.uint8)
    sb = 2                            # 4x4 blocks -> tw=3, th=3
    tw = 3
    modes = [1, 7, 11, 2, 13, 5, 12, 9, 3]
    res = _predictor_residual_argbs(img, sb, modes, tw)

    def t_pred(bw):
        bw.write(0, 2)
        bw.write(sb - 2, 3)
        _encode_subimage(bw, [m << 8 for m in modes])

    got = decode_webp(_build_transform_stream(12, 9, [t_pred], res))
    assert np.array_equal(got, img)


def test_color_transform_roundtrip():
    """Forward color transform computed channel-wise (sign-extended
    int8 products, arithmetic >>5) must invert exactly."""
    from docvault_ocr_service_spark.extract.webp import _encode_subimage

    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (8, 10, 4)).astype(np.uint8)
    h, w = 8, 10
    sb, tw = 2, 3                     # 4x4 blocks: 3x2 grid
    ctes = [(g2r, g2b, r2b) for g2r, g2b, r2b in
            [(17, 250, 3), (0, 0, 0), (130, 40, 200),
             (255, 1, 128), (64, 64, 64), (5, 250, 9)]]
    res = []
    for y in range(h):
        for x in range(w):
            g2r, g2b, r2b = ctes[(y >> sb) * tw + (x >> sb)]
            a8, r8, g8, b8 = (int(img[y, x, 3]), int(img[y, x, 0]),
                              int(img[y, x, 1]), int(img[y, x, 2]))
            # forward = subtract the deltas the decoder adds back
            nr = (r8 - delta(g2r, g8)) & 0xFF
            nb = (b8 - delta(g2b, g8) - delta(r2b, r8)) & 0xFF
            res.append((a8 << 24) | (nr << 16) | (g8 << 8) | nb)

    def t_ct(bw):
        bw.write(1, 2)                # COLOR_TRANSFORM
        bw.write(sb - 2, 3)
        _encode_subimage(bw, [(r2b << 16) | (g2b << 8) | g2r
                              for g2r, g2b, r2b in ctes])

    got = decode_webp(_build_transform_stream(w, h, [t_ct], res))
    assert np.array_equal(got, img)


def test_subtract_green_and_palette_encoders():
    """The two encoder-side transforms round-trip across shapes and
    bundling levels (compliant-decoder-readable output)."""
    rng = np.random.default_rng(11)
    for shape in ((7, 5, 3), (16, 16, 4), (9, 9), (3, 20, 2)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        got = decode_webp(encode_webp_lossless(img, subtract_green=True))
        assert np.array_equal(got, _expect(img)), shape

    for ncol in (2, 4, 13, 40, 200):
        vals = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        img = vals[rng.integers(0, ncol, (9, 17))]
        got = decode_webp(encode_webp_lossless(img, palette=True))
        assert np.array_equal(got, img), ncol
    # bundled palette + backrefs together
    img = np.zeros((12, 40, 3), np.uint8)
    img[:, :20] = (10, 200, 30)
    got = decode_webp(encode_webp_lossless(img, palette=True,
                                           backrefs=True))
    assert np.array_equal(got, img)
    with pytest.raises(ValueError, match="256 unique"):
        encode_webp_lossless(
            rng.integers(0, 256, (40, 40, 3)).astype(np.uint8),
            palette=True)


def test_transform_chain_reverse_order():
    """SUBTRACT_GREEN read after PREDICTOR: inverses must apply in
    reverse read order (green added back BEFORE prediction)."""
    from docvault_ocr_service_spark.extract.webp import _encode_subimage

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)
    sb, tw = 4, 1
    res = _predictor_residual_argbs(img, sb, [7], tw)
    # forward subtract-green ON THE RESIDUALS (the later-read
    # transform is the outermost forward pass)
    sg = []
    for v in res:
        a8, r8, g8, b8 = (v >> 24) & 255, (v >> 16) & 255,             (v >> 8) & 255, v & 255
        sg.append((a8 << 24) | (((r8 - g8) & 255) << 16) | (g8 << 8)
                  | ((b8 - g8) & 255))

    def t_pred(bw):
        bw.write(0, 2)
        bw.write(sb - 2, 3)
        _encode_subimage(bw, [7 << 8])

    def t_sg(bw):
        bw.write(2, 2)

    got = decode_webp(_build_transform_stream(7, 5, [t_pred, t_sg],
                                              sg))
    assert np.array_equal(got, img)


def test_duplicate_transform_rejected():
    def t_sg(bw):
        bw.write(2, 2)

    with pytest.raises(ImageDecodeError, match="duplicate"):
        decode_webp(_build_transform_stream(
            2, 2, [t_sg, t_sg],
            [0xFF000000] * 4))


def test_meta_prefix_groups():
    """Meta prefix codes: an entropy image maps the left half of an
    8x2 image to group 0 and the right half to group 1; each group's
    single-symbol codes give different colors — the decoder must
    switch code groups at the block boundary."""
    from docvault_ocr_service_spark.extract.webp import (
        _BitWriter, _encode_subimage)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(7, 14)              # w=8
    bw.write(1, 14)              # h=2
    bw.write(0, 1)               # alpha unused
    bw.write(0, 3)
    bw.write(0, 1)               # no transforms
    bw.write(0, 1)               # no color cache
    bw.write(1, 1)               # meta prefix codes present
    bw.write(0, 3)               # meta_sb = 2 -> 4x4 blocks, etw=2
    # entropy image 2x1: indices 0, 1 in the GREEN+RED channels
    _encode_subimage(bw, [0 << 8, 1 << 8])
    # group 0: g=10, r=20, b=30, a=255; group 1: g=40, r=50, b=60
    for sym_set in ((10, 20, 30, 255), (40, 50, 60, 255)):
        for sym in sym_set:
            bw.write(1, 1)       # simple, 1 symbol, 8-bit
            bw.write(0, 1)
            bw.write(1, 1)
            bw.write(sym, 8)
        bw.write(1, 1)           # dist: single symbol 0
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
    # all codes are zero-bit: no payload bits at all
    payload = bw.done()
    img = decode_webp(_wrap_vp8l(payload))
    assert img.shape == (2, 8, 3)
    assert img[0, 0].tolist() == [20, 10, 30]     # group 0 (r,g,b)
    assert img[0, 3].tolist() == [20, 10, 30]
    assert img[0, 4].tolist() == [50, 40, 60]     # group 1
    assert img[1, 7].tolist() == [50, 40, 60]


def test_decode_webp_total_under_mutation():
    """Totality fuzz over the full decoder surface (transforms, meta
    groups, backrefs): byte flips and truncations of valid streams
    must decode or raise the two image errors — never IndexError/
    struct.error/KeyError (the JPEG suite's discipline)."""
    rng = np.random.default_rng(404)
    pal_img = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)[
        rng.integers(0, 2, (9, 14))]
    streams = [
        encode_webp_lossless(rng.integers(0, 256, (8, 11, 3))
                             .astype(np.uint8)),
        encode_webp_lossless(np.full((6, 30, 3), 7, np.uint8),
                             backrefs=True),
        encode_webp_lossless(pal_img, palette=True),
        encode_webp_lossless(rng.integers(0, 256, (7, 7, 4))
                             .astype(np.uint8), subtract_green=True),
    ]
    for data in streams:
        start = data.index(b"VP8L") + 8
        for _ in range(120):
            mutated = bytearray(data)
            op = rng.integers(0, 3)
            if op == 0:
                pos = int(rng.integers(start, len(data)))
                mutated[pos] ^= 1 << int(rng.integers(0, 8))
            elif op == 1:
                cut = int(rng.integers(start + 1, len(data)))
                mutated = mutated[:cut]
                # keep RIFF/chunk sizes consistent with truncation
                mutated[4:8] = struct.pack("<I", len(mutated) - 8)
                mutated[start - 4:start] = struct.pack(
                    "<I", max(len(mutated) - start, 0))
            else:
                pos = int(rng.integers(start, len(data)))
                mutated[pos] = int(rng.integers(0, 256))
            try:
                decode_webp(bytes(mutated))
            except (ImageDecodeError, UnsupportedImageError):
                pass


def test_transform_decode_bomb_rejected_fast():
    """A crafted header declaring huge dims + a transform sub-image
    must be rejected on the declared dims, before any slow-path CPU
    burn (review finding)."""
    import time

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)            # COLOR_TRANSFORM
    bw.write(1, 3)            # sb=3 -> 2048x2048 sub-image
    p = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(p)) + p
    riff = b"WEBP" + chunk
    bomb = b"RIFF" + struct.pack("<I", len(riff)) + riff
    t0 = time.monotonic()
    with pytest.raises(UnsupportedImageError, match="envelope"):
        decode_webp(bomb)
    assert time.monotonic() - t0 < 0.5


def test_palette_index_out_of_range_is_transparent_black():
    """RFC 9649: indices >= color_table_size decode as 0x00000000.
    n_colors=5 -> width_bits 1 (4 bits/px): a packed green byte 0x70
    yields x0 index 0 (a real color) and x1 index 7 >= 5."""
    from docvault_ocr_service_spark.extract.webp import (
        _BitWriter as BW, _encode_subimage, _encode_spatial)

    bw2 = BW()
    bw2.write(0x2F, 8)
    bw2.write(1, 14)
    bw2.write(0, 14)
    bw2.write(1, 1)
    bw2.write(0, 3)
    bw2.write(1, 1)
    bw2.write(3, 2)
    bw2.write(4, 8)           # n_colors = 5 -> width_bits 1
    _encode_subimage(bw2, [0xFF112233, 0x01010101, 0x01010101,
                           0x01010101, 0x01010101])
    bw2.write(0, 1)
    bw2.write(0, 1)
    bw2.write(0, 1)
    _encode_spatial(bw2, [(255 << 24) | (0x70 << 8)])
    img = decode_webp(_wrap_vp8l(bw2.done()))
    assert img.shape == (1, 2, 4)
    assert img[0, 0].tolist() == [0x11, 0x22, 0x33, 0xFF]
    assert img[0, 1].tolist() == [0, 0, 0, 0]     # transparent black
