"""O1/O2/O3 surfaces: quality analysis, adaptive level + PSM selection
(decision logic value-identical to the reference), numpy kernels."""

import numpy as np
import pytest

from docvault_ocr_service_spark.extract.images import (
    analyze_image_quality, determine_psm, otsu_threshold,
    preprocess_image, select_enhance_level)


def test_quality_flags_reference_thresholds():
    dark = np.full((20, 20), 50, dtype=np.uint8)
    q = analyze_image_quality(dark)
    assert q["is_dark"] and q["is_low_contrast"] and not q["is_bright"]
    assert q["needs_enhancement"]
    bright = np.full((20, 20), 200, dtype=np.uint8)
    assert analyze_image_quality(bright)["is_bright"]
    rng = np.random.RandomState(1)
    normal = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    qn = analyze_image_quality(normal)
    assert not qn["needs_enhancement"]          # contrast ~74, mean ~128


def test_enhance_level_selection():
    base = {"is_dark": False, "is_low_contrast": False,
            "is_bright": False, "needs_enhancement": False,
            "sharpness": 500.0}
    assert select_enhance_level(base) == "light"
    assert select_enhance_level(base | {"sharpness": 10.0}) == "medium"
    assert select_enhance_level(
        base | {"is_dark": True, "needs_enhancement": True}) == "medium"
    assert select_enhance_level(
        base | {"is_dark": True, "is_low_contrast": True,
                "needs_enhancement": True}) == "aggressive"
    assert select_enhance_level(base, requested="aggressive") == \
        "aggressive"                             # explicit wins


def test_psm_reference_brackets():
    assert determine_psm(600, 100) == 13         # very wide -> raw line
    assert determine_psm(100, 600) == 4          # very tall -> column
    assert determine_psm(100, 100) == 6          # near-square -> block
    assert determine_psm(200, 100) == 3          # mixed -> automatic
    assert determine_psm(150, 100) == 3          # ar=1.5 not < 1.5


def test_otsu_matches_bruteforce():
    rng = np.random.RandomState(3)
    bimodal = np.concatenate([
        rng.normal(60, 10, 3000), rng.normal(190, 12, 2000)])
    g = np.clip(bimodal, 0, 255).astype(np.uint8).reshape(50, 100)
    t = otsu_threshold(g)

    def brute(gray):
        best_t, best_v = 0, -1.0
        flat = gray.reshape(-1).astype(np.float64)
        for cand in range(256):
            lo, hi = flat[flat <= cand], flat[flat > cand]
            if len(lo) == 0 or len(hi) == 0:
                continue
            w0, w1 = len(lo) / len(flat), len(hi) / len(flat)
            v = w0 * w1 * (lo.mean() - hi.mean()) ** 2
            if v > best_v:
                best_t, best_v = cand, v
        return best_t
    assert abs(t - brute(g)) <= 1
    assert 60 < t < 190                          # between the modes


def test_preprocess_paths():
    rng = np.random.RandomState(5)
    crisp = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    out, d = preprocess_image(crisp)
    assert d["enhance_level"] == "light" and not d["thresholded"]
    assert out.shape == crisp.shape

    dark_flat = (rng.randint(0, 20, (40, 40)) + 30).astype(np.uint8)
    out2, d2 = preprocess_image(dark_flat)
    assert d2["enhance_level"] == "aggressive" and d2["thresholded"]
    assert set(np.unique(out2)) <= {0, 255}      # binarized

    lowc = (rng.randint(0, 30, (40, 40)) + 120).astype(np.uint8)
    out3, d3 = preprocess_image(lowc)
    assert d3["enhance_level"] == "medium"
    assert d3["psm"] == 6


def test_bright_path_matches_convert_scale_abs():
    """cv2.convertScaleAbs = saturate(|alpha*x+beta|): a dark pixel on
    the bright path must reflect, not clip to zero."""
    import numpy as np

    from docvault_ocr_service_spark.extract.images import preprocess_image

    from docvault_ocr_service_spark.extract.images import unsharp_mask

    img = np.empty((30, 30), dtype=np.uint8)     # bright, HIGH contrast
    img[::2], img[1::2] = 120, 255               # mean≈187, std≈67
    img[0, 0] = 5                                 # |5*0.8 - 20| = 16
    out, d = preprocess_image(img)
    assert d["is_bright"] and not d["is_low_contrast"]
    assert not d["thresholded"]
    # the convertScaleAbs reflection feeds STEP 7's UnsharpMask; pin the
    # intermediate exactly and the final output as its unsharp image
    inter = np.clip(np.rint(np.abs(img.astype(np.float64) * 0.8 - 20)),
                    0, 255).astype(np.uint8)
    assert inter[0, 0] == 16
    assert (out == unsharp_mask(inter)).all()


def test_clahe_properties():
    from docvault_ocr_service_spark.extract.images import clahe

    # flat image is (near-)fixed when tile area >> 256 bins: clipped
    # uniform redistribution makes the LUT an approximate identity ramp
    # (with tiny tiles the 1-count clip genuinely shifts flat fields —
    # real cv2 CLAHE does the same)
    flat = np.full((256, 256), 137, dtype=np.uint8)
    out = clahe(flat)
    assert out.shape == flat.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - 137).max() <= 3

    # low-contrast image gains contrast, output stays in range
    rng = np.random.RandomState(11)
    lowc = (rng.randint(0, 25, (64, 80)) + 110).astype(np.uint8)
    out2 = clahe(lowc)
    assert out2.std() > lowc.std() * 1.5
    # non-divisible sizes (64x80 vs 8x8 tiles already is; try odd)
    odd = (rng.randint(0, 25, (37, 51)) + 110).astype(np.uint8)
    assert clahe(odd).shape == odd.shape


def test_clahe_single_tile_equals_global_clipped_histeq():
    """tiles=1 degenerates to global clipped histogram equalization —
    recompute that directly and compare exactly."""
    from docvault_ocr_service_spark.extract.images import clahe

    rng = np.random.RandomState(12)
    g = (rng.randint(0, 60, (32, 32)) + 80).astype(np.uint8)
    got = clahe(g, clip_limit=2.0, tiles=1)

    area = g.size
    clip = max(int(2.0 * area / 256), 1)
    hist = np.bincount(g.reshape(-1), minlength=256).astype(np.int64)
    excess = int(np.maximum(hist - clip, 0).sum())
    hist = np.minimum(hist, clip) + excess // 256
    r = excess % 256
    if r:
        hist[np.arange(0, 256, max(256 // r, 1))[:r]] += 1
    lut = np.clip(np.rint(hist.cumsum() * (255.0 / area)),
                  0, 255).astype(np.uint8)
    assert (got == lut[g]).all()


def test_bilateral_preserves_edges_smooths_noise():
    from docvault_ocr_service_spark.extract.images import bilateral_filter

    # hard 0/255 step: range kernel kills cross-edge weights -> unchanged
    step = np.zeros((20, 20), dtype=np.uint8)
    step[:, 10:] = 255
    out = bilateral_filter(step)
    assert (out == step).all()

    # mild noise on a flat field shrinks
    rng = np.random.RandomState(13)
    noisy = (120 + rng.randint(-8, 9, (40, 40))).astype(np.uint8)
    sm = bilateral_filter(noisy)
    assert sm.astype(float).std() < noisy.astype(float).std() * 0.6
    # flat field is a fixed point
    flat = np.full((16, 16), 90, dtype=np.uint8)
    assert (bilateral_filter(flat) == flat).all()


def test_rotate_image_identity_and_inverse():
    from docvault_ocr_service_spark.extract.images import rotate_image

    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, (50, 60)).astype(np.uint8)
    assert (rotate_image(img, 0.0) == img).all()     # exact at angle 0

    back = rotate_image(rotate_image(img, 10.0), -10.0)
    # interior pixels survive the round trip (borders replicate)
    inner = np.s_[15:-15, 15:-15]
    err = np.abs(back[inner].astype(int) - img[inner].astype(int))
    assert np.median(err) <= 30      # cubic resampling noise on random img

    smooth = np.fromfunction(lambda y, x: (x + 2 * y) % 256,
                             (60, 60)).astype(np.uint8)
    back2 = rotate_image(rotate_image(smooth, 7.0), -7.0)
    err2 = np.abs(back2[inner].astype(int) - smooth[inner].astype(int))
    assert err2.mean() < 12


def test_deskew_recovers_known_tilt():
    from docvault_ocr_service_spark.extract.images import (
        deskew_angle, rotate_image)

    # horizontal text-like stripes
    page = np.zeros((120, 160), dtype=np.uint8)
    for y0 in range(20, 100, 16):
        page[y0:y0 + 4, 20:140] = 255
    assert abs(deskew_angle(page)) < 0.51  # already straight

    tilted = rotate_image(page, 3.0)
    got = deskew_angle(tilted)
    assert abs(abs(got) - 3.0) < 0.8
    fixed = rotate_image(tilted, got)
    assert abs(deskew_angle(fixed)) < 0.6


def test_preprocess_aggressive_runs_clahe_and_deskew():
    from docvault_ocr_service_spark.extract.images import (
        preprocess_image, rotate_image)

    # dark, low-contrast, tilted stripes -> aggressive path
    page = np.full((120, 160), 40, dtype=np.uint8)
    for y0 in range(20, 100, 16):
        page[y0:y0 + 4, 20:140] = 75
    tilted = rotate_image(page, 4.0)
    out, d = preprocess_image(tilted)
    assert d["enhance_level"] == "aggressive"
    assert d["clahe"] and d["thresholded"]
    assert abs(abs(d["deskew_angle"]) - 4.0) < 1.2


def test_preprocess_media_spark(spark):
    from docvault_ocr_service_spark.extract.images import (
        encode_png, encode_tiff_gray)
    from docvault_ocr_service_spark.functions.multimodal import (
        preprocess_media)

    dark = np.full((40, 40), 30, dtype=np.uint8)          # aggressive
    crisp = np.empty((30, 30), dtype=np.uint8)            # light
    crisp[::2], crisp[1::2] = 60, 190
    rows = [("d", encode_png(dark)),
            ("c", encode_tiff_gray([crisp], compression="lzw")),
            ("x", b"\x89PNG\r\n\x1a\ntruncated"),
            ("u", b"not an image")]
    media = spark.createDataFrame(rows, ["media_id", "payload"])
    got = {r["media_id"]: r for r in preprocess_media(media).collect()}

    assert got["d"]["status"] == "ok"
    assert got["d"]["enhance_level"] == "aggressive"
    assert got["d"]["clahe"] and got["d"]["thresholded"]
    assert got["d"]["bilateral"]                 # flat => sharpness 0
    assert got["d"]["deskew_angle"] == 0.0
    assert got["c"]["status"] == "ok"
    assert got["c"]["enhance_level"] == "light"
    assert not got["c"]["clahe"] and not got["c"]["thresholded"]
    assert got["x"]["status"].startswith("corrupted:")
    assert got["u"]["status"].startswith("no_codec:")
    # preprocessed page decodes back
    from docvault_ocr_service_spark.extract.images import decode_png
    img = decode_png(bytes(got["d"]["preprocessed_png"]))
    assert img.shape == (40, 40)


def test_unsharp_mask_semantics():
    from docvault_ocr_service_spark.extract.images import unsharp_mask

    # flat field: diff 0 < threshold everywhere -> identity
    flat = np.full((20, 20), 90, dtype=np.uint8)
    assert (unsharp_mask(flat) == flat).all()

    # a step edge gets overshoot on both sides (sharpened)
    step = np.zeros((20, 20), dtype=np.uint8)
    step[:, 10:] = 200
    out = unsharp_mask(step)
    assert out[5, 9] <= step[5, 9]          # dark side pushed darker
    assert out[5, 10] >= step[5, 10]        # bright side pushed brighter
    assert out[5, 0] == 0 and out[5, 19] == 200   # far field untouched

    # sub-threshold ripple (|diff| < 3) passes through untouched
    ripple = np.full((20, 20), 100, dtype=np.uint8)
    ripple[::2] = 101
    assert (unsharp_mask(ripple) == ripple).all()
