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

    img = np.empty((30, 30), dtype=np.uint8)     # bright, HIGH contrast
    img[::2], img[1::2] = 120, 255               # mean≈187, std≈67
    img[0, 0] = 5                                 # |5*0.8 - 20| = 16
    out, d = preprocess_image(img)
    assert d["is_bright"] and not d["is_low_contrast"]
    assert not d["thresholded"]
    assert out[0, 0] == 16
