"""P1-P4/P6-P8 pure-numpy preprocessing + E6 Arabic shaping fallback
(VERDICT r1 items 5-6). Property tests on synthetic arrays mirror the
reference's own preprocessing tests
(tests/unit/test_ocr_comprehensive.py:91-100); the Arabic shaping
pins exact presentation-form output on known words."""

import numpy as np

from ocr_intern_spark.functions.arabic_text import (
    get_display,
    postprocess_arabic,
    reshape,
)
from ocr_intern_spark.functions.imageproc import (
    _hough_strongest_line,
    adaptive_threshold_gaussian,
    arabic_preprocess,
    clahe,
    deskew,
    equalize_hist,
    french_preprocess,
    nl_means_denoise,
    normalize_minmax,
    otsu_threshold,
    preprocess_pipeline,
    region_preprocess,
    rotate_bilinear,
    to_grayscale,
)

RNG = np.random.RandomState(7)


def test_grayscale_weights_and_shape():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[..., 0] = 255  # pure blue (BGR)
    g = to_grayscale(img)
    assert g.shape == (4, 4) and g.dtype == np.uint8
    # BT.601: blue weight 0.114 → 29
    assert int(g[0, 0]) == 29
    img[:] = 0
    img[..., 2] = 255  # pure red → 76
    assert int(to_grayscale(img)[0, 0]) == 76
    # 2-D passes through
    flat = np.full((3, 3), 7, dtype=np.uint8)
    assert to_grayscale(flat) is flat


def test_normalize_minmax():
    img = np.array([[10, 30], [60, 10]], dtype=np.uint8)
    out = normalize_minmax(img)
    assert out.min() == 0 and out.max() == 255
    assert out[0, 1] == (30 - 10) * 255 // 50  # 102, exact
    const = np.full((3, 3), 99, dtype=np.uint8)
    assert (normalize_minmax(const) == 0).all()  # OpenCV scale-0 branch


def test_adaptive_threshold_binary():
    img = np.full((20, 20), 128, dtype=np.uint8)
    out = adaptive_threshold_gaussian(img)
    assert set(np.unique(out)) <= {0, 255}
    assert (out == 255).all()  # uniform: pixel > mean - 2 everywhere
    img[8:12, 8:12] = 20  # dark patch on light ground → 0 inside
    out2 = adaptive_threshold_gaussian(img)
    assert out2[10, 10] == 0 and out2[0, 0] == 255


def test_otsu_separates_bimodal():
    img = np.full((10, 10), 50, dtype=np.uint8)
    img[:, 5:] = 200
    t, binary = otsu_threshold(img)
    assert 50 <= t < 200
    assert (binary[:, :5] == 0).all() and (binary[:, 5:] == 255).all()


def test_equalize_hist_expands_range():
    img = RNG.randint(100, 140, (32, 32)).astype(np.uint8)
    out = equalize_hist(img)
    assert out.dtype == np.uint8
    assert out.max() == 255 and out.min() < 30
    # order-preserving: equalization is monotone in pixel value
    a, b = img.ravel(), out.ravel()
    order = np.argsort(a)
    assert (np.diff(b[order].astype(int))[np.diff(a[order]) > 0] >= 0).all()


def test_clahe_boosts_local_contrast():
    ramp = np.tile(np.linspace(118, 138, 64).astype(np.uint8), (64, 1))
    out = clahe(ramp)
    assert out.shape == ramp.shape and out.dtype == np.uint8
    assert out.astype(int).std() > ramp.astype(int).std()


def test_nl_means_reduces_noise():
    # h=10 (the reference's Arabic chain) smooths noise with
    # 2σ² ≲ h²: exp(-2σ²/h²) must stay O(1) for neighbors to get
    # weight — σ=8 noise, not σ=30
    noisy = np.clip(
        RNG.normal(128, 8, (48, 48)), 0, 255
    ).astype(np.uint8)
    out = nl_means_denoise(noisy, h=10.0, template_window=5, search_window=9)
    assert out.shape == noisy.shape
    assert out.astype(int).std() < noisy.astype(int).std() * 0.8


def test_hough_detects_tilt_and_deskew_fixes_it():
    # near-vertical dark line tilted ±5° on a light page: one tilt
    # direction lands in the <45° branch (θ≈5), the other in the >135°
    # branch (θ≈175) — both must deskew back to vertical (θ≈0)
    for sign, expect in ((+1, 175.0), (-1, 5.0)):
        img = np.full((120, 120), 230, dtype=np.uint8)
        theta = np.deg2rad(5.0)
        for y in range(120):
            x = int(60 + sign * np.tan(theta) * (y - 60))
            img[y, max(0, x - 1) : x + 2] = 10
        detected = _hough_strongest_line(img < 100)
        assert detected is not None and abs(detected - expect) <= 1.5
        fixed = deskew(img)
        re_detected = _hough_strongest_line(fixed < 100)
        assert re_detected is not None
        assert min(abs(re_detected), abs(re_detected - 180.0)) <= 1.5
    # horizontal text baseline (theta 90°, inside [45,135]) → untouched
    flat = np.full((60, 60), 230, dtype=np.uint8)
    flat[30, :] = 10
    assert deskew(flat) is flat


def test_rotate_identity():
    img = RNG.randint(0, 255, (16, 16)).astype(np.uint8)
    assert (rotate_bilinear(img, 0.0) == img).all()


def test_pipelines_shape_and_dtype():
    color = RNG.randint(0, 255, (40, 40, 3)).astype(np.uint8)
    for pipe in (preprocess_pipeline, arabic_preprocess,
                 french_preprocess, region_preprocess):
        out = pipe(color)
        assert out.shape == (40, 40) and out.dtype == np.uint8
    # french/region outputs are binary (Otsu)
    assert set(np.unique(french_preprocess(color))) <= {0, 255}
    assert set(np.unique(region_preprocess(color))) <= {0, 255}


# --- E6 Arabic shaping -------------------------------------------------------


def test_reshape_contextual_forms():
    # محمد: meem-initial, hah-medial, meem-medial, dal-final
    assert reshape("محمد") == "ﻣﺤﻤﺪ"
    # شهادة: sheen-initial, heh-medial, alef-final, dal-isolated,
    # teh-marbuta-isolated (alef and dal never join forward)
    assert reshape("شهادة") == "ﺷﻬﺎﺩﺓ"


def test_reshape_lam_alef_ligature():
    assert reshape("لا") == "ﻻ"           # isolated
    assert reshape("بلا") == "ﺑﻼ"    # final after joiner


def test_reshape_deletes_harakat():
    assert reshape("مُحَمَّد") == reshape("محمد")


def test_display_reverses_rtl_keeps_ltr():
    assert get_display(reshape("محمد")) == "ﺪﻤﺤﻣ"
    # digits stay logical inside the reversed RTL flow
    assert postprocess_arabic("رقم 123") == "123 ﻢﻗﺭ"
    # LTR-first text passes through
    assert get_display("abc def") == "abc def"


def test_postprocess_passthrough():
    assert postprocess_arabic("   ") == "   "
    assert postprocess_arabic("") == ""


def test_engine_preprocess_wiring():
    """preprocess=True feeds numpy-preprocessed images to the backend:
    whole-image P1-P4 before both passes, P6 inside the Arabic pass."""
    from ocr_intern_spark.sources.engine import TesseractRecognizer

    seen: list[tuple[str, np.ndarray]] = []

    class FakeBackend:
        def image_to_data(self, image, lang, config):
            seen.append((lang, image))
            return {"text": ["x"], "conf": [80.0], "left": [0], "top": [0],
                    "width": [5], "height": [5]}

        def get_languages(self):
            return ["ara", "fra"]

        def resize(self, image, fx, fy):
            return image

    img = RNG.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    rec = TesseractRecognizer(
        lambda ref: img, backend_factory=FakeBackend, preprocess=True
    )
    tokens = rec("img://t")
    assert len(tokens) == 2  # one per pass
    (ar_lang, ar_img), (fr_lang, fr_img) = seen
    assert ar_lang == "ara" and fr_lang == "fra"
    # both saw 2-D grayscale outputs of the numpy chain
    assert ar_img.ndim == 2 and fr_img.ndim == 2
    # the Arabic pass additionally applied P6 (binarize→denoise→equalize)
    assert not np.array_equal(ar_img, fr_img)
