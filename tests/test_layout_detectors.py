"""F2 image-domain layout analysis, F6 region re-projection, F7/F8
detector algorithms (functions/imageproc.py + sources/engine.py) —
pinned on synthetic canvases against the reference's rules:
hybrid.py:46-80 (dilate 15×3 ×3 → external boxes → projection std-dev
classify), hybrid.py:156-180 (crop + bbox +x/+y re-projection),
main_window.py:66-95 (adaptive-INV components, area>100,
0.2<aspect<15), test_morocco_documents.py:248-265 (Hough circles
r 50-100)."""

import numpy as np

from ocr_intern_spark.functions.imageproc import (
    analyze_layout,
    connected_component_boxes,
    detect_handwriting_regions,
    dilate_rect,
    hough_circles,
    to_grayscale,
)
from ocr_intern_spark.sources.engine import TesseractRecognizer


# --- components + dilation infrastructure -----------------------------------


def test_component_boxes_merge_diagonal_touch():
    m = np.zeros((10, 12), dtype=np.uint8)
    m[1:3, 1:4] = 1
    m[3, 4] = 1  # touches (2,3) diagonally → same component
    m[6:8, 8:11] = 1
    assert connected_component_boxes(m) == [(1, 1, 4, 3), (8, 6, 3, 2)]


def test_component_boxes_separate_when_gap():
    m = np.zeros((5, 10), dtype=np.uint8)
    m[1, 1:3] = 1
    m[3, 1:3] = 1  # one blank row between → two components
    assert len(connected_component_boxes(m)) == 2


def test_dilate_rect_matches_bruteforce_max_filter():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 17), dtype=np.uint8).astype(np.uint8)
    got = dilate_rect(img, kw=5, kh=3, iterations=1)
    pad = np.pad(img, ((1, 1), (2, 2)), mode="edge")
    want = np.zeros_like(img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            want[y, x] = pad[y : y + 3, x : x + 5].max()
    assert np.array_equal(got, want)


# --- F2 layout --------------------------------------------------------------


def _two_column_canvas():
    """Left block: vertical strokes (column sums vary → 'arabic').
    Right block: one solid horizontal bar (row sums vary → 'french').
    Separated >42 px so three 15-wide dilations can't merge them."""
    img = np.zeros((80, 260), dtype=np.uint8)
    for x in range(10, 50, 4):
        img[10:60, x] = 255
    img[30:36, 160:245] = 255
    return img


def test_analyze_layout_classifies_both_scripts():
    lay = analyze_layout(_two_column_canvas())
    assert len(lay["arabic"]) == 1
    assert len(lay["french"]) >= 1
    ax, ay, aw, ah = lay["arabic"][0]
    assert ax < 60 and aw > 30  # the left block
    assert all(x >= 100 for x, _, _, _ in lay["french"])


def test_analyze_layout_matches_stddev_rule_exactly():
    """Re-derive the classification from the rule itself: for every
    returned box, std(column sums) > std(row sums) iff 'arabic'."""
    img = _two_column_canvas()
    gray = to_grayscale(img)
    lay = analyze_layout(img)
    for label, expect in (("arabic", True), ("french", False)):
        for x, y, w, h in lay[label]:
            roi = gray[y : y + h, x : x + w].astype(np.float64)
            got = np.std(roi.sum(axis=0)) > np.std(roi.sum(axis=1))
            assert got is np.bool_(expect) or got == expect


# --- F6 re-projection -------------------------------------------------------


class _BoxBackend:
    """Fake backend emitting one fixed CROP-RELATIVE token per call —
    the bbox-emitting mode that makes the +x/+y offset math
    observable."""

    def __init__(self):
        self.crops = []

    def image_to_data(self, image, lang, config):
        self.crops.append(np.asarray(image).shape)
        return {
            "text": ["mot"],
            "conf": [80.0],
            "left": [3],
            "top": [2],
            "width": [20],
            "height": [10],
        }

    def get_languages(self):
        return ["ara", "fra"]

    def resize(self, image, fx, fy):
        return image


def test_process_regions_offsets_bboxes_to_page_coords():
    page = np.zeros((100, 200), dtype=np.uint8)
    rec = TesseractRecognizer(
        load_image=lambda ref: page, backend_factory=_BoxBackend
    )
    toks = rec.process_regions(page, [(50, 30, 60, 40), (120, 70, 30, 20)], "fra")
    # oracle page coordinates: crop-relative (3, 2) + region origin
    assert [(t.x, t.y, t.w, t.h) for t in toks] == [
        (53, 32, 20, 10),
        (123, 72, 20, 10),
    ]
    # and the engine saw the CROPPED images, not the page
    be = rec._backend
    assert be.crops == [(40, 60), (20, 30)]


def test_process_template_region_resolves_and_clamps():
    page = np.zeros((100, 200), dtype=np.uint8)
    rec = TesseractRecognizer(
        load_image=lambda ref: page, backend_factory=_BoxBackend
    )
    # rel box hangs past the right edge → abs_region clamps w
    toks = rec.process_template_region(
        page, {"x": 0.9, "y": 0.5, "w": 0.3, "h": 0.2}, "fra"
    )
    assert len(toks) == 1
    assert (toks[0].x, toks[0].y) == (180 + 3, 50 + 2)
    assert rec._backend.crops == [(20, 20)]  # clamped 20 px wide


# --- F7 handwriting ---------------------------------------------------------


def _scribble_page():
    page = np.full((80, 80), 220, dtype=np.uint8)
    rng = np.random.default_rng(0)
    page[20:50, 15:60] = np.where(
        rng.random((30, 45)) < 0.5, 30, 220
    ).astype(np.uint8)
    return page


def test_handwriting_detected_on_scribble():
    regions = detect_handwriting_regions(_scribble_page())
    assert len(regions) >= 1
    x, y, w, h = regions[0]
    assert (x, y) == (15, 20) and w >= 40 and h >= 25
    assert 0.2 < w / h < 15


def test_handwriting_rejects_blank_and_thin_line():
    assert detect_handwriting_regions(np.full((60, 60), 220, np.uint8)) == []
    # a 1-px hairline: area above 100 but aspect 200/1 > 15 → rejected
    page = np.full((40, 220), 220, dtype=np.uint8)
    page[20, 10:210] = 0
    assert detect_handwriting_regions(page) == []


# --- F8 stamps --------------------------------------------------------------


def _ring(radius: int, size: int = 200) -> np.ndarray:
    canvas = np.full((size, size), 255, dtype=np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    c = size // 2
    canvas[np.abs(np.hypot(xx - c, yy - c) - radius) < 1.5] = 0
    return canvas


def test_stamp_circle_detected_with_radius():
    circles = hough_circles(_ring(60))
    assert len(circles) == 1
    cx, cy, r = circles[0]
    assert abs(cx - 100) <= 3 and abs(cy - 100) <= 3 and abs(r - 60) <= 3


def test_stamp_ignores_out_of_band_radius_and_lines():
    assert hough_circles(_ring(20)) == []   # below minRadius=50
    lines = np.full((200, 200), 255, np.uint8)
    for y in range(20, 180, 12):
        lines[y, 10:190] = 0
    assert hough_circles(lines) == []
    assert hough_circles(np.full((200, 200), 255, np.uint8)) == []


def test_detector_pass_emits_kind_tokens():
    page = _ring(60)
    rec = TesseractRecognizer(
        load_image=lambda ref: page, backend_factory=_BoxBackend
    )
    toks = rec.detector_pass(page)
    stamps = [t for t in toks if t.kind == "stamp"]
    assert len(stamps) == 1
    t = stamps[0]
    # bounding square of the detected circle
    assert t.w == t.h and 110 <= t.w <= 130
    assert all(tok.kind in ("handwriting", "stamp") for tok in toks)
