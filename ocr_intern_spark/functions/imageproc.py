"""Pure-numpy image preprocessing (P1-P4, P6-P8) — the reference's
OpenCV transform chains re-implemented without cv2 so the production
engine adapter runs in any environment.

Fidelity contract: each function implements the SAME published
algorithm as the cv2 call it replaces (grayscale fixed-point weights,
min-max normalization, Gaussian adaptive threshold, global histogram
equalization, CLAHE, Otsu, NL-means, Hough-line deskew), with the
reference's parameter defaults. cv2 is not importable in this sandbox,
so bit-exactness vs OpenCV is not certifiable here; behavior is pinned
by property tests (noise/contrast/skew effects) mirroring the
reference's own preprocessing tests
(/root/reference/tests/unit/test_ocr_comprehensive.py:91-100).

Pipelines (composition order is the reference's, cited per function):
* preprocess_pipeline  — gray → NL-means denoise → min-max normalize →
  Hough deskew (src/preprocessing/preprocess.py:6-19)
* arabic_preprocess    — gray → adaptive Gaussian threshold(11,2) →
  NL-means(h=10,7,21) → equalizeHist (src/ocr/arabic.py:35-62)
* french_preprocess    — gray → CLAHE(2.0, 8×8) → 3×3 Gaussian blur →
  Otsu binary (src/ocr/french.py:28-49)
* region_preprocess    — gray → CLAHE(2.0, 8×8) → NL-means → Otsu
  (src/ocr/template.py:206-224)

Scale note: these run inside the Arrow OCR stage, per media ref, on
the executor — pure per-element numpy, no driver involvement, no
Spark-plan impact. Cost is bounded per image and embarrassingly
parallel, exactly like the recognizer call they precede.
"""

from __future__ import annotations

import numpy as np

# --- P1 grayscale -----------------------------------------------------------


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """BGR → gray with OpenCV's fixed-point BT.601 weights
    (preprocess.py:21-25). No-op for 2-D input."""
    if img.ndim == 2:
        return img
    b = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    r = img[..., 2].astype(np.int64)
    # cv2's integer pipeline: (B*1868 + G*9617 + R*4899 + 8192) >> 14
    return ((b * 1868 + g * 9617 + r * 4899 + 8192) >> 14).astype(np.uint8)


# --- P3 contrast normalize --------------------------------------------------


def normalize_minmax(img: np.ndarray) -> np.ndarray:
    """cv2.normalize(..., 0, 255, NORM_MINMAX) (preprocess.py:31-33):
    affine-stretch to [0,255]; constant images map to 0 (OpenCV's
    scale-0 branch)."""
    lo = int(img.min())
    hi = int(img.max())
    if hi == lo:
        return np.zeros_like(img, dtype=np.uint8)
    scaled = (img.astype(np.float64) - lo) * (255.0 / (hi - lo))
    return np.clip(np.rint(scaled), 0, 255).astype(np.uint8)


# --- separable convolution helpers -----------------------------------------


def _gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel: sigma<=0 → 0.3*((ksize-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _pad(img: np.ndarray, ry: int, rx: int, border: str) -> np.ndarray:
    mode = "edge" if border == "replicate" else "reflect"
    # numpy 'reflect' == OpenCV BORDER_REFLECT_101 (no edge duplication)
    return np.pad(img, ((ry, ry), (rx, rx)), mode=mode)


def _sep_conv(img: np.ndarray, k: np.ndarray, border: str) -> np.ndarray:
    """Separable 2-D convolution with a symmetric 1-D kernel, float64."""
    r = len(k) // 2
    p = _pad(img.astype(np.float64), r, r, border)
    # horizontal taps
    h = np.zeros((p.shape[0], img.shape[1]), dtype=np.float64)
    for i, w in enumerate(k):
        h += w * p[:, i : i + img.shape[1]]
    out = np.zeros_like(img, dtype=np.float64)
    for i, w in enumerate(k):
        out += w * h[i : i + img.shape[0], :]
    return out


def gaussian_blur(img: np.ndarray, ksize: int = 3, sigma: float = 0.0) -> np.ndarray:
    """cv2.GaussianBlur with BORDER_REFLECT_101 (french.py:43-44)."""
    k = _gaussian_kernel(ksize, sigma)
    return np.clip(np.rint(_sep_conv(img, k, "reflect101")), 0, 255).astype(np.uint8)


# --- P6 piece: adaptive Gaussian threshold ----------------------------------


def adaptive_threshold_gaussian(
    img: np.ndarray,
    block: int = 11,
    c: float = 2.0,
    maxval: int = 255,
    invert: bool = False,
) -> np.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY,
    block, C) (arabic.py:43-51): pixel > (gaussian-window mean − C) →
    maxval else 0, replicate border, mean rounded to uint8 like
    OpenCV's intermediate blur. ``invert=True`` is THRESH_BINARY_INV
    (main_window.py:74-77, the F7 handwriting-detect input): dark ink
    on light paper becomes the foreground."""
    k = _gaussian_kernel(block)
    mean = np.clip(np.rint(_sep_conv(img, k, "replicate")), 0, 255)
    above = img.astype(np.int64) > mean.astype(np.int64) - int(round(c))
    if invert:
        above = ~above
    return np.where(above, np.uint8(maxval), np.uint8(0))


# --- P6 piece: global histogram equalization --------------------------------


def equalize_hist(img: np.ndarray) -> np.ndarray:
    """cv2.equalizeHist (arabic.py:57-60): CDF LUT with the first
    nonzero bin anchored to 0."""
    hist = np.bincount(img.ravel(), minlength=256)
    cdf = hist.cumsum()
    nz = cdf[cdf > 0]
    if len(nz) == 0 or nz[0] == cdf[-1]:
        return img.copy()
    cdf_min = nz[0]
    lut = np.rint((cdf - cdf_min) * 255.0 / (cdf[-1] - cdf_min))
    return np.clip(lut, 0, 255).astype(np.uint8)[img]


# --- P7/P8 piece: CLAHE ------------------------------------------------------


def clahe(
    img: np.ndarray, clip_limit: float = 2.0, grid: tuple[int, int] = (8, 8)
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization
    (french.py:39-41, template.py:214-216): per-tile clipped
    histograms → CDF LUTs → bilinear interpolation between the four
    surrounding tile LUTs (the standard Zuiderveld/OpenCV algorithm)."""
    h, w = img.shape
    gy, gx = grid
    # tile sizes (ceil division, like OpenCV's resize-to-multiple)
    th, tw = -(-h // gy), -(-w // gx)
    padded = np.pad(img, ((0, th * gy - h), (0, tw * gx - w)), mode="reflect")
    luts = np.empty((gy, gx, 256), dtype=np.float64)
    clip = max(1.0, clip_limit * th * tw / 256.0)
    for ty in range(gy):
        for tx in range(gx):
            tile = padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess / 256.0
            cdf = hist.cumsum()
            luts[ty, tx] = cdf * (255.0 / cdf[-1])
    # bilinear interpolation of LUT outputs at every pixel
    yy, xx = np.mgrid[0:h, 0:w]
    fy = (yy + 0.5) / th - 0.5
    fx = (xx + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, gy - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gx - 1)
    y1 = np.clip(y0 + 1, 0, gy - 1)
    x1 = np.clip(x0 + 1, 0, gx - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)
    wx = np.clip(fx - x0, 0.0, 1.0)
    v = img
    p00 = luts[y0, x0, v]
    p01 = luts[y0, x1, v]
    p10 = luts[y1, x0, v]
    p11 = luts[y1, x1, v]
    out = (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --- P7/P8 piece: Otsu -------------------------------------------------------


def otsu_threshold(img: np.ndarray, maxval: int = 255) -> tuple[float, np.ndarray]:
    """cv2.threshold(..., THRESH_BINARY+THRESH_OTSU) (french.py:47-48):
    threshold maximizing between-class variance; out = maxval where
    pixel > t."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    omega = hist.cumsum() / total
    mu = (hist * np.arange(256)).cumsum() / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    t = int(np.argmax(sigma_b))
    return float(t), np.where(img > t, np.uint8(maxval), np.uint8(0))


# --- P2 denoise --------------------------------------------------------------


def nl_means_denoise(
    img: np.ndarray,
    h: float = 3.0,
    template_window: int = 7,
    search_window: int = 21,
) -> np.ndarray:
    """Non-local means (Buades et al.), the algorithm behind
    cv2.fastNlMeansDenoising (preprocess.py:27-29; arabic.py:53-55
    with h=10,7,21): for each search offset, patch distance = box mean
    of squared differences over the template window; weight =
    exp(-dist/h²); output = weight-normalized average. Implemented as
    one vectorized pass per offset (search² passes total)."""
    f = img.astype(np.float64)
    r = search_window // 2
    tk = np.full(template_window, 1.0 / template_window)
    acc = np.zeros_like(f)
    wsum = np.zeros_like(f)
    p = _pad(f, r, r, "reflect101")
    hh = h * h
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = p[r + dy : r + dy + f.shape[0], r + dx : r + dx + f.shape[1]]
            d2 = _sep_conv((f - shifted) ** 2, tk, "reflect101")
            wgt = np.exp(-d2 / hh)
            acc += wgt * shifted
            wsum += wgt
    return np.clip(np.rint(acc / wsum), 0, 255).astype(np.uint8)


# --- P4 deskew ---------------------------------------------------------------


def _hough_strongest_line(edges: np.ndarray, votes_needed: int = 100) -> float | None:
    """Strongest Hough line's theta in degrees (1° / 1 px bins, like
    cv2.HoughLines(_, 1, pi/180, 100)), or None below the vote
    threshold. The reference consumes ONLY lines[0] — the single
    top-voted line (preprocess.py:41-47)."""
    ys, xs = np.nonzero(edges)
    if len(ys) == 0:
        return None
    thetas = np.deg2rad(np.arange(180))
    rho_max = int(np.hypot(*edges.shape)) + 1
    # vectorized vote: rho index per (point, theta)
    rho = np.rint(
        xs[:, None] * np.cos(thetas)[None, :] + ys[:, None] * np.sin(thetas)[None, :]
    ).astype(np.int64) + rho_max
    acc = np.zeros((2 * rho_max + 1, 180), dtype=np.int64)
    np.add.at(acc, (rho.ravel(), np.tile(np.arange(180), len(ys))), 1)
    best = np.unravel_index(np.argmax(acc), acc.shape)
    if acc[best] < votes_needed:
        return None
    return float(best[1])


def _edges(gray: np.ndarray, thresh: float = 80.0) -> np.ndarray:
    """Gradient-magnitude edge map (Sobel), the numpy stand-in for
    cv2.Canny(50,150) in the deskew chain — both feed the Hough vote
    with the strong edges of text baselines/rules."""
    gx = np.zeros_like(gray, dtype=np.float64)
    gy = np.zeros_like(gray, dtype=np.float64)
    f = gray.astype(np.float64)
    gx[:, 1:-1] = f[:, 2:] - f[:, :-2]
    gy[1:-1, :] = f[2:, :] - f[:-2, :]
    return np.hypot(gx, gy) > thresh


def rotate_bilinear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the integer center with replicate border
    (cv2.warpAffine(..., BORDER_REPLICATE); INTER_CUBIC in the
    reference, bilinear here — the sub-pixel kernel differs, the
    geometry does not)."""
    h, w = img.shape
    cy, cx = h // 2, w // 2
    a = np.deg2rad(angle_deg)
    cos_a, sin_a = np.cos(a), np.sin(a)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # inverse map (destination → source), matching warpAffine semantics
    sx = cos_a * (xx - cx) - sin_a * (yy - cy) + cx
    sy = sin_a * (xx - cx) + cos_a * (yy - cy) + cy
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = sx - x0
    fy = sy - y0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    f = img.astype(np.float64)
    out = (
        f[y0c, x0c] * (1 - fy) * (1 - fx)
        + f[y0c, x1c] * (1 - fy) * fx
        + f[y1c, x0c] * fy * (1 - fx)
        + f[y1c, x1c] * fy * fx
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def deskew(img: np.ndarray) -> np.ndarray:
    """P4 (preprocess.py:35-67): detect the strongest line; if its
    angle is <45° rotate by it, if >135° rotate by (angle−180°),
    otherwise (or with no qualifying line) return the input."""
    theta = _hough_strongest_line(_edges(img))
    if theta is None:
        return img
    if theta < 45.0:
        angle = theta
    elif theta > 135.0:
        angle = theta - 180.0
    else:
        return img
    return rotate_bilinear(img, angle)


# --- F2/F7/F8: layout analysis + region detectors ---------------------------


def dilate_rect(
    img: np.ndarray, kw: int = 15, kh: int = 3, iterations: int = 3
) -> np.ndarray:
    """cv2.dilate with a kw×kh MORPH_RECT structuring element
    (hybrid.py:59-60: getStructuringElement(MORPH_RECT, (15, 3)),
    iterations=3): grayscale dilation = running max over the kernel
    window, separable into a width pass then a height pass per
    iteration. Joins characters into word/line blobs horizontally
    (the wide kernel) with mild vertical growth."""
    out = img
    for _ in range(iterations):
        p = np.pad(out, ((0, 0), (kw // 2, kw // 2)), mode="edge")
        out = p[:, : img.shape[1]].copy()
        for i in range(1, kw):
            np.maximum(out, p[:, i : i + img.shape[1]], out=out)
        p = np.pad(out, ((kh // 2, kh // 2), (0, 0)), mode="edge")
        out2 = p[: img.shape[0], :].copy()
        for i in range(1, kh):
            np.maximum(out2, p[i : i + img.shape[0], :], out=out2)
        out = out2
    return out


def connected_component_boxes(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Bounding boxes (x, y, w, h) of the 8-connected components of a
    nonzero mask — the numpy equivalent of cv2.findContours(RETR_
    EXTERNAL) + boundingRect per contour for filled blobs. Two-pass
    run-based union-find: rows are decomposed into foreground runs
    (vectorized), runs are unioned with 8-overlapping runs of the
    previous row — O(runs), no per-pixel Python loop. Boxes are
    returned sorted by (y, x) for determinism (cv2's contour order is
    retrieval-internal; no consumer depends on it)."""
    fg = mask != 0
    h, w = fg.shape
    parent: list[int] = []

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    boxes: dict[int, list[int]] = {}  # run-root -> [x0, y0, x1, y1]
    prev_runs: list[tuple[int, int, int]] = []  # (start, end, run_id)
    for y in range(h):
        row = fg[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if row[0]:
            starts = np.concatenate(([0], starts))
        if row[-1]:
            ends = np.concatenate((ends, [w]))
        cur_runs: list[tuple[int, int, int]] = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            rid = len(parent)
            parent.append(rid)
            boxes[rid] = [s, y, e - 1, y]
            # 8-connectivity: current run [s, e-1] touches a previous-
            # row run [ps, pe] iff the spans overlap when one is
            # widened by 1 column (diagonal adjacency)
            for ps, pe, pid in prev_runs:
                if s <= pe + 1 and ps <= e:  # e == (e-1) + 1
                    union(rid, pid)
            cur_runs.append((s, e - 1, rid))
        prev_runs = cur_runs
    merged: dict[int, list[int]] = {}
    for rid, (x0, y0, x1, y1) in boxes.items():
        root = find(rid)
        m = merged.setdefault(root, [x0, y0, x1, y1])
        m[0] = min(m[0], x0)
        m[1] = min(m[1], y0)
        m[2] = max(m[2], x1)
        m[3] = max(m[3], y1)
    out = [
        (x0, y0, x1 - x0 + 1, y1 - y0 + 1)
        for x0, y0, x1, y1 in merged.values()
    ]
    return sorted(out, key=lambda b: (b[1], b[0]))


def analyze_layout(
    image: np.ndarray,
) -> dict[str, list[tuple[int, int, int, int]]]:
    """F2 image-domain layout analysis (hybrid.py:46-80): gray →
    dilate(15×3 rect, 3 iterations) → external text-block boxes →
    per-box projection heuristic: Arabic script's vertical strokes
    make the per-COLUMN intensity sums vary more than the per-ROW
    sums, so std(vertical_projection) > std(horizontal_projection)
    classifies the block 'arabic', else 'french'. Returns
    {'arabic': [(x, y, w, h), ...], 'french': [...]} in page
    coordinates, ready for _process_regions (F6)."""
    gray = to_grayscale(image)
    dilated = dilate_rect(gray, 15, 3, iterations=3)
    regions: dict[str, list[tuple[int, int, int, int]]] = {
        "arabic": [], "french": [],
    }
    for x, y, w, h in connected_component_boxes(dilated):
        roi = gray[y : y + h, x : x + w].astype(np.float64)
        vertical = roi.sum(axis=0)
        horizontal = roi.sum(axis=1)
        if np.std(vertical) > np.std(horizontal):
            regions["arabic"].append((x, y, w, h))
        else:
            regions["french"].append((x, y, w, h))
    return regions


def detect_handwriting_regions(
    image: np.ndarray,
) -> list[tuple[int, int, int, int]]:
    """F7 handwriting detection (main_window.py:66-95): gray →
    adaptive Gaussian threshold INV(11, 2) → external components →
    keep area > 100 with bbox aspect 0.2 < w/h < 15. Area is the
    component's PIXEL count (cv2.contourArea measures the contour
    polygon, which for filled blobs differs by a sub-perimeter term;
    the reference's threshold is a coarse noise floor, not a tight
    bound, so pixel count preserves the semantics)."""
    gray = to_grayscale(image)
    binary = adaptive_threshold_gaussian(gray, 11, 2.0, invert=True)
    fg = binary != 0
    out = []
    for x, y, w, h in connected_component_boxes(binary):
        area = int(fg[y : y + h, x : x + w].sum())
        if area > 100 and 0.2 < w / h < 15:
            out.append((x, y, w, h))
    return out


def hough_circles(
    gray: np.ndarray,
    min_dist: int = 100,
    param1: float = 50.0,
    param2: int = 30,
    min_radius: int = 50,
    max_radius: int = 100,
) -> list[tuple[int, int, int]]:
    """F8 stamp detection via the HOUGH_GRADIENT method behind
    cv2.HoughCircles(dp=1, minDist=100, param1=50, param2=30,
    minRadius=50, maxRadius=100) (test_morocco_documents.py:248-265):
    edge pixels (gradient magnitude > param1) vote for centers along
    their gradient direction at every candidate radius (both ways —
    dark-on-light and light-on-dark); accumulator peaks with >= param2
    votes, non-max suppressed to min_dist apart, become circles. The
    radius reported per center is the most-voted distance from its
    supporting edge pixels. Returns [(cx, cy, r), ...] strongest
    first."""
    f = gray.astype(np.float64)
    gx = np.zeros_like(f)
    gy = np.zeros_like(f)
    gx[:, 1:-1] = (f[:, 2:] - f[:, :-2]) / 2.0
    gy[1:-1, :] = (f[2:, :] - f[:-2, :]) / 2.0
    mag = np.hypot(gx, gy)
    ys, xs = np.nonzero(mag > param1)
    if len(ys) == 0:
        return []
    ux = gx[ys, xs] / mag[ys, xs]
    uy = gy[ys, xs] / mag[ys, xs]
    h, w = gray.shape
    # 3-D accumulator binned 4×4 px in center space and 4 px in radius:
    # a real circle's votes (ring-width + direction-quantization jitter
    # of ±2 px) collapse into ONE (cy, cx, r) cell, while a straight
    # edge of length L contributes only ~bin votes to any single cell
    # — the binning is what separates circles from text/rule lines
    # without a second gradient pass.
    dp = 4
    n_rb = (max_radius - min_radius) // dp + 1
    acc = np.zeros((n_rb, h // dp + 1, w // dp + 1), dtype=np.int32)
    for r in range(min_radius, max_radius + 1, 2):
        rb = (r - min_radius) // dp
        for sign in (1.0, -1.0):
            cx = np.rint(xs + sign * r * ux).astype(np.int64)
            cy = np.rint(ys + sign * r * uy).astype(np.int64)
            ok = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            np.add.at(acc, (rb, cy[ok] // dp, cx[ok] // dp), 1)
    circles: list[tuple[int, int, int]] = []
    flat = acc.ravel()
    order = np.argsort(flat, kind="stable")[::-1]
    for idx in order:
        votes = flat[idx]
        if votes < param2:
            break
        rb, rem = divmod(int(idx), acc.shape[1] * acc.shape[2])
        by, bx = divmod(rem, acc.shape[2])
        cx0, cy0 = bx * dp + dp // 2, by * dp + dp // 2
        if any(
            (cx0 - a) ** 2 + (cy0 - b) ** 2 < min_dist**2 for a, b, _ in circles
        ):
            continue
        # refine: center = centroid of supporting edge pixels' implied
        # centers isn't tracked, so snap to the strongest 1-px cell by
        # the radius mode of distances in the winning band
        d = np.hypot(xs - cx0, ys - cy0)
        lo = min_radius + rb * dp
        in_band = (d >= lo - 2) & (d <= lo + dp + 2)
        if not in_band.any():
            continue
        r = int(np.rint(d[in_band].mean()))
        circles.append((cx0, cy0, r))
        if len(circles) >= 8:
            break
    return circles


def detect_stamp_circles(image: np.ndarray) -> list[tuple[int, int, int]]:
    """F8: stamps are the circles a HoughCircles(minR=50, maxR=100)
    pass finds on the grayscale page (the reference's stamp-detection
    recipe)."""
    return hough_circles(to_grayscale(image))


# --- pipelines ---------------------------------------------------------------


def preprocess_pipeline(img: np.ndarray) -> np.ndarray:
    """P5 composition (preprocess.py:6-19): gray → denoise →
    normalize → deskew."""
    g = to_grayscale(img)
    g = nl_means_denoise(g)
    g = normalize_minmax(g)
    return deskew(g)


def arabic_preprocess(img: np.ndarray) -> np.ndarray:
    """P6 (arabic.py:35-62): gray → adaptive Gaussian threshold(11,2)
    → NL-means(h=10, 7, 21) → equalizeHist."""
    g = to_grayscale(img)
    g = adaptive_threshold_gaussian(g, block=11, c=2.0)
    g = nl_means_denoise(g, h=10.0, template_window=7, search_window=21)
    return equalize_hist(g)


def french_preprocess(img: np.ndarray) -> np.ndarray:
    """P7 (french.py:28-49): gray → CLAHE(2.0, 8×8) → 3×3 Gaussian →
    Otsu binary."""
    g = to_grayscale(img)
    g = clahe(g, 2.0, (8, 8))
    g = gaussian_blur(g, 3)
    return otsu_threshold(g)[1]


def region_preprocess(img: np.ndarray) -> np.ndarray:
    """P8 (template.py:206-224): gray → CLAHE(2.0, 8×8) → NL-means →
    Otsu binary."""
    g = to_grayscale(img)
    g = clahe(g, 2.0, (8, 8))
    g = nl_means_denoise(g)
    return otsu_threshold(g)[1]
