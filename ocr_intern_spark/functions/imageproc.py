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
    img: np.ndarray, block: int = 11, c: float = 2.0, maxval: int = 255
) -> np.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY,
    block, C) (arabic.py:43-51): pixel > (gaussian-window mean − C) →
    maxval else 0, replicate border, mean rounded to uint8 like
    OpenCV's intermediate blur."""
    k = _gaussian_kernel(block)
    mean = np.clip(np.rint(_sep_conv(img, k, "replicate")), 0, 255)
    return np.where(
        img.astype(np.int64) > mean.astype(np.int64) - int(round(c)),
        np.uint8(maxval), np.uint8(0),
    )


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
