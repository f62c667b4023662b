"""Property tests for XY-cut (operators/layout.py) and the portable
FNV-1a hash (operators/dedup.py) under randomized inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_intern_spark.operators.layout import xycut_order
from tests.test_fnv_portable import fnv1a64_py

boxes_strategy = st.lists(
    st.tuples(
        st.integers(0, 1200),   # x
        st.integers(0, 1600),   # y
        st.integers(10, 120),   # w
        st.integers(8, 30),     # h
        st.booleans(),          # is_ar
    ),
    min_size=1,
    max_size=60,
)


def _run(boxes):
    a = np.array([b[:4] for b in boxes], dtype=float).reshape(len(boxes), 4)
    ar = np.array([b[4] for b in boxes], dtype=bool)
    return xycut_order(a[:, 0], a[:, 1], a[:, 2], a[:, 3], ar)


@settings(max_examples=200, deadline=None)
@given(boxes_strategy)
def test_xycut_is_a_permutation(boxes):
    order = _run(boxes)
    assert sorted(order) == list(range(len(boxes)))


@settings(max_examples=100, deadline=None)
@given(boxes_strategy, st.integers(-500, 500), st.integers(-500, 500))
def test_xycut_translation_invariant(boxes, dx, dy):
    """Shifting the whole page must not change the reading order —
    cuts and baselines are relative geometry."""
    shifted = [(x + dx, y + dy, w, h, a) for x, y, w, h, a in boxes]
    assert _run(boxes) == _run(shifted)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 5),   # lines
    st.integers(1, 6),   # tokens per line
)
def test_xycut_single_column_grid_equals_line_sort(lines, per_line):
    """On a clean single-column LTR grid (no column gaps, no RTL),
    XY-cut must reduce to the reference's (line, x) reading order."""
    boxes = [
        (p * 90, ln * 24, 80, 14, False)
        for ln in range(lines)
        for p in range(per_line)
    ]
    assert _run(boxes) == list(range(len(boxes)))


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=80))
def test_fnv_spark_expression_semantics_match_python(s):
    """The wraparound-multiply decomposition used in the SQL
    expressions, evaluated step-by-step in plain ints, must equal the
    direct mod-2^64 FNV-1a (the basis for both engines' folds)."""
    M32, B32, HALF = 4294967295, 4294967296, 2147483648
    h = -3750763034362895579
    for ch in s:
        xor = (h ^ ord(ch)) & 0xFFFFFFFFFFFFFFFF
        xor = xor - (1 << 64) if xor >= (1 << 63) else xor
        lo, hi = xor & M32, (xor >> 32) & M32
        a = lo * 435
        mid = (lo * 256 + hi * 435 + ((a >> 32) & M32)) & M32
        mid_s = mid - B32 if mid >= HALF else mid
        h = mid_s * B32 + (a & M32)
    assert h == fnv1a64_py(s)
