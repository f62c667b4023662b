"""T1 abs-box clamp + T2 engine-config build — exact reference
semantics (template_extractor.py:108-119 and :41-66)."""

from ocr_intern_spark.operators.template_fields import (
    abs_region,
    build_engine_config,
)


def test_abs_region_basic_and_truncation():
    # int() truncates, not rounds — 0.55*100 = 55.00000000000001 → 55,
    # 0.999*100 = 99.9 → 99
    assert abs_region(200, 100, {"x": 0.5, "y": 0.25, "w": 0.2, "h": 0.1}) == (
        50, 50, 20, 20
    )
    assert abs_region(100, 100, {"x": 0.999, "y": 0.0, "w": 0.5, "h": 0.5}) == (
        99, 0, 1, 50
    )


def test_abs_region_clamps_origin_and_size():
    # origin clamped into [0, dim-1]; size clamped to remaining extent
    assert abs_region(100, 100, {"x": 1.5, "y": -0.5, "w": 0.5, "h": 0.5}) == (
        99, 0, 1, 50
    )
    # zero-sized region forced to 1px minimum
    assert abs_region(100, 100, {"x": 0.5, "y": 0.5, "w": 0.0, "h": 0.0}) == (
        50, 50, 1, 1
    )


def test_engine_config_assembly_order():
    cfg = build_engine_config(
        {"psm": 6, "oem": 3, "dpi": 300.0, "preserve_spaces": True,
         "whitelist": "0123456789/", "blacklist": "|"}
    )
    assert cfg == (
        "--psm 6 --oem 3 -c user_defined_dpi=300 "
        "-c preserve_interword_spaces=1 "
        "-c tessedit_char_whitelist=0123456789/ "
        "-c tessedit_char_blacklist=|"
    )


def test_engine_config_arabic_appends_duplicate_oem():
    # reference quirk: arabic special-case APPENDS --oem 1 after an
    # explicit --oem 3 (last occurrence wins in tesseract) — reproduce
    cfg = build_engine_config({"psm": 7, "oem": 3, "lang": "arabic"})
    assert cfg.startswith("--psm 7 --oem 3 --oem 1 ")
    assert "tessedit_char_blacklist=ABCDEFGHIJKLMNOPQRSTUVWXYZ" in cfg
    assert cfg.count("preserve_interword_spaces=1") == 1


def test_engine_config_empty():
    assert build_engine_config({}) == ""
