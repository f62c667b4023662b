"""Real-engine adapter orchestration (sources/engine.py) — E1 PSM
heuristic, E3 parse, E5 Arabic retry (incl. resize-failure fallback),
E7 French pass, E10 language validation, F5 ordering — driven by a
fake backend so every branch is pinned without native tesseract."""

import numpy as np
import pytest

from ocr_intern_spark.sources.engine import (
    FRENCH_CONFIG,
    TesseractRecognizer,
    arabic_config,
    parse_data_dict,
    psm_for_image,
)


def _data(texts, confs, lang_offset=0):
    n = len(texts)
    return {
        "text": texts,
        "conf": confs,
        "left": [10 * i + lang_offset for i in range(n)],
        "top": [0] * n,
        "width": [80] * n,
        "height": [14] * n,
    }


class FakeBackend:
    def __init__(self, responses, langs=("ara", "fra"), resize_raises=False):
        # responses: list of data dicts returned per image_to_data call
        self.responses = list(responses)
        self.calls = []  # (lang, config, image_tag)
        self.langs = list(langs)
        self.resize_raises = resize_raises

    def image_to_data(self, image, lang, config):
        self.calls.append((lang, config, getattr(image, "tag", "orig")))
        return self.responses.pop(0)

    def get_languages(self):
        return self.langs

    def resize(self, image, fx, fy):
        if self.resize_raises:
            raise ValueError("resize failed")

        class Img:
            tag = f"scaled{fx}"

        return Img()


def _rec(backend):
    return TesseractRecognizer(
        load_image=lambda ref: object(), backend_factory=lambda: backend
    )


def test_psm_heuristic_aspect_branches():
    assert psm_for_image(np.zeros((100, 150)).shape) == 1   # >1.4
    assert psm_for_image(np.zeros((150, 100)).shape) == 3   # <0.8
    assert psm_for_image(np.zeros((100, 100)).shape) == 6   # else
    assert psm_for_image((100, 141)) == 1
    assert psm_for_image((100, 140)) == 6  # exactly 1.4 is NOT >1.4


def test_parse_filters_conf_and_empty():
    toks = parse_data_dict(
        _data(["bonjour", "  ", "ville", ""], [90.0, 80.0, -1.0, 50.0]), "fra"
    )
    assert [(t.text, t.conf) for t in toks] == [("bonjour", 90.0)]


def test_arabic_single_pass_when_tokens_found():
    be = FakeBackend([_data(["شهادة"], [70.0]), _data(["ville"], [60.0])])
    toks = _rec(be)("img://x")
    assert [t.lang for t in toks] == ["ara", "fra"]  # F5: arabic first
    assert be.calls[0][0:2] == ("ara", arabic_config(6))
    assert be.calls[1][0:2] == ("fra", FRENCH_CONFIG)
    assert len(be.calls) == 2  # no retry


def test_arabic_retry_upscales_and_uses_psm7():
    be = FakeBackend(
        [_data([""], [-1.0]),          # pass 1: parses empty → retry
         _data(["وصل"], [55.0]),       # pass 2 on scaled image
         _data([], [])]                # french
    )
    toks = _rec(be)("img://x")
    assert [t.text for t in toks] == ["وصل"]
    assert be.calls[1][1] == arabic_config(7)
    assert be.calls[1][2] == "scaled1.3"


def test_arabic_retry_falls_back_to_original_on_resize_failure():
    be = FakeBackend(
        [_data([], []), _data(["رقم"], [45.0]), _data([], [])],
        resize_raises=True,
    )
    toks = _rec(be)("img://x")
    assert [t.text for t in toks] == ["رقم"]
    assert be.calls[1][2] == "orig"  # arabic.py:109-111 fallback


def test_missing_language_support_raises():
    be = FakeBackend([_data([], [])], langs=["fra"])
    with pytest.raises(RuntimeError, match="ara language support"):
        _rec(be)("img://x")


def test_arabic_config_matches_reference_string():
    assert arabic_config(6) == (
        "--psm 6 --oem 1 -c preserve_interword_spaces=1 "
        "-c tessedit_char_blacklist="
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    )
