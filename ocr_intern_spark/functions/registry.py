"""Plug-in registry — the Spark-side analogue of the reference's
engine extension point.

The reference's only extensibility surface is the ``BaseOCREngine``
ABC (/root/reference/src/ocr/base.py:44-73): subclasses override
``preprocess_image`` / ``postprocess_text`` and are handed to the
pipeline in an ``engines`` dict keyed by language
(/root/reference/scripts/test_extractor_assoc.py:33-72). SURVEY.md
§2.10 maps that to "a pluggable span-classifier UDF registry".

Two plug points, both resolved BY NAME on the driver so a job config
(plain strings, spark-submit friendly) can select implementations
without code changes:

* **recognizers** — ``media_ref -> Iterable[Token]`` callables used by
  the mapInPandas OCR stage (``operators/extract.py::Recognizer``).
  Swapping the deterministic stub for a real Tesseract/vision-model
  client is a one-line registration; the Arrow plumbing, fusion and
  reading-order semantics are engine-independent.
* **span classifiers** — named ``Column -> Column`` expression
  builders applied to span text (e.g. language guess, quality gates).
  These stay native Catalyst expressions: registering a classifier
  does NOT drop the plan out of WholeStageCodegen.

Registration is driver-side; the chosen recognizer callable is
serialized into the mapInPandas closure exactly like the built-in
stub, so executors never consult the registry (no global mutable
state on the worker side).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

from pyspark.sql import Column

from ocr_intern_spark.operators.extract import Recognizer

_RECOGNIZERS: Dict[str, Recognizer] = {}
_SPAN_CLASSIFIERS: Dict[str, Callable[[Column], Column]] = {}


def register_recognizer(name: str, fn: Recognizer, *, replace: bool = False) -> None:
    if not replace and name in _RECOGNIZERS:
        raise ValueError(f"recognizer {name!r} already registered")
    _RECOGNIZERS[name] = fn


def get_recognizer(name: str) -> Recognizer:
    try:
        return _RECOGNIZERS[name]
    except KeyError:
        known = ", ".join(sorted(_RECOGNIZERS)) or "<none>"
        raise KeyError(f"unknown recognizer {name!r} (registered: {known})")


def list_recognizers() -> list[str]:
    return sorted(_RECOGNIZERS)


def register_span_classifier(
    name: str, fn: Callable[[Column], Column], *, replace: bool = False
) -> None:
    if not replace and name in _SPAN_CLASSIFIERS:
        raise ValueError(f"span classifier {name!r} already registered")
    _SPAN_CLASSIFIERS[name] = fn


def get_span_classifier(name: str) -> Callable[[Column], Column]:
    try:
        return _SPAN_CLASSIFIERS[name]
    except KeyError:
        known = ", ".join(sorted(_SPAN_CLASSIFIERS)) or "<none>"
        raise KeyError(f"unknown span classifier {name!r} (registered: {known})")


def list_span_classifiers() -> list[str]:
    return sorted(_SPAN_CLASSIFIERS)


def _register_builtins() -> None:
    from ocr_intern_spark.functions.normalizers import (
        classify_doc_type,
        fix_french_ocr,
        guess_lang,
    )
    from ocr_intern_spark.functions.text import quality_score, token_count
    from ocr_intern_spark.sources.corpus import (
        costed_stub_ocr_tokens,
        stub_ocr_tokens,
    )

    register_recognizer("stub", stub_ocr_tokens, replace=True)
    register_recognizer("stub_costed", costed_stub_ocr_tokens, replace=True)

    register_span_classifier("lang", guess_lang, replace=True)
    register_span_classifier("doc_type", classify_doc_type, replace=True)
    register_span_classifier("french_fixes", fix_french_ocr, replace=True)
    register_span_classifier("quality", quality_score, replace=True)
    register_span_classifier("token_count", token_count, replace=True)


_register_builtins()
