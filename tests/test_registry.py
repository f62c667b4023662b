"""Plug-in registry (functions/registry.py) — the analogue of the
reference's BaseOCREngine ABC extension point (base.py:44-73):
engines/classifiers resolved by name, swappable without touching the
pipeline."""

import pytest
from pyspark.sql import functions as F

from ocr_intern_spark.functions import registry
from ocr_intern_spark.operators.extract import extract
from ocr_intern_spark.oracle.semantics import Token
from ocr_intern_spark.sources.corpus import SPANS_DDL, stub_ocr_tokens


def test_builtins_registered():
    assert "stub" in registry.list_recognizers()
    assert "stub_costed" in registry.list_recognizers()
    assert registry.get_recognizer("stub") is stub_ocr_tokens
    for name in ("lang", "doc_type", "french_fixes", "quality", "token_count"):
        assert name in registry.list_span_classifiers()


def test_unknown_names_raise_with_known_list():
    with pytest.raises(KeyError, match="stub"):
        registry.get_recognizer("no-such-engine")
    with pytest.raises(KeyError, match="lang"):
        registry.get_span_classifier("no-such-classifier")


def test_duplicate_registration_rejected_unless_replace():
    with pytest.raises(ValueError):
        registry.register_recognizer("stub", stub_ocr_tokens)
    registry.register_recognizer("stub", stub_ocr_tokens, replace=True)


def test_custom_recognizer_plugs_into_pipeline(spark):
    """A recognizer registered by name drives the full extract():
    same plumbing, different engine — the ABC-swap scenario."""

    def fixed_engine(ref: str):
        return [Token("bonjour", 90.0, 0, 0, 80, 14, "fra")]

    registry.register_recognizer("fixed", fixed_engine, replace=True)
    docs = spark.createDataFrame(
        [("d1", [("media", "", "img://d1/0", 0)])], schema=SPANS_DDL
    )
    out = extract(docs, registry.get_recognizer("fixed")).collect()
    spans = out[0]["spans"]
    assert [s["text"] for s in spans] == ["bonjour"]
    assert [s["kind"] for s in spans] == ["ocr"]


def test_span_classifier_is_native_expression(spark):
    """Registered classifiers return Catalyst Columns (JVM-side) —
    applying one must not introduce a Python UDF node in the plan."""
    clf = registry.get_span_classifier("lang")
    df = spark.createDataFrame([("bonjour",), ("شهادة",)], "text string")
    got = df.select(clf(F.col("text")).alias("lang")).collect()
    assert [r["lang"] for r in got] == ["french", "arabic"]
    plan = df.select(clf(F.col("text")).alias("lang"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
