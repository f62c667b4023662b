"""A6/E9 overall document confidence: Spark `doc_confidence` must
match the pure-Python oracle mean over fusion-surviving tokens
(hybrid_ocr_gui.py:96-102), including 0.0 for docs with no media or
no surviving tokens."""

import pytest

from ocr_intern_spark.oracle.semantics import doc_confidence as oracle_conf
from ocr_intern_spark.operators.extract import doc_confidence
from ocr_intern_spark.sources.corpus import (
    corpus_to_spark,
    make_corpus,
    stub_ocr_tokens,
)

N_DOCS = 60


def test_doc_confidence_matches_oracle(spark):
    docs = make_corpus(N_DOCS, seed=42)
    expected = {
        d["doc_id"]: oracle_conf(d["spans"], stub_ocr_tokens) for d in docs
    }
    df = corpus_to_spark(spark, N_DOCS, seed=42, partitions=5)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_conf"])
        for r in doc_confidence(df, stub_ocr_tokens, ocr_partitions=5).collect()
    }
    assert set(got) == set(expected)
    for doc_id, exp in expected.items():
        assert got[doc_id][1] == pytest.approx(exp, abs=1e-9), doc_id
    # the corpus must exercise both branches
    assert any(v == 0.0 for v in expected.values())
    assert any(v > 0.0 for v in expected.values())


def test_no_media_doc_gets_zero(spark):
    from ocr_intern_spark.sources.corpus import SPANS_DDL

    docs = spark.createDataFrame(
        [("d1", [("text", "hello world", "", 0)])], schema=SPANS_DDL
    )
    rows = doc_confidence(docs, stub_ocr_tokens, ocr_partitions=2).collect()
    assert rows[0]["n_tokens"] == 0 and rows[0]["mean_conf"] == 0.0
