"""Checkpoint/resume idempotency (SURVEY.md §4 item 3, B3 semantics)."""

import pytest

from ocr_intern_spark.operators.extract import extract
from ocr_intern_spark.sources.corpus import corpus_to_spark, stub_ocr_tokens
from ocr_intern_spark.sources.storage import ExtractionStore


@pytest.fixture()
def store(tmp_path):
    return ExtractionStore(str(tmp_path / "warehouse"))


def _extract_fn(docs):
    return extract(docs, stub_ocr_tokens)


def test_resume_is_idempotent(spark, store):
    docs = corpus_to_spark(spark, 30, seed=42)

    first = store.run_resumable(docs.limit(10), _extract_fn, run_id="r1")
    assert first["docs_written"] == 10

    # re-run over the FULL input: only the 20 new docs are processed
    second = store.run_resumable(docs, _extract_fn, run_id="r2")
    assert second["docs_written"] == 20

    # lineage is PER RUN: r2's metrics cover its 20 docs, not the
    # cumulative table
    m2 = store.metrics(spark).where("run_id = 'r2'").collect()
    assert sum(r["docs"] for r in m2) == 20

    # third run: nothing left
    third = store.run_resumable(docs, _extract_fn)
    assert third["docs_written"] == 0

    # no duplicates, full coverage
    back = spark.read.parquet(store.extracted_path)
    assert back.count() == 30
    assert back.select("doc_id").distinct().count() == 30


def test_metrics_rows_written(spark, store):
    docs = corpus_to_spark(spark, 12, seed=42)
    res = store.run_resumable(docs, _extract_fn, run_id="run-a")
    m = store.metrics(spark).where("run_id = 'run-a'").collect()
    assert len(m) >= 1
    assert sum(r["docs"] for r in m) == 12
    assert all(r["wall_ms"] > 0 for r in m)
    total_spans = sum(r["spans_out"] for r in m)
    assert total_spans > 0
    assert res["docs_written"] == 12


def test_staging_dir_cleaned_up(spark, tmp_path):
    """Stage-then-commit leaves no _staging_* directories behind."""
    import os

    from ocr_intern_spark.operators.extract import extract
    from ocr_intern_spark.sources.corpus import corpus_to_spark, stub_ocr_tokens
    from ocr_intern_spark.sources.storage import ExtractionStore

    store = ExtractionStore(str(tmp_path / "wh"))
    docs = corpus_to_spark(spark, 6, seed=5)
    res = store.run_resumable(docs, lambda d: extract(d, stub_ocr_tokens))
    assert res["docs_written"] == 6
    leftovers = [p for p in os.listdir(store.root) if p.startswith("_staging_")]
    assert leftovers == []
