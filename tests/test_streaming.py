"""Streaming extraction: stream output must equal batch output."""

import pytest

from ocr_intern_spark.operators.extract import (
    explode_spans,
    extract,
    ocr_media_spans,
    transform_plain_spans,
)
from ocr_intern_spark.sources.corpus import (
    corpus_to_spark,
    stub_ocr_tokens,
    write_corpus_parquet,
)
from ocr_intern_spark.sources.storage import ExtractionStore
from ocr_intern_spark.streaming.extract_stream import (
    read_documents_stream,
    stream_extract_flat,
    stream_extract_to_store,
    windowed_event_stats,
)

N_DOCS = 24


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_corpus")
    write_corpus_parquet(str(d / "docs"), N_DOCS, seed=42, n_files=4)
    return str(d / "docs")


def test_stream_flat_equals_batch_flat(spark, corpus_dir):
    stream = read_documents_stream(spark, corpus_dir, max_files_per_trigger=1)
    q = (
        stream_extract_flat(stream, stub_ocr_tokens)
        .writeStream.format("memory")
        .queryName("flat_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = {
        tuple(r)
        for r in spark.sql(
            "select doc_id, offset, pos, seq, kind, text, media_ref from flat_out"
        ).collect()
    }
    batch_docs = spark.read.parquet(corpus_dir)
    flat = explode_spans(batch_docs)
    expected = {
        tuple(r)
        for r in transform_plain_spans(flat)
        .unionByName(ocr_media_spans(flat, stub_ocr_tokens))
        .collect()
    }
    assert got == expected


def test_stream_to_store_idempotent(spark, corpus_dir, tmp_path):
    store = ExtractionStore(str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    stream = read_documents_stream(spark, corpus_dir, max_files_per_trigger=2)
    q = stream_extract_to_store(stream, stub_ocr_tokens, store, ckpt).start()
    assert q.awaitTermination(300)

    back = spark.read.parquet(store.extracted_path)
    assert back.count() == N_DOCS
    assert back.select("doc_id").distinct().count() == N_DOCS

    # restart the stream over the same input: checkpoint + anti-join
    # → zero new docs
    q2 = stream_extract_to_store(
        read_documents_stream(spark, corpus_dir), stub_ocr_tokens, store, ckpt
    ).start()
    assert q2.awaitTermination(300)
    assert spark.read.parquet(store.extracted_path).count() == N_DOCS


def test_windowed_event_stats_batch_semantics(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, m), "a" if m % 2 else "b", float(m))
        for m in range(0, 60, 5)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = windowed_event_stats(ev, window="20 minutes").collect()
    # 3 windows × ≤2 types
    assert len(out) == 6
    w0a = [r for r in out if r["event_type"] == "a"
           and r["window_start"].minute == 0][0]
    assert w0a["n"] == 2 and w0a["sum_value"] == 5.0 + 15.0


def test_stream_dedup_exact_drops_cross_batch_dups(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate fingerprint arriving
    in a LATER micro-batch (within the watermark) is dropped; distinct
    docs all survive."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_intern_spark.streaming.extract_stream import stream_dedup_exact

    d = tmp_path / "ingest"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    batches = [
        [("d1", "alpha beta gamma", t0),
         ("d2", "unique first text", t0)],
        # d3 duplicates d1's normalized text (case/space-insensitive
        # fingerprint); d4 is new
        [("d3", "  Alpha   BETA gamma ", t0 + dt.timedelta(minutes=5)),
         ("d4", "another distinct doc", t0 + dt.timedelta(minutes=5))],
    ]
    for i, rows in enumerate(batches):
        path = str(d / f"part-{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "ingest_ts": [r[2] for r in rows],
                }
            ),
            path,
        )
        # FileStreamSource orders by modification time; same-second
        # writes tie and can process batch 1 FIRST, which would make
        # d1 the dropped duplicate instead of d3 — pin strictly
        # increasing mtimes so batch order == file index
        import os

        os.utime(path, (1700000000 + i * 60, 1700000000 + i * 60))
    stream = (
        spark.readStream.schema("doc_id string, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r["doc_id"] for r in spark.sql("select doc_id from dedup_out").collect()}
    assert "d1" in got and "d2" in got and "d4" in got
    assert "d3" not in got  # cross-batch duplicate dropped


def test_late_data_beyond_watermark_dropped(spark, tmp_path):
    """An event older than the watermark horizon arriving in a later
    micro-batch must be EXCLUDED from its (already finalized) window
    in append mode — the bounded-state contract late data is traded
    for."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def write(i, rows):
        path = str(d / f"part-{i}.parquet")
        pq.write_table(
            pa.table({"ts": [r[0] for r in rows],
                      "event_type": [r[1] for r in rows],
                      "value": [float(r[2]) for r in rows]}),
            path)
        # FileStreamSource orders by modification time; same-second
        # writes tie and can reorder the micro-batches — make mtimes
        # strictly increasing so batch order == file index
        import os
        os.utime(path, (1700000000 + i * 60, 1700000000 + i * 60))

    write(0, [(t0, "a", 1.0), (t0 + dt.timedelta(minutes=5), "a", 2.0)])
    # two batches that advance the watermark far past t0's window.
    # TWO are needed: the input-side late filter uses the watermark in
    # effect at batch START (one batch behind the eviction watermark),
    # so a row arriving in the very batch that finalizes its window
    # MAY still merge — the watermark is a lower-bound guarantee, not
    # an exact cutoff (measured: with one gap batch the late row was
    # included; with two it is reliably dropped).
    write(1, [(t0 + dt.timedelta(hours=3), "a", 4.0)])
    write(2, [(t0 + dt.timedelta(hours=6), "a", 8.0)])
    # LATE: belongs to t0's long-finalized window -> dropped
    write(3, [(t0 + dt.timedelta(minutes=6), "a", 100.0),
              (t0 + dt.timedelta(hours=9), "a", 16.0)])

    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (windowed_event_stats(stream, window="10 minutes",
                              watermark="30 minutes")
         .writeStream.format("memory").queryName("late_out")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    rows = {(r["window_start"], r["n"], r["sum_value"])
            for r in spark.sql("select * from late_out").collect()}
    t0_rows = [r for r in rows if r[0] == t0]
    # the 100.0 late row did NOT make it into t0's finalized window
    assert t0_rows == [(t0, 2, 3.0)], rows
