"""Streaming heavy-hitter promotion: a key crossing min_count ACROSS
micro-batches is emitted exactly once with its cumulative count; keys
below threshold never appear; later arrivals never re-emit."""

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_intern_spark.streaming.extract_stream import (
    HH_TOKENS_DDL,
    stream_heavy_hitters,
)

_SCHEMA = pa.schema([("tok", pa.string())])


def _write(path, toks):
    pq.write_table(pa.table({"tok": list(toks)}, schema=_SCHEMA), path)


@pytest.fixture()
def tok_stream_dir(tmp_path):
    d = tmp_path / "toks"
    d.mkdir()
    # hot: 3 + 2 + 2 = 7 (crosses 5 in batch 2); warm: 1+1 = 2; cold: 1
    _write(str(d / "batch1.parquet"), ["hot"] * 3 + ["warm"])
    _write(str(d / "batch2.parquet"), ["hot"] * 2 + ["warm", "cold"])
    _write(str(d / "batch3.parquet"), ["hot"] * 2)
    return str(d)


def test_promotion_exactly_once_across_batches(spark, tok_stream_dir):
    stream = (
        spark.readStream.schema(HH_TOKENS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(tok_stream_dir)
    )
    q = (
        stream_heavy_hitters(stream, min_count=5)
        .writeStream.format("memory")
        .queryName("hh")
        .start()
    )
    # same bounded-poll barrier as test_stateful_assemble:
    # ProcessingTimeTimeout keeps scheduling micro-batches, so
    # processAllAvailable never quiesces
    deadline = time.time() + 300
    rows = []
    while time.time() < deadline:
        rows = spark.sql("select * from hh").collect()
        if rows and q.lastProgress and (
            q.lastProgress["numInputRows"] == 0
        ):
            break
        time.sleep(2)
    q.stop()
    assert [(r.tok, r["count"]) for r in rows] == [("hot", 5)]
