"""Streaming heavy-hitter promotion: a key crossing min_count ACROSS
micro-batches is emitted exactly once with its cumulative count; keys
below threshold never appear; later arrivals never re-emit.

The three input files are dropped SEQUENTIALLY — each next file lands
only after the sink shows the previous one was processed — so the
batch boundaries are deterministic regardless of host load. (The
earlier pre-staged variant relied on maxFilesPerTrigger=1 slicing
three already-present files into three batches; one trampled CI run
showed two files coalescing into one batch, which legally changes the
cumulative count at the crossing.)"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_intern_spark.streaming.extract_stream import (
    HH_TOKENS_DDL,
    stream_heavy_hitters,
)

_SCHEMA = pa.schema([("tok", pa.string())])


def _write(path, toks):
    """Atomic drop into a dir a FileStreamSource is actively watching:
    write OUTSIDE the watched dir (its parent — same filesystem), then
    rename in — the source must never list a half-written footer."""
    parent = os.path.dirname(os.path.dirname(path))
    tmp = os.path.join(parent, os.path.basename(path) + ".tmp")
    pq.write_table(pa.table({"tok": list(toks)}, schema=_SCHEMA), tmp)
    os.rename(tmp, path)


def _poll(fn, deadline_s: float = 300, every: float = 1.0):
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        v = fn()
        if v is not None:
            return v
        time.sleep(every)
    raise TimeoutError("stream poll deadline")


def test_promotion_exactly_once_across_batches(spark, tmp_path):
    d = tmp_path / "toks"
    d.mkdir()
    # hot: 3 + 2 + 2 = 7 (crosses 5 in file 2); warm: 1+1 = 2; cold: 1
    _write(str(d / "batch1.parquet"), ["hot"] * 3 + ["warm"])

    stream = spark.readStream.schema(HH_TOKENS_DDL).parquet(str(d))
    q = (
        stream_heavy_hitters(stream, min_count=5)
        .writeStream.format("memory")
        .queryName("hh")
        .start()
    )
    try:
        def _input_rows_seen():
            total = sum(p["numInputRows"] for p in q.recentProgress)
            return total or None

        # barrier: file 1's 4 rows fully ingested before file 2 lands
        assert _poll(lambda: _input_rows_seen() if (_input_rows_seen() or 0) >= 4 else None)
        _write(str(d / "batch2.parquet"), ["hot"] * 2 + ["warm", "cold"])
        # the crossing emission appears — cumulative count exactly 5
        rows = _poll(
            lambda: (spark.sql("select * from hh").collect() or None)
        )
        assert [(r.tok, r["count"]) for r in rows] == [("hot", 5)]

        _write(str(d / "batch3.parquet"), ["hot"] * 2)
        # file 3 fully ingested (4 + 4 + 2 rows) …
        _poll(lambda: True if (_input_rows_seen() or 0) >= 10 else None)
        # … and NOTHING re-emits: hot is already promoted, warm (2) and
        # cold (1) never cross
        rows = spark.sql("select * from hh").collect()
        assert [(r.tok, r["count"]) for r in rows] == [("hot", 5)]
    finally:
        q.stop()
