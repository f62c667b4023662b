"""Custom stateful streaming operator (applyInPandasWithState):
cross-micro-batch document assembly. A document's spans split across
two micro-batches must come out as ONE complete doc whose span order
matches the batch pipeline's (offset, pos, seq) → 0-based `order`
semantics; docs complete within one batch emit immediately."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_intern_spark.streaming.extract_stream import (
    FLAT_TOTAL_DDL,
    stateful_assemble,
)

# (doc_id, offset, pos, seq, kind, text, media_ref, total)
_DOC_A = [  # arrives split: 2 spans in batch 1, 2 in batch 2
    ("a", 1, 1, 0, "heading", "TITRE", "", 4),
    ("a", 3, 3, 0, "text", "corps du texte", "", 4),
    ("a", 0, 0, 0, "field", "cin=AB123456", "", 4),
    ("a", 2, 2, 0, "ocr", "bonjour", "img://a/0", 4),
]
_DOC_B = [  # complete within batch 1
    ("b", 0, 0, 0, "text", "seul", "", 1),
]

_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("offset", pa.int32()), ("pos", pa.int32()),
     ("seq", pa.int32()), ("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("total", pa.int32())]
)


def _write(path, rows):
    cols = list(zip(*rows))
    pq.write_table(
        pa.table({f.name: list(c) for f, c in zip(_SCHEMA, cols)},
                 schema=_SCHEMA),
        path,
    )


@pytest.fixture()
def span_stream_dir(tmp_path):
    d = tmp_path / "spans"
    d.mkdir()
    _write(str(d / "batch1.parquet"), _DOC_A[:2] + _DOC_B)
    _write(str(d / "batch2.parquet"), _DOC_A[2:])
    return str(d)


def test_cross_batch_assembly(spark, span_stream_dir):
    stream = (
        spark.readStream.schema(FLAT_TOTAL_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(span_stream_dir)
    )
    q = (
        stateful_assemble(stream)
        .writeStream.format("memory")
        .queryName("assembled")
        .start()
    )
    # barrier: poll for the expected output rows, bounded. With
    # ProcessingTimeTimeout the engine keeps scheduling timeout-check
    # micro-batches, so processAllAvailable never quiesces, and
    # availableNow's self-termination races the final flush batch
    # under load (observed: awaitTermination(300) returned False on a
    # loaded box while the memory sink already held both rows).
    import time

    deadline = time.time() + 300
    while time.time() < deadline:
        if spark.sql("select count(*) c from assembled").first()["c"] >= 2:
            break
        time.sleep(2)
    q.stop()

    rows = {r["doc_id"]: r for r in spark.sql("select * from assembled").collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["complete"] and rows["b"]["complete"]

    a = [(s["kind"], s["text"], s["media_ref"], s["order"])
         for s in rows["a"]["spans"]]
    # (offset, pos, seq) sort across BOTH batches → dense 0-based order
    assert a == [
        ("field", "cin=AB123456", "", 0),
        ("heading", "TITRE", "", 1),
        ("ocr", "bonjour", "img://a/0", 2),
        ("text", "corps du texte", "", 3),
    ]
    assert [(s["text"], s["order"]) for s in rows["b"]["spans"]] == [("seul", 0)]
