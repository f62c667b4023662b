"""Python UDTFs (Spark 4 `@udtf` table functions): the SQL-surface
escape hatch for span segmentation.

The engine's production path derives spans NATIVELY (pure Catalyst —
`__spark_entry__.derive_spans`: split / transform / sequence
expressions, whole-stage codegen, zero Python). This module exposes
the same segmentation as a registered table function so a SQL user
can write

    SELECT s.* FROM documents,
           LATERAL segment_spans(CAST(doc_id AS STRING), text) s

when they need row-expansion logic that Catalyst can't express (a
real tokenizer, a layout model). The UDTF is the BOUNDARY DEMO, not
the hot path: test_udtf.py pins it row-identical to the native
derivation, so swapping a custom segmenter in keeps the contract.

Scale: UDTFs execute per-partition in the Python worker with Arrow
transfer (`useArrow=True`); state is per-row only, so the operator
parallelizes like any narrow map — but it still pays the
JVM↔Python boundary, which is why the native path stays production.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

SPAN_SCHEMA = "kind string, text string, media_ref string, offset int"

CHUNK_WORDS = 8  # mirrors derive_spans: 8-word text chunks


@udtf(returnType=SPAN_SCHEMA, useArrow=True)
class SegmentSpans:
    """Segment a flat document into the canonical span stream:
    8-word text chunks, one media ref, one synthesized field span —
    the exact derive_spans semantics (pinned by parity test)."""

    def eval(self, doc_id: str, text: str):  # noqa: D102
        # Spark's split(trim(text), '\s+') yields [""] for empty text
        # (size 1), so the empty document still gets one empty chunk.
        stripped = (text or "").strip()
        toks = stripped.split() if stripped else [""]
        nchunks = max(-(-len(toks) // CHUNK_WORDS), 1)
        for i in range(nchunks):
            chunk = " ".join(toks[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS])
            yield ("text", chunk, "", i)
        did = int(doc_id)
        yield ("media", "", f"img://{did}", nchunks)
        field = (
            f"date: {did % 28 + 1}/{did % 12 + 1}/20{did % 100:02d}"
        )
        yield ("field", field, "", nchunks + 1)


def register_udtfs(spark) -> None:
    """Register the table functions on a session (idempotent)."""
    spark.udtf.register("segment_spans", SegmentSpans)
