"""Canonical schemas (BASELINE.json input_hint / FIXTURES.md)."""

from __future__ import annotations

INPUT_SPAN_FIELDS = "kind:string,text:string,media_ref:string,offset:int"
OUTPUT_SPAN_FIELDS = "kind:string,text:string,media_ref:string,order:int"

DOCUMENTS_DDL = f"doc_id string, spans array<struct<{INPUT_SPAN_FIELDS}>>"
EXTRACTED_DDL = f"doc_id string, spans array<struct<{OUTPUT_SPAN_FIELDS}>>"

# Intermediate row-level schema between explode and re-assembly:
# (offset, pos, seq) is the total order key — offset from the input
# span, pos = array position (tie-break), seq = within-span emission
# index (reading order for OCR tokens).
FLAT_DDL = (
    "doc_id string, offset int, pos int, seq int, "
    "kind string, text string, media_ref string"
)

# Word boxes emitted by a recognizer (pytesseract image_to_data shape,
# /root/reference/src/ocr/base.py:177-211).
TOKENS_DDL = (
    "text string, conf double, x int, y int, w int, h int, lang string"
)

METRICS_DDL = (
    "run_id string, partition_id int, docs long, spans_in long, "
    "spans_out long, errors long, wall_ms double, ts timestamp"
)
