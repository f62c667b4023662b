"""Document export sinks (S5 PDF, S6 DOCX, S7 XLSX, S9 batch
fan-out) — distributed, dependency-free renderers for the reference's
DocumentExporter (/root/reference/src/utils/document_export.py).

The reference renders per document with reportlab / python-docx on one
machine. Here each document renders inside an Arrow batch stage and the
result is a BINARY column — the Spark-idiomatic sink shape at 10^12
docs: bytes land in a parquet/Iceberg table (or an object-store
foreachPartition writer), not a driver-side file loop. Renderers are
pure functions of the extracted spans:

* render_pdf  — export_to_pdf (:40-72): single page, French lines
  first then Arabic, y from 750 stepping -20 (the reference does not
  paginate; y can run off the page — quirk preserved), Arabic text
  reshaped + bidi-displayed before drawing. Output is a complete
  well-formed PDF 1.4 (catalog/pages/page/font/content/xref). Arabic
  bytes are embedded as UTF-16BE hex strings — syntactically valid
  PDF; glyph rendering needs an embedded font in production exactly
  as the reference registers NotoSansArabic (:31-38).
* render_docx — export_to_word (:75-108): centered title heading,
  centered 16pt Arabic name, one "<Lang> Text" heading per language
  followed by one paragraph per result. Output is a valid OOXML zip
  (stdlib zipfile; no python-docx).
* export_documents — batch_export (:183-215): fan-out of (doc ×
  format) render jobs, as one mapInPandas pass emitting
  (doc_id, fmt, content, n_bytes).

Language split mirrors the exporter's results dict: a span is
"arabic" iff it contains Arabic codepoints, else "french" — the same
script test the hybrid filter uses.
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from typing import Iterator
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_intern_spark.functions.arabic_text import postprocess_arabic


def _is_arabic(text: str) -> bool:
    return any("؀" <= ch <= "ۿ" for ch in text)


def _split_by_lang(texts: list[str]) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {"french": [], "arabic": []}
    for t in texts:
        out["arabic" if _is_arabic(t) else "french"].append(t)
    return out


# --- S5: PDF -----------------------------------------------------------------


def _pdf_text_op(text: str, y: int) -> bytes:
    """One `BT … Tj ET` op at (72, y). Latin-1-safe text as an escaped
    literal string; anything else as a UTF-16BE hex string."""
    try:
        raw = text.encode("latin-1")
        esc = (
            raw.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
        )
        s = b"(" + esc + b")"
    except UnicodeEncodeError:
        s = b"<FEFF" + text.encode("utf-16-be").hex().upper().encode() + b">"
    return b"BT /F1 12 Tf 72 %d Td %s Tj ET\n" % (y, s)


def render_pdf(texts: list[str], title: str) -> bytes:
    """Complete single-page PDF with the reference's layout loop
    (export_to_pdf:54-68): French lines then Arabic (reshaped +
    displayed), starting at y=750, 20pt leading."""
    by_lang = _split_by_lang(texts)
    content = BytesIO()
    y = 750
    for lang in ("french", "arabic"):
        for t in by_lang[lang]:
            if lang == "arabic":
                t = postprocess_arabic(t)
            content.write(_pdf_text_op(t, y))
            y -= 20
    stream = content.getvalue()

    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Title (%s) >>" % title.encode("latin-1", "replace")
        .replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)"),
    ]
    out = BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n%s\nendobj\n" % (i, body))
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer\n<< /Size %d /Root 1 0 R /Info 6 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (len(objs) + 1, xref_at)
    )
    return out.getvalue()


# --- S6: DOCX ----------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _p(text: str, style: str | None = None, center: bool = False,
       half_points: int | None = None) -> str:
    ppr = ""
    if style or center:
        ppr = "<w:pPr>"
        if style:
            ppr += f'<w:pStyle w:val="{style}"/>'
        if center:
            ppr += '<w:jc w:val="center"/>'
        ppr += "</w:pPr>"
    rpr = f'<w:rPr><w:sz w:val="{half_points}"/></w:rPr>' if half_points else ""
    return (
        f"<w:p>{ppr}<w:r>{rpr}"
        f'<w:t xml:space="preserve">{escape(text)}</w:t></w:r></w:p>'
    )


def render_docx(texts: list[str], name: str, name_ar: str) -> bytes:
    """Valid OOXML package mirroring export_to_word's structure:
    centered Title heading, centered 16pt Arabic name, per-language
    'French Text'/'Arabic Text' Heading1 + one paragraph per line."""
    by_lang = _split_by_lang(texts)
    body = [_p(name, style="Title", center=True),
            _p(name_ar, center=True, half_points=32)]
    for lang in ("french", "arabic"):
        if by_lang[lang]:
            body.append(_p(f"{lang.title()} Text", style="Heading1"))
            body.extend(_p(t) for t in by_lang[lang])
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{"".join(body)}</w:body></w:document>'
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", document)
    return buf.getvalue()


# --- S7: XLSX ----------------------------------------------------------------

_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_XLSX_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)

XLSX_COLUMNS = ("Language", "Text", "Confidence", "X", "Y", "Width", "Height")


def _xlsx_cell(v) -> str:
    if isinstance(v, str):
        return f'<c t="inlineStr"><is><t xml:space="preserve">{escape(v)}</t></is></c>'
    if isinstance(v, float):
        return f"<c><v>{v!r}</v></c>"
    return f"<c><v>{v}</v></c>"


def render_xlsx(records: list[tuple]) -> bytes:
    """S7: valid OOXML spreadsheet (stdlib zip, inline strings — no
    sharedStrings table) with the reference's export_to_excel column
    layout (document_export.py:110-140): a header row
    Language/Text/Confidence/X/Y/Width/Height (what pandas.to_excel
    writes) then one row per OCR result record, french results before
    arabic like the exporter's ["french", "arabic"] iteration."""
    rows_xml = []
    for r, rec in enumerate([XLSX_COLUMNS, *records], start=1):
        cells = "".join(_xlsx_cell(v) for v in rec)
        rows_xml.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", _XLSX_WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def xlsx_records_from_texts(texts: list[str]) -> list[tuple]:
    """Span-level records for the distributed fan-out: the spans
    schema carries no confidence/geometry (fusion drops token boxes),
    so those columns are zero here; the renderer itself takes full
    records and the recognizer-boundary path can pass real token
    (conf, x, y, w, h) tuples."""
    by_lang = _split_by_lang(texts)
    return [
        (lang, t, 0.0, 0, 0, 0, 0)
        for lang in ("french", "arabic")
        for t in by_lang[lang]
    ]


# --- S9: distributed batch fan-out -------------------------------------------

EXPORT_DDL = "doc_id string, fmt string, content binary, n_bytes long"


def export_documents(
    extracted: DataFrame,
    formats: tuple[str, ...] = ("pdf", "docx"),
    name: str = "OCR Export",
    name_ar: str = "تصدير",
    partitions: int | None = None,
) -> DataFrame:
    """extracted(doc_id, spans) → one (doc_id, fmt, content, n_bytes)
    row per requested format. Renders distributed in one Arrow pass;
    the text lines are the non-empty span texts in span order."""
    p = partitions or extracted.sparkSession.sparkContext.defaultParallelism
    lines = extracted.select(
        "doc_id",
        F.filter(
            F.transform("spans", lambda s: s["text"]),
            lambda t: F.length(t) > 0,
        ).alias("texts"),
    ).repartition(p, F.hash("doc_id"))

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "fmt": [], "content": [], "n_bytes": []}
            for doc_id, texts in zip(pdf["doc_id"], pdf["texts"]):
                tl = list(texts)
                for fmt in formats:
                    if fmt == "pdf":
                        blob = render_pdf(tl, name)
                    elif fmt == "xlsx":
                        blob = render_xlsx(xlsx_records_from_texts(tl))
                    else:
                        blob = render_docx(tl, name, name_ar)
                    rows["doc_id"].append(doc_id)
                    rows["fmt"].append(fmt)
                    rows["content"].append(blob)
                    rows["n_bytes"].append(len(blob))
            yield pd.DataFrame(rows)

    return lines.mapInPandas(stage, schema=EXPORT_DDL)
