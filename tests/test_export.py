"""S5 PDF / S6 DOCX sinks + S9 distributed fan-out (closes the last
two SURVEY §2 gaps). Renderer outputs are validated structurally
(PDF header/xref/trailer and recoverable text; DOCX as a readable
OOXML zip), then the Spark fan-out is checked end to end."""

import re
import zipfile
from io import BytesIO

from ocr_intern_spark.functions.arabic_text import postprocess_arabic
from ocr_intern_spark.sources.corpus import corpus_to_spark
from ocr_intern_spark.sources.export import (
    export_documents,
    render_docx,
    render_pdf,
)

TEXTS = ["Prefecture de Casablanca", "Reçu 2024/123", "شهادة السكنى"]


def test_pdf_structure_and_content():
    blob = render_pdf(TEXTS, "Certificat")
    assert blob.startswith(b"%PDF-1.4")
    assert blob.rstrip().endswith(b"%%EOF")
    # xref offset points at the xref table
    start = int(re.search(rb"startxref\n(\d+)", blob).group(1))
    assert blob[start : start + 4] == b"xref"
    # French lines embedded as literal strings, in order, y stepping -20
    ys = [int(m) for m in re.findall(rb"72 (\d+) Td", blob)]
    assert ys == [750, 730, 710]
    assert b"(Prefecture de Casablanca)" in blob
    # latin-1 é and escaped parens survive
    assert "Reçu 2024/123".encode("latin-1") in blob
    # Arabic line is reshaped+displayed then hex-encoded UTF-16BE
    shaped = postprocess_arabic("شهادة السكنى")
    assert b"<FEFF" + shaped.encode("utf-16-be").hex().upper().encode() in blob


def test_pdf_escapes_parens():
    blob = render_pdf(["a(b)c"], "t")
    assert b"(a\\(b\\)c)" in blob


def test_docx_structure_and_content():
    blob = render_docx(TEXTS, "Certificat de Résidence", "شهادة السكنى")
    with zipfile.ZipFile(BytesIO(blob)) as z:
        assert set(z.namelist()) == {
            "[Content_Types].xml", "_rels/.rels", "word/document.xml",
        }
        doc = z.read("word/document.xml").decode("utf-8")
    assert doc.index('w:pStyle w:val="Title"') < doc.index("French Text")
    assert "French Text" in doc and "Arabic Text" in doc
    assert "Prefecture de Casablanca" in doc
    assert "شهادة السكنى" in doc  # logical order in DOCX (Word shapes)
    assert '<w:sz w:val="32"/>' in doc  # 16pt Arabic header
    # headings precede their language's paragraphs
    assert doc.index("French Text") < doc.index("Prefecture")


def test_docx_escapes_xml():
    blob = render_docx(["a<b>&c"], "n", "x")
    with zipfile.ZipFile(BytesIO(blob)) as z:
        doc = z.read("word/document.xml").decode("utf-8")
    assert "a&lt;b&gt;&amp;c" in doc


def test_export_fanout_spark(spark):
    docs = corpus_to_spark(spark, 10, seed=3, partitions=2)
    out = export_documents(docs, formats=("pdf", "docx")).collect()
    assert len(out) == 20  # docs × formats
    by_fmt = {}
    for r in out:
        by_fmt.setdefault(r["fmt"], []).append(r)
        assert r["n_bytes"] == len(r["content"]) > 100
    assert {len(v) for v in by_fmt.values()} == {10}
    assert all(bytes(r["content"]).startswith(b"%PDF") for r in by_fmt["pdf"])
    assert all(bytes(r["content"])[:2] == b"PK" for r in by_fmt["docx"])


def test_xlsx_structure_and_cell_recovery():
    """S7: cell values (strings incl. Arabic/XML-escapes, floats,
    ints) recover exactly from the zip, with the reference's
    Language/Text/Confidence/X/Y/Width/Height header and french rows
    before arabic (document_export.py:110-140)."""
    import xml.etree.ElementTree as ET

    from ocr_intern_spark.sources.export import XLSX_COLUMNS, render_xlsx

    records = [
        ("french", "Reçu <2024> & fils", 87.5, 10, 20, 120, 14),
        ("arabic", "شهادة السكنى", 62.0, 5, 40, 200, 16),
    ]
    blob = render_xlsx(records)
    assert blob[:2] == b"PK"
    with zipfile.ZipFile(BytesIO(blob)) as z:
        assert "xl/workbook.xml" in z.namelist()
        sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    ns = {"s": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rows = ET.fromstring(sheet).findall(".//s:row", ns)
    parsed = []
    for row in rows:
        vals = []
        for c in row.findall("s:c", ns):
            t = c.find(".//s:t", ns)
            vals.append(t.text if t is not None else c.find("s:v", ns).text)
        parsed.append(vals)
    assert parsed[0] == list(XLSX_COLUMNS)
    assert parsed[1] == ["french", "Reçu <2024> & fils", "87.5", "10", "20", "120", "14"]
    assert parsed[2] == ["arabic", "شهادة السكنى", "62.0", "5", "40", "200", "16"]


def test_xlsx_splits_languages_from_texts():
    from ocr_intern_spark.sources.export import xlsx_records_from_texts

    recs = xlsx_records_from_texts(["bonjour", "شهادة", "ville"])
    assert [r[0] for r in recs] == ["french", "french", "arabic"]
    assert [r[1] for r in recs] == ["bonjour", "ville", "شهادة"]


def test_export_fanout_includes_xlsx(spark):
    docs = corpus_to_spark(spark, 4, seed=3, partitions=2)
    out = export_documents(docs, formats=("pdf", "docx", "xlsx")).collect()
    assert len(out) == 12
    xlsx = [r for r in out if r["fmt"] == "xlsx"]
    assert len(xlsx) == 4
    for r in xlsx:
        with zipfile.ZipFile(BytesIO(bytes(r["content"]))) as z:
            assert "xl/worksheets/sheet1.xml" in z.namelist()
