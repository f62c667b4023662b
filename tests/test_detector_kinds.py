"""F7 handwriting / F8 stamp detector pass-through: recognizers may
emit non-'ocr' Token kinds (geometry candidates). Those bypass the
parse/script/dedupe fusion and are appended after the media's ocr
spans in emission order, bbox serialized as text — on BOTH the
pure-Python oracle and the Spark pipeline, which must agree exactly.
(Reference: main_window.py:66-95 handwriting regions;
tests/unit/test_morocco_documents.py:248-265 stamps.)"""

from ocr_intern_spark.oracle.semantics import Token, extract_document
from ocr_intern_spark.operators.extract import extract
from ocr_intern_spark.sources.corpus import SPANS_DDL


def make_recognizer():
    # nested closure: cloudpickle serializes it by VALUE, so Spark
    # workers don't need this test module on their import path
    def det_recognizer(ref: str):
        if ref.endswith("empty"):
            # detections on a media whose ocr tokens all get filtered out
            return [
                Token("", -1.0, 0, 0, 10, 10, "fra"),
                Token("", 0.0, 5, 5, 40, 30, "", kind="stamp"),
            ]
        return [
            Token("bonjour", 80.0, 0, 0, 80, 14, "fra"),
            Token("", 0.0, 10, 40, 120, 60, "", kind="handwriting"),
            Token("ville", 70.0, 90, 0, 80, 14, "fra"),
            Token("", 0.0, 200, 200, 90, 90, "", kind="stamp"),
        ]

    return det_recognizer


SPANS = [
    ("media", "", "img://a", 0),
    ("heading", "Titre", "", 1),
    ("media", "", "img://empty", 2),
]


def expected_spans():
    dicts = [
        {"kind": k, "text": t, "media_ref": r, "offset": o}
        for (k, t, r, o) in SPANS
    ]
    return [tuple(s) for s in extract_document(dicts, make_recognizer())]


def test_oracle_orders_detections_after_ocr():
    got = expected_spans()
    assert got == [
        ("ocr", "bonjour", "img://a", 0),
        ("ocr", "ville", "img://a", 1),
        ("handwriting", "10,40,120,60", "img://a", 2),
        ("stamp", "200,200,90,90", "img://a", 3),
        ("heading", "Titre", "", 4),
        ("stamp", "5,5,40,30", "img://empty", 5),
    ]


def test_spark_matches_oracle_with_detections(spark):
    docs = spark.createDataFrame([("d1", list(SPANS))], schema=SPANS_DDL)
    out = extract(docs, make_recognizer(), ocr_partitions=2).collect()
    actual = [
        (s["kind"], s["text"], s["media_ref"], s["order"])
        for s in out[0]["spans"]
    ]
    assert actual == expected_spans()
