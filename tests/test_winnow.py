"""Winnowing fingerprint guarantee (Schleimer/Wilkerson/Aiken,
SIGMOD'03): any substring match of length >= WINNOW_W + WINNOW_K - 1
chars must yield at least one shared selected fingerprint; disjoint-
alphabet docs share none. Exact values are pinned by the DuckDB
oracle (text_winnow_fingerprints / text_winnow_shared_pairs)."""

from ocr_intern_spark.functions.text import WINNOW_K, WINNOW_W, _winnow_fps


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _winnow_fps(df).collect()
    by_doc: dict[int, set[str]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc

def test_shared_substring_yields_shared_fingerprint(spark):
    guarantee = WINNOW_W + WINNOW_K - 1
    shared = "zqxjkvwpbyfgm"[: guarantee + 2]  # rare-gram payload
    assert len(shared) >= guarantee
    rows = [
        (1, f"aaaa bbbb {shared} cccc dddd"),
        (2, f"eeee ffff gggg {shared} hhhh"),
    ]
    by_doc = _fps(spark, rows)
    assert by_doc[1] & by_doc[2], "winnowing guarantee violated"

def test_disjoint_docs_share_nothing(spark):
    by_doc = _fps(
        spark,
        [(1, "abcd efgh ijkl mnop qrst"), (2, "uvwx yzuv wxyz vuwy xzyw")],
    )
    assert by_doc[1] and by_doc[2]
    assert not (by_doc[1] & by_doc[2])

def test_short_doc_still_fingerprinted(spark):
    # >= K chars but fewer than W k-grams: whole-array min fallback
    by_doc = _fps(spark, [(1, "abcdefghi")])  # 9 chars -> 2 grams < W
    assert len(by_doc[1]) == 1
