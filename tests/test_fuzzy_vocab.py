"""Pins for blocked fuzzy vocabulary matching: a pure-Python replica
of the probe injection + blocking + edit-distance pipeline, and the
recovery guarantee — every injected variant that lands in a block
with its original is found, and nothing else is."""

from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ref_pairs(spark):
    from ocr_intern_spark.operators.dedup import (
        FUZZY_BLOCK,
        FUZZY_MAX_DIST,
        FUZZY_MIN_LEN,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    freq: Counter = Counter()
    for r in rows:
        for w in r.text.strip().lower().split():
            if r.doc_id % 10 == 0 and len(w) >= FUZZY_MIN_LEN:
                w = w[:-1] + "x"
            if len(w) >= FUZZY_MIN_LEN:
                freq[w] += 1
    blocks: dict = {}
    for w in freq:
        blocks.setdefault(w[:FUZZY_BLOCK], []).append(w)
    out = []
    for ws in blocks.values():
        ws.sort()
        for i, a in enumerate(ws):
            for b in ws[i + 1 :]:
                if _lev(a, b) <= FUZZY_MAX_DIST:
                    out.append((a, b, freq[a], freq[b]))
    return sorted(out)


def test_fuzzy_vocab_matches_python_reference(spark):
    from ocr_intern_spark.operators.dedup import q_fuzzy_vocab_pairs

    want = _ref_pairs(spark)
    got = sorted(
        (r.wa, r.wb, r.fa, r.fb)
        for r in q_fuzzy_vocab_pairs(spark, SF_DIR).collect()
    )
    assert got == want
    assert len(got) > 0  # the injected variants make it non-vacuous


def test_fuzzy_pairs_are_injected_variants(spark):
    """Every found pair is a (original, variant) couple: same prefix,
    one edit apart, exactly one member ending in the injected 'x'
    (the corpus has no natural near-words — VERIFIED, not assumed:
    zero pairs among non-variant words)."""
    from ocr_intern_spark.operators.dedup import q_fuzzy_vocab_pairs

    rows = q_fuzzy_vocab_pairs(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert _lev(r.wa, r.wb) == 1
        assert (r.wa[:-1] == r.wb[:-1]) and (
            (r.wa.endswith("x")) != (r.wb.endswith("x"))
        ), (r.wa, r.wb)
