"""Unit pins for the corpus-level duplicate-removal passes:
C4-style non-overlapping span dedup (q_span_dedup) and
ExactSubstr-style token-granular removal (q_substr_dedup). Both also
have hash-exact DuckDB oracle rows; these tests pin the SEMANTICS
against independent pure-Python references so the implementation and
oracle can't drift together, and assert the corpus exercises the
interesting branches (full-duplicate collapse, partial removal)."""

from ocr_intern_spark.operators.curation import SPAN_W, SUB_L, q_span_dedup, q_substr_dedup

SF_DIR = "/root/testdata/sf0.001"


def _docs_py(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return sorted(
        (r.doc_id, r.text.strip().lower().split())
        for r in rows
        if r.text.strip()
    )


def _span_ref(docs):
    seen = {}
    out = {}
    for did, toks in docs:
        segs = [
            " ".join(toks[i * SPAN_W : (i + 1) * SPAN_W])
            for i in range((len(toks) - 1) // SPAN_W + 1)
        ]
        kept = []
        for p, s in enumerate(segs):
            if s not in seen:
                seen[s] = (did, p)
                kept.append(s)
        out[did] = (len(segs), len(kept), " ".join(kept))
    return out


def _substr_ref(docs):
    first = {}
    for did, toks in docs:
        for i in range(len(toks) - SUB_L + 1):
            w = " ".join(toks[i : i + SUB_L])
            if w not in first:
                first[w] = (did, i)
    out = {}
    for did, toks in docs:
        n = len(toks)
        nw = max(n - SUB_L + 1, 0)
        dup = [
            first[" ".join(toks[i : i + SUB_L])] != (did, i) for i in range(nw)
        ]
        kept = []
        removed = 0
        for j in range(n):
            cover = dup[max(0, j - SUB_L + 1) : min(j, nw - 1) + 1]
            if cover and all(cover):
                removed += 1
            else:
                kept.append(toks[j])
        out[did] = (n, removed, " ".join(kept))
    return out


def test_span_dedup_matches_reference(spark):
    docs = _docs_py(spark)
    ref = _span_ref(docs)
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.clean_text)
        for r in q_span_dedup(spark, SF_DIR).collect()
    }
    assert got == ref
    # the corpus exercises both branches: full collapse and partial
    assert any(k == 0 for _, k, _ in ref.values())
    assert any(0 < k < n for n, k, _ in ref.values())


def test_substr_dedup_matches_reference(spark):
    docs = _docs_py(spark)
    ref = _substr_ref(docs)
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in q_substr_dedup(spark, SF_DIR).collect()
    }
    assert got == ref
    assert any(rm > 0 for _, rm, _ in ref.values())
    # token granularity: some doc loses tokens but NOT a whole
    # span-aligned prefix/suffix — removal boundaries land mid-segment
    assert any(0 < rm < n for n, rm, _ in ref.values())


def test_substr_keeps_short_docs_whole(spark):
    """Docs shorter than SUB_L words have no windows: nothing is
    ever removed from them, however often their text repeats."""
    docs = _docs_py(spark)
    ref = _substr_ref(docs)
    short = [did for did, toks in docs if len(toks) < SUB_L]
    for did in short:
        n, removed, _ = ref[did]
        assert removed == 0
