"""Pure-Python reference pin for the all-pairs TF-IDF cosine join,
plus a semantic pin on a hand-built corpus where the expected pairs
(and one just-below-threshold non-pair) are known by construction."""

import math
import tempfile
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _ref_pairs(texts: dict[int, str], tau: float, max_df: int):
    tf = {
        d: Counter(w for w in t.strip().lower().split() if w)
        for d, t in texts.items()
    }
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(texts)
    wt = {
        d: {
            w: f * math.log(n / df[w])
            for w, f in c.items()
            if df[w] <= max_df
        }
        for d, c in tf.items()
    }
    out = []
    docs = sorted(wt)
    for i, a in enumerate(docs):
        na = math.sqrt(sum(v * v for v in wt[a].values()))
        if not na:
            continue
        for b in docs[i + 1 :]:
            nb = math.sqrt(sum(v * v for v in wt[b].values()))
            if not nb:
                continue
            dot = sum(
                (va / na) * (wt[b][w] / nb)
                for w, va in wt[a].items()
                if w in wt[b]
            )
            cos = round(dot, 6)
            if cos >= tau:
                out.append((a, b, cos))
    return sorted(out)


def test_allpairs_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import (
        ALLPAIRS_MAX_DF,
        ALLPAIRS_TAU,
        q_allpairs_cosine,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    want = _ref_pairs(texts, ALLPAIRS_TAU, ALLPAIRS_MAX_DF)
    got = sorted(
        (r.a, r.b, round(r.cos, 6))
        for r in q_allpairs_cosine(spark, SF_DIR).collect()
    )
    assert got == want
    assert len(got) > 0  # the synthetic dup families make it non-vacuous


def test_allpairs_hand_built_threshold(spark):
    """Exact copies give cos exactly 1.0 (identical unit vectors,
    idf-independent); a disjoint doc appears in no pair; and the
    whole tiny-corpus output equals the Python reference."""
    from ocr_intern_spark.functions.text import (
        ALLPAIRS_MAX_DF,
        ALLPAIRS_TAU,
        q_allpairs_cosine,
    )

    texts = {
        1: "alpha beta gamma delta",
        2: "alpha beta gamma delta",
        3: "alpha beta zeta eta",
        4: "iota kappa mu nu",
    }
    rows = [(d, t, "en", "s", 0) for d, t in texts.items()]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = sorted(
            (r.a, r.b, round(r.cos, 6))
            for r in q_allpairs_cosine(spark, d).collect()
        )
    assert got == _ref_pairs(texts, ALLPAIRS_TAU, ALLPAIRS_MAX_DF)
    as_dict = {(a, b): c for a, b, c in got}
    assert as_dict[(1, 2)] == 1.0
    assert not any(4 in p for p in as_dict)
