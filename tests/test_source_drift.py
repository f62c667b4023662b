"""Source-mix drift diagnostics: pure-Python reference pins for the
per-source unigram KL divergence and the pairwise bigram-vocabulary
Jaccard matrix, plus hand-built fixtures with closed-form answers
(drifted source ranks highest; identical sources score Jaccard 1.0;
disjoint pairs are absent)."""

import math
import tempfile
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in text.strip().lower().split() if t]


def _kl_ref(docs):
    """docs: (source, text). Returns {source: (n_tokens, vocab_size,
    kl_bits)} exactly as the operator defines."""
    st: Counter = Counter()
    for src, text in docs:
        for t in _toks(text):
            st[(src, t)] += 1
    ct: Counter = Counter()
    ns: Counter = Counter()
    for (src, t), c in st.items():
        ct[t] += c
        ns[src] += c
    n = sum(ct.values())
    out = {}
    for src in ns:
        terms = [
            (c / ns[src]) * math.log((c * n) / (ns[src] * ct[t]))
            for (s, t), c in st.items()
            if s == src
        ]
        vocab = sum(1 for (s, _t) in st if s == src)
        out[src] = (ns[src], vocab, round(sum(terms) / math.log(2), 6))
    return out


def _overlap_ref(docs):
    """docs: (source, text). Returns {(a, b): (inter, union, jac)}."""
    sets: dict = {}
    for src, text in docs:
        ts = _toks(text)
        sets.setdefault(src, set()).update(
            " ".join(ts[i : i + 2]) for i in range(len(ts) - 1)
        )
    out = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a < b and sets[a] & sets[b]:
                i = len(sets[a] & sets[b])
                u = len(sets[a] | sets[b])
                out[(a, b)] = (i, u, round(i / u, 6))
    return out


def _corpus_docs(spark):
    return [
        (r.source, r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    ]


def test_kl_drift_matches_python_reference(spark):
    from ocr_intern_spark.operators.curation import q_source_kl_drift

    want = _kl_ref(_corpus_docs(spark))
    got = q_source_kl_drift(spark, SF_DIR).collect()
    assert len(got) == len(want) > 1
    for r in got:
        nt, vs, kl = want[r.source]
        assert (r.n_tokens, r.vocab_size) == (nt, vs)
        assert abs(r.kl_bits - kl) < 2e-6, (r.source, r.kl_bits, kl)
    # non-vacuity: a real corpus is never a perfect mix — KL > 0
    assert all(r.kl_bits > 0 for r in got)


def test_vocab_overlap_matches_python_reference(spark):
    from ocr_intern_spark.operators.curation import q_source_vocab_overlap

    want = _overlap_ref(_corpus_docs(spark))
    got = q_source_vocab_overlap(spark, SF_DIR).collect()
    assert len(got) == len(want) > 1
    for r in got:
        i, u, j = want[(r.source_a, r.source_b)]
        assert (r.n_inter, r.n_union, r.jaccard) == (i, u, j)
    # non-vacuity: sources overlap but are not copies of each other
    assert all(0 < r.jaccard < 1 for r in got)


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")


def test_kl_drift_ranks_the_drifted_source(spark):
    from ocr_intern_spark.operators.curation import q_source_kl_drift

    # two sources matching the mix, one drifted: KL(drift) strictly
    # dominates, and every value matches the closed-form reference
    rows = [
        ("s_a", "alpha beta gamma delta " * 8),
        ("s_b", "alpha beta gamma delta " * 8),
        ("s_drift", "alpha alpha alpha alpha alpha alpha alpha beta"),
    ]
    want = _kl_ref(rows)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = {r.source: r for r in q_source_kl_drift(spark, d).collect()}
    for src, (nt, vs, kl) in want.items():
        r = got[src]
        assert (r.n_tokens, r.vocab_size) == (nt, vs)
        assert abs(r.kl_bits - kl) < 2e-6
    assert got["s_drift"].kl_bits > got["s_a"].kl_bits
    assert got["s_a"].kl_bits == got["s_b"].kl_bits


def test_vocab_overlap_identical_partial_disjoint(spark):
    from ocr_intern_spark.operators.curation import q_source_vocab_overlap

    rows = [
        ("s_one", "a b c d"),          # bigrams {a b, b c, c d}
        ("s_two", "a b c d"),          # identical → jaccard 1.0
        ("s_half", "a b x y"),         # shares {a b} of {a b, b x, x y}
        ("s_off", "p q r"),            # disjoint → pair rows absent
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = {
            (r.source_a, r.source_b): r
            for r in q_source_vocab_overlap(spark, d).collect()
        }
    ident = got[("s_one", "s_two")]
    assert (ident.n_inter, ident.n_union, ident.jaccard) == (3, 3, 1.0)
    half = got[("s_half", "s_one")]
    assert (half.n_inter, half.n_union, half.jaccard) == (1, 5, 0.2)
    assert not any("s_off" in k for k in got)
