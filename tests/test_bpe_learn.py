"""Pure-Python Sennrich-style reference pin for BPE merge learning,
plus a hand-built greedy-overlap case (the classic 'aaa' trap: after
merging (a,a) the new symbol must not immediately re-merge with the
next 'a' in the same pass)."""

from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _ref_merges(word_freq: dict[str, int], rounds: int):
    vocab = {tuple(w): f for w, f in word_freq.items()}
    out = []
    for k in range(rounds):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (l, r), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k + 1, l, r, pf))
        nv: dict = {}
        for syms, f in vocab.items():
            merged = []
            for s in syms:
                if merged and merged[-1] == l and s == r:
                    merged[-1] = l + r
                else:
                    merged.append(s)
            key = tuple(merged)
            nv[key] = nv.get(key, 0) + f
        vocab = nv
    return out


def test_bpe_learn_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import (
        BPE_LEARN_ROUNDS,
        q_bpe_learn_merges,
    )

    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    wf: Counter = Counter()
    for t in texts:
        wf.update(w for w in t.strip().lower().split() if w)
    want = _ref_merges(wf, BPE_LEARN_ROUNDS)
    got = [
        (r.merge_rank, r.l, r.r, r.pf)
        for r in q_bpe_learn_merges(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bpe_greedy_overlap_and_tiebreak(spark):
    """'aaaa'×3: round 1 adopts (a,a) with count 9 (3 overlapping
    pairs per word), rewrite gives (aa)(aa) — greedy non-overlapping;
    round 2 adopts (aa,aa)."""
    import tempfile

    from pyspark.sql import functions as F

    import ocr_intern_spark.functions.text as tx

    df = spark.createDataFrame(
        [(i, "aaaa", "en", "s", 4) for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = [
            (r.merge_rank, r.l, r.r, r.pf)
            for r in tx.q_bpe_learn_merges(spark, d).collect()
        ]
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "aa", 3)
