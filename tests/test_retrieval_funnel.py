"""Unit pins for the retrieval / funnel / community additions:
BM25 search, PMI collocations, the ordered conversion funnel, and
deterministic label propagation. Each also carries a hash-exact
DuckDB oracle row; these tests pin the SEMANTICS against independent
pure-Python references so an implementation and its oracle cannot
drift together."""

import math
from collections import Counter

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _doc_texts():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return {r[0]: r[1] for r in rows}


def _toks(text: str) -> list[str]:
    return [w for w in text.strip().lower().split() if w]


# --- BM25 -------------------------------------------------------------------


def _bm25_ref(texts: dict) -> list[tuple]:
    from ocr_intern_spark.operators.retrieval import (
        BM25_B, BM25_K1, BM25_QUERY, BM25_TOPK,
    )

    docs = {d: _toks(t) for d, t in texts.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {
        q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY
    }
    out = []
    for d, t in docs.items():
        dl = len(t)
        score = 0.0
        for q in BM25_QUERY:
            tf = float(t.count(q))
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
            score += round(idf * ((tf * (BM25_K1 + 1.0)) / norm), 9)
        score = round(score, 6)
        if score > 0:
            out.append((d, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:BM25_TOPK]


def test_bm25_matches_python_reference(spark):
    from ocr_intern_spark.operators.retrieval import q_bm25_search

    got = [
        (r.doc_id, r.score) for r in q_bm25_search(spark, SF_DIR).collect()
    ]
    want = _bm25_ref(_doc_texts())
    assert got == want
    assert len(got) > 0  # non-vacuous: the query terms hit the corpus


def test_bm25_rare_term_outranks_common(spark):
    """A document containing the rare term must outscore an otherwise
    comparable document with only common terms (the idf ordering BM25
    exists to provide)."""
    from ocr_intern_spark.operators.retrieval import q_bm25_search

    texts = _doc_texts()
    rows = q_bm25_search(spark, SF_DIR).collect()
    with_rare = [r.score for r in rows if "dup" in _toks(texts[r.doc_id])]
    without = [r.score for r in rows if "dup" not in _toks(texts[r.doc_id])]
    if with_rare and without:
        assert max(with_rare) > max(without)


# --- PMI --------------------------------------------------------------------


def _pmi_ref(texts: dict) -> list[tuple]:
    from ocr_intern_spark.operators.retrieval import PMI_MIN_PAIR, PMI_TOPK

    uni: Counter = Counter()
    bg: Counter = Counter()
    n_pair = 0
    for t in texts.values():
        toks = _toks(t)
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            n_pair += 1
    n_tok = sum(uni.values())
    out = []
    for (a, b), c2 in bg.items():
        if c2 < PMI_MIN_PAIR:
            continue
        pmi = round(
            math.log((float(c2) * n_tok * n_tok)
                     / (float(uni[a]) * uni[b] * n_pair)),
            6,
        )
        out.append((a, b, c2, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:PMI_TOPK]


def test_pmi_matches_python_reference(spark):
    from ocr_intern_spark.operators.retrieval import q_pmi_collocations

    got = [
        (r.w1, r.w2, r.c2, r.pmi)
        for r in q_pmi_collocations(spark, SF_DIR).collect()
    ]
    want = _pmi_ref(_doc_texts())
    assert got == want
    assert len(got) > 0


# --- funnel -----------------------------------------------------------------


def _funnel_ref() -> list[tuple]:
    from ocr_intern_spark.operators.analytics import FUNNEL_HORIZON_S

    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    users: dict = {}
    for uid, et, ts in rows:
        users.setdefault(uid, []).append((et, ts))
    n1 = n2 = n3 = 0
    for evts in users.values():
        views = sorted(ts for et, ts in evts if et == "view")
        clicks = sorted(ts for et, ts in evts if et == "click")
        purch = sorted(ts for et, ts in evts if et == "purchase")
        if not views:
            continue
        n1 += 1
        t1 = views[0]
        c = [
            t for t in clicks
            if t >= t1 and (t - t1).total_seconds() <= FUNNEL_HORIZON_S
        ]
        if not c:
            continue
        n2 += 1
        t2 = c[0]
        p = [
            t for t in purch
            if t >= t2 and (t - t2).total_seconds() <= FUNNEL_HORIZON_S
        ]
        if p:
            n3 += 1
    return [
        ("1_view", n1, None),
        ("2_click", n2, round(n2 / n1, 6) if n1 else None),
        ("3_purchase", n3, round(n3 / n2, 6) if n2 else None),
    ]


def test_funnel_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import q_events_funnel

    got = [
        (r.stage, r.users, r.conv_from_prev)
        for r in q_events_funnel(spark, SF_DIR).collect()
    ]
    want = _funnel_ref()
    assert got == want
    # non-vacuous AND strictly ordered: each stage loses some users
    assert got[0][1] > got[1][1] > got[2][1] > 0


# --- label propagation -------------------------------------------------------


def _lpa_ref(texts: dict) -> dict:
    from ocr_intern_spark.operators.curation import DECON_NGRAM, LPA_ROUNDS

    first: dict = {}
    grams_of: dict = {}
    for d in sorted(texts):
        toks = _toks(texts[d])
        gs = {
            " ".join(toks[i : i + DECON_NGRAM])
            for i in range(len(toks) - DECON_NGRAM + 1)
        } if len(toks) >= DECON_NGRAM else set()
        grams_of[d] = gs
        for g in gs:
            first.setdefault(g, d)
    edges: set = set()
    for d, gs in grams_of.items():
        for g in gs:
            s = first[g]
            if s != d:
                edges.add((d, s))
                edges.add((s, d))
    nbrs: dict = {d: [] for d in texts}
    for a, b in edges:
        nbrs[a].append(b)
    lab = {d: d for d in texts}
    for _ in range(LPA_ROUNDS):
        new = {}
        for d in texts:
            votes = Counter([lab[d]] + [lab[b] for b in nbrs[d]])
            new[d] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def test_lpa_matches_python_reference(spark):
    from ocr_intern_spark.operators.curation import q_label_propagation

    got = {
        r.doc_id: r.label
        for r in q_label_propagation(spark, SF_DIR).collect()
    }
    want = _lpa_ref(_doc_texts())
    assert got == want
    # non-vacuous: real communities form (fewer labels than docs, >1)
    n_comm = len(set(got.values()))
    assert 1 < n_comm < len(got)


# --- RRF fusion ---------------------------------------------------------------


def test_rrf_fusion_python_reference_and_fusion_property(spark):
    """RRF score recomputed from the two input rankings in plain
    Python must match, and the fusion must actually FUSE: a doc
    present in both lists scores the sum of both reciprocal ranks."""
    from ocr_intern_spark.operators.retrieval import (
        RRF_K,
        RRF_LIST_K,
        q_bm25_search,
        q_rrf_fusion,
    )
    from ocr_intern_spark.operators.similarity import q_cosine_topk

    lex = [
        r.doc_id
        for r in q_bm25_search(spark, SF_DIR).limit(RRF_LIST_K).collect()
    ]
    sem = [
        r.vec_id
        for r in q_cosine_topk(spark, SF_DIR).limit(RRF_LIST_K).collect()
    ]
    want = {}
    for rank, d in enumerate(lex, start=1):
        want[d] = want.get(d, 0.0) + round(1.0 / (RRF_K + rank), 9)
    for rank, d in enumerate(sem, start=1):
        want[d] = want.get(d, 0.0) + round(1.0 / (RRF_K + rank), 9)

    got = q_rrf_fusion(spark, SF_DIR).collect()
    for r in got:
        assert abs(r.rrf - round(want[r.doc_id], 6)) < 1e-12, r
    # ranking is by fused score, descending, doc_id tie-break
    scores = [r.rrf for r in got]
    assert scores == sorted(scores, reverse=True)
    # non-vacuous fusion: both single-list docs and (if any overlap
    # exists) dual-list docs are represented with correct null ranks
    both = [r for r in got if r.lex_rank is not None and r.sem_rank is not None]
    only = [r for r in got if (r.lex_rank is None) != (r.sem_rank is None)]
    assert only, "expected docs found by exactly one retriever"
    for r in both:
        assert r.rrf > 1.0 / (RRF_K + 1), "dual-list doc must beat any single-list doc's max"
