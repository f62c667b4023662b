"""Unit pins for the incremental-dedup / TWAP / triangle-census / MMR
additions: each also carries a hash-exact DuckDB oracle row; these
tests pin the SEMANTICS against independent pure-Python (or numpy)
references so an implementation and its oracle cannot drift
together."""

import hashlib
import math
from collections import Counter

import duckdb
import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _doc_texts():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return {r[0]: r[1] for r in rows}


def _toks(text: str) -> list[str]:
    return text.strip().lower().split()


def _prefix_fp(text: str) -> str:
    return hashlib.md5(" ".join(_toks(text)[:5]).encode()).hexdigest()


# --- incremental ingest dedup -------------------------------------------------


def _incremental_ref(texts: dict) -> list[tuple]:
    fps = {d: _prefix_fp(t) for d, t in texts.items()}
    corpus_min: dict = {}
    for d in sorted(texts):
        if d % 2 == 0:
            corpus_min.setdefault(fps[d], d)
    batch_first: dict = {}
    out = []
    for d in sorted(texts):
        if d % 2 != 1:
            continue
        fp = fps[d]
        first = batch_first.setdefault(fp, d)
        corpus_doc = corpus_min.get(fp)
        is_novel = corpus_doc is None and d == first
        dup_of = corpus_doc if corpus_doc is not None else (
            first if d != first else None
        )
        out.append((d, is_novel, dup_of))
    return out


def test_incremental_dedup_matches_python_reference(spark):
    from ocr_intern_spark.operators.dedup import q_dedup_incremental

    got = [
        (r.doc_id, r.is_novel, r.dup_of)
        for r in q_dedup_incremental(spark, SF_DIR).collect()
    ]
    want = _incremental_ref(_doc_texts())
    assert got == want
    # non-vacuous: some batch docs match the corpus index, some are
    # novel — both join outcomes exercised
    assert any(r[1] for r in got) and any(not r[1] for r in got)
    assert any(r[2] is not None for r in got)


# --- TWAP ---------------------------------------------------------------------


def _twap_ref() -> dict:
    rows = duckdb.sql(
        f"SELECT user_id, event_id, ts, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    per_user: dict = {}
    for uid, eid, ts, val in rows:
        per_user.setdefault(uid, []).append((ts, eid, val))
    out = {}
    for uid, evts in per_user.items():
        evts.sort()
        num = den = 0.0
        n = 0
        for (ts, _e, val), (ts2, _e2, _v2) in zip(evts, evts[1:]):
            dt = round((ts2 - ts).total_seconds() * 1_000_000)
            num += val * dt
            den += dt
            n += 1
        if n:
            out[uid] = (n, round(num / den, 6))
    return out


def test_twap_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import q_events_twap

    got = {
        r.user_id: (r.n_intervals, r.twap)
        for r in q_events_twap(spark, SF_DIR).collect()
    }
    want = _twap_ref()
    assert got == want
    # TWAP must differ from the plain mean for at least one user
    # (otherwise the interval weighting is vacuous)
    plain = duckdb.sql(
        f"SELECT user_id, round(avg(value), 6) FROM '{SF_DIR}/events.parquet'"
        " GROUP BY user_id"
    ).fetchall()
    assert any(
        uid in got and got[uid][1] != m for uid, m in plain
    )


# --- triangle census ----------------------------------------------------------


def _graph_edges(texts: dict) -> set:
    from ocr_intern_spark.operators.curation import DECON_NGRAM

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
    edges = set()
    for d, gs in grams_of.items():
        for g in gs:
            s = first[g]
            if s != d:
                edges.add((min(d, s), max(d, s)))
    return edges


def _triangle_ref(texts: dict) -> tuple:
    edges = _graph_edges(texts)
    nbrs: dict = {}
    deg: Counter = Counter()
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        deg[a] += 1
        deg[b] += 1
    n_tri = 0
    for a, b in edges:
        # c > b > a with (a,c) and (b,c) both present
        for c in nbrs.get(b, ()):
            if c in nbrs.get(a, ()):
                n_tri += 1
    n_wedges = sum(d * (d - 1) for d in deg.values()) // 2
    coeff = (
        round(3.0 * n_tri / n_wedges, 6) if n_wedges > 0 else None
    )
    return len(texts), len(edges), n_wedges, n_tri, coeff


def test_triangles_match_python_reference(spark):
    from ocr_intern_spark.operators.curation import q_triangle_stats

    row = q_triangle_stats(spark, SF_DIR).collect()[0]
    got = (
        row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles,
        row.clustering_coeff,
    )
    want = _triangle_ref(_doc_texts())
    assert got == want
    # non-vacuous: the duplicate families form real triangles
    assert got[3] > 0 and got[2] > got[3]


# --- MMR diverse selection ------------------------------------------------------


def _mmr_ref() -> list[tuple]:
    from ocr_intern_spark.operators.similarity import MMR_K, QUERY_VEC_ID

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SF_DIR}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    labels = {r[0]: r[2] for r in rows}
    qv = vecs[QUERY_VEC_ID]

    def cos(a, b):
        return float(a @ b / (math.sqrt(a @ a) * math.sqrt(b @ b)))

    rel = {
        v: round(cos(vecs[v], qv), 9) for v in vecs if v != QUERY_VEC_ID
    }
    selected: list = []
    out = []
    for k in range(MMR_K):
        best = None
        for v in sorted(rel):
            if v in (s for s, _ in selected):
                continue
            if selected:
                # mirror the engine: selected vectors ride as float32
                # literals, so cosine uses the float32-widened values
                maxsim = max(
                    round(cos(vecs[v], vecs[s]), 9) for s, _ in selected
                )
                score = round(0.7 * rel[v] - 0.3 * maxsim, 6)
            else:
                score = round(0.7 * rel[v], 6)
            if best is None or score > best[1]:
                best = (v, score)
        selected.append(best)
        out.append((k + 1, best[0], labels[best[0]], best[1]))
    return out


def test_mmr_matches_numpy_reference(spark):
    from ocr_intern_spark.operators.similarity import q_mmr_select

    got = [
        (r.rank, r.vec_id, r.label, r.mmr)
        for r in q_mmr_select(spark, SF_DIR).collect()
    ]
    want = _mmr_ref()
    assert got == want


def test_mmr_diversifies_vs_topk(spark):
    """MMR must not pick the same set as plain relevance top-K: at
    least one pick trades relevance for diversity (otherwise the
    diversity term is vacuous on this corpus)."""
    from ocr_intern_spark.operators.similarity import (
        MMR_K, q_cosine_topk, q_mmr_select,
    )

    mmr_ids = {r.vec_id for r in q_mmr_select(spark, SF_DIR).collect()}
    topk_ids = [
        r.vec_id for r in q_cosine_topk(spark, SF_DIR).collect()
    ][:MMR_K]
    assert mmr_ids != set(topk_ids)
