"""Pure-Python reference pins for the session-10 operators:
CDC MERGE INTO snapshot maintenance (all five merge branches
recomputed exactly from the events parquet), anchor-text graph
aggregation (exact per-host rollup incl. the dominant-anchor total
tie-break), and incremental IVF delta assignment (partition/count
invariants + frozen-centroid growth arithmetic). Each reference is
an independent stdlib recompute, never a re-run of the Spark code."""

import math
import re
from collections import Counter, defaultdict
from datetime import datetime

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

MERGE_CUT = datetime(2024, 1, 20)


@pytest.fixture(scope="module")
def events():
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    return t.to_pylist()


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    return list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- events_merge_upsert ---------------------------------------------------


def _merge_reference(events):
    """Textbook MERGE recompute: target/source states per (user, k),
    full-outer combine, tombstone rule on the last delta event."""
    import json

    tgt = defaultdict(lambda: [0, 0, -1])  # (u,k) -> [n, cents, max_id]
    src = defaultdict(lambda: [0, 0, -1])
    last = {}  # (u,k) -> (ts, event_id, event_type)
    for e in events:
        key = (e["user_id"], json.loads(e["props"])["k"])
        cents = math.floor(e["value"] * 100)
        side = tgt if e["ts"] < MERGE_CUT else src
        side[key][0] += 1
        side[key][1] += cents
        side[key][2] = max(side[key][2], e["event_id"])
        if e["ts"] >= MERGE_CUT:
            cand = (e["ts"], e["event_id"], e["event_type"])
            if key not in last or cand > last[key]:
                last[key] = cand
    rows = {}
    stats = Counter()
    for key in set(tgt) | set(src):
        in_t, in_s = key in tgt, key in src
        is_del = in_s and last[key][2] == "error"
        if is_del:
            stats["delete_matched" if in_t else "delete_unmatched"] += 1
            continue
        op = "insert" if not in_t else ("keep" if not in_s else "update")
        stats[op] += 1
        n = tgt[key][0] + src[key][0] if in_t and in_s else (
            tgt[key][0] if in_t else src[key][0]
        )
        c = (tgt[key][1] if in_t else 0) + (src[key][1] if in_s else 0)
        mid = max(tgt[key][2] if in_t else -1, src[key][2] if in_s else -1)
        rows[key] = (op, n, c, mid)
    return rows, stats


def test_merge_upsert_exact(spark, events):
    from ocr_intern_spark.operators.analytics import q_events_merge_upsert

    exp, stats = _merge_reference(events)
    # every MERGE branch must actually fire at this sf
    for branch in (
        "keep",
        "update",
        "insert",
        "delete_matched",
        "delete_unmatched",
    ):
        assert stats[branch] > 0, f"vacuous MERGE branch: {branch}"

    got = {
        (r["user_id"], r["k"]): (
            r["op"],
            r["n_events"],
            r["total_cents"],
            r["last_event_id"],
        )
        for r in q_events_merge_upsert(spark, SF_DIR).collect()
    }
    assert got == exp


def test_merge_upsert_plan_join_free(spark):
    """The decorrelated MERGE must be a single conditional aggregate:
    no join operator anywhere, exactly one hash-partitioning exchange
    (the final orderBy adds a range exchange, which is allowed)."""
    from ocr_intern_spark.operators.analytics import q_events_merge_upsert

    plan = _plan(q_events_merge_upsert(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("hashpartitioning") >= 1
    # one logical shuffle key: every hashpartitioning is on (user_id, k)
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "user_id" in m.group(1) and "k" in m.group(1), m.group(0)


# --- graph_anchor_text -----------------------------------------------------


def _anchor_reference(docs):
    from ocr_intern_spark.operators.curation import ANCHOR_SITES

    edge_cnt = Counter()  # (host, anchor) -> n
    host_docs = defaultdict(set)
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        for j in range(1 + doc_id % 3):
            anchor = toks[j] if j < len(toks) else "x"
            host = f"site{(doc_id * 7 + 13 * len(anchor)) % ANCHOR_SITES}.com"
            edge_cnt[(host, anchor)] += 1
            host_docs[host].add(doc_id)
    out = {}
    for host in host_docs:
        anchors = {a: n for (h, a), n in edge_cnt.items() if h == host}
        top = min(anchors.items(), key=lambda kv: (-kv[1], kv[0]))
        out[host] = (
            sum(anchors.values()),
            len(host_docs[host]),
            len(anchors),
            top[0],
            top[1],
        )
    return out


def test_anchor_graph_exact(spark, docs):
    from ocr_intern_spark.operators.curation import q_anchor_graph

    exp = _anchor_reference(docs)
    rows = q_anchor_graph(spark, SF_DIR).collect()
    got = {
        r["host"]: (
            r["in_degree"],
            r["n_sources"],
            r["n_anchor_terms"],
            r["top_anchor"],
            r["top_anchor_n"],
        )
        for r in rows
    }
    assert got == exp
    # non-vacuity: some host has a genuine tie-broken or multi-anchor
    # frame, and some doc contributes more than one edge
    assert any(v[2] > 1 for v in exp.values())
    assert any(v[0] > v[1] for v in exp.values())


# --- sim_ivf_delta_assign --------------------------------------------------


def test_ivf_delta_assign_invariants(spark):
    from ocr_intern_spark.operators.similarity import (
        DELTA_MOD,
        IVF_CELLS,
        q_ivf_delta_assign,
    )

    emb = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id"]
    ).column("vec_id").to_pylist()
    n_base = sum(1 for v in emb if v % DELTA_MOD != 0)
    n_delta = sum(1 for v in emb if v % DELTA_MOD == 0)
    assert n_delta > 0  # the delta batch is non-vacuous

    rows = q_ivf_delta_assign(spark, SF_DIR).collect()
    # every vector lands in exactly one cell, on both sides
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_delta"] for r in rows) == n_delta
    assert len(rows) <= IVF_CELLS
    assert sum(r["n_delta"] > 0 for r in rows) > 0
    for r in rows:
        # growth arithmetic is pure integer, and the best-delta column
        # is NULL exactly when the cell had no arrivals
        assert r["growth_ppm"] == r["n_delta"] * 10**6 // r["n_base"]
        assert (r["top_delta_vec"] is None) == (r["n_delta"] == 0)
        if r["top_delta_vec"] is not None:
            assert r["top_delta_vec"] % DELTA_MOD == 0
