"""Pins for single-source BFS over the directed kNN graph: exact hop
counts vs an independent pure-Python BFS (raw parquet in, cosine and
ranking re-derived from scratch), non-vacuity of the depth (the graph
has real diameter, not a star), and the unreachable-island claim."""

from collections import deque
from math import sqrt

SF_DIR = "/root/testdata/sf0.001"


def _knn_edges(spark, k):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    emb = {r.vec_id: [float(v) for v in r.embedding] for r in rows}
    norms = {i: sqrt(sum(x * x for x in v)) for i, v in emb.items()}
    edges = {}
    for a, va in emb.items():
        scored = []
        for b, vb in emb.items():
            if a == b:
                continue
            c = sum(x * y for x, y in zip(va, vb)) / (norms[a] * norms[b])
            scored.append((round(c, 6), b))
        scored.sort(key=lambda t: (-t[0], t[1]))
        edges[a] = [b for _, b in scored[:k]]
    return edges


def test_knn_bfs_matches_python_reference(spark):
    from ocr_intern_spark.operators.similarity import (
        KNN_K,
        QUERY_VEC_ID,
        q_knn_bfs_hops,
    )

    edges = _knn_edges(spark, KNN_K)
    hops = {QUERY_VEC_ID: 0}
    dq = deque([QUERY_VEC_ID])
    while dq:
        v = dq.popleft()
        for w in edges[v]:
            if w not in hops:
                hops[w] = hops[v] + 1
                dq.append(w)

    got = {
        r.vec_id: r.hops for r in q_knn_bfs_hops(spark, SF_DIR).collect()
    }
    assert got == hops
    # non-vacuity: real depth (not a star) and real islands
    assert max(hops.values()) >= 3
    assert len(hops) < len(edges), "every vector reachable — island claim vacuous"


def test_knn_bfs_raises_past_hop_cap(spark, monkeypatch):
    """A frontier still active after BFS_MAX_HOPS rounds must raise,
    not silently truncate — the oracle caps at the same constant, so
    truncation would be an agreeing-but-wrong pair."""
    import pytest

    from ocr_intern_spark.operators import similarity

    monkeypatch.setattr(similarity, "BFS_MAX_HOPS", 2)
    with pytest.raises(RuntimeError, match="frontier still active"):
        similarity.q_knn_bfs_hops(spark, SF_DIR)
