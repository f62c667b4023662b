"""Embedding-outlier pruning: a full pure-Python reference pin over
the real sf0.001 embeddings (md5-sample centroids → rounded-cosine
argmax assignment → per-cell median/MAD → one-sided flag), plus a
planted-outlier fixture where exactly the junk vector must flag (and
a zero-jitter fixture exercising the MAD==0 fallback)."""

import hashlib
import math
import statistics
import tempfile

SF_DIR = "/root/testdata/sf0.001"


def _ref(vecs, ivf_cells, z):
    """vecs: {vec_id: [float]}. Mirrors the operator exactly."""
    order = sorted(vecs, key=lambda v: hashlib.md5(str(v).encode()).hexdigest())
    cents = [vecs[v] for v in order[:ivf_cells]]

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        da = math.sqrt(sum(float(x) * float(x) for x in a))
        db = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(num / (da * db), 6)

    best = {}
    for v, e in vecs.items():
        scored = [(cos(e, c), -cid) for cid, c in enumerate(cents)]
        cc, ncid = max(scored)
        best[v] = (-ncid, cc)
    med = {}
    by_cell: dict = {}
    for v, (cell, cc) in best.items():
        by_cell.setdefault(cell, []).append(cc)
    med = {cell: statistics.median(cs) for cell, cs in by_cell.items()}
    mad = {
        cell: statistics.median([abs(c - med[cell]) for c in cs])
        for cell, cs in by_cell.items()
    }
    out = {}
    for v, (cell, cc) in best.items():
        m, a = med[cell], mad[cell]
        rz = round((m - cc) / a, 6) if a > 0 else None
        flag = (m - cc) > z * a if a > 0 else cc < m
        out[v] = (cell, cc, m, a, rz, flag)
    return out


def test_outliers_match_python_reference(spark):
    from ocr_intern_spark.operators.similarity import (
        IVF_CELLS,
        OUTLIER_Z,
        q_embedding_outliers,
    )

    vecs = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    want = _ref(vecs, IVF_CELLS, OUTLIER_Z)
    got = q_embedding_outliers(spark, SF_DIR).collect()
    assert len(got) == len(want)
    n_flagged = 0
    for r in got:
        cell, cc, m, a, rz, flag = want[r.vec_id]
        assert (r.cell, r.is_outlier) == (cell, flag), r
        assert abs(r.centroid_cos - cc) < 1e-9
        assert abs(r.med - m) < 1e-9 and abs(r.mad - a) < 1e-9
        if rz is None:
            assert r.robust_z is None
        else:
            assert abs(r.robust_z - rz) < 1e-9
        n_flagged += flag
    # non-vacuity: a real embedding cloud has a low-cohesion tail,
    # and pruning must stay a tail operation, not a purge
    assert 0 < n_flagged < len(got) * 0.2


def _write_emb(spark, d, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")


def test_planted_outlier_is_flagged(spark):
    from ocr_intern_spark.operators.similarity import q_embedding_outliers

    # 40 vectors hugging e1 with tiny deterministic jitter (MAD > 0),
    # one orthogonal junk vector: exactly the junk vector flags
    rows = []
    for i in range(40):
        j = (i % 7) * 1e-3
        rows.append((i, [1.0, j, 0.0, 0.0], 0))
    rows.append((99, [0.0, 0.0, 1.0, 0.0], 0))
    with tempfile.TemporaryDirectory() as d:
        _write_emb(spark, d, rows)
        got = {r.vec_id: r for r in q_embedding_outliers(spark, d).collect()}
    flagged = {v for v, r in got.items() if r.is_outlier}
    assert 99 in flagged
    assert flagged - {99} <= set()  # nothing on-manifold flags


def test_mad_zero_fallback_flags_below_median(spark):
    from ocr_intern_spark.operators.similarity import q_embedding_outliers

    # all duplicates (cos to centroid identical → MAD==0) + one junk:
    # the fallback flags exactly the below-median vector
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(30)]
    rows.append((99, [0.0, 1.0, 0.0, 0.0], 0))
    with tempfile.TemporaryDirectory() as d:
        _write_emb(spark, d, rows)
        got = {r.vec_id: r for r in q_embedding_outliers(spark, d).collect()}
    junk = got[99]
    assert junk.mad == 0.0 and junk.robust_z is None and junk.is_outlier
    assert not any(r.is_outlier for v, r in got.items() if v != 99)
