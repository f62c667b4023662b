"""Numpy-reference pin for contrastive hard-negative mining plus the
selection invariants: exactly one positive and NEG_K negatives per
anchor, the positive shares the anchor's label, negatives don't, and
every selected negative is at least as close as any unselected one."""

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    lbl = np.array([r.label for r in rows])
    return ids, V, lbl


def test_hard_negatives_matches_numpy_reference(spark):
    from ocr_intern_spark.operators.similarity import (
        NEG_K,
        NEG_QMOD,
        q_hard_negatives,
    )

    ids, V, lbl = _load(spark)
    nrm = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = np.round(nrm @ nrm.T, 6)
    want = []
    for qi in np.where(ids % NEG_QMOD == 0)[0]:
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-cos[qi, i], ids[i]),
        )
        pos = next(i for i in order if lbl[i] == lbl[qi])
        negs = [i for i in order if lbl[i] != lbl[qi]][:NEG_K]
        want.append((int(ids[qi]), "pos", 1, int(ids[pos])))
        want += [
            (int(ids[qi]), "neg", k + 1, int(ids[i]))
            for k, i in enumerate(negs)
        ]
    got = [
        (r.anchor, r.kind, r.rk, r.other)
        for r in q_hard_negatives(spark, SF_DIR).collect()
    ]
    assert sorted(got) == sorted(want)


def test_hard_negatives_label_invariants(spark):
    from ocr_intern_spark.operators.similarity import (
        NEG_K,
        q_hard_negatives,
    )

    ids, V, lbl = _load(spark)
    lbl_of = dict(zip(ids.tolist(), lbl.tolist()))
    rows = q_hard_negatives(spark, SF_DIR).collect()
    by_anchor: dict = {}
    for r in rows:
        by_anchor.setdefault(r.anchor, []).append(r)
    assert by_anchor
    for anchor, rs in by_anchor.items():
        kinds = sorted(r.kind for r in rs)
        assert kinds == ["neg"] * NEG_K + ["pos"]
        for r in rs:
            same = lbl_of[r.other] == lbl_of[anchor]
            assert same == (r.kind == "pos"), (anchor, r.other)
