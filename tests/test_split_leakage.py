"""Pins for the leakage-safe split: the eval-contamination guarantee
itself (no near-dup pair straddles a split), cluster-root consistency,
split fractions in sane bounds, and determinism across calls."""

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark):
    from ocr_intern_spark.operators.dedup import q_split_leakage_safe

    return q_split_leakage_safe(spark, SF_DIR).collect()


def test_no_pair_straddles_splits(spark):
    from ocr_intern_spark.operators.dedup import q_ngram_jaccard_pairs

    split_of = {r.doc_id: r.split for r in _rows(spark)}
    pairs = [
        (r.a, r.b)
        for r in q_ngram_jaccard_pairs(spark, SF_DIR).select("a", "b").collect()
    ]
    assert pairs  # guarantee is vacuous without near-dups
    for a, b in pairs:
        assert split_of[a] == split_of[b], (a, b)


def test_cluster_members_share_root_and_split(spark):
    rows = _rows(spark)
    by_root: dict = {}
    for r in rows:
        by_root.setdefault(r.root, set()).add(r.split)
    assert all(len(s) == 1 for s in by_root.values())
    assert any(
        len([r for r in rows if r.root == root]) > 1 for root in by_root
    )  # real multi-doc clusters exist


def test_split_fractions_and_determinism(spark):
    rows = _rows(spark)
    n = len(rows)
    frac = {
        s: sum(1 for r in rows if r.split == s) / n
        for s in ("train", "val", "test")
    }
    assert 0.6 < frac["train"] < 0.95
    assert 0 < frac["val"] < 0.25
    assert 0 < frac["test"] < 0.25
    again = {(r.doc_id, r.root, r.split) for r in _rows(spark)}
    assert again == {(r.doc_id, r.root, r.split) for r in rows}
