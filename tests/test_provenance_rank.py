"""Pure-Python reference pin for provenance PageRank, plus the
signal pins: ranks are NON-uniform (the reason this graph was chosen
over the regular near-dup pair graph), gram first-occurrence docs
outrank the teleport floor, and rank mass is conserved up to the
documented dangling-drop."""

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF_DIR = "/root/testdata/sf0.001"


def _r(x: float, places: int) -> float:
    """HALF_UP rounding on the exact binary value — what Spark's
    round() (BigDecimal HALF_UP) and DuckDB's round() do; Python's
    built-in round() is banker's and differs on exact .5 boundaries."""
    q = Decimal(1).scaleb(-places)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _ref_ranks(spark):
    from ocr_intern_spark.operators.curation import (
        DECON_NGRAM,
        PR_DAMP,
        PR_ROUNDS,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    first = {}
    doc_grams = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        toks = r.text.strip().lower().split()
        gs = {
            " ".join(toks[i : i + DECON_NGRAM])
            for i in range(len(toks) - DECON_NGRAM + 1)
        }
        doc_grams[r.doc_id] = gs
        for g in gs:
            first.setdefault(g, r.doc_id)
    edges = defaultdict(set)
    for d, gs in doc_grams.items():
        for g in gs:
            if first[g] != d:
                edges[d].add(first[g])
    n = len(rows)
    pr = {r.doc_id: 1.0 / n for r in rows}
    for _ in range(PR_ROUNDS):
        sums = defaultdict(float)
        for a, bs in edges.items():
            for b in bs:
                sums[b] += pr[a] / len(bs)
        pr = {
            d: _r((1 - PR_DAMP) / n + PR_DAMP * sums.get(d, 0.0), 9)
            for d in pr
        }
    return {d: _r(v, 6) for d, v in pr.items()}, edges, n


def test_provenance_rank_matches_python_reference(spark):
    """Exact equality for all docs except at-most-one-quantum slack
    where a float sits EXACTLY on a rounding boundary: the reference
    sums contributions in dict order, Spark in partition order, and a
    last-ulp difference flips the 1e-6 HALF_UP digit (observed: one
    doc at 0.0004275). The hard cross-engine check is the DuckDB
    oracle (hash-exact at sf0.001 and sf0.01); this pin verifies the
    SEMANTICS independently."""
    from ocr_intern_spark.operators.curation import q_provenance_rank

    want, _, _ = _ref_ranks(spark)
    got = {r.doc_id: r.pr for r in q_provenance_rank(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    off = {d for d in got if abs(got[d] - want[d]) > 1e-6 + 1e-12}
    assert not off, off
    exact = sum(1 for d in got if got[d] == want[d])
    assert exact >= len(got) - 2


def test_provenance_rank_is_nonuniform_and_sources_win(spark):
    from ocr_intern_spark.operators.curation import PR_DAMP, q_provenance_rank

    _, edges, n = _ref_ranks(spark)
    got = {r.doc_id: r.pr for r in q_provenance_rank(spark, SF_DIR).collect()}
    assert len(set(got.values())) >= 3  # irregular graph → real ordering
    floor = _r((1 - PR_DAMP) / n, 6)
    pointed_at = {b for bs in edges.values() for b in bs}
    assert pointed_at
    for b in pointed_at:
        assert got[b] > floor, b
    # docs nobody cites sit exactly on the teleport floor
    uncited = set(got) - pointed_at
    assert uncited and all(got[d] == floor for d in uncited)
