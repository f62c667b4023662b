"""Pins for margin-based pair mining (Artetxe & Schwenk 2019): exact
semantics vs an independent pure-Python reference (raw parquet in,
integer micro-cos arithmetic re-derived from scratch), plus the
behavioral claim that justifies the margin — it changes which pairs
get mined relative to raw cosine (hub suppression)."""

from math import floor, sqrt

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    return {r.vec_id: [float(v) for v in r.embedding] for r in rows}


def _micro_cos(a, b) -> int:
    d = sum(x * y for x, y in zip(a, b))
    na = sqrt(sum(x * x for x in a))
    nb = sqrt(sum(y * y for y in b))
    return int(floor(d / (na * nb) * 1_000_000 + 0.5))


def _reference(emb, k, t):
    xs = sorted(i for i in emb if i % 2 == 0)
    ys = sorted(i for i in emb if i % 2 == 1)
    c = {}
    for a in xs:
        for b in ys:
            v = _micro_cos(emb[a], emb[b])
            if v > 0:
                c[(a, b)] = v
    def top_sum(side_key, items):
        out = {}
        for key, group in items.items():
            group.sort(key=lambda p: (-p[1], p[0]))
            top = group[:k]
            out[key] = (sum(v for _, v in top), len(top))
        return out
    fwd = {}
    bwd = {}
    for (a, b), v in c.items():
        fwd.setdefault(a, []).append((b, v))
        bwd.setdefault(b, []).append((a, v))
    sx = top_sum("a", fwd)
    sy = top_sum("b", bwd)
    mm = {
        (a, b): (v * (sx[a][1] + sy[b][1]) * 1_000_000)
        // (sx[a][0] + sy[b][0])
        for (a, b), v in c.items()
    }
    best_f = {}
    for (a, b), m in mm.items():
        cur = best_f.get(a)
        if cur is None or (-m, b) < (-cur[1], cur[0]):
            best_f[a] = (b, m)
    best_b = {}
    for (a, b), m in mm.items():
        cur = best_b.get(b)
        if cur is None or (-m, a) < (-cur[1], cur[0]):
            best_b[b] = (a, m)
    mined = {
        (a, b): m
        for a, (b, m) in best_f.items()
        if best_b.get(b, (None,))[0] == a and m >= t
    }
    return c, mm, best_f, best_b, mined


def test_margin_mining_matches_python_reference(spark):
    from ocr_intern_spark.operators.similarity import (
        MARGIN_K,
        MARGIN_T_MICROS,
        q_margin_pair_mining,
    )

    emb = _load(spark)
    c, mm, best_f, best_b, mined = _reference(
        emb, MARGIN_K, MARGIN_T_MICROS
    )
    got = {
        (r.x, r.y): r.margin_micros
        for r in q_margin_pair_mining(spark, SF_DIR).collect()
    }
    assert got == mined

    # non-vacuity: the mutual (forward-backward) filter drops some
    # forward bests, and the threshold drops some mutual pairs
    mutual = {
        (a, b)
        for a, (b, _m) in best_f.items()
        if best_b.get(b, (None,))[0] == a
    }
    assert len(mined) < len(mutual) < len(best_f)
    assert mined  # and something survives


def test_margin_changes_the_ranking_vs_raw_cosine(spark):
    """The point of the margin: for at least one source vector the
    best-margin neighbor differs from the best-raw-cosine neighbor
    (a hub was suppressed). If this ever goes vacuous the query is
    just cosine argmax with extra steps."""
    from ocr_intern_spark.operators.similarity import (
        MARGIN_K,
        MARGIN_T_MICROS,
    )

    emb = _load(spark)
    c, mm, best_f, _, _ = _reference(emb, MARGIN_K, MARGIN_T_MICROS)
    best_cos = {}
    for (a, b), v in c.items():
        cur = best_cos.get(a)
        if cur is None or (-v, b) < (-cur[1], cur[0]):
            best_cos[a] = (b, v)
    diverge = [
        a for a in best_f if best_cos[a][0] != best_f[a][0]
    ]
    assert diverge, "margin argmax identical to cosine argmax everywhere"
