"""Corpus-law fits and the event transition matrix: pure-Python OLS
references over the real sf0.001 tables, plus hand-built fixtures
with closed-form answers (an exact power-law corpus fits Zipf slope
−1 with r²≈1; a deterministic event chain yields probability-1
transition rows; a doc whose successor is missing contributes no
pair)."""

import math
import tempfile
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _ols(pts):
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return slope, intercept, r2


def _toks(text):
    return [t for t in text.strip().lower().split() if t]


def test_zipf_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import q_zipf_fit

    cnt: Counter = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        cnt.update(_toks(r.text))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.log(i + 1), math.log(c)) for i, (_t, c) in enumerate(ranked)
    ]
    slope, intercept, r2 = _ols(pts)
    got = q_zipf_fit(spark, SF_DIR).collect()[0]
    assert got.vocab_size == len(ranked)
    assert abs(got.zipf_slope - slope) < 2e-6
    assert abs(got.zipf_intercept - intercept) < 2e-6
    assert abs(got.r2 - r2) < 2e-6
    assert got.zipf_slope < 0  # frequency decreases with rank


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")


def test_zipf_exact_power_law_fits_slope_minus_one(spark):
    from ocr_intern_spark.functions.text import q_zipf_fit

    # token w_r appears exactly round(720/r) times: a perfect Zipf
    # sample up to rank rounding — slope ≈ −1, r² ≈ 1
    words = []
    for r in range(1, 13):
        words += [f"w{r:02d}"] * round(720 / r)
    text = " ".join(words)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, [("s", text)])
        got = q_zipf_fit(spark, d).collect()[0]
    assert got.vocab_size == 12
    assert abs(got.zipf_slope - (-1.0)) < 0.01
    assert got.r2 > 0.9999


def test_heaps_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import (
        HEAPS_BUCKETS,
        q_heaps_fit,
    )

    docs = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    mx = max(i for i, _ in docs)
    per_inst: Counter = Counter()
    first: dict = {}
    for i, text in docs:
        b = math.floor(i * HEAPS_BUCKETS / (mx + 1))
        ts = _toks(text)
        for k in range(len(ts) - 1):
            g = f"{ts[k]} {ts[k + 1]}"
            per_inst[b] += 1
            if g not in first or first[g] > b:
                first[g] = b
    new_v: Counter = Counter(first.values())
    buckets = sorted(per_inst)
    cum_g = cum_v = 0
    growth = []
    for b in buckets:
        cum_g += per_inst[b]
        cum_v += new_v.get(b, 0)
        growth.append((b, cum_g, cum_v))
    slope, intercept, _ = _ols(
        [(math.log(g), math.log(v)) for _b, g, v in growth]
    )
    got = q_heaps_fit(spark, SF_DIR).collect()
    assert [(r.bucket, r.cum_grams, r.cum_vocab) for r in got] == growth
    assert abs(got[0].heaps_beta - slope) < 2e-6
    assert abs(got[0].heaps_k - math.exp(intercept)) < 1e-4
    # vocabulary growth is monotone and actually grows
    assert growth[-1][2] > growth[0][2] > 0


def test_transition_matrix_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        q_events_transition_matrix,
    )

    ev = sorted(
        (
            (r.user_id, r.ts, r.event_id, r.event_type)
            for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
        ),
    )
    pairs: Counter = Counter()
    by_user: dict = {}
    for u, ts, eid, et in ev:
        by_user.setdefault(u, []).append(et)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _b), n in pairs.items():
        tot[a] += n
    got = q_events_transition_matrix(spark, SF_DIR).collect()
    assert len(got) == len(pairs)
    for r in got:
        n = pairs[(r.src, r.dst)]
        assert r.n == n
        assert abs(r.p - round(n / tot[r.src], 6)) < 1e-12
    # rows per src sum to 1
    by_src: Counter = Counter()
    for r in got:
        by_src[r.src] += r.p
    assert all(abs(v - 1.0) < 1e-4 for v in by_src.values())


def test_transition_matrix_deterministic_chain(spark):
    import datetime

    from ocr_intern_spark.operators.analytics import (
        q_events_transition_matrix,
    )

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # user 1: a→b→a→b→a (a→b ×2, b→a ×2); user 2: single event → no pair
    for i, et in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((eid, t0 + datetime.timedelta(minutes=i), 1, et, 1.0, "{}"))
        eid += 1
    rows.append((eid, t0, 2, "c", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {
            (r.src, r.dst): (r.n, r.p)
            for r in q_events_transition_matrix(spark, d).collect()
        }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (2, 1.0)}
