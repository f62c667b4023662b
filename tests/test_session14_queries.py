"""Pure-Python reference pins for the session-14 operators. Each
reference is an independent stdlib recompute, never a re-run of the
Spark code."""

import datetime


def _write(spark, tmp_path, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )
    return str(tmp_path)


def test_survival_km_reference(spark, tmp_path):
    """Kaplan-Meier on a controlled order history: serial recompute
    of the risk table and the ppm floor recurrence, with a same-day
    repeat order (gap 0) and right-censoring at the anchor."""
    from ocr_intern_spark.operators.analytics import q_customer_survival_km

    ts = datetime.datetime
    rows = [
        # cust 1: gaps 4 and 6, then censored at anchor (0 days)
        (101, 1, ts(2024, 1, 1)),
        (102, 1, ts(2024, 1, 5)),
        (103, 1, ts(2024, 1, 11)),
        # cust 2: same-day repeat (gap 0, tie-break by orderkey),
        # then gap 6, censored 3 days before anchor
        (201, 2, ts(2024, 1, 2, 9)),
        (202, 2, ts(2024, 1, 2, 15)),
        (203, 2, ts(2024, 1, 8)),
        # cust 3: single order, pure censor 8 days
        (301, 3, ts(2024, 1, 3)),
    ]
    sf = _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )

    # independent reference ------------------------------------------------
    anchor = max(r[2].date() for r in rows)
    durations = []  # (t, is_event)
    by_cust = {}
    for k, c, d in rows:
        by_cust.setdefault(c, []).append((d, k))
    for c, lst in by_cust.items():
        lst.sort()
        for (d0, _), (d1, _) in zip(lst, lst[1:]):
            durations.append(((d1.date() - d0.date()).days, 1))
        durations.append(((anchor - lst[-1][0].date()).days, 0))
    risk = {}
    for t, ev in durations:
        d, c = risk.get(t, (0, 0))
        risk[t] = (d + ev, c + (1 - ev))
    expect = []
    rem, s = len(durations), 1_000_000
    for t in sorted(risk):
        d, c = risk[t]
        if d > 0:
            s = (s * (rem - d)) // rem
        expect.append((t, rem, d, c, s))
        rem -= d + c

    got = [
        (r.t_days, r.n_risk, r.d_events, r.c_censored, r.s_ppm)
        for r in q_customer_survival_km(spark, sf).collect()
    ]
    assert got == expect
    # sanity on the scenario itself: gap-0 event present, censors at
    # three distinct durations, survival strictly decreasing at events
    assert risk[0][0] == 1 and sum(c for _, c in risk.values()) == 3


def test_events_acf_reference(spark, tmp_path):
    """ACF on a controlled daily series with a gap day: integer
    recompute of scaled deviations, lag numerators, and the
    floor-ppm ratio (including a negative numerator)."""
    from ocr_intern_spark.operators.analytics import (
        ACF_MAX_LAG,
        q_events_acf,
    )

    ts = datetime.datetime
    counts = {1: 3, 2: 1, 4: 2, 5: 5, 6: 1}  # day 3 is a gap (0)
    rows = []
    eid = 0
    for day, n in counts.items():
        for i in range(n):
            eid += 1
            rows.append((eid, ts(2024, 2, day, 8, i)))
    sf = _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp")

    series = [counts.get(d, 0) for d in range(1, 7)]
    n, s = len(series), sum(series)
    dev = [n * c - s for c in series]
    den = sum(d * d for d in dev)
    expect = []
    for lag in range(1, ACF_MAX_LAG + 1):
        pairs = [
            dev[i] * dev[i + lag] for i in range(n - lag) if i + lag < n
        ]
        if not pairs:
            continue  # no overlapping pairs -> no row, both engines
        num = sum(pairs)
        ppm = (num * 1_000_000) // den  # python // floors, matching
        expect.append((lag, str(num), str(den), ppm))

    got = [
        (r.lag, r.num_str, r.den_str, r.acf_ppm)
        for r in q_events_acf(spark, sf).collect()
    ]
    assert got == expect
    assert any(int(num) < 0 for _, num, _, _ in expect)  # non-vacuous


def test_delete_vector_reference(spark, tmp_path):
    """MoR positional-delete apply on a controlled two-file layout
    with duplicate (orderkey, linenumber) rows: serial recompute of
    position assignment, DV masking, and the certificate."""
    from ocr_intern_spark.operators.maintenance import (
        DV_FILE_KEYS,
        q_delete_vector_apply,
    )

    # (l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, qty)
    rows = [
        (1, 1, 10, 100, "N", 5.0),
        (1, 1, 12, 103, "R", 7.0),  # dup (okey, line): pos by partkey
        (1, 2, 11, 101, "R", 3.0),  # deleted iff (11+101)%5==2 -> 112%5=2 ✓
        (2, 1, 14, 103, "R", 9.0),  # (14+103)%5 = 117%5 = 2 ✓ deleted
        (DV_FILE_KEYS, 1, 20, 200, "N", 4.0),   # second file
        (DV_FILE_KEYS, 2, 21, 201, "R", 6.0),   # (21+201)%5=2 ✓ deleted
        (DV_FILE_KEYS + 1, 1, 22, 202, "A", 8.0),
    ]
    sf = _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_suppkey long, l_returnflag string, l_quantity double",
    )

    files = {}
    for ok, ln, pk, sk, rf, q in rows:
        files.setdefault(ok // DV_FILE_KEYS, []).append((ok, ln, pk, sk, rf, q))
    expect = []
    for fid in sorted(files):
        rs = sorted(files[fid])  # total order = (okey, line, part, supp)
        deleted = [rf == "R" and (pk + sk) % 5 == 2 for _, _, pk, sk, rf, _ in rs]
        n_rows, n_del = len(rs), sum(deleted)
        live_q = sum(int(q * 100) for (_, _, _, _, _, q), d in zip(rs, deleted) if not d)
        expect.append(
            (fid, n_rows, n_del, n_rows - n_del, n_rows - n_del, live_q, live_q, True)
        )

    got = [tuple(r) for r in q_delete_vector_apply(spark, sf).collect()]
    assert got == expect
    # non-vacuous: at least one delete in each file class and one dup key
    assert sum(e[2] for e in expect) == 3


def _shingle_ref(text, n=3):
    toks = text.strip().lower().split()
    toks = [w for i, w in enumerate(toks) if i % 7 != 0]
    out = set()
    for i in range(0, max(len(toks) - n, 0) + 1):
        s = " ".join(toks[i : i + n])
        if s:
            out.add(s)
    return out


def test_ppjoin_prefix_reference(spark, tmp_path):
    """PPJoin output equals the ground-truth Jaccard>=1/2 pair set on
    a controlled corpus (prefix filtering is lossless), with exact
    integer ppm values recomputed serially."""
    from ocr_intern_spark.operators.dedup import q_ppjoin_prefix_pairs

    w = [f"w{i:02d}" for i in range(40)]
    docs = {
        1: " ".join(w[:21]),                    # base
        2: " ".join(w[:18] + w[30:33]),          # near-dup of 1
        3: " ".join(w[20:40]),                   # overlaps 1 barely
        4: " ".join(reversed(w[:21])),           # same words, other order
        5: " ".join(w[:21]),                     # exact dup of 1
    }
    rows = [(d, t, "en", "s", len(t)) for d, t in docs.items()]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sets = {d: _shingle_ref(t) for d, t in docs.items()}
    expect = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - common
            if common and 2 * common >= union:
                expect.append(
                    (a, b, common, len(sets[a]), len(sets[b]),
                     common * 1_000_000 // union)
                )
    got = [tuple(r) for r in q_ppjoin_prefix_pairs(spark, sf).collect()]
    assert sorted(got) == sorted(expect)
    # non-vacuous: an exact-dup pair and a partial near-dup pair, and
    # at least one candidate-killed pair (doc 3 overlaps but < tau)
    assert (1, 5) in {(a, b) for a, b, *_ in expect}
    assert any(j < 1_000_000 for *_, j in expect)


def test_bloom_fpr_reference(spark, tmp_path):
    """Portable Bloom filter recomputed with hashlib: identical bit
    set, identical audit counts, and the one-sided-error law (every
    present probe is bloom-positive)."""
    import hashlib
    import re

    from ocr_intern_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M,
        q_bloom_fpr_audit,
    )

    texts = {
        0: "alpha beta gamma",
        2: "delta epsilon zeta",
        4: "eta theta iota",
        1: "alpha beta gamma",      # present probe (dup of doc 0)
        3: "kappa lambda mu",       # absent probe
        5: "nu xi omicron",         # absent probe
    }
    rows = [(d, t, "en", "s", len(t)) for d, t in texts.items()]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def fp(t):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        return hashlib.md5(norm.encode()).hexdigest()

    def pos(f):
        return [
            int(hashlib.md5(f"{i}:{f}".encode()).hexdigest()[:8], 16)
            % BLOOM_M
            for i in range(BLOOM_K)
        ]

    train = {fp(texts[d]) for d in texts if d % 2 == 0}
    probe = {fp(texts[d]) for d in texts if d % 2 == 1}
    bits = sorted({b for f in train for b in pos(f)})
    bits_md5 = hashlib.md5(",".join(map(str, bits)).encode()).hexdigest()
    positive = {f for f in probe if all(b in set(bits) for b in pos(f))}
    present = probe & train
    n_fp = len(positive - present)
    denom = len(probe) - len(present)
    expect = (
        BLOOM_M, BLOOM_K, len(train), len(bits), bits_md5, len(probe),
        len(positive), len(present), n_fp,
        len(bits) * 1_000_000 // BLOOM_M,
        (n_fp * 1_000_000 // denom) if denom > 0 else 0,
    )
    got = tuple(q_bloom_fpr_audit(spark, sf).collect()[0])
    assert got == expect
    # one-sided error: present probes are always positive
    assert present <= positive


def test_attribution_reference(spark, tmp_path):
    """Multi-touch attribution on a controlled event log: remainder
    goes to the last touch, out-of-window and post-purchase clicks
    are excluded, and credit conservation holds."""
    from ocr_intern_spark.operators.analytics import q_events_attribution

    ts = datetime.datetime
    rows = [
        # user 1: purchase with 3 touches (1e6 % 3 = 1 -> last touch)
        (1, ts(2024, 3, 1, 10), 1, "click", 0.0, "{}"),
        (2, ts(2024, 3, 2, 10), 1, "click", 0.0, "{}"),
        (3, ts(2024, 3, 3, 10), 1, "click", 0.0, "{}"),
        (4, ts(2024, 3, 4, 10), 1, "purchase", 1.0, "{}"),
        # user 2: click 8 days before purchase (outside window) plus
        # a click AFTER the purchase -> zero-touch conversion (absent)
        (5, ts(2024, 3, 1, 0), 2, "click", 0.0, "{}"),
        (6, ts(2024, 3, 9, 1), 2, "purchase", 1.0, "{}"),
        (7, ts(2024, 3, 9, 2), 2, "click", 0.0, "{}"),
        # user 3: one click shared by two purchases (credited twice)
        (8, ts(2024, 3, 10, 9), 3, "click", 0.0, "{}"),
        (9, ts(2024, 3, 10, 12), 3, "purchase", 1.0, "{}"),
        (10, ts(2024, 3, 12, 12), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = [tuple(r) for r in q_events_attribution(spark, sf).collect()]
    expect = [
        # day, n_touches, first_convs, last_convs, linear_ppm
        ("2024-03-01", 1, 1, 0, 333333),
        ("2024-03-02", 1, 0, 0, 333333),
        ("2024-03-03", 1, 0, 1, 333334),
        ("2024-03-10", 2, 2, 2, 2_000_000),
    ]
    assert got == expect
    n_attributed = 3  # purchases 4, 9, 10; purchase 6 unattributed
    assert sum(r[2] for r in got) == n_attributed
    assert sum(r[3] for r in got) == n_attributed
    assert sum(r[4] for r in got) == 1_000_000 * n_attributed


def _hilbert_ref(x, y, order=8):
    d, s = 0, 1 << (order - 1)
    while s >= 1:
        rx, ry = x // s, y // s
        xl, yl = x % s, y % s
        d += s * s * (ry if rx == 0 else 3 - ry)
        if ry == 0:
            x, y = (s - 1 - yl, s - 1 - xl) if rx == 1 else (yl, xl)
        else:
            x, y = xl, yl
        s //= 2
    return d


def test_hilbert_adjacency_law():
    """The pure-arithmetic recurrence IS a Hilbert curve: on the full
    16x16 grid it is a bijection onto 0..255 and consecutive curve
    positions are manhattan-adjacent (step exactly 1) — the locality
    law Z-order violates (its worst step on the same grid jumps)."""
    n = 16
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[_hilbert_ref(x, y, order=4)] = (x, y)
    assert sorted(pos) == list(range(n * n))
    steps = [
        abs(pos[d][0] - pos[d - 1][0]) + abs(pos[d][1] - pos[d - 1][1])
        for d in range(1, n * n)
    ]
    assert set(steps) == {1}

    def morton(x, y):
        m = 0
        for b in range(4):
            m += ((x >> b) & 1) << (2 * b)
            m += ((y >> b) & 1) << (2 * b + 1)
        return m

    mpos = {morton(x, y): (x, y) for x in range(n) for y in range(n)}
    msteps = [
        abs(mpos[d][0] - mpos[d - 1][0]) + abs(mpos[d][1] - mpos[d - 1][1])
        for d in range(1, n * n)
    ]
    assert max(msteps) > 1  # Z-order's diagonal jumps


def test_hilbert_order_reference(spark, tmp_path):
    """Spark fold == the validated Python recurrence on the md5
    coordinates, morton == the bit-interleave reference."""
    import hashlib

    from ocr_intern_spark.operators.maintenance import (
        HILBERT_N,
        HILBERT_ORDER,
        q_hilbert_order,
    )

    rows = [(d, f"t{d}", "en", "s", 2) for d in range(120)]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def coord(d, ax):
        return int(hashlib.md5(f"{d}{ax}".encode()).hexdigest()[:8], 16) % HILBERT_N

    def morton(x, y):
        m = 0
        for b in range(HILBERT_ORDER):
            m += ((x >> b) & 1) << (2 * b)
            m += ((y >> b) & 1) << (2 * b + 1)
        return m

    expect = []
    for d in range(120):
        x, y = coord(d, "hx"), coord(d, "hy")
        expect.append((d, x, y, _hilbert_ref(x, y, HILBERT_ORDER), morton(x, y)))
    got = [tuple(r) for r in q_hilbert_order(spark, sf).collect()]
    assert got == expect


def test_geo_grid_join_reference(spark, tmp_path):
    """Grid join == serial all-pairs on md5 coordinates, including a
    cross-cell pair (the 3x3 cover case) and an excluded pair just
    outside R."""
    import hashlib

    from ocr_intern_spark.operators.similarity import (
        GEO_R,
        GEO_SPAN,
        q_geo_grid_join,
    )

    rows = [(d, f"t{d}", "en", "s", 2) for d in range(200)]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def coord(d, ax):
        return int(hashlib.md5(f"{d}{ax}".encode()).hexdigest()[:8], 16) % GEO_SPAN

    pts = {d: (coord(d, "x"), coord(d, "y")) for d in range(200)}
    allp = []
    cross_cell = 0
    for a in pts:
        for b in pts:
            if a < b:
                d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
                if d2 <= GEO_R * GEO_R:
                    allp.append((d2, a, b))
                    if (
                        pts[a][0] // GEO_R != pts[b][0] // GEO_R
                        or pts[a][1] // GEO_R != pts[b][1] // GEO_R
                    ):
                        cross_cell += 1
    expect = [(a, b, d2) for d2, a, b in sorted(allp)[:500]]
    got = [tuple(r) for r in q_geo_grid_join(spark, sf).collect()]
    assert got == expect
    assert cross_cell > 0  # the 3x3 neighborhood cover is exercised


def test_benford_reference(spark, tmp_path):
    """Benford audit on a constructed price list: serial recompute,
    zero-count digit reported through the spine, constants sum to
    one million."""
    from ocr_intern_spark.operators.analytics import (
        BENFORD_PPM,
        q_orders_benford_audit,
    )

    ts = datetime.datetime
    # cents first digits: 1,1,1,2,3,9 — digits 4..8 never occur
    prices = [1.23, 150.0, 0.19, 2.5, 399.99, 0.09]
    rows = [
        (i, 1, "O", p, ts(2024, 1, 1), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    from collections import Counter

    import math

    # mirror the engines bit-for-bit: IEEE double multiply then floor
    # (0.19 * 100 is 19.000000000000004, NOT 18.999…)
    cnt = Counter(str(math.floor(p * 100))[0] for p in prices)
    total = sum(cnt.values())
    expect = []
    for d in range(1, 10):
        n = cnt.get(str(d), 0)
        obs = n * 1_000_000 // total
        expect.append((d, n, obs, BENFORD_PPM[d - 1], obs - BENFORD_PPM[d - 1]))
    got = [tuple(r) for r in q_orders_benford_audit(spark, sf).collect()]
    assert got == expect
    assert any(n == 0 for _, n, *_ in expect)  # spine zero-fill exercised


def test_hll_sketch_reference(spark, tmp_path):
    """Portable HLL recomputed with hashlib: identical registers,
    digest, scaled harmonic sum, and raw estimate."""
    import hashlib

    from ocr_intern_spark.operators.analytics import (
        HLL_A,
        HLL_M,
        HLL_W,
        q_events_hll_sketch,
    )

    ts = datetime.datetime
    uids = [3, 7, 7, 11, 400, 401, 402, 9999, 12345]
    rows = [
        (i, ts(2024, 1, 1 + i % 5), uid, "click", 0.0, "{}")
        for i, uid in enumerate(uids)
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    regs = {}
    for uid in uids:
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)
        j, w = h % HLL_M, (h // HLL_M) % HLL_W
        r = 33 - w.bit_length()  # bit_length(0) = 0 -> rank 33
        regs[j] = max(regs.get(j, 0), r)
    s_scaled = sum(1 << (24 - min(m, 24)) for m in regs.values())
    s_scaled += (HLL_M - len(regs)) * (1 << 24)
    digest = hashlib.md5(
        ",".join(f"{j}:{regs[j]}" for j in sorted(regs)).encode()
    ).hexdigest()
    est = HLL_A // s_scaled // 1_000_000
    n_exact = len(set(uids))
    expect = (
        HLL_M, n_exact, len(regs), s_scaled, est, est - n_exact, digest
    )
    got = tuple(q_events_hll_sketch(spark, sf).collect()[0])
    assert got == expect
    assert len(regs) > 1 and max(regs.values()) > 1  # non-vacuous


def test_seasonal_decompose_reference(spark, tmp_path):
    """Additive weekly decomposition on a planted 21-day pattern:
    serial recompute of the centered 7-day trend sums, scaled
    deviations, per-dow sums, and the negative-numerator floor."""
    import math

    from ocr_intern_spark.operators.analytics import (
        SD_HALF,
        q_orders_seasonal_decompose,
    )

    ts = datetime.datetime
    # 21 consecutive days, revenue = weekly sawtooth + trend
    prices = {}
    for i in range(21):
        prices[i] = 100.0 + 10.0 * (i % 7) + i  # dollars
    rows = [
        (i, 1, "O", p, ts(2024, 5, 1 + i), "1-URGENT")
        for i, p in prices.items()
    ]
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    r = [math.floor(prices[i] * 100) for i in range(21)]
    epoch0 = (datetime.date(2024, 5, 1) - datetime.date(1970, 1, 1)).days
    per_dow = {}
    width = 2 * SD_HALF + 1
    for t in range(SD_HALF, 21 - SD_HALF):
        trend = sum(r[t - SD_HALF : t + SD_HALF + 1])
        d = width * r[t] - trend
        dow = (epoch0 + t) % 7
        n, s = per_dow.get(dow, (0, 0))
        per_dow[dow] = (n + 1, s + d)
    expect = []
    for dow in sorted(per_dow):
        n, s = per_dow[dow]
        expect.append((dow, n, str(s), (s * 1_000_000) // (n * width)))
    got = [tuple(r_) for r_ in q_orders_seasonal_decompose(spark, sf).collect()]
    assert got == expect
    assert any(s.startswith("-") for _, _, s, _ in expect)  # negative dev


def test_record_linkage_reference(spark, tmp_path):
    """Fellegi-Sunter matcher on a controlled registry exercising
    every weight branch, the stolen-name decoy, and the missing
    neighbor edge; serial recompute of scores and tiers."""
    import math
    import re

    from ocr_intern_spark.operators.dedup import (
        RL_OFFSET,
        RL_T_MATCH,
        RL_T_POSSIBLE,
        RL_W_BAL_EXACT,
        RL_W_BAL_MISS,
        RL_W_BAL_NEAR,
        RL_W_NAT_EQ,
        RL_W_NAT_NE,
        RL_W_SEG_EQ,
        RL_W_SEG_NE,
        q_record_linkage,
    )

    cust = [  # (custkey, name, nationkey, acctbal, seg)
        (4, "Ann Lee #4", 3, 10.00, "AUTO"),      # %4=0: near bal
        (5, "Bo Kim #5", 7, 20.00, "HOUSE"),      # %4=1 big bal, %5 nat
        (6, "CyFox #6", 9, -5.11, "AUTO"),       # %6: null seg, neg bal
        (7, "Di Oh #7", 11, 30.00, "SHIP"),       # clean exact match
        (9, "Ed Wu #9", 13, 40.00, "AUTO"),       # %9: steals 10's name
        (10, "Fay Ng #10", 15, 50.00, "SHIP"),    # victim of 9's theft
    ]
    rows = [(k, n, nat, bal, seg) for k, n, nat, bal, seg in cust]
    sf = _write(
        spark, tmp_path, "customer", rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )

    def key(name):
        return re.sub(r"[^a-z0-9]", "", name.lower())

    base = {
        k: (key(n), math.floor(b * 100), nat, seg)
        for k, n, nat, b, seg in cust
    }
    byk = {k: v for k, v in base.items()}
    expect = []
    for k, (nk, cents, nat, seg) in base.items():
        # web perturbation
        wnk = nk
        if k % 9 == 0 and (k + 1) in byk:
            wnk = byk[k + 1][0]
        wc = cents + (7 if k % 4 == 0 else 2500 if k % 4 == 1 else 0)
        wn = (nat + 1) % 25 if k % 5 == 0 else nat
        ws = None if k % 6 == 0 else seg
        # block: find crm records with this key
        for ck, (cnk, ccents, cnat, cseg) in base.items():
            if cnk != wnk:
                continue
            delta = abs(ccents - wc)
            sc = (
                RL_W_BAL_EXACT
                if delta == 0
                else RL_W_BAL_NEAR if delta <= 10 else RL_W_BAL_MISS
            )
            sc += 0 if ws is None else (RL_W_SEG_EQ if ws == cseg else RL_W_SEG_NE)
            sc += RL_W_NAT_EQ if cnat == wn else RL_W_NAT_NE
            tier = (
                "match"
                if sc >= RL_T_MATCH
                else "possible" if sc >= RL_T_POSSIBLE else "reject"
            )
            expect.append((ck, k + RL_OFFSET, sc, tier, ck == k))
    expect.sort()
    got = [tuple(r) for r in q_record_linkage(spark, sf).collect()]
    assert got == expect
    tiers = {t for _, _, _, t, _ in expect}
    truths = {it for *_, it in expect}
    assert tiers == {"match", "possible", "reject"} and truths == {True, False}
    # customer 9's own record is a MISS (its name was stolen): no pair
    assert not any(a == 9 and it for a, _, _, _, it in expect)


def test_abtest_chi2_reference(spark, tmp_path):
    """Exact rational chi-square on a constructed 2x2, plus the
    degenerate-margin guard (everyone converts -> 0, not an error)."""
    from ocr_intern_spark.operators.analytics import (
        CHI2_CRIT_MILLI,
        q_events_abtest_chi2,
    )

    ts = datetime.datetime

    def mk(rows):
        return [
            (i, ts(2024, 6, 1 + i % 20), uid, et, 0.0, "{}")
            for i, (uid, et) in enumerate(rows)
        ]

    # variant A (even uids): 30 users, 24 convert; B (odd): 30, 6
    rows = []
    for u in range(60):
        uid = u * 2 if u < 30 else (u - 30) * 2 + 1
        conv = (u < 24) or (u >= 30 and u < 36)
        rows.append((uid, "purchase" if conv else "view"))
        rows.append((uid, "click"))
    sf = _write(
        spark, tmp_path, "events", mk(rows),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    a, b, c, d = 24, 6, 6, 24
    n = a + b + c + d
    num = (a * d - b * c) ** 2 * n * 1000
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = num // den
    expect = (
        n, a, b, c, d,
        a * 1_000_000 // (a + b),
        c * 1_000_000 // (c + d),
        c * 1_000_000 // (c + d) - a * 1_000_000 // (a + b),
        chi2,
        chi2 >= CHI2_CRIT_MILLI,
    )
    got = tuple(q_events_abtest_chi2(spark, sf).collect()[0])
    assert got == expect
    assert got[-1] is True  # 80% vs 20% on 60 users is significant

    # degenerate: every user converts -> guard reports 0 / False
    rows2 = [(u, "purchase") for u in range(8)]
    sf2 = _write(
        spark, tmp_path / "deg", "events", mk(rows2),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = q_events_abtest_chi2(spark, sf2).collect()[0]
    assert row.chi2_milli == 0 and row.significant is False


def test_path_trigrams_reference(spark, tmp_path):
    """Trigram mining on controlled sessions: a >30-minute gap must
    break the path, ties order by event_id, shares are floor ppm."""
    from collections import Counter

    from ocr_intern_spark.operators.analytics import q_events_path_trigrams

    ts = datetime.datetime
    rows = [
        # user 1, session 1: view>click>purchase>click (2 trigrams)
        (1, ts(2024, 7, 1, 10, 0), 1, "view", 0.0, "{}"),
        (2, ts(2024, 7, 1, 10, 5), 1, "click", 0.0, "{}"),
        (3, ts(2024, 7, 1, 10, 10), 1, "purchase", 0.0, "{}"),
        (4, ts(2024, 7, 1, 10, 15), 1, "click", 0.0, "{}"),
        # user 1, session 2 (41-minute gap): error>view>click
        (5, ts(2024, 7, 1, 10, 56), 1, "error", 0.0, "{}"),
        (6, ts(2024, 7, 1, 11, 0), 1, "view", 0.0, "{}"),
        (7, ts(2024, 7, 1, 11, 1), 1, "click", 0.0, "{}"),
        # user 2: same-timestamp tie ordered by event_id
        (8, ts(2024, 7, 1, 9, 0), 2, "view", 0.0, "{}"),
        (9, ts(2024, 7, 1, 9, 0), 2, "click", 0.0, "{}"),
        (10, ts(2024, 7, 1, 9, 1), 2, "view", 0.0, "{}"),
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    cnt = Counter(
        ["view>click>purchase", "click>purchase>click", "error>view>click",
         "view>click>view"]
    )
    total = sum(cnt.values())
    expect = sorted(
        ((p, n, n * 1_000_000 // total) for p, n in cnt.items()),
        key=lambda r: (-r[1], r[0]),
    )
    got = [tuple(r) for r in q_events_path_trigrams(spark, sf).collect()]
    assert got == expect
    # the gap REALLY broke the path: no trigram crosses the sessions
    assert not any("click>error" in p or "purchase>click>error" == p
                   for p, _, _ in got)


def test_backlog_aging_reference(spark, tmp_path):
    """Aging buckets on controlled open orders: boundary ages land in
    the lower bucket, closed orders excluded, cents exact."""
    import math

    from ocr_intern_spark.operators.analytics import q_orders_backlog_aging

    ts = datetime.datetime
    anchor = datetime.date(2024, 12, 31)
    mk = lambda age: ts(*(anchor - datetime.timedelta(days=age)).timetuple()[:3])
    orders = [  # (key, status, age, price)
        (1, "O", 0, 10.00),
        (2, "O", 30, 20.00),    # boundary -> 000-030
        (3, "O", 31, 30.00),
        (4, "O", 90, 40.00),    # boundary -> 031-090
        (5, "O", 91, 50.55),
        (6, "O", 365, 60.00),   # boundary -> 091-365
        (7, "O", 366, 70.00),
        (8, "F", 5, 99.99),     # closed: excluded
        (9, "O", 400, 80.01),
    ]
    rows = [
        (k, 1, st, p, mk(age), "1-URGENT") for k, st, age, p in orders
    ]
    # ensure the anchor comes from the corpus max date (a closed order)
    rows.append((10, 1, "F", 1.0, ts(2024, 12, 31), "1-URGENT"))
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    buckets = {}
    for k, st, age, p in orders:
        if st != "O":
            continue
        lbl = ("000-030" if age <= 30 else "031-090" if age <= 90
               else "091-365" if age <= 365 else "365+")
        n, s = buckets.get(lbl, (0, 0))
        buckets[lbl] = (n + 1, s + math.floor(p * 100))
    expect = [(lbl, n, str(s)) for lbl, (n, s) in sorted(buckets.items())]
    got = [tuple(r) for r in q_orders_backlog_aging(spark, sf).collect()]
    assert got == expect
    assert len(expect) == 4


def test_stream_hll_equals_batch(spark, tmp_path):
    """The streaming max-merge sketch must equal the batch sketch
    row-for-row (the swap proof the oracle also enforces), on a
    corpus large enough to span several micro-batches."""
    from ocr_intern_spark.operators.analytics import q_events_hll_sketch
    from ocr_intern_spark.streaming.stream_queries import q_stream_hll_sketch

    ts = datetime.datetime
    rows = [
        (i, ts(2024, 8, 1 + i % 25), i % 97, "click", 0.0, "{}")
        for i in range(400)
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    batch = [tuple(r) for r in q_events_hll_sketch(spark, sf).collect()]
    stream = [tuple(r) for r in q_stream_hll_sketch(spark, sf).collect()]
    assert stream == batch
    assert batch[0][1] == 97  # n_exact audit column


def test_cuped_reference(spark, tmp_path):
    """CUPED algebra recomputed with Fractions on a planted
    correlated corpus: theta, rho-squared, and the adjusted-lift
    rational must match the digit strings exactly."""
    from fractions import Fraction

    from ocr_intern_spark.operators.analytics import q_events_cuped_adjust

    ts = datetime.datetime
    # 10 users over days 1..10 (mid = day 6): pre activity x_u drives
    # post purchases y_u (strong covariate), variant = parity
    rows = []
    eid = 0
    import hashlib

    for u in range(10):
        x = 2 + (u * 7) % 5                      # pre-period events
        y = x // 2 + (1 if u % 2 else 0)         # post purchases
        for i in range(x):
            eid += 1
            rows.append((eid, ts(2024, 9, 1 + (i % 5), 8), u, "view"))
        for i in range(y):
            eid += 1
            rows.append((eid, ts(2024, 9, 6 + (i % 5), 8), u, "purchase"))
    rows = [(e, t, u, k, 0.0, "{}") for e, t, u, k in rows]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    # mirror the spec: mid = min_day + span DIV 2 (here Sep 1 + 4)
    days = [t.date() for _, t, *_ in rows]
    d0, d1 = min(days), max(days)
    mid = d0 + datetime.timedelta(days=(d1 - d0).days // 2)
    xs, ys = {}, {}
    for _, t, u, k, _, _ in rows:
        if t.date() < mid:
            xs[u] = xs.get(u, 0) + 1
        elif k == "purchase":
            ys[u] = ys.get(u, 0) + 1
        xs.setdefault(u, 0)
        ys.setdefault(u, 0)
    users = sorted(xs)
    n = len(users)
    sx = sum(xs[u] for u in users)
    sy = sum(ys[u] for u in users)
    C = n * sum(xs[u] * ys[u] for u in users) - sx * sy
    W = n * sum(xs[u] ** 2 for u in users) - sx * sx
    VY = n * sum(ys[u] ** 2 for u in users) - sy * sy
    theta = Fraction(C, W)
    xbar = Fraction(sx, n)
    adj = {u: ys[u] - theta * (xs[u] - xbar) for u in users}
    A = [u for u in users if u % 2 == 0]
    B = [u for u in users if u % 2 == 1]
    lift_adj = sum(adj[u] for u in B) / len(B) - sum(
        adj[u] for u in A
    ) / len(A)

    row = q_events_cuped_adjust(spark, sf).collect()[0]
    assert (row.n_users, row.n_a, row.n_b) == (n, len(A), len(B))
    assert row.rho2_ppm == (C * C * 1_000_000) // (W * VY)
    got_adj = Fraction(int(row.lift_adj_num_str), int(row.lift_adj_den_str))
    assert got_adj == lift_adj
    got_raw = Fraction(int(row.lift_num_str), int(row.lift_den_str))
    assert got_raw == Fraction(sum(ys[u] for u in B), len(B)) - Fraction(
        sum(ys[u] for u in A), len(A)
    )
    # the covariate really reduces variance here
    assert row.rho2_ppm > 500_000


def test_random_walks_reference(spark, tmp_path):
    """Walk recurrence recomputed serially: md5 picks over the
    (d2, id)-ranked adjacency, early stop at isolated nodes."""
    import hashlib

    from ocr_intern_spark.operators.similarity import (
        GEO_R,
        GEO_SPAN,
        WALK_LEN,
        q_graph_random_walks,
    )

    ids = list(range(60))
    rows = [(d, f"t{d}", "en", "s", 2) for d in ids]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def coord(d, ax):
        return int(hashlib.md5(f"{d}{ax}".encode()).hexdigest()[:8], 16) % GEO_SPAN

    pts = {d: (coord(d, "x"), coord(d, "y")) for d in ids}
    adj = {}
    for a in ids:
        nbrs = []
        for b in ids:
            if a == b:
                continue
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= GEO_R * GEO_R:
                nbrs.append((d2, b))
        adj[a] = [b for _, b in sorted(nbrs)]

    expect = []
    for start in ids:
        node = start
        expect.append((start, 0, node))
        for step in range(1, WALK_LEN + 1):
            nbrs = adj[node]
            if not nbrs:
                break
            h = int(
                hashlib.md5(f"{start}:{step}:{node}".encode()).hexdigest()[:8],
                16,
            )
            node = nbrs[h % len(nbrs)]
            expect.append((start, step, node))
    expect.sort(key=lambda r: (r[0], r[1], r[2]))
    got = [tuple(r) for r in q_graph_random_walks(spark, sf).collect()]
    assert sorted(got) == expect
    # non-vacuous: at least one truncated walk and one real choice
    lens = {}
    for s, st, _ in expect:
        lens[s] = max(lens.get(s, 0), st)
    assert any(v < WALK_LEN for v in lens.values()) or all(
        adj[d] for d in ids
    )
    assert any(len(adj[d]) > 1 for d in ids)


def test_ses_forecast_reference(spark, tmp_path):
    """SES recurrence recomputed serially with floor at every step,
    including a gap day (x=0 -> strongly negative innovation)."""
    from ocr_intern_spark.operators.analytics import (
        SES_ALPHA_DEN,
        SES_SCALE,
        q_events_ses_forecast,
    )

    ts = datetime.datetime
    counts = {1: 5, 2: 2, 4: 7, 5: 1}  # day 3 gap
    rows = []
    eid = 0
    for day, n in counts.items():
        for i in range(n):
            eid += 1
            rows.append((eid, ts(2024, 10, day, 9, i)))
    sf = _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp")

    series = [counts.get(d, 0) for d in range(1, 6)]
    s = series[0] * SES_SCALE
    expect = [("2024-10-01", series[0], s, 0)]
    import math

    for t in range(1, 5):
        e = series[t] * SES_SCALE - s
        s = s + math.floor(e / SES_ALPHA_DEN)
        expect.append((f"2024-10-0{t + 1}", series[t], s, e))
    got = [tuple(r) for r in q_events_ses_forecast(spark, sf).collect()]
    assert got == expect
    assert any(e < 0 for *_, e in expect)  # negative innovation floored


def test_clustering_depth_reference(spark, tmp_path):
    """Depth audit recomputed serially on a corpus whose natural
    layout interleaves two value bands (deep overlap) while the
    clustered carve separates them (depth collapses)."""
    from ocr_intern_spark.operators.maintenance import (
        DEPTH_FILE_ROWS,
        q_clustering_depth_audit,
    )

    n = 80
    rows = [
        (d, f"t{d}", "en", "s", (d % 2) * 1000 + d)  # interleaved bands
        for d in range(n)
    ]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def audit(assign):
        zm = {}
        for d, _, _, _, k in rows:
            f = assign(d, k)
            lo, hi = zm.get(f, (k, k))
            zm[f] = (min(lo, k), max(hi, k))
        depths = {
            f: sum(
                1
                for g in zm.values()
                if g[0] <= zm[f][1] and g[1] >= zm[f][0]
            )
            for f in zm
        }
        nf = len(zm)
        sd = sum(depths.values())
        return (nf, max(depths.values()), sd, sd * 100 // nf)

    nat = audit(lambda d, k: d // DEPTH_FILE_ROWS)
    order = sorted((k, d) for d, _, _, _, k in rows)
    rank_of = {d: i + 1 for i, (k, d) in enumerate(order)}
    clu = audit(lambda d, k: (rank_of[d] - 1) // DEPTH_FILE_ROWS)
    expect = [("clustered",) + clu, ("natural",) + nat]
    got = [tuple(r) for r in q_clustering_depth_audit(spark, sf).collect()]
    assert got == expect
    # the rewrite actually helps: clustered depth strictly lower
    assert clu[1] < nat[1] and clu[3] < nat[3]


def test_scene_cuts_reference(spark, tmp_path):
    """Scene segmentation recomputed with hashlib over the fake-codec
    frame shas: signature, hamming, cuts, and running scene ids."""
    import hashlib

    from ocr_intern_spark.operators.curation import (
        SCENE_CUT_HAMMING,
        q_scene_cuts,
    )

    rows = [(d, f"video payload {d} xyz", "en", "s", 2) for d in range(12)]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    expect = []
    for d, text, *_ in rows:
        nf = min(4, 2 + d % 7)
        prev = None
        scene = 0
        for i in range(nf):
            sha = hashlib.md5(text.encode() + bytes([i])).hexdigest()
            sig = int(sha[:15], 16)
            if prev is None:
                ham, cut = -1, True
            else:
                ham = bin(sig ^ prev).count("1")
                cut = ham >= SCENE_CUT_HAMMING
            scene += 1 if cut else 0
            expect.append((str(d), i, ham, cut, scene))
            prev = sig
    expect.sort(key=lambda r: (r[0], r[1]))
    got = [tuple(r) for r in q_scene_cuts(spark, sf).collect()]
    assert got == expect
    # non-vacuous: at least one non-cut continuation and one real cut
    flags = [c for _, i, _, c, _ in expect if i > 0]
    assert True in flags and False in flags


def test_bootstrap_ci_reference(spark, tmp_path):
    """Poisson bootstrap recomputed with hashlib: identical weights,
    replicate means, order statistics, and the weight distribution
    really is Poisson-ish (all five buckets drawn)."""
    import hashlib

    from ocr_intern_spark.operators.analytics import (
        BOOT_B,
        BOOT_T0,
        BOOT_T1,
        BOOT_T2,
        BOOT_T3,
        q_events_bootstrap_ci,
    )

    ts = datetime.datetime
    counts = {u: 1 + (u * 13) % 9 for u in range(40)}
    rows = []
    eid = 0
    for u, n in counts.items():
        for i in range(n):
            eid += 1
            rows.append((eid, ts(2024, 11, 1 + i % 20), u, "click", 0.0, "{}"))
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    def weight(b, u):
        h = int(hashlib.md5(f"{b}:{u}".encode()).hexdigest()[:8], 16) % 4096
        return 0 if h < BOOT_T0 else 1 if h < BOOT_T1 else \
            2 if h < BOOT_T2 else 3 if h < BOOT_T3 else 4

    means = []
    seen_w = set()
    for b in range(1, BOOT_B + 1):
        swx = sw = 0
        for u, x in counts.items():
            w = weight(b, u)
            seen_w.add(w)
            swx += w * x
            sw += w
        means.append((swx * 1_000_000 // sw if sw else 0, b))
    means.sort()
    lo = means[max(1, BOOT_B * 25 // 1000) - 1][0]
    hi = means[BOOT_B * 975 // 1000 - 1][0]
    point = sum(counts.values()) * 1_000_000 // len(counts)
    got = tuple(q_events_bootstrap_ci(spark, sf).collect()[0])
    assert got == (BOOT_B, point, lo, hi)
    assert lo < point < hi and seen_w == {0, 1, 2, 3, 4}


def test_cdc_shift_certificate_reference(spark, tmp_path):
    """Shift-resilience law recomputed serially: CDC chunk sets
    survive a one-word prefix insert, the fixed grid does not."""
    from ocr_intern_spark.functions.text import (
        CDC_CUT,
        CDC_FIXED_W,
        CDC_MOD,
        CDC_SHIFT_PREFIX,
        q_cdc_shift_certificate,
    )
    import hashlib

    w = [f"word{i:02d}" for i in range(140)]
    docs = {d: " ".join(w[(d * 17) % 40 : (d * 17) % 40 + 90]) for d in range(6)}
    rows = [(d, t, "en", "s", len(t)) for d, t in docs.items()]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def fnv1a64_py(s):
        h = 14695981039346656037
        for ch in s:
            h ^= ord(ch)
            h = (h * 1099511628211) % (1 << 64)
        return h  # CDC uses pmod, so the unsigned residue is right

    def cdc_fps(text):
        # boundary falls AFTER the flagged word (the engine's chunk_id
        # sums b over STRICTLY EARLIER positions)
        toks = text.strip().lower().split()
        fps, cur = set(), []
        prev = None
        for t in toks:
            hit = (
                prev is not None
                and fnv1a64_py(f"{prev} {t}") % CDC_MOD == CDC_CUT
            )
            cur.append(t)
            if hit:
                fps.add(hashlib.md5(" ".join(cur).encode()).hexdigest())
                cur = []
            prev = t
        if cur:
            fps.add(hashlib.md5(" ".join(cur).encode()).hexdigest())
        return fps

    def fixed_fps(text):
        toks = text.strip().lower().split()
        return {
            hashlib.md5(
                " ".join(toks[i : i + CDC_FIXED_W]).encode()
            ).hexdigest()
            for i in range(0, len(toks), CDC_FIXED_W)
        }

    def audit(fn):
        nb = ns = sh = 0
        for t in docs.values():
            base, shift = fn(t), fn(CDC_SHIFT_PREFIX + " " + t)
            nb += len(base)
            ns += len(shift)
            sh += len(base & shift)
        return (len(docs), nb, ns, sh, sh * 1_000_000 // nb)

    expect = [("cdc",) + audit(cdc_fps), ("fixed",) + audit(fixed_fps)]
    got = [tuple(r) for r in q_cdc_shift_certificate(spark, sf).collect()]
    assert got == expect
    # the law itself: CDC survives, the grid loses (almost) everything
    assert got[0][5] > 300_000 and got[1][5] < got[0][5] // 3


def test_vacuum_orphans_reference(spark, tmp_path):
    """Orphan classification recomputed serially, all three classes
    present including a young retained orphan."""
    from ocr_intern_spark.operators.maintenance import (
        VACUUM_RETENTION_DAYS,
        q_vacuum_orphans,
    )

    # doc_ids chosen so orphans (id%7==3) land both sides of the
    # retention cut (age = id%90): 3 -> age 3 (retained), 38 -> 38
    ids = [0, 1, 3, 10, 17, 38, 45, 80]
    rows = [(d, f"t{d}", "en", "s", 100 + d) for d in ids]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    buckets = {}
    for d in ids:
        orphan = d % 7 == 3
        st = (
            "live" if not orphan
            else "orphan_delete" if d % 90 > VACUUM_RETENTION_DAYS
            else "orphan_retained"
        )
        n, b = buckets.get(st, (0, 0))
        buckets[st] = (n + 1, b + 100 + d)
    expect = sorted((s, n, str(b)) for s, (n, b) in buckets.items())
    got = [tuple(r) for r in q_vacuum_orphans(spark, sf).collect()]
    assert got == expect
    assert len(expect) == 3  # all classes exercised


def test_phash_band_neardup_reference(spark, tmp_path):
    """Band-join output == exact payload-prefix dup pairs at distance
    0 (the pigeonhole cover catches them; full-entropy codes admit
    nothing else)."""
    from ocr_intern_spark.operators.curation import q_phash_band_neardup

    base = "x" * 64
    texts = {
        1: base + " tail one",
        2: base + " other tail",      # same 64-prefix as 1 and 5
        3: "y" * 64 + " unique",
        4: "distinct prefix " + "z" * 60,
        5: base,                      # exactly the prefix
    }
    rows = [(d, t, "en", "s", len(t)) for d, t in texts.items()]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    expect = [(1, 2, 0), (1, 5, 0), (2, 5, 0)]
    got = [tuple(r) for r in q_phash_band_neardup(spark, sf).collect()]
    assert got == expect


def test_markov_stationary_reference(spark, tmp_path):
    """Power iteration recomputed serially on a 3-state chain with a
    zero-row state (guarded) and floors at every step."""
    from ocr_intern_spark.operators.analytics import (
        MARKOV_ITERS,
        q_events_markov_stationary,
    )

    ts = datetime.datetime
    # one user, a fixed journey; 'view' never transitions out at the
    # end -> its row is NOT all-zero (it appears mid-stream too)
    journey = ["a_click", "b_buy", "a_click", "c_view", "a_click",
               "b_buy", "c_view", "c_view", "a_click"]
    rows = [
        (i, ts(2024, 12, 1, 10, i), 1, t, 0.0, "{}")
        for i, t in enumerate(journey)
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    states = sorted(set(journey))
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    c = [[0] * k for _ in range(k)]
    for a, b in zip(journey, journey[1:]):
        c[idx[a]][idx[b]] += 1
    p = [
        [
            (c[i][j] * 1_000_000 // sum(c[i])) if sum(c[i]) else 0
            for j in range(k)
        ]
        for i in range(k)
    ]
    v = [1_000_000 // k] * k
    for _ in range(MARKOV_ITERS):
        v = [
            sum(v[i] * p[i][j] for i in range(k)) // 1_000_000
            for j in range(k)
        ]
    expect = [(s, i, v[i]) for i, s in enumerate(states)]
    got = [tuple(r) for r in q_events_markov_stationary(spark, sf).collect()]
    assert got == expect
    assert max(v) > min(v)  # non-uniform: the chain has structure


def test_centroid_drift_reference(spark, tmp_path):
    """Centroid drift recomputed serially with quantized integers on
    a controlled embedding set with a planted per-label shift."""
    import math

    from ocr_intern_spark.operators.similarity import (
        DRIFT_Q,
        q_centroid_drift,
    )

    import numpy as np

    rows = []
    vecs = {}
    labels = {}
    for v in range(12):
        label = v // 6  # label DECOUPLED from the vec_id-parity halves
        # label 1's odd half is shifted -> real drift; label 0 is not
        shift = 0.2 if (label == 1 and v % 2 == 1) else 0.0
        vec = [
            float(np.float32(0.5 + shift + 0.01 * ((v * 7 + d) % 5)))
            for d in range(4)
        ]
        rows.append((v, vec, label))
        vecs[v] = vec
        labels[v] = label
    sf = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    expect = []
    for label in (0, 1):
        ids = [v for v in vecs if labels[v] == label]
        a = [v for v in ids if v % 2 == 0]
        b = [v for v in ids if v % 2 == 1]
        # halves are vec_id parity; for odd labels a is empty -> the
        # query drops dims with a missing half, i.e. the whole label
        if not a or not b:
            continue
        dims = len(vecs[ids[0]])
        na, nb = len(a), len(b)
        num = 0
        for d in range(dims):
            sa = sum(math.floor(vecs[v][d] * DRIFT_Q) for v in a)
            sb = sum(math.floor(vecs[v][d] * DRIFT_Q) for v in b)
            num += (nb * sa - na * sb) ** 2
        expect.append(
            (label, na, nb, dims, str(num), num // (na * na * nb * nb))
        )
    got = [tuple(r) for r in q_centroid_drift(spark, sf).collect()]
    assert got == expect
    # non-vacuous: both labels present, and the planted shift shows
    assert len(expect) == 2 and expect[1][5] > 10 * max(1, expect[0][5])


def test_did_estimator_reference(spark, tmp_path):
    """DiD recomputed with Fractions on a planted treatment effect,
    including the signed-ppm floor and the pre-period gap."""
    from fractions import Fraction

    from ocr_intern_spark.operators.analytics import q_events_did_estimator

    ts = datetime.datetime
    # days 1..10, mid = 5 (1 + 9//2): pre < day 5, post >= day 5.
    # A users (even): flat 1 purchase per period. B users (odd):
    # 1 pre, 3 post -> DiD = +2 per user
    rows = []
    eid = 0
    for u in range(6):
        pre_n = 1
        post_n = 1 if u % 2 == 0 else 3
        for i in range(pre_n):
            eid += 1
            rows.append((eid, ts(2024, 3, 1 + i, 9), u, "purchase", 0.0, "{}"))
        for i in range(post_n):
            eid += 1
            rows.append((eid, ts(2024, 3, 6 + i, 9), u, "purchase", 0.0, "{}"))
        eid += 1  # pin the corpus range with a non-purchase each end
        rows.append((eid, ts(2024, 3, 10, 23), u, "view", 0.0, "{}"))
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    na = nb = 3
    sa_pre, sa_post, sb_pre, sb_post = 3, 3, 3, 9
    did = Fraction(na * (sb_post - sb_pre) - nb * (sa_post - sa_pre), na * nb)
    row = q_events_did_estimator(spark, sf).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert (row.sa_pre, row.sa_post, row.sb_pre, row.sb_post) == (
        sa_pre, sa_post, sb_pre, sb_post,
    )
    from fractions import Fraction as Fr

    assert Fr(int(row.did_num_str), int(row.did_den_str)) == did == 2
    assert row.did_ppm == 2_000_000
    assert Fr(int(row.pre_gap_num_str), int(row.pre_gap_den_str)) == 0


def test_price_index_reference(spark, tmp_path):
    """Laspeyres/Paasche recomputed serially with the milli-cent
    floor quantization and matched-basket join (a part trading in
    only one year is excluded)."""
    import math

    from ocr_intern_spark.operators.analytics import (
        PI_BASE_YEAR,
        PI_CURR_YEAR,
        q_orders_price_index,
    )

    ts = datetime.datetime
    # (partkey, year, extendedprice, qty)
    lines = [
        (1, PI_BASE_YEAR, 100.00, 10.0),
        (1, PI_BASE_YEAR, 55.50, 5.0),
        (1, PI_CURR_YEAR, 130.00, 10.0),
        (2, PI_BASE_YEAR, 20.00, 4.0),
        (2, PI_CURR_YEAR, 18.00, 6.0),
        (3, PI_CURR_YEAR, 99.0, 9.0),   # current-only: excluded
        (4, PI_BASE_YEAR, 77.0, 7.0),   # base-only: excluded
    ]
    rows = [
        (i, i, 1, i, p, 0.0, 0.0, "N", "O", ts(y, 6, 1))
        for i, (k, y, p, q) in enumerate(lines)
    ]
    rows = [
        (i, k, 1, int(q), q, p, 0.0, 0.0, "N", "O", ts(y, 6, 1))
        for i, (k, y, p, q) in enumerate(lines)
    ]
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    agg = {}
    for k, y, p, q in lines:
        s, qq = agg.get((k, y), (0, 0))
        agg[(k, y)] = (s + math.floor(p * 100), qq + int(q))
    pm = {ky: (s * 1000) // q for ky, (s, q) in agg.items()}
    parts = [
        k
        for k in {k for k, _ in agg}
        if (k, PI_BASE_YEAR) in agg and (k, PI_CURR_YEAR) in agg
    ]
    l_num = sum(pm[(k, PI_CURR_YEAR)] * agg[(k, PI_BASE_YEAR)][1] for k in parts)
    l_den = sum(pm[(k, PI_BASE_YEAR)] * agg[(k, PI_BASE_YEAR)][1] for k in parts)
    p_num = sum(pm[(k, PI_CURR_YEAR)] * agg[(k, PI_CURR_YEAR)][1] for k in parts)
    p_den = sum(pm[(k, PI_BASE_YEAR)] * agg[(k, PI_CURR_YEAR)][1] for k in parts)
    expect = (
        len(parts),
        l_num * 1_000_000 // l_den,
        p_num * 1_000_000 // p_den,
        str(l_num),
        str(l_den),
    )
    got = tuple(q_orders_price_index(spark, sf).collect()[0])
    assert got == expect
    assert len(parts) == 2  # the matched basket excluded parts 3, 4


def test_returns_shrinkage_reference(spark, tmp_path):
    """Beta-binomial shrinkage recomputed serially: the 1-of-2 part
    outranks the 30-of-100 part RAW but not SHRUNK (the correction
    the operator exists for)."""
    from ocr_intern_spark.operators.analytics import (
        EB_ALPHA,
        EB_BETA,
        q_orders_returns_shrinkage,
    )

    ts = datetime.datetime
    lines = []
    # part 1: 1 return of 2; part 2: 30 of 100; part 3: 0 of 5
    for i in range(2):
        lines.append((1, "R" if i < 1 else "N"))
    for i in range(100):
        lines.append((2, "R" if i < 30 else "N"))
    for i in range(5):
        lines.append((3, "N"))
    rows = [
        (i, k, 1, 1, 1.0, 10.0, 0.0, 0.0, rf, "O", ts(1996, 1, 1))
        for i, (k, rf) in enumerate(lines)
    ]
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    stats = {1: (2, 1), 2: (100, 30), 3: (5, 0)}
    expect = []
    for part, (n, x) in stats.items():
        expect.append(
            (
                part,
                n,
                x,
                x * 1_000_000 // n,
                (x + EB_ALPHA) * 1_000_000 // (n + EB_ALPHA + EB_BETA),
            )
        )
    expect.sort(key=lambda r: (-r[4], r[0]))
    got = [tuple(r) for r in q_orders_returns_shrinkage(spark, sf).collect()]
    assert got == expect
    raw = {r[0]: r[3] for r in got}
    shrunk = {r[0]: r[4] for r in got}
    assert raw[1] > raw[2] and shrunk[1] < shrunk[2]  # the flip


def test_stream_cms_equals_batch(spark, tmp_path):
    """The streaming sum-merged CMS must equal the batch sketch
    row-for-row (the swap proof the oracle also enforces)."""
    from ocr_intern_spark.operators.analytics import (
        q_events_cms_heavy_hitters,
    )
    from ocr_intern_spark.streaming.stream_queries import (
        q_stream_cms_sketch,
    )

    ts = datetime.datetime
    rows = [
        (i, ts(2024, 8, 1 + i % 25), i % 37, "click", 0.0, "{}")
        for i in range(300)
    ]
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    batch = [tuple(r) for r in q_events_cms_heavy_hitters(spark, sf).collect()]
    stream = [tuple(r) for r in q_stream_cms_sketch(spark, sf).collect()]
    assert stream == batch and len(batch) > 0


def test_power_analysis_reference(spark, tmp_path):
    """Sample-size algebra recomputed with Fractions: the integer
    ceil formula equals ceil(2 z^2 sigma^2 / delta^2) exactly, and
    smaller MDEs demand quadratically more users."""
    from fractions import Fraction

    from ocr_intern_spark.operators.analytics import (
        POWER_MDE_PCT,
        POWER_Z2_MICRO,
        q_events_power_analysis,
    )

    import math

    ts = datetime.datetime
    counts = {u: 3 + (u * 11) % 7 for u in range(20)}
    rows = []
    eid = 0
    for u, n in counts.items():
        for i in range(n):
            eid += 1
            rows.append((eid, ts(2024, 4, 1 + i % 20), u, "click", 0.0, "{}"))
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    n = len(counts)
    s = sum(counts.values())
    sxx = sum(x * x for x in counts.values())
    V = n * sxx - s * s
    expect = []
    for p in sorted(POWER_MDE_PCT):
        exact = Fraction(2 * POWER_Z2_MICRO * V * 10_000,
                         p * p * s * s * 1_000_000)
        req = math.ceil(exact)
        expect.append((p, n, s * 1_000_000 // n, str(V), req))
    got = [tuple(r) for r in q_events_power_analysis(spark, sf).collect()]
    assert got == expect
    reqs = [r[4] for r in got]
    assert reqs[0] > reqs[1] > reqs[2]  # 2% >> 5% >> 10%


def test_term_burstiness_reference(spark, tmp_path):
    """Dispersion index recomputed with Counter: a clumped term beats
    a uniformly spread term of the same total occurrences."""
    from collections import Counter

    from ocr_intern_spark.functions.text import q_term_burstiness

    docs = {
        1: "bursty bursty bursty flat filler",
        2: "flat filler other",
        3: "flat filler other",
        4: "filler other pad",
    }
    rows = [(d, t, "en", "s", len(t)) for d, t in docs.items()]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    per = {}
    for d, t in docs.items():
        for tok, c in Counter(t.split()).items():
            per.setdefault(tok, []).append(c)
    n = len(docs)
    expect = []
    for tok, cs in per.items():
        sc, scc = sum(cs), sum(c * c for c in cs)
        num, den = n * scc - sc * sc, n * sc
        expect.append(
            (tok, len(cs), sc, str(num), str(den), num * 1_000_000 // den)
        )
    expect.sort(key=lambda r: (-r[5], r[0]))
    got = [tuple(r) for r in q_term_burstiness(spark, sf).collect()]
    assert got == expect
    ranks = {r[0]: i for i, r in enumerate(got)}
    # "bursty" (3 in one doc) disperses more than "flat" (1 in three)
    assert ranks["bursty"] < ranks["flat"]


def test_interarrival_cv_reference(spark, tmp_path):
    """CV² recomputed serially: a regular user sits below the bursty
    user, exact rationals match."""
    from ocr_intern_spark.operators.analytics import q_events_interarrival_cv

    ts = datetime.datetime
    rows = []
    eid = 0
    # user 1: regular 10-minute gaps; user 2: 1s,1s,2h bursts;
    # user 3: single event (no gaps -> excluded)
    for i in range(4):
        eid += 1
        rows.append((eid, ts(2024, 5, 1, 9, 10 * i), 1, "click", 0.0, "{}"))
    for t in [ts(2024, 5, 1, 9, 0, 0), ts(2024, 5, 1, 9, 0, 1),
              ts(2024, 5, 1, 9, 0, 2), ts(2024, 5, 1, 11, 0, 2)]:
        eid += 1
        rows.append((eid, t, 2, "click", 0.0, "{}"))
    eid += 1
    rows.append((eid, ts(2024, 5, 1, 12), 3, "click", 0.0, "{}"))
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    expect = []
    gaps = {1: [600_000_000] * 3, 2: [1_000_000, 1_000_000, 7_200_000_000]}
    for u in (1, 2):
        d = gaps[u]
        n, sd, sdd = len(d), sum(d), sum(x * x for x in d)
        num, den = n * sdd - sd * sd, sd * sd
        expect.append((u, n, str(num), str(den), num * 1_000_000 // den))
    got = [tuple(r) for r in q_events_interarrival_cv(spark, sf).collect()]
    assert got == expect
    assert got[0][4] == 0 and got[1][4] > 1_000_000  # regular vs bursty


def test_local_clustering_reference(spark, tmp_path):
    """Per-vertex clustering coefficient recomputed serially from
    the md5 coordinates; includes a vertex in a closed triangle and
    an open hub."""
    import hashlib

    from ocr_intern_spark.operators.similarity import (
        GEO_R,
        GEO_SPAN,
        q_graph_local_clustering,
    )

    ids = list(range(80))
    rows = [(d, f"t{d}", "en", "s", 2) for d in ids]
    sf = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def coord(d, ax):
        return int(hashlib.md5(f"{d}{ax}".encode()).hexdigest()[:8], 16) % GEO_SPAN

    pts = {d: (coord(d, "x"), coord(d, "y")) for d in ids}
    adj = {d: set() for d in ids}
    for a in ids:
        for b in ids:
            if a < b:
                d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
                if d2 <= GEO_R * GEO_R:
                    adj[a].add(b)
                    adj[b].add(a)
    expect = []
    for v in ids:
        deg = len(adj[v])
        if deg < 2:
            continue
        t = sum(
            1
            for u in adj[v]
            for w in adj[v]
            if u < w and w in adj[u]
        )
        expect.append(
            (v, deg, t, 2 * t * 1_000_000 // (deg * (deg - 1)))
        )
    got = [tuple(r) for r in q_graph_local_clustering(spark, sf).collect()]
    assert got == expect
    cs = [c for *_, c in expect]
    assert len(expect) > 3 and max(cs) > 0 and min(cs) < max(cs)
