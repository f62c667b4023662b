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
