"""Pins for the sweep-line peak-concurrency query: exact per-day peaks
vs an independent pure-Python global sweep (no day partitioning, no
carry decomposition — the naive algorithm the hierarchical version
must equal), plus non-vacuity of the pieces: overlap actually happens
(peak > 1), and the cross-day carry-in actually matters."""

from collections import defaultdict
from datetime import timedelta

SF_DIR = "/root/testdata/sf0.001"


def _python_sweep(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    gap = timedelta(minutes=30)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id))
    intervals = []
    for _u, rows in by_user.items():
        rows.sort()
        start = prev = rows[0][0]
        for ts, _eid in rows[1:]:
            if ts > prev + gap:  # sessionize(): strictly-greater splits
                intervals.append((start, prev + gap))
                start = ts
            prev = ts
        intervals.append((start, prev + gap))

    deltas = defaultdict(int)
    for s, e in intervals:
        deltas[s] += 1
        deltas[e] -= 1
    run = 0
    peaks: dict = {}
    carry_at_day_start: dict = {}
    cur_day = None
    for ts in sorted(deltas):
        d = ts.date()
        if d != cur_day:
            # concurrency carried into this day counts toward its peak
            peaks[d] = max(peaks.get(d, 0), run)
            carry_at_day_start[d] = run
            cur_day = d
        run += deltas[ts]
        peaks[d] = max(peaks[d], run)
    return peaks, carry_at_day_start


def test_peak_concurrency_matches_global_sweep(spark):
    from ocr_intern_spark.operators.temporal import (
        q_events_peak_concurrency,
    )

    peaks, carry = _python_sweep(spark)
    got = {
        r.day: r.peak_concurrent
        for r in q_events_peak_concurrency(spark, SF_DIR).collect()
    }
    assert got == {d: p for d, p in peaks.items()}
    # non-vacuity: sessions actually overlap somewhere
    assert max(peaks.values()) > 1
    # and the cross-day carry-in is live: some day starts with open
    # sessions (a midnight-spanning activity window exists)
    assert any(v > 0 for v in carry.values())
