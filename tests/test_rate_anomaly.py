"""Pure-Python median/MAD reference pin for hourly rate-anomaly
flags, plus a hand-built burst corpus where exactly the injected
burst hour must be flagged (and a constant stream where the MAD==0
fallback must flag exactly the deviating hour)."""

import datetime
import statistics
import tempfile
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _ref(rows):
    """rows: (event_type, ts). Returns {(etype, hour): (cnt, med, mad,
    robust_z, is_anomaly)} computed exactly as the operator defines."""
    cnt: Counter = Counter()
    for et, ts in rows:
        cnt[(et, ts.replace(minute=0, second=0, microsecond=0))] += 1
    out = {}
    by_type: dict = {}
    for (et, h), c in cnt.items():
        by_type.setdefault(et, []).append(c)
    med = {et: statistics.median(cs) for et, cs in by_type.items()}
    mad = {
        et: statistics.median([abs(c - med[et]) for c in cs])
        for et, cs in by_type.items()
    }
    for (et, h), c in cnt.items():
        m, a = med[et], mad[et]
        z = round((c - m) / a, 6) if a > 0 else None
        flag = abs(c - m) > 3.0 * a if a > 0 else c != m
        out[(et, h)] = (c, m, a, z, flag)
    return out


def test_rate_anomaly_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import q_events_rate_anomaly

    rows = [
        (r.event_type, r.ts)
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts")
        .collect()
    ]
    want = _ref(rows)
    got = q_events_rate_anomaly(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        c, m, a, z, flag = want[(r.event_type, r.hour)]
        assert (r.cnt, r.med, r.mad, r.is_anomaly) == (c, m, a, flag), r
        if z is None:
            assert r.robust_z is None
        else:
            assert abs(r.robust_z - z) < 1e-12


def test_rate_anomaly_flags_injected_burst(spark):
    from ocr_intern_spark.operators.analytics import q_events_rate_anomaly

    t0 = datetime.datetime(2026, 1, 1, 0, 30)
    rows = []
    eid = 0
    # 48 hours oscillating 4/5/6 events/h (MAD=1), one burst hour of 50
    for h in range(48):
        n = 50 if h == 20 else 4 + (h % 3)
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, seconds=i), 1, "click", 1.0, "{}")
            )
            eid += 1
    # a perfectly constant type, except ONE hour with an extra event
    # → MAD==0 fallback must flag exactly that hour
    for h in range(48):
        for i in range(3 + (1 if h == 7 else 0)):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, seconds=i), 2, "error", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = q_events_rate_anomaly(spark, d).collect()
    flagged = {(r.event_type, r.hour.hour) for r in got if r.is_anomaly}
    assert flagged == {("click", 20), ("error", 7)}
    burst = [r for r in got if r.event_type == "click" and r.is_anomaly][0]
    assert burst.cnt == 50 and burst.med == 5.0 and burst.mad == 1.0
    assert burst.robust_z == 45.0
    const = [r for r in got if r.event_type == "error" and r.is_anomaly][0]
    assert const.mad == 0.0 and const.robust_z is None
