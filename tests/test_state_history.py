"""Pins for the SCD2 state-history operator: interval algebra on a
hand-built timeline, the one-exchange plan shape, and invariants over
the real events table (intervals tile each user's timeline with no
gaps or overlaps; consecutive states always differ)."""

from datetime import datetime

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_hand_built_timeline(spark):
    from ocr_intern_spark.operators.analytics import q_events_state_history

    rows = [
        # user 1: a a b a  → episodes a[t0,t2) b[t2,t3) a[t3,∅)
        (0, datetime(2024, 1, 1, 0, 0), 1, "a", 0.0, ""),
        (1, datetime(2024, 1, 1, 0, 1), 1, "a", 0.0, ""),
        (2, datetime(2024, 1, 1, 0, 2), 1, "b", 0.0, ""),
        (3, datetime(2024, 1, 1, 0, 3), 1, "a", 0.0, ""),
        # user 2: single event → one open episode
        (4, datetime(2024, 1, 1, 0, 0), 2, "x", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = [
            (r.user_id, r.state, r.effective_from.minute,
             None if r.effective_to is None else r.effective_to.minute,
             r.version)
            for r in q_events_state_history(spark, d).collect()
        ]
    assert got == [
        (1, "a", 0, 2, 1),
        (1, "b", 2, 3, 2),
        (1, "a", 3, None, 3),
        (2, "x", 0, None, 1),
    ]


def test_intervals_tile_without_gaps(spark):
    from ocr_intern_spark.operators.analytics import q_events_state_history

    hist = q_events_state_history(spark, SF_DIR)
    rows = hist.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, eps in by_user.items():
        eps.sort(key=lambda r: r.version)
        assert [e.version for e in eps] == list(range(1, len(eps) + 1))
        for a, b in zip(eps, eps[1:]):
            assert a.effective_to == b.effective_from, user  # no gap
            assert a.state != b.state, user  # real change
        assert eps[-1].effective_to is None  # exactly one open episode


def test_single_exchange_plan(spark):
    from ocr_intern_spark.operators.analytics import q_events_state_history

    plan = (
        q_events_state_history(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1, plan
