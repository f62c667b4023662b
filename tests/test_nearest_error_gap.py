"""Pins for the cogrouped-map nearest-error-gap operator: exact
distances vs an independent pure-Python reference, two-sidedness
non-vacuity (some nearest errors lie BEFORE the purchase, some AFTER
— an as-of join would get one of those groups wrong), and the
empty-error-side NULL branch on a synthetic frame (vacuous on the
real corpus: every purchasing user also has errors at every sf)."""

from datetime import datetime

SF_DIR = "/root/testdata/sf0.001"


def test_nearest_error_gap_matches_python_reference(spark):
    from ocr_intern_spark.operators.temporal import (
        q_events_nearest_error_gap,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    errs: dict = {}
    for r in ev:
        if r.event_type == "error":
            errs.setdefault(r.user_id, []).append(r.ts)
    ref = {}
    direction = {"before": 0, "after": 0}
    for r in ev:
        if r.event_type != "purchase":
            continue
        es = errs.get(r.user_id)
        if not es:
            ref[r.event_id] = None
            continue
        best = min(es, key=lambda e: abs((r.ts - e).total_seconds()))
        dt_us = int(abs((r.ts - best).total_seconds() * 1_000_000))
        # recompute in integer µs to avoid float rounding in the pin
        dt_us = abs(
            int(r.ts.timestamp() * 1_000_000)
            - int(best.timestamp() * 1_000_000)
        )
        ref[r.event_id] = dt_us
        direction["before" if best <= r.ts else "after"] += 1

    got = {
        r.event_id: r.nearest_err_us
        for r in q_events_nearest_error_gap(spark, SF_DIR).collect()
    }
    assert got == ref
    # two-sidedness: both directions occur, so a one-sided as-of
    # would provably differ
    assert direction["before"] > 0 and direction["after"] > 0


def test_nearest_error_gap_empty_side_emits_nulls(spark, tmp_path):
    from ocr_intern_spark.operators.temporal import (
        q_events_nearest_error_gap,
    )

    rows = [
        (1, datetime(2024, 1, 1, 8), 1, "purchase", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 9), 1, "error", 2.0, "{}"),
        (3, datetime(2024, 1, 2, 8), 2, "purchase", 1.0, "{}"),  # no errors
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r.event_id: r.nearest_err_us
        for r in q_events_nearest_error_gap(spark, str(tmp_path)).collect()
    }
    assert got == {1: 3_600_000_000, 3: None}
