"""Pins for the UNPIVOT (melt) reshape query: round-trip exactness on
the real corpus is hash-pinned by the DuckDB oracle (the oracle is the
PLAIN long-form GROUP BY, so equality proves unpivot ∘ pivot ==
identity); these tests pin the two branches the dense corpus can't
exercise — the zero-cell drop on a SPARSE synthetic frame — and the
Expand-based plan shape."""

from datetime import datetime


def _write_sparse_events(spark, path: str) -> None:
    """A 2-day corpus where (day 2, 'error') has no events — the
    sparse cell the real corpus never produces (its 30×5 matrix is
    fully dense at every sf)."""
    rows = [
        (1, datetime(2024, 1, 1, 8), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 9), 1, "error", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 9), 2, "click", 1.5, "{}"),
        (4, datetime(2024, 1, 2, 8), 1, "click", 1.0, "{}"),
        (5, datetime(2024, 1, 2, 9), 2, "view", 0.5, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_unpivot_drops_sparse_zero_cells(spark, tmp_path):
    from ocr_intern_spark.operators.analytics import (
        q_events_daily_type_unpivot,
    )

    _write_sparse_events(spark, str(tmp_path))
    got = {
        (str(r.day), r.event_type): r.n
        for r in q_events_daily_type_unpivot(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", "click"): 2,
        ("2024-01-01", "error"): 1,
        ("2024-01-02", "click"): 1,
        ("2024-01-02", "view"): 1,
    }
    # the zero cell was materialized by the pivot and DROPPED by the
    # melt — no (2024-01-02, error) row and no n=0 row anywhere
    assert ("2024-01-02", "error") not in got
    assert all(n > 0 for n in got.values())


def test_unpivot_plan_is_expand_over_reduced_frame(spark):
    """The fact must feed exactly one aggregation (the long-form
    (day, type) count inside the pivot); the melt itself compiles to
    an Expand over the already-reduced days×types frame — no second
    fact scan, no join, no window."""
    from ocr_intern_spark.operators.analytics import (
        q_events_daily_type_unpivot,
    )

    p = (
        q_events_daily_type_unpivot(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in p
    assert p.count("FileScan") == 1
    assert "Join" not in p
    assert "windowspecdefinition" not in p
