"""asof_join semantics: at-or-before inclusive tie, version
selection, left-outer NULL for facts before any version."""

import datetime as dt

from ocr_intern_spark.operators.temporal import asof_join

T = lambda m: dt.datetime(2024, 1, 1, 12, m)


def test_asof_semantics(spark):
    right = spark.createDataFrame(
        [(1, T(0), "v1"), (1, T(10), "v2"), (2, T(30), "w1")],
        "user_id long, valid_from timestamp, plan string",
    )
    left = spark.createDataFrame(
        [
            (1, T(5), 100),   # between v1 and v2 -> v1
            (1, T(10), 101),  # EXACTLY at v2 -> v2 (inclusive tie)
            (1, T(59), 102),  # after everything -> v2
            (2, T(0), 103),   # before any version -> NULL
            (3, T(0), 104),   # key with no versions at all -> NULL
        ],
        "user_id long, ts timestamp, amount long",
    )
    out = {
        r["amount"]: r["asof_plan"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts",
            right_ts="valid_from", value_cols=["plan"],
        ).collect()
    }
    assert out == {100: "v1", 101: "v2", 102: "v2", 103: None, 104: None}
