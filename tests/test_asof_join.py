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


def test_asof_property_random(spark):
    """asof_join ≡ brute-force latest-at-or-before on seeded random
    inputs (many keys, duplicate timestamps, missing keys)."""
    import random

    rng = random.Random(11)
    right = [(k, T(rng.randrange(0, 50)), f"v{i}")
             for i, k in enumerate(rng.choices(range(6), k=25))]
    left = [(k, T(rng.randrange(0, 55)), i)
            for i, k in enumerate(rng.choices(range(8), k=40))]

    def brute(k, ts):
        cands = [(vf, val) for (rk, vf, val) in right if rk == k and vf <= ts]
        if not cands:
            return None
        # latest valid_from; tie → max value id is NOT defined, so
        # keep inputs tie-free per (key, ts) on the right side
        return max(cands)[1]

    # dedupe right rows sharing (key, ts) to keep the spec total
    seen = set()
    right = [r for r in right
             if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]

    rdf = spark.createDataFrame(right, "k long, vf timestamp, val string")
    ldf = spark.createDataFrame(left, "k long, ts timestamp, i long")
    out = asof_join(ldf, rdf, key="k", left_ts="ts", right_ts="vf",
                    value_cols=["val"]).collect()
    got = {r["i"]: r["asof_val"] for r in out}
    assert len(got) == len(left)
    for (k, ts, i) in left:
        assert got[i] == brute(k, ts), (k, ts, i)
