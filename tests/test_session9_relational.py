"""Unit pins for the session-9 relational additions: the TPC-H
Q12-style conditional two-way mix and the explicit-values PIVOT.
Both carry hash-exact DuckDB oracle rows (verified ×3 sfs); these
tests pin SEMANTICS against independent pure-Python references and
the plan shapes that make them scale."""

from collections import defaultdict
from datetime import timedelta

SF_DIR = "/root/testdata/sf0.001"


# --- ship_priority_mix (TPC-H Q12 shape) -----------------------------------


def test_ship_priority_mix_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q12_HIGH,
        _Q12_LATE_DAYS,
        _Q12_YEAR_END,
        _Q12_YEAR_START,
        q_ship_priority_mix,
    )

    orders = {
        r.o_orderkey: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()

    ref: dict = defaultdict(lambda: [0, 0])
    import datetime

    start = datetime.datetime.fromisoformat(_Q12_YEAR_START)
    end = datetime.datetime.fromisoformat(_Q12_YEAR_END)
    in_year = 0
    for l in li:
        if not (start <= l.l_shipdate < end):
            continue
        in_year += 1
        o = orders[l.l_orderkey]
        if l.l_shipdate <= o.o_orderdate + timedelta(days=_Q12_LATE_DAYS):
            continue
        slot = 0 if o.o_orderpriority in _Q12_HIGH else 1
        ref[(l.l_returnflag, l.l_linestatus)][slot] += 1

    got = {
        (r.l_returnflag, r.l_linestatus): (r.high_count, r.low_count)
        for r in q_ship_priority_mix(spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in ref.items()}
    # non-vacuity: the late predicate excludes some in-year lines
    # (otherwise the join filter tests nothing), and both priority
    # classes fire somewhere
    n_late = sum(a + b for a, b in ref.values())
    assert 0 < n_late < in_year
    assert any(a > 0 for a, _ in ref.values())
    assert any(b > 0 for _, b in ref.values())


def test_ship_priority_mix_plan_pushes_year_and_prefolds_priority(spark):
    """The year envelope must reach the lineitem scan as PushedFilters
    and the orders side must carry the priority as a prefolded boolean
    (is_high) below the join — a plan that ships the priority STRING
    through the fact join moves ~16x the bytes at 100 TB."""
    from ocr_intern_spark.operators.analytics import q_ship_priority_mix

    df = q_ship_priority_mix(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "AS is_high" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- events_daily_type_pivot (explicit-values PIVOT) -----------------------


def test_daily_type_pivot_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _PIVOT_TYPES,
        q_events_daily_type_pivot,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    ref: dict = defaultdict(lambda: defaultdict(int))
    for r in ev:
        ref[r.ts.date()][r.event_type] += 1

    rows = q_events_daily_type_pivot(spark, SF_DIR).collect()
    assert {r.day for r in rows} == set(ref)
    for r in rows:
        per = ref[r.day]
        for t in _PIVOT_TYPES:
            assert getattr(r, f"n_{t}") == per[t]
        assert r.n_total == sum(per[t] for t in _PIVOT_TYPES)
    # days are dense over the corpus month, so the 30-row frame is
    # the full calendar — no silent day loss
    assert len(rows) == len(ref) == 30


def test_daily_type_pivot_runs_no_value_discovery_job(spark):
    """pivot() WITHOUT explicit values runs a driver-side distinct
    collect before the plan even exists; the explicit list keeps
    planning job-free. Pin the contrast on an in-memory frame (no
    parquet-footer job muddying the count), then pin OUR query's
    plan: the fact feeds only the long-form map-side-combinable
    (day, type) count, and pivotfirst re-aggregates the reduced
    frame."""
    from pyspark.sql import functions as F

    from ocr_intern_spark.operators.analytics import (
        q_events_daily_type_pivot,
    )

    base = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "k int, t string"
    )
    tracker = spark.sparkContext.statusTracker()

    n0 = len(tracker.getJobIdsForGroup() or [])
    base.groupBy("k").pivot("t", ["a", "b"]).agg(F.count(F.lit(1)))
    n1 = len(tracker.getJobIdsForGroup() or [])
    assert n1 == n0, "explicit-values pivot planning launched a job"

    base.groupBy("k").pivot("t").agg(F.count(F.lit(1)))
    n2 = len(tracker.getJobIdsForGroup() or [])
    assert n2 > n1, "values-free pivot should have run a discovery job"

    plan = (
        q_events_daily_type_pivot(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pivotfirst" in plan
    # the first (fact-feeding) aggregate is the long-form count keyed
    # on (day, event_type) with a partial stage — map-side combinable
    assert "partial_count" in plan
