"""Unit pins for the round-4 relational additions: Q8-style market
share, Q15-style broadcast-argmax top supplier, the interval/range
join, and the global_rank-backed spend deciles. Each also has a
hash-exact DuckDB oracle row; these tests pin SEMANTICS against
independent pure-Python references (so oracle and implementation
can't drift together) and the plan shapes that make them scale."""

from collections import defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _r(x: float, n: int) -> float:
    """Spark/DuckDB-faithful HALF_UP rounding (python round is
    banker's)."""
    q = Decimal(1).scaleb(-n)
    return float(Decimal(str(x)).quantize(q, rounding=ROUND_HALF_UP))


# --- interval/range join --------------------------------------------------


def test_error_follows_click_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import q_error_follows_click

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    clicks = [r for r in ev if r.event_type == "click"]
    errors = defaultdict(list)
    for r in ev:
        if r.event_type == "error":
            errors[r.user_id].append(r.ts)

    win = timedelta(hours=2)
    ref_clicks: dict = defaultdict(int)
    ref_followed: dict = defaultdict(int)
    for c in clicks:
        ref_clicks[c.user_id] += 1
        if any(c.ts < t <= c.ts + win for t in errors[c.user_id]):
            ref_followed[c.user_id] += 1

    got = {
        r.user_id: (r.n_clicks, r.n_followed, r.follow_rate)
        for r in q_error_follows_click(spark, SF_DIR).collect()
    }
    assert set(got) == set(ref_clicks)
    total_followed = 0
    for uid, (n_clicks, n_followed, rate) in got.items():
        assert n_clicks == ref_clicks[uid]
        assert n_followed == ref_followed[uid]
        assert rate == pytest.approx(
            _r(ref_followed[uid] / ref_clicks[uid], 6), abs=1e-9
        )
        total_followed += n_followed
    # non-vacuity: the 2h window was chosen to produce matches at
    # EVERY sf (12 at sf0.001, 83 at sf0.01)
    assert total_followed > 0


def test_error_follows_click_plans_equi_join_not_nested_loop(spark):
    """The range predicate must ride the user_id EQUI join: a plan
    that degrades to BroadcastNestedLoopJoin / CartesianProduct
    evaluates |clicks|x|errors| pairs and dies at scale."""
    from ocr_intern_spark.operators.analytics import q_error_follows_click

    df = q_error_follows_click(spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in physical
    assert "CartesianProduct" not in physical
    assert "LeftSemi" in physical


# --- customer spend deciles (global_rank second consumer) -----------------


def test_customer_spend_deciles_match_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        q_customer_spend_deciles,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    spend: dict = defaultdict(float)
    for o in orders:
        spend[o.o_custkey] += o.o_totalprice
    spend = {k: _r(v, 2) for k, v in spend.items()}

    ranked = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    ref: dict = defaultdict(list)
    for i, (_ck, s) in enumerate(ranked):
        ref[int((i * 10) / n) + 1].append(s)

    got = {r.decile: r for r in q_customer_spend_deciles(spark, SF_DIR).collect()}
    assert set(got) == set(ref)
    # every decile populated once there are >= 10 ordering customers
    if n >= 10:
        assert set(got) == set(range(1, 11))
    for d, spends in ref.items():
        assert got[d].n_customers == len(spends)
        assert got[d].min_spend == pytest.approx(min(spends), abs=1e-6)
        assert got[d].max_spend == pytest.approx(max(spends), abs=1e-6)
        assert got[d].sum_spend == pytest.approx(
            _r(sum(spends), 2), abs=1e-4
        )


# --- Q15-style argmax without a window ------------------------------------


def test_top_supplier_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q15_END,
        _Q15_START,
        q_top_supplier_revenue,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    from datetime import datetime

    t0 = datetime.fromisoformat(_Q15_START)
    t1 = datetime.fromisoformat(_Q15_END)
    rev: dict = defaultdict(float)
    for r in li:
        if t0 <= r.l_shipdate < t1:
            rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    rev = {k: _r(v, 2) for k, v in rev.items()}
    assert rev, "Q15 window must be non-vacuous at sf0.001"
    mx = max(rev.values())
    winners = sorted(k for k, v in rev.items() if v == mx)

    got = q_top_supplier_revenue(spark, SF_DIR).collect()
    assert [r.s_suppkey for r in got] == winners
    for r in got:
        assert r.total_revenue == pytest.approx(mx, abs=1e-6)


# --- Q8-style market share ------------------------------------------------


def test_market_share_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _MKT_NATION,
        q_market_share_by_year,
    )

    rd = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet").collect()
    promo = {r.p_partkey for r in rd("part") if r.p_type == "PROMO"}
    eur = {r.r_regionkey for r in rd("region") if r.r_name == "EUROPE"}
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in rd("nation")}
    cust = {
        r.c_custkey: r.c_nationkey
        for r in rd("customer")
        if nat[r.c_nationkey][1] in eur
    }
    supp_nation = {r.s_suppkey: nat[r.s_nationkey][0] for r in rd("supplier")}
    orders = {r.o_orderkey: r for r in rd("orders")}

    vol_by_year: dict = defaultdict(float)
    fr_by_year: dict = defaultdict(float)
    n_by_year: dict = defaultdict(int)
    for r in rd("lineitem"):
        if r.l_partkey not in promo:
            continue
        o = orders[r.l_orderkey]
        if o.o_custkey not in cust:
            continue
        v = r.l_extendedprice * (1 - r.l_discount)
        y = o.o_orderdate.year
        vol_by_year[y] += v
        n_by_year[y] += 1
        if supp_nation[r.l_suppkey] == _MKT_NATION:
            fr_by_year[y] += v

    assert n_by_year, "join chain must be non-vacuous at sf0.001"
    assert any(v > 0 for v in fr_by_year.values()), (
        "the share nation must actually supply PROMO parts to EUROPE "
        "at sf0.001 — a zero share everywhere makes the CASE vacuous"
    )
    got = {r.o_year: r for r in q_market_share_by_year(spark, SF_DIR).collect()}
    assert set(got) == set(n_by_year)
    for y in n_by_year:
        assert got[y].n_items == n_by_year[y]
        assert got[y].mkt_share == pytest.approx(
            _r(fr_by_year[y] / vol_by_year[y], 6), abs=1e-6
        )


def test_market_share_broadcasts_every_dimension(spark):
    """The 7-table join must never shuffle lineitem: every join is a
    BroadcastHashJoin except (at most) the lineitem-orders-customer
    fact chain."""
    from ocr_intern_spark.operators.analytics import q_market_share_by_year

    df = q_market_share_by_year(spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in physical
