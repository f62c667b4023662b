"""Unit pins for the TPC-H Q9-style product-line profit query: the
composite-key (part, supplier) analytic-min decorrelation, the
pre-join partial aggregation to order grain, and the pushed part-name
filter.

The query also has a hash-exact DuckDB oracle (verified at
sf0.001/sf0.01/sf0.1); these tests pin SEMANTICS against an
independent pure-Python reference computed from the raw parquet rows
(so the oracle and the implementation can't drift together) and the
plan shapes that make it scale."""

from collections import defaultdict
from math import floor

SF_DIR = "/root/testdata/sf0.001"


def test_product_profit_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q9_PART_LIKE,
        q_product_profit,
    )

    part = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()

    scoped = {p.p_partkey for p in part if _Q9_PART_LIKE in p.p_name}
    nat = {n.n_nationkey: n.n_name for n in nation}
    supp_nation = {s.s_suppkey: nat[s.s_nationkey] for s in supp}
    order_year = {o.o_orderkey: o.o_orderdate.year for o in orders}

    lines = [r for r in li if r.l_partkey in scoped]
    # the supplier's observed best unit price per part (integer cents,
    # truncating division — matches Spark `div` / DuckDB `//` on
    # positives)
    ps: dict = {}
    for r in lines:
        unit = int(floor(r.l_extendedprice * 100)) // int(r.l_quantity)
        k = (r.l_partkey, r.l_suppkey)
        ps[k] = min(ps.get(k, unit), unit)

    ref: dict = defaultdict(int)
    for r in lines:
        rev = int(floor(r.l_extendedprice * (1 - r.l_discount) * 100))
        profit = rev - ps[(r.l_partkey, r.l_suppkey)] * int(r.l_quantity)
        key = (supp_nation[r.l_suppkey], order_year[r.l_orderkey])
        ref[key] += profit

    got = {
        (r.nation, r.o_year): int(r.profit_cents)
        for r in q_product_profit(spark, SF_DIR).collect()
    }
    assert got == dict(ref)
    # non-vacuity: the cost floor actually bites — some line is NOT
    # at its (part, supplier) minimum, so profit > 0 somewhere
    assert any(v > 0 for v in ref.values())
    # and the best-priced line itself contributes only its discount
    # margin, so the min is shared by at least one line per key
    assert len(ref) > 1


def test_product_profit_plan_shape(spark):
    """The plan must (a) push the part-name filter to the part scan,
    (b) run the analytic min PARTITIONED on the composite key — a
    'No Partition Defined' window here would single-thread the fact,
    and (c) pre-aggregate to order grain BELOW the orders join so the
    wide shuffle never carries line rows."""
    from ocr_intern_spark.operators.analytics import q_product_profit

    df = q_product_profit(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # (a) name filter pushed into the parquet scan
    assert "StringContains(p_name,widget)" in p
    # (b) the window is keyed on the composite key
    assert "windowspecdefinition(l_partkey" in p
    assert "l_suppkey" in p.split("windowspecdefinition", 1)[1][:120]
    # (c) a partial aggregate at (l_orderkey, n_name) grain exists —
    # i.e. HashAggregate keyed on l_orderkey appears in the plan
    assert "HashAggregate(keys=[l_orderkey" in p


# --- Q6: pure pushed-filter scan contract -----------------------------------


def test_forecast_revenue_matches_python_reference(spark):
    from datetime import datetime
    from math import floor

    from ocr_intern_spark.operators.analytics import (
        _Q6_DISC_HI,
        _Q6_DISC_LO,
        _Q6_MAX_QTY,
        _Q6_YEAR,
        q_forecast_revenue_change,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    lo, hi = datetime(_Q6_YEAR, 1, 1), datetime(_Q6_YEAR + 1, 1, 1)
    kept = [
        r
        for r in li
        if lo <= r.l_shipdate < hi
        and _Q6_DISC_LO <= r.l_discount <= _Q6_DISC_HI
        and r.l_quantity < _Q6_MAX_QTY
    ]
    want = sum(int(floor(r.l_extendedprice * r.l_discount * 100)) for r in kept)
    row = q_forecast_revenue_change(spark, SF_DIR).collect()[0]
    assert int(row.revenue_cents) == want
    assert row.n_lines == len(kept)
    # non-vacuity: every predicate excludes something
    assert 0 < len(kept) < len(li)


def test_forecast_revenue_scan_contract(spark):
    """Q6's whole value is the scan: all three predicates pushed, only
    the four needed columns read, zero keyed exchanges."""
    from ocr_intern_spark.operators.analytics import (
        q_forecast_revenue_change,
    )

    df = q_forecast_revenue_change(spark, SF_DIR)
    # formatted mode prints the FULL PushedFilters list (the plan
    # toString truncates it mid-predicate)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(mode)
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount" in p
    assert "LessThanOrEqual(l_discount" in p
    assert "LessThan(l_quantity" in p
    assert (
        "struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in p
    )
    assert "hashpartitioning" not in p
