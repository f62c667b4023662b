"""Unit pins for the session-8 TPC-H decorrelation family: Q4-style
EXISTS→MAX fold, Q2-style per-group argmin join-back, Q16-style
count-distinct + NOT-IN anti-join, Q20-style nested two-grain
aggregate threshold, Q19-style disjunctive OR-of-ANDs pushdown.

Each query also has a hash-exact DuckDB oracle (verified at
sf0.001/sf0.01/sf0.1); these tests pin SEMANTICS against independent
pure-Python references computed from the raw parquet rows (so the
oracle and the implementation can't drift together) and the plan
shapes that make them scale."""

from collections import defaultdict
from datetime import timedelta
from math import floor

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"  # where sf0.001 is vacuous for a rule


def _cents(price: float, disc: float) -> int:
    return int(floor(price * (1 - disc) * 100))


# --- Q4: EXISTS folded into per-order MAX ----------------------------------


def test_late_order_priority_matches_textbook_exists(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q4_END,
        _Q4_LATE_DAYS,
        _Q4_START,
        q_late_order_priority,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ships = defaultdict(list)
    for r in li:
        ships[r.l_orderkey].append(r.l_shipdate)

    from datetime import datetime

    start = datetime.fromisoformat(_Q4_START)
    end = datetime.fromisoformat(_Q4_END)
    ref: dict = defaultdict(int)
    in_quarter = late = 0
    for o in orders:
        if not (start <= o.o_orderdate < end):
            continue
        in_quarter += 1
        cut = o.o_orderdate + timedelta(days=_Q4_LATE_DAYS)
        # the textbook correlated EXISTS, evaluated literally
        if any(s > cut for s in ships[o.o_orderkey]):
            ref[o.o_orderpriority] += 1
            late += 1

    got = {
        r.o_orderpriority: r.n_late_orders
        for r in q_late_order_priority(spark, SF_DIR).collect()
    }
    assert got == dict(ref)
    # non-vacuity: the threshold splits the quarter both ways
    assert 0 < late < in_quarter


def test_late_order_priority_scans_two_lineitem_columns(spark):
    """The EXISTS fold must keep the fact aggregate narrow: only
    (l_orderkey, l_shipdate) may reach the lineitem scan — a plan
    that drags orders columns into the aggregate side re-joined the
    fact."""
    from ocr_intern_spark.operators.analytics import q_late_order_priority

    p = (
        q_late_order_priority(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "struct<l_orderkey:bigint,l_shipdate:timestamp_ntz>" in p
    # the quarter filter reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in p


# --- Q2: per-group argmin join-back, ties kept ------------------------------


def test_min_cost_supplier_matches_correlated_min(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q2_MAX_SIZE,
        _Q2_REGION,
        _Q2_TOPK,
        _Q2_TYPE,
        q_min_cost_supplier,
    )

    part = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    region = spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()

    eur_keys = {r.r_regionkey for r in region if r.r_name == _Q2_REGION}
    nat = {n.n_nationkey: n for n in nation}
    euro = {
        s.s_suppkey: s
        for s in supp
        if nat[s.s_nationkey].n_regionkey in eur_keys
    }
    scoped = {
        p.p_partkey
        for p in part
        if p.p_type == _Q2_TYPE and p.p_size <= _Q2_MAX_SIZE
    }
    per_ps: dict = {}
    for r in li:
        if r.l_partkey in scoped and r.l_suppkey in euro:
            k = (r.l_partkey, r.l_suppkey)
            c = _cents(r.l_extendedprice, r.l_discount)
            per_ps[k] = min(per_ps.get(k, c), c)
    best: dict = {}
    for (pk, _), c in per_ps.items():
        best[pk] = min(best.get(pk, c), c)
    ref = []
    for (pk, sk), c in per_ps.items():
        if c == best[pk]:
            s = euro[sk]
            ref.append(
                (s.s_acctbal, s.s_name, nat[s.s_nationkey].n_name, pk, c)
            )
    # same total order as the query: acctbal DESC, n_name, s_name, pk
    ref.sort(key=lambda t: (-t[0], t[2], t[1], t[3]))
    ref = ref[:_Q2_TOPK]

    got = [
        (r.s_acctbal, r.s_name, r.n_name, r.p_partkey, r.cost_cents)
        for r in q_min_cost_supplier(spark, SF_DIR).collect()
    ]
    assert got == ref
    assert len(got) > 0
    # every returned cost IS its part's minimum (argmin invariant)
    for _, _, _, pk, c in got:
        assert c == best[pk]


def test_min_cost_supplier_plan_has_no_nested_loop(spark):
    from ocr_intern_spark.operators.analytics import q_min_cost_supplier

    p = (
        q_min_cost_supplier(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the part scope filter reaches the part scan
    assert "EqualTo(p_type,STANDARD)" in p
    # top-K is a heap, not a global sort
    assert "TakeOrderedAndProject" in p


# --- Q16: count-distinct + NOT-IN anti-join ---------------------------------


def test_part_supplier_variety_matches_not_in(spark):
    """Pinned at sf0.01 — sf0.001 has zero negative-balance suppliers,
    so only sf0.01 exercises the blocklist anti-join."""
    from ocr_intern_spark.operators.analytics import (
        _Q16_EXCL_BRAND,
        _Q16_EXCL_TYPE,
        q_part_supplier_variety,
    )

    part = spark.read.parquet(f"{SF01_DIR}/part.parquet").collect()
    supp = spark.read.parquet(f"{SF01_DIR}/supplier.parquet").collect()
    li = spark.read.parquet(
        f"{SF01_DIR}/lineitem.parquet"
    ).select("l_partkey", "l_suppkey").collect()

    blocked = {s.s_suppkey for s in supp if s.s_acctbal < 0}
    assert blocked, "sf0.01 must exercise the blocklist"
    pinfo = {
        p.p_partkey: (p.p_brand, p.p_type, p.p_size)
        for p in part
        if p.p_brand != _Q16_EXCL_BRAND and p.p_type != _Q16_EXCL_TYPE
    }
    groups = defaultdict(set)
    for r in set((r.l_partkey, r.l_suppkey) for r in li):
        if r[1] not in blocked and r[0] in pinfo:
            groups[pinfo[r[0]]].add(r[1])
    ref = {k: len(v) for k, v in groups.items()}

    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in q_part_supplier_variety(spark, SF01_DIR).collect()
    }
    assert got == ref
    # the blocklist actually removed suppliers from at least one group
    with_blocked = defaultdict(set)
    for r in set((r.l_partkey, r.l_suppkey) for r in li):
        if r[0] in pinfo:
            with_blocked[pinfo[r[0]]].add(r[1])
    assert any(
        len(with_blocked[k]) > ref[k] for k in ref
    ), "blocklist never changed a count — vacuous anti-join"


def test_part_supplier_variety_distinct_before_dimension_join(spark):
    """The (part, supplier) distinct must collapse the fact BEFORE
    the part-attribute join: the join input is pairs, not lineitems."""
    from ocr_intern_spark.operators.analytics import q_part_supplier_variety

    p = (
        q_part_supplier_variety(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the fact scan reads exactly the two pair columns
    assert "struct<l_partkey:bigint,l_suppkey:bigint>" in p
    # the blocklist filter reaches the supplier scan
    assert "LessThan(s_acctbal,0.0)" in p


# --- Q20: nested two-grain aggregate threshold ------------------------------


def test_dominant_part_suppliers_matches_nested_in(spark):
    from datetime import datetime

    from ocr_intern_spark.operators.analytics import (
        _Q20_END,
        _Q20_START,
        _Q20_TYPE,
        q_dominant_part_suppliers,
    )

    part = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()

    promo = {p.p_partkey for p in part if p.p_type == _Q20_TYPE}
    start = datetime.fromisoformat(_Q20_START)
    end = datetime.fromisoformat(_Q20_END)
    per_ps: dict = defaultdict(int)
    for r in li:
        if r.l_partkey in promo and start <= r.l_shipdate < end:
            per_ps[(r.l_partkey, r.l_suppkey)] += int(
                floor(r.l_quantity * 10)
            )
    per_part: dict = defaultdict(int)
    for (pk, _), q in per_ps.items():
        per_part[pk] += q
    ref_n: dict = defaultdict(int)
    ref_q: dict = defaultdict(int)
    n_dom = 0
    for (pk, sk), q in per_ps.items():
        if q * 10 > per_part[pk] * 3:  # the textbook 30% dominance
            ref_n[sk] += 1
            ref_q[sk] += q
            n_dom += 1

    names = {s.s_suppkey: s.s_name for s in supp}
    got = [
        (r.s_suppkey, r.s_name, r.n_dominant_parts, r.dom_q10)
        for r in q_dominant_part_suppliers(spark, SF_DIR).collect()
    ]
    expect = sorted(
        (
            (sk, names[sk], ref_n[sk], str(ref_q[sk]))
            for sk in ref_n
        ),
        key=lambda t: t[1],
    )
    assert got == expect
    # non-vacuity both ways: some pairs dominate, some don't
    assert 0 < n_dom < len(per_ps)


def test_dominant_part_suppliers_caches_pair_frame(spark):
    """Both grain consumers (per-part rollup, dominance join-back)
    must read the persisted (part, supplier) frame — without it each
    branch re-scans the fact."""
    from ocr_intern_spark.operators.analytics import (
        q_dominant_part_suppliers,
    )

    p = (
        q_dominant_part_suppliers(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # year + type filters reach the scans inside the cached plan
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in p
    assert "EqualTo(p_type,PROMO)" in p


# --- Q19: disjunctive OR-of-ANDs pushdown -----------------------------------


def test_bracket_revenue_matches_disjunction(spark):
    """Pinned at sf0.01 — the only sf where all three brackets are
    non-empty (sf0.001's part table misses two of the brands)."""
    from ocr_intern_spark.operators.analytics import (
        _Q19_BRANCHES,
        q_bracket_revenue,
    )

    part = spark.read.parquet(f"{SF01_DIR}/part.parquet").collect()
    li = spark.read.parquet(f"{SF01_DIR}/lineitem.parquet").collect()
    pinfo = {p.p_partkey: (p.p_brand, p.p_size) for p in part}

    ref_n: dict = defaultdict(int)
    ref_c: dict = defaultdict(int)
    for r in li:
        brand, size = pinfo[r.l_partkey]
        for i, (b, slo, shi, qlo, qhi) in enumerate(_Q19_BRANCHES, 1):
            if (
                brand == b
                and slo <= size <= shi
                and qlo <= r.l_quantity <= qhi
            ):
                ref_n[i] += 1
                ref_c[i] += _cents(r.l_extendedprice, r.l_discount)
                break  # first-match, same as the when-cascade

    got = {
        r.bracket: (r.n_items, r.revenue_cents)
        for r in q_bracket_revenue(spark, SF01_DIR).collect()
    }
    assert got == {i: (ref_n[i], str(ref_c[i])) for i in ref_n}
    assert set(got) == {1, 2, 3}, "all three brackets must fire at sf0.01"


def test_bracket_revenue_pushes_implied_predicates(spark):
    """The OR-of-ANDs must still prune both scans: the quantity
    envelope reaches the lineitem scan and the brand/size disjunction
    reaches the part scan."""
    from ocr_intern_spark.operators.analytics import q_bracket_revenue

    p = (
        q_bracket_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p
    assert "LessThanOrEqual(l_quantity,30.0)" in p
    # the part-side disjunction pushes as an Or filter
    assert "Or(" in p and "Brand#12" in p
