"""Unit pins for the session-6 additions: Q3-style unshipped-order
revenue, Q7-style bilateral nation trade, Q10-style returned-item
customers, Q21-style sole-late-supplier (decorrelated), CCNet-style
boilerplate line removal, and the RefinedWeb-style per-source quota.
Each also has a hash-exact DuckDB oracle row; these tests pin
SEMANTICS against independent pure-Python references and the plan
shapes that make them scale."""

from collections import defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _r(x: float, n: int) -> float:
    q = Decimal(1).scaleb(-n)
    return float(Decimal(str(x)).quantize(q, rounding=ROUND_HALF_UP))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- Q3-style unshipped orders ---------------------------------------------


def test_unshipped_orders_match_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q3_CUT,
        q_unshipped_order_revenue,
    )
    from datetime import datetime

    cut = datetime.fromisoformat(_Q3_CUT)
    cust = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
        if r.c_mktsegment == "BUILDING"
    }
    orders = {
        r.o_orderkey: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r.o_orderdate < cut and r.o_custkey in cust
    }
    rev: dict = defaultdict(float)
    meta = {}
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        o = orders.get(r.l_orderkey)
        if o is None or r.l_shipdate <= cut:
            continue
        rev[r.l_orderkey] += r.l_extendedprice * (1 - r.l_discount)
        meta[r.l_orderkey] = (o.o_orderdate, o.o_orderpriority)
    assert rev, "Q3 filter chain must be non-vacuous at sf0.001"
    top = sorted(
        ((_r(v, 2), k) for k, v in rev.items()), key=lambda t: (-t[0], t[1])
    )[:10]

    got = q_unshipped_order_revenue(spark, SF_DIR).collect()
    assert [(r.revenue, r.l_orderkey) for r in got] == top
    for r in got:
        assert (r.o_orderdate, r.o_orderpriority) == meta[r.l_orderkey]


def test_unshipped_orders_plan_is_take_ordered(spark):
    """Top-10 must be a per-partition heap merge, not a global sort."""
    from ocr_intern_spark.operators.analytics import q_unshipped_order_revenue

    p = _plan(q_unshipped_order_revenue(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


# --- Q7-style bilateral nation trade ----------------------------------------


def test_nation_trade_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q7_NATION_A,
        _Q7_NATION_B,
        q_nation_trade_volume,
    )

    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    supp = {
        r.s_suppkey: nat[r.s_nationkey]
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    cust = {
        r.c_custkey: nat[r.c_nationkey]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    pair = {_Q7_NATION_A, _Q7_NATION_B}
    vol: dict = defaultdict(float)
    n: dict = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        sn = supp[r.l_suppkey]
        cn = cust[orders[r.l_orderkey]]
        if sn in pair and cn in pair and sn != cn:
            key = (sn, cn, r.l_shipdate.year)
            vol[key] += r.l_extendedprice * (1 - r.l_discount)
            n[key] += 1
    assert n, "nation pair must trade at sf0.001"

    got = {
        (r.supp_nation, r.cust_nation, r.l_year): (r.volume, r.n_items)
        for r in q_nation_trade_volume(spark, SF_DIR).collect()
    }
    assert set(got) == set(n)
    for k in n:
        assert got[k][1] == n[k]
        assert got[k][0] == pytest.approx(_r(vol[k], 2), abs=1e-6)


# --- Q10-style returned-item customers ---------------------------------------


def test_returned_customers_match_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _Q10_END,
        _Q10_START,
        q_returned_item_customers,
    )
    from datetime import datetime

    start = datetime.fromisoformat(_Q10_START)
    end = datetime.fromisoformat(_Q10_END)
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if start <= r.o_orderdate < end
    }
    rev: dict = defaultdict(float)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        if r.l_returnflag != "R" or r.l_orderkey not in orders:
            continue
        rev[orders[r.l_orderkey]] += r.l_extendedprice * (1 - r.l_discount)
    assert rev, "returned-item quarter must be non-vacuous at sf0.001"
    top = sorted(
        ((_r(v, 2), k) for k, v in rev.items()), key=lambda t: (-t[0], t[1])
    )[:20]

    cust = {
        r.c_custkey: r
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    got = q_returned_item_customers(spark, SF_DIR).collect()
    assert [(r.revenue, r.c_custkey) for r in got] == top
    for r in got:
        c = cust[r.c_custkey]
        assert r.c_name == c.c_name
        assert r.nation == nat[c.c_nationkey]
        assert r.acctbal == pytest.approx(_r(c.c_acctbal, 2), abs=1e-9)


# --- Q21-style sole late supplier --------------------------------------------


def test_late_sole_supplier_matches_brute_force_exists(spark):
    """The decorrelated aggregate must reproduce the textbook
    EXISTS / NOT-EXISTS semantics exactly (the oracle SQL keeps the
    textbook form, so this pins the Python side of the same triangle).
    """
    from ocr_intern_spark.operators.analytics import (
        _Q21_LATE_DAYS,
        q_late_sole_supplier,
    )

    orders = {
        r.o_orderkey: r.o_orderdate
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    horizon = timedelta(days=_Q21_LATE_DAYS)
    by_order: dict = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        late = r.l_shipdate > orders[r.l_orderkey] + horizon
        by_order[r.l_orderkey].append((r.l_suppkey, late))

    ref: dict = defaultdict(int)
    n_excluded_multi_late = 0
    for lines in by_order.values():
        supps = {s for s, _ in lines}
        late_supps = {s for s, late in lines if late}
        if len(supps) > 1 and len(late_supps) > 1:
            n_excluded_multi_late += 1
        for s, late in lines:
            if not late:
                continue
            others = supps - {s}
            other_late = late_supps - {s}
            if others and not other_late:
                ref[s] += 1
    assert ref, "sole-late-supplier set must be non-vacuous at sf0.001"
    assert n_excluded_multi_late > 0, (
        "the NOT-EXISTS branch must actually exclude some orders, or "
        "the double correlation is vacuous"
    )

    got = [
        (r.s_suppkey, r.numwait)
        for r in q_late_sole_supplier(spark, SF_DIR).collect()
    ]
    want = sorted(ref.items(), key=lambda t: (-t[1], t[0]))
    assert got == want


def test_late_sole_supplier_plan_has_no_fact_self_join_explosion(spark):
    """The decorrelation means no nested-loop / cartesian anywhere and
    the fact is aggregated once, not three times."""
    from ocr_intern_spark.operators.analytics import q_late_sole_supplier

    p = _plan(q_late_sole_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# --- boilerplate line removal -------------------------------------------------


def _ref_line_dedup(docs):
    from ocr_intern_spark.operators.curation import BOILER_MIN_DOCS, LINE_W

    segs = {}
    for r in docs:
        toks = r.text.strip().lower().split()
        if not toks:
            continue
        segs[r.doc_id] = [
            " ".join(toks[i : i + LINE_W]) for i in range(0, len(toks), LINE_W)
        ]
    df: dict = defaultdict(set)
    for doc_id, lines in segs.items():
        for ln in lines:
            df[ln].add(doc_id)
    out = {}
    for doc_id, lines in segs.items():
        kept = [ln for ln in lines if len(df[ln]) < BOILER_MIN_DOCS]
        out[doc_id] = (len(lines), len(kept), " ".join(kept))
    return out, df


def test_line_dedup_matches_python_reference(spark):
    from ocr_intern_spark.operators.curation import (
        BOILER_MIN_DOCS,
        q_line_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ref, df = _ref_line_dedup(docs)
    boiler = {ln for ln, d in df.items() if len(d) >= BOILER_MIN_DOCS}
    assert boiler, "boilerplate threshold must bind at sf0.001"

    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
        for r in q_line_dedup(spark, SF_DIR).collect()
    }
    assert got == ref


def test_line_dedup_removes_every_copy_unlike_span_dedup(spark):
    """The CCNet rule drops boilerplate from its FIRST document too —
    the behavior that distinguishes it from q_span_dedup's C4
    keep-first rule: for every boilerplate line, the doc holding its
    first occurrence loses it as well (kept lines, checked per doc
    against the per-line verdicts, never include a boilerplate
    line)."""
    from ocr_intern_spark.operators.curation import (
        BOILER_MIN_DOCS,
        LINE_W,
        q_line_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ref, df = _ref_line_dedup(docs)
    boiler = {ln for ln, d in df.items() if len(d) >= BOILER_MIN_DOCS}
    first_docs = {min(df[ln]) for ln in boiler}
    assert first_docs

    got = {
        r.doc_id: r.clean_text
        for r in q_line_dedup(spark, SF_DIR).collect()
        if r.doc_id in first_docs
    }
    originals = {r.doc_id: r.text for r in docs if r.doc_id in first_docs}
    for doc_id, clean in got.items():
        # re-segment the ORIGINAL doc and keep only non-boiler lines:
        # the engine's reassembled text must equal that, i.e. the
        # first occurrence was removed like every other copy
        toks = originals[doc_id].strip().lower().split()
        lines = [
            " ".join(toks[i : i + LINE_W])
            for i in range(0, len(toks), LINE_W)
        ]
        expect = " ".join(ln for ln in lines if ln not in boiler)
        assert clean == expect
        assert len(expect.split()) < len(toks), (
            "a first-occurrence doc must actually shrink (span_dedup "
            "would have kept the line here)"
        )


# --- per-source quota ---------------------------------------------------------


def test_source_cap_matches_python_reference(spark):
    from ocr_intern_spark.operators.curation import CAP_K, q_source_cap

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()

    def qual(text: str) -> float:
        toks = text.strip().split()
        n = len(toks) if text.strip() else 0
        import re

        no_punct = re.sub(r"[^\w\s]", "", text, flags=re.UNICODE)
        punct = (len(text) - len(no_punct)) / len(text)
        from ocr_intern_spark.functions.text import STOPWORDS

        low = text.strip().lower().split()
        stop = sum(1 for w in low if w in STOPWORDS) / len(low)
        q = 0.0
        if 10 <= n <= 5000:
            q += 0.5
        if punct < 0.2:
            q += 0.25
        if stop > 0.01:
            q += 0.25
        return _r(q, 6)

    by_source: dict = defaultdict(list)
    for r in docs:
        by_source[r.source].append((-qual(r.text), -r.n_chars, r.doc_id))
    ref = []
    for src in sorted(by_source):
        rows = sorted(by_source[src])[:CAP_K]
        ref.extend(
            (src, doc_id, -nq, i + 1)
            for i, (nq, _, doc_id) in enumerate(rows)
        )

    got = [
        (r.source, r.doc_id, r.quality, r.rk)
        for r in q_source_cap(spark, SF_DIR).collect()
    ]
    assert got == ref
    # the cap must actually bind: every source has > CAP_K docs
    assert all(len(v) > CAP_K for v in by_source.values())


def test_source_cap_plan_uses_window_group_limit(spark):
    """rank<=K on a row_number window must be rewritten into
    WindowGroupLimit (per-partition top-K heaps before the exchange) —
    the property that makes a billion-doc source movable."""
    from ocr_intern_spark.operators.curation import q_source_cap

    p = _plan(q_source_cap(spark, SF_DIR))
    assert "WindowGroupLimit" in p
