"""Unit pins for the session-5 additions: Q13-shape customer order
distribution (zero-order customers included), Q11-shape global-share
filter (exact integer threshold), Q18-shape large-order customers, and
the multimodal frame-sample query through the real mapInPandas stage.
Each also has a hash-exact DuckDB oracle row; these pin SEMANTICS
against independent pure-Python references and the plan shapes that
make them scale."""

import hashlib
from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


# --- Q13: customer order-count distribution ---------------------------------


def test_customer_order_distribution_includes_zero_order_customers(spark):
    from ocr_intern_spark.operators.analytics import (
        q_customer_order_distribution,
    )

    custs = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    per_cust = Counter(
        r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r.o_custkey in custs
    )
    ref = Counter(per_cust.get(c, 0) for c in custs)

    got = {
        r.c_count: r.custdist
        for r in q_customer_order_distribution(spark, SF_DIR).collect()
    }
    assert got == dict(ref)


def test_customer_order_distribution_counts_zero_order_customers(spark, tmp_path):
    """The Q13 point — customers with NO orders appear as c_count = 0.
    The driver corpus has such a customer only at sf0.1 (its hash row
    covers it there); this pins the zero-fill on a corpus built to
    have three."""
    from ocr_intern_spark.operators.analytics import (
        q_customer_order_distribution,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [(c, f"c{c}", 0, 0.0, "SEG") for c in range(1, 8)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    # customers 5,6,7 place no orders; 1 places 3, 2-4 place 1 each
    spark.createDataFrame(
        [(o, c, "O", 1.0, None, "1-URGENT") for o, c in
         [(10, 1), (11, 1), (12, 1), (13, 2), (14, 3), (15, 4)]],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")

    got = {
        r.c_count: r.custdist
        for r in q_customer_order_distribution(spark, d).collect()
    }
    assert got == {0: 3, 1: 3, 3: 1}


def test_customer_order_distribution_preaggregates_before_join(spark):
    """The wide shuffle must be the orders pre-agg, not a raw
    orders-to-customer join: the join input on the orders side is
    already an Aggregate."""
    from ocr_intern_spark.operators.analytics import (
        q_customer_order_distribution,
    )

    plan = q_customer_order_distribution(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join")
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("Aggregate", i)
    ]
    # at least one Aggregate sits BELOW the join (deeper in the tree =
    # later in the string) — the per-custkey order count
    assert join_pos != -1 and any(i > join_pos for i in agg_positions), plan


# --- Q11: global-share filter ------------------------------------------------


def test_major_revenue_parts_matches_integer_reference(spark):
    import math

    from ocr_intern_spark.operators.analytics import q_major_revenue_parts

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    cents: dict = defaultdict(int)
    for r in li:
        cents[r.l_partkey] += int(
            math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
        )
    total, np_ = sum(cents.values()), len(cents)
    ref = {
        k: str(v) for k, v in cents.items() if v * np_ * 10 > total * 12
    }

    got = {
        r.l_partkey: r.rev_cents
        for r in q_major_revenue_parts(spark, SF_DIR).collect()
    }
    assert got == ref
    assert 0 < len(got) < np_  # a real filter, not all/none


# --- Q18: large-order customers ----------------------------------------------


def test_large_order_customers_matches_python_reference(spark):
    from ocr_intern_spark.operators.analytics import (
        _LARGE_ORDER_MIN_QTY,
        q_large_order_customers,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    qty: dict = defaultdict(float)
    for r in li:
        qty[r.l_orderkey] += r.l_quantity
    big = {k: int(v) for k, v in qty.items() if v > _LARGE_ORDER_MIN_QTY}
    orders = {
        r.o_orderkey: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r.o_orderkey in big
    }
    ref = sorted(
        (
            (-round(o.o_totalprice, 2), k, big[k], o.o_custkey)
            for k, o in orders.items()
        ),
    )[:100]

    rows = q_large_order_customers(spark, SF_DIR).collect()
    assert [(-r.totalprice, r.orderkey, r.sum_qty, r.c_custkey) for r in rows] == [
        (tp, k, q, c) for tp, k, q, c in ref
    ]
    assert 0 < len(rows) <= 100


# --- multimodal frame sample ---------------------------------------------------


def test_frame_sample_query_clamps_and_hashes(spark):
    """n = min(4, n_frames) per doc, frame_sha = md5(payload ‖ byte(i))
    — re-derived here from the raw documents, independently of both
    the Spark stage and the DuckDB oracle."""
    from ocr_intern_spark.operators.curation import q_frame_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ref = {}
    for d in docs:
        n = min(4, 2 + d.doc_id % 7)
        for i in range(n):
            ref[(str(d.doc_id), i)] = hashlib.md5(
                d.text.encode("utf-8") + bytes([i])
            ).hexdigest()

    got = {
        (r.media_id, r.frame_idx): r.frame_sha
        for r in q_frame_sample(spark, SF_DIR).collect()
    }
    assert got == ref
    # the clamp is exercised in both directions: docs with fewer than
    # 4 frames sample them all, docs with more sample exactly 4
    per_doc = Counter(m for m, _ in got)
    assert min(per_doc.values()) == 2 and max(per_doc.values()) == 4


# --- asymmetric n-gram containment -------------------------------------------


def test_containment_detects_quote_that_jaccard_misses(spark, tmp_path):
    """A short doc quoted inside a much longer one: containment of the
    short doc is ~1.0 while Jaccard stays far below the 0.5 near-dup
    bar — the directional semantics Jaccard cannot express. Built on a
    synthetic corpus because the driver corpus's dups are symmetric."""
    from ocr_intern_spark.operators.dedup import (
        q_ngram_containment_pairs,
        q_ngram_jaccard_pairs,
    )

    # the shingler's blur drops every 7th word BY POSITION, so the
    # quote must start at the same position mod 7 in both docs —
    # 399 filler words (multiple of 7) keep the phases aligned
    quote = " ".join(f"q{i}" for i in range(40))
    filler = " ".join(f"f{i}" for i in range(399))
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, quote, "en", "s", len(quote)),
         (2, filler + " " + quote, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")

    cont = {
        (r.contained, r.container): r.containment
        for r in q_ngram_containment_pairs(spark, d).collect()
    }
    # doc 1 is contained in doc 2 (directional); doc 2 is NOT
    # contained in doc 1 (its filler shingles have no home)
    assert (1, 2) in cont and cont[(1, 2)] >= 0.8
    assert (2, 1) not in cont
    # and Jaccard misses the pair entirely at its 0.5 bar
    jac = {(r.a, r.b) for r in q_ngram_jaccard_pairs(spark, d).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac
