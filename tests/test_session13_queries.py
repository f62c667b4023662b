"""Pure-Python reference pins for the session-13 operators. Each
reference is an independent stdlib recompute, never a re-run of the
Spark code."""

from collections import Counter

import pytest


def test_cluster_topterms_keyness_reference(spark):
    """The integer-keyness ranking on a controlled frame: recompute
    tf_cell·total − tf_tot·cell_tokens with collections.Counter and
    pin the full top-3-per-cell output."""
    from ocr_intern_spark.operators.similarity import TOPTERMS_K

    docs = {
        0: "apple apple banana shared shared",
        1: "apple cherry shared shared shared",
        2: "dog dog dog shared elephant",
        3: "dog elephant shared shared shared",
    }
    cells = {0: 0, 1: 0, 2: 1, 3: 1}

    # independent reference
    tf_cell, tf_tot, cell_tokens = Counter(), Counter(), Counter()
    for d, text in docs.items():
        for t in text.split():
            tf_cell[(cells[d], t)] += 1
            tf_tot[t] += 1
            cell_tokens[cells[d]] += 1
    total = sum(tf_tot.values())
    expect = []
    for c in sorted(set(cells.values())):
        scored = sorted(
            (
                (-(tf_cell[(c, t)] * total - tf_tot[t] * cell_tokens[c]), t)
                for (cc, t) in tf_cell
                if cc == c
            ),
        )[:TOPTERMS_K]
        for rk, (neg, t) in enumerate(scored, 1):
            expect.append((c, rk, t, -neg))

    # spark path: same keyness over an injected assignment (bypass
    # the ivf stage — its cells are pinned by the semdedup oracle)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = (
        spark.createDataFrame(
            [(d, t) for d, txt in docs.items() for t in txt.split()],
            "doc long, tok string",
        )
        .join(
            spark.createDataFrame(
                list(cells.items()), "doc long, cell int"
            ),
            "doc",
        )
        .select("cell", "tok")
    )
    tfc = toks.groupBy("cell", "tok").agg(F.count(F.lit(1)).alias("tf_cell"))
    tft = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf_tot"))
    ct = toks.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_tokens"))
    tot = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    score = (
        F.col("tf_cell") * F.col("total_tokens")
        - F.col("tf_tot") * F.col("cell_tokens")
    ).alias("score")
    w = Window.partitionBy("cell").orderBy(F.desc("score"), F.asc("tok"))
    got = [
        (r["cell"], r["rk"], r["tok"], r["score"])
        for r in tfc.join(tft, "tok")
        .join(F.broadcast(ct), "cell")
        .crossJoin(F.broadcast(tot))
        .select("cell", "tok", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPTERMS_K)
        .select("cell", "rk", "tok", "score")
        .orderBy("cell", "rk")
        .collect()
    ]
    assert got == expect
    # non-vacuity: each cell's #1 term is its distinctive word, not
    # the corpus-wide stopword 'shared'
    tops = {c: t for (c, rk, t, s) in got if rk == 1}
    assert tops == {0: "apple", 1: "dog"}
    assert all(t != "shared" for t in tops.values())


def test_cluster_topterms_registry_plan(spark):
    """The registered query's plan: assignment broadcast + two-level
    token aggregates — no unpartitioned window, no cartesian beyond
    the 1-row/8-row broadcasts."""
    from ocr_intern_spark.operators.similarity import q_cluster_topterms

    df = q_cluster_topterms(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ranking window must be cell-partitioned; the only allowed
    # unpartitioned window is the bounded 8-row centroid numbering
    assert plan.count("No Partition Defined") <= 1, plan
    rows = df.collect()
    assert len(rows) == 24  # 8 cells × top-3
    assert all(r["rk"] in (1, 2, 3) for r in rows)


# --- events_ivm_retract ------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    """rows: (ts_str, event_id, event_type, value)"""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (dt.datetime.fromisoformat(ts), eid, et, v, 0)
            for ts, eid, et, v in rows
        ],
        "ts timestamp_ntz, event_id long, event_type string, "
        "value double, user_id long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_ivm_retract_vanishing_key(spark, tmp_path):
    """A key whose base rows are ALL retracted (and gets no delta
    insert) must vanish from the maintained view — the n→0 drop."""
    from ocr_intern_spark.operators.analytics import q_events_ivm_retract

    rows = [
        # base (first 8 of 10 by (ts, event_id)):
        ("2024-01-01T01:00:00", 41, "error", 1.0),   # retracted (%41)
        ("2024-01-01T02:00:00", 82, "error", 2.0),   # retracted (%41)
        ("2024-01-02T01:00:00", 1, "click", 3.0),
        ("2024-01-02T02:00:00", 2, "click", 4.0),
        ("2024-01-03T01:00:00", 3, "view", 5.0),
        ("2024-01-03T02:00:00", 123, "view", 6.0),   # retracted (%41)
        ("2024-01-04T01:00:00", 4, "click", 7.0),
        ("2024-01-04T02:00:00", 5, "view", 8.0),
        # delta inserts (last 2):
        ("2024-01-05T01:00:00", 164, "click", 9.0),  # %41==0 but an
        # insert — retraction applies to BASE rows only
        ("2024-01-05T02:00:00", 6, "view", 10.0),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r.day, r.event_type): (r.n, r.cents)
        for r in q_events_ivm_retract(spark, sf_dir).collect()
    }
    assert ("2024-01-01", "error") not in got  # vanished key
    assert got[("2024-01-03", "view")] == (1, "500")  # partial retract
    assert got[("2024-01-05", "click")] == (1, "900")  # %41 insert kept
    assert got[("2024-01-05", "view")] == (1, "1000")
    assert got[("2024-01-02", "click")] == (2, "700")
    assert got[("2024-01-04", "click")] == (1, "700")
    assert got[("2024-01-04", "view")] == (1, "800")
    assert len(got) == 6


# --- events_session_overlap --------------------------------------------------


def test_session_overlap_bin_dedup_and_edges(spark, tmp_path):
    """Three planted facts: a pair sharing TWO day bins counts once;
    a point session strictly inside another counts with 0 overlap; a
    disjoint user pairs with nobody."""
    from ocr_intern_spark.operators.analytics import (
        q_events_session_overlap,
    )

    def ev(ts, eid, user):
        return (ts, eid, "error", 1.0, user)

    import datetime as dt

    rows = [
        # user 1: one session Jan 1 20:00 → Jan 2 01:00 (5h intra-gap
        # < the 6h rule, so it MERGES and spans midnight)
        ev("2024-01-01T20:00:00", 1, 1),
        ev("2024-01-02T01:00:00", 2, 1),
        # user 2: session Jan 1 22:00 → Jan 2 02:00 (overlaps u1 on
        # BOTH day bins — must be counted exactly once, 3h overlap)
        ev("2024-01-01T22:00:00", 3, 2),
        ev("2024-01-02T02:00:00", 4, 2),
        # user 3: point session strictly inside u1's AND u2's
        ev("2024-01-02T00:30:00", 5, 3),
        # user 4: far away, no overlaps
        ev("2024-01-20T12:00:00", 6, 4),
    ]
    df = spark.createDataFrame(
        [
            (dt.datetime.fromisoformat(ts), eid, et, v, u)
            for ts, eid, et, v, u in rows
        ],
        "ts timestamp_ntz, event_id long, event_type string, "
        "value double, user_id long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.user_id: (r.n_pairs, r.n_partners, r.overlap_us_total)
        for r in q_events_session_overlap(spark, str(tmp_path)).collect()
    }
    three_h = str(3 * 3600 * 1_000_000)
    assert got[1] == (2, 2, three_h)       # u2 (3h) + u3 touch (0)
    assert got[2] == (2, 2, three_h)       # u1 (3h) + u3 touch (0)
    assert got[3] == (2, 2, "0")           # point containments, 0 us
    assert 4 not in got                    # disjoint user absent


# --- events_cms_heavy_hitters ------------------------------------------------


def test_cms_one_sided_error_and_reference(spark):
    """CMS law: the estimate never undercounts (min over rows of
    counters each ≥ the key's true count). Reference: rebuild the
    sketch with hashlib/Counter and reproduce every estimate."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        CMS_D,
        CMS_W,
        q_events_cms_heavy_hitters,
    )

    got = q_events_cms_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert got, "no heavy hitters emitted"
    assert all(r.overestimate >= 0 for r in got)
    assert all(r.n_cms == r.n_exact + r.overestimate for r in got)

    users = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id"]
    ).column("user_id").to_pylist()

    def bucket(i, key):
        h = hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:6]
        return int(h, 16) % CMS_W

    sketch = Counter()
    for u in users:
        for i in range(CMS_D):
            sketch[(i, bucket(i, u))] += 1
    exact = Counter(users)
    for r in got:
        est = min(sketch[(i, bucket(i, r.user_id))] for i in range(CMS_D))
        assert (r.n_exact, r.n_cms) == (exact[r.user_id], est), r.user_id


# --- multimodal_caption_align ------------------------------------------------


def test_caption_align_reference_and_plan(spark):
    """Reference: recompute the caption windows with plain Python
    slicing over the raw text; plan: scan → project only (no
    Exchange — the whole query is a narrow map)."""
    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.curation import CAP_W, q_caption_align

    df = q_caption_align(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # orderBy plans one range exchange for presentation; nothing else
    assert plan.count("Exchange") <= 1, plan

    got = {r.doc_id: r for r in df.collect()}
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        toks = text.strip().split()[:24]
        n = len(toks)
        m = n // 2
        before = " ".join(toks[max(0, m - CAP_W):m])
        after = " ".join(toks[m:m + CAP_W])
        r = got[doc_id]
        assert r.caption_before == before, doc_id
        assert r.caption_after == after, doc_id
        assert r.n_before == len(toks[max(0, m - CAP_W):m])
        assert r.n_after == len(toks[m:m + CAP_W])
        assert r.media_ref == f"img://{doc_id}"


# --- market_basket_pairs -----------------------------------------------------


def test_market_basket_reference(spark):
    """Counter-based recompute of support and integer lift for every
    emitted pair, plus the ranking laws."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        BASKET_CAP,
        BASKET_MINSUP,
        q_market_basket_pairs,
    )

    got = q_market_basket_pairs(spark, "/root/testdata/sf0.001").collect()
    assert got and all(r.p1 < r.p2 for r in got)
    assert all(r.support >= BASKET_MINSUP for r in got)

    tbl = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    )
    baskets = {}
    for o, p in zip(
        tbl.column("l_orderkey").to_pylist(),
        tbl.column("l_partkey").to_pylist(),
    ):
        baskets.setdefault(o, set()).add(p)
    baskets = {o: s for o, s in baskets.items() if len(s) <= BASKET_CAP}
    support = Counter()
    item = Counter()
    for s in baskets.values():
        for p in s:
            item[p] += 1
        ss = sorted(s)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                support[(ss[i], ss[j])] += 1
    n_orders = len(baskets)
    for r in got:
        assert support[(r.p1, r.p2)] == r.support, (r.p1, r.p2)
        assert r.lift_ppm == (
            r.support * n_orders * 1_000_000
        ) // (item[r.p1] * item[r.p2])
    # ranking law: sorted by (support desc, lift desc, p1, p2)
    keys = [(-r.support, -r.lift_ppm, r.p1, r.p2) for r in got]
    assert keys == sorted(keys)


# --- events_user_growth ------------------------------------------------------


def test_user_growth_laws_and_reference(spark):
    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import q_events_user_growth

    got = q_events_user_growth(spark, "/root/testdata/sf0.001").collect()
    assert all(r.n_active == r.n_new + r.n_returning for r in got)
    assert all(r.n_returning >= 0 for r in got)
    # cumulative is nondecreasing and ends at the total user count
    cums = [r.cum_users for r in got]
    assert cums == sorted(cums)
    tbl = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"]
    )
    users = set(tbl.column("user_id").to_pylist())
    assert cums[-1] == len(users)
    # day-1 law: everyone active on the first day is new
    assert got[0].n_new == got[0].n_active and got[0].n_returning == 0


# --- graph_link_predict ------------------------------------------------------


def test_link_predict_reference(spark):
    """Recompute common-neighbor counts from the collected kNN edge
    list; assert no emitted pair is an existing (symmetrized) edge
    and every count matches."""
    from collections import defaultdict

    from ocr_intern_spark.operators.similarity import (
        q_graph_link_predict,
        q_knn_join_topk,
    )

    edges = [
        (r.a, r.b)
        for r in q_knn_join_topk(spark, "/root/testdata/sf0.001")
        .select("a", "b")
        .collect()
    ]
    sym = set(edges) | {(b, a) for a, b in edges}
    nbrs = defaultdict(set)
    for a, b in sym:
        nbrs[a].add(b)
    got = q_graph_link_predict(spark, "/root/testdata/sf0.001").collect()
    assert got
    for r in got:
        assert (r.u, r.v) not in sym, (r.u, r.v)
        assert r.u < r.v
        cn = len(nbrs[r.u] & nbrs[r.v])
        assert cn == r.cn, (r.u, r.v)
        assert r.deg_sum == len(nbrs[r.u]) + len(nbrs[r.v])


# --- customer_k_anonymity ----------------------------------------------------


def test_k_anonymity_laws(spark):
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        KANON_K,
        q_customer_k_anonymity,
    )

    got = q_customer_k_anonymity(spark, "/root/testdata/sf0.001").collect()
    tbl = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_nationkey", "c_mktsegment"],
    )
    ref = Counter(
        zip(
            tbl.column("c_nationkey").to_pylist(),
            tbl.column("c_mktsegment").to_pylist(),
        )
    )
    assert len(got) == len(ref)
    n_viol = 0
    for r in got:
        assert r.class_size == ref[(r.c_nationkey, r.c_mktsegment)]
        assert r.violates_k == (r.class_size < KANON_K)
        assert r.rows_to_suppress == (r.class_size if r.violates_k else 0)
        n_viol += r.violates_k
    assert n_viol > 0, "audit vacuous: no violating cell on this corpus"


# --- events_target_encode_loo ------------------------------------------------


def test_target_encode_loo_reference_and_leak_safety(spark):
    """Reference recompute with Counters, plus the leakage law: a
    user's encoding must not change when THEIR OWN values change —
    verified analytically (their rows are subtracted out)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        q_events_target_encode_loo,
    )

    got = q_events_target_encode_loo(spark, "/root/testdata/sf0.001").collect()
    tbl = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "event_type", "value"],
    )
    import math

    s_t, n_t, s_u, n_u = Counter(), Counter(), Counter(), Counter()
    for u, t, v in zip(
        tbl.column("user_id").to_pylist(),
        tbl.column("event_type").to_pylist(),
        tbl.column("value").to_pylist(),
    ):
        c = math.floor(v * 100)
        s_t[t] += c
        n_t[t] += 1
        s_u[(u, t)] += c
        n_u[(u, t)] += 1
    assert len(got) == len(n_u)
    for r in got:
        k = (r.user_id, r.event_type)
        assert r.n_own == n_u[k]
        dn = n_t[r.event_type] - n_u[k]
        if dn == 0:
            assert r.enc_milli_cents == -1
        else:
            assert r.enc_milli_cents == (
                (s_t[r.event_type] - s_u[k]) * 1000
            ) // dn


# --- table_shard_manifest ----------------------------------------------------


def test_shard_manifest_laws(spark):
    """Shard laws: docs partition exactly into contiguous id ranges,
    byte totals are conserved, every shard crosses the target except
    possibly the last, and the prefix decomposition matches a serial
    recompute."""
    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.maintenance import (
        MEDIA_EST_BASE,
        SHARD_BYTES,
        q_shard_manifest,
    )

    got = q_shard_manifest(spark, "/root/testdata/sf0.001").collect()
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "n_chars"],
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("n_chars").to_pylist())
    )
    ref = {}
    pre = 0
    for doc_id, n_chars in docs:
        b = n_chars + MEDIA_EST_BASE + doc_id % 1024
        sid = pre // SHARD_BYTES
        n, s, lo, hi = ref.get(sid, (0, 0, doc_id, doc_id))
        ref[sid] = (n + 1, s + b, min(lo, doc_id), max(hi, doc_id))
        pre += b
    assert len(got) == len(ref)
    for r in got:
        assert (r.n_docs, r.shard_bytes, r.first_doc, r.last_doc) == ref[
            r.shard_id
        ], r.shard_id
    # contiguity: shard id ranges tile the corpus in order
    rows = sorted(got, key=lambda r: r.shard_id)
    for a, b in zip(rows, rows[1:]):
        assert b.first_doc == a.last_doc + 1
    assert sum(r.n_docs for r in got) == len(docs)


# --- text_contrastive_views --------------------------------------------------


def test_contrastive_views_partition_and_balance(spark):
    """Views must partition the 24-token prefix (disjoint, covering,
    order-preserving) and hash batching must hit every batch."""
    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.curation import (
        CONTRASTIVE_BATCHES,
        q_contrastive_views,
    )

    got = {r.doc_id: r for r in q_contrastive_views(
        spark, "/root/testdata/sf0.001").collect()}
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        toks = text.strip().split()[:24]
        if len(toks) < 2:
            assert doc_id not in got
            continue
        r = got[doc_id]
        rejoined = (r.view_a + " " + r.view_b).split()
        assert rejoined == toks, doc_id
        assert len(r.view_a.split()) == len(toks) // 2
    batches = {r.batch_id for r in got.values()}
    assert batches == set(range(CONTRASTIVE_BATCHES))


# --- cohort LTV + CUSUM ------------------------------------------------------


def test_cohort_ltv_laws(spark):
    from ocr_intern_spark.operators.analytics import q_cohort_ltv_triangle

    got = q_cohort_ltv_triangle(spark, "/root/testdata/sf0.001").collect()
    assert got
    by_cohort = {}
    for r in got:
        by_cohort.setdefault(r.cohort, []).append(r)
    for rows in by_cohort.values():
        # ages ascend, cumulative = running sum of rev, age 0 exists
        # (a cohort's first month always has its own first orders)
        assert rows[0].age == 0
        run = 0
        for r in rows:
            run += int(r.rev_cents)
            assert int(r.cum_rev_cents) == run


def test_cusum_flags_planted_shift(spark, tmp_path):
    """A type that doubles its rate mid-series must flag after the
    shift; a stationary type must not flag — the changepoint
    semantics pinned on a synthetic frame (the corpus is stationary,
    so its flags are legitimately sparse)."""
    from ocr_intern_spark.operators.analytics import (
        q_events_cusum_changepoints,
    )

    rows = []
    eid = 0
    for d in range(1, 29):
        # stationary type: 10/day
        for i in range(10):
            eid += 1
            rows.append((f"2024-01-{d:02d}T01:{i:02d}:00", eid, "steady", 1.0))
        # shifted type: 6/day for two weeks, then 18/day
        n = 6 if d <= 14 else 18
        for i in range(n):
            eid += 1
            rows.append((f"2024-01-{d:02d}T02:{i:02d}:00", eid, "shifty", 1.0))
    sf_dir = _write_events(spark, tmp_path, rows)
    got = q_events_cusum_changepoints(spark, sf_dir).collect()
    flagged = {(r.event_type, r.day) for r in got if r.flagged}
    assert all(t == "shifty" for t, _ in flagged), flagged
    assert flagged, "no changepoint flagged on the planted shift"
    # every flagged day is after the shift
    assert all(day >= "2024-01-15" for _, day in flagged)
    # cusum resets law: non-negative everywhere
    assert all(r.cusum_scaled >= 0 for r in got)


# --- events_bitemporal_asof --------------------------------------------------


def test_bitemporal_reference(spark):
    """Serial recompute: carve arrival epochs from the (ts, event_id)
    order, then for every grid cell take the struct-max over rows
    with epoch ≤ E and day ≤ V; assert every emitted cell matches and
    the matrix is monotone along both axes."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.temporal import (
        BITEMP_EPOCHS,
        BITEMP_VDAYS,
        q_events_bitemporal_asof,
    )

    tbl = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["ts", "event_id", "user_id", "value"],
    )
    rows = sorted(
        zip(
            tbl.column("ts").to_pylist(),
            tbl.column("event_id").to_pylist(),
            tbl.column("user_id").to_pylist(),
            tbl.column("value").to_pylist(),
        )
    )
    n = len(rows)
    import math

    ref = {}
    for i, (ts, eid, uid, v) in enumerate(rows):
        epoch = min(i * BITEMP_EPOCHS // n + 1, BITEMP_EPOCHS)
        cents = math.floor(v * 100)
        for e in range(epoch, BITEMP_EPOCHS + 1):
            for vi, vd in enumerate(BITEMP_VDAYS):
                if ts.date() <= dt.date.fromisoformat(vd):
                    k = (e, vd, uid)
                    cur = ref.get(k)
                    cand = (ts, eid, cents)
                    if cur is None or cand > cur:
                        ref[k] = cand
    got = q_events_bitemporal_asof(spark, "/root/testdata/sf0.001").collect()
    assert len(got) == len(ref)
    for r in got:
        exp = ref[(r.epoch, r.valid_asof, r.user_id)]
        assert (r.latest_event_id, r.latest_cents) == (exp[1], exp[2]), (
            r.epoch, r.valid_asof, r.user_id,
        )
    # monotone along both axes: more knowledge never loses the max
    cells = {
        (r.epoch, r.valid_asof, r.user_id): r.latest_event_id for r in got
    }
    for (e, vd, u), eid in cells.items():
        later = cells.get((e + 1, vd, u))
        if later is not None:
            assert ref[(e + 1, vd, u)] >= ref[(e, vd, u)]


# --- modality balance + RFM --------------------------------------------------


def test_modality_balance_laws(spark):
    from ocr_intern_spark.operators.curation import (
        MEDIA_TOKEN_COST,
        q_modality_balance,
    )

    got = q_modality_balance(spark, "/root/testdata/sf0.001").collect()
    assert got
    for r in got:
        assert r.media_tokens == r.n_docs * MEDIA_TOKEN_COST
        tot = r.text_tokens + r.media_tokens
        assert r.media_share_ppm == r.media_tokens * 1_000_000 // tot
        assert 0 < r.media_share_ppm < 1_000_000


def test_rfm_quintile_laws(spark):
    from collections import Counter

    from ocr_intern_spark.operators.analytics import (
        RFM_Q,
        q_customer_rfm_segments,
    )

    got = q_customer_rfm_segments(spark, "/root/testdata/sf0.001").collect()
    n = len(got)
    for axis in ("r_q", "f_q", "m_q"):
        counts = Counter(getattr(r, axis) for r in got)
        assert set(counts) == set(range(1, RFM_Q + 1))
        # integer carve: every quintile holds floor/ceil(n/5) members
        assert max(counts.values()) - min(counts.values()) <= 1
    # quintile 1 of recency really is the most recent fifth
    r1_max = max(r.recency_days for r in got if r.r_q == 1)
    r5_min = min(r.recency_days for r in got if r.r_q == RFM_Q)
    assert r1_max <= r5_min
    assert {r.segment for r in got} >= {"champion", "hibernating"}


# --- events_gini_concentration -----------------------------------------------


def test_gini_reference_and_bounds(spark):
    """Reference recompute with plain Python; bounds law 0 ≤ g < 1;
    uniform counts ⇒ Gini 0 on a synthetic frame."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        q_events_gini_concentration,
    )

    got = {r.event_type: r for r in q_events_gini_concentration(
        spark, "/root/testdata/sf0.001").collect()}
    tbl = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_type", "user_id"],
    )
    cnt = Counter(
        zip(tbl.column("event_type").to_pylist(),
            tbl.column("user_id").to_pylist())
    )
    by_type = {}
    for (t, u), x in cnt.items():
        by_type.setdefault(t, []).append(x)
    assert set(got) == set(by_type)
    for t, xs in by_type.items():
        a = sorted(xs)
        n, tot = len(a), sum(a)
        num = sum((2 * i - n - 1) * v for i, v in enumerate(a, 1))
        exp = num * 1_000_000 // (n * tot)
        r = got[t]
        assert (r.n_users, r.n_events, r.gini_ppm) == (n, tot, exp), t
        assert 0 <= r.gini_ppm < 1_000_000


# --- text_rouge_neardup_audit ------------------------------------------------


def test_rouge_neardup_reference(spark):
    """Counter-based recompute of multiset overlap and integer F1
    for every emitted pair, plus the bounds law."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.curation import q_rouge_neardup_audit

    got = q_rouge_neardup_audit(spark, "/root/testdata/sf0.001").collect()
    assert got
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    texts = dict(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    for r in got:
        ca = Counter(texts[r.pa].strip().lower().split())
        cb = Counter(texts[r.pb].strip().lower().split())
        ov = sum((ca & cb).values())
        la, lb = sum(ca.values()), sum(cb.values())
        assert (r.overlap, r.len_a, r.len_b) == (ov, la, lb), (r.pa, r.pb)
        assert r.f1_ppm == (2 * ov * 1_000_000) // (la + lb)
        assert 0 <= r.f1_ppm <= 1_000_000
        # prefix-64 collision pairs genuinely share leading content
        assert texts[r.pa][:64] == texts[r.pb][:64]


# --- revenue concentration + WAU stickiness ----------------------------------


def test_revenue_concentration_reference(spark):
    import math

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        CONC_CUTS_PPM,
        q_revenue_concentration,
    )

    got = {r.cut_ppm: r for r in q_revenue_concentration(
        spark, "/root/testdata/sf0.001").collect()}
    tbl = pq.read_table(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
    )
    spend = {}
    for c, p in zip(
        tbl.column("o_custkey").to_pylist(),
        tbl.column("o_totalprice").to_pylist(),
    ):
        spend[c] = spend.get(c, 0) + math.floor(p * 100)
    ordered = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(spend.values())
    for cut in CONC_CUTS_PPM:
        run = 0
        for i, (c, s) in enumerate(ordered, 1):
            run += s
            if run * 1_000_000 >= cut * total:
                break
        r = got[cut]
        assert r.n_customers == i, cut
        assert r.customer_share_ppm == i * 1_000_000 // len(ordered)
    # monotone: higher coverage needs at least as many customers
    ns = [got[c].n_customers for c in CONC_CUTS_PPM]
    assert ns == sorted(ns)


def test_wau_stickiness_reference(spark):
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_intern_spark.operators.analytics import (
        WAU_DAYS,
        q_events_wau_stickiness,
    )

    got = {r.day: r for r in q_events_wau_stickiness(
        spark, "/root/testdata/sf0.001").collect()}
    tbl = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"]
    )
    act = {
        (u, t.date())
        for u, t in zip(
            tbl.column("user_id").to_pylist(), tbl.column("ts").to_pylist()
        )
    }
    days = sorted({d for _, d in act})
    for day in days:
        dau = sum(1 for (u, d) in act if d == day)
        lo = day - dt.timedelta(days=WAU_DAYS - 1)
        wau = len({u for (u, d) in act if lo <= d <= day})
        r = got[day.isoformat()]
        assert (r.dau, r.wau) == (dau, wau), day
        assert r.stickiness_ppm == dau * 1_000_000 // wau
        assert r.wau >= r.dau
