"""Unit pins for the session-8 curation/quality additions: mojibake
repair, Flesch-Kincaid readability, temperature-scaled sampling
allocation, and the sketch-accuracy contract. Each also has a
hash-exact DuckDB oracle at sf0.001/sf0.01/sf0.1; these tests pin
semantics against independent pure-Python references and the plan
shapes (map-only where claimed, bounded windows)."""

import hashlib
import math
import re
from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"


# --- mojibake repair --------------------------------------------------------


def _probe(doc_id: int, text: str) -> str:
    suffix = {
        0: " cafÃ© rÃ©sumÃ©s trÃ¨s",
        1: " itâ€™s â€œquoted",
        2: " Ã¼ber maÃ±ana",
        3: "",
    }[doc_id % 4]
    return text.strip() + suffix


def test_mojibake_repair_matches_python_reference(spark):
    from ocr_intern_spark.operators.extract_queries import (
        MOJIBAKE_TABLE,
        q_mojibake_repair,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ref = {}
    for r in docs:
        p = _probe(r.doc_id, r.text)
        n = sum(p.count(bad) for bad, _ in MOJIBAKE_TABLE)
        fixed = p
        for bad, good in MOJIBAKE_TABLE:
            fixed = fixed.replace(bad, good)
        ref[r.doc_id] = (
            n,
            n == 0,
            hashlib.md5(fixed.encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.n_mojibake, r.clean, r.repaired_md5)
        for r in q_mojibake_repair(spark, SF_DIR).collect()
    }
    assert got == ref
    # non-vacuity: damaged and clean classes both present, and the
    # repair actually changes damaged docs
    assert any(v[0] > 0 for v in got.values())
    assert any(v[1] for v in got.values())


def test_mojibake_repair_removes_every_pattern():
    from ocr_intern_spark.operators.extract_queries import MOJIBAKE_TABLE

    # table invariant: no rule's OUTPUT contains any rule's INPUT, so
    # repair order can never re-create damage
    for _, good in MOJIBAKE_TABLE:
        for bad, _ in MOJIBAKE_TABLE:
            assert bad not in good


def test_mojibake_repair_is_map_only(spark):
    from ocr_intern_spark.operators.extract_queries import q_mojibake_repair

    p = (
        q_mojibake_repair(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in p  # no keyed shuffle anywhere
    assert "Window" not in p


# --- Flesch-Kincaid readability ----------------------------------------------


def test_readability_matches_python_reference(spark):
    from ocr_intern_spark.functions.text import q_readability_fk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ref = {}
    for r in docs:
        toks = r.text.strip().split()
        k = r.doc_id % 4 + 6
        punct = " ".join(
            w + "." if (i + 1) % k == 0 else w for i, w in enumerate(toks)
        )
        n_words = len(toks)
        n_sent = max(
            len(re.findall(r"\. ", punct))
            + (0 if re.search(r"\.$", punct) else 1),
            1,
        )
        n_syll = sum(
            max(len(re.findall(r"[aeiouy]+", w)), 1) for w in toks
        )
        grade_e4 = math.floor(
            (0.39 * n_words / n_sent + 11.8 * n_syll / n_words - 15.59)
            * 10000
        )
        ref[r.doc_id] = (n_words, n_sent, n_syll, grade_e4)

    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.fk_grade_e4)
        for r in q_readability_fk(spark, SF_DIR).collect()
    }
    assert got == ref
    # sanity: word-soup text lands in a plausible grade band, and the
    # doc_id-varied sentence length produces varied grades
    grades = {v[3] for v in got.values()}
    assert len(grades) > 10


# --- temperature-scaled sampling allocation ----------------------------------


def test_sample_alpha_matches_hamilton_apportionment(spark):
    from ocr_intern_spark.operators.curation import (
        SAMPLE_ALPHA_BUDGET,
        q_sample_alpha,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    n = defaultdict(int)
    for r in docs:
        n[r.lang] += 1
    sqi = {l: math.floor(math.sqrt(c) * 1e6) for l, c in n.items()}
    tot = sum(sqi.values())
    base = {l: SAMPLE_ALPHA_BUDGET * s // tot for l, s in sqi.items()}
    rem = {l: SAMPLE_ALPHA_BUDGET * s % tot for l, s in sqi.items()}
    leftover = SAMPLE_ALPHA_BUDGET - sum(base.values())
    order = sorted(n, key=lambda l: (-rem[l], l))
    ref = {
        l: (n[l], base[l] + (1 if i < leftover else 0))
        for i, l in enumerate(order)
    }

    got = {
        r.lang: (r.n_docs, r.sample_alloc)
        for r in q_sample_alpha(spark, SF_DIR).collect()
    }
    assert got == ref
    # the apportionment is exact: allocations sum to the budget
    assert sum(v[1] for v in got.values()) == SAMPLE_ALPHA_BUDGET
    # largest-remainder actually fired (some lang got the +1)
    assert leftover > 0
    # temperature upweights low-resource languages: the smallest lang's
    # allocation share strictly exceeds its document share
    lo = min(got, key=lambda l: got[l][0])
    n_total = sum(v[0] for v in got.values())
    assert got[lo][1] / SAMPLE_ALPHA_BUDGET > got[lo][0] / n_total


# --- sketch-accuracy contract -------------------------------------------------


def test_sketch_accuracy_exact_side_and_contract(spark):
    from ocr_intern_spark.operators.analytics import q_sketch_accuracy

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    users = defaultdict(set)
    counts = defaultdict(int)
    for r in ev:
        users[r.event_type].add(r.user_id)
        counts[r.event_type] += 1

    rows = q_sketch_accuracy(spark, SF_DIR).collect()
    assert {r.event_type for r in rows} == set(users)
    for r in rows:
        assert r.n_users_exact == len(users[r.event_type])
        assert r.n_events == counts[r.event_type]
        # the contract itself: both sketches within 5% of exact
        assert r.hll_within_5pct, f"HLL drifted >5% for {r.event_type}"
        assert r.p50_within_5pct, f"p50 sketch drifted for {r.event_type}"
