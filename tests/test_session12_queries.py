"""Pure-Python reference pins for the session-12 operators. Each
reference is an independent stdlib recompute (hashlib/collections),
never a re-run of the Spark code."""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
GOLDEN = "/root/repo/tests/goldens/extract_full_pipeline.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- extract_span_regression -------------------------------------------------


def _golden_key():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    texts = t.column("text").to_pylist()
    return len(texts), sum(len(x) for x in texts)


def _span_fp_reference():
    """Per-doc (n_spans, fp) from the committed golden, recomputed with
    hashlib over the ord-sorted chr(31)/chr(30)-joined span sequence."""
    n_docs, text_chars = _golden_key()
    t = pq.read_table(GOLDEN)
    rows = zip(
        t.column("n_docs").to_pylist(),
        t.column("text_chars").to_pylist(),
        t.column("doc_id").to_pylist(),
        t.column("ord").to_pylist(),
        t.column("kind").to_pylist(),
        t.column("text").to_pylist(),
    )
    per_doc = defaultdict(list)
    for nd, tc, doc, ord_, kind, text in rows:
        if nd == n_docs and tc == text_chars:
            per_doc[doc].append((ord_, kind, text))
    out = {}
    for doc, spans in per_doc.items():
        spans.sort()
        joined = "\x1e".join(f"{k}\x1f{t}" for _, k, t in spans)
        out[doc] = (len(spans), hashlib.md5(joined.encode()).hexdigest())
    return out


def test_span_regression_matches_reference_and_all_green(spark):
    """The driver-facing gate row-for-row: live fingerprints equal the
    stdlib recompute of the golden, and every doc reports span_match."""
    import __spark_entry__ as e

    ref = _span_fp_reference()
    got = e.queries()["extract_span_regression"](spark, SF_DIR).collect()
    assert len(got) == len(ref) > 0
    for r in got:
        assert r["span_match"] is True, r["doc_id"]
        n, fp = ref[r["doc_id"]]
        assert (r["n_spans"], r["fp"]) == (n, fp)
        assert (r["golden_n_spans"], r["golden_fp"]) == (n, fp)


def test_span_regression_fp_is_order_and_boundary_sensitive():
    """The fingerprint moves if spans are reordered OR if a kind/text
    boundary shifts (the chr(31)/chr(30) separators make the join
    injective for separator-free span content)."""
    spans = [(0, "text", "aa bb"), (1, "media", ""), (2, "field", "date: 1")]

    def fp(seq):
        joined = "\x1e".join(f"{k}\x1f{t}" for _, k, t in sorted(seq))
        return hashlib.md5(joined.encode()).hexdigest()

    base = fp(spans)
    swapped = fp([(1, "text", "aa bb"), (0, "media", ""), (2, "field", "date: 1")])
    shifted = fp([(0, "textaa", " bb"), (1, "media", ""), (2, "field", "date: 1")])
    assert base != swapped
    assert base != shifted


def test_span_regression_nonvacuous():
    """The golden slice under test carries all three span kinds and
    multi-span docs — the gate is exercising real sequences."""
    ref = _span_fp_reference()
    n_docs, _ = _golden_key()
    assert len(ref) == n_docs
    assert max(n for n, _ in ref.values()) >= 4


def test_span_regression_degrades_closed_without_golden(spark, tmp_path):
    """At a corpus whose (n_docs, text_chars) key has no committed
    golden slice the gate emits 0 rows — matching the oracle's 0 —
    instead of spurious mismatches."""
    import __spark_entry__ as e

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(7)
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    assert e.queries()["extract_span_regression"](
        spark, str(tmp_path)
    ).count() == 0
