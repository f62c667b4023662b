"""Pure-Python reference pins for the session-7 web-curation operators:
PII redaction (counts + verified masking), canonical-URL dedup
(normalization invariants + exact groups), OBELICS-style interleave
filtering (closed-form per-doc recompute), and line-wrap de-hyphenation
(round-trip restoration). Each test recomputes the operator's exact
output from the parquet input with the stdlib and asserts frame
equality, plus non-vacuity pins so no rule branch is dead."""

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

EMAIL_RE = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
PHONE_RE = re.compile(r"\+\d{2}-\d{3}-\d{4}")
IP_RE = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _pii_probe(doc_id: int, text: str) -> str:
    base = text.strip().lower()
    m = doc_id % 4
    if m == 0:
        return f"{base} mail user{doc_id}@example.com and admin@test.org now"
    if m == 1:
        return f"{base} call +12-345-{doc_id % 10000:04d} today"
    if m == 2:
        return f"{base} from 10.{doc_id % 256}.{doc_id % 7}.{doc_id % 13} gateway"
    return base


def test_pii_redact_exact(spark, docs):
    from ocr_intern_spark.operators.curation import q_pii_redact

    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ip"], r["redacted_md5"])
        for r in q_pii_redact(spark, SF_DIR).collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        probe = _pii_probe(doc_id, text)
        red = IP_RE.sub(
            "<IP>", PHONE_RE.sub("<PHONE>", EMAIL_RE.sub("<EMAIL>", probe))
        )
        exp = (
            len(EMAIL_RE.findall(probe)),
            len(PHONE_RE.findall(probe)),
            len(IP_RE.findall(probe)),
            hashlib.md5(red.encode()).hexdigest(),
        )
        assert got[doc_id] == exp, doc_id


def test_pii_redact_class_counts(spark):
    """Every injection class detects exactly its payload; the clean
    class (doc_id%4==3) is the false-positive guard."""
    from ocr_intern_spark.operators.curation import q_pii_redact

    rows = q_pii_redact(spark, SF_DIR).collect()
    for r in rows:
        m = r["doc_id"] % 4
        assert (r["n_email"], r["n_phone"], r["n_ip"]) == {
            0: (2, 0, 0),
            1: (0, 1, 0),
            2: (0, 0, 1),
            3: (0, 0, 0),
        }[m], r


def _canonical_url(doc_id: int, text: str) -> str:
    toks = text.strip().lower().split()
    w = toks[0] if toks else "x"
    k = doc_id % 5
    v = doc_id % 6
    url = {
        0: f"https://WWW.Example{k}.COM:443/path/{w}/",
        1: f"https://www.example{k}.com/path/{w}?utm_source=x&utm_campaign=y",
        2: f"http://example{k}.com:80/path/{w}#frag",
        3: f"https://example{k}.com/path/{w}?id=7&utm_medium=z",
        4: f"https://www.example{k}.com/path/{w}",
        5: f"https://example{k}.com//path//{w}",
    }[v]
    scheme = re.match(r"^(https?)://", url).group(1).lower()
    host = re.match(r"^https?://([^/?#]+)", url).group(1).lower()
    host = re.sub(r":(443|80)$", "", re.sub(r"^www\.", "", host))
    path = re.sub(r"/$", "", re.sub(r"/{2,}", "/",
                  re.match(r"^https?://[^/?#]+([^?#]*)", url).group(1)))
    path = path or "/"
    qm = re.search(r"\?([^#]*)", url)
    q = "&".join(
        p for p in (qm.group(1) if qm else "").split("&")
        if not p.startswith("utm_")
    )
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def test_url_canonical_exact_groups(spark, docs):
    from ocr_intern_spark.operators.curation import q_url_canonicalize

    exp_groups: dict = {}
    for doc_id, text in docs:
        c = _canonical_url(doc_id, text)
        n, keeper = exp_groups.get(c, (0, None))
        exp_groups[c] = (n + 1, doc_id if keeper is None else min(keeper, doc_id))
    got = {
        r["canonical_url"]: (r["n_docs"], r["keeper_doc_id"])
        for r in q_url_canonicalize(spark, SF_DIR).collect()
    }
    assert got == exp_groups


def test_url_canonical_invariants(spark):
    """No canonical URL retains any of the mess the normalizer must
    strip, and the messy variants actually collapse (dedup bites)."""
    from ocr_intern_spark.operators.curation import q_url_canonicalize

    rows = q_url_canonicalize(spark, SF_DIR).collect()
    for r in rows:
        c = r["canonical_url"]
        assert "www." not in c and ":443" not in c and ":80" not in c
        assert "#" not in c and "utm_" not in c and "//path" not in c
        assert c == c.lower()
    assert any(r["n_docs"] > 1 for r in rows), "dedup never collapsed anything"


def _interleave_ref(doc_id: int, text: str):
    toks = text.strip().split()[:24]
    n = len(toks)
    m = doc_id % 5
    pos = sorted(
        (((doc_id + 1) * (j + 1)) % (n + 1), j) for j in range(m)
    )
    prev, kept = 0, 0
    for p, j in pos:
        if p - prev >= 2 and j < 3:
            kept += 1
        prev = p
    return n, m, kept, kept >= 1 and n >= 4 * kept


def test_interleave_filter_exact(spark, docs):
    from ocr_intern_spark.operators.curation import q_interleave_filter

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_media"], r["n_media_kept"], r["doc_keep"])
        for r in q_interleave_filter(spark, SF_DIR).collect()
    }
    n_checked = 0
    for doc_id, text in docs:
        if not text.strip():
            assert doc_id not in got
            continue
        assert got[doc_id] == _interleave_ref(doc_id, text), doc_id
        n_checked += 1
    assert n_checked == len(got)


def test_interleave_filter_branches(spark, docs):
    """Every rule branch fires somewhere: no-media drop, gap drop,
    media cap, text-starvation drop, and plain keeps."""
    from ocr_intern_spark.operators.curation import q_interleave_filter

    rows = q_interleave_filter(spark, SF_DIR).collect()
    by = {r["doc_id"]: r for r in rows}
    assert any(r["n_media"] == 0 and not r["doc_keep"] for r in rows)
    assert any(r["n_media_kept"] < min(r["n_media"], 3) for r in rows), (
        "gap rule never dropped a media span"
    )
    assert any(r["n_media"] > 3 and r["n_media_kept"] <= 3 for r in rows)
    assert any(r["doc_keep"] for r in rows)
    assert any(r["n_media_kept"] >= 1 and not r["doc_keep"] for r in rows), (
        "token-per-image starvation rule never fired"
    )
    # the cap is a hard invariant, not a sampled one
    assert all(r["n_media_kept"] <= 3 for r in by.values())


DEHYPH_RE = re.compile(r"(\S)-\n(\S)")


def _dehyph_ref(doc_id: int, text: str):
    toks = text.strip().split()[:24]
    wrapped = " ".join(
        w[: len(w) // 2] + "-\n" + w[len(w) // 2:]
        if (doc_id + p) % 7 == 0 and len(w) >= 4
        else w
        for p, w in enumerate(toks, start=1)
    )
    repaired = DEHYPH_RE.sub(r"\1\2", wrapped)
    return (
        len(DEHYPH_RE.findall(wrapped)),
        repaired == " ".join(toks),
        hashlib.md5(repaired.encode()).hexdigest(),
    )


def test_dehyphenate_roundtrip(spark, docs):
    from ocr_intern_spark.operators.extract_queries import q_dehyphenate

    got = {
        r["doc_id"]: (r["n_repairs"], r["restored"], r["repaired_md5"])
        for r in q_dehyphenate(spark, SF_DIR).collect()
    }
    assert len(got) == len(docs)
    repairs = 0
    for doc_id, text in docs:
        exp = _dehyph_ref(doc_id, text)
        assert got[doc_id] == exp, doc_id
        repairs += exp[0]
    assert all(v[1] for v in got.values()), "a repair failed to round-trip"
    assert repairs > 0, "no break was ever synthesized"
    counts = Counter(v[0] for v in got.values())
    assert len(counts) > 1, "break-count variety missing"
