"""Per-document extraction semantics — pure-Python oracle.

This module is the AUTHORITATIVE specification of the extraction
pipeline. It is a direct, loop-level transcription of the reference
behavior (citations inline, into /root/reference) and produces the
golden expected span sequences that the Spark pipeline
(``ocr_intern_spark.operators.extract``) must match exactly under
``(kind, text, media_ref, order)`` equality.

Pipeline spec (one document)
----------------------------
Input: ``(doc_id, spans)`` with
``spans: list[(kind, text, media_ref, offset)]``.

1. Spans are processed in ``offset`` order (stable on ties by array
   position) — input arrays may arrive shuffled.
2. ``boilerplate`` spans are dropped.
3. ``text`` spans get Boilerpipe-style link-density filtering (the
   north-star analogue of the reference's layout-based block
   classification, hybrid.py:46-80): chars inside ``<a …>…</a>``
   anchors divided by total chars; density > 1/3 ⇒ dropped as
   boilerplate. Survivors are emitted with anchors stripped and
   whitespace squashed (validators.py:12-13); empty after cleaning ⇒
   dropped.
4. ``heading`` spans are kept verbatim modulo whitespace squashing.
5. ``field`` spans carry ``"key: raw value"`` text; they are emitted
   as ``key=<normalized value>`` using the key-dispatch normalizers
   (validators.py:100-139). No ``:`` ⇒ generic text normalization.
6. ``media`` spans are OCR'd. A missing/empty media_ref emits a
   single ``error`` span (error capture per hybrid_ocr_gui.py:137-150
   — never fail the document). Otherwise the recognizer emits word
   tokens, which then flow through the reference's hybrid-path fusion:
     a. parse filter: keep tokens with nonempty stripped text and
        conf >= 0 (base.py:189-211);
     b. script filter F1: Arabic tokens must contain U+0600–U+06FF,
        Latin tokens must contain a-z (hybrid.py:27-44);
     c. cross-language overlap dedupe F4 with the ASYMMETRIC
        tie-break: an Arabic token loses to an overlapping French
        token on <=, a French token loses on strict <
        (hybrid.py:88-128);
     d. reading-order sort R2: line key = y // max(1, h); lines
        ascending; a line is RTL iff Arabic tokens are a STRICT
        majority; within a line sort by x, reversed when RTL, stable
        (reading_order.py:44-59).
   Each surviving token is emitted as an ``ocr`` span carrying the
   parent media_ref.
7. Output ``order`` is the 0-based position in the final sequence.

Doc-type classification (postprocess.py:77-97) is a separate operator
over the emitted texts: accent-folded keyword cascade whose elif
priority is semantic (``demande`` shadows ``autorisation``).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Any, Iterable, NamedTuple

from ocr_intern_spark.oracle.validators import normalize_field, squash_spaces


class Token(NamedTuple):
    """One OCR word box (shape of pytesseract image_to_data rows,
    base.py:177-211).

    ``kind`` extends the engine interface to the reference's region
    DETECTORS: ``"ocr"`` (default) tokens flow through the hybrid
    fusion; any other kind (``"handwriting"`` per
    main_window.py:66-95 F7, ``"stamp"`` per
    tests/unit/test_morocco_documents.py:248-265 F8) is a geometry
    candidate — the reference attaches those to the Document as
    separate region lists, so they bypass the parse/script/dedupe
    path and are emitted after the media's ocr spans, in emission
    order, with the bbox serialized as the span text."""

    text: str
    conf: float
    x: int
    y: int
    w: int
    h: int
    lang: str  # "ara" | "fra"
    kind: str = "ocr"


class Span(NamedTuple):
    kind: str
    text: str
    media_ref: str
    order: int


_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.DOTALL)
_TAG_RE = re.compile(r"</?a\b[^>]*>")


def guess_lang(text: str) -> str | None:
    """Script-based language guess (postprocess.py:13-21)."""
    if any("؀" <= ch <= "ۿ" for ch in text):
        return "arabic"
    if any("a" <= ch.lower() <= "z" for ch in text):
        return "french"
    return None


def fold_accents(s: str) -> str:
    """NFKD fold, drop combining marks (postprocess.py:23-30)."""
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", s) if not unicodedata.combining(ch)
    )


def classify_doc_type(joined_text: str) -> str | None:
    """Keyword cascade over the document text (postprocess.py:77-97).

    elif priority is load-bearing: certificate > application >
    authorization > declaration; 'declaration' matches the folded
    letters-only form with an optional middle 'e'.
    """
    low = joined_text.lower()
    fold = fold_accents(low)
    fold_letters = re.sub(r"[^a-z]+", "", fold)
    if "certificat" in fold or "شهادة" in low:
        return "certificate"
    if "demande" in fold or "طلب" in low:
        return "application"
    if "autorisation" in fold or "رخصة" in low:
        return "authorization"
    if re.search(r"d[ée]?claration", fold_letters) or "تصريح" in low:
        return "declaration"
    return None


def link_density(raw: str) -> float:
    """Fraction of characters inside <a> anchors (Boilerpipe-style)."""
    if not raw:
        return 0.0
    linked = sum(len(m) for m in _ANCHOR_RE.findall(raw))
    return linked / len(raw)


def strip_anchors(raw: str) -> str:
    return _TAG_RE.sub("", raw)


def _contains_arabic(s: str) -> bool:
    return any("؀" <= ch <= "ۿ" for ch in s or "")


def _contains_latin(s: str) -> bool:
    return any("a" <= ch.lower() <= "z" for ch in s or "")


def _boxes_overlap(a: Token, b: Token) -> bool:
    # hybrid.py:82-86 — strict axis-aligned open-interval intersection
    return (
        a.x < b.x + b.w and a.x + a.w > b.x and a.y < b.y + b.h and a.y + a.h > b.y
    )


def dedupe_overlaps(
    arabic: list[Token], french: list[Token]
) -> tuple[list[Token], list[Token]]:
    """Cross-language overlap dedupe, F4 (hybrid.py:88-128).

    Asymmetric tie-break: Arabic drops on conf <= French; French drops
    on conf < Arabic (against the SURVIVING Arabic set).
    """
    keep_ar: list[Token] = []
    for ar in arabic:
        if any(_boxes_overlap(ar, fr) and ar.conf <= fr.conf for fr in french):
            continue
        keep_ar.append(ar)
    keep_fr: list[Token] = []
    for fr in french:
        if any(_boxes_overlap(ar, fr) and fr.conf < ar.conf for ar in keep_ar):
            continue
        keep_fr.append(fr)
    return keep_ar, keep_fr


def sort_for_reading(tokens: list[Token]) -> list[Token]:
    """Reading-order reconstruction, R2 (reading_order.py:44-59).

    Line binning by y // max(1, h); per line an RTL vote (Arabic
    STRICT majority); stable sort by x within the line, reversed when
    RTL. Line dict preserves insertion order within a bin, exactly
    like the reference's dict-of-lists.
    """
    lines: dict[int, list[Token]] = {}
    for t in tokens:
        key = int(t.y // max(1, t.h))
        lines.setdefault(key, []).append(t)
    out: list[Token] = []
    for key in sorted(lines):
        line = lines[key]
        arabic_cnt = sum(1 for t in line if t.lang.lower().startswith("arab"))
        rtl = arabic_cnt > len(line) / 2
        out.extend(sorted(line, key=lambda t: t.x, reverse=rtl))
    return out


def ocr_media(tokens: Iterable[Token]) -> list[Token]:
    """Full hybrid fusion over raw recognizer tokens: parse filter →
    F1 script filter → F4 dedupe → R2 reading order."""
    parsed = [t for t in tokens if (t.text or "").strip() and t.conf >= 0]
    arabic = [t for t in parsed if t.lang == "ara" and _contains_arabic(t.text)]
    french = [t for t in parsed if t.lang == "fra" and _contains_latin(t.text)]
    keep_ar, keep_fr = dedupe_overlaps(arabic, french)
    # Reference merges the per-language map for ordering
    # (flatten_results iterates dict values: arabic first, then french
    # — reading_order.py:32-41 over {"arabic": …, "french": …}); the
    # language identity carried into the RTL vote is the MAP KEY
    # ("arabic"/"french"), so engine codes are widened here —
    # sort_for_reading's startswith("arab") check (reading_order.py:54)
    # only ever sees the long-form names.
    merged = [t._replace(lang="arabic") for t in keep_ar] + [
        t._replace(lang="french") for t in keep_fr
    ]
    return sort_for_reading(merged)


def doc_confidence(spans: list[dict[str, Any]], recognize: Any) -> float:
    """A6 overall document confidence (hybrid_ocr_gui.py:96-102):
    mean of the confidences of every token surviving the hybrid
    fusion, across all the document's media spans; 0.0 when none."""
    confs: list[float] = []
    for s in spans:
        if (s.get("kind") or "") == "media" and (s.get("media_ref") or ""):
            toks = list(recognize(s["media_ref"]))
            for t in ocr_media(t for t in toks if t.kind == "ocr"):
                confs.append(t.conf)
    return sum(confs) / len(confs) if confs else 0.0


def extract_document(
    spans: list[dict[str, Any]],
    recognize: Any,
) -> list[Span]:
    """Run the full per-document pipeline (spec in module docstring).

    ``spans``: dicts with keys kind/text/media_ref/offset.
    ``recognize``: callable media_ref -> list[Token] (the stub engine
    in tests; a real OCR engine in production).
    """
    ordered_in = sorted(
        enumerate(spans), key=lambda p: (p[1].get("offset") or 0, p[0])
    )
    out: list[tuple[str, str, str]] = []
    for _, s in ordered_in:
        kind = s.get("kind") or ""
        text = s.get("text") or ""
        ref = s.get("media_ref") or ""
        if kind == "boilerplate":
            continue
        elif kind == "text":
            if link_density(text) > 1.0 / 3.0:
                continue
            clean = squash_spaces(strip_anchors(text))
            if clean:
                out.append(("text", clean, ""))
        elif kind == "heading":
            clean = squash_spaces(text)
            if clean:
                out.append(("heading", clean, ""))
        elif kind == "field":
            if ":" in text:
                key, _, raw = text.partition(":")
            else:
                key, raw = "", text
            norm = normalize_field(key.strip(), raw.strip())
            out.append(("field", f"{key.strip()}={norm.value}", ""))
        elif kind == "media":
            if not ref:
                out.append(("error", "missing media_ref", ""))
                continue
            toks = list(recognize(ref))
            for tok in ocr_media(t for t in toks if t.kind == "ocr"):
                out.append(("ocr", tok.text.strip(), ref))
            # detector candidates (F7/F8): after the ocr spans,
            # emission order, bbox as text (see Token docstring)
            for t in toks:
                if t.kind != "ocr":
                    out.append((t.kind, f"{t.x},{t.y},{t.w},{t.h}", ref))
        # unknown kinds are dropped
    return [Span(k, t, r, i) for i, (k, t, r) in enumerate(out)]
