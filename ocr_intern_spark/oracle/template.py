"""Template-field extraction oracle (T3 + A2-A5 semantics).

Loop-level transcription of the reference's TemplateExtractor.run
(/root/reference/src/templates/template_extractor.py:133-261) over
the token domain: the image-crop plumbing (T1 abs-box, P9 scale, T2
tess config) selects WHICH tokens a recognizer returns; here the
recognizer is addressed per region as ``"{media_ref}#{section}.{name}"``
and the semantics under test are the aggregation/selection rules:

* A2  area-weighted best token: strict ``conf*area > best``,
      initialized to ("", 0.0, 1) (:164-180);
* A3  interpolated median of token confidences (statistics.median at
      :194-195 — NOT the upper-median helper at :33-38), and a
      separate median over digit-bearing tokens (digit, '/' or '-',
      conf >= 0) (:183-195);
* A4  candidate scoring: joined / digits-only(+0.1 bias) / best
      token, chosen by strict lexicographic (valid, score, len) over
      an initial (best_text, base_conf, invalid-empty-norm) — note a
      bare "token" candidate never beats the initial tie (:197-228);
* A5  receipt confidence boost: iff field name is receipt_no and the
      chosen text fullmatches ``\\d{4}/\\d{3,5}`` and digit_conf
      exists → conf = max(2*digit_conf, 40.0) (:233-250);
* V11 normalize_field dispatch on "section.name" (:220);
* lang heuristic: explicit ``lang`` else arabic iff (section=='title'
  and name=='ar') or Arabic chars in the field name (:151-156).
"""

from __future__ import annotations

import re
import statistics
from typing import Any, Callable, Iterable

from ocr_intern_spark.oracle.semantics import Token
from ocr_intern_spark.oracle.validators import normalize_field

# (section, name, explicit_lang_or_None) — a representative template
# mirroring assets/templates/morocco_templates.json's assoc_receipt
# section/field structure.
DEFAULT_TEMPLATE: tuple[tuple[str, str, str | None], ...] = (
    ("title", "fr", None),
    ("title", "ar", None),
    ("header", "commune", "french"),
    ("header", "date", None),
    ("body", "receipt_no", None),
    ("body", "cin", "french"),
    ("body", "اسم الجمعية", None),
)

_DIGITISH = re.compile(r"[\d/-]")
_RECEIPT_FMT = re.compile(r"\d{4}/\d{3,5}")


def field_lang(section: str, name: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    is_ar = (section == "title" and name == "ar") or any(
        "؀" <= ch <= "ۿ" for ch in name
    )
    return "arabic" if is_ar else "french"


def extract_field(
    field_key: str, tokens: Iterable[Token]
) -> dict[str, Any]:
    """A2-A5 + V11 for one region's tokens → field record."""
    toks = list(tokens)

    best_text, best_conf, best_area = "", 0.0, 1
    for t in toks:
        area = max(1, int(t.w) * int(t.h))
        if t.conf * area > best_conf * best_area:
            best_text, best_conf, best_area = t.text or "", float(t.conf), area

    texts: list[str] = []
    token_confs: list[float] = []
    digit_confs: list[float] = []
    for t in toks:
        txt = t.text or ""
        conf = float(t.conf)
        if txt:
            texts.append(txt)
        if conf >= 0:
            token_confs.append(conf)
            if any(ch.isdigit() for ch in txt) or "/" in txt or "-" in txt:
                digit_confs.append(conf)

    base_conf = statistics.median(token_confs) if token_confs else 0.0
    digit_conf = statistics.median(digit_confs) if digit_confs else None

    joined = " ".join(texts).strip()
    digits_only = re.sub(r"[^\d/-]+", "", joined)

    candidates: list[tuple[str, float]] = []
    if joined:
        candidates.append((joined, base_conf))
    if digits_only:
        candidates.append(
            (digits_only, (digit_conf if digit_conf is not None else base_conf) + 0.1)
        )
    if best_text:
        candidates.append((best_text, base_conf))

    chosen_text, chosen_score = best_text or "", base_conf
    chosen_norm = {"type": "text", "value": "", "valid": False}
    for txt, sc in candidates:
        nrm = normalize_field(field_key, txt)
        cand = (1 if nrm.valid else 0, sc, len(txt))
        cur = (1 if chosen_norm["valid"] else 0, chosen_score, len(chosen_text))
        if cand > cur:
            chosen_text, chosen_score = txt, sc
            chosen_norm = {"type": nrm.type, "value": nrm.value, "valid": nrm.valid}

    is_receipt = field_key.split(".")[-1] == "receipt_no"
    if is_receipt:
        if digit_conf is not None and _RECEIPT_FMT.fullmatch(chosen_text):
            conf_out = max(float(digit_conf) * 2.0, 40.0)
        elif digit_conf is not None:
            conf_out = float(digit_conf)
        else:
            conf_out = float(base_conf)
    else:
        conf_out = float(base_conf)

    return {
        "value": chosen_text,
        "norm": chosen_norm["value"],
        "valid": bool(chosen_norm["valid"]),
        "type": chosen_norm["type"],
        "conf": conf_out,
    }


def extract_template_fields(
    media_ref: str,
    recognize: Callable[[str], Iterable[Token]],
    template: tuple[tuple[str, str, str | None], ...] = DEFAULT_TEMPLATE,
) -> list[dict[str, Any]]:
    """All template fields for one media ref (T3 loop)."""
    out = []
    for section, name, explicit in template:
        key = f"{section}.{name}"
        rec = extract_field(key, recognize(f"{media_ref}#{key}"))
        rec.update(
            field_key=key,
            lang=field_lang(section, name, explicit),
            media_ref=media_ref,
        )
        out.append(rec)
    return out
