"""Field-normalizer semantics (pure Python oracle).

Reimplements the scalar normalizer surface of the reference
(`/root/reference/src/postprocessing/validators.py:5-139`) as plain
functions returning ``(type, value, valid)`` tuples. Semantics are
pinned exactly — including the quirks called out in SURVEY.md §2.6:

* 2-digit years: ``<50 -> +2000`` else ``+1900``
  (validators.py:48; the reference's ``y < 100 and y < 50`` has a
  redundant second test — behavior preserved, not the dead code).
* phone: strip a leading ``212`` THEN a leading ``0`` (both may fire).
* receipt: ``-`` normalized to ``/`` after the pattern match.
* commune: bidirectional case-insensitive substring match against the
  14 Casablanca communes; ALWAYS valid (validators.py:88-93).
* dispatch: keyword-substring cascade on the field key, first match
  wins (validators.py:100-139).

The Spark pipeline implements the same semantics as native Catalyst
column expressions in ``ocr_intern_spark.functions.normalizers`` —
two independent implementations, cross-checked by tests.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class Norm(NamedTuple):
    type: str
    value: str
    valid: bool


_ARABIC_INDIC = "٠١٢٣٤٥٦٧٨٩"
_AR2EN = {ord(c): str(i) for i, c in enumerate(_ARABIC_INDIC)}

# validators.py:16-31
CASA_COMMUNES = (
    "Anfa",
    "Sidi Belyout",
    "Maârif",
    "Roches Noires",
    "Aïn Sebaâ",
    "Aïn Chock",
    "Hay Hassani",
    "Sidi Othmane",
    "Sidi Bernoussi",
    "Ben M'Sick",
    "Moulay Rachid",
    "Bouskoura",
    "Dar Bouazza",
    "Médiouna",
)


def ar2en_digits(s: str | None) -> str:
    """Arabic-Indic digits -> ASCII digits (validators.py:5-9)."""
    return (s or "").translate(_AR2EN)


def squash_spaces(s: str | None) -> str:
    """Collapse whitespace runs, strip (validators.py:12-13)."""
    return re.sub(r"\s+", " ", s or "").strip()


def normalize_cin(text: str) -> Norm:
    # validators.py:34-39
    raw = ar2en_digits((text or "").upper())
    m = re.search(r"([A-Z]{1,2})\s*[- ]?(\d{5,6})", raw)
    if m is None:
        return Norm("cin", squash_spaces(text), False)
    return Norm("cin", m.group(1) + m.group(2), True)


def normalize_date_ma(text: str) -> Norm:
    # validators.py:42-54
    t = ar2en_digits(text).replace(".", "/").replace("-", "/")
    m = re.search(r"(\d{1,2})/(\d{1,2})/(\d{2,4})", t)
    if m is None:
        return Norm("date", squash_spaces(text), False)
    day, month, year = (int(g) for g in m.groups())
    if year < 100:
        year += 2000 if year < 50 else 1900
    ok = 1 <= day <= 31 and 1 <= month <= 12 and 1900 <= year <= 2100
    value = f"{year:04d}-{month:02d}-{day:02d}" if ok else squash_spaces(text)
    return Norm("date", value, ok)


def normalize_phone_ma(text: str) -> Norm:
    # validators.py:57-67
    digits = re.sub(r"\D+", "", ar2en_digits(text))
    if digits.startswith("212"):
        digits = digits[3:]
    if digits.startswith("0"):
        digits = digits[1:]
    ok = len(digits) == 9
    return Norm("phone", f"+212{digits}" if ok else squash_spaces(text), ok)


def normalize_receipt_no(text: str) -> Norm:
    # validators.py:70-75
    m = re.search(r"(\d{1,6}(?:[/-]\d{2,4}){1,3})", ar2en_digits(text))
    if m is None:
        return Norm("receipt_no", squash_spaces(text), False)
    return Norm("receipt_no", m.group(1).replace("-", "/"), True)


def normalize_ice(text: str) -> Norm:
    # validators.py:78-80
    digits = re.sub(r"\D", "", ar2en_digits(text))
    return Norm("ice", digits, len(digits) == 15)


def normalize_if(text: str) -> Norm:
    # validators.py:83-85
    digits = re.sub(r"\D", "", ar2en_digits(text))
    return Norm("if", digits, 7 <= len(digits) <= 8)


def normalize_commune(text: str) -> Norm:
    # validators.py:88-93 — bidirectional substring, always valid
    base = squash_spaces(text).title()
    low = base.lower()
    for c in CASA_COMMUNES:
        cl = c.lower()
        if low in cl or cl in low:
            return Norm("commune", c, True)
    return Norm("commune", base, True)


def normalize_name(text: str) -> Norm:
    # validators.py:96-97
    v = squash_spaces(text)
    return Norm("name", v, bool(v))


_DISPATCH_SUBSTR: tuple[tuple[tuple[str, ...], object], ...] = (
    (("cin", "cnie"), normalize_cin),
    (("date", "deliv", "délivr", "naissance", "dob", "تاريخ"), normalize_date_ma),
    (("tel", "tél", "phone", "gsm", "هاتف"), normalize_phone_ma),
    (("recep", "récép", "receipt", "وصل", "رقم الوصل"), normalize_receipt_no),
)

_NAME_KEYS = (
    "président",
    "president",
    "secr",
    "trésor",
    "association",
    "intitul",
    "name",
    "nom",
    "اسم الجمعية",
)

_COMMUNE_KEYS = ("commune", "arrondissement", "prefecture", "wilaya", "province")


def normalize_field(key: str, text: str) -> Norm:
    """Keyword-dispatch on the field key (validators.py:100-139).

    Cascade order is semantic: e.g. a key containing both "date" and
    "tel" resolves to date. The ``if`` type requires a word-boundary
    match (``\\bif\\b``) while ``ice`` is a bare substring.
    """
    k = (key or "").lower()
    t = text or ""
    for substrings, fn in _DISPATCH_SUBSTR:
        if any(sub in k for sub in substrings):
            return fn(t)
    if "ice" in k:
        return normalize_ice(t)
    if re.search(r"\bif\b", k):
        return normalize_if(t)
    if any(sub in k for sub in _COMMUNE_KEYS):
        return normalize_commune(t)
    if any(sub in k for sub in _NAME_KEYS):
        return normalize_name(t)
    return Norm("text", squash_spaces(ar2en_digits(t)), bool(squash_spaces(t)))
