"""E6 Arabic text shaping: ``get_display(arabic_reshaper.reshape(t))``
(/root/reference/src/ocr/arabic.py:64-82 postprocess_text and
:122-131 process) with a pure-Python fallback when the
``arabic_reshaper`` / ``python-bidi`` libraries are absent.

The fallback implements the documented behavior of those libraries'
default configuration on OCR-token text:

* reshape: map each Arabic letter (U+0621–U+064A) to its contextual
  presentation form (Unicode Arabic Presentation Forms-B,
  U+FE70–U+FEFC) by joining context; form the four lam-alef
  ligatures; DELETE harakat (U+064B–U+0652 — arabic_reshaper's
  ``delete_harakat=True`` default); tatweel (U+0640) joins on both
  sides.
* get_display: minimal Unicode-bidi reordering for the common OCR
  shapes — paragraph direction from the first strong character; in an
  RTL paragraph the runs are emitted in reverse order with RTL runs
  reversed character-wise and LTR/digit runs kept in logical order.
  (Full UAX#9 covers nested embeddings the OCR token stream never
  produces; the real python-bidi is preferred when importable.)

The presentation-forms table is public Unicode data (Arabic
Presentation Forms-B block), not reference code.
"""

from __future__ import annotations

# (isolated, final, initial, medial); initial/medial = None for
# right-joining letters (they never connect to the following letter)
_FORMS: dict[str, tuple[int, int | None, int | None, int | None]] = {
    "ء": (0xFE80, None, None, None),      # hamza
    "آ": (0xFE81, 0xFE82, None, None),    # alef madda
    "أ": (0xFE83, 0xFE84, None, None),    # alef hamza above
    "ؤ": (0xFE85, 0xFE86, None, None),    # waw hamza
    "إ": (0xFE87, 0xFE88, None, None),    # alef hamza below
    "ئ": (0xFE89, 0xFE8A, 0xFE8B, 0xFE8C),  # yeh hamza
    "ا": (0xFE8D, 0xFE8E, None, None),    # alef
    "ب": (0xFE8F, 0xFE90, 0xFE91, 0xFE92),  # beh
    "ة": (0xFE93, 0xFE94, None, None),    # teh marbuta
    "ت": (0xFE95, 0xFE96, 0xFE97, 0xFE98),  # teh
    "ث": (0xFE99, 0xFE9A, 0xFE9B, 0xFE9C),  # theh
    "ج": (0xFE9D, 0xFE9E, 0xFE9F, 0xFEA0),  # jeem
    "ح": (0xFEA1, 0xFEA2, 0xFEA3, 0xFEA4),  # hah
    "خ": (0xFEA5, 0xFEA6, 0xFEA7, 0xFEA8),  # khah
    "د": (0xFEA9, 0xFEAA, None, None),    # dal
    "ذ": (0xFEAB, 0xFEAC, None, None),    # thal
    "ر": (0xFEAD, 0xFEAE, None, None),    # reh
    "ز": (0xFEAF, 0xFEB0, None, None),    # zain
    "س": (0xFEB1, 0xFEB2, 0xFEB3, 0xFEB4),  # seen
    "ش": (0xFEB5, 0xFEB6, 0xFEB7, 0xFEB8),  # sheen
    "ص": (0xFEB9, 0xFEBA, 0xFEBB, 0xFEBC),  # sad
    "ض": (0xFEBD, 0xFEBE, 0xFEBF, 0xFEC0),  # dad
    "ط": (0xFEC1, 0xFEC2, 0xFEC3, 0xFEC4),  # tah
    "ظ": (0xFEC5, 0xFEC6, 0xFEC7, 0xFEC8),  # zah
    "ع": (0xFEC9, 0xFECA, 0xFECB, 0xFECC),  # ain
    "غ": (0xFECD, 0xFECE, 0xFECF, 0xFED0),  # ghain
    "ف": (0xFED1, 0xFED2, 0xFED3, 0xFED4),  # feh
    "ق": (0xFED5, 0xFED6, 0xFED7, 0xFED8),  # qaf
    "ك": (0xFED9, 0xFEDA, 0xFEDB, 0xFEDC),  # kaf
    "ل": (0xFEDD, 0xFEDE, 0xFEDF, 0xFEE0),  # lam
    "م": (0xFEE1, 0xFEE2, 0xFEE3, 0xFEE4),  # meem
    "ن": (0xFEE5, 0xFEE6, 0xFEE7, 0xFEE8),  # noon
    "ه": (0xFEE9, 0xFEEA, 0xFEEB, 0xFEEC),  # heh
    "و": (0xFEED, 0xFEEE, None, None),    # waw
    "ى": (0xFEEF, 0xFEF0, None, None),    # alef maksura
    "ي": (0xFEF1, 0xFEF2, 0xFEF3, 0xFEF4),  # yeh
}

# lam + <alef variant> → (isolated, final) ligature
_LAM_ALEF: dict[str, tuple[int, int]] = {
    "آ": (0xFEF5, 0xFEF6),
    "أ": (0xFEF7, 0xFEF8),
    "إ": (0xFEF9, 0xFEFA),
    "ا": (0xFEFB, 0xFEFC),
}

_HARAKAT = {chr(c) for c in range(0x064B, 0x0653)}
_TATWEEL = "ـ"
_LAM = "ل"


def _connects_forward(ch: str | None) -> bool:
    """Can ch join to the NEXT letter (i.e. has initial/medial forms)?"""
    if ch is None:
        return False
    if ch == _TATWEEL:
        return True
    forms = _FORMS.get(ch)
    return forms is not None and forms[2] is not None


def _connects_backward(ch: str | None) -> bool:
    """Can ch join to the PREVIOUS letter (i.e. has a final form)?"""
    if ch is None:
        return False
    if ch == _TATWEEL:
        return True
    forms = _FORMS.get(ch)
    return forms is not None and forms[1] is not None


def reshape(text: str) -> str:
    """Logical Arabic → presentation forms (harakat deleted)."""
    chars = [c for c in text if c not in _HARAKAT]
    out: list[str] = []
    i = 0
    n = len(chars)
    while i < n:
        ch = chars[i]
        forms = _FORMS.get(ch)
        if forms is None:
            out.append(ch)
            i += 1
            continue
        prev = chars[i - 1] if i > 0 else None
        prev_joins = _connects_forward(prev)
        # lam-alef ligature
        if ch == _LAM and i + 1 < n and chars[i + 1] in _LAM_ALEF:
            iso, fin = _LAM_ALEF[chars[i + 1]]
            out.append(chr(fin if prev_joins else iso))
            i += 2
            continue
        nxt = chars[i + 1] if i + 1 < n else None
        next_joins = _connects_backward(nxt)
        iso, fin, ini, med = forms
        if prev_joins and next_joins and med is not None:
            out.append(chr(med))
        elif prev_joins and fin is not None:
            out.append(chr(fin))
        elif next_joins and ini is not None:
            out.append(chr(ini))
        else:
            out.append(chr(iso))
        i += 1
    return "".join(out)


def _is_rtl(ch: str) -> bool:
    return (
        "؀" <= ch <= "ۿ"
        or "ݐ" <= ch <= "ݿ"
        or "ﭐ" <= ch <= "﷿"
        or "ﹰ" <= ch <= "﻿"
    )


def _is_ltr(ch: str) -> bool:
    return ch.isascii() and ch.isalnum() or ("À" <= ch <= "ɏ")


def get_display(text: str) -> str:
    """Minimal logical→visual reordering (see module docstring)."""
    first_strong = next(
        ("rtl" if _is_rtl(c) else "ltr" for c in text if _is_rtl(c) or _is_ltr(c)),
        "ltr",
    )
    if first_strong == "ltr":
        return text
    # split into maximal LTR runs (letters/digits) and everything else
    runs: list[tuple[bool, str]] = []  # (is_ltr_run, chunk)
    for ch in text:
        ltr = _is_ltr(ch)
        if runs and runs[-1][0] == ltr:
            runs[-1] = (ltr, runs[-1][1] + ch)
        else:
            runs.append((ltr, ch))
    visual: list[str] = []
    for ltr, chunk in reversed(runs):
        visual.append(chunk if ltr else chunk[::-1])
    return "".join(visual)


def postprocess_arabic(text: str) -> str:
    """E6 (arabic.py:64-82): empty/whitespace text passes through;
    otherwise reshape + bidi display. Uses the real libraries when
    importable, the fallback above otherwise."""
    if not text.strip():
        return text
    try:  # pragma: no cover - env-dependent
        import arabic_reshaper
        from bidi.algorithm import get_display as _bidi_display

        return _bidi_display(arabic_reshaper.reshape(text))
    except ImportError:
        return get_display(reshape(text))
