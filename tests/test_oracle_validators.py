"""Pin the normalizer oracle to the reference semantics
(/root/reference/src/postprocessing/validators.py) with hand-derived
cases, including every quirk in SURVEY.md §2.6."""

from ocr_intern_spark.oracle import validators as V


def test_ar2en_digits():
    assert V.ar2en_digits("٠١٢٣٤٥٦٧٨٩") == "0123456789"
    assert V.ar2en_digits("abc ١٢") == "abc 12"
    assert V.ar2en_digits(None) == ""


def test_cin():
    assert V.normalize_cin("AB 123456") == ("cin", "AB123456", True)
    assert V.normalize_cin("ab-12345") == ("cin", "AB12345", True)
    assert V.normalize_cin("X  99999") == ("cin", "X99999", True)
    t, v, ok = V.normalize_cin("x 12")
    assert (t, ok) == ("cin", False) and v == "x 12"
    # Arabic-indic digits are translated before the match
    assert V.normalize_cin("AB ١٢٣٤٥٦") == ("cin", "AB123456", True)


def test_date_two_digit_years():
    # <50 → 2000s, >=50 → 1900s (validators.py:48)
    assert V.normalize_date_ma("31/12/49") == ("date", "2049-12-31", True)
    assert V.normalize_date_ma("01/01/50") == ("date", "1950-01-01", True)
    assert V.normalize_date_ma("12/08/2025") == ("date", "2025-08-12", True)
    assert V.normalize_date_ma("12.08.2025") == ("date", "2025-08-12", True)
    assert V.normalize_date_ma("12-08-2025") == ("date", "2025-08-12", True)
    assert V.normalize_date_ma("٠١/٠١/٩٥") == ("date", "1995-01-01", True)
    # out-of-range day invalidates, value falls back to squashed input
    assert V.normalize_date_ma("32/01/2020") == ("date", "32/01/2020", False)
    assert V.normalize_date_ma("no date here")[2] is False


def test_phone():
    assert V.normalize_phone_ma("0612345678") == ("phone", "+212612345678", True)
    assert V.normalize_phone_ma("+212612345678") == ("phone", "+212612345678", True)
    # 212 then 0 both stripped ("21206…" → 8 digits → invalid path check)
    assert V.normalize_phone_ma("212 0612345678") == ("phone", "+212612345678", True)
    assert V.normalize_phone_ma("12345")[2] is False


def test_receipt():
    assert V.normalize_receipt_no("Reçu Nº 2024/1234") == (
        "receipt_no", "2024/1234", True)
    assert V.normalize_receipt_no("123-45-678") == ("receipt_no", "123/45/678", True)
    assert V.normalize_receipt_no("nothing")[2] is False


def test_ice_if():
    assert V.normalize_ice("001234567890123") == ("ice", "001234567890123", True)
    assert V.normalize_ice("123")[2] is False
    assert V.normalize_if("1234567") == ("if", "1234567", True)
    assert V.normalize_if("12345678") == ("if", "12345678", True)
    assert V.normalize_if("123456")[2] is False


def test_commune_always_valid():
    assert V.normalize_commune("casablanca anfa") == ("commune", "Anfa", True)
    assert V.normalize_commune("MAÂRIF") == ("commune", "Maârif", True)
    t, v, ok = V.normalize_commune("Rabat Agdal")
    assert ok is True and v == "Rabat Agdal"


def test_dispatch():
    assert V.normalize_field("cin", "AB 123456").type == "cin"
    assert V.normalize_field("date_naissance", "01/02/03").type == "date"
    assert V.normalize_field("tel_fixe", "0522334455").type == "phone"
    assert V.normalize_field("récépissé", "2024/1").type == "receipt_no"
    assert V.normalize_field("num_ice", "1").type == "ice"
    # \bif\b needs a word boundary: "gif" must NOT dispatch to if
    assert V.normalize_field("gif", "123").type == "text"
    assert V.normalize_field("if", "1234567").type == "if"
    assert V.normalize_field("commune", "anfa").type == "commune"
    assert V.normalize_field("nom_president", "Ali").type == "name"
    assert V.normalize_field("misc", " a  b ١ ") == ("text", "a b 1", True)
    # precedence: a key with both 'date' and 'tel' → date wins
    assert V.normalize_field("date_tel", "01/02/03").type == "date"
