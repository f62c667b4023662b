"""Hand-computed cases pinning the fusion/order/classify oracle to the
reference loops (hybrid.py:27-128, reading_order.py:44-59,
postprocess.py:77-97)."""

from ocr_intern_spark.oracle.semantics import (
    Token,
    classify_doc_type,
    dedupe_overlaps,
    link_density,
    ocr_media,
    sort_for_reading,
)


def tok(text, conf=90.0, x=0, y=0, w=80, h=18, lang="fra"):
    return Token(text, conf, x, y, w, h, lang)


def test_dedupe_asymmetric_tiebreak():
    # Equal confidence + overlap: Arabic drops (<=), French survives
    ar = [tok("شهادة", conf=50, x=0, y=0, lang="ara")]
    fr = [tok("cert", conf=50, x=10, y=0, lang="fra")]
    keep_ar, keep_fr = dedupe_overlaps(ar, fr)
    assert keep_ar == [] and keep_fr == fr

    # Arabic strictly higher: Arabic survives, French drops (strict <)
    ar = [tok("شهادة", conf=60, x=0, y=0, lang="ara")]
    fr = [tok("cert", conf=50, x=10, y=0, lang="fra")]
    keep_ar, keep_fr = dedupe_overlaps(ar, fr)
    assert keep_ar == ar and keep_fr == []

    # No overlap: both survive
    ar = [tok("شهادة", conf=10, x=0, y=0, lang="ara")]
    fr = [tok("cert", conf=99, x=500, y=500, lang="fra")]
    assert dedupe_overlaps(ar, fr) == (ar, fr)

    # French dedupe compares against the SURVIVING arabic set:
    # ar1 beaten by fr1, so fr2 (overlapping only ar1) survives even
    # though conf < ar1
    ar1 = tok("أ", conf=50, x=0, y=0, lang="ara")
    fr1 = tok("a", conf=60, x=0, y=0, lang="fra")
    fr2 = tok("b", conf=40, x=5, y=5, lang="fra")
    keep_ar, keep_fr = dedupe_overlaps([ar1], [fr1, fr2])
    assert keep_ar == [] and keep_fr == [fr1, fr2]


def test_reading_order_line_binning_and_rtl():
    # two lines: line key = y // h
    a = tok("right", x=200, y=0, h=20)
    b = tok("left", x=0, y=5, h=20)      # same bin 0
    c = tok("next", x=0, y=40, h=20)     # bin 2
    assert [t.text for t in sort_for_reading([a, b, c])] == ["left", "right", "next"]

    # RTL strict majority: 2 arabic of 3 → reversed x
    # (sort_for_reading sees the widened long-form names, per ocr_media)
    a1 = tok("واحد", x=0, y=0, lang="arabic")
    a2 = tok("اثنان", x=100, y=0, lang="arabic")
    f1 = tok("un", x=50, y=0, lang="french")
    assert [t.text for t in sort_for_reading([a1, a2, f1])] == [
        "اثنان", "un", "واحد"]

    # exactly half arabic (1 of 2) → NOT a strict majority → LTR
    a1 = tok("واحد", x=100, y=0, lang="arabic")
    f1 = tok("un", x=0, y=0, lang="french")
    assert [t.text for t in sort_for_reading([a1, f1])] == ["un", "واحد"]


def test_reading_order_stability_on_equal_x():
    t1 = tok("first", x=10, y=0)
    t2 = tok("second", x=10, y=0)
    assert [t.text for t in sort_for_reading([t1, t2])] == ["first", "second"]
    # stable under reverse as well
    a1 = tok("أول", x=10, y=0, lang="arabic")
    a2 = tok("ثان", x=10, y=0, lang="arabic")
    assert [t.text for t in sort_for_reading([a1, a2])] == ["أول", "ثان"]


def test_ocr_media_filters():
    toks = [
        tok("", conf=90),                       # empty → parse filter
        tok("ok", conf=-1),                     # conf<0 → parse filter
        tok("12345", conf=90, lang="fra"),      # no latin chars → F1
        tok("شهادة", conf=90, lang="fra"),      # wrong script for fra → F1
        tok("bon", conf=90, x=0, y=0, lang="fra"),
    ]
    out = ocr_media(toks)
    assert [t.text for t in out] == ["bon"]


def test_classify_priority():
    assert classify_doc_type("certificat de résidence") == "certificate"
    assert classify_doc_type("CERTIFICAT") == "certificate"
    assert classify_doc_type("شهادة السكنى") == "certificate"
    # demande shadows autorisation (postprocess.py:87-92)
    assert classify_doc_type("demande d'autorisation") == "application"
    assert classify_doc_type("autorisation de construire") == "authorization"
    assert classify_doc_type("déclaration sur l'honneur") == "declaration"
    assert classify_doc_type("dclaration") == "declaration"  # folded letters, optional e
    assert classify_doc_type("تصريح") == "declaration"
    assert classify_doc_type("rien ici") is None
    # certificate beats everything
    assert classify_doc_type("demande de certificat") == "certificate"


def test_link_density():
    assert link_density("") == 0.0
    assert link_density("plain text") == 0.0
    s = '<a href="/x">12345</a>67890'
    assert abs(link_density(s) - 5 / len(s)) < 1e-12
