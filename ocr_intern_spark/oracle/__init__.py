"""Pure-Python reference-semantics oracle.

Zero Spark imports. These functions are direct, independently-written
reimplementations of the reference's per-document semantics (cited
per-function against /root/reference). They generate the golden
expected outputs that the distributed pipeline in
``ocr_intern_spark.operators`` must reproduce exactly.
"""

from ocr_intern_spark.oracle.validators import (  # noqa: F401
    ar2en_digits,
    normalize_field,
    squash_spaces,
)
from ocr_intern_spark.oracle.semantics import (  # noqa: F401
    classify_doc_type,
    dedupe_overlaps,
    extract_document,
    guess_lang,
    link_density,
    sort_for_reading,
)
