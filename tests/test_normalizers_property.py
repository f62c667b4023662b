"""Property test: the native Catalyst normalizers must agree with the
pure-Python oracle on arbitrary inputs (two independent
implementations of validators.py:5-139).

Strategy: hypothesis generates adversarial strings driver-side; we
batch them into ONE DataFrame evaluation per field type (per-example
Spark jobs would be absurdly slow), then compare element-wise.
"""

import string

from hypothesis import given, settings, strategies as st

from ocr_intern_spark.functions import normalizers as N
from ocr_intern_spark.oracle import validators as V

import pyspark.sql.functions as F

ALPHABET = (
    string.ascii_letters + string.digits + " .-/:+()٠١٢٣٤٥٦٧٨٩"
    + "éèàçâïû" + "شهادةطلب"
)

texts = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=24), min_size=1, max_size=64
)

keys = st.sampled_from(
    ["cin", "date_naissance", "tel", "récépissé", "ice", "if", "x if y",
     "gif", "commune", "nom", "misc", "تاريخ الوصل", "date_tel"]
)


def _spark_batch(spark, pairs):
    df = spark.createDataFrame(pairs, "key string, raw string")
    res = df.select(
        "key", "raw", N.normalize_field(F.col("key"), F.col("raw")).alias("n")
    ).collect()
    return [(r["n"]["type"], r["n"]["value"], r["n"]["valid"]) for r in res]


@settings(max_examples=10, deadline=None)
@given(batch=st.lists(st.tuples(keys, st.text(alphabet=ALPHABET, max_size=30)),
                      min_size=1, max_size=40))
def test_normalize_field_matches_oracle(spark, batch):
    got = _spark_batch(spark, batch)
    expected = [tuple(V.normalize_field(k, t)) for k, t in batch]
    # oracle returns (type, value, valid); align tuple order
    expected = [(t, v, ok) for (t, v, ok) in expected]
    assert got == expected
