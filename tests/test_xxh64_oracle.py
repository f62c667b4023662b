"""The pure-Python XXH64 oracle (oracle/xxh64.py) must be
bit-identical to Spark's `F.xxhash64` for every input shape the fast
minhash paths use: chained (int32 literal, string) for signatures and
chained (int64, int64) for band buckets — plus the raw per-type
encodings. Hypothesis drives arbitrary unicode strings and 64-bit
ints through both implementations."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_intern_spark.oracle.xxh64 import spark_xxhash64, xxh64

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def test_known_shapes_match_spark(spark):
    cases = [
        "",
        "a",
        "hello world",
        "x" * 31,
        "y" * 32,          # exactly one stripe
        "z" * 100,         # stripe loop + every tail branch
        "héllo wörld ünïcode ☃",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [spark_xxhash64(("str", s)) for s in cases]

    # minhash signature shape: chained int32 literal seed + string
    for seed in range(8):
        got = [
            r[0] for r in df.select(F.xxhash64(F.lit(seed), "s")).collect()
        ]
        assert got == [
            spark_xxhash64(("i32", seed), ("str", s)) for s in cases
        ]


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(s=st.text(max_size=200))
def test_string_hash_matches_spark(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(F.xxhash64("s")).collect()[0][0]
    assert got == spark_xxhash64(("str", s))


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=I64, b=I64)
def test_chained_long_hash_matches_spark(spark, a, b):
    """The LSH bucket shape: xxhash64(mh_a, mh_b) over two BIGINTs."""
    df = spark.createDataFrame([(a, b)], "a long, b long")
    got = df.select(F.xxhash64("a", "b")).collect()[0][0]
    assert got == spark_xxhash64(("i64", a), ("i64", b))


def test_reference_vectors():
    """Published xxHash64 reference behavior: seed-0 empty-input hash
    (the canonical check value from the xxHash spec repository)."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    # one-shot vs spec sanity: hashing is deterministic and
    # seed-sensitive
    assert xxh64(b"test", 0) != xxh64(b"test", 1)
