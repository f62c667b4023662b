"""Pin the engine-portable FNV-1a-64 hash (dedup.fnv1a64_spark /
fnv1a64_duckdb) against an independent pure-Python reference, on both
engines, including non-ASCII codepoints — the basis for the
dedup_minhash_portable64 oracle row."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from ocr_intern_spark.operators.dedup import fnv1a64_duckdb, fnv1a64_spark

SAMPLES = [
    "a",
    "hello world",
    "déjà vu",
    "جمعية الأمل",
    "0|the quick brown fox",
    "7|mixed é ع 字",
    "x" * 200,
]


def fnv1a64_py(s: str) -> int:
    """FNV-1a 64 over Unicode codepoints, as a SIGNED 64-bit value."""
    h = 14695981039346656037
    for ch in s:
        h ^= ord(ch)
        h = (h * 1099511628211) % (1 << 64)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_fnv_spark_matches_python(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = [r[0] for r in sdf.select(F.expr(fnv1a64_spark("s"))).collect()]
    assert got == [fnv1a64_py(s) for s in SAMPLES]


def test_fnv_duckdb_matches_python():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": SAMPLES}))
    got = [r[0] for r in con.execute(
        f"SELECT {fnv1a64_duckdb('s')} FROM t"
    ).fetchall()]
    assert got == [fnv1a64_py(s) for s in SAMPLES]


def test_portable_minhash_hashaggregate_plan(spark):
    """The point of the portable variant: the long-typed signature agg
    must stay in partial/final HashAggregate (never SortAggregate),
    i.e. the exact plan shape of the xxhash64 production path."""
    from ocr_intern_spark.operators.dedup import q_minhash_portable64

    df = q_minhash_portable64(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
