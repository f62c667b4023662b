"""Skew-safe aggregation: exact equality with the naive plans on a
hot-key distribution, and the phase-1 exchange spreads the hot key."""

from pyspark.sql import functions as F

from ocr_intern_spark.operators.skew import salted_agg, skew_safe_distinct_count


def _skewed(spark):
    # 20k rows, 90% one key; value has 997 distinct per key pattern
    return spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 37).cast("string")))
        .alias("k"),
        (F.col("id") % 997).cast("string").alias("v"),
    )


def test_distinct_count_matches_naive(spark):
    df = _skewed(spark)
    naive = {
        (r["k"]): r["n"]
        for r in df.groupBy("k").agg(
            F.count_distinct("v").alias("n")
        ).collect()
    }
    safe = {
        r["k"]: r["n_distinct"]
        for r in skew_safe_distinct_count(df, "k", "v").collect()
    }
    assert safe == naive
    assert safe["hot"] == 997


def test_phase1_exchange_partitions_on_both_columns(spark):
    df = _skewed(spark)
    import re

    plan = skew_safe_distinct_count(df, "k", "v")._jdf.queryExecution() \
        .executedPlan().toString()
    # phase-1 exchange carries BOTH columns (hot key spread);
    # phase-2 exchange is key-only over the collapsed rows
    assert re.search(r"hashpartitioning\(k#\d+, v#\d+", plan), plan


def test_salted_count_and_sum_match_naive(spark):
    df = _skewed(spark).withColumn("x", (F.length("v") + 1).cast("long"))
    naive = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("x").alias("s")
        ).collect()
    }
    n = {
        r["k"]: r["n"]
        for r in salted_agg(df, "k", F.count("*"), F.sum, "n").collect()
    }
    s = {
        r["k"]: r["s"]
        for r in salted_agg(df, "k", F.sum("x"), F.sum, "s").collect()
    }
    assert {k: (n[k], s[k]) for k in n} == naive
