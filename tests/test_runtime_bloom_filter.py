"""Runtime bloom-filter join pruning (SPARK-32268): when a join's
build side is selectively filtered and the probe side is a big file
scan, Spark injects a `bloom_filter_agg` subquery on the build side
and a `might_contain` filter on the probe side — probe rows that
cannot join are dropped AT THE SCAN, before the join exchange. This
is the row-level complement of partition pruning (`test_pruning.py`)
and the 100 TB lever for selective dim-filtered fact joins where
broadcast is off the table.

The test pins the INJECTION (both operators present in the executed
plan) and result correctness vs the unfiltered-join baseline."""

import pytest
from pyspark.sql import functions as F

_CONFS = {
    # force the shuffle-join path (broadcast joins use a different
    # runtime filter) and make the size thresholds test-scale
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture()
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_injected(spark, bloom_confs, tmp_path):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(fact_dir)
    spark.range(2_000).select(
        F.col("id").alias("k"), F.lit("d").alias("d")
    ).write.parquet(dim_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("k") % 100 == 0)
    j = fact.join(dim, "k").agg(F.sum("v").alias("s"))
    [row] = j.collect()
    # 20 surviving dim keys (0,100,...,1900), sum of 2k over them
    assert row["s"] == sum(2 * k for k in range(0, 2000, 100))

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan[:2000]
    assert "might_contain" in plan, plan[:2000]
