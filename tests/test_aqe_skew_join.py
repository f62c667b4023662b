"""AQE skew-join: a hot join key's shuffle partition is split at
runtime (skew=true on the SortMergeJoin in the FINAL adaptive plan).
This is the runtime half of the skew story — `operators/skew.py`
covers aggregation shapes, AQE covers join shapes."""

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # the downstream aggregate wants the join's partitioning, so the
    # split must be forced (it adds a shuffle); at real scale the
    # default cost model decides
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_hot_join_key(spark, skew_confs):
    left = spark.range(300000).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.col("id") % 100).cast("long").alias("k"),
        F.concat(F.lit("payloadpayloadpayload"),
                 F.col("id").cast("string")).alias("pay"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.lit("dim").alias("d")
    )
    j = left.join(right, "k").select(F.sum(F.length("pay")).alias("s"))
    [row] = j.collect()  # materialize THIS DataFrame so ITS adaptive
    # plan finalizes (a .write would execute a separate queryExecution)
    assert row["s"] > 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
