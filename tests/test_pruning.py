"""Scan-level scale behaviors pinned as tests: partition pruning on a
hive-partitioned layout, predicate pushdown, and column pruning —
the three mechanisms that make a 100 TB scan read only what the
query needs."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    out = str(tmp_path / "ev_by_day")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day") \
        .mode("overwrite").parquet(out)

    pruned = spark.read.parquet(out).where(F.col("day") == "2024-01-03")
    plan = _plan(pruned)
    # the day predicate must land in PartitionFilters (directory-level
    # pruning), NOT PushedFilters/post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    n_day = pruned.count()
    assert 0 < n_day < ev.count()
    # …and the pruned read returns exactly the rows of that day
    assert n_day == ev.where(F.to_date("ts") == "2024-01-03").count()


def test_predicate_pushdown_reaches_parquet_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .where(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "LessThan(l_quantity" in pushed


def test_column_pruning_in_read_schema(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity")
    plan = _plan(df)
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" in schema and "l_quantity" in schema
    # a 16-column table must not be read wholesale for a 2-column query
    assert "l_comment" not in schema and "l_extendedprice" not in schema
