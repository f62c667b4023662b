"""Bucketed co-located join: writing both join sides bucketed on the
join key lets the sort-merge join read bucket-aligned splits and plan
ZERO shuffle exchanges — the 100 TB co-location strategy (bucketing /
storage-partitioned joins), demonstrated and asserted on the plan."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_plans_no_shuffle(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for name, df, key in (("b_orders", orders, "o_orderkey"),
                          ("b_lineitem", li, "l_orderkey")):
        (df.write.mode("overwrite")
           .bucketBy(8, key).sortBy(key)
           .option("path", str(tmp_path / name))
           .saveAsTable(name))
    try:
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  spark.table("b_lineitem").l_orderkey
                  == spark.table("b_orders").o_orderkey)
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same join WITHOUT bucketing must shuffle — proves the
        # assertion above is meaningful, not vacuous
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # and the bucketed join returns the same row count
        assert j.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
