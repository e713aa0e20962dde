"""Bucketed co-located join: the write-once-shuffle-never path.

Asserts the physical property the design pays for: joining two tables
bucketed on the join key with equal bucket counts produces a plan with
NO Exchange (shuffle) on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(request):
    spark = request.getfixturevalue("spark")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    from azure_nyctaxi_lambda_elt_spark.operators.bucketing import write_bucketed

    write_bucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "bkt_orders", 8, ["o_orderkey"])
    write_bucketed(
        l.select(F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"),
        "bkt_lineitem", 8, ["o_orderkey"])
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    from azure_nyctaxi_lambda_elt_spark.operators.bucketing import cobucketed_join

    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = cobucketed_join(spark, left, right, ["o_orderkey"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is still correct
        direct = (
            spark.table(left).join(spark.table(right), "o_orderkey").count())
        assert df.count() == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
