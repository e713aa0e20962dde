"""Raw-source readers (csv/jsonl tolerant parse) + skew helpers +
physical-plan shape audits."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from conftest import SF_SMOKE

OUT = "/tmp/spark_graft_sources_test"

TRIP_SCHEMA = StructType([
    StructField("trip_id", LongType()),
    StructField("vendor", StringType()),
    StructField("fare", DoubleType()),
])


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_csv_raw_corrupt_capture(spark):
    from azure_nyctaxi_lambda_elt_spark.sources.raw import (
        read_csv_raw, split_corrupt)

    shutil.rmtree(OUT, ignore_errors=True)
    p = os.path.join(OUT, "csv", "trips_2024-01-01.csv")
    _write(p, ["trip_id,vendor,fare",
               "1,v1,10.5",
               "2,v2,not_a_number",   # bad double -> corrupt
               "3,v3,7.25"])
    df = read_csv_raw(spark, os.path.dirname(p), TRIP_SCHEMA)
    parsed, corrupt = split_corrupt(df)
    assert {r["trip_id"] for r in parsed.collect()} == {1, 3}
    bad = corrupt.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
    assert bad[0]["source_file_name"] == "trips_2024-01-01.csv"


def test_jsonl_raw_corrupt_capture(spark):
    from azure_nyctaxi_lambda_elt_spark.sources.raw import (
        read_jsonl_raw, split_corrupt)

    p = os.path.join(OUT, "jsonl", "feed.jsonl")
    _write(p, ['{"trip_id": 1, "vendor": "v1", "fare": 10.5}',
               "{this is not json",
               '{"trip_id": 2, "vendor": null, "fare": 3.0}'])
    df = read_jsonl_raw(spark, os.path.dirname(p), TRIP_SCHEMA)
    parsed, corrupt = split_corrupt(df)
    assert {r["trip_id"] for r in parsed.collect()} == {1, 2}
    assert corrupt.count() == 1


def test_salted_sum_count_matches_direct(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.skew import salted_sum_count

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = salted_sum_count(ev, ["event_type"], ["value"], "event_id", 8)
    want = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"),
        F.count("*").cast("bigint").alias("row_count"))
    g = {r["event_type"]: (round(r["sum_value"], 6), r["row_count"])
         for r in got.collect()}
    w = {r["event_type"]: (round(r["sum_value"], 6), r["row_count"])
         for r in want.collect()}
    assert g == w


def test_salted_join_matches_direct(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.skew import salted_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value")
    dim = (ev.select("user_id").distinct()
           .withColumn("segment", F.pmod(F.col("user_id"), F.lit(5))))
    got = salted_join(ev, dim, "user_id", "event_id", 8).orderBy("event_id")
    want = ev.join(dim, "user_id").orderBy("event_id")
    assert [tuple(sorted(r.asDict().items())) for r in got.collect()] == \
           [tuple(sorted(r.asDict().items())) for r in want.collect()]


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def test_fact_star_plan_shape(spark):
    """Plan regression: dim resolution must broadcast (REPLICATE analog),
    never sort-merge-shuffle the fact side."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    plan = _formatted_plan(QUERIES["fact_build_star"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_revenue_by_dim_pushdown_and_broadcast(spark):
    """Filter on o_orderdate must reach the orders scan; nation/region
    joins must broadcast."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    plan = _formatted_plan(QUERIES["revenue_by_dim"](spark, SF_SMOKE))
    assert "PushedFilters" in plan and "o_orderdate" in plan.split(
        "PushedFilters", 2)[-1]
    assert plan.count("BroadcastHashJoin") >= 2


def test_pricing_summary_scan_prunes_columns(spark):
    """ReadSchema must not include unused lineitem columns."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    plan = _formatted_plan(QUERIES["pricing_summary"](spark, SF_SMOKE))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_comment" not in read[0] and "l_orderkey" not in read[0]
