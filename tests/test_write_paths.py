"""Idempotent partition-overwrite write path (core/12 step-1 wipe
analog): reruns replace exactly the touched partitions."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conftest import SF_SMOKE

OUT = "/tmp/spark_graft_write_test"


def test_partition_overwrite_is_idempotent_and_partition_scoped(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import (
        write_partition_overwrite)
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    out = os.path.join(OUT, "clean")
    shutil.rmtree(out, ignore_errors=True)
    clean = tf.trip_clean(tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)))
    write_partition_overwrite(clean, out, ["ingest_date"])
    base = spark.read.parquet(out)
    n0 = base.count()
    per_day_before = {
        r["ingest_date"]: r["count"]
        for r in base.groupBy("ingest_date").count().collect()
    }

    # rerun the SAME slice → identical state (idempotence)
    write_partition_overwrite(clean, out, ["ingest_date"])
    assert spark.read.parquet(out).count() == n0

    # rerun one day with fewer rows → only that partition shrinks
    days = [r[0] for r in clean.select("ingest_date").distinct().orderBy(
        "ingest_date").collect()]
    target = days[0]
    slice_df = clean.where(F.col("ingest_date") == F.lit(target)).limit(3)
    write_partition_overwrite(slice_df, out, ["ingest_date"])
    after = spark.read.parquet(out)
    assert after.where(F.col("ingest_date") == F.lit(target)).count() == 3
    untouched_before = sum(v for k, v in per_day_before.items() if k != target)
    assert after.where(F.col("ingest_date") != F.lit(target)).count() == untouched_before

    # physical layout: hive-style partition dirs exist (partition pruning
    # works against this layout at scale)
    assert any(d.startswith("ingest_date=") for d in os.listdir(out))
