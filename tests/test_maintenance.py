"""Compaction + partition stats (post-load maintenance analog)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conftest import SF_SMOKE

OUT = "/tmp/spark_graft_maint_test"


def _partition_file_counts(path: str) -> dict[str, int]:
    out = {}
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if os.path.isdir(full) and "=" in entry:
            out[entry.split("=", 1)[1]] = len(
                [f for f in os.listdir(full) if f.endswith(".parquet")])
    return out


def test_compaction_reduces_files_preserves_rows(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.maintenance import (
        compact_partitions, partition_stats)
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    path = os.path.join(OUT, "clean")
    shutil.rmtree(path, ignore_errors=True)
    clean = tf.trip_clean(tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)))
    # fragment deliberately: many tasks -> many small files per partition
    clean.repartition(16).write.partitionBy("ingest_date").parquet(path)
    before = _partition_file_counts(path)
    assert max(before.values()) > 1
    n0 = spark.read.parquet(path).count()
    rows_per_day0 = {
        str(r["ingest_date"]): r["count"]
        for r in spark.read.parquet(path).groupBy("ingest_date").count().collect()}

    compacted = compact_partitions(spark, path, "ingest_date",
                                   max_files_per_partition=1)
    assert compacted  # something was fragmented
    after = _partition_file_counts(path)
    assert max(after.values()) == 1
    assert spark.read.parquet(path).count() == n0
    rows_per_day1 = {
        str(r["ingest_date"]): r["count"]
        for r in spark.read.parquet(path).groupBy("ingest_date").count().collect()}
    assert rows_per_day0 == rows_per_day1

    stats = partition_stats(spark, path, "ingest_date")
    srows = stats.collect()
    assert all(r["n_files"] == 1 and r["total_bytes"] > 0 for r in srows)
    assert sum(r["n_rows"] for r in srows) == n0
