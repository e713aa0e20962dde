"""Compaction + partition stats (post-load maintenance analog)."""

from __future__ import annotations

import os
import shutil

import pytest

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


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """Delta VACUUM DRY RUN parity: the dry run returns exactly the
    set a real run would reclaim — same walks, same grace — while
    deleting nothing (old versions still read)."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(i, i) for i in range(1, 6)],
                               "id long, v long")
    txnlog.commit(df, path, "overwrite")
    txnlog.commit(df.selectExpr("id + 10 AS id", "v"), path, "append")
    txnlog.compact(spark, path)
    dry = sorted(txnlog.vacuum(path, keep_latest=1, grace_seconds=0,
                               dry_run=True))
    assert len(dry) == 2  # the two pre-compact dirs
    # nothing deleted: v0 and v1 still read in full
    assert txnlog.snapshot(spark, path, version=0).count() == 5
    assert txnlog.snapshot(spark, path, version=1).count() == 10
    # grace keeps everything when the window is wide — both modes
    assert txnlog.vacuum(path, keep_latest=1, grace_seconds=1e9,
                         dry_run=True) == []
    real = sorted(txnlog.vacuum(path, keep_latest=1, grace_seconds=0))
    assert real == dry
    with pytest.raises(FileNotFoundError):
        txnlog.snapshot(spark, path, version=0).count()
    assert txnlog.snapshot(spark, path).count() == 10
