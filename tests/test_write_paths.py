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


def test_file_scoped_replay_heals_one_blob_only(spark):
    """usp_delete_trips_by_blob analog: replaying ONE source file must
    (a) restore that file's rows exactly, (b) leave sibling files'
    rows in the same partition untouched, and (c) not rewrite
    unaffected partitions at all."""
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import (
        replay_file_scoped, write_partition_overwrite)
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    out = os.path.join(OUT, "fsr")
    shutil.rmtree(out, ignore_errors=True)
    typed = tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)).localCheckpoint()
    blob = "events_2024-01-05.parquet"
    corrupt = typed.withColumn(
        "fare_amount",
        F.when(F.col("source_file_name") == blob,
               F.col("fare_amount") + F.lit(99.0))
        .otherwise(F.col("fare_amount")))
    write_partition_overwrite(corrupt, out, ["ingest_date"])
    # footprint of a partition the blob does NOT touch
    import glob
    other_day_files = sorted(glob.glob(
        os.path.join(out, "ingest_date=2024-01-07", "*.parquet")))
    assert other_day_files

    replay_file_scoped(out, typed, "source_file_name", blob,
                       ["ingest_date"])
    back = spark.read.parquet(out)

    # (a) the blob's rows are healed
    healed = back.where(F.col("source_file_name") == blob)
    want = typed.where(F.col("source_file_name") == blob).drop("ingest_date")
    assert healed.drop("ingest_date").exceptAll(want).count() == 0
    assert want.exceptAll(healed.drop("ingest_date")).count() == 0
    # (b) sibling file (late_*) rows in the same partition survive
    assert back.where(
        F.col("source_file_name") == "late_2024-01-05.parquet"
    ).count() == typed.where(
        F.col("source_file_name") == "late_2024-01-05.parquet").count()
    # (c) untouched partitions keep their exact files (no rewrite)
    assert sorted(glob.glob(os.path.join(
        out, "ingest_date=2024-01-07", "*.parquet"))) == other_day_files


def _mk(spark, rows):
    return spark.createDataFrame(rows, "d string, f string, v int")


def test_file_scoped_replay_new_blob_keeps_siblings(spark):
    """A brand-new blob (zero existing rows) whose fresh rows land in a
    partition that already holds OTHER blobs' rows must not delete those
    sibling rows when its partition is rewritten."""
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import (
        replay_file_scoped, write_partition_overwrite)

    out = os.path.join(OUT, "fsr_new_blob")
    shutil.rmtree(out, ignore_errors=True)
    write_partition_overwrite(
        _mk(spark, [("2024-01-01", "a.json", 1),
                    ("2024-01-01", "b.json", 2),
                    ("2024-01-02", "b.json", 3)]),
        out, ["d"])

    fresh = _mk(spark, [("2024-01-01", "c.json", 10),
                        ("2024-01-02", "c.json", 11)])
    replay_file_scoped(out, fresh, "f", "c.json", ["d"])
    # partition-dir type inference reads "d" back as a date
    back = {(str(r["d"]), r["f"], r["v"])
            for r in spark.read.parquet(out).collect()}
    assert back == {("2024-01-01", "a.json", 1),
                    ("2024-01-01", "b.json", 2),
                    ("2024-01-02", "b.json", 3),
                    ("2024-01-01", "c.json", 10),
                    ("2024-01-02", "c.json", 11)}


def test_file_scoped_replay_partition_move_heals_both_sides(spark):
    """Healed rows whose partition value CHANGED (corrected ingest
    date): the new partition keeps its siblings, the old partition
    loses exactly the blob's rows — and if that empties it, the
    partition dir is dropped (no stale files survive)."""
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import (
        replay_file_scoped, write_partition_overwrite)

    out = os.path.join(OUT, "fsr_move")
    shutil.rmtree(out, ignore_errors=True)
    write_partition_overwrite(
        _mk(spark, [("2024-01-01", "x.json", 1),   # sole occupant
                    ("2024-01-02", "x.json", 2),   # shares with y
                    ("2024-01-02", "y.json", 3),
                    ("2024-01-03", "y.json", 4)]),
        out, ["d"])

    # the heal corrects BOTH x rows to day 03 (shared with y's row)
    fresh = _mk(spark, [("2024-01-03", "x.json", 1),
                        ("2024-01-03", "x.json", 2)])
    replay_file_scoped(out, fresh, "f", "x.json", ["d"])
    # partition-dir type inference reads "d" back as a date
    back = {(str(r["d"]), r["f"], r["v"])
            for r in spark.read.parquet(out).collect()}
    assert back == {("2024-01-02", "y.json", 3),
                    ("2024-01-03", "y.json", 4),
                    ("2024-01-03", "x.json", 1),
                    ("2024-01-03", "x.json", 2)}
    # day-01 held only x's rows → fully vacated → dir dropped
    assert not os.path.exists(os.path.join(out, "d=2024-01-01"))
