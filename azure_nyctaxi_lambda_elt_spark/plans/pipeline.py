"""Batch-ELT orchestrator: the ADF daily pipeline re-expressed as a
staged, materialized, logged Spark run.

Reference parity (orchestration/adf/pipeline/*):
- pl_raw_to_stg_nyctaxi   → stage "raw_to_stg":  typed staging write
- pl_stg_to_core_nyctaxi  → stage "stg_to_core": clean slice + err
  capture + latest-wins dedupe, partition-overwrite into core
- pl_core_to_mdl_nyctaxi  → stage "core_to_mdl": dims + fact + DQ gate
- pl_daily_nyctaxi        → run_batch_pipeline (runs all three)
- ops.run_log (sql/batchELT/staging/stg_logrun.sql): run_id, stage,
  dataset, status STARTED|SUCCEEDED|FAILED, rows_copied, timestamps,
  error_message — appended per stage here.

Each stage READS the previous stage's WRITTEN table (materialized
hand-off, like the reference's warehouse layers) — downstream never
recomputes upstream lineage, and a failed stage leaves earlier layers
intact for rerun.  All writes are dynamic partition overwrite on
ingest_date, so any slice rerun is idempotent.

Scale notes: the stage boundary is the unit of recovery AND the shuffle
boundary — each write repartitions by its partition column so files per
partition stay bounded; dims are broadcast in the fact stage; the DQ
gate runs as one aggregate scan of the fact.
"""

from __future__ import annotations

import datetime
import os
import traceback

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dq import DQGateError, check_counts, dq_gate, run_metrics
from ..operators.upsert import write_partition_overwrite
from . import trips_feed as tf

RUN_LOG_SCHEMA = ("run_id string, stage string, dataset string, "
                  "status string, rows_copied bigint, "
                  "started_at_utc timestamp, finished_at_utc timestamp, "
                  "error_message string")


def _log(spark: SparkSession, warehouse_dir: str, row: tuple) -> None:
    (
        spark.createDataFrame([row], RUN_LOG_SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .parquet(os.path.join(warehouse_dir, "ops", "run_log"))
    )


def _now() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


def _run_stage(spark: SparkSession, warehouse_dir: str, run_id: str,
               stage: str, dataset: str, fn) -> int:
    started = _now()
    try:
        rows = fn()
    except Exception as exc:
        _log(spark, warehouse_dir,
             (run_id, stage, dataset, "FAILED", None, started, _now(),
              "".join(traceback.format_exception_only(exc)).strip()[:4000]))
        raise
    _log(spark, warehouse_dir,
         (run_id, stage, dataset, "SUCCEEDED", rows, started, _now(), None))
    return rows


def run_batch_pipeline(spark: SparkSession, sf_dir: str, warehouse_dir: str,
                       run_id: str = "run-001") -> dict[str, str]:
    """Full daily batch ELT: raw → stg → core (+err) → mdl, materialized
    under ``warehouse_dir`` with run_log/run_metrics/DQ records.

    Returns the written table paths."""
    paths = {
        "stg_trip": os.path.join(warehouse_dir, "stg", "trip"),
        "core_trip_clean": os.path.join(warehouse_dir, "core", "trip_clean"),
        "err_trip": os.path.join(warehouse_dir, "err", "trip"),
        "mdl_fact_trip": os.path.join(warehouse_dir, "mdl", "fact_trip"),
        "mdl_dim_vendor": os.path.join(warehouse_dir, "mdl", "dim_vendor"),
        "mdl_dim_payment": os.path.join(warehouse_dir, "mdl", "dim_payment_type"),
        "mdl_dim_rate_code": os.path.join(warehouse_dir, "mdl", "dim_rate_code"),
        "mdl_dim_flag": os.path.join(warehouse_dir, "mdl", "dim_flag"),
        "mdl_dim_location": os.path.join(warehouse_dir, "mdl", "dim_location"),
        "ops_run_metrics": os.path.join(warehouse_dir, "ops", "run_metrics"),
        "ops_dq_result": os.path.join(warehouse_dir, "ops", "dq_result"),
        "ops_run_log": os.path.join(warehouse_dir, "ops", "run_log"),
    }

    def raw_to_stg() -> int:
        typed = tf.typed_trips(tf.raw_trips(spark, sf_dir))
        write_partition_overwrite(typed, paths["stg_trip"], ["ingest_date"])
        return spark.read.parquet(paths["stg_trip"]).count()

    def stg_to_core() -> int:
        typed = spark.read.parquet(paths["stg_trip"])
        good, bad = tf.split_trips(typed)
        write_partition_overwrite(bad, paths["err_trip"], ["ingest_date"])
        clean = tf.trip_clean(typed)
        write_partition_overwrite(clean, paths["core_trip_clean"], ["ingest_date"])
        metrics = run_metrics("core", "trip_clean", typed,
                              spark.read.parquet(paths["core_trip_clean"]),
                              bad, "ingest_date")
        metrics.coalesce(1).write.mode("overwrite").parquet(paths["ops_run_metrics"])
        return spark.read.parquet(paths["core_trip_clean"]).count()

    def core_to_mdl() -> int:
        from ..operators.dims import resolve_fk

        clean = spark.read.parquet(paths["core_trip_clean"])
        v = tf.dim_vendor(clean)
        p = tf.dim_payment(clean)
        rc = tf.dim_rate_code(clean)
        fl = tf.dim_flag(clean)
        loc = tf.dim_location(clean)
        for dim, key in ((v, "mdl_dim_vendor"), (p, "mdl_dim_payment"),
                         (rc, "mdl_dim_rate_code"), (fl, "mdl_dim_flag"),
                         (loc, "mdl_dim_location")):
            dim.coalesce(1).write.mode("overwrite").parquet(paths[key])
        v = spark.read.parquet(paths["mdl_dim_vendor"])
        p = spark.read.parquet(paths["mdl_dim_payment"])
        rc = spark.read.parquet(paths["mdl_dim_rate_code"])
        fl = spark.read.parquet(paths["mdl_dim_flag"])
        loc = spark.read.parquet(paths["mdl_dim_location"])

        from ..functions.columns import (date_key, norm_str, sha256_key,
                                         time_key, ts_iso)

        f = resolve_fk(clean, v, [("vendor_code", "vendor_code")], "vendor_key")
        f = resolve_fk(f, p, [("payment_type", "payment_type_nk")],
                       "payment_type_key")
        f = resolve_fk(f, rc, [("rate_code_nk", "rate_code_nk")], "rate_code_key")
        f = resolve_fk(f, fl, [("flag_nk", "flag_nk")], "flag_key")
        f = resolve_fk(f, loc.withColumnRenamed("location_key", "pu_location_key"),
                       [("pu_loc_id", "location_id_nk")], "pu_location_key")
        f = resolve_fk(f, loc.withColumnRenamed("location_key", "do_location_key"),
                       [("do_loc_id", "location_id_nk")], "do_location_key")
        fact = f.select(
            sha256_key(
                F.coalesce(norm_str(F.col("vendor_code")), F.lit("")),
                ts_iso("pickup_ts_utc"),
                ts_iso("dropoff_ts_utc"),
                F.col("fare_amount").cast("decimal(18,2)"),
                F.col("trip_distance_km").cast("decimal(18,3)"),
                F.coalesce(norm_str(F.col("payment_type")), F.lit("")),
            ).alias("trip_id"),
            date_key("pickup_ts_utc").alias("pickup_date_key"),
            time_key("pickup_ts_utc").alias("pickup_time_key"),
            "vendor_key", "payment_type_key", "rate_code_key", "flag_key",
            "pu_location_key",
            "do_location_key", "trip_distance_km", "fare_amount",
            F.col("tip_amount"), "is_night_ride", "ingest_date",
            "source_file_name", "loaded_at",
        )
        write_partition_overwrite(fact, paths["mdl_fact_trip"], ["ingest_date"])

        # DQ gate on the written fact (50_dq_modeling.sql analog)
        written = spark.read.parquet(paths["mdl_fact_trip"])
        dq = check_counts(
            written,
            {
                "null_trip_id": F.col("trip_id").isNull(),
                "null_date_key": F.col("pickup_date_key").isNull(),
                "unresolved_vendor_key": F.col("vendor_key").isNull(),
                "negative_fare": F.col("fare_amount") < 0,
            },
            fail_checks=("null_trip_id", "null_date_key"),
        )
        dq.coalesce(1).write.mode("overwrite").parquet(paths["ops_dq_result"])
        dq_gate(spark.read.parquet(paths["ops_dq_result"]))
        return written.count()

    _run_stage(spark, warehouse_dir, run_id, "raw_to_stg", "stg.trip", raw_to_stg)
    _run_stage(spark, warehouse_dir, run_id, "stg_to_core", "core.trip_clean",
               stg_to_core)
    _run_stage(spark, warehouse_dir, run_id, "core_to_mdl", "mdl.fact_trip",
               core_to_mdl)
    return paths


def run_backfill(spark: SparkSession, sf_dir: str, warehouse_dir: str,
                 dates: list[str], run_id_prefix: str = "backfill") -> dict[str, str]:
    """Date-range backfill: replay the daily pipeline once per date
    (Ingest/backfill_dates.sh analog — one ADF run per day, inclusive).

    Per date: that date's slice is staged, cleaned and partition-
    overwritten (idempotent wipe-and-replace, core/12 step 1), dims are
    upserted APPEND-ONLY (IDENTITY analog — existing surrogate keys
    never change, so fact partitions built by earlier dates stay
    valid), and ONLY the date's fact partition is rebuilt.  Each date
    appends its own run_log rows.  Re-running any subset of dates is a
    no-op on the final state (pytest-proven)."""
    from ..operators.dims import resolve_fk, upsert_dim_append
    from ..functions.columns import (date_key, norm_str, sha256_key,
                                     time_key, ts_iso)

    paths = {
        "stg_trip": os.path.join(warehouse_dir, "stg", "trip"),
        "core_trip_clean": os.path.join(warehouse_dir, "core", "trip_clean"),
        "err_trip": os.path.join(warehouse_dir, "err", "trip"),
        "mdl_fact_trip": os.path.join(warehouse_dir, "mdl", "fact_trip"),
        "mdl_dim_vendor": os.path.join(warehouse_dir, "mdl", "dim_vendor"),
        "mdl_dim_payment": os.path.join(warehouse_dir, "mdl", "dim_payment_type"),
        "mdl_dim_rate_code": os.path.join(warehouse_dir, "mdl", "dim_rate_code"),
        "mdl_dim_flag": os.path.join(warehouse_dir, "mdl", "dim_flag"),
        "mdl_dim_location": os.path.join(warehouse_dir, "mdl", "dim_location"),
        "ops_run_log": os.path.join(warehouse_dir, "ops", "run_log"),
    }

    def _read_or_none(path: str) -> DataFrame | None:
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def _write_dim(df: DataFrame, key: str) -> DataFrame:
        tmp = paths[key] + "_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import shutil
        shutil.rmtree(paths[key], ignore_errors=True)
        os.rename(tmp, paths[key])
        return spark.read.parquet(paths[key])

    for d in dates:
        run_id = f"{run_id_prefix}-{d}"

        def stage_day() -> int:
            typed = tf.typed_trips(tf.raw_trips(spark, sf_dir)).where(
                F.col("ingest_date") == F.lit(d).cast("date"))
            write_partition_overwrite(typed, paths["stg_trip"], ["ingest_date"])
            good, bad = tf.split_trips(typed)
            write_partition_overwrite(bad, paths["err_trip"], ["ingest_date"])
            # duplicates never cross ingest_date (late rows keep the
            # event's date), so per-date dedupe == global dedupe
            clean_day = tf.trip_clean(typed)
            write_partition_overwrite(clean_day, paths["core_trip_clean"],
                                      ["ingest_date"])
            return clean_day.count()

        def model_day() -> int:
            clean_day = spark.read.parquet(paths["core_trip_clean"]).where(
                F.col("ingest_date") == F.lit(d).cast("date"))
            v = _write_dim(upsert_dim_append(
                _read_or_none(paths["mdl_dim_vendor"]), clean_day,
                ["vendor_code"], "vendor_key", "UNKNOWN"), "mdl_dim_vendor")
            p = _write_dim(upsert_dim_append(
                _read_or_none(paths["mdl_dim_payment"]),
                clean_day.withColumnRenamed("payment_type", "payment_type_nk"),
                ["payment_type_nk"], "payment_type_key", "UNKNOWN"),
                "mdl_dim_payment")
            rc = _write_dim(upsert_dim_append(
                _read_or_none(paths["mdl_dim_rate_code"]), clean_day,
                ["rate_code_nk"], "rate_code_key", "UNKNOWN"),
                "mdl_dim_rate_code")
            fl = _write_dim(upsert_dim_append(
                _read_or_none(paths["mdl_dim_flag"]), clean_day,
                ["flag_nk"], "flag_key", "UNKNOWN"), "mdl_dim_flag")
            loc_src = (
                clean_day.select(F.col("pu_loc_id").alias("location_id_nk"))
                .unionByName(
                    clean_day.select(F.col("do_loc_id").alias("location_id_nk"))))
            loc = _write_dim(upsert_dim_append(
                _read_or_none(paths["mdl_dim_location"]), loc_src,
                ["location_id_nk"], "location_key", -1), "mdl_dim_location")

            f = resolve_fk(clean_day, v, [("vendor_code", "vendor_code")],
                           "vendor_key")
            f = resolve_fk(f, p, [("payment_type", "payment_type_nk")],
                           "payment_type_key")
            f = resolve_fk(f, rc, [("rate_code_nk", "rate_code_nk")],
                           "rate_code_key")
            f = resolve_fk(f, fl, [("flag_nk", "flag_nk")], "flag_key")
            f = resolve_fk(f, loc.withColumnRenamed("location_key",
                                                    "pu_location_key"),
                           [("pu_loc_id", "location_id_nk")], "pu_location_key")
            f = resolve_fk(f, loc.withColumnRenamed("location_key",
                                                    "do_location_key"),
                           [("do_loc_id", "location_id_nk")], "do_location_key")
            fact = f.select(
                sha256_key(
                    F.coalesce(norm_str(F.col("vendor_code")), F.lit("")),
                    ts_iso("pickup_ts_utc"),
                    ts_iso("dropoff_ts_utc"),
                    F.col("fare_amount").cast("decimal(18,2)"),
                    F.col("trip_distance_km").cast("decimal(18,3)"),
                    F.coalesce(norm_str(F.col("payment_type")), F.lit("")),
                ).alias("trip_id"),
                date_key("pickup_ts_utc").alias("pickup_date_key"),
                time_key("pickup_ts_utc").alias("pickup_time_key"),
                "vendor_key", "payment_type_key", "rate_code_key", "flag_key",
                "pu_location_key", "do_location_key", "trip_distance_km",
                "fare_amount", F.col("tip_amount"), "is_night_ride",
                "ingest_date", "source_file_name", "loaded_at",
            )
            write_partition_overwrite(fact, paths["mdl_fact_trip"],
                                      ["ingest_date"])
            return spark.read.parquet(paths["mdl_fact_trip"]).where(
                F.col("ingest_date") == F.lit(d).cast("date")).count()

        _run_stage(spark, warehouse_dir, run_id, "backfill_core",
                   f"core.trip_clean/{d}", stage_day)
        _run_stage(spark, warehouse_dir, run_id, "backfill_mdl",
                   f"mdl.fact_trip/{d}", model_day)
    return paths
