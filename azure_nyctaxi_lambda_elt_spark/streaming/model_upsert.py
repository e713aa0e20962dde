"""Streaming MODEL upsert: the reference's hourly micro-batch lane that
maintains the WHOLE star schema, not just trip_clean.

Reference parity (sql/streaming/staging/):
- usp_upsert_trip_clean_from_slice_streaming.sql → latest-wins merge of
  each batch's deduped slice into core/trip_clean
- usp_upsert_dims_from_slice_streaming.sql → append-only dim upsert:
  unseen natural keys get NEW surrogate keys (max existing + rank among
  the batch's new NKs); existing keys NEVER change — the IDENTITY
  semantics a warehouse needs so earlier fact rows stay valid
- usp_upsert_fact_trip_streaming.sql → fact maintenance scoped to the
  batch's touched ingest_date partitions: rebuild those partitions from
  the merged clean + current dims via dynamic partition overwrite

Determinism: for a single-batch run the dims reduce to the batch
dense_rank build, so the final fact equals the BATCH star-schema oracle
exactly. Across many batches the surrogate keys are arrival-ordered
(like the reference's IDENTITY) — the invariants tests assert key
stability, fact/dim referential integrity, and trip_id-set equality
with the batch answer.

Scale notes: per batch the work is (batch ∪ touched-warehouse rows)
hash-shuffled once on the business key, dims broadcast into the fact
rebuild, and only touched ingest_date partitions are rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.columns import date_key, norm_str, sha256_key, time_key, ts_iso
from ..operators.dedupe import latest_wins
from ..operators.dims import resolve_fk, upsert_dim_append
from ..operators.upsert import write_partition_overwrite
from ..plans import trips_feed as tf
from .lane import _order_by, _reset, _run_available_now, events_stream


def _build_fact(clean: DataFrame, v: DataFrame, p: DataFrame,
                rc: DataFrame, fl: DataFrame, loc: DataFrame) -> DataFrame:
    f = resolve_fk(clean, v, [("vendor_code", "vendor_code")], "vendor_key")
    f = resolve_fk(f, p, [("payment_type", "payment_type_nk")], "payment_type_key")
    f = resolve_fk(f, rc, [("rate_code_nk", "rate_code_nk")], "rate_code_key")
    f = resolve_fk(f, fl, [("flag_nk", "flag_nk")], "flag_key")
    f = resolve_fk(f, loc.withColumnRenamed("location_key", "pu_location_key"),
                   [("pu_loc_id", "location_id_nk")], "pu_location_key")
    f = resolve_fk(f, loc.withColumnRenamed("location_key", "do_location_key"),
                   [("do_loc_id", "location_id_nk")], "do_location_key")
    return f.select(
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


def run_model_upsert(spark: SparkSession, sf_dir: str, out_dir: str,
                     max_files_per_trigger: int | None = None,
                     source_dir: str | None = None) -> dict[str, DataFrame]:
    """Run the full-model streaming upsert to completion; returns the
    final {clean, dim_vendor, dim_payment, dim_location, fact} frames."""
    dirs = {name: os.path.join(out_dir, name)
            for name in ("clean", "dim_vendor", "dim_payment",
                         "dim_rate_code", "dim_flag",
                         "dim_location", "fact")}
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(ckpt, *dirs.values())
    slice_stream = tf.clean_slice(tf.typed_trips(tf.raw_trips_from_events(
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir))))

    def _read(name: str) -> DataFrame | None:
        try:
            return spark.read.parquet(dirs[name])
        except Exception:
            return None

    def _write_dim(df: DataFrame, name: str) -> DataFrame:
        tmp = dirs[name] + "_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        _reset(dirs[name])
        os.rename(tmp, dirs[name])
        return spark.read.parquet(dirs[name])

    def upsert_model(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        incoming = latest_wins(batch, ["trip_uid"], _order_by())

        prev_clean = _read("clean")
        merged = incoming if prev_clean is None else latest_wins(
            prev_clean.unionByName(incoming), ["trip_uid"], _order_by())
        tmp = dirs["clean"] + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _reset(dirs["clean"])
        os.rename(tmp, dirs["clean"])
        clean = spark_b.read.parquet(dirs["clean"])

        v = _write_dim(
            upsert_dim_append(_read("dim_vendor"), clean,
                              ["vendor_code"], "vendor_key", "UNKNOWN"),
            "dim_vendor")
        p = _write_dim(
            upsert_dim_append(
                _read("dim_payment"),
                clean.withColumnRenamed("payment_type", "payment_type_nk"),
                ["payment_type_nk"], "payment_type_key", "UNKNOWN"),
            "dim_payment")
        rc = _write_dim(
            upsert_dim_append(_read("dim_rate_code"), clean,
                              ["rate_code_nk"], "rate_code_key", "UNKNOWN"),
            "dim_rate_code")
        fl = _write_dim(
            upsert_dim_append(_read("dim_flag"), clean,
                              ["flag_nk"], "flag_key", "UNKNOWN"),
            "dim_flag")
        loc_src = (
            clean.select(F.col("pu_loc_id").alias("location_id_nk"))
            .unionByName(clean.select(F.col("do_loc_id").alias("location_id_nk")))
        )
        loc = _write_dim(
            upsert_dim_append(_read("dim_location"), loc_src,
                              ["location_id_nk"], "location_key", -1),
            "dim_location")

        # fact maintenance scoped to the batch's touched partitions
        touched = [r[0] for r in incoming.select("ingest_date").distinct().collect()]
        part_clean = clean.where(F.col("ingest_date").isin(touched))
        write_partition_overwrite(_build_fact(part_clean, v, p, rc, fl, loc),
                                  dirs["fact"], ["ingest_date"])

    _run_available_now(
        slice_stream.writeStream.foreachBatch(upsert_model)
        .option("checkpointLocation", ckpt))
    return {name: spark.read.parquet(path) for name, path in dirs.items()}
