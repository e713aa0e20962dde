"""End-to-end batch-ELT orchestrator (pl_daily analog): staged
materialized run with run_log, metrics, DQ gate, idempotent rerun."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from conftest import SF_SMOKE

WH = "/tmp/spark_graft_pipeline_test"


def test_batch_pipeline_end_to_end(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_fact_build_star
    from azure_nyctaxi_lambda_elt_spark.plans.pipeline import run_batch_pipeline

    shutil.rmtree(WH, ignore_errors=True)
    paths = run_batch_pipeline(spark, SF_SMOKE, WH, run_id="r1")

    # the fact built from MATERIALIZED layers equals the in-memory plan
    fact = spark.read.parquet(paths["mdl_fact_trip"])
    want = q_fact_build_star(spark, SF_SMOKE)
    assert fact.count() == want.count()
    g = {r["trip_id"] for r in fact.select("trip_id").collect()}
    w = {r["trip_id"] for r in want.select("trip_id").collect()}
    assert g == w

    # run_log: 3 SUCCEEDED stages in order, rows_copied populated
    log = spark.read.parquet(paths["ops_run_log"]).orderBy("started_at_utc")
    rows = log.collect()
    assert [r["stage"] for r in rows] == ["raw_to_stg", "stg_to_core", "core_to_mdl"]
    assert all(r["status"] == "SUCCEEDED" and r["rows_copied"] > 0 for r in rows)

    # DQ results written and all gate checks passed
    dq = spark.read.parquet(paths["ops_dq_result"])
    assert dq.where(F.col("status") == "FAILED").count() == 0

    # run_metrics: in = out + err per ingest_date
    m = spark.read.parquet(paths["ops_run_metrics"])
    bad_rows = m.where(
        F.col("rows_in") < F.col("rows_out")).count()
    assert bad_rows == 0

    # rerun with a new run_id: idempotent (same fact state), log appends
    n0 = fact.count()
    run_batch_pipeline(spark, SF_SMOKE, WH, run_id="r2")
    assert spark.read.parquet(paths["mdl_fact_trip"]).count() == n0
    log2 = spark.read.parquet(paths["ops_run_log"])
    assert log2.where(F.col("run_id") == "r2").count() == 3

def test_backfill_equals_full_run_and_is_idempotent(spark):
    """3-date backfill (per-date replay, append-only dims, per-partition
    fact rebuild) must equal the single-shot star build restricted to
    those dates, and re-running any date must be a no-op."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_fact_build_star
    from azure_nyctaxi_lambda_elt_spark.plans.pipeline import run_backfill

    wh = WH + "_backfill"
    shutil.rmtree(wh, ignore_errors=True)
    dates = ["2024-01-05", "2024-01-06", "2024-01-07"]
    paths = run_backfill(spark, SF_SMOKE, wh, dates)

    fact = spark.read.parquet(paths["mdl_fact_trip"])
    want = q_fact_build_star(spark, SF_SMOKE).where(
        F.col("ingest_date").isin(dates))
    assert fact.count() == want.count()
    g = {r["trip_id"] for r in fact.select("trip_id").collect()}
    w = {r["trip_id"] for r in want.select("trip_id").collect()}
    assert g == w

    # referential integrity: every fact key resolves in its dim
    for dim_key, path_key, nk in (
        ("vendor_key", "mdl_dim_vendor", "vendor_code"),
        ("rate_code_key", "mdl_dim_rate_code", "rate_code_nk"),
        ("flag_key", "mdl_dim_flag", "flag_nk"),
    ):
        dim = spark.read.parquet(paths[path_key])
        unresolved = fact.join(dim, dim_key, "left_anti").count()
        assert unresolved == 0, f"{dim_key}: {unresolved} orphans"

    # per-date run_log rows, all SUCCEEDED
    log = spark.read.parquet(paths["ops_run_log"])
    for d in dates:
        assert log.where((F.col("run_id") == f"backfill-{d}")
                         & (F.col("status") == "SUCCEEDED")).count() == 2

    # replaying the middle date changes nothing (idempotent overwrite,
    # stable dim keys)
    dims_before = {
        k: sorted(map(tuple, spark.read.parquet(paths[k]).collect()))
        for k in ("mdl_dim_vendor", "mdl_dim_payment", "mdl_dim_rate_code",
                  "mdl_dim_flag", "mdl_dim_location")}
    rows_before = sorted(map(tuple, fact.drop("loaded_at").collect()))
    run_backfill(spark, SF_SMOKE, wh, ["2024-01-06"], run_id_prefix="replay")
    fact2 = spark.read.parquet(paths["mdl_fact_trip"])
    assert sorted(map(tuple, fact2.drop("loaded_at").collect())) == rows_before
    for k, before in dims_before.items():
        assert sorted(map(tuple, spark.read.parquet(paths[k]).collect())) == before


def test_streaming_run_quality_log_marker(spark):
    """LogSuccess analog: the run marker row carries the run totals."""
    import os

    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_quality_log

    out = "/tmp/spark_graft_stream/test_run_quality"
    shutil.rmtree(out, ignore_errors=True)
    log = run_quality_log(spark, SF_SMOKE, out, run_id="pytest-run")
    marker = spark.read.parquet(os.path.join(out, "run_log")).collect()
    assert len(marker) == 1 and marker[0]["status"] == "SUCCEEDED"
    tot = log.agg(F.sum("good_rows").alias("g"), F.sum("dlq_rows").alias("d")).collect()[0]
    assert marker[0]["good_rows"] == tot["g"]
    assert marker[0]["dlq_rows"] == tot["d"]
    assert marker[0]["run_id"] == "pytest-run"


def test_late_dim_reconcile_invariants(spark):
    """Early-resolved keys must be stable across the dim upsert; every
    pending (-1) row re-resolves iff its zone arrived with the upsert;
    appended members get IDENTITY-continuation keys above the early
    max."""
    from conftest import SF_SMOKE
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import (
        q_late_dim_reconcile)

    rows = q_late_dim_reconcile(spark, SF_SMOKE).collect()
    assert rows
    early_keys = [r["pu_location_key"] for r in rows
                  if not r["was_late_resolved"]]
    late_keys = [r["pu_location_key"] for r in rows if r["was_late_resolved"]]
    assert late_keys, "the % 5 == 4 zones must exist in the feed"
    # late members continue AFTER the early key range (IDENTITY analog)
    assert min(late_keys) > max(early_keys)
    # reconciliation is exhaustive here: every zone arrives eventually
    assert all(r["pu_location_key"] != -1 for r in rows)
    for r in rows:
        assert r["was_late_resolved"] == (r["pu_loc_id"] % 5 == 4)
