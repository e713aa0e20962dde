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
