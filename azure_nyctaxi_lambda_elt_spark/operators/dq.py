"""Data-quality checks, gates, and run metrics.

Reference parity:
- check_counts ≈ sql/test/40_data_quality.sql + mdl/load/50_dq_modeling.sql:
  a named list of violation-count checks evaluated in ONE pass and
  returned as (check_name, cnt[, status]) rows.
- dq_gate      ≈ 50_dq_modeling.sql's THROW when any FAILED.
- run_metrics  ≈ ops.run_metrics rows_in/rows_out/rows_err per layer+date
  (sql/batchELT/core/12_trip_clean.dedupe_load.sql:33-40).

Scale notes: the naive translation is one COUNT(*) scan per check; at
100 TB that is N full scans. check_counts instead computes ALL checks in
a single aggregate over one scan — sum(CASE WHEN violation THEN 1 END)
per check — then unpivots to the reference's row shape. One scan, one
(single-row) aggregation, no shuffle of the data itself.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DQGateError(RuntimeError):
    """Raised when any FAILED check exists (THROW 54000 analog)."""


def check_counts(
    df: DataFrame,
    checks: Mapping[str, Column],
    fail_checks: Sequence[str] = (),
) -> DataFrame:
    """Evaluate named violation predicates in one scan.

    Returns (check_name STRING, cnt BIGINT, status STRING) — status is
    FAILED/PASSED for names in ``fail_checks`` (cnt>0 fails), WARNING/
    PASSED otherwise, mirroring 50_dq_modeling.sql's severity split.
    Output is one row per check in the given order.
    """
    aggs = [
        F.sum(F.when(F.coalesce(pred, F.lit(False)), 1).otherwise(0))
        .cast("bigint")
        .alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in checks)
    long = wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, cnt)"
    )
    fail_set = set(fail_checks)
    status = (
        F.when(F.col("cnt") == 0, F.lit("PASSED"))
        .when(F.col("check_name").isin(*fail_set) if fail_set else F.lit(False),
              F.lit("FAILED"))
        .otherwise(F.lit("WARNING"))
    )
    return long.withColumn("status", status)


def dq_gate(results: DataFrame) -> DataFrame:
    """Raise DQGateError if any FAILED row exists; else pass through."""
    failed = [r["check_name"] for r in
              results.where(F.col("status") == "FAILED").collect()]
    if failed:
        raise DQGateError(f"DQ gate failed: {failed}")
    return results


def run_metrics(
    layer: str,
    table_name: str,
    rows_in: DataFrame,
    rows_out: DataFrame,
    rows_err: DataFrame,
    partition_col: str,
) -> DataFrame:
    """rows_in/rows_out/rows_err counts per partition value — the
    ops.run_metrics shape. Each input is aggregated with a map-side
    partial count then joined on the (small) partition key domain.
    """
    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(partition_col).agg(F.count("*").cast("bigint").alias(name))

    base = (
        cnt(rows_in, "rows_in")
        .join(cnt(rows_out, "rows_out"), partition_col, "full")
        .join(cnt(rows_err, "rows_err"), partition_col, "full")
        .na.fill(0, ["rows_in", "rows_out", "rows_err"])
    )
    return base.select(
        F.lit(layer).alias("layer"),
        F.lit(table_name).alias("table_name"),
        F.col(partition_col),
        "rows_in",
        "rows_out",
        "rows_err",
    )
