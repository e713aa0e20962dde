"""zorder_pruned_read: the pruning decision must actually skip
buckets, ride parquet partition pruning (not a post-scan filter), and
return exactly the unpruned answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def result_row(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        q_zorder_pruned_read)

    return q_zorder_pruned_read(spark, SF_SMOKE).collect()[0]


def test_prune_skips_buckets(result_row):
    """A corner rectangle covering 1/8 of each key range must prune
    most Morton buckets — if read == total the index is decorative."""
    assert result_row["n_buckets_read"] < result_row["n_buckets_total"]
    assert result_row["n_buckets_read"] >= 1


def test_pruned_rollup_equals_plain_filter(spark, result_row):
    """Conservativeness: the pruned scan's rollup must equal the same
    rectangle filter over the raw table (no bucket that held a
    matching row was skipped)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    a = F.col("l_orderkey").cast("bigint")
    b = F.col("l_suppkey").cast("bigint")
    st = li.agg(F.min(a).alias("amin"), F.max(a).alias("amax"),
                F.min(b).alias("bmin"), F.max(b).alias("bmax")
                ).collect()[0]
    a_hi = st["amin"] + (st["amax"] - st["amin"]) // 8
    b_hi = st["bmin"] + (st["bmax"] - st["bmin"]) // 8
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,4)")))
    want = (li.where((a <= a_hi) & (b <= b_hi))
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.round(F.sum(rev), 2).cast("double").alias("revenue"))
            ).collect()[0]
    assert result_row["n_rows"] == want["n_rows"]
    assert result_row["revenue"] == want["revenue"]


def test_kept_buckets_become_partition_filters(spark):
    """The kept-bucket predicate must reach the scan as a partition
    filter (dir-level skipping), not survive as a post-scan Filter."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        _zorder_out_dir, q_zorder_pruned_read)

    q_zorder_pruned_read(spark, SF_SMOKE)  # materializes the layout
    out = _zorder_out_dir(SF_SMOKE)
    back = spark.read.parquet(out).where(
        F.col("z_bucket").isin([0, 1, 2]))
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [z_bucket" in plan.replace(
        "PartitionFilters: [isnotnull(z_bucket", "PartitionFilters: [z_bucket"), plan
