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


def test_pruned_snapshot_opens_fewer_files(spark):
    """The skipping must be PHYSICAL: the pruned snapshot's scan
    opens only files under the kept bucket dirs — strictly fewer
    than the full clustered snapshot — not a post-scan filter."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        _zorder_out_dir, q_zorder_pruned_read)

    q_zorder_pruned_read(spark, SF_SMOKE)  # materializes the layout
    out = _zorder_out_dir(SF_SMOKE)
    v = txnlog.latest_version(out)
    stats = txnlog.manifest_stats(out, v)
    amin = min(s["a"][0] for s in stats.values())
    amax = max(s["a"][1] for s in stats.values())
    bmin = min(s["b"][0] for s in stats.values())
    bmax = max(s["b"][1] for s in stats.values())
    rect = [("a", amin, amin + (amax - amin) // 8),
            ("b", bmin, bmin + (bmax - bmin) // 8)]
    full = set(txnlog.snapshot(spark, out, v).inputFiles())
    pruned = set(txnlog.snapshot(spark, out, v, prune=rect).inputFiles())
    assert pruned < full  # strict subset: dirs really skipped
    kept, all_dirs = txnlog.prune_plan(out, v, rect)
    assert len(kept) < len(all_dirs)
    assert all(any(f"/{d}/" in f for d in kept) for f in pruned)
