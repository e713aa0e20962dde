"""Semantic unit tests for round-4 operators on tiny hand-built
frames — edge behavior the sf-scale oracle compare can't single out."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cdc_tombstone_only_user_is_absent(spark):
    """A key whose LATEST event is a tombstone must vanish — and a key
    whose tombstone is followed by a later upsert must resurface."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        cdc_apply_changes)

    ev = spark.createDataFrame(
        [  # (event_id, ts, user_id, event_type, value)
            (1, "2024-01-01 00:00:00", 1, "signup", 1.0),
            (2, "2024-01-02 00:00:00", 1, "error", 0.0),   # u1 deleted
            (3, "2024-01-01 00:00:00", 2, "error", 0.0),
            (4, "2024-01-02 00:00:00", 2, "purchase", 9.0),  # u2 back
            (5, "2024-01-01 00:00:00", 3, "error", 0.0),   # u3 only op
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r for r in cdc_apply_changes(ev).collect()}
    assert 1 not in out and 3 not in out
    assert out[2]["last_op"] == "purchase" and out[2]["last_value"] == 9.0


def test_zorder_buckets_narrow_in_both_dims(spark):
    """The point of Z-order: average per-bucket envelope width must be
    far below the full domain in BOTH dimensions (a plain sort is
    narrow only in the leading one)."""
    from azure_nyctaxi_lambda_elt_spark.operators.maintenance import (
        zorder_cluster_stats)

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("l_orderkey"),
        (F.col("id") / 64).cast("long").alias("l_suppkey"))
    stats = zorder_cluster_stats(grid, "l_orderkey", "l_suppkey").collect()
    assert len(stats) > 4
    avg_w_a = sum(r["a_max"] - r["a_min"] for r in stats) / len(stats)
    avg_w_b = sum(r["b_max"] - r["b_min"] for r in stats) / len(stats)
    # full domain width is 63; Z buckets must be much narrower in BOTH
    assert avg_w_a < 32 and avg_w_b < 32, (avg_w_a, avg_w_b)


def test_skew_profile_flags_hot_key(spark):
    """A planted hot key must drive max/skew/recommended_salt and the
    hot-key census."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        skew_profile)

    base = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100).alias("user_id"),
        F.lit("click").alias("event_type"))
    hot = spark.range(900).select(
        (F.col("id") + 10_000).alias("event_id"),
        F.lit(7).alias("user_id"),
        F.lit("click").alias("event_type"))
    row = skew_profile(base.unionByName(hot)).collect()[0]
    assert row["n_rows"] == 1900 and row["n_keys"] == 100
    assert row["max_per_key"] == 910          # key 7: 10 base + 900 hot
    assert row["p50_per_key"] == 10
    assert row["n_hot_keys"] == 1             # only key 7 exceeds 10x avg
    assert row["recommended_salt"] == 48      # ceil(910 / 19)
