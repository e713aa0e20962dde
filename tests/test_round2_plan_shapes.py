"""Plan-shape regression tests for the round-2 additions: the scale
contracts (broadcast dims, single scans, reduced-frame windows, no
text through exchanges) must hold for the new entries too."""

from __future__ import annotations

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_m4_downsample_single_scan_broadcast_range(spark):
    """One events scan; the global (t0, t1) scalar joins as a broadcast
    (one-row frame) — the big side never shuffles before the one
    partial-aggregatable groupBy."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext2_catalog import (
        q_m4_downsample)

    plan = _plan(q_m4_downsample(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 2  # data scan + 1-row range scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_weighted_sample_windows_reduced_projection(spark):
    """The per-stratum window ranks the narrow (id, lang, key)
    projection — `text` must not travel through any exchange."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext2_catalog import (
        q_weighted_sample)

    plan = _plan(q_weighted_sample(spark, SF_SMOKE))
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines, plan
    assert not any("text" in l for l in exchange_lines), exchange_lines


def test_minhash_estimate_no_all_pairs(spark):
    """The estimator joins LSH candidates to signatures — the plan may
    contain only equi-joins (band/doc_id), never a nested-loop
    all-pairs join."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext2_catalog import (
        q_dedup_minhash_estimate)

    plan = _plan(q_dedup_minhash_estimate(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_json_dualkey_single_scan_no_shuffle_before_agg(spark):
    """The COALESCE extraction is map-only: one events scan and the
    only exchange is the final |event_type|-row aggregation."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_json_dualkey_extract)

    plan = _plan(q_json_dualkey_extract(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan


def test_rate_limit_batch_composite_key_window(spark):
    """The batch rate limit must window on the COMPOSITE (user, hour)
    key — hashpartitioning must carry both, so no per-user hot
    reducer absorbs a flood."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import (
        q_rate_limit_per_key)

    plan = _plan(q_rate_limit_per_key(spark, SF_SMOKE))
    part_lines = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert part_lines, plan
    # the projected hour column partitions alongside user_id (alias _w0)
    assert any("user_id" in l and "_w0" in l for l in part_lines), plan
    # rn <= N compiles to a partial+final WindowGroupLimit: each map
    # task pre-trims to N rows per (user, hour) before the shuffle
    assert plan.count("WindowGroupLimit") >= 2, plan
