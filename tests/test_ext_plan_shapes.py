"""Plan-shape regression tests for the extension set: the physical
plans must keep the scale properties the docstrings promise (map-only
passes stay shuffle-free, CUBE is one Expand+agg, the JSON rollup
partial-aggregates map-side)."""

from __future__ import annotations

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_heuristic_filter_is_map_only(spark):
    """The quality filter must pipeline with the scan — any Exchange
    means a 100 TB pass would shuffle the whole corpus."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_heuristic_filter)

    plan = _plan(q_heuristic_filter(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan


def test_cube_is_single_expand_single_shuffle(spark):
    """CUBE must compute all grouping sets in ONE pass: exactly one
    Expand node and one shuffle (partial agg → exchange → final agg),
    not a union of per-grouping-set aggregations."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import q_cube_revenue

    plan = _plan(q_cube_revenue(spark, SF_SMOKE))
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "partial" in plan.lower(), plan  # map-side combine before shuffle


def test_json_extract_partial_aggregates(spark):
    """The JSON rollup must reduce map-side: one shuffle whose payload
    is |event_type| partial rows per task, not the events table.
    (countDistinct forces a second agg pass; both must be partial.)"""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_json_extract_props)

    plan = _plan(q_json_extract_props(spark, SF_SMOKE))
    assert "partial" in plan.lower(), plan


def test_funnel_is_single_shuffle(spark):
    """The funnel's sequential stage constraints run as array HOFs
    after ONE groupBy(user) shuffle — no self-joins."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_funnel_conversion)

    plan = _plan(q_funnel_conversion(spark, SF_SMOKE))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_paragraph_dedup_single_shuffle(spark):
    """Chunking is narrow (Generate, no shuffle); canonical selection
    is one window shuffle on the chunk hash."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_paragraph_dedup)

    plan = _plan(q_paragraph_dedup(spark, SF_SMOKE))
    assert plan.count("Exchange") == 1, plan


def test_snapshot_diff_prunes_columns(spark):
    """Both snapshot scans must read only (o_orderkey, o_totalprice) —
    a diff that drags all columns through the full-outer join reads
    3× the bytes at 100 TB."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_snapshot_diff)

    plan = _plan(q_snapshot_diff(spark, SF_SMOKE))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_orderdate" not in line and "o_orderstatus" not in line, line
