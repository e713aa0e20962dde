"""Plan-shape regression tests for serving set G: top-N must compile
to TakeOrderedAndProject (no global sort), scan filters must push
down, dims must broadcast, and grouping-sets must run as ONE Expand
pass."""

from __future__ import annotations

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ship_priority_topn_is_heap_not_sort(spark):
    """Q3's top-10 must be TakeOrderedAndProject (an N-row heap per
    task) — a global Sort before a limit materializes the full
    aggregate at 100 TB."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_ship_priority)

    plan = _plan(q_ship_priority(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_forecast_revenue_pushes_filters_to_scan(spark):
    """Q6's date/quantity predicates must reach the parquet reader as
    PushedFilters — the whole query is scan-bound."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_forecast_revenue)

    plan = _plan(q_forecast_revenue(spark, SF_SMOKE))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("l_shipdate" in l for l in pushed), plan
    # single one-row aggregate: no hash-partition exchange at all
    assert "Exchange hashpartitioning" not in plan, plan


def test_volume_shipping_broadcasts_all_dims(spark):
    """Q7's supplier/customer/nation sides must broadcast — the fact
    scan shuffles only for the orders join + final tiny agg."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_volume_shipping)

    plan = _plan(q_volume_shipping(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_returned_item_topn_heap(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_returned_item)

    plan = _plan(q_returned_item(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_grouping_sets_single_expand_single_shuffle(spark):
    """All three grouping sets must run in ONE aggregation pass: one
    Expand, one hash-partition exchange."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_grouping_sets_revenue)

    plan = _plan(q_grouping_sets_revenue(spark, SF_SMOKE))
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_zscore_stats_broadcast_back(spark):
    """The per-type moment stats (|event types| rows) must come back
    as a broadcast — re-shuffling the full events scan for a 3-row
    join is wrong at any scale."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_zscore_outliers)

    plan = _plan(q_zscore_outliers(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_inverted_index_one_shuffle(spark):
    """Tokenize/explode are narrow; the only shuffle is the token
    groupBy (with map-side partial collect_set)."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_inverted_index)

    plan = _plan(q_inverted_index(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
