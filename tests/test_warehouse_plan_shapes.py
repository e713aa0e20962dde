"""Plan-shape regression tests for the warehouse set (classic
decision-support shapes): dims must broadcast, scalar subqueries must
not trigger per-row recompute, and each query's shuffle count must stay
at the minimum its shape requires."""

from __future__ import annotations

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_market_share_broadcasts_all_dims(spark):
    """The 6-way star join must resolve part/customer-subtree/supplier-
    subtree via broadcast — a SortMergeJoin against a dim means the
    100 TB fact would shuffle for dim resolution."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_market_share)

    plan = _plan(q_market_share(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "SortMergeJoin" not in plan, plan


def test_min_price_supplier_single_window_shuffle(spark):
    """The cheapest-supplier join-back is ONE window shuffle on
    l_partkey; the supplier→nation→region prune must happen before
    lineitem is touched (broadcast side)."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_min_price_supplier)

    plan = _plan(q_min_price_supplier(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_small_qty_broadcasts_correlated_agg(spark):
    """The Q17-style correlated avg must come back as a broadcast of
    the per-part aggregate, and the exact multiply-through threshold
    must leave exactly the one groupBy shuffle."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_small_qty_revenue)

    plan = _plan(q_small_qty_revenue(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_idle_customers_anti_join_and_scalar_broadcast(spark):
    """Q22 shape: the global-average scalar is a broadcast nested loop
    over ONE row (not a recompute per row), and NOT EXISTS is a left
    anti join."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_idle_customers)

    plan = _plan(q_idle_customers(spark, SF_SMOKE))
    assert "LeftAnti" in plan, plan


def test_cust_order_distribution_prunes_columns(spark):
    """Q13 shape must read only the join/filter keys — dragging
    o_totalprice/o_orderdate through the outer join triples scan bytes
    at 100 TB."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_cust_order_distribution)

    plan = _plan(q_cust_order_distribution(spark, SF_SMOKE))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "o_totalprice" not in line, line
            assert "c_acctbal" not in line, line


def test_important_part_share_reaggregates_not_rescans(spark):
    """Q11 shape: the total must re-aggregate from the persisted
    per-part rows, NOT rescan lineitem — one fact scan, one fact
    shuffle; the second branch reads the in-memory relation."""
    from azure_nyctaxi_lambda_elt_spark.plans.warehouse_catalog import (
        q_important_part_share)

    df = q_important_part_share(spark, SF_SMOKE)
    try:
        plan = _plan(df)
        # both the share filter and the scalar-total branch must read
        # the persisted per-part aggregate (the InMemoryRelation's
        # embedded plan text re-prints the one scan/shuffle — count the
        # cache reads, not the raw node strings)
        assert plan.count("InMemoryTableScan") == 2, plan
    finally:
        spark.catalog.clearCache()
