"""Plan-shape regression tests for serving set H + LLM set 2: dims
must broadcast, filters must push to the scan, Q21's EXISTS rewrite
must touch the fact ONCE, the continuous-aggregate rollup must
re-aggregate hourly partials (not rescan raw twice), and the bloom
prune must broadcast a single bitmap row."""

from __future__ import annotations

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ship_mode_priority_pushes_year_filter(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_ship_mode_priority)

    plan = _plan(q_ship_mode_priority(spark, SF_SMOKE))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("l_shipdate" in l for l in pushed), plan


def test_excess_shipments_broadcasts_part_and_totals(spark):
    """part filter + per-part totals + supplier dim all broadcast; the
    lineitem scan shuffles once (the suppkey/partkey partial agg)."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_excess_shipments)

    plan = _plan(q_excess_shipments(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_waiting_orders_scans_lineitem_once(spark):
    """The correlated EXISTS/NOT-EXISTS pair is ONE per-order
    aggregate — the fact must appear exactly once in the plan (Q21's
    classic form self-joins it twice more)."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_waiting_orders)

    plan = _plan(q_waiting_orders(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_multi_res_rollup_single_raw_scan(spark):
    """Daily must derive from hourly partials: one events scan, and the
    daily agg input is the hourly aggregate (sum-of-sums), not raw."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_multi_res_rollup)

    plan = _plan(q_multi_res_rollup(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 1, plan


def test_mad_outliers_broadcasts_stats_back(spark):
    """Median/MAD stats frames reduce to |types| rows and broadcast —
    the events side is never hash-exchanged for the final join."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_mad_outliers)

    plan = _plan(q_mad_outliers(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_bloom_prune_broadcasts_bitmap_and_dim(spark):
    """The bitmap (one row) and the exact dim side both broadcast; the
    orders scan is never shuffled."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        q_bloom_join_prune)

    df = q_bloom_join_prune(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the probe side is never shuffled for a join (tiny exchanges for
    # the 16-row bitmap build + the |priorities|-row rollup are fine)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_bloom_prefilter_actually_prunes(spark):
    """The bitmap must reject most non-BUILDING customers' orders
    BEFORE the exact join (false-positive rate ≪ 1)."""
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        BLOOM_HASHES, _bloom_pos_sql)
    from azure_nyctaxi_lambda_elt_spark.sources.tables import load_table

    cust = (load_table(spark, SF_SMOKE, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    pos = cust.select(F.explode(F.array(
        *[F.expr(_bloom_pos_sql("c_custkey", j))
          for j in range(BLOOM_HASHES)])).alias("pos"))
    n_bits = pos.distinct().count()
    # at sf0.001 (~30 keys × 3 hashes) the 1024-bit table stays sparse
    assert n_bits < 256

    orders = load_table(spark, SF_SMOKE, "orders")
    n_orders = orders.count()
    match = orders.join(cust, orders.o_custkey == cust.c_custkey,
                        "left_semi").count()
    # exact-result check is the oracle's job; here assert selectivity:
    # the TRUE match fraction must be well below 1 so pruning matters
    assert match < n_orders


def test_exact_substring_dedup_shuffles_hashes_not_text(spark):
    """The gram frame carries (doc_id, md5) only — no `text` column may
    survive past the tokenize projection into the exchanges."""
    from azure_nyctaxi_lambda_elt_spark.plans.llm2_catalog import (
        q_exact_substring_dedup)

    df = q_exact_substring_dedup(spark, SF_SMOKE)
    plan = _plan(df)
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines, plan
    assert not any("text" in l for l in exchange_lines), exchange_lines
    df.unpersist = getattr(df, "unpersist", None)  # no-op guard


def test_mixture_weights_map_only_keep_decision(spark):
    """The keep decision joins a broadcast |sources|-row plan — the
    documents scan must not hash-exchange for it."""
    from azure_nyctaxi_lambda_elt_spark.plans.llm2_catalog import (
        q_mixture_weights)

    plan = _plan(q_mixture_weights(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
