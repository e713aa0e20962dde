"""Round-5 plan-shape audit: the rank-family serving entries
(pareto_customer_share, ntile_quartiles) and the histogram stats pass
must never funnel the frame through a single reducer — no
unpartitioned Window, which physically appears as an
`Exchange SinglePartition` feeding the Window's Sort."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

ENTRIES = [
    "pareto_customer_share",
    "ntile_quartiles",
    "column_stats_histogram",
    "customer_value_rank",
    "winsorized_stats",
]


def _plan(df, mode="simple"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.mark.parametrize("name", ENTRIES)
def test_no_single_reducer_window(name, spark):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    plan = _plan(df)
    # an unpartitioned Window compiles to Window <- Sort <- Exchange
    # SinglePartition: the whole frame on one reducer.  The ranks.py
    # machinery replaces it with a pid-partitioned Window over the
    # range-repartitioned (checkpointed) frame.
    assert "Exchange SinglePartition" not in plan, (name, plan)
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", ["vocab_topk", "bigram_topk"])
def test_topk_uses_bounded_heap_not_global_sort(name, spark):
    """Corpus top-k must compile to TakeOrderedAndProject (per-
    partition bounded heaps) — ranking the whole aggregated
    vocabulary through one reducer was the regression this pins."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, name
    assert "Exchange rangepartitioning" not in plan, name


@pytest.mark.parametrize("name", ENTRIES)
def test_rank_values_match_window_form(name, spark):
    """The distributed rank must be bit-identical to the Window form
    it replaced (same total order, same tiebreaks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    if name == "pareto_customer_share":
        w = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        got = df.select("o_custkey", "spend_rank",
                        F.row_number().over(w).cast("bigint")
                        .alias("want")).collect()
        assert all(r["spend_rank"] == r["want"] for r in got)
    elif name == "ntile_quartiles":
        w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
        got = df.select("o_custkey", "quartile",
                        F.ntile(4).over(w).cast("int")
                        .alias("want")).collect()
        assert all(r["quartile"] == r["want"] for r in got)
    elif name == "winsorized_stats":
        # cut points equal the PERCENTILE_DISC-style rank selection
        rows = {r["event_type"]: r for r in df.collect()}
        from azure_nyctaxi_lambda_elt_spark.sources.tables import (
            load_table)
        ev = load_table(spark, SF_SMOKE, "events")
        for etype, r in rows.items():
            vals = sorted(
                (x["value"], x["event_id"]) for x in
                ev.where(F.col("event_type") == etype)
                .select("value", "event_id").collect())
            n = len(vals)
            assert r["n_events"] == n
            assert r["lo_cut"] == vals[(n + 99) // 100 - 1][0]
            assert r["hi_cut"] == vals[(99 * n + 99) // 100 - 1][0]
            clipped = [min(max(v, r["lo_cut"]), r["hi_cut"])
                       for v, _ in vals]
            assert abs(r["mean_winsor"]
                       - round(sum(clipped) / n, 6)) < 1e-5
    elif name == "customer_value_rank":
        w = (Window.partitionBy("c_mktsegment")
             .orderBy(F.desc("total_spend"), F.asc("c_custkey")))
        got = df.select(
            "c_custkey", "seg_rank", "pct_rank", "cume",
            F.dense_rank().over(w).cast("bigint").alias("w_rank"),
            F.round(F.percent_rank().over(w), 6).alias("w_pct"),
            F.round(F.cume_dist().over(w), 6).alias("w_cume"),
        ).collect()
        assert all(r["seg_rank"] == r["w_rank"]
                   and r["pct_rank"] == r["w_pct"]
                   and r["cume"] == r["w_cume"] for r in got)
    else:  # histogram: equi-depth property — bucket sizes differ <= 1
        sizes = [r["n_rows"] for r in df.collect()]
        assert sizes and max(sizes) - min(sizes) <= 1
