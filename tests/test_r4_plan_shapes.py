"""Plan-shape sweep over the round-4 entries: none may degenerate to
a cartesian product or a non-cross nested-loop join, ever — the
automated version of the manual explain() audit."""

from __future__ import annotations

import re

import pytest

from conftest import SF_SMOKE

ENTRIES = [
    "payment_map_scd",
    "late_data_audit",
    "cdc_apply_changes",
    "skew_profile",
    "zorder_cluster_stats",
    "dup_graph_pagerank",
    "multimodal_transform",
    "quality_weighted_sample",
    "heaps_law_curve",
    "column_stats_histogram",
    "fuzzy_name_linkage",
    # round-5 lazy entries (side-effectful r5 entries are audited by
    # their own suites; these build a plan without executing)
    "embedding_int8_quantize",
]


@pytest.mark.parametrize("name", ENTRIES)
def test_no_degenerate_joins(name, spark):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan, name
    nlj = re.findall(r"BroadcastNestedLoopJoin BuildRight, (\w+)", plan)
    assert all(j in ("Cross", "Inner") for j in nlj), (name, nlj)
