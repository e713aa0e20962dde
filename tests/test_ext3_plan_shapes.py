"""Plan-shape guardrails for extension set J: the scale claims in the
module docstring, pinned against the actual physical plans."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_bm25_no_corpus_side_shuffle_join(docs):
    """df / query-map / corpus stats must broadcast; the only
    SortMergeJoin-eligible frame is the query-vocab-sparse tf table —
    and after the dl-through-explode rework there is no corpus-wide
    join at all (no join on doc_id except the final nothing)."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import bm25_topk

    plan = _plan(bm25_topk(docs))
    # the only nested-loop allowed is the one-row stats scalar cross
    import re
    nlj = re.findall(r"BroadcastNestedLoopJoin \S*\s*\S*", plan)
    assert all("Cross" in m for m in nlj), nlj
    # the three small sides all broadcast
    assert plan.count("BroadcastExchange") >= 3
    assert "SortMergeJoin" not in plan


def test_cms_cell_grid_aggregates_map_side(docs):
    """The sketch build must be a partial-aggregated groupBy: a
    HashAggregate pair around the exchange, never a raw token shuffle."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        cms_heavy_hitters)

    plan = _plan(cms_heavy_hitters(docs))
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan  # cell grid joins broadcast
    assert "SortMergeJoin" not in plan


def test_dup_span_shuffles_hashes_not_text(docs):
    """The span frame shuffles (doc_id, L, g-md5) triples; no join may
    degenerate to nested-loop."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        longest_dup_span)

    plan = _plan(longest_dup_span(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_joins_are_hash_joins(docs):
    """Bigram stream joins vocab-sized count tables — hash joins (SMJ
    acceptable at real scale, but no nested loop), and the V scalar
    broadcasts."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        ngram_lm_score)

    plan = _plan(ngram_lm_score(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "Cross" in plan


def test_attribution_join_is_keyed_not_nested_loop(spark):
    """The interval join must key on user_id (hash/sort-merge); the
    range predicates ride as join conditions, never a nested loop."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        attribution_last_touch)

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plan = _plan(attribution_last_touch(ev))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_linkage_blocked_not_crossed(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        fuzzy_name_linkage)

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    plan = _plan(fuzzy_name_linkage(cust))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
