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


def test_fuzzy_linkage_block_sizes_bounded(spark):
    """Deletion-neighborhood blocks carry all-but-one chars of the
    name, so a block's size is the number of TRUE lev<=1 neighbors
    meeting there, never an O(N/alphabet) fragment family.  Assert the
    empirical bound: max block size stays O(1)-ish and total candidate
    key rows stay ~(avg_len+1)*N."""
    import pyspark.sql.functions as F

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    n = cust.select(F.col("c_name").alias("name")).distinct()
    n_names = n.count()
    keys = n.select("name", F.explode(F.expr("""
        array_union(
          array(name),
          transform(sequence(1, length(name)),
            i -> concat(substring(name, 1, i - 1),
                        substring(name, i + 1, length(name)))))
    """)).alias("__v")).select("name", F.md5("__v").alias("__k"))
    sizes = keys.groupBy("__k").count()
    max_block = sizes.agg(F.max("count")).collect()[0][0]
    # TPC-H names are 'Customer#{9 digits}': a deletion variant is
    # shared only by names one edit apart — tiny blocks even though
    # the corpus is near-degenerate (all names share 9/18 chars).
    assert max_block <= 32, max_block
    # candidate pairs never blow up quadratically: sum of C(size,2)
    # over blocks stays linear-ish in N
    pairs_bound = sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)).collect()[0][0]
    assert pairs_bound <= 64 * n_names, (pairs_bound, n_names)


def test_heaps_curve_no_global_window(docs):
    """The r4 rework ranks NO corpus row through a window: prefix
    membership is a broadcast boundary comparison.  The plan must
    contain no Window operator and no single-partition Exchange on
    the token/doc side (the checkpoint frame itself is a tiny
    local-relation broadcast)."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        heaps_law_curve)

    plan = _plan(heaps_law_curve(docs))
    assert "Window" not in plan, plan[:2000]


def test_column_stats_histogram_no_unpartitioned_window(spark):
    """Every Window in the histogram plan must partition by the range
    partition id — the global NTILE (one reducer sorting the whole
    fact table) is banned."""
    import re

    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        column_stats_histogram)

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plan = _plan(column_stats_histogram(li))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the partition-local rank window"
    for s in specs:
        assert "__pid" in s, s
    assert "ntile" not in plan.lower()


def test_zorder_stats_no_sort_no_window(spark):
    """Z-order bucket stats are a map-side expression + one
    partial-aggregated groupBy: no sort, no window, no join beyond the
    one-row stats broadcast."""
    from azure_nyctaxi_lambda_elt_spark.operators.maintenance import (
        zorder_cluster_stats)

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plan = _plan(zorder_cluster_stats(li, "l_orderkey", "l_suppkey"))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan  # partial+final pair


def test_pagerank_edge_joins_are_keyed(docs):
    """Every per-iteration join keys on the node id — no nested loop,
    no cartesian; rank state stays node-sized."""
    from azure_nyctaxi_lambda_elt_spark.operators import llm_text as lt
    from azure_nyctaxi_lambda_elt_spark.operators.graph import pagerank
    from azure_nyctaxi_lambda_elt_spark.plans.llm_catalog import (
        JACCARD_N, JACCARD_TAU)

    plan = _plan(pagerank(
        lt.ngram_jaccard_pairs(docs, JACCARD_N, JACCARD_TAU)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
