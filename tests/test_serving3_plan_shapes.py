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
    """The bitmap must reject most NON-matching keys (false-positive
    rate ≪ 1) at whatever size the build-side count dictates — the
    saturation-proof claim, not an sf-specific bit count."""
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.plans.serving3_catalog import (
        bloom_bitmap, bloom_n_bits, bloom_probe_predicate)
    from azure_nyctaxi_lambda_elt_spark.sources.tables import load_table

    cust = (load_table(spark, SF_SMOKE, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    n_bits = bloom_n_bits(cust.count())
    bloom = bloom_bitmap(cust, "c_custkey", n_bits)

    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey")
    non_matching = orders.join(cust, orders.o_custkey == cust.c_custkey,
                               "left_anti")
    n_non = non_matching.count()
    if n_non == 0:
        return  # nothing to prune at this sf
    fp = (non_matching.join(F.broadcast(bloom))
          .where(F.expr(bloom_probe_predicate("o_custkey", n_bits)))
          .count())
    assert fp / n_non < 0.1, f"bloom FPR {fp}/{n_non} — bitmap saturated"

    # sizing invariants: ≥16 bits/key, power of two, capped
    assert n_bits >= min(16 * max(1, cust.count()), 1 << 24) / 2
    assert n_bits & (n_bits - 1) == 0


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
    # the gram cache is released inside the query (localCheckpoint of
    # the doc-sized aggregates, then grams.unpersist) — verify no
    # StorageLevel-cached InMemoryRelation survives into this plan
    assert "InMemoryTableScan" not in plan, plan


def test_mixture_weights_map_only_keep_decision(spark):
    """The keep decision joins a broadcast |sources|-row plan — the
    documents scan must not hash-exchange for it."""
    from azure_nyctaxi_lambda_elt_spark.plans.llm2_catalog import (
        q_mixture_weights)

    plan = _plan(q_mixture_weights(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan


def test_percentile_value_ranks_reduced_frame(spark):
    """The per-type window must rank the (type, value, count)
    pre-aggregate, never raw events — at 100 TB a raw per-type sort
    puts the whole fact on |types| ≈ 5 reducers."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_percentile_value

    plan = _plan(q_percentile_value(spark, SF_SMOKE))
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "Window" in l]
    assert win_idx, plan
    # an aggregate must sit BELOW the window operator in the tree
    below = "\n".join(lines[win_idx[0]:])
    assert "HashAggregate" in below or "SortAggregate" in below, plan


def test_ngram_jaccard_caps_hot_shingles(spark):
    """The document-frequency cap must drop ubiquitous shingles before
    the self-join (hot-key guard), without changing results at corpus
    scales where no shingle exceeds the cap."""
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import (
        ngram_jaccard_pairs)

    docs = spark.createDataFrame(
        [(i, "the common prefix phrase " + ("x%d y%d z%d " % (i, i, i)) * 3)
         for i in range(30)], "doc_id long, text string")
    # cap=10: the shared 'the common prefix...' shingles (df=30) must be
    # dropped -> no pair survives; uncapped, every pair shares them
    capped = ngram_jaccard_pairs(docs, 3, 0.05, max_df=10).count()
    uncapped = ngram_jaccard_pairs(docs, 3, 0.05, max_df=None).count()
    assert uncapped > 0 and capped == 0


def test_brute_force_guards_refuse_oversized_inputs(spark):
    """cosine_pairs / cosine_topk must REFUSE inputs beyond their caps
    (scale-safety contract) instead of planning quadratic joins."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.operators import ann

    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .limit(50))
    old_corpus, old_queries = ann.MAX_BRUTE_CORPUS, ann.MAX_BRUTE_QUERIES
    try:
        ann.MAX_BRUTE_CORPUS = 10
        with _pytest.raises(ValueError, match="brute-force cap"):
            ann.cosine_pairs(emb, 0.5)
        ann.MAX_BRUTE_QUERIES = 2
        with _pytest.raises(ValueError, match="brute-force cap"):
            ann.cosine_topk(emb, F.lit(True), 5)
    finally:
        ann.MAX_BRUTE_CORPUS = old_corpus
        ann.MAX_BRUTE_QUERIES = old_queries
