#!/usr/bin/env python
"""Headline-query benchmark.

Runs the engine's flagship queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries", "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# FROZEN round-1 headline list — `value` totals EXACTLY these 28 so the
# per-round BENCH numbers stay comparable (BASELINE.md records r1's
# 38.18 s @ sf0.1).  New queries go in BENCH_NEW_QUERIES below and are
# reported separately, never folded into the headline total.
BENCH_QUERIES = [
    "fact_build_star",
    "pricing_summary",
    "dedupe_latest_wins",
    "hourly_trend",
    "revenue_by_dim",
    "top_n_per_group",
    "sessionize",
    "quality_audit",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "lang_id",
    "token_count",
    "doc_fingerprint",
    "dedup_clusters",
    "dedup_lsh_jaccard",
    "doc_repetition",
    "distinct_sketch",
    "asof_join",
    "range_join",
    "vocab_topk",
    "pii_redact",
    "doc_chunking",
    "stratified_sample",
    "market_share",
    "product_profit",
]

# round-2+ additions: timed and reported under "new_queries"/"new_total"
BENCH_NEW_QUERIES = [
    "multimodal_decode",
    "exact_substring_dedup",
    "percentile_value",
    "bloom_join_prune",
    "ship_priority",
    "returned_item",
    # round-3 set J
    "bm25_topk",
    "ngram_lm_score",
    "heavy_hitters_cms",
    "longest_dup_span",
    "source_kl_divergence",
    "dedup_clusters_bigstar",
    # round-4 additions
    "payment_map_scd",
    "multimodal_transform",
    "zorder_cluster_stats",
    "dup_graph_pagerank",
    # round-5 additions
    "corpus_curation_pipeline",
    "hard_negative_mine_ivf",
    "winsorized_stats",
    "pareto_customer_share",   # distributed-rank rebuild
    # round-6 additions
    "txn_restore",
    "embedding_random_projection",
    "txn_bloom_pruned_read",
    "zorder_pruned_read",
    "quality_calibration",
    # round-7 additions
    "streaming_bloom_seeded_dedupe",
    "txn_schema_evolution_read",
    "txn_vacuum_retention",
    "zorder_incremental_read",
    "txn_partitioned_prune",
    # round-8 additions
    "txn_delete_vector",
    "txn_constraint_gate",
    "txn_identity_dim",
    "txn_multi_table",
    "streaming_gdpr_erasure",
    "rrf_fusion_topk",
    # round-9 additions
    "streaming_group_sink",
    # round-10 additions (prepared on the r10-txnlog-prep branch)
    "txn_analyze_stats",
    "txn_generated_columns",
    "dedup_prefix_filter",
    "txn_join_size_estimate",
    "txn_time_travel_ts",
    "txn_history",
    "txn_vacuum_dry_run",
    # round-11 additions
    "txn_stream_read",
    "txn_delete_where",
    "txn_update_where",
    "txn_snapshot_sql",
    "txn_cdf_dv",
    # round-12 additions
    "txn_history_sql",
    "txn_detail_sql",
    "txn_cdf_sql",
    "txn_stream_backpressure",
    "txn_dml_sql",
    # round-13 additions
    "txn_merge_when",
    "txn_merge_when_sql",
    "txn_merge_delete_sql",
    "txn_merge_sync_sql",
    "txn_alter_constraint_sql",
    "txn_convert_table",
]


def _calibrate(spark) -> float:
    """Fixed-work box-speed probe: a CONSTANT synthetic job (fixed
    row count, fixed plan, no I/O) timed in the same JVM as the
    bench, so any round's totals can be normalized for machine drift
    mechanically (the r7 verdict needed a judge-side A/B re-bench of
    the prior round's commit to adjudicate a 38% headline swing that
    was entirely the box).  min-of-3 after one warm run; the plan is
    a codegen'd range → arithmetic → two-level agg, sized ~2 s on
    the r8 reference box.  BASELINE.md records the reference value
    and the normalization rule."""
    def job():
        df = (spark.range(0, 400_000_000, 1, 64)
              .selectExpr("id",
                          "xxhash64(id) % 9973 AS k",
                          "CAST(id % 1021 AS DOUBLE) AS v")
              .groupBy("k")
              .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
              .groupBy()
              .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
        _force(df)

    from pyspark.sql import functions as F
    job()  # codegen warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    return best


# Fixed probe inputs for the scan-bound calibration axis: always the
# committed sf0.1 files (NOT $SPARK_GRAFT_SF_DIR), so the probe is
# constant work at any bench SF.
CALIB_IO_DIR = "/root/testdata/sf0.1"
CALIB_IO_TABLES = ["lineitem", "orders", "events", "documents",
                   "embeddings"]


def _calibrate_io(spark) -> float | None:
    """Second calibration axis (r9 watch item): a FIXED scan-bound
    probe.  `calib_sec` is a pure range→hash→agg job with no I/O, so
    it is blind to page-cache / disk contention — in r9 the
    parquet-scan-heavy headline cluster drifted +17–31% *normalized*
    with provably zero code churn while CPU-bound queries sat flat.
    This probe rides the same path those queries ride: full-file
    parquet scans (every column decoded — xxhash64 over all columns
    defeats pruning) over five committed sf0.1 files, min-of-3 after
    one warm pass.  Scan-bound drift is environmental iff
    calib_io_sec moved proportionally while calib_sec stayed flat;
    BASELINE.md records CALIB_IO_REF and the two-axis rule."""
    from pyspark.sql import functions as F
    paths = [os.path.join(CALIB_IO_DIR, f"{t}.parquet")
             for t in CALIB_IO_TABLES]
    if not all(os.path.exists(p) for p in paths):
        return None

    def job():
        parts = []
        for p in paths:
            df = spark.read.parquet(p)
            parts.append(df.select(
                # decimal accumulator: ANSI mode makes a long SUM of
                # full-range xxhash64 values overflow loudly
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
                      .cast("decimal(38,0)")).alias("h"),
                F.count(F.lit(1)).alias("n")))
        out = parts[0]
        for d in parts[1:]:
            out = out.unionAll(d)
        _force(out.groupBy().agg(F.sum("h").alias("h"),
                                 F.sum("n").alias("n")))

    job()  # warm: page cache + codegen — the headline queries run
    # warm too, so warm-scan throughput is the state to measure
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    return best


def _force(df) -> None:
    """Force FULL plan execution.  count() lets Catalyst prune projected
    expressions (a map-only query would measure ~nothing); the noop sink
    evaluates every output column without write cost."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from azure_nyctaxi_lambda_elt_spark.session import get_spark
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM with ONLY the headline plans (r7 finding: warming
    # the ever-growing new-query list first costs the headline total
    # ~5 s of GC/code-cache pressure in the same JVM — the new
    # queries warm AFTER the headline timing block instead, so the
    # frozen 28-entry total stays comparable as new_queries grows)
    for name in BENCH_QUERIES:
        _force(QUERIES[name](spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    # best-of-2 per query: single-shot timings on a shared box swing
    # ±20% (GC, page cache, JIT recompiles); min-of-2 reports the
    # engine's cost, not the machine's mood
    def time_set(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for _ in range(2):
            for name in names:
                spark.catalog.clearCache()  # no cross-query cache reuse
                t0 = time.perf_counter()
                _force(QUERIES[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
        return timings

    timings = time_set(BENCH_QUERIES)
    # box-speed probe immediately after the headline block: same JVM,
    # same machine state the headline numbers were taken under
    calib_sec = _calibrate(spark)
    calib_io_sec = _calibrate_io(spark)
    # new queries warm + time only now — their codegen/GC load never
    # touches the headline measurements above
    for name in BENCH_NEW_QUERIES:
        _force(QUERIES[name](spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()
    new_timings = time_set(BENCH_NEW_QUERIES)

    # stage decomposition for the one chronically-regressing entry:
    # time the dim-resolve stage alone over a pre-materialized
    # trip_clean, so fact_build_star growth stays attributable to
    # dedupe vs dim-resolve (reported under new_queries, never folded
    # into the frozen headline total)
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        clean = tf.trip_clean(
            tf.typed_trips(tf.raw_trips(spark, sf_dir))).localCheckpoint()
        t0 = time.perf_counter()
        _force(tf.fact_from_clean(clean))
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None else min(best, dt)
    new_timings["fact_star_dim_resolve_stage"] = best

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # key order matters: the round driver's artifact capture keeps
    # only the TAIL of this line when it is long, so the ever-growing
    # new_queries map goes FIRST and the headline trend metrics — the
    # frozen 28-query map and the total "value" — go LAST, where a
    # front-truncated capture still retains them (r10 verdict: the
    # driver row lost the headline value to front-truncation)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "sf": sf_val,
                "new_queries": new_timings,
                "new_total": round(sum(new_timings.values()), 3),
                "calib_sec": calib_sec,
                "calib_io_sec": calib_io_sec,
                "queries": timings,
                "value": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
