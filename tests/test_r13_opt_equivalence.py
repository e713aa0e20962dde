"""Round-13 optimization equivalence pins.

The r13 optimization round moves per-commit stats and bloom-sidecar
computation INTO the write job (DataFrame.observe + bitmap aggs)
instead of separate read-back jobs, and batches multi-dir sidecar
builds into one tagged scan.  These tests pin that the optimized
paths produce BYTE-IDENTICAL artifacts to the legacy read-back
formulation, which stays available in bloomindex.build_bloom_index /
txnlog._col_stats as the reference implementation.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import bloomindex, txnlog

SF = "/root/testdata/sf0.001"
TMP = "/tmp/spark_graft_test_r13opt"


@pytest.fixture(scope="module")
def trips(spark):
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    return tf.trip_clean(
        tf.typed_trips(tf.raw_trips(spark, SF))).localCheckpoint()


def _sidecar_bodies(path: str) -> dict:
    root = os.path.join(path, "_txn", "bloom")
    out = {}
    if not os.path.isdir(root):
        return out
    for f in sorted(os.listdir(root)):
        if f.endswith(".json"):
            with open(os.path.join(root, f)) as fh:
                out[f] = json.load(fh)
    return out


def test_commit_stats_match_readback(spark, trips):
    """Manifest stats/rows recorded by the observe-based commit equal
    a from-scratch read-back aggregation over the written files."""
    out = os.path.join(TMP, "stats_eq")
    shutil.rmtree(out, ignore_errors=True)
    txnlog.commit(trips, out, "overwrite",
                  stats_cols=["trip_uid", "ingest_date", "fare_amount",
                              "source_file_name"])
    man = txnlog._read_manifest(out, 0)
    assert man["dirs"] and man["stats"] and man["rows"]
    for d in man["dirs"]:
        ref_stats, ref_n = txnlog._col_stats(
            spark.read.parquet(os.path.join(out, d)),
            ["trip_uid", "ingest_date", "fare_amount",
             "source_file_name"])
        assert man["stats"][d] == ref_stats
        assert man["rows"][d] == ref_n


def test_commit_bloom_sidecar_matches_legacy_build(spark, trips):
    """Sidecars written from the in-write-job bitmaps are byte-equal
    to the legacy per-dir read-back build."""
    out = os.path.join(TMP, "bloom_eq")
    shutil.rmtree(out, ignore_errors=True)
    txnlog.commit(trips, out, "overwrite",
                  stats_cols=["trip_uid"],
                  bloom_cols=["trip_uid", "source_file_name"])
    got = _sidecar_bodies(out)
    assert got, "commit wrote no sidecars"
    # wipe and rebuild with the legacy reference implementation
    shutil.rmtree(os.path.join(out, "_txn", "bloom"))
    for col in ("trip_uid", "source_file_name"):
        bloomindex.build_bloom_index(spark, out, col)
    ref = _sidecar_bodies(out)
    assert got == ref


def test_partitioned_commit_bloom_matches_legacy(spark, trips):
    """Partitioned commits (one sidecar per leaf dir) out of the
    single combined stats+bloom job equal the legacy per-dir build,
    including the declared-column stats themselves."""
    out = os.path.join(TMP, "bloom_part_eq")
    shutil.rmtree(out, ignore_errors=True)
    txnlog.commit(trips, out, "overwrite",
                  stats_cols=["trip_uid"], bloom_cols=["trip_uid"],
                  partition_by=["ingest_date"])
    man = txnlog._read_manifest(out, 0)
    assert len(man["dirs"]) > 1, "expected one dir per partition value"
    got = _sidecar_bodies(out)
    assert len(got) == len(man["dirs"])
    shutil.rmtree(os.path.join(out, "_txn", "bloom"))
    bloomindex.build_bloom_index(spark, out, "trip_uid")
    assert got == _sidecar_bodies(out)
    for d in man["dirs"]:
        ref_stats, ref_n = txnlog._col_stats(
            spark.read.parquet(os.path.join(out, d)),
            sorted({"trip_uid", "ingest_date"}))
        assert man["stats"][d] == ref_stats
        assert man["rows"][d] == ref_n


def test_merge_restated_stats_match_readback(spark, trips):
    """MERGE's rewritten-dir stats (observe path) equal read-back."""
    out = os.path.join(TMP, "merge_stats_eq")
    shutil.rmtree(out, ignore_errors=True)
    txnlog.commit(trips, out, "overwrite", stats_cols=["trip_uid"],
                  bloom_cols=["trip_uid"])
    updates = trips.limit(50).withColumn(
        "fare_amount", F.col("fare_amount") + F.lit(1.0))
    txnlog.merge_upsert(spark, out, updates, ["trip_uid"])
    man = txnlog._read_manifest(out, 1)
    for d in man["dirs"]:
        ref_stats, ref_n = txnlog._col_stats(
            spark.read.parquet(os.path.join(out, d)), ["trip_uid"])
        assert man["stats"][d] == ref_stats
        assert man["rows"][d] == ref_n
    # sidecars for the fresh dir also equal the legacy build
    got = _sidecar_bodies(out)
    shutil.rmtree(os.path.join(out, "_txn", "bloom"))
    bloomindex.build_bloom_index(spark, out, "trip_uid", version=1)
    ref = _sidecar_bodies(out)
    assert all(ref[k] == v for k, v in got.items() if k in ref)


def test_empty_commit_stats_and_bloom(spark, trips):
    """Zero-row commits record the same (empty) stats and a zero
    bitmap exactly like the legacy path."""
    out = os.path.join(TMP, "empty_eq")
    shutil.rmtree(out, ignore_errors=True)
    txnlog.commit(trips.where(F.lit(False)), out, "overwrite",
                  stats_cols=["trip_uid"], bloom_cols=["trip_uid"])
    man = txnlog._read_manifest(out, 0)
    d = man["dirs"][0]
    ref_stats, ref_n = txnlog._col_stats(
        spark.read.parquet(os.path.join(out, d)), ["trip_uid"])
    assert man["stats"][d] == ref_stats
    assert man["rows"][d] == ref_n == 0
    got = _sidecar_bodies(out)
    shutil.rmtree(os.path.join(out, "_txn", "bloom"))
    bloomindex.build_bloom_index(spark, out, "trip_uid")
    assert got == _sidecar_bodies(out)


def test_spread_small_scan_values_unchanged(spark):
    """spread_small_scan redistributes rows, never changes them; and
    it no-ops above the one-split threshold."""
    from azure_nyctaxi_lambda_elt_spark.sources.tables import (
        load_table, spread_small_scan)

    ev = load_table(spark, SF, "events")
    sp = spread_small_scan(ev)
    a = sorted(ev.collect())
    b = sorted(sp.collect())
    assert a == b
    # a frame whose scan is already >= one split is left alone
    big = spread_small_scan(ev, threshold_bytes=1)
    assert big is ev
