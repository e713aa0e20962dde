"""ANALYZE statistics as manifest metadata (operators/txnlog.py
commit(analyze_cols=...) / analyze_stats): per-dir row count,
per-column NULL count, and exact NDV recorded at commit time by one
tagged aggregation job, read back from plain manifest JSON with no
data scan.  Reference parity: the post-load statistics maintenance
pass (sql/batchELT/mdl/load/45_postload_stats.sql)."""

from __future__ import annotations

import os
import shutil

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_txn_analyze_test"


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v string")


ROWS_A = [(1, "x", "a"), (2, "x", None), (3, "y", "a"), (4, "y", "b")]
ROWS_B = [(5, "x", None), (6, "y", None), (7, "y", "c")]


def test_recorded_stats_match_recompute_and_append_carries(spark):
    path = os.path.join(OUT, "t_basic")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  analyze_cols=["v", "grp"])
    recs = {(r["dir"], r["col"]): r for r in txnlog.analyze_stats(path)}
    assert len(recs) == 2
    (d0,) = {d for d, _ in recs}
    assert recs[(d0, "v")]["rows"] == 4
    assert recs[(d0, "v")]["nulls"] == 1
    assert recs[(d0, "v")]["ndv"] == 2          # a, b (NULL excluded)
    assert recs[(d0, "grp")] == {
        "dir": d0, "version_born": 0, "rows": 4, "col": "grp",
        "nulls": 0, "ndv": 2}
    # append: the parent dir's records carry, the new dir adds its own
    txnlog.commit(_df(spark, ROWS_B), path, "append",
                  analyze_cols=["v", "grp"])
    recs = {(r["version_born"], r["col"]): r
            for r in txnlog.analyze_stats(path)}
    assert len(recs) == 4
    assert recs[(0, "v")]["nulls"] == 1          # carried unchanged
    assert recs[(1, "v")] ["rows"] == 3
    assert recs[(1, "v")]["nulls"] == 2
    assert recs[(1, "v")]["ndv"] == 1            # just c


def test_partitioned_commit_records_per_leaf(spark):
    """A partitioned commit's manifest lists one dir per partition
    value; analyze stats land at that same leaf grain — ONE tagged
    job, never a job per partition."""
    path = os.path.join(OUT, "t_part")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  partition_by=["grp"], analyze_cols=["v"])
    recs = txnlog.analyze_stats(path)
    by_leaf = {r["dir"]: r for r in recs}
    assert len(by_leaf) == 2
    x_leaf = [d for d in by_leaf if "__p_grp=x" in d]
    y_leaf = [d for d in by_leaf if "__p_grp=y" in d]
    assert x_leaf and y_leaf
    assert by_leaf[x_leaf[0]]["rows"] == 2
    assert by_leaf[x_leaf[0]]["nulls"] == 1
    assert by_leaf[x_leaf[0]]["ndv"] == 1
    assert by_leaf[y_leaf[0]]["rows"] == 2
    assert by_leaf[y_leaf[0]]["nulls"] == 0
    assert by_leaf[y_leaf[0]]["ndv"] == 2


def test_readback_is_metadata_only(spark):
    """The structural claim: analyze_stats answers after the DATA
    DIRS ARE GONE — it reads manifest JSON, never the parquet."""
    path = os.path.join(OUT, "t_meta")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  analyze_cols=["v"])
    before = txnlog.analyze_stats(path)
    for entry in os.listdir(path):
        if entry.startswith("data-"):
            shutil.rmtree(os.path.join(path, entry))
    assert txnlog.analyze_stats(path) == before


def test_rewrite_paths_drop_stale_records(spark):
    """compact rewrites dirs without analyze_cols: the rewritten
    dirs' records drop (stale stats must never describe bytes that
    no longer exist); a fresh analyze commit re-records."""
    path = os.path.join(OUT, "t_rewrite")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  analyze_cols=["v"])
    txnlog.commit(_df(spark, ROWS_B), path, "append",
                  analyze_cols=["v"])
    assert len(txnlog.analyze_stats(path)) == 2
    txnlog.compact(spark, path)
    assert txnlog.analyze_stats(path) == []
    # re-record over the compacted layout
    snap = txnlog.snapshot(spark, path)
    txnlog.commit(snap, path, "overwrite", analyze_cols=["v"])
    recs = txnlog.analyze_stats(path)
    assert len(recs) == 1
    assert recs[0]["rows"] == 7
    assert recs[0]["nulls"] == 3
    assert recs[0]["ndv"] == 3
