"""GENERATED ALWAYS AS IDENTITY as a transaction-log TABLE PROPERTY
(operators/txnlog.py commit(identity=...) / _assign_identity): ids
assigned above a manifest high-water mark, contiguous per commit,
never reused — across appends, overwrites, MERGE (updates keep the
matched id, inserts draw fresh), restore (hwm stays monotone), and
maintenance commits.  The warehouse surrogate key the reference gets
from its MPP pool's IDENTITY (sql/batchELT/core/
10_dim_tables.sql's dim keys), owned by the log layer here."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_identity_test"


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "k long, v string")
    return df.repartition(parts) if parts else df


def _ids(spark, path):
    return sorted(r["sk"] for r in
                  txnlog.snapshot(spark, path).select("sk").collect())


def _hwm(path):
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    return man["identity"]["hwm"]


def _mk(spark, name, n=4, parts=None):
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(i, f"r{i}") for i in range(n)], parts),
                  path, "overwrite", identity="sk")
    return path


def test_contiguous_block_per_commit_across_partitions(spark):
    """A multi-partition commit's id SET is exactly hwm+1..hwm+n —
    per-partition offset blocks meet with no gap or collision."""
    path = _mk(spark, "t_basic", n=100, parts=7)
    assert _ids(spark, path) == list(range(1, 101))
    assert _hwm(path) == 100
    txnlog.commit(_df(spark, [(200 + i, "a") for i in range(50)],
                      parts=5), path, "append")
    assert _ids(spark, path) == list(range(1, 151))
    assert _hwm(path) == 150


def test_generated_always_rejects_provided_column(spark):
    path = _mk(spark, "t_always")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        txnlog.commit(
            spark.createDataFrame([(9, "x", 999)],
                                  "k long, v string, sk long"),
            path, "append")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        txnlog.merge_upsert(
            spark, path,
            spark.createDataFrame([(9, "x", 999)],
                                  "k long, v string, sk long"), ["k"])


def test_overwrite_continues_hwm_never_reuses(spark):
    """INSERT OVERWRITE keeps the watermark rising: replaced rows'
    ids are never handed out again (an id seen by any reader always
    means the same logical row)."""
    path = _mk(spark, "t_over", n=4)
    txnlog.commit(_df(spark, [(10, "n1"), (11, "n2")]), path,
                  "overwrite")
    assert _ids(spark, path) == [5, 6]
    assert _hwm(path) == 6


def test_merge_updates_keep_id_inserts_draw_fresh(spark):
    path = _mk(spark, "t_merge", n=4)
    before = {r["k"]: r["sk"] for r in
              txnlog.snapshot(spark, path).collect()}
    txnlog.merge_upsert(
        spark, path,
        spark.createDataFrame([(1, "upd"), (2, "upd"), (77, "new")],
                              "k long, v string"), ["k"])
    after = {r["k"]: r.asDict() for r in
             txnlog.snapshot(spark, path).collect()}
    assert after[1]["sk"] == before[1] and after[1]["v"] == "upd"
    assert after[2]["sk"] == before[2]
    assert after[77]["sk"] == 5            # fresh, above the hwm
    assert _hwm(path) == 5
    assert sorted(r["sk"] for r in after.values()) == [1, 2, 3, 4, 5]


def test_declare_on_append_to_existing_data_refused(spark):
    path = os.path.join(OUT, "t_lateadd")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, "a")]), path, "overwrite")
    with pytest.raises(ValueError, match="declare identity"):
        txnlog.commit(_df(spark, [(2, "b")]), path, "append",
                      identity="sk")
    # declaring on an overwrite of the same table is fine
    txnlog.commit(_df(spark, [(3, "c")]), path, "overwrite",
                  identity="sk")
    assert _ids(spark, path) == [1]


def test_restore_keeps_hwm_monotone(spark):
    """Rolling back never re-issues ids handed out by the rolled-back
    versions: post-restore inserts continue above the global max."""
    path = _mk(spark, "t_restore", n=2)          # v0: ids 1,2
    txnlog.commit(_df(spark, [(5, "x"), (6, "y")]), path,
                  "append")                      # v1: ids 3,4
    txnlog.restore(path, 0)                      # v2 = v0's rows
    assert _ids(spark, path) == [1, 2]
    assert _hwm(path) == 4                       # NOT rolled back
    txnlog.commit(_df(spark, [(7, "z")]), path, "append")
    assert _ids(spark, path) == [1, 2, 5]


def test_maintenance_and_clone_carry_the_property(spark):
    path = _mk(spark, "t_maint", n=3)
    txnlog.commit(_df(spark, [(9, "d")]), path, "append")
    txnlog.compact(spark, path)
    assert _hwm(path) == 4
    dst = os.path.join(OUT, "t_maint_clone")
    shutil.rmtree(dst, ignore_errors=True)
    txnlog.shallow_clone(path, dst)
    # the clone keeps assigning above the source's watermark
    txnlog.compact(spark, dst)  # localize dirs first (clone rule)
    txnlog.merge_upsert(spark, dst,
                        spark.createDataFrame([(42, "c")],
                                              "k long, v string"),
                        ["k"])
    assert _ids(spark, dst) == [1, 2, 3, 4, 5]


def test_delete_keys_carries_and_empty_batch_is_noop(spark):
    path = _mk(spark, "t_del", n=3)
    id_k1 = txnlog.snapshot(spark, path) \
        .where("k = 1").collect()[0]["sk"]
    txnlog.delete_keys(spark, path,
                       spark.createDataFrame([(1,)], "k long"), ["k"])
    assert _hwm(path) == 3
    txnlog.commit(_df(spark, [(8, "e")]).limit(0), path, "append")
    assert _hwm(path) == 3                       # empty commit: no ids
    txnlog.commit(_df(spark, [(8, "e")]), path, "append")
    assert sorted(_ids(spark, path)) == sorted(
        ({1, 2, 3} - {id_k1}) | {4})


def test_clear_property(spark):
    path = _mk(spark, "t_clear", n=2)
    txnlog.commit(_df(spark, [(5, "x")]).withColumn(
        "sk", F.lit(99).cast("long")), path, "append", identity="")
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert "identity" not in man
    assert 99 in _ids(spark, path)               # caller owns it now
