"""Concurrent-writer conflict semantics (WriteSerializable matrix,
operators/txnlog.py): a MERGE / DELETE that declares the snapshot it
derives from (``read_version=``) must rebase over compatible
interleaved commits (appends, compaction, disjoint-key keyed writes)
and raise ConcurrentModification for overlapping / undecidable ones
— never silently last-wins.  Reference parity: the reference's
sp-wrapped MERGE gets this from its MPP pool's implicit table lock
(sql/streaming/staging/usp_upsert_trip_clean_from_slice_streaming.sql);
a manifest log needs Delta's explicit conflict matrix."""

from __future__ import annotations

import json
import os

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
    ConcurrentModification, OP_KEYS_CAP)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _seed(spark, path, n=10):
    txnlog.commit(_df(spark, [(i, i * 10) for i in range(1, n + 1)]),
                  path, "overwrite")
    return 0


def _rows(spark, path):
    return {(r["id"], r["v"])
            for r in txnlog.snapshot(spark, path).collect()}


def test_disjoint_key_merges_both_land(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    # writer B lands first on keys {9, 10}
    txnlog.merge_upsert(spark, path, _df(spark, [(9, 900), (10, 1000)]),
                        ["id"], read_version=rv)
    # writer A derived its {1, 2} updates from v0; disjoint ⇒ rebase
    v = txnlog.merge_upsert(spark, path, _df(spark, [(1, 100), (2, 200)]),
                            ["id"], read_version=rv)
    assert v == 2
    got = _rows(spark, path)
    assert {(1, 100), (2, 200), (9, 900), (10, 1000)} <= got
    assert len(got) == 10


def test_overlapping_key_merge_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 222)]), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(2, 999), (3, 300)]),
                            ["id"], read_version=rv)
    # the refusal consumed no version and the winner's value survived
    assert txnlog.latest_version(path) == 1
    assert (2, 222) in _rows(spark, path)


def test_overlapping_delete_vs_merge_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 222)]), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.delete_keys(
            spark, path,
            spark.createDataFrame([(2,)], "id long"), ["id"],
            read_version=rv)
    # disjoint delete rebases fine
    v = txnlog.delete_keys(
        spark, path, spark.createDataFrame([(9,)], "id long"), ["id"],
        read_version=rv)
    assert v == 2
    got = _rows(spark, path)
    assert (2, 222) in got and all(k != 9 for k, _ in got)


def test_merge_vs_interleaved_delete_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.delete_keys(
        spark, path, spark.createDataFrame([(3,)], "id long"), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(3, 333)]),
                            ["id"], read_version=rv)


def test_append_and_maintenance_are_compatible(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.commit(_df(spark, [(11, 110)]), path, "append")   # v1
    txnlog.compact(spark, path)                              # v2
    v = txnlog.merge_upsert(spark, path, _df(spark, [(1, 100)]),
                            ["id"], read_version=rv)
    assert v == 3
    got = _rows(spark, path)
    assert (1, 100) in got and (11, 110) in got


def test_replace_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.commit(_df(spark, [(1, 1)]), path, "overwrite")
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(5, 500)]),
                            ["id"], read_version=rv)
    # restore is a replace too
    path2 = str(tmp_path / "t2")
    rv2 = _seed(spark, path2)
    txnlog.commit(_df(spark, [(11, 110)]), path2, "append")
    txnlog.restore(path2, 0)
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path2, _df(spark, [(5, 500)]),
                            ["id"], read_version=rv2)


def test_different_key_cols_refuse(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(9, 90)]), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(1, 90)]),
                            ["v"], read_version=rv)


def test_bulk_keyset_envelope_path(spark, tmp_path):
    path = str(tmp_path / "t")
    n = OP_KEYS_CAP + 100
    txnlog.commit(
        spark.range(1, n + 1).selectExpr("id", "id * 10 AS v"),
        path, "overwrite")
    # bulk merge: > OP_KEYS_CAP keys ⇒ manifest records envelope only
    txnlog.merge_upsert(
        spark, path,
        spark.range(1, n + 1).selectExpr("id", "id AS v"), ["id"])
    man = txnlog._read_manifest(path, 1)
    assert man["op"]["keys"]["vals"] is None
    assert man["op"]["keys"]["lo"] == 1 and man["op"]["keys"]["hi"] == n
    # disjoint point key outside the envelope rebases
    v = txnlog.merge_upsert(spark, path,
                            _df(spark, [(n + 50, 1)]), ["id"],
                            read_version=0)
    assert v == 2
    # point key inside the envelope refuses
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(7, 1)]),
                            ["id"], read_version=0)


def test_multicol_hash_descriptor(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 20)]),
                        ["id", "v"])
    man = txnlog._read_manifest(path, 1)
    assert man["op"]["keys"]["kind"] == "hash"
    # same composite key ⇒ refuse; different composite ⇒ rebase
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(2, 20)]),
                            ["id", "v"], read_version=rv)
    v = txnlog.merge_upsert(spark, path, _df(spark, [(7, 70)]),
                            ["id", "v"], read_version=rv)
    assert v == 2


def test_null_key_is_conservative(spark, tmp_path):
    path = str(tmp_path / "t")
    txnlog.commit(_df(spark, [(1, 10), (None, 20)]), path, "overwrite")
    txnlog.delete_keys(
        spark, path,
        spark.createDataFrame([(None,)], "id long"), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.delete_keys(
            spark, path,
            spark.createDataFrame([(None,)], "id long"), ["id"],
            read_version=0)


def test_read_version_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError):
        txnlog.merge_upsert(spark, path, _df(spark, [(1, 1)]),
                            ["id"], read_version=5)
    empty = str(tmp_path / "empty")
    ch = _df(spark, [(1, 1)]).selectExpr("id", "v",
                                         "false AS is_delete")
    with pytest.raises(ValueError):
        txnlog.merge_apply(spark, empty, ch, ["id"], "is_delete",
                           read_version=0)


def test_retry_helper_surfaces_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 222)]), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.commit_with_retry(
            lambda: txnlog.merge_upsert(
                spark, path, _df(spark, [(2, 999)]), ["id"],
                read_version=rv))
    assert txnlog.latest_version(path) == 1  # no retries burned versions


def test_default_stays_latest_wins(spark, tmp_path):
    # back-compat: no read_version ⇒ the unchecked rebase (documented
    # latest-wins) — existing pipelines keep their semantics
    path = str(tmp_path / "t")
    _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 222)]), ["id"])
    v = txnlog.merge_upsert(spark, path, _df(spark, [(2, 999)]), ["id"])
    assert v == 2
    assert (2, 999) in _rows(spark, path)


def test_pre_op_era_manifest_refuses(spark, tmp_path):
    # a manifest written before conflict tracking (no "op" field) is
    # undecidable unless it was an append — simulate by stripping the
    # field from the interleaved commit
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(9, 90)]), ["id"])
    mp = txnlog._manifest_path(path, 1)
    man = json.load(open(mp))
    del man["op"]
    del man["checksum"]  # pre-op-era manifests predate checksums too
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path, _df(spark, [(1, 100)]),
                            ["id"], read_version=rv)
    # but a pre-op-era APPEND (mode field) still passes
    man["mode"] = "append"
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)
    v = txnlog.merge_upsert(spark, path, _df(spark, [(1, 100)]),
                            ["id"], read_version=rv)
    assert v == 2


def test_declared_overwrite_conflicts_with_anything(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.commit(_df(spark, [(11, 110)]), path, "append")
    with pytest.raises(ConcurrentModification):
        txnlog.commit(_df(spark, [(1, 1)]), path, "overwrite",
                      read_version=rv)
    # undeclared overwrite keeps the unchecked semantics
    v = txnlog.commit(_df(spark, [(1, 1)]), path, "overwrite")
    assert v == 2


def test_declared_append_only_refuses_replaces(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 22)]), ["id"])
    txnlog.commit(_df(spark, [(11, 110)]), path, "append")
    txnlog.compact(spark, path)
    # keyed write + append + maintenance all serialize before it
    v = txnlog.commit(_df(spark, [(12, 120)]), path, "append",
                      read_version=rv)
    assert v == 4
    # ...but a replace after the declared snapshot refuses
    txnlog.restore(path, 0)
    with pytest.raises(ConcurrentModification):
        txnlog.commit(_df(spark, [(13, 130)]), path, "append",
                      read_version=4)
    with pytest.raises(ValueError):
        txnlog.commit(_df(spark, [(1, 1)]),
                      str(tmp_path / "empty"), "overwrite",
                      read_version=0)


def test_vacuumed_conflict_window_refuses_not_crashes(spark, tmp_path):
    """A declared-snapshot writer whose conflict window includes a
    vacuumed-away manifest must get ConcurrentModification (vacuumed
    interleaved commit = undecidable touched set), never a raw
    FileNotFoundError — callers following the recompute-and-retry
    contract only catch the former."""
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    for i in range(3):
        txnlog.commit(_df(spark, [(100 + i, i)]), path, "append")
    txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    # keyed write path (_check_write_conflict)
    with pytest.raises(ConcurrentModification, match="vacuumed"):
        txnlog.merge_upsert(spark, path, _df(spark, [(1, 11)]),
                            ["id"], read_version=rv)
    with pytest.raises(ConcurrentModification, match="vacuumed"):
        txnlog.delete_keys(spark, path,
                           spark.createDataFrame([(1,)], "id long"),
                           ["id"], read_version=rv)
    # full-table commit path (_check_commit_conflict)
    with pytest.raises(ConcurrentModification, match="vacuumed"):
        txnlog.commit(_df(spark, [(50, 500)]), path, "append",
                      read_version=rv)


def test_group_member_read_version_refused(spark, tmp_path):
    """read_version inside a transaction group has no single conflict
    point (visibility flips at the coordinator decision, after any
    window the check could cover) — the combination refuses loudly
    instead of offering an under-covering check."""
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    gid = "feedbeeffeedbeef"
    g = {"id": gid,
         "coord": os.path.join(path, "_txn", "groups", f"{gid}.json"),
         "members": [path]}
    with pytest.raises(ValueError, match="transaction group"):
        txnlog.commit(_df(spark, [(11, 110)]), path, "append",
                      group=g, read_version=rv)
    # the refusal consumed no version and published nothing
    assert txnlog.latest_version(path) == 0
    assert not os.path.exists(
        os.path.join(path, "_txn", "groups", f"{gid}.json"))
    # the same write WITHOUT the group (or without the declared
    # snapshot) is fine — only the combination is refused
    assert txnlog.commit(_df(spark, [(11, 110)]), path, "append",
                         read_version=rv) == 1
