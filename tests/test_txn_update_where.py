"""Predicate-level UPDATE (operators/txnlog.py update_where): DV
update lane (tombstone + append updated rows) vs copy-on-write,
simultaneous SET semantics, generated-column recompute, identity /
generated SET refusals, constraint validation, NULL predicate
semantics, metadata_count exactness, and the read_version contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
    ConcurrentModification, ConstraintViolation)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _seed(spark, path):
    txnlog.commit(
        _df(spark, [(i, "a" if i % 2 else "b", i * 1.0)
                    for i in range(1, 11)]),
        path, "overwrite", stats_cols=["id"])
    txnlog.commit(
        _df(spark, [(i, None if i >= 19 else "c", i * 1.0)
                    for i in range(11, 21)]),
        path, "append", stats_cols=["id"])
    return txnlog.latest_version(path)


def _vals(spark, path, version=None):
    return {r["id"]: r["v"] for r in
            txnlog.snapshot(spark, path, version).collect()}


def test_dv_update_lane(spark, tmp_path):
    path = str(tmp_path / "t")
    parent = _seed(spark, path)
    v = txnlog.update_where(spark, path, "id IN (3, 15)",
                            {"v": "v + 100.0"}, key_cols=["id"])
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "dv"
    pdirs = txnlog._read_manifest(path, parent)["dirs"]
    # old dirs all carried + exactly one fresh dir appended
    assert man["dirs"][:len(pdirs)] == pdirs
    assert len(man["dirs"]) == len(pdirs) + 1
    assert len(man["dv"]) == 1
    got = _vals(spark, path)
    assert got[3] == 103.0 and got[15] == 115.0
    assert got[4] == 4.0  # untouched
    assert len(got) == 20  # visible count unchanged
    assert txnlog.metadata_count(path) == 20  # exact through DV math
    # prior version still serves the pre-update values
    assert _vals(spark, path, parent)[3] == 3.0


def test_simultaneous_set_semantics(spark, tmp_path):
    """SET a = b, b = a must SWAP (both exprs read the pre-update
    row), not chain."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0, 20.0)],
                               "id long, a double, b double")
    txnlog.commit(df, path, "overwrite")
    txnlog.update_where(spark, path, "id = 1",
                        {"a": "b", "b": "a"})
    row = txnlog.snapshot(spark, path).collect()[0]
    assert (row["a"], row["b"]) == (20.0, 10.0)


def test_key_collision_forces_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    v = txnlog.update_where(spark, path, "grp = 'a' AND v < 4.0",
                            {"v": "v + 100.0"}, key_cols=["grp"])
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "rewrite"
    assert not man.get("dv")
    got = _vals(spark, path)
    assert got[1] == 101.0 and got[3] == 103.0
    assert got[5] == 5.0  # grp a but v >= 4: untouched
    assert len(got) == 20


def test_null_predicate_keeps_row_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    txnlog.update_where(spark, path, "grp = 'c'",
                        {"v": "v * 10.0"})
    got = _vals(spark, path)
    # NULL-grp rows (19, 20): predicate NULL → untouched
    assert got[19] == 19.0 and got[20] == 20.0
    assert got[11] == 110.0


def test_unknown_set_column_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError, match="not in the table"):
        txnlog.update_where(spark, path, "id = 1",
                            {"nope": "1"})
    # ...even when the predicate matches nothing (typo'd no-op
    # UPDATE must fail loudly, not silently succeed)
    with pytest.raises(ValueError, match="not in the table"):
        txnlog.update_where(spark, path, "id > 999",
                            {"nope": "1"})


def test_identity_and_generated_set_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    txnlog.commit(
        spark.createDataFrame([("x", 1.0)], "grp string, v double"),
        path, "overwrite", identity="rid",
        generated={"v2": "v * 2"})
    with pytest.raises(ValueError, match="identity"):
        txnlog.update_where(spark, path, "grp = 'x'",
                            {"rid": "rid + 1"})
    with pytest.raises(ValueError, match="GENERATED"):
        txnlog.update_where(spark, path, "grp = 'x'",
                            {"v2": "99.0"})


def test_generated_recomputed_on_updated_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    txnlog.commit(
        spark.createDataFrame([("x", 1.0), ("y", 3.0)],
                              "grp string, v double"),
        path, "overwrite", generated={"v2": "v * 2"})
    txnlog.update_where(spark, path, "grp = 'x'", {"v": "10.0"})
    got = {r["grp"]: (r["v"], r["v2"]) for r in
           txnlog.snapshot(spark, path).collect()}
    # updated row's generated column recomputed from the NEW source
    assert got["x"] == (10.0, 20.0)
    assert got["y"] == (3.0, 6.0)


def test_constraint_violating_update_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    txnlog.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
                  path, "overwrite",
                  constraints={"v_nonneg": "v >= 0"})
    with pytest.raises(ConstraintViolation):
        txnlog.update_where(spark, path, "id = 1",
                            {"v": "-5.0"}, key_cols=["id"])
    # refused atomically: no version consumed, values unchanged
    assert txnlog.latest_version(path) == 0
    assert _vals(spark, path)[1] == 1.0


def test_update_after_dv_update_chains(spark, tmp_path):
    """Updating the same key twice through the DV lane: the second
    discovery sees the post-first-update state (new dir row), and
    the final read serves only the newest version of the row."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    txnlog.update_where(spark, path, "id = 3",
                        {"v": "v + 100.0"}, key_cols=["id"])
    txnlog.update_where(spark, path, "id = 3",
                        {"v": "v + 1000.0"}, key_cols=["id"])
    got = _vals(spark, path)
    assert got[3] == 1103.0  # both applied, in order
    assert len(got) == 20
    assert txnlog.metadata_count(path) == 20


def test_read_version_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.merge_upsert(spark, path, _df(spark, [(2, "a", 2.5)]),
                        ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.update_where(spark, path, "id = 2",
                            {"v": "0.0"}, key_cols=["id"],
                            read_version=rv)
    # disjoint discovered keys rebase fine
    v = txnlog.update_where(spark, path, "id = 7",
                            {"v": "0.0"}, key_cols=["id"],
                            read_version=rv)
    assert v == rv + 2
    # an un-keyed update's op record blocks later declared writers
    txnlog.update_where(spark, path, "v > 15.0", {"v": "v"})
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(1, "a", 1.5)]), ["id"],
                            read_version=rv)


def test_partitioned_update_can_move_partitions(spark, tmp_path):
    """A SET on the partition column through the DV lane: the old
    row version is tombstoned in its old leaf, the updated row lands
    in a fresh dir-per-value leaf — the layout invariant holds."""
    path = str(tmp_path / "t")
    df = _df(spark, [(i, "g" + str(i % 2), float(i))
                     for i in range(1, 9)])
    txnlog.commit(df, path, "overwrite", partition_by=["grp"])
    v = txnlog.update_where(spark, path, "id = 2",
                            {"grp": "'moved'"}, key_cols=["id"])
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "dv"
    assert all("__p_grp=" in d for d in man["dirs"])
    got = {r["id"]: r["grp"] for r in
           txnlog.snapshot(spark, path).collect()}
    assert got[2] == "moved" and len(got) == 8


def test_key_column_set_records_union_for_conflicts(
        spark, tmp_path):
    """r12 fix (ADVICE r11, low): a SET that rewrites a key column
    must record BOTH the pre-update and post-update key values in
    the op descriptor — otherwise a later declared-snapshot keyed
    writer touching only the NEW values proves disjointness and
    silently last-wins over the update."""
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    v = txnlog.update_where(spark, path, "id = 3",
                            {"id": "CAST(303 AS BIGINT)"},
                            key_cols=["id"])
    man = txnlog._read_manifest(path, v)
    assert set(man["op"]["keys"]["vals"]) == {3, 303}
    assert txnlog.snapshot(spark, path).where("id = 303").count() == 1
    # a declared writer on the NEW key value now conflicts
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(303, "z", 0.0)]), ["id"],
                            read_version=rv)
    # the OLD value conflicts too (it always did)
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(3, "z", 0.0)]), ["id"],
                            read_version=rv)
    # a provably disjoint key still rebases fine
    txnlog.merge_upsert(spark, path, _df(spark, [(7, "z", 7.5)]),
                        ["id"], read_version=rv)
