"""Concurrency and property pins for the r8 late-window txn features:
the group-decision race (exactly one outcome whoever publishes
first), identity-assignment contiguity under arbitrary partitioning
(hypothesis), and the identity x partition_by x constraints
interplay."""

from __future__ import annotations

import os
import shutil
import threading

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_group_race_test"


@pytest.fixture()
def memory_store():
    store = txnlog.InMemoryConditionalPutLogStore()
    prev = txnlog.set_log_store(store)
    yield store
    txnlog.set_log_store(prev)


def test_decide_race_exactly_one_outcome(memory_store, tmp_path):
    """The group owner racing commit against a settler racing abort:
    the conditional PUT admits exactly ONE coordinator record, and
    BOTH racers return the decided outcome (never each their own)."""
    coord = str(tmp_path / "groups" / "g1.json")
    g = {"id": "g1", "coord": coord}
    barrier = threading.Barrier(2)
    results: dict[str, bool] = {}

    def race(name: str, committed: bool) -> None:
        barrier.wait()
        results[name] = txnlog._decide_group(g, committed)

    t1 = threading.Thread(target=race, args=("owner", True))
    t2 = threading.Thread(target=race, args=("settler", False))
    t1.start(); t2.start(); t1.join(); t2.join()
    # one decision, observed identically by both
    assert results["owner"] == results["settler"]
    import json
    with open(coord) as fh:
        assert json.load(fh)["committed"] is results["owner"]


def test_group_commit_through_object_store_double(spark, memory_store):
    """The whole two-phase protocol (member publishes + coordinator
    decision) runs unchanged through the conditional-PUT double —
    store-agnostic like every single-table commit."""
    a = os.path.join(OUT, "dbl_a")
    b = os.path.join(OUT, "dbl_b")
    for p in (a, b):
        shutil.rmtree(p, ignore_errors=True)
        txnlog.commit(spark.createDataFrame([(1, 10)], "id long, v long"),
                      p, "overwrite")
    txnlog.commit_group(
        [(spark.createDataFrame([(2, 20)], "id long, v long"), a),
         (spark.createDataFrame([(3, 30)], "id long, v long"), b)])
    assert txnlog.snapshot(spark, a).count() == 2
    assert txnlog.snapshot(spark, b).count() == 2
    # 2 seeds + 2 members + 1 coordinator record through the bucket
    assert len(memory_store._bucket) == 5


@settings(max_examples=8, deadline=None)
@given(n=st.integers(1, 40), parts=st.integers(1, 8),
       hwm=st.integers(0, 1_000_000))
def test_assign_identity_contiguous_for_any_layout(spark, n, parts, hwm):
    """The id SET is exactly hwm+1..hwm+n for every (row count,
    partition count, watermark) — per-partition offset blocks meet
    with no gap, overlap, or drift past the watermark."""
    df = spark.range(n).repartition(parts).selectExpr("id AS k")
    out, new_hwm = txnlog._assign_identity(df, "sk", hwm)
    got = sorted(r["sk"] for r in out.collect())
    assert got == list(range(hwm + 1, hwm + n + 1))
    assert new_hwm == hwm + n


def test_identity_composes_with_partitioning_and_constraints(spark):
    """All three table properties at once: a partitioned, constrained,
    identity table assigns ids inside every partition-value leaf,
    validates the assigned frame, and refuses violations without
    burning the watermark for the refused batch's rows."""
    path = os.path.join(OUT, "compose")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
        "k long, p string, v long")
    txnlog.commit(df, path, "overwrite", partition_by=["p"],
                  stats_cols=["k"], identity="sk",
                  constraints={"v_nonneg": "v >= 0"})
    snap = txnlog.snapshot(spark, path)
    assert sorted(r["sk"] for r in snap.collect()) == [1, 2, 3]
    # partitioned layout held (one manifest dir per value)
    man = txnlog._read_manifest(path, 0)
    assert len(man["dirs"]) == 2
    assert man["identity"]["hwm"] == 3
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit(
            spark.createDataFrame([(9, "c", -1)],
                                  "k long, p string, v long"),
            path, "append")
    # the refused batch consumed ids only in its orphaned dir — the
    # TABLE's watermark is unchanged, so the next good batch is
    # contiguous with the seed
    assert txnlog._read_manifest(
        path, txnlog.latest_version(path))["identity"]["hwm"] == 3
    txnlog.commit(
        spark.createDataFrame([(9, "c", 90)],
                              "k long, p string, v long"),
        path, "append")
    assert sorted(r["sk"] for r in
                  txnlog.snapshot(spark, path).collect()) == [1, 2, 3, 4]
