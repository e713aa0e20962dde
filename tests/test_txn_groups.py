"""Multi-table transaction groups (operators/txnlog.py commit_group):
two-phase publish over the LogStore primitive — member manifests
invisible until the coordinator record decides, all-or-none reader
visibility, abort on any member failure, stale-group settlement by
the next writer, and time-travel refusal of undecided members.  Plus
describe_detail, the metadata-only DESCRIBE DETAIL analog.
Reference parity: the reference's sp-wrapped multi-statement batches
commit fact + run-log in one Synapse transaction
(sql/batchELT/core/12_trip_clean.dedupe_load.sql with
30_runs_log)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_txn_group_test"


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _pair(spark, name):
    a = os.path.join(OUT, name + "_a")
    b = os.path.join(OUT, name + "_b")
    for p in (a, b):
        shutil.rmtree(p, ignore_errors=True)
        txnlog.commit(_df(spark, [(1, 10)]), p, "overwrite")
    return a, b


def test_group_commit_both_visible_atomically(spark):
    a, b = _pair(spark, "t_ok")
    out = txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    assert out == {os.path.abspath(a): 1, os.path.abspath(b): 1}
    assert txnlog.snapshot(spark, a).count() == 2
    assert txnlog.snapshot(spark, b).count() == 2
    # the member manifests carry the group marker and stay readable
    # as ordinary history (committed group == decided)
    man = txnlog._read_manifest(a, 1)
    assert man["group"]["id"] == txnlog._read_manifest(b, 1)["group"]["id"]


def test_member_failure_aborts_whole_group(spark):
    """A constraint violation on the SECOND table unwinds the first
    member: neither table advances (all-or-none)."""
    a, b = _pair(spark, "t_abort")
    txnlog.commit(_df(spark, [(9, 90)]), b, "append",
                  constraints={"v_nonneg": "v >= 0"})
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit_group(
            [(_df(spark, [(2, 20)]), a),
             (_df(spark, [(3, -30)]), b)])       # violates on b
    assert txnlog.latest_version(a) == 0
    assert txnlog.snapshot(spark, a).count() == 1
    assert txnlog.snapshot(spark, b).count() == 2
    # table a is NOT wedged: the aborted member's version number was
    # reclaimed and a plain commit lands
    txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    assert txnlog.snapshot(spark, a).count() == 2


def test_pending_group_invisible_and_settled_by_next_writer(spark):
    """A crashed coordinator (members published, no decision) leaves
    both tables readable at their PRE-group versions; a writer
    arriving after the grace window aborts and clears the group."""
    a, b = _pair(spark, "t_crash")
    gid = "deadbeefcafe0000"
    g = {"id": gid,
         "coord": os.path.join(txnlog._txn_dir(a), "groups",
                               f"{gid}.json")}
    txnlog.commit(_df(spark, [(2, 20)]), a, "append", group=g)
    txnlog.commit(_df(spark, [(3, 30)]), b, "append", group=g)
    # crash before deciding: occupied head exists, readers skip it
    assert txnlog._latest_occupied(a) == 1
    assert txnlog.latest_version(a) == 0
    assert txnlog.latest_version(b) == 0
    assert txnlog.snapshot(spark, a).count() == 1
    # time travel must refuse the undecided member
    with pytest.raises(ValueError, match="uncommitted transaction"):
        txnlog.snapshot(spark, a, version=1)
    # a fresh pending group is a concurrent writer: TxnConflict
    with pytest.raises(txnlog.TxnConflict):
        txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    # ...but past the grace window the next writer settles (aborts)
    old = txnlog.GROUP_SETTLE_GRACE_SECONDS
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        v = txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert v == 1                                # number reclaimed
    assert sorted(r["id"] for r in
                  txnlog.snapshot(spark, a).collect()) == [1, 4]
    # the coordinator decided ABORTED, so table b's member is dead
    # too: any writer there clears it the same way
    with open(g["coord"]) as fh:
        assert json.load(fh)["committed"] is False
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        txnlog.merge_upsert(spark, b, _df(spark, [(1, 11)]), ["id"])
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert {r["id"]: r["v"] for r in
            txnlog.snapshot(spark, b).collect()} == {1: 11}


def test_committed_group_survives_settlement_race(spark):
    """Once the coordinator record says committed, a later writer's
    settle pass leaves the members alone and builds on them."""
    a, b = _pair(spark, "t_decided")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    old = txnlog.GROUP_SETTLE_GRACE_SECONDS
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        txnlog.commit(_df(spark, [(5, 50)]), a, "append")
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert txnlog.snapshot(spark, a).count() == 3


def test_group_members_carry_table_properties(spark):
    """A group member is a REAL commit: constraints validate, and a
    violating member refuses the whole group."""
    a, b = _pair(spark, "t_props")
    txnlog.commit(_df(spark, [(8, 80)]), a, "append",
                  constraints={"v_nonneg": "v >= 0"})
    out = txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    assert out[os.path.abspath(a)] == 2
    man = txnlog._read_manifest(a, 2)
    assert man["constraints"] == {"v_nonneg": "v >= 0"}


def test_pinned_version_ops_refuse_undecided_members(spark):
    """restore/clone/CDF/describe pinned at an undecided group member
    must refuse — restore would otherwise RESURRECT an uncommitted
    write as a committed version."""
    a, b = _pair(spark, "t_pinned")
    gid = "feedfacefeedface"
    g = {"id": gid,
         "coord": os.path.join(txnlog._txn_dir(a), "groups",
                               f"{gid}.json")}
    txnlog.commit(_df(spark, [(2, 20)]), a, "append", group=g)
    with pytest.raises(ValueError, match="uncommitted transaction"):
        txnlog.restore(a, 1)
    with pytest.raises(ValueError, match="uncommitted transaction"):
        txnlog.change_feed(spark, a, 0, 1, ["id"])
    with pytest.raises(ValueError, match="uncommitted transaction"):
        txnlog.shallow_clone(a, os.path.join(OUT, "t_pinned_c"),
                             version=1)
    with pytest.raises(ValueError, match="uncommitted transaction"):
        txnlog.describe_detail(spark, a, version=1)
    # deciding the group makes the same pinned reads legal
    assert txnlog._decide_group(g, committed=True)
    assert txnlog.snapshot(spark, a, version=1).count() == 2
    txnlog.restore(a, 1)
    assert txnlog.latest_version(a) == 2


def test_duplicate_table_refused(spark):
    a, _ = _pair(spark, "t_dup")
    with pytest.raises(ValueError, match="once"):
        txnlog.commit_group([(_df(spark, [(2, 2)]), a),
                             (_df(spark, [(3, 3)]), a)])


def test_describe_detail_metadata_only(spark):
    path = os.path.join(OUT, "t_detail")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "id long, p string, v long"),
        path, "overwrite", partition_by=["p"], stats_cols=["id"],
        bloom_cols=["id"], constraints={"v_nonneg": "v >= 0"})
    txnlog.commit(
        spark.createDataFrame([(3, "a", 30)],
                              "id long, p string, v long"),
        path, "append")
    row = txnlog.describe_detail(spark, path).collect()[0].asDict()
    assert row["version"] == 1
    assert row["num_dirs"] == 3                  # p=a, p=b, then p=a
    assert row["num_rows"] == 3                  # manifest bookkeeping
    assert row["num_files"] > 0 and row["size_bytes"] > 0
    assert row["partition_by"] == ["p"]
    assert row["bloom_cols"] == ["id"]
    assert row["constraints"] == ["v_nonneg"]
    assert row["identity_col"] is None
    # pinned version describes that version's state
    old = txnlog.describe_detail(spark, path, version=0) \
        .collect()[0].asDict()
    assert old["num_dirs"] == 2 and old["num_rows"] == 2


def test_vacuum_gc_unreferenced_group_files(spark):
    """Group bookkeeping files (coordinator records + decision
    markers) GC with vacuum once no kept manifest references their
    gid — the per-micro-batch group sink must not accumulate two
    files per batch forever — while files of still-referenced gids
    stay."""
    a, b = _pair(spark, "t_gc")
    gids = []
    for i in range(3):
        txnlog.commit_group(
            [(_df(spark, [(10 + i, i)]), a),
             (_df(spark, [(20 + i, i)]), b)])
        gids.append(txnlog._read_manifest(
            a, txnlog.latest_version(a))["group"]["id"])
    groups_a = os.path.join(a, "_txn", "groups")
    # 3 coords + 3 markers before the GC
    assert len(os.listdir(groups_a)) == 6
    removed = txnlog.vacuum(a, keep_latest=1, grace_seconds=0)
    left = os.listdir(groups_a)
    # only the kept head's gid survives (its coord + its marker)
    assert {f.split(".", 1)[0] for f in left} == {gids[-1]}
    assert any(e.startswith("_txn/groups/") for e in removed)
    # b never vacuumed: all its versions still read as committed
    # (its own markers are intact; retired coords were repaired-first)
    for v in range(txnlog.latest_version(b) + 1):
        txnlog.snapshot(spark, b, version=v)


def test_vacuum_gc_repairs_missing_sibling_marker(spark):
    """Retiring a committed coordinator record must first repair a
    referencing member whose own mirror was lost (crash mid-mirror):
    deleting the only surviving commit evidence would flip that
    member committed → pending → settle-aborted."""
    a, b = _pair(spark, "t_repair")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    gid = txnlog._read_manifest(b, 1)["group"]["id"]
    # b's mirror lost to a crash; the coord in a is the only evidence
    os.remove(os.path.join(b, "_txn", "groups",
                           f"{gid}.decided.json"))
    # a moves on: kept manifests no longer reference the gid
    txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    txnlog.commit(_df(spark, [(5, 50)]), a, "append")
    txnlog.vacuum(a, keep_latest=2, grace_seconds=0)
    assert not os.path.exists(
        os.path.join(a, "_txn", "groups", f"{gid}.json"))
    # ...but b's mirror was rewritten BEFORE the coord retired
    mk = os.path.join(b, "_txn", "groups", f"{gid}.decided.json")
    assert os.path.exists(mk)
    assert json.load(open(mk))["committed"] is True
    # b's group member still reads committed and never settle-aborts
    assert txnlog.latest_version(b) == 1
    assert txnlog.snapshot(spark, b).count() == 2
    txnlog.commit(_df(spark, [(6, 60)]), b, "append")
    assert txnlog.latest_version(b) == 2


def test_vacuum_keeps_pre_members_committed_records(spark):
    """A committed record without a member list (pre-r11 format)
    is never GC'd — provably-safe retirement needs the members."""
    a, b = _pair(spark, "t_oldrec")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    gid = txnlog._read_manifest(a, 1)["group"]["id"]
    coord = os.path.join(a, "_txn", "groups", f"{gid}.json")
    with open(coord, "w") as fh:
        json.dump({"id": gid, "committed": True}, fh)  # old format
    txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    txnlog.commit(_df(spark, [(5, 50)]), a, "append")
    txnlog.vacuum(a, keep_latest=2, grace_seconds=0)
    assert os.path.exists(coord)


def test_settle_tolerates_non_numeric_grace(spark):
    """A non-numeric declared grace in a (pre-checksum / tampered)
    pending member manifest must fall back to the default instead of
    raising ValueError out of every subsequent writer's settle pass
    (which would wedge the table)."""
    import time

    p = os.path.join(OUT, "t_badgrace")
    shutil.rmtree(p, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10)]), p, "overwrite")
    gid = "deadbeefdeadbeef"
    g = {"id": gid,
         "coord": os.path.join(p, "_txn", "groups", f"{gid}.json"),
         "members": [p], "grace": 1.0}
    txnlog.commit(_df(spark, [(2, 20)]), p, "append", group=g)
    mp = txnlog._manifest_path(p, 1)
    man = json.load(open(mp))
    man["group"]["grace"] = "oops"          # non-numeric
    man["checksum"] = txnlog._manifest_checksum(man)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)
    old = time.time() - 3600
    os.utime(mp, (old, old))                # well past any grace
    # pending member is invisible; the next writer's settle must
    # ABORT it (fallback grace expired), not crash on float("oops")
    assert txnlog.latest_version(p) == 0
    v = txnlog.commit(_df(spark, [(3, 30)]), p, "append")
    assert v == 1
    assert "group" not in txnlog._read_manifest(p, 1)
    assert txnlog.snapshot(spark, p).count() == 2


def test_group_merge_member_atomic_with_log(spark):
    """r11: a keyed MERGE as a transaction-group member — the
    reference's 'MERGE fact + INSERT run-log in one transaction'
    shape.  Both tables flip visible together, the merge's op
    descriptor and group marker ride in its manifest, and prior
    versions stay time-travelable."""
    fact, log = _pair(spark, "t_gmerge")
    out = txnlog.commit_group([
        {"op": "merge", "df": _df(spark, [(1, 99), (7, 70)]),
         "path": fact, "key_cols": ["id"]},
        (_df(spark, [(100, 1)]), log),
    ])
    assert out == {os.path.abspath(fact): 1, os.path.abspath(log): 1}
    got = {r["id"]: r["v"] for r in
           txnlog.snapshot(spark, fact).collect()}
    assert got == {1: 99, 7: 70}  # update + insert both landed
    man = txnlog._read_manifest(fact, 1)
    assert man["op"]["type"] == "merge"
    assert man["group"]["id"] == \
        txnlog._read_manifest(log, 1)["group"]["id"]
    # pre-merge version still serves the old value
    assert {r["id"]: r["v"] for r in
            txnlog.snapshot(spark, fact, 0).collect()} == {1: 10}


def test_group_keyed_member_failure_unwinds_all(spark):
    """A constraint violation inside a MERGE member aborts the whole
    group: the already-published plain member unwinds, neither table
    advances, and both stay writable (version numbers reclaimed)."""
    fact, log = _pair(spark, "t_gmergefail")
    txnlog.commit(_df(spark, [(2, 20)]), fact, "append",
                  constraints={"v_nonneg": "v >= 0"})
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit_group([
            (_df(spark, [(100, 1)]), log),
            {"op": "merge", "df": _df(spark, [(2, -5)]),
             "path": fact, "key_cols": ["id"]},
        ])
    assert txnlog.latest_version(log) == 0
    assert txnlog.latest_version(fact) == 1
    assert {r["v"] for r in
            txnlog.snapshot(spark, fact).collect()} == {10, 20}
    txnlog.commit(_df(spark, [(3, 30)]), fact, "append")
    assert txnlog.latest_version(fact) == 2


def test_group_delete_member_atomic(spark):
    """A deletion-vector DELETE as a group member: the tombstone
    store becomes visible exactly when the audit append does."""
    fact, log = _pair(spark, "t_gdel")
    txnlog.commit(_df(spark, [(2, 20), (3, 30)]), fact, "append")
    txnlog.commit_group([
        {"op": "delete",
         "keys": spark.createDataFrame([(2,)], "id long"),
         "path": fact, "key_cols": ["id"]},
        (_df(spark, [(200, 1)]), log),
    ])
    assert {r["id"] for r in
            txnlog.snapshot(spark, fact).collect()} == {1, 3}
    assert txnlog.metadata_count(fact) is None or \
        txnlog.metadata_count(fact) == 2
    assert txnlog.snapshot(spark, log).count() == 2
    man = txnlog._read_manifest(fact, txnlog.latest_version(fact))
    assert man["op"]["type"] == "delete" and man["group"]["id"]
    # the pre-delete version still shows the row
    assert {r["id"] for r in
            txnlog.snapshot(spark, fact, 1).collect()} == {1, 2, 3}


def test_group_mixed_ops_and_mode_override(spark):
    """merge_apply and an explicit per-member overwrite compose in
    one group; the descriptor's op overrides the call-level mode."""
    fact, log = _pair(spark, "t_gmix")
    changes = spark.createDataFrame(
        [(1, 11, False), (9, 90, False)], "id long, v long, del boolean")
    txnlog.commit_group([
        {"op": "merge_apply", "df": changes, "path": fact,
         "key_cols": ["id"], "delete_col": "del"},
        {"op": "overwrite", "df": _df(spark, [(500, 5)]),
         "path": log},
    ], mode="append")
    assert {r["id"]: r["v"] for r in
            txnlog.snapshot(spark, fact).collect()} == {1: 11, 9: 90}
    got = txnlog.snapshot(spark, log).collect()
    assert len(got) == 1 and got[0]["id"] == 500  # overwrite, not append


def test_group_member_refuses_read_version(spark):
    """Keyed writes inside a group refuse read_version exactly like
    commit() — no single conflict point across the visibility flip."""
    fact, _ = _pair(spark, "t_grv")
    g = {"id": "cafebabecafebabe",
         "coord": os.path.join(fact, "_txn", "groups", "x.json"),
         "members": [fact]}
    with pytest.raises(ValueError, match="transaction group"):
        txnlog.merge_upsert(spark, fact, _df(spark, [(1, 2)]),
                            ["id"], read_version=0, group=g)
    with pytest.raises(ValueError, match="transaction group"):
        txnlog.delete_keys(spark, fact,
                           spark.createDataFrame([(1,)], "id long"),
                           ["id"], read_version=0, group=g)
    assert txnlog.latest_version(fact) == 0
