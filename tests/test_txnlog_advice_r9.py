"""Round-9 ADVICE pins (operators/txnlog.py): committed-group
visibility must not depend on a foreign table's files (per-member
decision mirrors), a torn head manifest raises instead of silently
serving the previous version, the group settle grace is declarable
per group, a re-declared identity column continues from its
historical high-water mark, and codebook GC matches versions wider
than 8 digits."""

from __future__ import annotations

import json
import os
import shutil
import time

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_advice_r9_test"


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _pair(spark, name):
    a = os.path.join(OUT, name + "_a")
    b = os.path.join(OUT, name + "_b")
    for p in (a, b):
        shutil.rmtree(p, ignore_errors=True)
        txnlog.commit(_df(spark, [(1, 10)]), p, "overwrite")
    return a, b


def test_committed_visibility_survives_coordinator_table_loss(spark):
    """The coordinator record lives under the FIRST member's _txn —
    deleting that whole table must not flip the OTHER member's
    committed version back to pending (the decision mirror under the
    member's own _txn keeps it readable), and a later writer's
    settle pass must NOT abort it away."""
    a, b = _pair(spark, "t_coordloss")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    assert txnlog.latest_version(b) == 1
    man = txnlog._read_manifest(b, 1)
    assert man["group"].get("marker"), "member must carry its mirror"
    shutil.rmtree(a)                      # first member table GONE
    # read visibility holds without the foreign coord file
    assert txnlog.latest_version(b) == 1
    assert txnlog.snapshot(spark, b).count() == 2
    # a writer past the grace window must BUILD ON the committed
    # member, not settle-abort it (the pre-fix data-loss path)
    old = txnlog.GROUP_SETTLE_GRACE_SECONDS
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        txnlog.commit(_df(spark, [(4, 40)]), b, "append")
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert txnlog.latest_version(b) == 2
    assert sorted(r["id"] for r in
                  txnlog.snapshot(spark, b).collect()) == [1, 3, 4]
    # pinned-version ops agree the member is committed history
    assert txnlog.snapshot(spark, b, version=1).count() == 2


def test_marker_overrides_settler_recreated_abort_coord(spark):
    """A settler that recreates a LOST coord file as aborted cannot
    hide a member whose own mirror says committed — markers are only
    written after a won commit decision, so they win."""
    a, b = _pair(spark, "t_marker_wins")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    man = txnlog._read_manifest(b, 1)
    coord = man["group"]["coord"]
    os.remove(coord)
    with open(coord, "w") as fh:          # hostile/raced abort record
        json.dump({"id": man["group"]["id"], "committed": False}, fh)
    assert txnlog.latest_version(b) == 1
    assert txnlog.snapshot(spark, b).count() == 2


def test_torn_head_manifest_raises_not_stale_reads(spark):
    """A manifest that still EXISTS but fails to parse must raise at
    read time — silently walking down would serve the previous
    version as latest and every commit/snapshot would build on stale
    state with no error."""
    path = os.path.join(OUT, "t_torn")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10)]), path, "overwrite")
    txnlog.commit(_df(spark, [(2, 20)]), path, "append")
    with open(txnlog._manifest_path(path, 1), "w") as fh:
        fh.write('{"version": 1, "dirs": [TORN')
    with pytest.raises(ValueError):
        txnlog.latest_version(path)
    with pytest.raises(ValueError):
        txnlog.snapshot(spark, path).count()


def test_group_grace_is_declarable_and_honored_by_settlers(spark):
    """A pending group declaring a long grace is NOT settle-aborted
    by a writer arriving after the default 60 s window — long member
    data writes at scale must not be aborted by design."""
    a, b = _pair(spark, "t_grace")
    gid = "feedfacecafe0001"
    g = {"id": gid, "grace": 3600.0,
         "coord": os.path.join(txnlog._txn_dir(a), "groups",
                               f"{gid}.json")}
    txnlog.commit(_df(spark, [(2, 20)]), a, "append",
                  group={**g, "marker": os.path.join(
                      txnlog._txn_dir(a), "groups",
                      f"{gid}.decided.json")})
    assert txnlog._read_manifest(a, 1)["group"]["grace"] == 3600.0
    # age the pending member past the DEFAULT grace
    mpath = txnlog._manifest_path(a, 1)
    past = time.time() - 600
    os.utime(mpath, (past, past))
    old = txnlog.GROUP_SETTLE_GRACE_SECONDS
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        # a concurrent writer sees an IN-FLIGHT group (declared grace
        # not yet elapsed): TxnConflict, never a settle-abort
        with pytest.raises(txnlog.TxnConflict):
            txnlog.commit(_df(spark, [(4, 40)]), a, "append")
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert txnlog._latest_occupied(a) == 1      # member still there
    assert txnlog.latest_version(a) == 0
    # commit_group plumbs the parameter through to member manifests
    c, d = _pair(spark, "t_grace_api")
    txnlog.commit_group(
        [(_df(spark, [(5, 50)]), c), (_df(spark, [(6, 60)]), d)],
        grace_seconds=120.0)
    assert txnlog._read_manifest(c, 1)["group"]["grace"] == 120.0
    assert txnlog._read_manifest(d, 1)["group"]["grace"] == 120.0


def test_grace_is_validated_and_bounded(spark):
    """An unbounded (or non-positive) declared grace would let one
    crashed writer wedge every member table forever — refused at the
    API."""
    a, b = _pair(spark, "t_grace_bad")
    for bad in (float("inf"), 0.0, -5.0,
                txnlog.GROUP_GRACE_MAX_SECONDS + 1):
        with pytest.raises(ValueError, match="grace_seconds"):
            txnlog.commit_group(
                [(_df(spark, [(2, 20)]), a),
                 (_df(spark, [(3, 30)]), b)], grace_seconds=bad)
    # refused groups left nothing behind: both tables still commit
    out = txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)],
        grace_seconds=txnlog.GROUP_GRACE_MAX_SECONDS)
    assert set(out.values()) == {1}


def test_partial_mirror_repairs_via_sibling_marker(spark):
    """The torn-transaction hole: commit decided, the mirror loop
    crashed after writing only table A's marker, then the coord
    table vanished.  Table B has a marker PATH but no marker FILE —
    it must still read committed (the members list lets it probe A's
    surviving marker), and a settler must REPAIR the lost coord
    instead of aborting committed history."""
    a, b = _pair(spark, "t_partial_mirror")
    txnlog.commit_group(
        [(_df(spark, [(2, 20)]), a), (_df(spark, [(3, 30)]), b)])
    man_b = txnlog._read_manifest(b, 1)
    coord = man_b["group"]["coord"]
    os.remove(man_b["group"]["marker"])   # B's own mirror never landed
    os.remove(coord)                      # coordinator record lost
    # B still resolves committed via A's marker from the members list
    assert txnlog.latest_version(b) == 1
    assert txnlog.snapshot(spark, b).count() == 2
    # a settler past the grace REPAIRS the coord record (committed),
    # never aborts, and the next write builds on the member
    old = txnlog.GROUP_SETTLE_GRACE_SECONDS
    txnlog.GROUP_SETTLE_GRACE_SECONDS = 0.0
    try:
        txnlog.commit(_df(spark, [(4, 40)]), b, "append")
    finally:
        txnlog.GROUP_SETTLE_GRACE_SECONDS = old
    assert txnlog.latest_version(b) == 2
    with open(coord) as fh:
        assert json.load(fh)["committed"] is True
    assert sorted(r["id"] for r in
                  txnlog.snapshot(spark, b).collect()) == [1, 3, 4]


def test_identity_redeclaration_continues_from_historical_hwm(spark):
    """Clearing an identity column and re-declaring it must continue
    above every id the column ever issued — never re-issue."""
    path = os.path.join(OUT, "t_ident_redecl")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame([(i, f"r{i}") for i in range(10)],
                               "k long, v string")
    txnlog.commit(df, path, "overwrite", identity="sk")
    assert sorted(r["sk"] for r in txnlog.snapshot(spark, path)
                  .collect()) == list(range(1, 11))
    # clear the property, then re-declare the SAME column
    txnlog.commit(df, path, "overwrite", identity="")
    txnlog.commit(df, path, "overwrite", identity="sk")
    ids = sorted(r["sk"] for r in
                 txnlog.snapshot(spark, path).collect())
    assert ids == list(range(11, 21)), \
        "re-declared identity must continue above the historical hwm"
    # and switching columns then back also continues
    txnlog.commit(df, path, "overwrite", identity="sk2")
    txnlog.commit(df, path, "overwrite", identity="sk")
    ids = sorted(r["sk"] for r in
                 txnlog.snapshot(spark, path).collect())
    assert ids == list(range(21, 31))


def test_vacuum_gc_matches_wide_codebook_versions(spark):
    """codebook-v{version:08d}- grows past 8 digits at version >=
    10^8; the GC regex must still match (fixed \\d{8} leaked them)."""
    path = os.path.join(OUT, "t_cb_wide")
    shutil.rmtree(path, ignore_errors=True)
    df = _df(spark, [(1, 10)])
    for mode in ("overwrite", "append", "append", "append"):
        txnlog.commit(df, path, mode)
    cb = os.path.join(txnlog._txn_dir(path), "codebooks")
    os.makedirs(cb, exist_ok=True)
    wide = os.path.join(cb, f"codebook-v{123456789:08d}-deadbeef.json")
    keepv = os.path.join(cb, "codebook-v00000003-cafef00d.json")
    for f in (wide, keepv):
        with open(f, "w") as fh:
            json.dump({"centroids": []}, fh)
        past = time.time() - 7200
        os.utime(f, (past, past))
    removed = txnlog.vacuum(path, keep_latest=2, grace_seconds=3600)
    names = os.listdir(cb)
    assert os.path.basename(wide) not in names, \
        "9-digit codebook version must be GC'd"
    assert os.path.basename(keepv) in names   # kept version survives
    assert any("codebook-v123456789-" in r for r in removed)
