"""Transaction-log commit protocol (operators/txnlog.py): atomicity,
snapshot isolation, optimistic-concurrency conflict, time travel, and
vacuum reachability."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_txn_test"


@pytest.fixture()
def table(spark):
    path = os.path.join(OUT, "t")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    return path, df


def test_commit_append_time_travel(spark, table):
    path, df = table
    v0 = txnlog.commit(df.where("id < 5"), path, "overwrite")
    v1 = txnlog.commit(df.where("id >= 5"), path, "append")
    v2 = txnlog.commit(df.where("id = 0"), path, "overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert txnlog.snapshot(spark, path, 0).count() == 5
    assert txnlog.snapshot(spark, path, 1).count() == 10
    assert txnlog.snapshot(spark, path, 2).count() == 1
    assert txnlog.snapshot(spark, path).count() == 1  # latest


def test_crashed_write_is_invisible(spark, table):
    """Data dirs without a manifest (a crash between the data write
    and the manifest rename) are never read."""
    path, df = table
    txnlog.commit(df, path, "overwrite")
    orphan = os.path.join(path, "data-v00000099")
    df.limit(1).write.parquet(orphan)  # crashed writer's leftovers
    assert txnlog.snapshot(spark, path).count() == 10
    assert txnlog.latest_version(path) == 0


def test_conflict_via_commit_api(spark, table, monkeypatch):
    """Two writers against the same parent: the loser's commit raises
    TxnConflict, the winner's manifest AND data survive untouched
    (immutability — the loser must never write into a dir another
    manifest references)."""
    path, df = table
    txnlog.commit(df, path, "overwrite")          # v0
    real_latest = txnlog.latest_version

    def stale_latest(p):
        return real_latest(p) if real_latest(p) is None else 0

    winner = txnlog.commit(df.where("id < 2"), path, "overwrite")  # v1
    man = os.path.join(path, "_txn", f"v{winner:08d}.json")
    before = json.load(open(man))
    monkeypatch.setattr(txnlog, "latest_version", stale_latest)
    with pytest.raises(txnlog.TxnConflict):
        txnlog.commit(df.where("id >= 2"), path, "overwrite")
    monkeypatch.setattr(txnlog, "latest_version", real_latest)
    assert json.load(open(man)) == before
    assert txnlog.snapshot(spark, path).count() == 2  # winner intact


def test_vacuum_drops_unreachable_only(spark, table):
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite")   # v0
    txnlog.commit(df.where("id >= 5"), path, "append")     # v1
    txnlog.commit(df.where("id = 0"), path, "overwrite")   # v2
    removed = txnlog.vacuum(path, keep_latest=2, grace_seconds=0)
    # v1 references data-v0 + data-v1; v2 references data-v2 -> all live
    assert removed == []
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert sorted(removed) == ["data-v00000000-0000", "data-v00000001-0000"]
    assert txnlog.snapshot(spark, path).count() == 1
    with pytest.raises(Exception):
        txnlog.snapshot(spark, path, 0)  # vacuumed away


def test_vacuum_on_partitioned_table(spark):
    """Retention GC over a partitioned table: after a per-partition
    compact, vacuum(keep_latest=1) reclaims the pre-compaction commit
    trees (partition subdirs and all) while every live compacted leaf
    — a SUBDIR of the claimed dir — stays protected."""
    path = os.path.join(OUT, "t_part_vacuum")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(120).select(
        F.col("id"), (F.col("id") % 3).alias("d"))
    txnlog.commit(df.where("id < 60"), path, "overwrite",
                  partition_by=["d"])
    txnlog.commit(df.where("id >= 60"), path, "append")
    cv = txnlog.compact(spark, path)
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert sorted(removed) == ["data-v00000000-0000",
                               "data-v00000001-0000"]
    snap = txnlog.snapshot(spark, path, cv)
    assert snap.count() == 120
    # pruning still works over the surviving compacted layout
    kept, all_dirs = txnlog.prune_plan(path, cv, [("d", 0, 0)])
    assert len(all_dirs) == 3 and len(kept) == 1


def test_vacuum_reclaims_dead_leaves_in_live_trees(spark):
    """A partitioned MERGE rewrites one leaf of a claimed dir: after
    the old manifests age out, that replaced leaf is referenced by no
    manifest but its SIBLINGS are live — leaf-grain GC must reclaim
    it (and its bloom sidecar) without touching the live leaves."""
    path = os.path.join(OUT, "t_part_leafgc")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"))
    txnlog.commit(df, path, "overwrite", partition_by=["d"],
                  bloom_cols=["id"])
    up = spark.createDataFrame([(7, 1)], ["id", "d"])  # touches d=1
    txnlog.merge_upsert(spark, path, up, ["id"])
    dead = "data-v00000000-0000/__p_d=1"
    assert os.path.isdir(os.path.join(path, dead))
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert dead in removed
    assert not os.path.isdir(os.path.join(path, dead))
    # live siblings of the same claimed dir survive
    assert os.path.isdir(
        os.path.join(path, "data-v00000000-0000/__p_d=0"))
    assert txnlog.snapshot(spark, path).count() == 300
    # the dead leaf's bloom sidecar is gone, live leaves' remain
    import urllib.parse
    bloom = os.path.join(path, "_txn", "bloom")
    assert not any(
        f.startswith(urllib.parse.quote(dead, safe="") + ".")
        for f in os.listdir(bloom))
    assert any("__p_d%3D0" in f for f in os.listdir(bloom))


def test_vacuum_grace_protects_inflight_claim(spark, table):
    """A data dir claimed by an in-flight commit (manifest not yet
    landed) is unreachable from every manifest — the default retention
    grace must keep vacuum's hands off it."""
    path, df = table
    txnlog.commit(df, path, "overwrite")
    claimed = txnlog._claim_data_dir(path, 7)  # writer mid-commit
    assert txnlog.vacuum(path, keep_latest=1) == []  # default grace
    assert os.path.isdir(claimed)
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert os.path.basename(claimed) in removed


def test_commit_race_loser_raises_and_winner_survives(spark, table,
                                                      monkeypatch):
    """The commit point is test-and-set: if another writer publishes
    the same version between our tmp write and our publish, we raise
    TxnConflict and the winner's manifest survives byte-for-byte —
    a rename-based publish would silently clobber it."""
    path, df = table
    txnlog.commit(df, path, "overwrite")  # v0
    real_publish = txnlog._publish_manifest
    winner_payload = json.dumps({"version": 1, "mode": "overwrite",
                                 "dirs": ["data-winner"], "meta": {},
                                 "stats": {}})

    def racing_publish(final, tmp):
        # writer B lands v1 first, in the window after A's exists-check
        with open(final, "w") as fh:
            fh.write(winner_payload)
        real_publish(final, tmp)

    monkeypatch.setattr(txnlog, "_publish_manifest", racing_publish)
    with pytest.raises(txnlog.TxnConflict):
        txnlog.commit(df.where("id < 3"), path, "overwrite")
    monkeypatch.undo()
    man = os.path.join(path, "_txn", "v00000001.json")
    assert json.load(open(man))["dirs"] == ["data-winner"]
    # the loser's tmp manifest was cleaned up
    assert not [f for f in os.listdir(os.path.join(path, "_txn"))
                if ".tmp-" in f]


def test_merge_probe_job_count_is_constant_in_dirs(spark):
    """The matched-dir probe must be ONE multi-path scan, not one Spark
    job per candidate dir: tripling the number of appended commits must
    not change the merge's job count (the per-dir loop added one probe
    job per dir, so its count grew linearly)."""
    df = spark.range(12).select(F.col("id"), (F.col("id") * 2).alias("v"))
    sc = spark.sparkContext

    def merged_job_count(n_dirs, tag):
        path = os.path.join(OUT, f"probe_{n_dirs}")
        shutil.rmtree(path, ignore_errors=True)
        step = 12 // n_dirs
        for i in range(n_dirs):
            part = df.where(
                (F.col("id") >= i * step) & (F.col("id") < (i + 1) * step))
            txnlog.commit(part, path, "overwrite" if i == 0 else "append")
        updates = spark.createDataFrame([(5, 500)], "id long, v long")
        sc.setJobGroup(tag, "job-count audit")
        try:
            txnlog.merge_upsert(spark, path, updates, ["id"])
        finally:
            sc.setJobGroup("", "")
        snap = {r["id"]: r["v"]
                for r in txnlog.snapshot(spark, path).collect()}
        assert snap[5] == 500 and len(snap) == 12
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    small = merged_job_count(4, "probe_audit_small")
    large = merged_job_count(12, "probe_audit_large")
    assert large <= small, (
        f"merge job count grew with dir count: {small} -> {large}")


def test_merge_upsert_rewrites_only_affected_dirs(spark, table):
    """Copy-on-write MERGE: untouched commits' data dirs carry into
    the new manifest byte-for-byte; only dirs containing matched keys
    are replaced; prior versions stay time-travelable."""
    path, df = table
    txnlog.commit(df.where("id < 4"), path, "overwrite")   # dir A
    txnlog.commit(df.where("id >= 4 and id < 7"), path, "append")  # B
    txnlog.commit(df.where("id >= 7"), path, "append")     # dir C
    before = txnlog._read_manifest(path, 2)["dirs"]

    updates = spark.createDataFrame(
        [(5, 500), (99, 990)], "id long, v long")  # update id=5, insert 99
    v = txnlog.merge_upsert(spark, path, updates, ["id"])
    man = txnlog._read_manifest(path, v)
    # dir B (holding id=5) was rewritten; A and C carried over
    assert man["meta"]["rewrote"] == [before[1]]
    assert before[0] in man["dirs"] and before[2] in man["dirs"]
    assert before[1] not in man["dirs"]

    snap = {r["id"]: r["v"] for r in txnlog.snapshot(spark, path).collect()}
    assert snap[5] == 500 and snap[99] == 990
    assert len(snap) == 11  # 10 original + 1 insert
    assert snap[4] == 8     # untouched row in the rewritten dir kept
    # time travel unaffected
    assert txnlog.snapshot(spark, path, 2).count() == 10


def test_stats_pruning_skips_disjoint_dirs(spark, table):
    """Manifest [min,max] envelopes prune dirs whose range misses the
    predicate; dirs without stats are conservatively read; a merge
    carries stats forward."""
    path, df = table
    txnlog.commit(df.where("id < 4"), path, "overwrite",
                  stats_cols=["id"])                     # ids 0-3
    txnlog.commit(df.where("id >= 4 and id < 7"), path, "append",
                  stats_cols=["id"])                     # ids 4-6
    txnlog.commit(df.where("id >= 7"), path, "append",
                  stats_cols=["id"])                     # ids 7-9
    # range [4,6] overlaps only dir B
    pruned = txnlog.snapshot(spark, path, prune=("id", 4, 6))
    assert sorted(r["id"] for r in pruned.collect()) == [4, 5, 6]
    # fully-disjoint range -> empty (schema preserved)
    assert txnlog.snapshot(spark, path, prune=("id", 100, 200)).count() == 0
    # merge restates stats over the rewritten dir: pruning still works
    updates = spark.createDataFrame([(5, 500)], "id long, v long")
    txnlog.merge_upsert(spark, path, updates, ["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert all(d in man["stats"] for d in man["dirs"])
    after = txnlog.snapshot(spark, path, prune=("id", 0, 3))
    assert sorted(r["id"] for r in after.collect()) == [0, 1, 2, 3]


def test_change_feed_classifies_and_skips_carried_dirs(spark, table,
                                                       monkeypatch):
    """CDF between two versions: updates surface as pre/post image
    pairs, new keys as inserts, vanished keys as deletes — and dirs
    carried unchanged between the manifests are never scanned."""
    path, df = table
    txnlog.commit(df.where("id < 6"), path, "overwrite")          # A
    txnlog.commit(df.where("id >= 6"), path, "append")            # B
    updates = spark.createDataFrame(
        [(7, 700), (99, 990)], "id long, v long")
    txnlog.merge_upsert(spark, path, updates, ["id"])   # rewrites B
    scanned = []
    real_read = type(spark.read).parquet

    def spy(reader, *paths):
        scanned.extend(paths)
        return real_read(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    cf = txnlog.change_feed(spark, path, 1, 2, ["id"]).collect()
    monkeypatch.undo()
    # dir A carried unchanged: never read by the diff
    assert not [p for p in scanned if "data-v00000000" in p]
    got = {(r["_change_type"], r["id"], r["v"]) for r in cf}
    assert got == {("update_preimage", 7, 14),
                   ("update_postimage", 7, 700),
                   ("insert", 99, 990)}


def test_change_feed_sees_deletes(spark, table):
    path, df = table
    txnlog.commit(df, path, "overwrite")
    txnlog.commit(df.where("id <> 3"), path, "overwrite")
    cf = txnlog.change_feed(spark, path, 0, 1, ["id"]).collect()
    assert {(r["_change_type"], r["id"]) for r in cf} == {("delete", 3)}


def test_compact_binpacks_preserving_content_and_history(spark, table):
    path, df = table
    for i in range(5):
        txnlog.commit(df.where(F.col("id") % 5 == i), path,
                      "overwrite" if i == 0 else "append",
                      stats_cols=["id"])
    v = txnlog.compact(spark, path)
    man = txnlog._read_manifest(path, v)
    assert len(man["dirs"]) == 1
    assert man["meta"]["compacted_from"] == 5
    # content identical, history intact, stats restated
    assert sorted(r["id"] for r in
                  txnlog.snapshot(spark, path).collect()) == list(range(10))
    assert txnlog.snapshot(spark, path, v - 1).count() == 10
    assert "id" in man["stats"][man["dirs"][0]]
    # pruning still works post-compact
    assert txnlog.snapshot(
        spark, path, prune=("id", 100, 200)).count() == 0
    # already compact -> no-op
    assert txnlog.compact(spark, path) is None


def test_merge_apply_full_iud_contract(spark, table):
    """merge_apply: deletes remove their keys, upserts
    update-or-insert, absent-key deletes are no-ops, and only dirs
    containing touched keys rewrite."""
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite")   # dir A
    txnlog.commit(df.where("id >= 5"), path, "append")     # dir B
    before = txnlog._read_manifest(path, 1)["dirs"]
    changes = spark.createDataFrame(
        [(7, 700, False),    # update (dir B)
         (99, 990, False),   # insert
         (8, 0, True),       # delete (dir B)
         (555, 0, True)],    # delete of absent key: no-op
        "id long, v long, is_del boolean")
    v = txnlog.merge_apply(spark, path, changes, ["id"], "is_del")
    man = txnlog._read_manifest(path, v)
    assert before[0] in man["dirs"]      # dir A untouched
    assert before[1] not in man["dirs"]  # dir B rewritten
    snap = {r["id"]: r["v"] for r in txnlog.snapshot(spark, path).collect()}
    assert 8 not in snap and snap[7] == 700 and snap[99] == 990
    assert len(snap) == 10  # 10 - 1 delete + 1 insert
    # prior version still time-travels with id=8 present
    assert 8 in {r["id"] for r in txnlog.snapshot(spark, path, 1).collect()}


def test_compact_then_vacuum_reclaims_old_layout(spark, table):
    """After compaction, vacuum (grace 0, keep_latest=1) reclaims the
    pre-compact dirs; the compacted snapshot still reads fully and
    older versions are gone — the standard OPTIMIZE + VACUUM
    maintenance cycle."""
    path, df = table
    for i in range(4):
        txnlog.commit(df.where(F.col("id") % 4 == i), path,
                      "overwrite" if i == 0 else "append")
    v = txnlog.compact(spark, path)
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert len(removed) == 4  # every pre-compact dir reclaimed
    assert txnlog.snapshot(spark, path).count() == 10
    assert txnlog.latest_version(path) == v
    import pytest as _pytest
    with _pytest.raises(Exception):
        txnlog.snapshot(spark, path, v - 1)  # history vacuumed


def test_metadata_count_answers_without_scanning(spark, table):
    """COUNT(*) from manifest row stats alone: correct per version,
    carried through merges, None (scan fallback) when any dir
    predates row recording."""
    path, df = table
    txnlog.commit(df.where("id < 4"), path, "overwrite",
                  stats_cols=["id"])
    txnlog.commit(df.where("id >= 4"), path, "append",
                  stats_cols=["id"])
    assert txnlog.metadata_count(path, 0) == 4
    assert txnlog.metadata_count(path, 1) == 10
    # a merge restates the rewritten dir's rows
    updates = spark.createDataFrame([(5, 500), (77, 770)],
                                    "id long, v long")
    txnlog.merge_upsert(spark, path, updates, ["id"])
    assert txnlog.metadata_count(path) == 11
    # statless commit -> unknown rows -> conservative None
    txnlog.commit(df.where("id = 0"), path, "append")
    assert txnlog.metadata_count(path) is None


def test_merge_probe_uses_key_stats(spark, table, monkeypatch):
    """With key stats recorded, the merge probe never scans dirs whose
    key envelope misses the updates' range."""
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite", stats_cols=["id"])
    txnlog.commit(df.where("id >= 5"), path, "append", stats_cols=["id"])
    scanned = []
    real_read = type(spark.read).parquet

    def spy(reader, *paths):
        scanned.extend(paths)
        return real_read(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    updates = spark.createDataFrame([(9, 900)], "id long, v long")
    txnlog.merge_upsert(spark, path, updates, ["id"])
    monkeypatch.undo()
    probed = [p for p in scanned if "data-v00000000" in p]
    assert probed == []  # dir A (ids 0-4) never probed for key 9


# ------------------------------------------------------- log-store double


@pytest.fixture()
def memory_store():
    store = txnlog.InMemoryConditionalPutLogStore()
    prev = txnlog.set_log_store(store)
    yield store
    txnlog.set_log_store(prev)
    assert isinstance(txnlog._LOG_STORE, txnlog.PosixLinkLogStore)


def test_conditional_put_double_end_to_end(spark, table, memory_store):
    """The full commit protocol runs unchanged through the object-store
    double: commits land in the bucket, readers see them, and history
    is intact — proving everything above the LogStore seam really is
    store-agnostic."""
    path, df = table
    v0 = txnlog.commit(df.where("id < 5"), path, "overwrite")
    v1 = txnlog.commit(df.where("id >= 5"), path, "append")
    assert (v0, v1) == (0, 1)
    assert txnlog.snapshot(spark, path).count() == 10
    assert txnlog.snapshot(spark, path, version=v0).count() == 5
    # both manifests went through the conditional PUT
    assert len(memory_store._bucket) == 2


def test_conditional_put_is_exclusive(table, memory_store, tmp_path):
    """Sequential contract: the second PUT against a published key
    fails the precondition and leaves the first body untouched."""
    final = str(tmp_path / "v1.json")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    open(a, "w").write("writer-a")
    open(b, "w").write("writer-b")
    memory_store.publish(final, a)
    with pytest.raises(txnlog.TxnConflict):
        memory_store.publish(final, b)
    assert open(final).read() == "writer-a"


def test_racing_writers_through_double_exactly_one_wins(
        spark, table, memory_store, tmp_path):
    """TRUE race: two writers build manifests for the same version and
    publish concurrently through the conditional-put double.  Exactly
    one commit succeeds; the loser raises TxnConflict without
    corrupting the winner's manifest."""
    import threading

    path, df = table
    txnlog.commit(df, path, "overwrite")  # v0 parent for both
    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    orig_publish = memory_store.publish

    def synced_publish(final, tmp):
        # both writers reach the commit point; generous timeout —
        # each writer runs Spark jobs before publishing, and a
        # saturated box (overlapping gate runs) can starve one past
        # a tight bound (flaked at 30s under a concurrent driver_sim)
        barrier.wait(timeout=180)
        orig_publish(final, tmp)

    memory_store.publish = synced_publish

    def writer(name, frame):
        try:
            results[name] = txnlog.commit(frame, path, "overwrite")
        except txnlog.TxnConflict as e:
            results[name] = e

    lo = df.where("id < 3").localCheckpoint()
    hi = df.where("id >= 3").localCheckpoint()
    ta = threading.Thread(target=writer, args=("a", lo))
    tb = threading.Thread(target=writer, args=("b", hi))
    ta.start(); tb.start(); ta.join(30); tb.join(30)

    wins = [k for k, v in results.items() if v == 1]
    losses = [k for k, v in results.items()
              if isinstance(v, txnlog.TxnConflict)]
    assert len(wins) == 1 and len(losses) == 1, results
    # the committed v1 is exactly the winner's frame
    n = txnlog.snapshot(spark, path).count()
    assert n == (3 if wins[0] == "a" else 7)
    # loser's orphaned data dir is unreferenced garbage, never visible
    man = txnlog._read_manifest(path, 1)
    assert len(man["dirs"]) == 1


def test_compact_race_conflicts_instead_of_losing_update(
        spark, table, memory_store):
    """A commit landing between compact's snapshot and its publish
    must surface as TxnConflict (retryable), NEVER be silently
    overwritten by the compacted old content (lost update)."""
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite")
    txnlog.commit(df.where("id >= 5 and id < 8"), path, "append")

    orig = memory_store.publish
    state = {"injected": False}

    def hijack(final, tmp):
        if not state["injected"]:
            state["injected"] = True
            memory_store.publish = orig
            # a writer lands v2 while compact is mid-flight
            txnlog.commit(df.where("id >= 8"), path, "append")
        orig(final, tmp)

    memory_store.publish = hijack
    with pytest.raises(txnlog.TxnConflict):
        txnlog.compact(spark, path)
    # nothing lost: the concurrent append's rows are all present
    assert txnlog.snapshot(spark, path).count() == 10
    # and the standard retry path compacts the WINNER's table state
    v = txnlog.commit_with_retry(lambda: txnlog.compact(spark, path))
    assert v == 3
    assert txnlog.snapshot(spark, path).count() == 10
    assert len(txnlog._read_manifest(path, v)["dirs"]) == 1


def test_merge_apply_null_delete_flag_is_upsert(spark, table):
    """A NULL delete flag means NOT a delete: the row must upsert,
    not silently vanish (regression: ~NULL filtered it from upserts
    while its key was still removed)."""
    path, df = table
    txnlog.commit(df, path, "overwrite")
    changes = spark.createDataFrame(
        [(3, 999, None), (4, 444, False), (5, 0, True)],
        "id long, v long, is_delete boolean")
    txnlog.merge_apply(spark, path, changes, ["id"], "is_delete")
    got = {r["id"]: r["v"] for r in txnlog.snapshot(spark, path).collect()}
    assert got[3] == 999  # NULL flag -> upserted, not deleted
    assert got[4] == 444
    assert 5 not in got   # true flag -> deleted
    assert len(got) == 9


def test_merge_stats_fast_path_handles_typed_and_empty_keys(
        spark, table):
    """The single-key stats fast path compares probe values against
    JSON-normalized manifest envelopes: timestamp keys must not
    cross-compare str vs datetime, and an EMPTY updates frame is a
    no-op merge, not a TypeError on None bounds."""
    import datetime

    path, _ = table
    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), i) for i in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    txnlog.commit(df.where("v < 5"), path, "overwrite",
                  stats_cols=["ts"])
    txnlog.commit(df.where("v >= 5"), path, "append", stats_cols=["ts"])
    upd = spark.createDataFrame(
        [(base + datetime.timedelta(days=2), 222)], "ts timestamp, v long")
    txnlog.merge_upsert(spark, path, upd, ["ts"])
    got = {r["v"] for r in txnlog.snapshot(spark, path).collect()}
    assert 222 in got and 2 not in got and len(got) == 10
    # empty updates: merge commits cleanly with nothing rewritten
    txnlog.merge_upsert(spark, path, upd.limit(0), ["ts"])
    assert txnlog.snapshot(spark, path).count() == 10


def test_decimal_stats_column_commits_and_prunes(spark, table):
    """stats_cols on a DECIMAL column (the money convention) must
    record a numeric envelope, not crash on Decimal.isoformat."""
    path, _ = table
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 1.5).cast("decimal(18,2)").alias("amount"))
    txnlog.commit(df.where("id < 5"), path, "overwrite",
                  stats_cols=["amount"])
    txnlog.commit(df.where("id >= 5"), path, "append",
                  stats_cols=["amount"])
    assert txnlog.metadata_count(path) == 10
    # pruning on the decimal envelope skips the disjoint dir
    snap = txnlog.snapshot(spark, path, prune=("amount", 0.0, 1.0))
    assert snap.count() == 5  # only the id<5 dir survives


def test_head_hint_fast_path_and_fallbacks(spark, table):
    """latest_version rides the _head hint (O(1): no directory LIST on
    the steady path) and must stay correct when the hint is stale,
    corrupt, or missing — forward probe / listing fallback."""
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite")
    txnlog.commit(df.where("id >= 5"), path, "append")
    hint = os.path.join(path, "_txn", "_head")
    assert open(hint).read() == "1"
    assert txnlog.latest_version(path) == 1
    # stale hint (a crashed writer never advanced it): probe forward
    with open(hint, "w") as fh:
        fh.write("0")
    assert txnlog.latest_version(path) == 1
    # corrupt hint: listing fallback
    with open(hint, "w") as fh:
        fh.write("not-a-version")
    assert txnlog.latest_version(path) == 1
    # missing hint: listing fallback, next commit rewrites it
    os.remove(hint)
    assert txnlog.latest_version(path) == 1
    txnlog.commit(df.where("id = 0"), path, "append")
    assert open(hint).read() == "2"
    assert txnlog.latest_version(path) == 2


def test_commit_with_retry_recomputes_against_new_parent(
        spark, table, memory_store):
    """Automatic conflict retry: a competing writer lands v1 between
    our version resolution and our publish; the retry must recompute
    against the NEW parent (append sees the winner's rows) and land
    as v2 — nobody's write is lost."""
    path, df = table
    txnlog.commit(df.where("id < 5"), path, "overwrite")  # v0: 5 rows

    orig = memory_store.publish
    state = {"injected": False}

    def hijack(final, tmp):
        if not state["injected"]:
            state["injected"] = True
            memory_store.publish = orig
            # the competing writer wins v1 while we're mid-commit
            # (its tmp manifest is attempt-unique, so it cannot
            # disturb ours)
            txnlog.commit(df.where("id >= 8"), path, "append")
        orig(final, tmp)

    memory_store.publish = hijack
    v = txnlog.commit_with_retry(
        lambda: txnlog.commit(
            df.where("id >= 5 and id < 8"), path, "append"))
    assert v == 2  # lost v1, recomputed, landed after the winner
    # append recomputed against the winner's parent: ALL rows present
    assert txnlog.snapshot(spark, path).count() == 10
    assert len(txnlog._read_manifest(path, 2)["dirs"]) == 3


def test_commit_with_retry_exhausts_and_reraises(table, memory_store):
    """A writer that loses every race surfaces the final TxnConflict
    after exactly max_attempts tries."""
    calls = {"n": 0}

    def always_loses():
        calls["n"] += 1
        raise txnlog.TxnConflict("perpetual loser")

    with pytest.raises(txnlog.TxnConflict):
        txnlog.commit_with_retry(always_loses, max_attempts=3)
    assert calls["n"] == 3


# ------------------------------------------------- restore / shallow clone


def test_restore_is_metadata_only_and_keeps_history(spark, table):
    path, df = table
    v0 = txnlog.commit(df.where("id < 5"), path, "overwrite",
                       stats_cols=["id"])
    v1 = txnlog.commit(df.where("id >= 5"), path, "append",
                       stats_cols=["id"])
    v2 = txnlog.commit(df.where("id = 0"), path, "overwrite",
                       stats_cols=["id"])  # bad load
    dirs_before = sorted(d for d in os.listdir(path)
                         if d.startswith("data-v"))
    v3 = txnlog.restore(path, v1)
    assert v3 == v2 + 1
    # metadata-only: no new data dir was created
    assert sorted(d for d in os.listdir(path)
                  if d.startswith("data-v")) == dirs_before
    # content rolled back, bad version still time-travelable
    assert txnlog.snapshot(spark, path).count() == 10
    assert txnlog.snapshot(spark, path, version=v2).count() == 1
    assert txnlog.snapshot(spark, path, version=v0).count() == 5
    # manifest-only count survives the restore
    assert txnlog.metadata_count(path, v3) == 10
    assert txnlog.latest_meta(path)["restored_from"] == v1


def test_shallow_clone_is_zero_copy_and_independent(spark, table):
    path, df = table
    src = os.path.join(path, "src")
    dst = os.path.join(path, "clone")
    txnlog.commit(df, src, "overwrite", stats_cols=["id"])
    src_dirs = sorted(d for d in os.listdir(src)
                      if d.startswith("data-v"))
    txnlog.shallow_clone(src, dst)
    # zero-copy: the clone holds NO data dirs, only a manifest
    assert not [d for d in os.listdir(dst) if d.startswith("data-v")]
    assert txnlog.snapshot(spark, dst).count() == 10
    assert txnlog.metadata_count(dst, 0) == 10  # stats carried over
    # clone evolves independently; source is untouched
    extra = df.limit(3).select(
        (F.col("id") + 100).alias("id"), "v")
    txnlog.commit(extra, dst, "append", stats_cols=["id"])
    assert txnlog.snapshot(spark, dst).count() == 13
    assert txnlog.snapshot(spark, src).count() == 10
    assert sorted(d for d in os.listdir(src)
                  if d.startswith("data-v")) == src_dirs
    # re-cloning onto an existing table is refused
    with pytest.raises(ValueError):
        txnlog.shallow_clone(src, dst)


def test_merge_on_shallow_clone_rewrites_not_duplicates(spark, table):
    """MERGE on a clone whose manifest references the source's dirs by
    ABSOLUTE path: affected-dir detection must match those dirs (full
    path, not basename) so matched keys are anti-joined out — a miss
    keeps the stale rows AND appends the update, silently duplicating
    every updated key (regression)."""
    path, df = table
    src = os.path.join(path, "src")
    dst = os.path.join(path, "clone")
    txnlog.commit(df.where("id < 5"), src, "overwrite",
                  stats_cols=["id"])
    txnlog.commit(df.where("id >= 5"), src, "append",
                  stats_cols=["id"])
    txnlog.shallow_clone(src, dst)
    updates = df.where("id = 3 or id = 7").select(
        "id", (F.col("v") + 1000).alias("v"))
    txnlog.merge_upsert(spark, dst, updates, ["id"])
    got = {r["id"]: r["v"] for r in txnlog.snapshot(spark, dst).collect()}
    assert len(got) == 10  # no duplicated keys
    assert got[3] == 3 * 2 + 1000 and got[7] == 7 * 2 + 1000
    assert got[0] == 0 and got[9] == 18  # untouched rows intact
    # the source saw nothing
    src_got = {r["id"]: r["v"]
               for r in txnlog.snapshot(spark, src).collect()}
    assert src_got[3] == 6 and src_got[7] == 14
    # merge deletes work on the clone too (full I/U/D on cloned dirs)
    changes = spark.createDataFrame(
        [(1, 0, True), (42, 84, False)], "id long, v long, is_delete boolean")
    txnlog.merge_apply(spark, dst, changes, ["id"], "is_delete")
    after = {r["id"]: r["v"] for r in txnlog.snapshot(spark, dst).collect()}
    assert 1 not in after and after[42] == 84
    assert len(after) == 10  # 10 - deleted + inserted


# --------------------------------------------- OPTIMIZE ZORDER as txn

def _zorder_table(spark):
    path = os.path.join(OUT, "tz")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(4096).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 37, F.lit(4096)).alias("b"),
        (F.col("id") % 10).alias("v"))
    # three appends in row order: every dir spans the full (a, b)
    # space, so nothing prunes before clustering
    txnlog.commit(df.where("id % 3 = 0"), path, "overwrite",
                  stats_cols=["a", "b"])
    txnlog.commit(df.where("id % 3 = 1"), path, "append",
                  stats_cols=["a", "b"])
    txnlog.commit(df.where("id % 3 = 2"), path, "append",
                  stats_cols=["a", "b"])
    return path, df


def test_optimize_zorder_commits_pruned_layout(spark):
    path, df = _zorder_table(spark)
    pre = txnlog.latest_version(path)
    # premise: a corner rectangle prunes NOTHING before clustering
    rect = [("a", 0, 511), ("b", 0, 511)]
    kept0, all0 = txnlog.prune_plan(path, pre, rect)
    assert len(kept0) == len(all0) == 3
    v = txnlog.optimize_zorder(spark, path, "a", "b")
    assert v == pre + 1
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["zorder_by"] == ["a", "b"]
    # layout change only: content identical
    assert txnlog.snapshot(spark, path, v).orderBy("a").collect() == \
        df.orderBy("a").collect()
    # the clustered envelopes now prune the rectangle hard
    kept, all_dirs = txnlog.prune_plan(path, v, rect)
    assert len(all_dirs) > 4
    assert 0 < len(kept) < len(all_dirs) / 2
    # and the pruned snapshot still returns every matching row
    got = (txnlog.snapshot(spark, path, v, prune=rect)
           .where("a <= 511 and b <= 511").count())
    want = df.where("a <= 511 and b <= 511").count()
    assert got == want
    # prior version stays time-travelable
    assert txnlog.snapshot(spark, path, pre).count() == 4096


def test_optimize_zorder_vacuum_protects_live_buckets(spark):
    path, _ = _zorder_table(spark)
    v = txnlog.optimize_zorder(spark, path, "a", "b")
    # vacuum to the clustered version only: the three pre-cluster
    # dirs go, the bucket PARENT dir (referenced via subdirs) stays
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0.0)
    assert len(removed) == 3
    assert txnlog.snapshot(spark, path, v).count() == 4096
    # a later overwrite + vacuum reclaims the bucket parent too
    df2 = (txnlog.snapshot(spark, path, v).limit(5))
    txnlog.commit(df2, path, "overwrite")
    removed2 = txnlog.vacuum(path, keep_latest=1, grace_seconds=0.0)
    assert any("__zb" not in r for r in removed2)
    assert txnlog.snapshot(spark, path).count() == 5


def test_optimize_zorder_maintains_bloom_index(spark):
    path, _ = _zorder_table(spark)
    # declare blooms via an (empty-ish) append so the manifest carries
    # the column; the clustering commit must re-index its bucket dirs
    snap = txnlog.snapshot(spark, path)
    txnlog.commit(snap.limit(0), path, "append", bloom_cols=["a"])
    v = txnlog.optimize_zorder(spark, path, "a", "b")
    from azure_nyctaxi_lambda_elt_spark.operators import bloomindex
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "a", [17])
    assert len(all_dirs) > 4
    assert len(kept) == 1  # point key lives in exactly one bucket
    got = bloomindex.bloom_pruned_snapshot(spark, path, "a", [17])
    assert got.where("a = 17").count() == 1


# -------------------------------------------------- schema in the log

def test_manifest_schema_null_backfills_evolved_column(spark):
    """Columns added by later commits must read back over
    pre-evolution dirs as NULLs — the multi-path parquet default
    would silently DROP the new column when the oldest dir comes
    first.  The manifest-recorded schema makes snapshot explicit."""
    path = os.path.join(OUT, "t_schevo")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(spark.range(5).select("id"), path, "overwrite")
    txnlog.commit(
        spark.range(5, 10).select(
            "id", F.concat(F.lit("s"), F.col("id")).alias("src")),
        path, "append")
    snap = txnlog.snapshot(spark, path)
    assert snap.columns == ["id", "src"]
    rows = {r["id"]: r["src"] for r in snap.collect()}
    assert rows[0] is None and rows[7] == "s7"
    # time travel to v0 shows the pre-evolution schema
    assert txnlog.snapshot(spark, path, 0).columns == ["id"]


def test_manifest_schema_widens_drifted_int(spark):
    """int→bigint producer drift: the merged schema takes the new
    type and the old int32 files upcast on read."""
    path = os.path.join(OUT, "t_widen")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(
        spark.range(3).select(F.col("id").cast("int").alias("id")),
        path, "overwrite")
    txnlog.commit(
        spark.range(3, 6).select(F.col("id").cast("bigint").alias("id")),
        path, "append")
    snap = txnlog.snapshot(spark, path)
    assert dict(snap.dtypes)["id"] == "bigint"
    assert sorted(r["id"] for r in snap.collect()) == [0, 1, 2, 3, 4, 5]


def test_merge_on_zordered_table_rewrites_one_bucket(spark):
    """Interplay: after OPTIMIZE ZORDER the manifest's dirs are
    SUBDIRS of one claimed dir — a small MERGE must still probe,
    rewrite only the buckets holding the touched keys, and leave the
    other bucket dirs carried untouched with their stats."""
    path, df = _zorder_table(spark)
    v = txnlog.optimize_zorder(spark, path, "a", "b")
    man = txnlog._read_manifest(path, v)
    n_buckets = len(man["dirs"])
    assert n_buckets > 4
    up = spark.createDataFrame([(17, 17 * 37 % 4096, 999)],
                               ["a", "b", "v"])
    txnlog.merge_upsert(spark, path, up, ["a"])
    man2 = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert len(man2["meta"]["rewrote"]) == 1          # one bucket
    assert man2["meta"]["rewrote"][0].startswith("data-v")
    assert "__zb=" in man2["meta"]["rewrote"][0]
    got = txnlog.snapshot(spark, path).where("a = 17").collect()
    assert [(r["a"], r["v"]) for r in got] == [(17, 999)]
    assert txnlog.snapshot(spark, path).count() == 4096
    # carried buckets kept their stats envelopes
    carried = [d for d in man2["dirs"] if "__zb=" in d]
    assert all(d in man2["stats"] for d in carried)


def test_change_feed_across_zorder_commit_is_empty(spark):
    """OPTIMIZE ZORDER is a pure layout change: the change feed
    between the pre- and post-clustering versions must be EMPTY even
    though every dir differs — CDF classifies row deltas, not file
    moves."""
    path, _ = _zorder_table(spark)
    pre = txnlog.latest_version(path)
    post = txnlog.optimize_zorder(spark, path, "a", "b")
    feed = txnlog.change_feed(spark, path, pre, post, ["a", "b"])
    assert feed.count() == 0


def test_incremental_zorder_reclusters_only_the_tail(spark):
    """Liquid-clustering shape: after a full OPTIMIZE ZORDER and an
    append, incremental=True must carry every existing bucket dir
    untouched (same names, same stats) and recluster ONLY the
    appended dir — rewrite cost scales with the tail, not the
    table.  Content and pruning must be as good as a full rewrite."""
    path, df = _zorder_table(spark)
    v1 = txnlog.optimize_zorder(spark, path, "a", "b")
    man1 = txnlog._read_manifest(path, v1)
    gen1 = set(man1["dirs"])
    # append a small tail (new key range so it clusters tight)
    tail = spark.range(4096, 4296).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 37, F.lit(4096)).alias("b"),
        (F.col("id") % 10).alias("v"))
    txnlog.commit(tail, path, "append", stats_cols=["a", "b"])
    v2 = txnlog.optimize_zorder(spark, path, "a", "b",
                                incremental=True)
    man2 = txnlog._read_manifest(path, v2)
    assert man2["meta"]["carried_buckets"] == len(gen1)
    assert man2["meta"]["clustered_from"] == 1  # only the append dir
    # every gen-1 bucket dir carried verbatim with its stats
    assert gen1 < set(man2["dirs"])
    for d in gen1:
        assert man2["stats"][d] == man1["stats"][d]
    # content identical to table state
    assert txnlog.snapshot(spark, path, v2).count() == 4296
    got = sorted(r["a"] for r in txnlog.snapshot(spark, path, v2)
                 .where("a >= 4096").collect())
    assert got == list(range(4096, 4296))
    # re-running incrementally with nothing new is a no-op
    assert txnlog.optimize_zorder(spark, path, "a", "b",
                                  incremental=True) is None
    # pruning still skips: corner rectangle opens a strict subset
    stats = txnlog.manifest_stats(path, v2)
    amin = min(s["a"][0] for s in stats.values())
    amax = max(s["a"][1] for s in stats.values())
    bmin = min(s["b"][0] for s in stats.values())
    bmax = max(s["b"][1] for s in stats.values())
    rect = [("a", amin, amin + (amax - amin) // 8),
            ("b", bmin, bmin + (bmax - bmin) // 8)]
    kept, all_dirs = txnlog.prune_plan(path, v2, rect)
    assert 0 < len(kept) < len(all_dirs) / 2


def test_incremental_zorder_different_cols_reclusters_all(spark):
    """incremental=True over a DIFFERENT column pair must not carry
    old buckets — their clustering doesn't serve the new keys."""
    path, _ = _zorder_table(spark)
    txnlog.optimize_zorder(spark, path, "a", "b")
    v = txnlog.optimize_zorder(spark, path, "b", "a",
                               incremental=True)
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["carried_buckets"] == 0
    assert txnlog.snapshot(spark, path, v).count() == 4096


def test_optimize_zorder_race_conflicts_instead_of_losing_update(
        spark, memory_store):
    """A commit landing between optimize_zorder's snapshot and its
    publish must surface as TxnConflict (retryable), NEVER silently
    replace the winner's rows with the stale clustered content."""
    path = os.path.join(OUT, "tz_race")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(1024).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 37, F.lit(1024)).alias("b"))
    txnlog.commit(df.where("a < 900"), path, "overwrite",
                  stats_cols=["a", "b"])

    orig = memory_store.publish
    state = {"injected": False}

    def hijack(final, tmp):
        if not state["injected"]:
            state["injected"] = True
            memory_store.publish = orig
            txnlog.commit(df.where("a >= 900"), path, "append",
                          stats_cols=["a", "b"])
        orig(final, tmp)

    memory_store.publish = hijack
    with pytest.raises(txnlog.TxnConflict):
        txnlog.optimize_zorder(spark, path, "a", "b")
    assert txnlog.snapshot(spark, path).count() == 1024  # nothing lost
    v = txnlog.commit_with_retry(
        lambda: txnlog.optimize_zorder(spark, path, "a", "b"))
    assert txnlog.snapshot(spark, path, v).count() == 1024
    assert all("/__zb=" in d
               for d in txnlog._read_manifest(path, v)["dirs"])


def test_partitioned_commit_prunes_by_partition(spark):
    """commit(partition_by=["d"]): one manifest dir per partition
    value with per-dir stats — a range snapshot(prune=...) opens only
    the matching partition dirs of EVERY commit (intra-commit
    pruning), and each leaf reads back with the full table schema
    (the partition column stays a data column)."""
    path = os.path.join(OUT, "t_part")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"),
        (F.col("id") * 2).alias("v"))
    txnlog.commit(df.where("id < 150"), path, "overwrite",
                  partition_by=["d"], stats_cols=["id"])
    txnlog.commit(df.where("id >= 150"), path, "append",
                  partition_by=["d"], stats_cols=["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert len(man["dirs"]) == 6          # 2 commits x 3 partitions
    assert all("__p_d=" in d for d in man["dirs"])
    # partition pruning: d = 1 opens 2 of 6 dirs (one per commit)
    kept, all_dirs = txnlog.prune_plan(path, None, [("d", 1, 1)])
    assert len(all_dirs) == 6 and len(kept) == 2
    snap = txnlog.snapshot(spark, path, prune=("d", 1, 1))
    got = snap.where("d = 1")
    assert got.count() == 100
    assert sorted(snap.columns) == ["d", "id", "v"]  # full schema
    # conjunction with the id stats: one commit's one partition
    kept2, _ = txnlog.prune_plan(
        path, None, [("d", 1, 1), ("id", 0, 100)])
    assert len(kept2) == 1
    # content identical to the unpartitioned answer
    want = sorted((r["id"], r["d"], r["v"]) for r in
                  df.where("d = 1").collect())
    have = sorted((r["id"], r["d"], r["v"]) for r in got.collect())
    assert have == want


def test_partitioned_commit_composes_with_bloom_and_merge(spark):
    """Partition dirs are ordinary manifest dirs: commit-time bloom
    indexes every leaf, and a small MERGE rewrites only the leaves
    holding the touched keys."""
    path = os.path.join(OUT, "t_part_bloom")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"))
    txnlog.commit(df, path, "overwrite", partition_by=["d"],
                  bloom_cols=["id"])
    root = os.path.join(path, "_txn", "bloom")
    assert len(os.listdir(root)) == 3     # one sidecar per leaf
    kept, all_dirs = bloomindex_prune(spark, path, "id", [7])
    assert len(all_dirs) == 3 and len(kept) == 1
    up = spark.createDataFrame([(7, 99)], ["id", "d"])
    txnlog.merge_upsert(spark, path, up, ["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert len(man["meta"]["rewrote"]) == 1
    assert txnlog.snapshot(spark, path).count() == 300
    assert txnlog.snapshot(spark, path).where("id = 7") \
        .collect()[0]["d"] == 99


def bloomindex_prune(spark, path, col, values):
    from azure_nyctaxi_lambda_elt_spark.operators import bloomindex

    return bloomindex.prune_dirs(spark, path, col, values)


def test_partition_by_is_a_table_property(spark):
    """partition_by declared ONCE at table creation: a plain append
    inherits it (one manifest dir per value, no arg), maintenance
    commits carry it, and an explicit [] clears it."""
    path = os.path.join(OUT, "t_part_prop")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 2).alias("d"))
    txnlog.commit(df.where("id < 100"), path, "overwrite",
                  partition_by=["d"])
    txnlog.commit(df.where("id >= 100"), path, "append")  # inherits
    man = txnlog._read_manifest(path, 1)
    assert man["partition_by"] == ["d"]
    assert len(man["dirs"]) == 4 and \
        all("__p_d=" in d for d in man["dirs"])
    # property rides through restore and shallow clone
    v = txnlog.restore(path, 0)
    assert txnlog._read_manifest(path, v)["partition_by"] == ["d"]
    clone = os.path.join(OUT, "t_part_prop_clone")
    shutil.rmtree(clone, ignore_errors=True)
    txnlog.shallow_clone(path, clone)
    assert txnlog._read_manifest(clone, 0)["partition_by"] == ["d"]
    # merge keeps the property too
    up = spark.createDataFrame([(5, 7)], ["id", "d"])
    mv = txnlog.merge_upsert(spark, path, up, ["id"])
    assert txnlog._read_manifest(path, mv)["partition_by"] == ["d"]
    # explicit [] clears: the next commit is unpartitioned
    cv = txnlog.commit(df, path, "overwrite", partition_by=[])
    man = txnlog._read_manifest(path, cv)
    assert man["partition_by"] == [] and len(man["dirs"]) == 1


def test_partitioned_compact_binpacks_within_partitions(spark):
    """compact() on a partitioned table bin-packs WITHIN partition
    values (Delta OPTIMIZE on a partitioned table): 2 commits x 3
    values = 6 dirs -> 3 dirs, one per live value — partition pruning
    survives maintenance; content and property unchanged."""
    path = os.path.join(OUT, "t_part_compact")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"),
        (F.col("id") * 10).alias("v"))
    txnlog.commit(df.where("id < 150"), path, "overwrite",
                  partition_by=["d"], stats_cols=["id"])
    txnlog.commit(df.where("id >= 150"), path, "append")
    assert len(txnlog._read_manifest(path, 1)["dirs"]) == 6
    cv = txnlog.compact(spark, path)
    man = txnlog._read_manifest(path, cv)
    assert len(man["dirs"]) == 3          # one per partition value
    assert all("__p_d=" in d for d in man["dirs"])
    assert man["partition_by"] == ["d"]
    # stats restated per compacted dir: pruning still bites
    kept, all_dirs = txnlog.prune_plan(path, cv, [("d", 2, 2)])
    assert len(all_dirs) == 3 and len(kept) == 1
    snap = txnlog.snapshot(spark, path, cv)
    assert snap.count() == 300
    assert sorted(snap.columns) == ["d", "id", "v"]
    have = sorted(tuple(r) for r in
                  snap.where("d = 2").select("id", "v").collect())
    want = sorted(tuple(r) for r in
                  df.where("d = 2").select("id", "v").collect())
    assert have == want
    # idempotence: at the live partition count it's a no-op
    assert txnlog.compact(spark, path, target_dirs=3) is None
    # pre-compaction versions stay time-travelable
    assert txnlog.snapshot(spark, path, 1).count() == 300


def test_merge_rewrite_stays_partition_split(spark):
    """MERGE on a partitioned table: the copy-on-write dir splits per
    partition value (dir-per-value is an INVARIANT, not an eventual
    state), per-leaf stats are restated, and a value-scoped pruned
    read after the upsert opens only matching leaves."""
    path = os.path.join(OUT, "t_part_merge")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"),
        (F.col("id") * 10).alias("v"))
    txnlog.commit(df, path, "overwrite", partition_by=["d"])
    # move id=7 from d=1 to d=99 and bump its payload
    up = spark.createDataFrame([(7, 99, 777)], ["id", "d", "v"])
    mv = txnlog.merge_upsert(spark, path, up, ["id"])
    man = txnlog._read_manifest(path, mv)
    assert len(man["meta"]["rewrote"]) == 1  # only the d=1 leaf held id=7
    new_leaves = [d for d in man["dirs"] if "data-v00000001" in d]
    # the rewrite split per value: a d=1 remainder leaf + a d=99 leaf
    assert len(new_leaves) == 2
    assert all("__p_d=" in d for d in new_leaves)
    assert len(man["dirs"]) == 4  # 2 untouched old leaves carried
    # d=99 exists only in the rewrite: pruning opens exactly 1 leaf
    kept, all_dirs = txnlog.prune_plan(path, mv, [("d", 99, 99)])
    assert len(kept) == 1 and kept[0] in new_leaves
    snap = txnlog.snapshot(spark, path, mv, prune=("d", 99, 99))
    row = snap.where("d = 99").collect()
    assert len(row) == 1 and row[0]["id"] == 7 and row[0]["v"] == 777
    assert txnlog.snapshot(spark, path, mv).count() == 300


def test_partitioned_commit_uri_hostile_values(spark):
    """Partition values that Hive-escape on disk (space, %, +, =,
    unicode, empty string, NULL) must round-trip through the
    input_file_name URI decode: manifest dirs exist on disk, the
    snapshot is content-identical, and per-value pruning still
    works."""
    vals = ["a b", "p%25q", "x+y", "k=v", "café", "", None, "plain"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "c"])
    path = os.path.join(OUT, "t_part_hostile")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(df, path, "overwrite", partition_by=["c"])
    man = txnlog._read_manifest(path, 0)
    # every manifest dir must exist on disk under the table root
    for d in man["dirs"]:
        assert os.path.isdir(os.path.join(path, d)), d
    snap = txnlog.snapshot(spark, path)
    have = sorted((r["id"], r["c"]) for r in snap.collect())
    # '' normalizes: Spark's partitionBy folds empty string into the
    # default (null) partition — the VALUE round-trips via the real
    # data column, which is the authority, so compare against it
    assert have == sorted(rows)
    # value-scoped pruning on an exact awkward value
    kept, all_dirs = txnlog.prune_plan(path, 0, [("c", "a b", "a b")])
    assert kept and len(kept) < len(all_dirs)
    got = txnlog.snapshot(spark, path, prune=("c", "a b", "a b")) \
        .where(F.col("c") == "a b").collect()
    assert [(r["id"], r["c"]) for r in got] == [(0, "a b")]


def test_multi_column_partitioned_commit(spark):
    """Two-level partitioning (the ASA archive's date/hour shape):
    one manifest dir per (d, h) value pair, nested Hive dirs,
    conjunction pruning on both levels, content identity."""
    path = os.path.join(OUT, "t_part_multi")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(240).select(
        F.col("id"), (F.col("id") % 2).alias("d"),
        (F.col("id") % 3).alias("h"))
    txnlog.commit(df, path, "overwrite", partition_by=["d", "h"])
    man = txnlog._read_manifest(path, 0)
    assert len(man["dirs"]) == 6          # 2 x 3 value pairs
    assert all("__p_d=" in x and "__p_h=" in x for x in man["dirs"])
    kept, all_dirs = txnlog.prune_plan(
        path, 0, [("d", 1, 1), ("h", 2, 2)])
    assert len(all_dirs) == 6 and len(kept) == 1
    got = (txnlog.snapshot(spark, path,
                           prune=[("d", 1, 1), ("h", 2, 2)])
           .where("d = 1 and h = 2"))
    want = df.where("d = 1 and h = 2")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # append inherits BOTH columns
    txnlog.commit(df.select(F.col("id") + 1000, "d", "h")
                  .toDF("id", "d", "h"), path, "append")
    man1 = txnlog._read_manifest(path, 1)
    assert man1["partition_by"] == ["d", "h"]
    assert len(man1["dirs"]) == 12


def test_schema_evolution_on_partitioned_table(spark):
    """Partition property + schema evolution together: an inheriting
    append carries a NEW column; the manifest schema merges, and
    pre-evolution partition leaves null-backfill on snapshot reads
    while pruning still works across both generations."""
    path = os.path.join(OUT, "t_part_evolve")
    shutil.rmtree(path, ignore_errors=True)
    gen1 = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).alias("d"))
    txnlog.commit(gen1, path, "overwrite", partition_by=["d"])
    gen2 = spark.range(100, 200).select(
        F.col("id"), (F.col("id") % 2).alias("d"),
        (F.col("id") * 2).alias("extra"))
    txnlog.commit(gen2, path, "append")   # inherits partitioning
    snap = txnlog.snapshot(spark, path)
    assert sorted(snap.columns) == ["d", "extra", "id"]
    assert snap.count() == 200
    # gen-1 rows null-backfill the evolved column
    assert snap.where("id < 100 AND extra IS NULL").count() == 100
    assert snap.where("id >= 100 AND extra = id * 2").count() == 100
    # pruning spans both generations' leaves
    kept, all_dirs = txnlog.prune_plan(path, None, [("d", 0, 0)])
    assert len(all_dirs) == 4 and len(kept) == 2
    pruned = txnlog.snapshot(spark, path, prune=("d", 0, 0)) \
        .where("d = 0")
    assert pruned.count() == 100
    # v0 time-travels with the narrow schema
    assert sorted(txnlog.snapshot(spark, path, 0).columns) == \
        ["d", "id"]


def test_merge_on_clone_of_partitioned_table(spark):
    """A shallow clone of a partitioned table references the source's
    partition LEAVES by absolute path; a merge on the clone probes
    those absolute leaves, rewrites only the touched one into the
    clone's own partition-split dir, and never mutates the source."""
    src = os.path.join(OUT, "t_part_clone_src")
    dst = os.path.join(OUT, "t_part_clone_dst")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"))
    txnlog.commit(df, path=src, mode="overwrite", partition_by=["d"])
    txnlog.shallow_clone(src, dst)
    up = spark.createDataFrame([(7, 99)], ["id", "d"])
    mv = txnlog.merge_upsert(spark, dst, up, ["id"])
    man = txnlog._read_manifest(dst, mv)
    assert man["partition_by"] == ["d"]
    assert len(man["meta"]["rewrote"]) == 1       # one source leaf
    # the rewrite landed in the CLONE's own dirs, partition-split
    local = [d for d in man["dirs"] if not os.path.isabs(d)]
    assert local and all("__p_d=" in d for d in local)
    snap = txnlog.snapshot(spark, dst)
    assert snap.count() == 300
    assert snap.where("id = 7").collect()[0]["d"] == 99
    # source untouched
    assert txnlog.snapshot(spark, src).where("id = 7") \
        .collect()[0]["d"] == 1
    # clone-side pruning on the moved value opens only the new leaf
    kept, _ = txnlog.prune_plan(dst, None, [("d", 99, 99)])
    assert len(kept) == 1 and not os.path.isabs(kept[0])


def test_zorder_within_partitions(spark):
    """OPTIMIZE ZORDER on a partitioned table clusters WITHIN each
    partition value (Delta's rule: zorder columns must not be
    partition columns — those dirs already prune): leaves are
    __p_.../__zb=... nested, each partition quantizes against its own
    bounds, NULL partition rows survive the null-safe bounds join,
    and a (partition, a, b) corner read prunes on all three at once;
    content and property unchanged, incremental recluster composes."""
    path = os.path.join(OUT, "t_part_zorder")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(4096).select(
        F.col("id").alias("a"),
        ((F.col("id") * 7919) % 4096).alias("b"),
        F.when(F.col("id") % 97 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("id") % 2).alias("d"))
    txnlog.commit(df, path, "overwrite", partition_by=["d"])
    with pytest.raises(ValueError):
        txnlog.optimize_zorder(spark, path, "d", "b")
    v = txnlog.optimize_zorder(spark, path, "a", "b")
    man = txnlog._read_manifest(path, v)
    assert man["partition_by"] == ["d"]
    assert all("__p_d=" in d and "/__zb=" in d for d in man["dirs"])
    snap = txnlog.snapshot(spark, path, v)
    assert snap.count() == 4096          # NULL-d rows survived
    assert sorted(snap.columns) == ["a", "b", "d"]
    # corner rectangle within one partition: prunes on d AND (a, b)
    rect = [("d", 0, 0), ("a", 0, 511), ("b", 0, 511)]
    kept, all_dirs = txnlog.prune_plan(path, v, rect)
    # NULL-d leaves ([null, null] envelope) are kept conservatively,
    # but the d=1 leaves and far-corner d=0 buckets must drop
    assert len(kept) < len(all_dirs)
    got = (txnlog.snapshot(spark, path, v, prune=rect)
           .where((F.col("d") == 0) & (F.col("a") <= 511)
                  & (F.col("b") <= 511)))
    want = df.where((F.col("d") == 0) & (F.col("a") <= 511)
                    & (F.col("b") <= 511))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # incremental: append into one partition, recluster only the tail
    extra = spark.range(4096, 4608).select(
        F.col("id").alias("a"), (F.col("id") % 4096).alias("b"),
        F.lit(0).cast("bigint").alias("d"))
    txnlog.commit(extra, path, "append")
    v2 = txnlog.optimize_zorder(spark, path, "a", "b",
                                incremental=True)
    man2 = txnlog._read_manifest(path, v2)
    assert man2["meta"]["carried_buckets"] == len(man["dirs"])
    assert set(man["dirs"]) < set(man2["dirs"])  # gen-A verbatim
    assert txnlog.snapshot(spark, path, v2).count() == 4608
    # fully clustered now: the next incremental pass is a no-op
    assert txnlog.optimize_zorder(spark, path, "a", "b",
                                  incremental=True) is None


def test_partitioned_commit_empty_frame(spark):
    """An EMPTY partitioned commit must still land a readable version
    (plain empty dir fallback carrying the schema) — and every other
    partitioned write path (compact, zorder, merge-delete-all) must
    share the same fallback instead of committing dirs=[]."""
    path = os.path.join(OUT, "t_part_empty")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(5).select(
        F.col("id"), (F.col("id") % 2).alias("d"))
    txnlog.commit(df.limit(0), path, "overwrite", partition_by=["d"])
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 0
    assert sorted(snap.columns) == ["d", "id"]
    # OPTIMIZE ZORDER on the empty partitioned table: same fallback
    v = txnlog.optimize_zorder(spark, path, "id", "id")
    man = txnlog._read_manifest(path, v)
    assert man["dirs"] and man["partition_by"] == ["d"]
    snap2 = txnlog.snapshot(spark, path, v)
    assert snap2.count() == 0
    assert sorted(snap2.columns) == ["d", "id"]


def test_manifest_schema_rejects_narrowing_keeps_wider(spark):
    """A plain append with a NARROWER type (bigint table, int write)
    must not record the narrowed type as the table schema — the r7
    advice showed snapshot() then fails reading the old wider dirs
    (parquet long→int).  The merged schema keeps the WIDER end of
    the chain regardless of write direction; an incompatible change
    (string→int) raises instead of committing."""
    path = os.path.join(OUT, "t_narrow")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(
        spark.range(3).select(F.col("id").cast("bigint").alias("id")),
        path, "overwrite")
    txnlog.commit(
        spark.range(3, 6).select(F.col("id").cast("int").alias("id")),
        path, "append")
    snap = txnlog.snapshot(spark, path)
    assert dict(snap.dtypes)["id"] == "bigint"
    assert sorted(r["id"] for r in snap.collect()) == [0, 1, 2, 3, 4, 5]
    # float chain, both directions
    assert "double" in txnlog._merge_schema_json(
        spark.range(1).select(F.lit(1.0).cast("double").alias("x"))
        .schema.json(),
        spark.range(1).select(F.lit(1.0).cast("float").alias("x"))
        .schema.json())
    # incompatible: raises, table untouched
    with pytest.raises(ValueError, match="incompatible type change"):
        txnlog.commit(
            spark.range(6, 9).select(
                F.col("id").cast("string").alias("id")),
            path, "append")
    assert txnlog.snapshot(spark, path).count() == 6
