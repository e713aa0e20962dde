"""Deletion vectors (operators/txnlog.py delete_keys / _apply_dv):
small deletes as dir-scoped key tombstones — no data dir rewritten —
with materialization via compact/zorder, carry through append/merge/
restore, exact metadata counts, explicit refusals (CDF, clone), and
retention GC of dead stores.  Delta DV parity at the txn-dir grain.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import bloomindex, txnlog

OUT = "/tmp/spark_graft_dv_test"


def _table(spark, name, n=300, bloom=False, stats=True):
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 3).alias("d"),
        (F.col("id") * 10).alias("v"))
    kw = {}
    if bloom:
        kw["bloom_cols"] = ["id"]
    if stats:
        kw["stats_cols"] = ["id"]
    txnlog.commit(df.where("id < 150"), path, "overwrite", **kw)
    txnlog.commit(df.where("id >= 150"), path, "append", **kw)
    return path, df


def _keys(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], ["id"])


def test_delete_keys_basic_and_metadata_exact(spark):
    path, df = _table(spark, "t_basic")
    v = txnlog.delete_keys(spark, path, _keys(spark, [7, 11, 200]),
                           ["id"])
    man = txnlog._read_manifest(path, v)
    assert man["mode"] == "delete"
    assert man["dirs"] == txnlog._read_manifest(path, 1)["dirs"]
    assert len(man["dv"]) == 1
    entry = man["dv"][0]
    assert entry["key_cols"] == ["id"]
    assert sum(entry["dirs"].values()) == 3
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 297
    assert snap.where("id in (7, 11, 200)").count() == 0
    # untouched rows intact
    assert snap.where("id = 8").collect()[0]["v"] == 80
    # metadata-only count stays EXACT through the delete
    assert txnlog.metadata_count(path) == 297
    # the tombstone store exists and is tiny
    store = txnlog._dv_store_dir(path, entry["store"])
    assert os.path.isdir(store)
    # time travel: the pre-delete version still shows the rows
    assert txnlog.snapshot(spark, path, 1).count() == 300


def test_delete_then_reinsert_survives(spark):
    """Dir-scoped tombstones: a key deleted at v2 and re-inserted by
    a LATER append must survive — the new dir is never listed."""
    path, df = _table(spark, "t_reinsert")
    txnlog.delete_keys(spark, path, _keys(spark, [7]), ["id"])
    assert txnlog.snapshot(spark, path).where("id = 7").count() == 0
    re = spark.createDataFrame([(7, 1, 9999)], ["id", "d", "v"])
    txnlog.commit(re, path, "append", stats_cols=["id"])
    got = txnlog.snapshot(spark, path).where("id = 7").collect()
    assert len(got) == 1 and got[0]["v"] == 9999
    # and the append CARRIED the tombstone (old rows stay dead):
    # total = 300 - 1 deleted + 1 reinserted
    assert txnlog.snapshot(spark, path).count() == 300
    assert txnlog.metadata_count(path) == 300


def test_compact_materializes_tombstones(spark):
    path, df = _table(spark, "t_mat")
    txnlog.delete_keys(spark, path, _keys(spark, [0, 299]), ["id"])
    cv = txnlog.compact(spark, path)
    man = txnlog._read_manifest(path, cv)
    assert man["dv"] == []            # materialized away
    snap = txnlog.snapshot(spark, path, cv)
    assert snap.count() == 298
    assert snap.where("id in (0, 299)").count() == 0
    assert txnlog.metadata_count(path, cv) == 298
    # compact at target layout with live DVs is NOT a no-op
    path2, _ = _table(spark, "t_mat2")
    txnlog.compact(spark, path2)      # 1 dir now
    txnlog.delete_keys(spark, path2, _keys(spark, [5]), ["id"])
    assert txnlog.compact(spark, path2) is not None
    assert txnlog._read_manifest(
        path2, txnlog.latest_version(path2))["dv"] == []
    assert txnlog.snapshot(spark, path2).count() == 299


def test_merge_applies_and_filters_tombstones(spark):
    """MERGE on a DV'd table must not resurrect tombstoned rows, and
    a rewritten dir's tombstone contribution drops with the dir so
    metadata_count stays exact."""
    path, df = _table(spark, "t_merge")
    # delete two keys living in the FIRST commit's dir
    txnlog.delete_keys(spark, path, _keys(spark, [3, 4]), ["id"])
    # upsert a key in the same dir: the rewrite must keep 3/4 dead
    up = spark.createDataFrame([(5, 2, 555)], ["id", "d", "v"])
    mv = txnlog.merge_upsert(spark, path, up, ["id"])
    man = txnlog._read_manifest(path, mv)
    assert len(man["meta"]["rewrote"]) == 1
    # the tombstoned dir was the rewritten one: entry filtered away
    assert man["dv"] == []
    snap = txnlog.snapshot(spark, path, mv)
    assert snap.count() == 298
    assert snap.where("id in (3, 4)").count() == 0
    assert snap.where("id = 5").collect()[0]["v"] == 555
    assert txnlog.metadata_count(path, mv) == 298


def test_restore_and_refusals(spark):
    path, df = _table(spark, "t_refuse")
    v_before = txnlog.latest_version(path)
    dv_v = txnlog.delete_keys(spark, path, _keys(spark, [9]), ["id"])
    # change feed across the DV commit (r11): the dir diff is empty,
    # but the tombstone pair delta surfaces the delete exactly
    feed = txnlog.change_feed(spark, path, v_before, dv_v, ["id"])
    assert [(r["id"], r["_change_type"]) for r in feed.collect()] \
        == [(9, "delete")]
    # clone of a live-DV table refuses (stores live under src _txn)
    with pytest.raises(ValueError):
        txnlog.shallow_clone(path, os.path.join(OUT, "t_refuse_c"))
    # restore to the pre-delete version resurrects the row
    rv = txnlog.restore(path, v_before)
    assert txnlog._read_manifest(path, rv)["dv"] == []
    assert txnlog.snapshot(spark, path).where("id = 9").count() == 1
    # after compact the feed works again (vs the materialized state)
    txnlog.delete_keys(spark, path, _keys(spark, [9]), ["id"])
    cv = txnlog.compact(spark, path)
    feed = txnlog.change_feed(spark, path, rv, cv, ["id"])
    dels = feed.where("_change_type = 'delete'").collect()
    assert [r["id"] for r in dels] == [9]


def test_zorder_materializes_tombstones(spark):
    path, df = _table(spark, "t_zdv")
    txnlog.delete_keys(spark, path, _keys(spark, [42]), ["id"])
    v = txnlog.optimize_zorder(spark, path, "id", "v")
    man = txnlog._read_manifest(path, v)
    assert man["dv"] == []
    snap = txnlog.snapshot(spark, path, v)
    assert snap.count() == 299
    assert snap.where("id = 42").count() == 0


def test_duplicate_rows_absent_keys_and_cap(spark):
    path = os.path.join(OUT, "t_dup")
    shutil.rmtree(path, ignore_errors=True)
    dup = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], ["id", "v"])
    txnlog.commit(dup, path, "overwrite")
    # duplicate keys in one dir all die; absent key is a no-op
    v = txnlog.delete_keys(spark, path, _keys(spark, [1, 777]), ["id"])
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 1 and snap.collect()[0]["id"] == 2
    man = txnlog._read_manifest(path, v)
    assert sum(man["dv"][0]["dirs"].values()) == 2  # both dup rows
    # absent-key-only delete commits a version with dv unchanged
    v2 = txnlog.delete_keys(spark, path, _keys(spark, [888]), ["id"])
    assert txnlog._read_manifest(path, v2)["dv"] == man["dv"]
    # the broadcastability cap is enforced
    big = spark.range(txnlog.DV_MAX_KEYS + 1).select(
        F.col("id"))
    with pytest.raises(ValueError):
        txnlog.delete_keys(spark, path, big, ["id"])


def test_bloom_pruned_read_respects_tombstones(spark):
    path, df = _table(spark, "t_bloomdv", bloom=True, stats=False)
    txnlog.delete_keys(spark, path, _keys(spark, [7]), ["id"])
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", [7, 8])
    got = snap.where(F.col("id").isin([7, 8])).collect()
    assert [r["id"] for r in got] == [8]


def test_null_key_delete_and_clone_refusal(spark):
    """A NULL key is a legal delete target (purging unkeyed rows —
    the probe is null-safe end to end); delete_keys on a shallow
    clone refuses (its manifest references external absolute dirs
    the rel-dir tombstone math cannot express)."""
    path = os.path.join(OUT, "t_nullkey")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, 10), (None, 11), (None, 12), (3, 30)], "id long, v long")
    txnlog.commit(df, path, "overwrite")
    nk = spark.createDataFrame([(None,)], "id long")
    v = txnlog.delete_keys(spark, path, nk, ["id"])
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 2
    assert snap.where("id IS NULL").count() == 0
    assert sum(txnlog._read_manifest(path, v)["dv"][0]
               ["dirs"].values()) == 2
    # clone (of a DV-free table) cannot take dir-scoped tombstones
    src = os.path.join(OUT, "t_clone_src")
    shutil.rmtree(src, ignore_errors=True)
    txnlog.commit(df, src, "overwrite")
    dst = os.path.join(OUT, "t_clone_dst")
    shutil.rmtree(dst, ignore_errors=True)
    txnlog.shallow_clone(src, dst)
    with pytest.raises(ValueError):
        txnlog.delete_keys(spark, dst, _keys(spark, [1]), ["id"])


def test_delete_on_table_path_with_space(spark):
    """The dir tag and tombstone rel names use the DECODED on-disk
    path form, so a table path containing a space deletes
    correctly (input_file_name() percent-encodes it)."""
    path = os.path.join(OUT, "t dv space")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(20).select(F.col("id"))
    txnlog.commit(df, path, "overwrite", stats_cols=["id"])
    v = txnlog.delete_keys(spark, path, _keys(spark, [3]), ["id"])
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 19
    assert snap.where("id = 3").count() == 0
    man = txnlog._read_manifest(path, v)
    assert sum(man["dv"][0]["dirs"].values()) == 1
    assert txnlog.metadata_count(path) == 19


def test_racing_delete_loser_cannot_clobber_winner_store(spark):
    """Two writers racing the same delete version: the loser's
    tombstone store is a DIFFERENT claimed dir, so the winner's
    committed bytes survive and the loser surfaces as TxnConflict."""
    path = os.path.join(OUT, "t_dvrace")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(20).select(F.col("id"))
    txnlog.commit(df, path, "overwrite")

    winner_v = txnlog.delete_keys(spark, path, _keys(spark, [3]),
                                  ["id"])
    win_store = txnlog._read_manifest(path, winner_v)["dv"][0]["store"]
    win_bytes = sorted(os.listdir(txnlog._dv_store_dir(path,
                                                       win_store)))
    # the claim is atomic-mkdir: a second claimant for the SAME
    # version gets a DIFFERENT dir, never the winner's (the clobber
    # a deterministic mode('overwrite') path would allow)
    other = txnlog._claim_dv_store(path, winner_v)
    assert other != win_store
    # a loser that resolved the parent before the winner published
    # surfaces as TxnConflict with the winner's bytes untouched
    orig = txnlog.latest_version
    txnlog.latest_version = lambda p: 0 if p == path else orig(p)
    try:
        with pytest.raises(txnlog.TxnConflict):
            txnlog.delete_keys(spark, path, _keys(spark, [5]), ["id"])
    finally:
        txnlog.latest_version = orig
    assert sorted(os.listdir(
        txnlog._dv_store_dir(path, win_store))) == win_bytes
    snap = txnlog.snapshot(spark, path, winner_v)
    assert snap.count() == 19 and snap.where("id = 3").count() == 0
    assert snap.where("id = 5").count() == 1  # loser's delete absent


def test_dv_on_partitioned_table(spark):
    """Deletion vectors over Hive-partitioned commits: tombstones
    record the NESTED leaf dir, the value-scoped pruned read stays
    DV-filtered, compact materializes into per-partition dirs with
    the tombstones gone, and metadata_count stays exact."""
    path = os.path.join(OUT, "t_dv_part")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("d"))
    txnlog.commit(df, path, "overwrite", partition_by=["d"],
                  stats_cols=["id"])
    v = txnlog.delete_keys(spark, path, _keys(spark, [7, 8]), ["id"])
    man = txnlog._read_manifest(path, v)
    dirs = man["dv"][0]["dirs"]
    # id=7 -> leaf __p_d=1, id=8 -> leaf __p_d=2: nested names
    assert len(dirs) == 2 and all("__p_d=" in d for d in dirs)
    # the value-scoped pruned read is DV-filtered too
    snap = txnlog.snapshot(spark, path, prune=("d", 1, 1))
    assert snap.where("id = 7").count() == 0
    assert snap.where("id = 4").count() == 1
    assert txnlog.snapshot(spark, path).count() == 298
    assert txnlog.metadata_count(path) == 298
    # compact: per-partition dirs, tombstones materialized away
    cv = txnlog.compact(spark, path)
    man2 = txnlog._read_manifest(path, cv)
    assert man2["dv"] == [] and len(man2["dirs"]) == 3
    assert txnlog.snapshot(spark, path, cv).count() == 298
    assert txnlog.snapshot(spark, path, cv) \
        .where("id in (7, 8)").count() == 0


def test_vacuum_gcs_dead_dv_stores(spark):
    path, df = _table(spark, "t_dvgc")
    v = txnlog.delete_keys(spark, path, _keys(spark, [1]), ["id"])
    store = txnlog._read_manifest(path, v)["dv"][0]["store"]
    txnlog.compact(spark, path)   # materializes; store now dead at head
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    assert f"_txn/dv/{store}" in removed
    assert not os.path.isdir(txnlog._dv_store_dir(path, store))
    assert txnlog.snapshot(spark, path).count() == 299
    # a store still referenced by a KEPT manifest survives
    path2, _ = _table(spark, "t_dvgc2")
    v2 = txnlog.delete_keys(spark, path2, _keys(spark, [1]), ["id"])
    store2 = txnlog._read_manifest(path2, v2)["dv"][0]["store"]
    txnlog.vacuum(path2, keep_latest=1, grace_seconds=0)
    assert os.path.isdir(txnlog._dv_store_dir(path2, store2))
    assert txnlog.snapshot(spark, path2).count() == 299


def test_null_key_delete_on_stats_and_bloom_table(spark):
    """The r7-advice repro: NULL-keyed deletes on a table WITH
    manifest stats and/or bloom sidecars.  min/max envelopes ignore
    NULLs and bloom bitmaps record only non-null values, so both
    fast paths must stand down whenever the key set contains a NULL
    — an all-NULL key set previously yielded candidates=[] and the
    NULL rows silently survived."""
    for name, kw in (("t_null_stats", {"stats": True}),
                     ("t_null_bloom", {"stats": False, "bloom": True}),
                     ("t_null_both", {"stats": True, "bloom": True})):
        path = os.path.join(OUT, name)
        shutil.rmtree(path, ignore_errors=True)
        df = spark.createDataFrame(
            [(1, 10), (None, 11), (None, 12), (3, 30), (4, 40)],
            "id long, v long")
        ckw = {}
        if kw.get("stats"):
            ckw["stats_cols"] = ["id"]
        if kw.get("bloom"):
            ckw["bloom_cols"] = ["id"]
        txnlog.commit(df, path, "overwrite", **ckw)

        # all-NULL key set: both NULL rows die, nothing else
        nk = spark.createDataFrame([(None,)], "id long")
        v = txnlog.delete_keys(spark, path, nk, ["id"])
        snap = txnlog.snapshot(spark, path)
        assert snap.where("id IS NULL").count() == 0, name
        assert snap.count() == 3, name
        assert txnlog._read_manifest(path, v)["meta"][
            "dv_rows_deleted"] == 2, name

        # mixed NULL + non-NULL key set in one delete
        path2 = path + "_mixed"
        shutil.rmtree(path2, ignore_errors=True)
        txnlog.commit(df, path2, "overwrite", **ckw)
        mk = spark.createDataFrame([(None,), (3,)], "id long")
        txnlog.delete_keys(spark, path2, mk, ["id"])
        snap2 = txnlog.snapshot(spark, path2)
        assert snap2.where("id IS NULL OR id = 3").count() == 0, name
        assert snap2.count() == 2, name

        # non-null fast paths still engaged: an empty key set commits
        # a no-op delete
        v3 = txnlog.delete_keys(
            spark, path2, spark.createDataFrame([], "id long"), ["id"])
        assert txnlog._read_manifest(path2, v3)["dv"] == \
            txnlog._read_manifest(path2, v3 - 1)["dv"], name


def test_dv_chain_coalesces_bounded_antijoins(spark):
    """Verdict-r7 watch item: N chatty deletes before a compact must
    NOT put N broadcast anti-joins in every snapshot read.  Past
    DV_COALESCE_LIVE_STORES live same-key stores, delete_keys folds
    the chain into one store — 20 sequential single-key deletes keep
    the optimized snapshot plan at <= threshold+1 LeftAnti joins,
    results unchanged, and the folded-away stores become vacuumable."""
    path, df = _table(spark, "t_dvchain")
    for i in range(20):
        txnlog.delete_keys(spark, path, _keys(spark, [i]), ["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    thr = txnlog.DV_COALESCE_LIVE_STORES
    assert len(man["dv"]) <= thr
    snap = txnlog.snapshot(spark, path)
    plan = snap._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") <= thr + 1
    assert snap.count() == 280
    assert snap.where("id < 20").count() == 0
    assert snap.where("id = 25").count() == 1
    # exact metadata count survives the folds
    assert txnlog.metadata_count(path) == 280
    # every tombstone ever written still applies at the latest
    # version; pre-fold versions time-travel with their own chains
    assert txnlog.snapshot(spark, path, 3).count() == 298
    # folded-away stores are unreferenced by the kept manifest
    live = {e["store"] for e in man["dv"]}
    all_stores = set(os.listdir(os.path.join(path, "_txn", "dv")))
    assert live <= all_stores and len(all_stores) > len(live)
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
    left = set(os.listdir(os.path.join(path, "_txn", "dv")))
    assert left == live and any("_txn/dv/" in r for r in removed)
    assert txnlog.snapshot(spark, path).count() == 280


def test_cdf_dv_delete_then_reinsert_classifies_update(spark):
    """DV-aware CDF end to end: a DV delete followed by an append
    re-inserting some of the keys — the feed shows re-inserted keys
    as update pre/post pairs, the rest as deletes, fresh keys as
    inserts, all without materializing the vectors."""
    path, df = _table(spark, "t_cdf_dv")
    a = txnlog.latest_version(path)           # 1
    txnlog.delete_keys(spark, path, _keys(spark, [5, 6, 200]), ["id"])
    re_ins = spark.createDataFrame(
        [(5, 2, 5555), (999, 0, 9990)], ["id", "d", "v"])
    b = txnlog.commit(re_ins, path, "append")
    feed = txnlog.change_feed(spark, path, a, b, ["id"])
    got = {(r["id"], r["_change_type"]): r["v"]
           for r in feed.collect()}
    assert got == {
        (5, "update_preimage"): 50,
        (5, "update_postimage"): 5555,
        (6, "delete"): 60,
        (200, "delete"): 2000,
        (999, "insert"): 9990,
    }


def test_cdf_dv_coalesced_stores_pair_set_exact(spark, monkeypatch):
    """Store coalescing between the endpoints must not re-report
    pairs already tombstoned at A: the feed works on pair SETS, not
    store identity."""
    monkeypatch.setattr(txnlog, "DV_COALESCE_LIVE_STORES", 2)
    path, df = _table(spark, "t_cdf_fold")
    txnlog.delete_keys(spark, path, _keys(spark, [1]), ["id"])
    txnlog.delete_keys(spark, path, _keys(spark, [2]), ["id"])
    a = txnlog.latest_version(path)
    # this third delete folds the whole chain into ONE new store
    b = txnlog.delete_keys(spark, path, _keys(spark, [3]), ["id"])
    assert len(txnlog._read_manifest(path, b)["dv"]) == 1
    feed = txnlog.change_feed(spark, path, a, b, ["id"])
    assert [(r["id"], r["_change_type"]) for r in feed.collect()] \
        == [(3, "delete")]


def test_cdf_dv_dropped_dir_tombstones_not_double_counted(spark):
    """A dir tombstoned at A and REWRITTEN away before B: its
    A-dead rows must not surface as deletes (they were invisible at
    A already); only the merge's own change shows."""
    path, df = _table(spark, "t_cdf_drop")
    txnlog.delete_keys(spark, path, _keys(spark, [7]), ["id"])
    a = txnlog.latest_version(path)
    # merge rewrites dir 0 (id 8 lives there): id 7 stays dead
    up = spark.createDataFrame([(8, 2, 888)], ["id", "d", "v"])
    b = txnlog.merge_upsert(spark, path, up, ["id"])
    feed = txnlog.change_feed(spark, path, a, b, ["id"])
    got = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert got == {(8, "update_preimage"), (8, "update_postimage")}


def test_cdf_dv_update_where_lane_reads_as_update(spark):
    """update_where's DV lane (tombstone + append in ONE commit)
    must read back through CDF as update pre/post pairs."""
    path, df = _table(spark, "t_cdf_upd")
    a = txnlog.latest_version(path)
    b = txnlog.update_where(spark, path, "id = 77",
                            {"v": "v + 1"}, key_cols=["id"])
    assert txnlog._read_manifest(path, b)["meta"]["lane"] == "dv"
    feed = txnlog.change_feed(spark, path, a, b, ["id"])
    got = {(r["id"], r["_change_type"]): r["v"]
           for r in feed.collect()}
    assert got == {(77, "update_preimage"): 770,
                   (77, "update_postimage"): 771}


def test_feed_across_restore_shrink_refuses(spark):
    """r12 fix (ADVICE r11, medium): restore() carries dirs
    unchanged while reverting dv to an older, SMALLER pair set — a
    B-minus-A tombstone delta cannot express the resurrected rows,
    so the feed must refuse loudly instead of silently omitting
    them (the pre-r11 contract for feeds across a restore)."""
    path, df = _table(spark, "t_restore_shrink")
    v_before = txnlog.latest_version(path)
    dv_v = txnlog.delete_keys(spark, path, _keys(spark, [9, 21]),
                              ["id"])
    rv = txnlog.restore(path, v_before)
    # A post-delete, B post-restore: identical dirs, shrunken pairs
    with pytest.raises(ValueError, match="restore"):
        txnlog.change_feed(spark, path, dv_v, rv, ["id"]).collect()
    # endpoints with EQUAL dv (pre-delete → post-restore) are fine:
    # the states are identical and the feed is empty
    feed = txnlog.change_feed(spark, path, v_before, rv, ["id"])
    assert feed.count() == 0
    # growth across the same window still feeds exactly (guard only
    # fires on shrink): delete again after the restore
    dv2 = txnlog.delete_keys(spark, path, _keys(spark, [33]), ["id"])
    feed = txnlog.change_feed(spark, path, rv, dv2, ["id"])
    assert [(r["id"], r["_change_type"]) for r in feed.collect()] \
        == [(33, "delete")]
