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


def test_merge_carries_surviving_dirs_records(spark):
    """MERGE drops ONLY the rewritten dirs' records; untouched dirs
    keep theirs (the documented contract — dropping all would break
    metadata-only consumers after any single-row upsert)."""
    path = os.path.join(OUT, "t_merge_carry")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  analyze_cols=["v"])
    txnlog.commit(_df(spark, ROWS_B), path, "append",
                  analyze_cols=["v"])
    # upsert a key living only in the SECOND dir
    txnlog.merge_upsert(spark, path,
                        _df(spark, [(7, "y", "z")]), ["k"])
    recs = txnlog.analyze_stats(path)
    by_born = {r["version_born"]: r for r in recs}
    assert 0 in by_born, "untouched dir's record must survive MERGE"
    assert by_born[0]["rows"] == 4 and by_born[0]["nulls"] == 1
    assert 1 not in by_born, "rewritten dir's record must drop"


def test_clone_and_delete_lifecycle(spark):
    """shallow_clone re-keys records to the absolute source dirs
    (cloned bytes are identical, the profile stays valid);
    delete_keys drops records ONLY for dirs that gained tombstones
    (their visible rows no longer match the recorded profile)."""
    src = os.path.join(OUT, "t_clone_src")
    dst = os.path.join(OUT, "t_clone_dst")
    for p in (src, dst):
        shutil.rmtree(p, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), src, "overwrite",
                  analyze_cols=["v"])
    txnlog.commit(_df(spark, ROWS_B), src, "append",
                  analyze_cols=["v"])
    txnlog.shallow_clone(src, dst)
    recs = txnlog.analyze_stats(dst)
    assert len(recs) == 2
    assert all(os.path.isabs(r["dir"]) for r in recs)
    assert sorted(r["version_born"] for r in recs) == [0, 1]
    # delete a key from the FIRST dir only: its record drops, the
    # second dir's survives
    keys = spark.createDataFrame([(1,)], "k long")
    txnlog.delete_keys(spark, src, keys, ["k"])
    recs = {r["version_born"]: r for r in txnlog.analyze_stats(src)}
    assert 0 not in recs, "tombstoned dir's record must drop"
    assert recs[1]["rows"] == 3


def test_wide_version_dir_names_parse(spark, tmp_path):
    """version_born parses any digit width (data-v{version:08d}-
    grows past 8 digits at version >= 10^8) and clone-style absolute
    dir keys — metadata-only, exercised via a hand-written manifest."""
    import json as _json

    table = str(tmp_path / "wide")
    os.makedirs(os.path.join(table, "_txn"))
    man = {"version": 0, "mode": "overwrite", "dirs": [],
           "meta": {}, "stats": {}, "rows": {},
           "bloom_cols": [], "partition_by": [], "dv": [],
           "constraints": {},
           "analyze": {
               "data-v123456789-0000": {
                   "rows": 7, "cols": {"v": {"nulls": 1, "ndv": 3}}},
               "/abs/src/data-v00000002-0000": {
                   "rows": 9, "cols": {"v": {"nulls": 0, "ndv": 2}}},
           }}
    with open(os.path.join(table, "_txn", "v00000000.json"), "w") as fh:
        _json.dump(man, fh)
    recs = {r["version_born"]: r for r in txnlog.analyze_stats(table)}
    assert recs[123456789]["rows"] == 7
    assert recs[2]["rows"] == 9          # absolute clone-style key


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


def test_analyze_partition_column(spark):
    """analyze_cols ∩ partition_by works BY DESIGN: the partitioned
    layout keeps partition columns as ordinary data columns in the
    leaf files (the dir name is layout, not the value authority —
    _write_partitioned's shadow-column invariant), so the per-leaf
    ANALYZE job reads real values for them like any other column
    (adjudicates the r10 ADVICE claim that it would fail)."""
    path = os.path.join(OUT, "t_pcol")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, ROWS_A), path, "overwrite",
                  partition_by=["grp"], analyze_cols=["grp", "v"])
    recs = txnlog.analyze_stats(path)
    by_dir_col = {(r["dir"].rsplit("=", 1)[-1], r["col"]): r
                  for r in recs}
    # each leaf's grp record: NDV exactly 1 (one value per leaf, by
    # the dir-per-value invariant), zero nulls, rows = leaf rows
    gx = by_dir_col[("x", "grp")]
    gy = by_dir_col[("y", "grp")]
    assert (gx["ndv"], gx["nulls"], gx["rows"]) == (1, 0, 2)
    assert (gy["ndv"], gy["nulls"], gy["rows"]) == (1, 0, 2)
    # the ordinary column's profile rides alongside
    assert by_dir_col[("x", "v")]["nulls"] == 1
    assert by_dir_col[("y", "v")]["ndv"] == 2
