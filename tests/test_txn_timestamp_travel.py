"""Timestamp-based time travel (operators/txnlog.py
version_at_timestamp / snapshot(as_of_ts=) / restore(as_of_ts=)):
latest-at-or-before resolution, refusal before v0 (the
fabricated-history failure mode, pinned per the r9 verdict ask),
mtime fallback for pre-r10 manifests, and the monotone adjustment
for clock-skewed commit times."""

from __future__ import annotations

import json
import os

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _three_versions(spark, path):
    txnlog.commit(_df(spark, [(1, 10)]), path, "overwrite")
    txnlog.commit(_df(spark, [(2, 20)]), path, "append")
    txnlog.commit(_df(spark, [(3, 30)]), path, "overwrite")
    return [txnlog.commit_time(path, v) for v in range(3)]


def test_resolution_latest_at_or_before(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    assert t[0] < t[1] < t[2]  # wall clock moved between commits
    for v in range(3):
        assert txnlog.version_at_timestamp(path, t[v]) == v
    assert txnlog.version_at_timestamp(path, (t[1] + t[2]) / 2) == 1
    assert txnlog.version_at_timestamp(path, t[2] + 9999) == 2
    # the resolved read serves that version's content
    got = {(r["id"], r["v"]) for r in
           txnlog.snapshot(spark, path, as_of_ts=t[1]).collect()}
    assert got == {(1, 10), (2, 20)}


def test_pre_epoch_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    with pytest.raises(ValueError, match="precedes the retained"):
        txnlog.version_at_timestamp(path, t[0] - 1.0)
    with pytest.raises(ValueError):
        txnlog.snapshot(spark, path, as_of_ts=t[0] - 1.0)
    with pytest.raises(ValueError):
        txnlog.restore(path, as_of_ts=t[0] - 1.0)


def test_restore_as_of_ts(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    v = txnlog.restore(path, as_of_ts=(t[1] + t[2]) / 2)
    assert v == 3
    got = {(r["id"], r["v"]) for r in
           txnlog.snapshot(spark, path).collect()}
    assert got == {(1, 10), (2, 20)}
    with pytest.raises(ValueError):
        txnlog.restore(path)  # neither selector
    with pytest.raises(ValueError):
        txnlog.restore(path, 1, as_of_ts=t[1])  # both selectors


def test_version_and_ts_mutually_exclusive(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    with pytest.raises(ValueError, match="not both"):
        txnlog.snapshot(spark, path, version=1, as_of_ts=t[1])


def test_mtime_fallback_pre_r10_manifest(spark, tmp_path):
    # a manifest without committed_at (pre-r10) resolves by file
    # mtime — Delta's own mechanism for its log entries
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    mp = txnlog._manifest_path(path, 1)
    man = json.load(open(mp))
    del man["committed_at"]
    del man["checksum"]  # pre-r10 manifests predate checksums too
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)
    os.utime(mp, (t[1], t[1]))  # pin mtime to the original time
    assert abs(txnlog.commit_time(path, 1) - t[1]) < 1e-3
    assert txnlog.version_at_timestamp(path, (t[1] + t[2]) / 2) == 1


def test_monotone_adjustment_for_clock_skew(spark, tmp_path):
    # v1's recorded time is (artificially) AFTER v2's: the running
    # max must stop v2 from resolving before its parent
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    mp = txnlog._manifest_path(path, 1)
    man = json.load(open(mp))
    man["committed_at"] = t[2] + 100.0
    man["checksum"] = txnlog._manifest_checksum(man)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)
    # between t2 and the skewed t1: neither v1 nor v2 is served yet
    assert txnlog.version_at_timestamp(path, t[2]) == 0
    # past the skewed time both become visible, latest wins
    assert txnlog.version_at_timestamp(path, t[2] + 101.0) == 2


def test_bad_timestamp_types(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_versions(spark, path)
    with pytest.raises(TypeError):
        txnlog.version_at_timestamp(path, True)
    with pytest.raises(TypeError):
        txnlog.version_at_timestamp(path, [1, 2])
    # ISO string parses
    import datetime as dt

    iso = dt.datetime.now().isoformat()
    assert txnlog.version_at_timestamp(path, iso) == 2


def test_change_feed_by_timestamp(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    # v0 → v1 was an append of (2, 20): the ts-cut feed sees it
    feed = txnlog.change_feed(spark, path, key_cols=["id"],
                              from_ts=t[0], to_ts=(t[1] + t[2]) / 2)
    got = {(r["id"], r["v"], r["_change_type"]) for r in feed.collect()}
    assert got == {(2, 20, "insert")}
    # endpoint forms are mutually exclusive per endpoint
    with pytest.raises(ValueError):
        txnlog.change_feed(spark, path, from_version=0, from_ts=t[0],
                           to_version=1, key_cols=["id"])
    with pytest.raises(ValueError):
        txnlog.change_feed(spark, path, from_version=0, key_cols=["id"])


def test_vacuumed_history_resolves_from_earliest_retained(spark,
                                                          tmp_path):
    """A vacuumed table loses its oldest manifests: timestamp
    resolution and history() must serve the RETAINED range instead
    of crashing on the missing files, and a timestamp older than the
    earliest retained commit refuses with the retention message."""
    path = str(tmp_path / "t")
    t = _three_versions(spark, path)
    txnlog.vacuum(path, keep_latest=2, grace_seconds=0)
    assert not os.path.exists(txnlog._manifest_path(path, 0))
    assert txnlog.version_at_timestamp(path, t[2]) == 2
    assert txnlog.version_at_timestamp(path, t[1]) == 1
    with pytest.raises(ValueError, match="retained history"):
        txnlog.version_at_timestamp(path, t[1] - 0.5)
    h = txnlog.history(spark, path).collect()
    assert [r["version"] for r in h] == [2, 1]
    got = {(r["id"], r["v"]) for r in
           txnlog.snapshot(spark, path, as_of_ts=t[1]).collect()}
    assert got == {(1, 10), (2, 20)}
