"""Timestamp-index checkpoint (operators/txnlog.py
_maybe_write_ts_index / version_at_timestamp fast path): every K-th
commit rolls the adjusted commit-time array into _txn/ts-index.json;
resolution binary-searches it and walks only the tail — and the
index is ADVISORY: corrupt, stale, or vacuum-invalidated state falls
back to the full walk with identical answers."""

from __future__ import annotations

import json
import os

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog


@pytest.fixture(autouse=True)
def small_interval(monkeypatch):
    monkeypatch.setattr(txnlog, "TS_INDEX_INTERVAL", 4)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _build(spark, path, n):
    times = []
    for i in range(n):
        txnlog.commit(_df(spark, [(i, i)]), path,
                      "overwrite" if i == 0 else "append")
        times.append(txnlog.commit_time(path, i))
    return times


def test_index_written_and_resolution_matches_walk(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _build(spark, path, 10)  # checkpoints at v4 and v8
    idx = txnlog._load_ts_index(path)
    assert idx is not None and idx["base"] == 0 and idx["upto"] == 8
    assert len(idx["times"]) == 9
    # index-resolved answers == full-walk answers at every boundary
    for v in range(10):
        assert txnlog.version_at_timestamp(path, t[v]) == v
    assert txnlog.version_at_timestamp(path, t[9] + 99) == 9
    assert txnlog.version_at_timestamp(path, (t[6] + t[7]) / 2) == 6
    with pytest.raises(ValueError):
        txnlog.version_at_timestamp(path, t[0] - 1.0)


def test_corrupt_index_falls_back(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _build(spark, path, 6)
    with open(txnlog._ts_index_path(path), "w") as fh:
        fh.write('{"base": 0, "upto": [BROKEN')
    for v in range(6):
        assert txnlog.version_at_timestamp(path, t[v]) == v
    # a LYING-but-well-formed index (times shifted) is out of scope:
    # the shape check only guards structure.  A stale-but-valid one
    # (upto behind latest) must still answer through the tail walk:
    with open(txnlog._ts_index_path(path), "w") as fh:
        json.dump({"base": 0, "upto": 2, "times": t[:3]}, fh)
    assert txnlog.version_at_timestamp(path, t[5]) == 5


def test_vacuumed_candidate_falls_back(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _build(spark, path, 10)
    txnlog.vacuum(path, keep_latest=3, grace_seconds=0)
    assert not os.path.exists(txnlog._manifest_path(path, 4))
    # the index still covers v0..v8, but only v7..v9 are retained:
    # an in-index candidate that was vacuumed falls back to the
    # retained-history walk
    assert txnlog.version_at_timestamp(path, t[9]) == 9
    assert txnlog.version_at_timestamp(path, t[7]) == 7
    with pytest.raises(ValueError, match="retained history"):
        txnlog.version_at_timestamp(path, t[5])


def test_index_extends_incrementally(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path, 5)  # checkpoint at v4
    first = txnlog._load_ts_index(path)
    assert first["upto"] == 4
    for i in range(5, 9):
        txnlog.commit(_df(spark, [(i, i)]), path, "append")
    ext = txnlog._load_ts_index(path)
    assert ext["upto"] == 8 and ext["times"][:5] == first["times"]
