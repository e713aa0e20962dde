"""Torn-write detection (operators/txnlog.py manifest checksums):
every commit records a content checksum over its manifest body;
reads recompute and REFUSE a corrupt-but-parseable manifest
(TornManifest) — completing the r9 unparseable-manifest re-raise so
neither corruption class can silently serve a wrong table state.
Pre-r10 manifests (no checksum field) still read."""

from __future__ import annotations

import json
import os

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.operators.txnlog import TornManifest


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _two_versions(spark, path):
    txnlog.commit(_df(spark, [(1, 10)]), path, "overwrite")
    txnlog.commit(_df(spark, [(2, 20)]), path, "append")


def _tamper(path, version, mutate):
    mp = txnlog._manifest_path(path, version)
    man = json.load(open(mp))
    mutate(man)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(man, fh)


def test_checksum_written_and_roundtrips(spark, tmp_path):
    path = str(tmp_path / "t")
    _two_versions(spark, path)
    for v in (0, 1):
        man = json.load(open(txnlog._manifest_path(path, v)))
        assert man["checksum"] == txnlog._manifest_checksum(man)
        txnlog._read_manifest(path, v)  # verify passes


def test_parseable_corruption_refuses_loudly(spark, tmp_path):
    # a bit-flip that keeps valid JSON (dir list truncated) must NOT
    # serve: reads and version resolution all refuse
    path = str(tmp_path / "t")
    _two_versions(spark, path)
    _tamper(path, 1, lambda m: m.__setitem__("dirs", m["dirs"][:0]))
    with pytest.raises(TornManifest):
        txnlog._read_manifest(path, 1)
    with pytest.raises(TornManifest):
        txnlog.latest_version(path)
    with pytest.raises(TornManifest):
        txnlog.snapshot(spark, path, version=1).count()
    # v0 is intact and still reads when pinned explicitly
    assert txnlog.snapshot(spark, path, version=0).count() == 1


def test_meta_field_corruption_detected(spark, tmp_path):
    # even a "harmless" field counts: the checksum covers the body
    path = str(tmp_path / "t")
    _two_versions(spark, path)
    _tamper(path, 0,
            lambda m: m.__setitem__("committed_at",
                                    m["committed_at"] + 5.0))
    with pytest.raises(TornManifest):
        txnlog.snapshot(spark, path, version=0).count()


def test_pre_checksum_manifest_still_reads(spark, tmp_path):
    path = str(tmp_path / "t")
    _two_versions(spark, path)
    _tamper(path, 1, lambda m: m.pop("checksum"))
    assert txnlog.latest_version(path) == 1
    assert txnlog.snapshot(spark, path).count() == 2


def test_tampered_pre_checksum_manifest_is_the_known_gap(spark,
                                                         tmp_path):
    # documented residual risk: with the checksum stripped, content
    # tampering is undetectable (legacy manifests) — the read must
    # still SUCCEED (no false refusal); new commits always carry the
    # field, shrinking the gap to pre-r10 history
    path = str(tmp_path / "t")
    _two_versions(spark, path)

    def strip_and_bump(m):
        m.pop("checksum")
        m["mode"] = "append"

    _tamper(path, 1, strip_and_bump)
    assert txnlog.latest_version(path) == 1


def test_torn_mid_history_resolution_skips_not_bricks(spark, tmp_path):
    """A single rotted OLD manifest must not disable AS OF travel
    table-wide: timestamp resolution and history() treat the torn
    version like a vacuumed one (skip, keep the running max from
    neighbors) while SERVING it still refuses loudly."""
    path = str(tmp_path / "t")
    txnlog.commit(_df(spark, [(1, 10)]), path, "overwrite")
    txnlog.commit(_df(spark, [(2, 20)]), path, "append")
    txnlog.commit(_df(spark, [(3, 30)]), path, "append")
    t0 = txnlog.commit_time(path, 0)
    t2 = txnlog.commit_time(path, 2)
    _tamper(path, 1, lambda m: m.__setitem__("dirs", m["dirs"][:1]))
    # resolutions targeting intact versions keep working
    assert txnlog.version_at_timestamp(path, t2) == 2
    assert txnlog.version_at_timestamp(path, t2 + 60) == 2
    assert txnlog.version_at_timestamp(path, t0) == 0
    # a timestamp in the torn version's window serves the intact
    # predecessor (same rule as a vacuumed version)
    assert txnlog.version_at_timestamp(
        path, (t0 + t2) / 2.0) in (0, 2)
    # the torn version itself still refuses to SERVE
    with pytest.raises(TornManifest):
        txnlog.snapshot(spark, path, version=1).count()
    # history skips the torn row, serves the rest
    vs = [r["version"]
          for r in txnlog.history(spark, path).collect()]
    assert vs == [2, 0]
    # snapshot(as_of_ts=...) composes end to end
    assert txnlog.snapshot(
        spark, path, as_of_ts=t2).count() == 3
