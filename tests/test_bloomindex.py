"""Bloom directory index (operators/bloomindex.py): pruning skips
dirs that cannot match, never drops a matching row, stays
conservative without sidecars, and builds incrementally."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import bloomindex, txnlog

OUT = "/tmp/spark_graft_bloom_test"


@pytest.fixture()
def table(spark):
    """Three commits with DISJOINT id ranges (0-99 / 100-199 /
    200-299) — a point lookup should touch exactly one dir."""
    path = os.path.join(OUT, "t")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    txnlog.commit(df.where("id < 100"), path, "overwrite")
    txnlog.commit(df.where("id >= 100 and id < 200"), path, "append")
    txnlog.commit(df.where("id >= 200"), path, "append")
    return path, df


def test_prunes_to_one_dir(spark, table):
    path, _ = table
    built = bloomindex.build_bloom_index(spark, path, "id")
    assert len(built) == 3
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [7, 42])
    assert len(all_dirs) == 3
    # keys 7 and 42 live only in the first commit; the other two
    # dirs' bitmaps reject them (deterministic for fixed data+hash)
    assert len(kept) == 1


def test_no_false_negatives_full_sweep(spark, table):
    path, df = table
    bloomindex.build_bloom_index(spark, path, "id")
    # every key in the table must survive pruning — read equals the
    # plain filter for a probe drawn from all three ranges
    keys = [0, 99, 100, 199, 200, 299]
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", keys)
    got = sorted(r["id"] for r in
                 snap.where(F.col("id").isin(keys)).collect())
    assert got == keys
    kept, _ = bloomindex.prune_dirs(spark, path, "id", keys)
    assert len(kept) == 3  # one match per dir -> none skippable


def test_missing_sidecar_is_conservative(spark, table):
    path, df = table
    bloomindex.build_bloom_index(spark, path, "id")
    # a fourth commit WITHOUT an index build: its dir must always be
    # scanned even though no probe key lives there
    txnlog.commit(df.where("id = 0").select(
        (F.col("id") + 1000).alias("id"), "v"), path, "append")
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [7])
    assert len(all_dirs) == 4
    new_dir = all_dirs[-1]
    assert new_dir in kept  # unindexed -> conservative
    assert len(kept) == 2   # bloom still rejects dirs 2 and 3


def test_build_is_incremental_and_write_once(spark, table):
    path, _ = table
    first = bloomindex.build_bloom_index(spark, path, "id")
    assert len(first) == 3
    again = bloomindex.build_bloom_index(spark, path, "id")
    assert again == []  # sidecars are write-once; nothing rebuilt


def test_pruned_content_equals_plain_filter(spark, table):
    path, df = table
    bloomindex.build_bloom_index(spark, path, "id")
    keys = [5, 150]
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", keys)
    got = sorted((r["id"], r["v"]) for r in
                 snap.where(F.col("id").isin(keys)).collect())
    want = sorted((r["id"], r["v"]) for r in
                  df.where(F.col("id").isin(keys)).collect())
    assert got == want


def test_pack_bits_roundtrip_property():
    """Bitmap packing: exactly the given positions read back set —
    membership can neither lose a bit (false negative) nor invent
    one outside the set (spurious survivor beyond real collisions)."""
    import base64

    from hypothesis import given, settings
    from hypothesis import strategies as st

    m = bloomindex.BLOOM_M

    @settings(max_examples=200, deadline=None)
    @given(st.sets(st.integers(0, m - 1), max_size=300))
    def check(positions):
        packed = base64.b64decode(
            bloomindex._pack_bits(sorted(positions), m))
        assert all(bloomindex._bit_set(packed, p) for p in positions)
        others = {(p + 1) % m for p in positions} - positions
        assert not any(bloomindex._bit_set(packed, p) for p in others)

    check()


def test_empty_survivor_set_yields_schema_only(spark, table):
    path, _ = table
    bloomindex.build_bloom_index(spark, path, "id")
    # a key no dir holds: with high probability all bitmaps reject it
    # and the snapshot is an empty frame with the table schema
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", [10**9])
    assert snap.columns == ["id", "v"]
    assert snap.count() == 0
