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


def test_vacuum_drops_sidecars_of_removed_dirs(spark, table):
    """VACUUM reclaims the bloom sidecars of the dirs it removes —
    dead index bytes must not accumulate with table churn."""
    path, _ = table
    bloomindex.build_bloom_index(spark, path, "id")
    root = os.path.join(path, "_txn", "bloom")
    assert len(os.listdir(root)) == 3
    # overwrite makes the three old dirs unreachable, vacuum drops
    # them and their sidecars together
    df2 = spark.range(5).select(F.col("id"), F.lit(0).alias("v"))
    txnlog.commit(df2, path, "overwrite")
    removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0.0)
    assert len(removed) == 3
    assert os.listdir(root) == []
    # the live table still reads fine
    assert txnlog.snapshot(spark, path).count() == 5


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


def test_int_typed_column_has_no_false_negatives(spark):
    """xxhash64 hashes INT and LONG differently — probe values must
    cast to the column's parquet type, not Python inference's LONG,
    or every indexed dir gets pruned (regression)."""
    path = os.path.join(OUT, "t_int")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).alias("v"))
    txnlog.commit(df.where("id < 50"), path, "overwrite")
    txnlog.commit(df.where("id >= 50"), path, "append")
    bloomindex.build_bloom_index(spark, path, "id")
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [7, 80])
    assert len(all_dirs) == 2
    assert len(kept) == 2  # one probe key lives in each dir
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", [7, 80])
    got = sorted(r["id"] for r in
                 snap.where(F.col("id").isin([7, 80])).collect())
    assert got == [7, 80]


def test_mixed_bitmap_sizes_probe_correctly(spark, table):
    """Sidecars with different m coexist (the sizing rule says pass m
    per table as dirs grow): probes must be recomputed per (m, k),
    keyed on the CACHED parameters, not the module defaults."""
    path, df = table
    # index the existing three dirs at a custom size...
    built = bloomindex.build_bloom_index(spark, path, "id", m=1 << 16)
    assert len(built) == 3
    # ...then append a fourth commit indexed at the default size
    txnlog.commit(df.where("id = 5").select(
        (F.col("id") + 500).alias("id"), "v"), path, "append")
    built2 = bloomindex.build_bloom_index(spark, path, "id")
    assert len(built2) == 1
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id",
                                           [7, 505])
    assert len(all_dirs) == 4
    # key 7 -> dir 1 (m=65536 bitmap), key 505 -> dir 4 (m=32768)
    assert all_dirs[0] in kept and all_dirs[-1] in kept
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id",
                                            [7, 505])
    got = sorted(r["id"] for r in
                 snap.where(F.col("id").isin([7, 505])).collect())
    assert got == [7, 505]


def test_clone_sidecars_stay_inside_clone(spark, table):
    """A shallow clone's manifest holds ABSOLUTE dir paths; the
    sidecar name must encode them so the index lands under the
    CLONE's _txn/bloom, never inside the source table root (where a
    stray data-v*-named file would disturb the source's vacuum)."""
    path, df = table
    clone = os.path.join(OUT, "clone")
    shutil.rmtree(clone, ignore_errors=True)
    txnlog.shallow_clone(path, clone)
    built = bloomindex.build_bloom_index(spark, clone, "id")
    assert len(built) == 3
    # every sidecar lives under the clone; the source root gained no
    # stray entries and its vacuum still runs clean
    root = os.path.join(clone, "_txn", "bloom")
    assert len(os.listdir(root)) == 3
    assert not [e for e in os.listdir(path)
                if e.endswith(".json") and e.startswith("data-v")]
    txnlog.vacuum(path, grace_seconds=0.0)
    kept, all_dirs = bloomindex.prune_dirs(spark, clone, "id", [7])
    assert len(kept) == 1 and len(all_dirs) == 3
    snap = bloomindex.bloom_pruned_snapshot(spark, clone, "id", [7])
    assert [r["id"] for r in snap.where("id = 7").collect()] == [7]


def test_empty_probe_list_keeps_nothing(spark, table):
    """An empty IN-list matches no row — kept must be empty, not a
    crash in probe-position inference."""
    path, _ = table
    bloomindex.build_bloom_index(spark, path, "id")
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [])
    assert kept == [] and len(all_dirs) == 3


def test_empty_survivor_set_yields_schema_only(spark, table):
    path, _ = table
    bloomindex.build_bloom_index(spark, path, "id")
    # a key no dir holds: with high probability all bitmaps reject it
    # and the snapshot is an empty frame with the table schema
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", [10**9])
    assert snap.columns == ["id", "v"]
    assert snap.count() == 0


# ------------------------------------------------- commit-time index

def test_commit_time_bloom_needs_no_explicit_build(spark):
    """txnlog.commit(bloom_cols=[...]) builds the sidecars AT COMMIT
    — no separate backfit pass — and appends inherit the declaration
    from the parent manifest, so the index is always-on."""
    path = os.path.join(OUT, "t_commit")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 5).alias("v"))
    txnlog.commit(df.where("id < 100"), path, "overwrite",
                  bloom_cols=["id"])
    # declared once: the append does NOT re-declare, yet gets indexed
    txnlog.commit(df.where("id >= 100"), path, "append")
    root = os.path.join(path, "_txn", "bloom")
    assert len(os.listdir(root)) == 2  # one sidecar per dir, no build call
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [7])
    assert len(all_dirs) == 2 and len(kept) == 1
    snap = bloomindex.bloom_pruned_snapshot(spark, path, "id", [7])
    assert [r["id"] for r in snap.where("id = 7").collect()] == [7]


def test_commit_time_bloom_is_incremental(spark):
    """The Nth append indexes ONLY its new dir: existing sidecars are
    write-once and their bytes are untouched by later commits."""
    path = os.path.join(OUT, "t_incr")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select(F.col("id"), F.lit(1).alias("v"))
    txnlog.commit(df.where("id < 100"), path, "overwrite",
                  bloom_cols=["id"])
    root = os.path.join(path, "_txn", "bloom")
    first = os.listdir(root)
    assert len(first) == 1
    stamp0 = os.stat(os.path.join(root, first[0])).st_mtime_ns
    txnlog.commit(df.where("id >= 100 and id < 200"), path, "append")
    txnlog.commit(df.where("id >= 200"), path, "append")
    assert len(os.listdir(root)) == 3
    # the first dir's sidecar was not rebuilt (same mtime -> no write)
    assert os.stat(os.path.join(root, first[0])).st_mtime_ns == stamp0


def test_per_dir_dtype_drift_has_no_false_negatives(spark):
    """Schema evolution can leave dirs with DIFFERENT physical types
    for the same column (int -> bigint).  Each sidecar records the
    dtype it hashed; probes must hash per-dir at that dtype — a
    single probe set hashed at dir 0's type would silently prune the
    drifted dir (regression for the r6 advice item)."""
    path = os.path.join(OUT, "t_drift")
    shutil.rmtree(path, ignore_errors=True)
    a = spark.range(50).select(F.col("id").cast("int").alias("id"))
    b = spark.range(50, 100).select(
        F.col("id").cast("bigint").alias("id"))
    txnlog.commit(a, path, "overwrite", bloom_cols=["id"])
    txnlog.commit(b, path, "append")
    sides = sorted(os.listdir(os.path.join(path, "_txn", "bloom")))
    dts = set()
    for s in sides:
        import json as _json
        with open(os.path.join(path, "_txn", "bloom", s)) as fh:
            dts.add(_json.load(fh)["dtype"])
    assert dts == {"int", "bigint"}
    # a key living in EACH dir must keep that dir alive
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [7, 80])
    assert len(all_dirs) == 2 and len(kept) == 2
    kept1, _ = bloomindex.prune_dirs(spark, path, "id", [80])
    assert len(kept1) == 1  # and pruning still actually prunes


def test_absent_column_dir_prunes_without_row_loss(spark):
    """A dir written before a column existed holds only NULLs for it:
    an IN-list can never match there, so its 'absent' sidecar prunes
    the dir outright — and the empty-survivor snapshot carries the
    FULL multi-dir schema, not dir 0's narrower one."""
    path = os.path.join(OUT, "t_absent")
    shutil.rmtree(path, ignore_errors=True)
    old = spark.range(10).select(F.col("id"))
    new = spark.range(10, 20).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("key"))
    txnlog.commit(old, path, "overwrite", bloom_cols=["key"])
    txnlog.commit(new, path, "append")
    kept, all_dirs = bloomindex.prune_dirs(
        spark, path, "key", ["k15"])
    assert len(all_dirs) == 2
    assert len(kept) == 1  # the pre-evolution dir is skipped safely
    empty = bloomindex.bloom_pruned_snapshot(
        spark, path, "key", ["nowhere"])
    assert sorted(empty.columns) == ["id", "key"]  # full union schema
    assert empty.count() == 0


def test_merge_prunes_by_bloom_on_envelope_useless_key(spark):
    """MERGE through the bloom index (r6 verdict ask): dirs whose key
    envelopes all span the FULL key range (high-cardinality key,
    interleaved commits) defeat min/max pruning — the bloom probe
    must still narrow the rewrite to the dirs actually holding the
    updated keys."""
    path = os.path.join(OUT, "t_merge_bloom")
    shutil.rmtree(path, ignore_errors=True)
    # three dirs, each spanning ~the whole key range (id % 3 split)
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    txnlog.commit(df.where("id % 3 = 0"), path, "overwrite",
                  stats_cols=["id"], bloom_cols=["id"])
    txnlog.commit(df.where("id % 3 = 1"), path, "append",
                  stats_cols=["id"])
    txnlog.commit(df.where("id % 3 = 2"), path, "append",
                  stats_cols=["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    # premise: the envelope test alone keeps everything for key 150
    assert all(txnlog._overlaps(man["stats"], d, "id", 150, 150)
               for d in man["dirs"])
    before = list(man["dirs"])
    up = spark.createDataFrame([(150, 999)], ["id", "v"])
    txnlog.merge_upsert(spark, path, up, ["id"])
    man2 = txnlog._read_manifest(path, txnlog.latest_version(path))
    # key 150 lives in the id%3==0 dir only: exactly one dir rewrote
    assert man2["meta"]["rewrote"] == [before[0]]
    got = txnlog.snapshot(spark, path).where("id = 150").collect()
    assert [(r["id"], r["v"]) for r in got] == [(150, 999)]
    assert txnlog.snapshot(spark, path).count() == 300


def test_bloom_declaration_survives_overwrite(spark):
    """bloom_cols is a TABLE PROPERTY (Delta's bloom index config):
    a routine full-refresh overwrite must keep indexing — dropping
    the declaration on overwrite would silently stop building
    sidecars for every later commit."""
    path = os.path.join(OUT, "t_prop")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(100).select(F.col("id"), F.lit(1).alias("v"))
    txnlog.commit(df.where("id < 50"), path, "overwrite",
                  bloom_cols=["id"])
    txnlog.commit(df, path, "overwrite")          # full refresh
    txnlog.commit(df.where("id < 10").select(
        (F.col("id") + 1000).alias("id"), "v"), path, "append")
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["bloom_cols"] == ["id"]
    # both live dirs (refresh + append) are indexed
    kept, all_dirs = bloomindex.prune_dirs(spark, path, "id", [1005])
    assert len(all_dirs) == 2
    assert len(kept) == 1


def test_clone_resolves_source_sidecars_without_reindex(spark, table):
    """A shallow clone references the source's immutable dirs by
    absolute path: the source's write-once sidecars describe exactly
    those bytes, so the clone must PRUNE through them with zero
    local sidecars and zero rebuild jobs."""
    path, _ = table
    bloomindex.build_bloom_index(spark, path, "id")
    clone = os.path.join(OUT, "clone_resolve")
    shutil.rmtree(clone, ignore_errors=True)
    txnlog.shallow_clone(path, clone)
    # no local index, and a build call finds nothing to do
    assert bloomindex.build_bloom_index(spark, clone, "id") == []
    assert not os.path.isdir(os.path.join(clone, "_txn", "bloom")) or \
        os.listdir(os.path.join(clone, "_txn", "bloom")) == []
    kept, all_dirs = bloomindex.prune_dirs(spark, clone, "id", [7])
    assert len(all_dirs) == 3
    assert len(kept) == 1          # pruned via the SOURCE's sidecars
    snap = bloomindex.bloom_pruned_snapshot(spark, clone, "id", [7])
    assert [r["id"] for r in snap.where("id = 7").collect()] == [7]
    # the union gate resolves the same way (streaming seed on a clone)
    groups, complete = bloomindex.union_bitmaps(clone, "id")
    assert complete and len(groups) == 1


def test_union_words_signed_conversion_property():
    """union_bitmaps packs the OR'd bitmap into SIGNED 64-bit words
    (Spark bigint): for every position, getbit's two's-complement bit
    view of the signed word must equal the original packed bit —
    including the sign bit (p % 64 == 63) and all-set words."""
    import base64

    from hypothesis import given, settings
    from hypothesis import strategies as st

    m = bloomindex.BLOOM_M

    @settings(max_examples=150, deadline=None)
    @given(st.sets(st.integers(0, m - 1), max_size=300))
    def check(positions):
        packed = base64.b64decode(
            bloomindex._pack_bits(sorted(positions), m))
        words = []
        for w in range(0, len(packed), 8):
            u = int.from_bytes(packed[w:w + 8], "little")
            words.append(u - (1 << 64) if u >= (1 << 63) else u)
        probe = set(positions) | {(p + 63) % m for p in positions} \
            | {0, 63, m - 1}
        for p in probe:
            signed = words[p // 64]
            bit = ((signed % (1 << 64)) >> (p % 64)) & 1
            assert bit == (1 if p in positions else 0)

    check()


def test_point_set_seam_conjoins_envelope_and_bloom(spark):
    """txnlog.prune_point_set — the ONE seam MERGE's candidate probe,
    delete_keys, and bloom_pruned_snapshot all route through:
    per-VALUE envelope test (tighter than a [min,max] range over the
    probe set) conjoined with the bloom sidecar probe."""
    path = os.path.join(OUT, "t_seam")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(300).select("id")
    kw = dict(stats_cols=["id"], bloom_cols=["id"])
    # dir0: 0-99 dense; dir1: 100-198 EVEN only; dir2: 200-299 dense
    txnlog.commit(df.where("id < 100"), path, "overwrite", **kw)
    txnlog.commit(df.where("id >= 100 and id < 200 and id % 2 = 0"),
                  path, "append", **kw)
    txnlog.commit(df.where("id >= 200"), path, "append", **kw)
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    d0, d1, d2 = man["dirs"]

    # per-value envelope tightness: {50, 250} misses dir1 even though
    # the probe-set RANGE [50, 250] covers dir1's [100, 198] envelope
    kept, all_dirs = txnlog.prune_point_set(
        spark, path, "id", [50, 250])
    assert all_dirs == [d0, d1, d2]
    assert kept == [d0, d2]

    # conjunction: 151 sits INSIDE dir1's envelope but dir1 holds
    # only even ids — the bloom probe rejects what the envelope
    # cannot (deterministic for fixed data + xxhash64)
    kept2, _ = txnlog.prune_point_set(spark, path, "id", [151, 250])
    assert kept2 == [d2]
    # and the seam-backed snapshot read still finds every real row
    snap = bloomindex.bloom_pruned_snapshot(
        spark, path, "id", [151, 250])
    assert [r["id"] for r in
            snap.where("id in (151, 250)").collect()] == [250]

    # NULL probe semantics: IN-list lookups drop NULLs; null-safe
    # (delete/merge) probes stand the whole prune down
    kept3, _ = txnlog.prune_point_set(spark, path, "id", [None, 250])
    assert kept3 == [d2]
    kept4, _ = txnlog.prune_point_set(
        spark, path, "id", [None, 250], null_safe=True)
    assert kept4 == [d0, d1, d2]
    # all-NULL, non-null-safe: IN matches nothing
    kept5, _ = txnlog.prune_point_set(spark, path, "id", [None])
    assert kept5 == []
    # empty probe set matches nothing
    kept6, _ = txnlog.prune_point_set(spark, path, "id", [])
    assert kept6 == []

    # MERGE routes through the seam: upserting key 250 rewrites ONLY
    # dir2 (dir1's envelope covers nothing probed; dir0 envelope-
    # pruned)
    up = spark.createDataFrame([(250,)], "id long")
    txnlog.merge_upsert(spark, path, up, ["id"])
    man2 = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man2["meta"]["rewrote"] == [d2]
