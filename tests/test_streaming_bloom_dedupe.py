"""Bloom-seeded streaming dedupe (streaming/lane.py
run_bloom_seeded_dedupe): corpus members drop, new events pass, a
FORCED bloom false positive is rescued by the verify lookup instead of
being dropped, and the union-bitmap gate agrees with per-dir pruning.
Plus reset_stream_high_for_replay: stream replay after a restore."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import bloomindex, txnlog

OUT = "/tmp/spark_graft_bloomded_test"


def _mk_events(spark, ids):
    return spark.createDataFrame(
        [(int(i), i % 7, f"t{i % 3}", float(i), "{}") for i in ids],
        "event_id bigint, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn(
        "ts", F.timestamp_micros(
            (F.lit(1704067200) + F.col("event_id")) * 1_000_000))


def _stage_feed(spark, df, name):
    src = os.path.join(OUT, name)
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(src + "_stage", ignore_errors=True)
    df.coalesce(1).write.mode("overwrite").parquet(src + "_stage")
    os.makedirs(src)
    import glob

    [pf] = glob.glob(os.path.join(src + "_stage", "part-*.parquet"))
    os.rename(pf, os.path.join(src, "000.parquet"))
    return src


@pytest.fixture()
def corpus(spark):
    """Txn corpus holding event_ids 0..199 with commit-time blooms."""
    path = os.path.join(OUT, "corpus")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(
        spark.range(100).select(F.col("id").alias("event_id")),
        path, "overwrite", bloom_cols=["event_id"])
    txnlog.commit(
        spark.range(100, 200).select(F.col("id").alias("event_id")),
        path, "append")
    return path


def test_union_gate_agrees_with_membership(spark, corpus):
    """The folded union-bitmap expression must pass every member
    (no false negative, ever) and reject the bulk of non-members."""
    groups, complete = bloomindex.union_bitmaps(corpus, "event_id")
    assert complete and len(groups) == 1
    gate = bloomindex.bloom_maybe_expr("event_id", groups)
    probe = spark.range(1000).select(F.col("id").alias("event_id"))
    got = probe.withColumn("maybe", gate).collect()
    members = [r for r in got if r["event_id"] < 200]
    outsiders = [r for r in got if r["event_id"] >= 200]
    assert all(r["maybe"] for r in members)          # zero false negs
    fp = sum(1 for r in outsiders if r["maybe"])
    assert fp < len(outsiders) * 0.05                # gate really gates


def test_stream_drops_corpus_keeps_new_and_in_stream_dups(
        spark, corpus):
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_bloom_seeded_dedupe)

    # feed: 50 corpus members + 30 new events, new ones duplicated
    feed = _mk_events(spark, list(range(150, 200))      # in corpus
                      + list(range(500, 530)) * 2)      # new, dup'd
    src = _stage_feed(spark, feed, "feed1")
    out = os.path.join(OUT, "run1")
    shutil.rmtree(out, ignore_errors=True)
    got = run_bloom_seeded_dedupe(
        spark, "/root/testdata/sf0.001", out, corpus, source_dir=src)
    ids = sorted(r["event_id"] for r in got.select("event_id").collect())
    assert ids == list(range(500, 530))  # corpus dropped, dups deduped


def test_forced_false_positive_is_rescued_not_dropped(spark, corpus):
    """THE hazard this design exists for: find a key that is NOT in
    the corpus but whose k bits are all set in the union bitmap (a
    real bloom false positive), stream it, and assert the verify
    lookup rescues it into the output."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_bloom_seeded_dedupe)

    groups, complete = bloomindex.union_bitmaps(corpus, "event_id")
    assert complete
    gate = bloomindex.bloom_maybe_expr("event_id", groups)
    # scan outsider candidates until one false-positives the gate
    cand = spark.range(10_000, 300_000).select(
        F.col("id").alias("event_id"))
    fps = (cand.withColumn("maybe", gate).where("maybe")
           .limit(1).collect())
    assert fps, "no false positive found — enlarge the candidate scan"
    fp_key = fps[0]["event_id"]
    assert fp_key >= 200  # genuinely not in the corpus

    feed = _mk_events(spark, [150, fp_key])  # one member + the FP
    src = _stage_feed(spark, feed, "feed_fp")
    out = os.path.join(OUT, "run_fp")
    shutil.rmtree(out, ignore_errors=True)
    got = run_bloom_seeded_dedupe(
        spark, "/root/testdata/sf0.001", out, corpus, source_dir=src)
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [fp_key]  # member dropped, FP RESCUED by verify


def test_incomplete_sidecars_disable_gate_conservatively(spark):
    """A corpus dir without sidecars (indexed after the fact, crash
    between commit and index) must disable the gate — every row
    verifies, none is wrongly passed through as 'provably new'."""
    path = os.path.join(OUT, "corpus_nogate")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(
        spark.range(50).select(F.col("id").alias("event_id")),
        path, "overwrite")  # NO bloom_cols
    groups, complete = bloomindex.union_bitmaps(path, "event_id")
    assert not complete and groups == []

    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_bloom_seeded_dedupe)

    feed = _mk_events(spark, [10, 999])
    src = _stage_feed(spark, feed, "feed_ng")
    out = os.path.join(OUT, "run_ng")
    shutil.rmtree(out, ignore_errors=True)
    got = run_bloom_seeded_dedupe(
        spark, "/root/testdata/sf0.001", out, path, source_dir=src)
    assert sorted(r["event_id"] for r in got.collect()) == [999]


def test_reset_stream_high_enables_replay_after_restore(spark):
    """txnlog.restore() rolls stream batches back but the exactly-once
    watermark survives (documented continuing-stream default) — the
    replay helper must rewind it so redelivered batches re-land."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        _commit_raw_batch, _committed_batch_high,
        reset_stream_high_for_replay)

    table = os.path.join(OUT, "replay")
    shutil.rmtree(table, ignore_errors=True)
    b0 = spark.range(10).select(F.col("id"))
    b1 = spark.range(10, 30).select(F.col("id"))
    _commit_raw_batch(table, b0.withColumn(
        "ts", F.timestamp_micros(F.lit(0))), 0)
    v_after_b0 = txnlog.latest_version(table)
    _commit_raw_batch(table, b1.withColumn(
        "ts", F.timestamp_micros(F.lit(0))), 1)
    assert txnlog.snapshot(spark, table).count() == 30

    txnlog.restore(table, v_after_b0)  # roll batch 1 back
    assert txnlog.snapshot(spark, table).count() == 10
    # continuing-stream default: batch 1 stays skipped
    assert _committed_batch_high(table) == 1
    _commit_raw_batch(table, b1.withColumn(
        "ts", F.timestamp_micros(F.lit(0))), 1)
    assert txnlog.snapshot(spark, table).count() == 10

    high = reset_stream_high_for_replay(table)
    assert high == 0
    assert _committed_batch_high(table) == 0
    # the reset's metadata commit must CARRY the archive's
    # partition_by property (archive commits partition by __date) —
    # dropping it would flatten the table on the next maintenance op
    man = txnlog._read_manifest(table, txnlog.latest_version(table))
    assert man["partition_by"] == ["__date"]
    _commit_raw_batch(table, b1.withColumn(
        "ts", F.timestamp_micros(F.lit(0))), 1)  # replay re-lands
    assert txnlog.snapshot(spark, table).count() == 30
    man2 = txnlog._read_manifest(table, txnlog.latest_version(table))
    assert man2["partition_by"] == ["__date"]

    # latest commit is no longer a restore: helper needs to_version
    with pytest.raises(ValueError):
        reset_stream_high_for_replay(table)
