"""Streaming SOURCE over a txnlog table (streaming/txn_source.py):
version-offset consumption, multi-run restart exactly-once through
the checkpoint, the append-only contract (maintenance skipped
silently, change commits refuse / skip per option), schema-evolution
null-backfill, and the retention (fell-behind) refusal."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.streaming.txn_source import (
    read_stream_txn)


def _df(spark, lo, hi, extra=None):
    df = spark.range(lo, hi).withColumn("v", F.col("id") * 2.0)
    if extra is not None:
        df = df.withColumn("tag", F.lit(extra))
    return df


def _run_to_parquet(spark, table, sink, ckpt, **kw):
    st = read_stream_txn(spark, table, **kw)
    q = (st.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _ids(spark, sink):
    return {r["id"] for r in
            spark.read.parquet(sink).select("id").collect()}


def test_initial_and_appends_consumed_once(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    txnlog.commit(_df(spark, 40, 70), table, "append")
    _run_to_parquet(spark, table, sink, ckpt)
    assert _ids(spark, sink) == set(range(70))
    # restart with nothing new: no duplicates
    _run_to_parquet(spark, table, sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 70 and got.select("id").distinct().count() == 70


def test_restart_resumes_at_next_version(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    _run_to_parquet(spark, table, sink, ckpt)
    assert _ids(spark, sink) == set(range(40))
    txnlog.commit(_df(spark, 40, 70), table, "append")
    txnlog.commit(_df(spark, 70, 100), table, "append")
    _run_to_parquet(spark, table, sink, ckpt)
    got = spark.read.parquet(sink)
    # exactly-once across the restart: 100 rows, all distinct
    assert got.count() == 100
    assert got.select("id").distinct().count() == 100


def test_starting_version_skips_older_commits(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    txnlog.commit(_df(spark, 40, 70), table, "append")
    _run_to_parquet(spark, table, sink, ckpt, starting_version=1)
    assert _ids(spark, sink) == set(range(40, 70))


def test_maintenance_commits_skip_silently(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    _run_to_parquet(spark, table, sink, ckpt)
    txnlog.compact(spark, table)  # physical-only: no logical change
    txnlog.commit(_df(spark, 40, 60), table, "append")
    _run_to_parquet(spark, table, sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 60
    assert got.select("id").distinct().count() == 60


def test_change_commit_refuses_by_default(spark, tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    _run_to_parquet(spark, table, sink, ckpt)
    txnlog.merge_upsert(spark, table,
                        _df(spark, 0, 5).withColumn(
                            "v", F.lit(99.0)), ["id"])
    with pytest.raises(StreamingQueryException,
                       match="content-changing commit"):
        _run_to_parquet(spark, table, sink, ckpt)


def test_skip_change_commits_continues(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 40), table, "overwrite")
    _run_to_parquet(spark, table, sink, ckpt,
                    skip_change_commits=True)
    txnlog.delete_keys(spark, table,
                       spark.createDataFrame([(1,)], "id long"),
                       ["id"])
    txnlog.commit(_df(spark, 40, 60), table, "append")
    _run_to_parquet(spark, table, sink, ckpt,
                    skip_change_commits=True)
    got = spark.read.parquet(sink)
    # the delete is skipped (already-emitted rows stand, Delta
    # skipChangeCommits semantics); the append after it streams
    assert got.count() == 60
    assert got.select("id").distinct().count() == 60


def test_schema_evolution_null_backfills(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 10), table, "overwrite")
    txnlog.commit(_df(spark, 10, 20, extra="late"), table, "append")
    _run_to_parquet(spark, table, sink, ckpt)
    got = spark.read.parquet(sink)
    assert set(got.columns) == {"id", "v", "tag"}
    by_tag = {r["tag"]: r["n"] for r in
              got.groupBy("tag").agg(F.count("*").alias("n"))
              .collect()}
    assert by_tag == {None: 10, "late": 10}


def test_fell_behind_retention_refuses(spark, tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 10), table, "overwrite")
    txnlog.commit(_df(spark, 10, 20), table, "append")
    txnlog.commit(_df(spark, 20, 30), table, "append")
    # vacuum away all but the newest manifest BEFORE first consume
    txnlog.vacuum(table, keep_latest=1, grace_seconds=0)
    with pytest.raises(StreamingQueryException,
                       match="fell behind"):
        _run_to_parquet(spark, table, sink, ckpt)


def test_log_to_log_pipeline_restart(spark, tmp_path):
    """The composed exactly-once pipeline (lane.run_txn_stream_copy):
    first run consumes v0 only, the resume consumes the two appends
    — every trip exactly once, lockstep with the batch rollup."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_txn_stream_copy)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "copy")
    r1 = run_txn_stream_copy(spark, sf, out, upto_day=10)
    n1 = r1.agg(F.sum("n_rows")).collect()[0][0]
    r2 = run_txn_stream_copy(spark, sf, out, resume=True)
    total = r2.agg(F.sum("n_rows"), F.sum("n_trips")).collect()[0]
    clean = tf.trip_clean(tf.typed_trips(tf.raw_trips(spark, sf)))
    want = clean.count()
    assert n1 < want  # first run really was partial
    assert total[0] == want
    assert total[1] == want  # distinct uids == rows: exactly-once


def _drain_available_now(spark, table, ckpt, batches, runs_cap=8,
                         want_rows=None, **kw):
    """Repeated availableNow runs (the single-batch fallback: each
    run = ONE planned batch) until the sink saw ``want_rows``."""
    st = read_stream_txn(spark, table, **kw)

    def fb(batch, bid):
        batches.append((int(bid), batch.count()))

    runs = 0
    while runs < runs_cap:
        q = (st.writeStream.foreachBatch(fb)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        runs += 1
        if want_rows is not None \
                and sum(n for _, n in batches) >= want_rows:
            break
    return runs


def test_max_versions_per_trigger_bounds_batches(spark, tmp_path):
    """r12 admission control: a 5-commit backlog with
    maxVersionsPerTrigger=2 drains as ≥2 bounded micro-batches with
    checkpoint progress between them (not one giant batch), and the
    end state is exactly-once.  Also pins the AvailableNow fallback:
    Python sources fall back to single-batch execution, so each
    availableNow RUN lands exactly one capped batch and stops short
    of the head — re-running resumes from the checkpoint."""
    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    txnlog.commit(_df(spark, 0, 10), table, "overwrite")
    for lo in range(10, 50, 10):
        txnlog.commit(_df(spark, lo, lo + 10), table, "append")
    batches: list = []
    runs = _drain_available_now(spark, table, ckpt, batches,
                                want_rows=50,
                                max_versions_per_trigger=2)
    # 5 versions / cap 2 → three runs of one batch each: 20/20/10
    assert runs == 3
    assert [n for _, n in batches] == [20, 20, 10]
    assert [b for b, _ in batches] == [0, 1, 2]  # ckpt progressed
    # exactly-once: every id exactly once across the batches
    assert sum(n for _, n in batches) == 50


def test_max_versions_processing_time_multi_batch(spark, tmp_path):
    """The same cap under a ProcessingTime trigger drains the
    backlog as multiple bounded batches within ONE query run."""
    import time

    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    txnlog.commit(_df(spark, 0, 10), table, "overwrite")
    for lo in range(10, 50, 10):
        txnlog.commit(_df(spark, lo, lo + 10), table, "append")
    batches: list = []

    def fb(batch, bid):
        batches.append((int(bid), batch.count()))

    st = read_stream_txn(spark, table, max_versions_per_trigger=2)
    q = (st.writeStream.foreachBatch(fb)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="100 milliseconds").start())
    t0 = time.time()
    while time.time() - t0 < 120 and sum(n for _, n in batches) < 50:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    assert [n for _, n in batches[:3]] == [20, 20, 10]
    assert sum(n for _, n in batches) == 50


def test_max_files_per_trigger_soft_cap(spark, tmp_path):
    """maxFilesPerTrigger admits whole versions until the cumulative
    new-file count reaches the cap — and always at least one version,
    so a single commit larger than the cap still flows (Delta's
    soft-cap semantics)."""
    import time

    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    # v0: one file; v1: a JUMBO 3-file commit; v2: one file
    txnlog.commit(_df(spark, 0, 10).coalesce(1), table, "overwrite")
    txnlog.commit(_df(spark, 10, 40).repartition(3), table, "append")
    txnlog.commit(_df(spark, 40, 50).coalesce(1), table, "append")
    batches: list = []

    def fb(batch, bid):
        batches.append((int(bid), batch.count()))

    st = read_stream_txn(spark, table, max_files_per_trigger=1)
    q = (st.writeStream.foreachBatch(fb)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="100 milliseconds").start())
    t0 = time.time()
    while time.time() - t0 < 120 and sum(n for _, n in batches) < 50:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    # one version per batch: 10 (v0), 30 (jumbo v1 whole), 10 (v2)
    assert [n for _, n in batches[:3]] == [10, 30, 10]
    assert sum(n for _, n in batches) == 50


def test_capped_restart_exactly_once(spark, tmp_path):
    """Stop a capped stream mid-backlog, append MORE commits, resume:
    the restarted reader re-learns its position from the WAL replay
    (never regresses the offset) and every row lands exactly once."""
    table, sink, ckpt = (str(tmp_path / d)
                         for d in ("t", "sink", "ckpt"))
    txnlog.commit(_df(spark, 0, 10), table, "overwrite")
    for lo in range(10, 40, 10):
        txnlog.commit(_df(spark, lo, lo + 10), table, "append")
    # run 1: one capped batch (v0..v1 = 20 rows), then stops
    _run_to_parquet(spark, table, sink, ckpt,
                    max_versions_per_trigger=2)
    assert _ids(spark, sink) == set(range(20))
    txnlog.commit(_df(spark, 40, 50), table, "append")
    # drain: each resume consumes ≤2 more versions
    for _ in range(3):
        _run_to_parquet(spark, table, sink, ckpt,
                        max_versions_per_trigger=2)
    got = spark.read.parquet(sink)
    assert got.count() == 50
    assert got.select("id").distinct().count() == 50
