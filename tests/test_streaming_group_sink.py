"""Streaming group sink (streaming/lane.py run_group_sink): fact +
run-log land per micro-batch in ONE transaction group — both tables
advance in lockstep or neither does, batch-id idempotency across
redeliveries.  Reference parity: the sp-wrapped streaming upsert
logging its quality row in the same batch
(sql/streaming/staging/0009_stg.usp_log_quality_for_run.sql +
0006_LogSuccess.sql around usp_upsert_fact_trip_streaming.sql)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def group_sink_out(tmp_path_factory):
    """Session-unique work root (r9 ADVICE: a fixed /tmp literal
    collides across concurrent pytest runs — the repo's known
    phantom-failure mode)."""
    return str(tmp_path_factory.mktemp("group_sink"))


@pytest.fixture(scope="module")
def feed_dir(request, group_sink_out):
    """events split into 3 time-ordered files → 3 micro-batches."""
    import pyspark.sql

    spark = request.getfixturevalue("spark")
    src = os.path.join(group_sink_out, "feed")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n = ev.count()
    rows_per = (n + 2) // 3
    ranked = ev.withColumn(
        "rn", F.row_number().over(
            pyspark.sql.Window.orderBy(F.col("ts").asc(),
                                       F.col("event_id").asc())))
    for i in range(3):
        part = (
            ranked.where((F.col("rn") > i * rows_per)
                         & (F.col("rn") <= (i + 1) * rows_per))
            .drop("rn").coalesce(1)
        )
        stage = os.path.join(group_sink_out, f"stage{i}")
        part.write.mode("overwrite").parquet(stage)
        [pf] = glob.glob(os.path.join(stage, "part-*.parquet"))
        os.rename(pf, os.path.join(src, f"{i:03d}.parquet"))
    return src


def test_lockstep_and_batch_oracle(spark, feed_dir, group_sink_out):
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_group_sink)

    out = os.path.join(group_sink_out, "sink")
    shutil.rmtree(out, ignore_errors=True)
    res = run_group_sink(spark, SF_SMOKE, out,
                         max_files_per_trigger=1, source_dir=feed_dir)
    rows = res.collect()
    assert rows and all(r["versions_lockstep"] for r in rows)
    assert all(r["log_totals_match"] for r in rows)
    fact = os.path.join(out, "fact")
    runlog = os.path.join(out, "runlog")
    # 3 micro-batches → versions 0..2 on BOTH tables, one log row each
    assert txnlog.latest_version(fact) == 2
    assert txnlog.latest_version(runlog) == 2
    logs = txnlog.snapshot(spark, runlog).collect()
    assert sorted(r["batch_id"] for r in logs) == [0, 1, 2]
    # fact content == the batch events feed (append, batching-free)
    want = sorted(map(tuple, tf.events_ts_fixed(spark, SF_SMOKE)
                      .groupBy("event_type")
                      .agg(F.count("*").cast("bigint")).collect()))
    got = sorted(map(tuple, txnlog.snapshot(spark, fact)
                     .groupBy("event_type")
                     .agg(F.count("*").cast("bigint")).collect()))
    assert got == want
    assert sum(r["n_rows"] for r in logs) == sum(n for _, n in want)


def test_member_failure_mid_stream_advances_neither(spark, feed_dir,
                                                    group_sink_out,
                                                    monkeypatch):
    """Batch 1's run-log member commit blows up mid-group: the fact
    member manifest already published for that group must be unwound
    — after the failure BOTH tables still read at their batch-0
    state, and a resume completes to the same final state as an
    uninterrupted run."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_group_sink)

    out = os.path.join(group_sink_out, "sink_fail")
    shutil.rmtree(out, ignore_errors=True)
    runlog = os.path.join(out, "runlog")

    real_commit = txnlog.commit

    def failing_commit(df, path, mode="overwrite", **kw):
        meta = kw.get("meta") or {}
        if (os.path.abspath(path) == os.path.abspath(runlog)
                and meta.get("batch_id", 0) >= 1):
            raise RuntimeError("injected run-log member failure")
        return real_commit(df, path, mode, **kw)

    monkeypatch.setattr(txnlog, "commit", failing_commit)
    with pytest.raises(Exception, match="injected|Streaming"):
        run_group_sink(spark, SF_SMOKE, out,
                       max_files_per_trigger=1, source_dir=feed_dir)
    fact = os.path.join(out, "fact")
    # neither table advanced past the committed batch-0 group: the
    # fact member manifest published for the failed group is unwound
    assert txnlog.latest_version(fact) == 0
    assert txnlog.latest_version(runlog) == 0
    n_fact_v0 = txnlog.snapshot(spark, fact).count()
    logs = txnlog.snapshot(spark, runlog).collect()
    assert [r["batch_id"] for r in logs] == [0]
    assert logs[0]["n_rows"] == n_fact_v0

    # heal the sink and resume from the checkpoint: the redelivered
    # batch replays, and the final state matches an untouched run
    monkeypatch.setattr(txnlog, "commit", real_commit)
    res = run_group_sink(spark, SF_SMOKE, out,
                         max_files_per_trigger=1, source_dir=feed_dir,
                         resume=True)
    rows = res.collect()
    assert rows and all(r["versions_lockstep"] for r in rows)
    assert all(r["log_totals_match"] for r in rows)
    assert txnlog.latest_version(fact) == 2
    assert txnlog.latest_version(runlog) == 2
    assert sorted(r["batch_id"] for r in
                  txnlog.snapshot(spark, runlog).collect()) == [0, 1, 2]


def test_empty_feed_returns_empty_rollup(spark, group_sink_out):
    """Zero micro-batches (r9 ADVICE): no table is ever created —
    the sink must return the empty rollup with the lockstep flags'
    schema instead of TypeError-ing on a None version."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_group_sink)

    empty = os.path.join(group_sink_out, "empty_feed")
    os.makedirs(empty, exist_ok=True)
    out = os.path.join(group_sink_out, "sink_empty")
    res = run_group_sink(spark, SF_SMOKE, out, source_dir=empty)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "event_type", "n_events", "value_sum",
        "versions_lockstep", "log_totals_match"]
