"""Streaming lane: multi-micro-batch runs over time-ordered file feeds
must reproduce the batch pipeline exactly (the determinism contract in
streaming/lane.py's docstring)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

OUT = "/tmp/spark_graft_stream_test"


@pytest.fixture(scope="module")
def feed_dir(request):
    """events split into 3 time-ordered files → 3 micro-batches."""
    import pyspark.sql

    spark = request.getfixturevalue("spark")
    src = os.path.join(OUT, "feed")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").orderBy("ts")
    n = ev.count()
    rows_per = (n + 2) // 3
    ranked = ev.withColumn(
        "rn", F.row_number().over(
            pyspark.sql.Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())))
    for i in range(3):
        part = (
            ranked.where((F.col("rn") > i * rows_per) & (F.col("rn") <= (i + 1) * rows_per))
            .drop("rn").coalesce(1)
        )
        stage = os.path.join(OUT, f"stage{i}")
        part.write.mode("overwrite").parquet(stage)
        [pf] = glob.glob(os.path.join(stage, "part-*.parquet"))
        os.rename(pf, os.path.join(src, f"{i:03d}.parquet"))
    return src


def test_multibatch_upsert_equals_batch_trip_clean(spark, feed_dir):
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_upsert

    got = run_upsert(spark, SF_SMOKE, os.path.join(OUT, "upsert"),
                     max_files_per_trigger=1, source_dir=feed_dir)
    want = tf.trip_clean(tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)))
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w  # byte-identical to the batch answer despite 3 batches


def test_multibatch_audit_equals_batch_quality_audit(spark, feed_dir):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_quality_audit
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_windowed_audit

    got = run_windowed_audit(spark, SF_SMOKE, os.path.join(OUT, "audit"),
                             max_files_per_trigger=1, source_dir=feed_dir)
    want = q_quality_audit(spark, SF_SMOKE)
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w


def test_multibatch_dlq_routing_counts(spark, feed_dir):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_dlq_routing
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_dlq_routing

    curated, dlq = run_dlq_routing(spark, SF_SMOKE, os.path.join(OUT, "dlq"),
                                   max_files_per_trigger=1, source_dir=feed_dir)
    want_dlq = q_dlq_routing(spark, SF_SMOKE)
    assert dlq.count() == want_dlq.count()
    g = sorted(map(tuple, dlq.select(*sorted(dlq.columns)).collect()))
    w = sorted(map(tuple, want_dlq.select(*sorted(want_dlq.columns)).collect()))
    assert g == w
    # routing is a partition: curated + dlq = every typed row
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    total = tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)).count()
    assert curated.count() + dlq.count() == total


def test_multibatch_stateful_sessionize_equals_batch(spark, feed_dir):
    """Open sessions must carry across micro-batch boundaries via
    applyInPandasWithState and still reproduce the batch window answer."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_sessionize
    from azure_nyctaxi_lambda_elt_spark.streaming.stateful import (
        run_streaming_sessionize)

    got = run_streaming_sessionize(
        spark, SF_SMOKE, os.path.join(OUT, "sess"),
        max_files_per_trigger=1, source_dir=feed_dir)
    want = q_sessionize(spark, SF_SMOKE)
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w


def test_multibatch_model_upsert_invariants(spark, feed_dir):
    """Full-model streaming upsert across 3 micro-batches: surrogate
    keys are append-only stable, fact/dim referential integrity holds,
    and the fact's trip_id set equals the batch star-schema answer."""
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_fact_build_star
    from azure_nyctaxi_lambda_elt_spark.streaming.model_upsert import (
        run_model_upsert)

    out = run_model_upsert(spark, SF_SMOKE, os.path.join(OUT, "model"),
                           max_files_per_trigger=1, source_dir=feed_dir)
    fact, clean = out["fact"], out["clean"]
    v, p, loc = out["dim_vendor"], out["dim_payment"], out["dim_location"]

    # trip_id set identical to the batch pipeline's fact
    want = q_fact_build_star(spark, SF_SMOKE)
    assert {r[0] for r in fact.select("trip_id").collect()} == \
           {r[0] for r in want.select("trip_id").collect()}

    # referential integrity: every non-unknown fact key resolves to a
    # dim member whose NK matches the clean row's NK
    joined = (
        fact.join(v, "vendor_key", "left")
        .select("trip_id", "vendor_key", "vendor_code")
    )
    bad = joined.where(
        (F.col("vendor_key") != -1) & F.col("vendor_code").isNull()).count()
    assert bad == 0
    assert loc.where(F.col("location_key") == -1).count() == 1  # unknown member
    # keys are unique per dim
    for dim, key in ((v, "vendor_key"), (p, "payment_type_key"),
                     (loc, "location_key")):
        n = dim.count()
        assert dim.select(key).distinct().count() == n

    # clean warehouse equals batch trip_clean (latest-wins associativity)
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    want_clean = tf.trip_clean(tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)))
    assert clean.count() == want_clean.count()


def test_multibatch_dedupe_one_row_per_key(spark, feed_dir):
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_streaming_dedupe

    got = run_streaming_dedupe(spark, SF_SMOKE, os.path.join(OUT, "dedup"),
                               max_files_per_trigger=1, source_dir=feed_dir)
    typed = tf.typed_trips(tf.raw_trips(spark, SF_SMOKE))
    assert got.count() == typed.select("trip_uid").distinct().count()
    assert got.groupBy("trip_uid").count().where(F.col("count") > 1).count() == 0


def test_multibatch_interval_join_equals_batch(spark, feed_dir):
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_stream_stream_join

    got = run_stream_stream_join(spark, SF_SMOKE, os.path.join(OUT, "ssjoin"),
                                 max_files_per_trigger=1, source_dir=feed_dir)
    e = tf.events_ts_fixed(spark, SF_SMOKE)
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"))
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value"))
    want = p.join(
        c, (F.col("user_id") == F.col("cu"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).drop("cu")
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w  # match set identical despite 3 micro-batches


def test_multibatch_dim_enrich_equals_batch(spark, feed_dir):
    """Stream-static joins are stateless per batch → the enriched
    rollup over 3 micro-batches must equal the single-pass batch
    join+rollup."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_dim_enrich
    import pyspark.sql

    got = run_dim_enrich(spark, SF_SMOKE, os.path.join(OUT, "dim_enrich"),
                         max_files_per_trigger=1, source_dir=feed_dir)

    ev = tf.events_ts_fixed(spark, SF_SMOKE)
    w = pyspark.sql.Window.orderBy(F.col("__total").desc(), F.col("user_id"))
    profile = (ev.groupBy("user_id")
               .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                    .alias("__total"))
               .select("user_id", F.ntile(4).over(w).alias("user_tier")))
    want = (ev.join(profile, "user_id")
            .groupBy("event_type", "user_tier")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("total_value")))
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    e = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == e


def test_multibatch_rate_limit_equals_batch_twin(spark, feed_dir):
    """Time-ordered arrival over 3 micro-batches: the stateful limiter's
    admitted set must equal the deterministic batch ranking, proving
    per-key state (hour bucket + count) carries across batches."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.streaming.rate_limit import (
        rate_limit_batch, run_streaming_rate_limit)

    got = run_streaming_rate_limit(
        spark, SF_SMOKE, os.path.join(OUT, "rate_limit"),
        max_files_per_trigger=1, source_dir=feed_dir)
    want = rate_limit_batch(tf.events_ts_fixed(spark, SF_SMOKE))
    g = sorted(map(tuple, got.select(*sorted(got.columns)).collect()))
    w = sorted(map(tuple, want.select(*sorted(want.columns)).collect()))
    assert g == w
    # admission never exceeds the cap in any (user, hour)
    over = (got.groupBy("user_id", "hour_bucket").count()
            .where(F.col("count") > 40).count())
    assert over == 0


def test_multibatch_left_outer_join_null_side(spark, feed_dir):
    """Left-outer stream-stream join over 3 batches: below the final
    watermark every purchase appears exactly once-or-more (matched) or
    exactly once with NULL click columns (evicted unmatched)."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_stream_stream_left_join)

    got = run_stream_stream_left_join(
        spark, SF_SMOKE, os.path.join(OUT, "ss_left"),
        max_files_per_trigger=1, source_dir=feed_dir)
    rows = got.collect()
    assert rows, "cutoff produced an empty frame"
    nulls = [r for r in rows if r["click_event_id"] is None]
    matched = [r for r in rows if r["click_event_id"] is not None]
    assert nulls, "no unmatched purchases emitted (watermark never fired)"
    # an unmatched emission is exclusive: its purchase has no matched row
    matched_pids = {r["purchase_event_id"] for r in matched}
    assert all(r["purchase_event_id"] not in matched_pids for r in nulls)


def test_multibatch_distinct_sketch_equals_batch(spark, feed_dir, duck):
    """The survivor-set union is idempotent/commutative/associative —
    3 micro-batches must equal the one-shot batch sketch (and the
    DuckDB oracle)."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_distinct_sketch)

    got = run_distinct_sketch(
        spark, SF_SMOKE, os.path.join(OUT, "distinct_sketch"),
        max_files_per_trigger=1, source_dir=feed_dir)
    rows = {r["event_type"]: (r["n_sampled"], r["est_distinct"])
            for r in got.collect()}
    want = {r[0]: (r[1], r[2]) for r in duck.execute("""
        WITH surv AS (
          SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uid
          FROM events
          WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 4) < '0800')
        SELECT event_type, CAST(COUNT(*) AS BIGINT), round(COUNT(*) * 32.0, 1)
        FROM surv GROUP BY 1""").fetchall()}
    assert rows == want


def test_checkpoint_recovery_resumes_exactly_once(spark, feed_dir, duck):
    """Stop-and-resume over the same checkpoint: a second run must
    process ONLY the unseen files.  The quality log's merge is
    ADDITIVE, so any replay of an already-processed file would corrupt
    the counts — the final table equaling the batch oracle proves the
    exactly-once recovery contract; a third resume with no new files
    must be a no-op."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_quality_log)

    out = os.path.join(OUT, "recovery")
    staged = os.path.join(OUT, "recovery_feed")
    shutil.rmtree(staged, ignore_errors=True)
    os.makedirs(staged)
    files = sorted(glob.glob(os.path.join(feed_dir, "*.parquet")))
    assert len(files) == 3

    # phase 1: only the first file exists
    shutil.copy(files[0], staged)
    run_quality_log(spark, SF_SMOKE, out, source_dir=staged)

    # phase 2: the remaining files arrive; resume from the checkpoint
    for f in files[1:]:
        shutil.copy(f, staged)
    got = run_quality_log(spark, SF_SMOKE, out, source_dir=staged,
                          resume=True)
    want = duck.execute("""
        WITH """ + __import__(
        "azure_nyctaxi_lambda_elt_spark.plans.oracle_trips",
        fromlist=["TRIPS_CTES"]).TRIPS_CTES + """
        SELECT date_trunc('hour', loaded_at) AS hour_bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM typed_trips GROUP BY 1""").fetchall()
    want_by_hour = {r[0]: r[1] for r in want}
    got_by_hour = {r["hour_bucket"]: r["good_rows"] + r["dlq_rows"]
                   for r in got.collect()}
    assert got_by_hour == want_by_hour

    # phase 3: no new files — resume must change nothing
    again = run_quality_log(spark, SF_SMOKE, out, source_dir=staged,
                            resume=True)
    again_by_hour = {r["hour_bucket"]: r["good_rows"] + r["dlq_rows"]
                     for r in again.collect()}
    assert again_by_hour == got_by_hour


def test_multibatch_session_windows_equal_batch_at_cutoff(spark, feed_dir):
    """3 ts-ordered micro-batches of the built-in session_window
    aggregation must drain to exactly the batch sessions finalized by
    the final watermark.  The batch twin is filtered AFTER collect():
    a Spark-side .where(session_end <= cut) is pushed below the merging
    session-window aggregate and truncates sessions (the oracle carries
    the cutoff in SQL for the same reason)."""
    import datetime

    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        session_window_agg)
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_session_windows)

    got = run_session_windows(
        spark, SF_SMOKE, os.path.join(OUT, "session_windows"),
        max_files_per_trigger=1, source_dir=feed_dir)
    key = lambda r: (r["user_id"], r["session_start"], r["session_end"],
                     r["n_events"], r["session_value"])
    g = {key(r) for r in got.collect()}

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    cut = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=2)
    batch = [r for r in session_window_agg(ev).collect()
             if r["session_end"] <= cut]
    assert g == {key(r) for r in batch}
    assert g, "cutoff must leave finalized sessions at this scale"


def test_multibatch_raw_archive_is_input_identity(spark, feed_dir):
    """The third ASA output (asa-wire.sh '/* 3) keep raw */'): across
    3 micro-batches the raw sink must hold EXACTLY the input events —
    archived verbatim, date/hour partitioned — while curated+DLQ still
    appear (one scan feeds all three sinks)."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_raw_archive)

    out = os.path.join(OUT, "raw_archive")
    shutil.rmtree(out, ignore_errors=True)
    back = run_raw_archive(spark, SF_SMOKE, out,
                           max_files_per_trigger=1, source_dir=feed_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    assert back.select(cols).exceptAll(src.select(cols)).count() == 0
    assert src.select(cols).exceptAll(back.select(cols)).count() == 0
    # the companion sinks exist and are non-empty
    assert spark.read.parquet(os.path.join(out, "curated")).count() > 0
    assert spark.read.parquet(os.path.join(out, "dlq")).count() > 0
    # the DEFAULT archive keeps the documented ASA-faithful plain
    # blob layout (external raw/ consumers read it as plain parquet;
    # the txn-managed variant is the opt-in / run_raw_archive_txn)
    raw = os.path.join(out, "raw")
    assert not os.path.isdir(os.path.join(raw, "_txn"))
    assert any(d.startswith("__date=") for d in os.listdir(raw))


def test_raw_archive_default_redelivery_is_idempotent(spark, feed_dir):
    """The exactly-once raw lane commits through _commit_raw_batch
    (run_raw_archive_txn's default; run_raw_archive's opt-in):
    redelivering an already-committed micro-batch
    (foreachBatch retry after checkpoint rollback) must be a no-op —
    no duplicate rows, no new version — while a NEW batch id appends."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        _commit_raw_batch)

    table = os.path.join(OUT, "raw_commit_unit")
    shutil.rmtree(table, ignore_errors=True)
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(20)
    _commit_raw_batch(table, batch, 0)
    v0 = txnlog.latest_version(table)
    n0 = txnlog.snapshot(spark, table).count()
    assert n0 == 20

    _commit_raw_batch(table, batch, 0)  # redelivery of batch 0
    assert txnlog.latest_version(table) == v0
    assert txnlog.snapshot(spark, table).count() == n0

    _commit_raw_batch(table, batch.limit(5), 1)  # genuinely new batch
    assert txnlog.latest_version(table) == v0 + 1
    assert txnlog.snapshot(spark, table).count() == n0 + 5

    _commit_raw_batch(table, batch, 1)  # redelivery of batch 1
    assert txnlog.snapshot(spark, table).count() == n0 + 5


def test_raw_archive_watermark_survives_interleaved_commits(
        spark, feed_dir):
    """An interleaved NON-stream commit on the raw table (compact /
    restore carry no batch_id in their manifest meta) must not reset
    the exactly-once watermark: a latest-manifest-only read would see
    batch_id=-1 and re-land a redelivered batch as duplicates
    (regression)."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        _commit_raw_batch)

    table = os.path.join(OUT, "raw_commit_interleave")
    shutil.rmtree(table, ignore_errors=True)
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(20)
    _commit_raw_batch(table, batch, 0)
    _commit_raw_batch(table, batch.limit(8), 1)
    n = txnlog.snapshot(spark, table).count()
    assert n == 28

    # maintenance interleaves: OPTIMIZE writes a manifest with no
    # batch_id in meta
    assert txnlog.compact(spark, table) is not None
    assert "batch_id" not in txnlog.latest_meta(table)

    _commit_raw_batch(table, batch.limit(8), 1)  # redelivery post-compact
    assert txnlog.snapshot(spark, table).count() == n  # no duplicates

    _commit_raw_batch(table, batch.limit(3), 2)  # new batch still lands
    assert txnlog.snapshot(spark, table).count() == n + 3


def test_raw_archive_watermark_survives_vacuumed_manifests(
        spark, feed_dir):
    """Even when VACUUM has dropped every manifest that carried a
    batch_id (long maintenance run after the last stream batch), the
    _stream_high sidecar must hold the watermark — the manifest walk
    alone would return -1 and re-land a redelivered batch."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        _commit_raw_batch, _committed_batch_high)

    table = os.path.join(OUT, "raw_commit_vacuum")
    shutil.rmtree(table, ignore_errors=True)
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(10)
    _commit_raw_batch(table, batch, 0)
    _commit_raw_batch(table, batch.limit(4), 1)
    n = txnlog.snapshot(spark, table).count()
    # two maintenance commits, then vacuum retains only them — every
    # batch_id-carrying manifest is gone
    txnlog.compact(spark, table)
    txnlog.restore(table, txnlog.latest_version(table))
    txnlog.vacuum(table, keep_latest=2, grace_seconds=0.0)
    assert _committed_batch_high(table) == 1  # sidecar survives
    _commit_raw_batch(table, batch.limit(4), 1)  # redelivery
    assert txnlog.snapshot(spark, table).count() == n
    _commit_raw_batch(table, batch.limit(2), 2)  # new batch lands
    assert txnlog.snapshot(spark, table).count() == n + 2


def test_state_swap_recovers_from_mid_swap_crash(spark):
    """_crash_safe_swap + _read_state: a crash between the park and
    the promote leaves the state readable from the parked copy; the
    next merge heals it."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        _crash_safe_swap, _read_state)

    state = os.path.join(OUT, "swap_state")
    for suffix in ("", "_tmp", "_old"):
        shutil.rmtree(state + suffix, ignore_errors=True)
    df1 = spark.range(5)
    df1.write.parquet(state)
    # normal swap: tmp promotes, no _old residue
    spark.range(7).write.parquet(state + "_tmp")
    _crash_safe_swap(state)
    assert _read_state(spark, state).count() == 7
    assert not os.path.exists(state + "_old")
    # simulated mid-swap crash: old parked, promote never happened
    os.rename(state, state + "_old")
    assert _read_state(spark, state).count() == 7  # recovered from _old
    # the next round's swap heals the layout
    spark.range(9).write.parquet(state + "_tmp")
    _crash_safe_swap(state)
    assert _read_state(spark, state).count() == 9
    assert not os.path.exists(state + "_old")


def test_raw_archive_exactly_once_opt_in_lands_txn_layout(
        spark, feed_dir):
    """exactly_once=True opts the raw copy into txn-log commits with
    batch-id idempotency — a different on-disk layout than the plain
    ASA blob default, which is why it is opt-in."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_raw_archive)

    out = os.path.join(OUT, "raw_archive_eo")
    shutil.rmtree(out, ignore_errors=True)
    back = run_raw_archive(spark, SF_SMOKE, out, max_files_per_trigger=1,
                           source_dir=feed_dir, exactly_once=True)
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert back.count() == src.count()
    raw = os.path.join(out, "raw")
    assert txnlog.latest_version(raw) is not None


def test_distinct_sketch_mid_swap_crash_recovery(spark, feed_dir):
    """A crash BETWEEN the two state-swap renames leaves the parked
    `_old` copy; the next run must recover it (survivor-set union is
    idempotent, so replaying the feed over the parked state restores
    exactly the pre-crash survivors)."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_distinct_sketch)

    out = os.path.join(OUT, "sketch_crash")
    shutil.rmtree(out, ignore_errors=True)
    run_distinct_sketch(spark, SF_SMOKE, out,
                        max_files_per_trigger=1, source_dir=feed_dir)
    state = os.path.join(out, "sketch_state")
    expected = spark.read.parquet(state).count()
    # simulate the mid-swap crash: old state parked, promotion lost
    os.rename(state, state + "_old")
    shutil.rmtree(os.path.join(out, "ckpt"))
    run_distinct_sketch(spark, SF_SMOKE, out,
                        max_files_per_trigger=1, source_dir=feed_dir,
                        resume=True)
    assert spark.read.parquet(state).count() == expected


def test_two_level_rollup_multibatch_matches_batch_cutoff(spark, feed_dir):
    """Chained stateful aggregation (5-min counts -> hourly rollup in
    one query): over the 3-file time-ordered feed, the drained sink
    must equal the batch rollup cut at the final watermark —
    regardless of micro-batch boundaries."""
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_two_level_rollup)

    out = os.path.join(OUT, "two_level")
    shutil.rmtree(out, ignore_errors=True)
    got = run_two_level_rollup(spark, SF_SMOKE, out,
                               max_files_per_trigger=1,
                               source_dir=feed_dir)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    wm = ev.agg(F.max("ts")).collect()[0][0]
    five = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w5"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n5")))
    want = (
        five.groupBy(F.window(F.col("w5.start"), "1 hour").alias("wh"),
                     "event_type")
        .agg(F.sum("n5").cast("bigint").alias("n_events"),
             F.count("*").cast("bigint").alias("n_windows"))
        .where(F.col("wh.end") <= F.lit(wm) - F.expr("INTERVAL 2 HOURS"))
        .select(F.col("wh.start").alias("hour_start"), "event_type",
                "n_events", "n_windows"))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_raw_archive_txn_exactly_once_under_redelivery(spark, feed_dir):
    """The exactly-once archive variant: wiping the checkpoint
    redelivers every batch; the manifest batch-id skips must keep the
    archive identical to the input feed — no duplicate raw rows, no
    new versions."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_raw_archive_txn)

    out = os.path.join(OUT, "raw_archive_txn")
    shutil.rmtree(out, ignore_errors=True)
    first = run_raw_archive_txn(spark, SF_SMOKE, out,
                                max_files_per_trigger=1,
                                source_dir=feed_dir)
    table = os.path.join(out, "raw_txn")
    v_before = txnlog.latest_version(table)
    n_before = first.count()
    assert v_before >= 2  # 3 feed files -> 3 committed batches

    shutil.rmtree(os.path.join(out, "ckpt"))
    again = run_raw_archive_txn(spark, SF_SMOKE, out,
                                max_files_per_trigger=1,
                                source_dir=feed_dir, resume=True)
    assert txnlog.latest_version(table) == v_before
    assert again.count() == n_before
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert n_before == src.count()
    # identity: the archive carries the feed verbatim
    assert again.exceptAll(src.select(
        "event_id", "ts", "user_id", "event_type", "value",
        "props")).count() == 0


def test_raw_archive_txn_date_partitioned_prune(spark, feed_dir):
    """Each archive commit is partitioned by __date (one manifest dir
    per event date per micro-batch): a date-scoped replay through
    snapshot(prune=...) must open strictly fewer dirs than the table
    holds and still return exactly the full read's rows for that
    date."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import (
        run_raw_archive_txn)

    out = os.path.join(OUT, "raw_archive_txn_part")
    shutil.rmtree(out, ignore_errors=True)
    full = run_raw_archive_txn(spark, SF_SMOKE, out,
                               max_files_per_trigger=1,
                               source_dir=feed_dir)
    table = os.path.join(out, "raw_txn")
    man = txnlog._read_manifest(table, txnlog.latest_version(table))
    assert all("__p___date=" in d for d in man["dirs"])
    # pick the smallest event date; the feed spans several days
    d0 = full.agg(F.min(F.to_date("ts"))).collect()[0][0]
    iso = d0.isoformat()
    kept, all_dirs = txnlog.prune_plan(table, None,
                                       [("__date", iso, iso)])
    assert 0 < len(kept) < len(all_dirs)
    snap = txnlog.snapshot(spark, table, prune=("__date", iso, iso))
    got = snap.where(F.col("__date") == F.lit(iso)) \
        .select("event_id").collect()
    want = full.where(F.to_date("ts") == F.lit(iso)) \
        .select("event_id").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)


def test_txn_sink_exactly_once_under_redelivery(spark, feed_dir):
    """foreachBatch is at-least-once: wiping the checkpoint (the
    classic rollback) redelivers every batch.  The txn-log sink must
    skip them all via the manifest batch-id — row counts and version
    count unchanged, exactly-once end to end."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_txn_sink

    out = os.path.join(OUT, "txn_sink")
    shutil.rmtree(out, ignore_errors=True)
    first = run_txn_sink(spark, SF_SMOKE, out,
                         max_files_per_trigger=1, source_dir=feed_dir)
    table = os.path.join(out, "table")
    v_before = txnlog.latest_version(table)
    n_before = txnlog.snapshot(spark, table).count()
    assert v_before >= 2  # 3 files -> 3 batches committed

    # redelivery: checkpoint gone, committed table intact
    shutil.rmtree(os.path.join(out, "ckpt"))
    run_txn_sink(spark, SF_SMOKE, out,
                 max_files_per_trigger=1, source_dir=feed_dir,
                 resume=True)
    assert txnlog.latest_version(table) == v_before
    assert txnlog.snapshot(spark, table).count() == n_before
    src_n = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert n_before == src_n


def test_txn_sink_date_partitioned_prune(spark, feed_dir):
    """The CURATED txn sink now shares _commit_raw_batch's
    date-partitioned commits (r7 verdict ask): a date-scoped read of
    the sink opens only that date's dirs of every batch commit and
    still returns exactly the full read's rows for that date."""
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.streaming.lane import run_txn_sink

    out = os.path.join(OUT, "txn_sink_part")
    shutil.rmtree(out, ignore_errors=True)
    run_txn_sink(spark, SF_SMOKE, out,
                 max_files_per_trigger=1, source_dir=feed_dir)
    table = os.path.join(out, "table")
    man = txnlog._read_manifest(table, txnlog.latest_version(table))
    assert all("__p___date=" in d for d in man["dirs"])
    full = txnlog.snapshot(spark, table)
    d0 = full.agg(F.min("__date")).collect()[0][0]
    iso = d0.isoformat()
    kept, all_dirs = txnlog.prune_plan(table, None,
                                       [("__date", iso, iso)])
    assert 0 < len(kept) < len(all_dirs)
    snap = txnlog.snapshot(spark, table, prune=("__date", iso, iso))
    got = snap.where(F.col("__date") == F.lit(iso)) \
        .select("event_id").collect()
    want = full.where(F.col("__date") == F.lit(iso)) \
        .select("event_id").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)
