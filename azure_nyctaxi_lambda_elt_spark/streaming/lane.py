"""Structured-Streaming lane: the reference's Event Hubs → ASA →
hourly-upsert pipeline re-expressed as readStream → narrow transforms →
foreachBatch sinks.

Reference parity:
- events_stream + dq_route_stream ≈ the ASA job (infra/scripts/
  asa-wire.sh): tolerant parse → DQ flags (missingRequired /
  negativeValues / badDuration) → curated + DLQ sinks with reason.
- run_windowed_audit ≈ stg.TripsStreaming_Quality_Audit (sql/streaming/
  staging/0008_TripsStreaming_Quality_Audit.sql): per-hour good/dlq/
  per-reason counts, maintained incrementally per micro-batch.
- run_upsert ≈ the hourly MERGE lane (usp_upsert_trips_from_streaming /
  usp_upsert_trip_clean_from_slice_streaming.sql): each micro-batch is
  slice-built, deduped, and latest-wins-merged into the warehouse.

Determinism contract (what makes these oracle-checkable): every
transform before the sink is a pure function of the event row, and the
cross-batch merge is latest-wins under a TOTAL order (loaded_at,
source_file_name) — an associative/commutative reduction, so the final
sink state is independent of micro-batch boundaries and equals the
batch pipeline's answer over the same events.

Scale notes: watermarks bound all streaming state; the windowed audit
keys state by (hour bucket) only; the upsert's foreachBatch merge is a
key-hash shuffle of batch ∪ touched-warehouse rows — with the warehouse
partitioned by ingest_date only touched partitions are rewritten.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedupe import latest_wins
from ..plans import trips_feed as tf

ORDER_COLS = ("loaded_at", "source_file_name")


def _order_by():
    return [F.col(c).desc() for c in ORDER_COLS]


def _stage_source_dir(sf_dir: str) -> str:
    """FileStreamSource needs a DIRECTORY; the testdata table is a single
    parquet file — stage it via symlink (zero-copy)."""
    src = os.path.join("/tmp/spark_graft_stream/src",
                       os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(src, exist_ok=True)
    link = os.path.join(src, "events-000.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return src


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None,
                  source_dir: str | None = None) -> DataFrame:
    """File-source stream over the events table (the Event Hubs stand-in).

    Schema comes from a batch peek (production would pin it); the
    nanosecond `ts` long is fixed up exactly like the batch path.
    ``source_dir`` overrides the staged single-file dir (tests use it to
    feed multiple time-ordered files → real micro-batch sequencing).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    path = source_dir or _stage_source_dir(sf_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(path)
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # some Spark builds surface parquet TIMESTAMP(NANOS) as NTZ;
        # session tz is pinned UTC so the cast is value-preserving, and
        # watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP)
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def _dq_parts():
    """The ASA DQ predicates (first-match-wins reason)."""
    missing = F.col("pickup_ts").isNull() | F.col("dropoff_ts").isNull()
    negative = (
        (F.coalesce(F.col("trip_distance"), F.lit(0.0)) < 0)
        | (F.coalesce(F.col("fare_amount"), F.lit(0.0)) < 0)
        | (F.coalesce(F.col("tip_amount"), F.lit(0.0)) < 0)
    )
    bad_dur = (F.col("duration_min") < 0) | (F.col("duration_min") > 480)
    return missing, negative, bad_dur


def _flagged(events: DataFrame) -> DataFrame:
    """typed parse + `reason` DQ flag column (NULL = curated)."""
    typed = tf.typed_trips(tf.raw_trips_from_events(events))
    missing, negative, bad_dur = _dq_parts()
    reason = (
        F.when(missing, "missing_required")
        .when(negative, "negative_values")
        .when(bad_dur, "bad_duration")
    )
    return typed.withColumn("reason", reason)


_DLQ_COLS = ("pickup_ts", "dropoff_ts", "vendor_code", "trip_distance",
             "fare_amount", "duration_min", "reason", "loaded_at")


def _dlq_select(flagged: DataFrame) -> DataFrame:
    return flagged.where(F.col("reason").isNotNull()).select(
        F.col("trip_uid").alias("event_id"), *_DLQ_COLS)


def dq_route_stream(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ASA query analog on a streaming frame: typed parse → (curated,
    dlq-with-reason). All narrow ops — no streaming state."""
    flagged = _flagged(events)
    curated = flagged.where(F.col("reason").isNull()).drop("reason")
    return curated, _dlq_select(flagged)


def _reset(*dirs: str) -> None:
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _crash_safe_swap(state_dir: str) -> None:
    """Promote ``state_dir + '_tmp'`` to ``state_dir``, parking the
    previous copy at ``state_dir + '_old'`` during the swap: a crash
    between the renames leaves a COMPLETE recoverable copy (tmp or
    old) — a bare delete-then-rename has a window where no state
    exists at all, and on resume the checkpoint marks the source
    files as seen so lost accumulations are never rebuilt."""
    tmp, old = state_dir + "_tmp", state_dir + "_old"
    _reset(old)
    if os.path.exists(state_dir):
        os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    _reset(old)


def _read_state(spark_b: SparkSession, state_dir: str):
    """Current accumulated state, recovering the parked ``_old`` copy
    if a crash hit mid-swap.  None when no state exists yet."""
    try:
        return spark_b.read.parquet(state_dir)
    except Exception:
        try:
            return spark_b.read.parquet(state_dir + "_old")
        except Exception:
            return None


def _run_available_now(writer_builder) -> None:
    q = writer_builder.trigger(availableNow=True).start()
    q.awaitTermination()


def run_dlq_routing(spark: SparkSession, sf_dir: str, out_dir: str,
                    max_files_per_trigger: int | None = None,
                    source_dir: str | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """Run the routing stream to completion; returns (curated, dlq)
    read back from the parquet sinks."""
    curated_dir = os.path.join(out_dir, "curated")
    dlq_dir = os.path.join(out_dir, "dlq")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(curated_dir, dlq_dir, ckpt)
    flagged = _flagged(events_stream(spark, sf_dir, max_files_per_trigger, source_dir))

    def route(batch: DataFrame, batch_id: int) -> None:
        # one pass over the batch feeds BOTH sinks (the ASA job's
        # 3-output SELECT analog)
        batch.persist()
        try:
            batch.where(F.col("reason").isNull()).drop("reason").write.mode(
                "append").parquet(curated_dir)
            _dlq_select(batch).write.mode("append").parquet(dlq_dir)
        finally:
            batch.unpersist()

    _run_available_now(
        flagged.writeStream.foreachBatch(route)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(curated_dir), spark.read.parquet(dlq_dir)


def _commit_raw_batch(table: str, batch: DataFrame,
                      batch_id: int) -> None:
    """Idempotent raw-archive commit: append the micro-batch through
    the transaction log with its batch id in the manifest meta, so a
    redelivered batch (checkpoint rollback — foreachBatch's
    at-least-once contract) is SKIPPED instead of re-landing duplicate
    raw rows.  The skip test walks manifest metas newest-first to the
    most recent batch_id (robust to interleaved compact/restore/merge
    commits that carry none) — metadata-only, no data scan.  Shared by
    run_raw_archive (default path), run_raw_archive_txn, and the
    curated run_txn_sink — both lanes get the same date-scoped
    replay pruning.

    Each commit is PARTITIONED BY ``__date`` (txnlog
    partition_by): one manifest dir per event date per micro-batch —
    the txn-layer twin of the plain archive's ASA pathPattern
    'date={date}/...' top level — so a date-scoped replay
    (``snapshot(prune=("__date", lo, hi))``) opens only that date's
    dirs of EVERY batch commit instead of every batch's whole
    output.  ``__hour`` rides as an ordinary data column; at
    warehouse scale (micro-batches spanning ~one hour) add it to
    partition_by — at test scale a month-wide batch would shatter
    into 700+ dirs for no pruning gain."""
    from ..operators import txnlog

    if batch_id <= _committed_batch_high(table):
        return  # redelivery: already durably committed
    txnlog.commit(
        batch.withColumn("__date", F.to_date("ts"))
        .withColumn("__hour", F.hour("ts")),
        table, "append", meta={"batch_id": batch_id},
        partition_by=["__date"])
    _advance_stream_high(table, batch_id)


def _stream_high_path(table: str) -> str:
    return os.path.join(table, "_txn", "_stream_high")


def _advance_stream_high(table: str, batch_id: int) -> None:
    """Best-effort monotone watermark sidecar, written AFTER the txn
    commit lands.  Belt to the manifest walk's braces: if vacuum has
    dropped every manifest that carried a batch_id (a long maintenance
    run after the last batch), the walk alone would return -1 and
    reopen the duplicate-redelivery hole; the sidecar survives vacuum.
    A crash between commit and sidecar write is covered the other way
    round — the manifest walk still sees the committed batch."""
    p = _stream_high_path(table)
    tmp = f"{p}.tmp-{os.getpid()}"
    try:
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, p)
    except OSError:
        if os.path.exists(tmp):
            os.remove(tmp)


def _committed_batch_high(table: str) -> int:
    """Highest batch_id durably committed to ``table``: max of the
    manifest-history walk (newest-first, first batch_id found — batch
    ids are monotone so the newest holder is the max) and the
    ``_stream_high`` sidecar.  Reading only the LATEST manifest is
    wrong — an interleaved non-stream commit (compact / restore /
    merge) carries no batch_id and would reset the watermark to -1,
    re-landing a redelivered batch as duplicates.  The walk covers a
    crash between commit and sidecar write; the sidecar covers
    manifests vacuumed past the last stream commit.  O(1) JSON reads
    in steady state.

    Interaction with ``txnlog.restore()``: a restore commit carries no
    batch_id, so the walk descends PAST it to the pre-restore stream
    commits and the sidecar survives — batches rolled back by the
    restore stay skipped on redelivery.  That is the right default
    for a CONTINUING stream (a restore of unrelated bad data must not
    re-land every stream batch as duplicates); when the intent is to
    REPLAY the stream into the restored table, call
    ``reset_stream_high_for_replay`` after the restore — it stamps a
    rewound batch_id commit the walk stops at and rewrites the
    sidecar."""
    from ..operators import txnlog

    walk = -1
    v = txnlog.latest_version(table)
    while v is not None and v >= 0:
        try:
            man = txnlog._read_manifest(table, v)
        except FileNotFoundError:  # vacuumed tail
            break
        b = man.get("meta", {}).get("batch_id")
        if b is not None:
            walk = b
            break
        v -= 1
    side = -1
    try:
        with open(_stream_high_path(table)) as fh:
            side = int(fh.read().strip())
    except (OSError, ValueError):
        pass
    return max(walk, side)


def reset_stream_high_for_replay(table: str,
                                 to_version: int | None = None) -> int:
    """Rewind the exactly-once watermark after a ``txnlog.restore()``
    so the stream can be REPLAYED into the restored table: recompute
    the batch high AS OF the restored-to version's lineage, publish
    it in a metadata-only commit (same dirs/stats/schema as the
    restore — the newest-first manifest walk finds this batch_id and
    stops, never descending to the pre-restore stream commits), and
    rewrite the ``_stream_high`` sidecar to match.  Without this,
    batches rolled back by the restore are skipped forever on
    redelivery (_committed_batch_high's documented
    continuing-stream default).  ``to_version`` defaults to the
    latest commit's ``restored_from`` meta; raises ValueError when
    the latest commit is not a restore and no version is given."""
    from ..operators import txnlog

    v = txnlog.latest_version(table)
    if v is None:
        raise FileNotFoundError(f"no committed version under {table}")
    man = txnlog._read_manifest(table, v)
    rf = man.get("meta", {}).get("restored_from") \
        if to_version is None else to_version
    if rf is None:
        raise ValueError(
            "latest commit is not a restore; pass to_version")
    high = -1
    for w in range(rf, -1, -1):
        try:
            m2 = txnlog._read_manifest(table, w)
        except FileNotFoundError:  # vacuumed tail
            break
        b = m2.get("meta", {}).get("batch_id")
        if b is not None:
            high = b
            break
    txnlog._commit_manifest(
        table, v + 1, "overwrite", man["dirs"],
        {"batch_id": high, "stream_replay_reset": True},
        man.get("stats", {}), man.get("rows", {}),
        man.get("bloom_cols", []), man.get("schema"),
        partition_by=man.get("partition_by", []),
        dv=man.get("dv", []))
    p = _stream_high_path(table)
    tmp = f"{p}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(str(high))
    os.replace(tmp, p)
    return high


def run_raw_archive(spark: SparkSession, sf_dir: str, out_dir: str,
                    max_files_per_trigger: int | None = None,
                    source_dir: str | None = None,
                    exactly_once: bool = False) -> DataFrame:
    """The ASA job's THIRD output — the raw passthrough sink
    (infra/scripts/asa-wire.sh:73 'raw JSON lines' outBlob, :246
    '/* 3) keep raw */ SELECT * INTO [outBlob] FROM [inEH]'): archive
    every input record verbatim alongside the curated/DLQ routing, so
    replay and audit never depend on the parse staying correct.

    One batch scan feeds all three sinks.  Returns the read-back
    archive — by construction the identity of the input feed, which is
    the FULL oracle.

    Delivery semantics: AT-LEAST-ONCE plain blob appends by default —
    the documented on-disk contract of this archive is the ASA output
    pathPattern 'date={date}/{time}' as date/hour-partitioned plain
    parquet that EXTERNAL consumers read directly (a foreachBatch
    retry could re-land a batch; replayers dedupe on event_id).
    ``exactly_once=True`` switches the copy to transaction-log
    commits with batch-id idempotency (_commit_raw_batch) — a
    DIFFERENT layout (_txn-managed table) that plain-parquet readers
    must not point at, which is why it is opt-in here and the default
    contract of the separate ``run_raw_archive_txn`` entry.  Flipping
    the default would silently break external raw/ consumers and
    make a pre-existing plain archive invisible to the snapshot
    readback."""
    raw_dir = os.path.join(out_dir, "raw")
    curated_dir = os.path.join(out_dir, "curated")
    dlq_dir = os.path.join(out_dir, "dlq")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(raw_dir, curated_dir, dlq_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)

    def route(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            if exactly_once:
                _commit_raw_batch(raw_dir, batch, batch_id)
            else:
                (batch
                 .withColumn("__date", F.to_date("ts"))
                 .withColumn("__hour", F.hour("ts"))
                 .write.mode("append").partitionBy("__date", "__hour")
                 .parquet(raw_dir))
            flagged = _flagged(batch).persist()
            try:
                flagged.where(F.col("reason").isNull()).drop(
                    "reason").write.mode("append").parquet(curated_dir)
                _dlq_select(flagged).write.mode("append").parquet(dlq_dir)
            finally:
                flagged.unpersist()
        finally:
            batch.unpersist()

    _run_available_now(
        ev.writeStream.foreachBatch(route)
        .option("checkpointLocation", ckpt))
    if exactly_once:
        from ..operators import txnlog

        back = txnlog.snapshot(spark, raw_dir)
    else:
        back = spark.read.parquet(raw_dir)
    return back.select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


def run_raw_archive_txn(spark: SparkSession, sf_dir: str, out_dir: str,
                        max_files_per_trigger: int | None = None,
                        source_dir: str | None = None,
                        resume: bool = False) -> DataFrame:
    """EXACTLY-ONCE variant of the raw archive: the passthrough copy
    appends through the transaction log (operators/txnlog.py) with the
    micro-batch id in the manifest meta, so a redelivered batch
    (checkpoint rollback — foreachBatch's at-least-once contract) is
    skipped instead of re-landing duplicate raw rows.  This is
    run_txn_sink's idempotent-commit pattern applied to the archive
    lane: consumers that dedupe on event_id keep using the plain
    at-least-once archive (run_raw_archive, faithful to the ASA blob
    output); consumers that want the archive itself to be a clean
    replay substrate read this table's snapshots.

    Commits are partitioned by ``__date`` (one manifest dir per
    event date per batch — see _commit_raw_batch), so date-scoped
    replays prune through the ordinary ``snapshot(prune=...)``;
    ``__hour`` rides as an ordinary data column.
    Returns the input-identity projection of the final snapshot —
    append is batching-independent, so the batch events table is a
    FULL oracle."""
    from ..operators import txnlog

    table = os.path.join(out_dir, "raw_txn")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(table, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        _commit_raw_batch(table, batch, batch_id)

    _run_available_now(
        ev.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt))
    snap = txnlog.snapshot(spark, table)
    return snap.select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


def run_windowed_audit(spark: SparkSession, sf_dir: str, out_dir: str,
                       max_files_per_trigger: int | None = None,
                       source_dir: str | None = None) -> DataFrame:
    """Watermarked tumbling-hour quality audit, maintained by merging
    each micro-batch's partial counts into the sink (update-mode
    equivalent via foreachBatch sum-merge)."""
    audit_dir = os.path.join(out_dir, "audit")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(audit_dir, ckpt)
    typed = tf.typed_trips(tf.raw_trips_from_events(
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)))
    missing = F.col("pickup_ts").isNull() | F.col("dropoff_ts").isNull()
    negative = (
        (F.coalesce(F.col("trip_distance"), F.lit(0.0)) < 0)
        | (F.coalesce(F.col("fare_amount"), F.lit(0.0)) < 0)
        | (F.coalesce(F.col("tip_amount"), F.lit(0.0)) < 0)
    )
    bad_dur = (F.col("duration_min") < 0) | (F.col("duration_min") > 480)
    is_dlq = missing | negative | bad_dur
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    agg = (
        typed.withWatermark("loaded_at", "2 hours")
        .groupBy(F.window("loaded_at", "1 hour").alias("w"))
        .agg(
            one(~is_dlq).alias("good_rows"),
            one(is_dlq).alias("dlq_rows"),
            one(missing).alias("missing_required"),
            one(~missing & negative).alias("negative_values"),
            one(~missing & ~negative & bad_dur).alias("bad_duration"),
        )
        .select(F.col("w.start").alias("hour_bucket"), "good_rows", "dlq_rows",
                "missing_required", "negative_values", "bad_duration")
    )

    def merge_counts(batch: DataFrame, batch_id: int) -> None:
        # update-mode emissions are the COMPLETE current totals per
        # window → merge is replace-by-key (latest emission wins)
        spark_b = batch.sparkSession
        prev = _read_state(spark_b, audit_dir)
        merged = batch if prev is None else (
            prev.join(batch.select("hour_bucket"), "hour_bucket", "left_anti")
            .unionByName(batch)
        )
        merged.write.mode("overwrite").parquet(audit_dir + "_tmp")
        _crash_safe_swap(audit_dir)

    _run_available_now(
        agg.writeStream.outputMode("update").foreachBatch(merge_counts)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(audit_dir)


def run_quality_log(spark: SparkSession, sf_dir: str, out_dir: str,
                    run_id: str = "stream-run-001",
                    max_files_per_trigger: int | None = None,
                    source_dir: str | None = None,
                    resume: bool = False) -> DataFrame:
    """Run-scoped streaming quality log + success marker.

    Reference parity: sql/streaming/staging/
    0009_stg.usp_log_quality_for_run.sql (per run_id+hour good/dlq/
    per-reason counts into stg.TripsStreaming_Quality_Audit) and
    0006_LogSuccess.sql (a SUCCEEDED ops row once the run completes).

    Each micro-batch aggregates its rows per (run_id, hour bucket) and
    SUM-merges into the log table — counts are additive and every event
    row is counted exactly once, so the final table is
    batching-independent and equals the batch quality_audit with the
    run_id column attached (FULL oracle).  After the stream drains, a
    LogSuccess marker row (run_id, status, total good/dlq) is appended
    to <out>/run_log.

    Scale: per batch the shuffle carries ≤ |hours in batch| partial
    rows; the log table stays |run_ids × hours| — tiny."""
    log_dir = os.path.join(out_dir, "quality_log")
    marker_dir = os.path.join(out_dir, "run_log")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(log_dir, marker_dir, ckpt)
    # resume=True keeps checkpoint + log state: the file source replays
    # only UNSEEN files, so the additive merge stays exactly-once —
    # the crash/restart recovery contract (tests pin it)
    typed = tf.typed_trips(tf.raw_trips_from_events(
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)))
    missing, negative, bad_dur = _dq_parts()
    is_dlq = missing | negative | bad_dur
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    flagged = typed.select(
        F.lit(run_id).alias("run_id"),
        F.date_trunc("hour", F.col("loaded_at")).alias("hour_bucket"),
        missing.alias("__miss"), negative.alias("__neg"),
        bad_dur.alias("__bad"), is_dlq.alias("__dlq"))

    def merge_log(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        part = (batch.groupBy("run_id", "hour_bucket").agg(
            one(~F.col("__dlq")).alias("good_rows"),
            one(F.col("__dlq")).alias("dlq_rows"),
            one(F.col("__miss")).alias("missing_required"),
            one(~F.col("__miss") & F.col("__neg")).alias("negative_values"),
            one(~F.col("__miss") & ~F.col("__neg") & F.col("__bad"))
            .alias("bad_duration")))
        prev = _read_state(spark_b, log_dir)
        merged = part if prev is None else (
            prev.unionByName(part)
            .groupBy("run_id", "hour_bucket")
            .agg(*[F.sum(c).cast("bigint").alias(c)
                   for c in ("good_rows", "dlq_rows", "missing_required",
                             "negative_values", "bad_duration")]))
        merged.write.mode("overwrite").parquet(log_dir + "_tmp")
        _crash_safe_swap(log_dir)

    _run_available_now(
        flagged.writeStream.foreachBatch(merge_log)
        .option("checkpointLocation", ckpt))
    final = spark.read.parquet(log_dir)
    # LogSuccess analog: one SUCCEEDED marker with the run totals
    totals = final.agg(
        F.sum("good_rows").cast("bigint").alias("good_rows"),
        F.sum("dlq_rows").cast("bigint").alias("dlq_rows")).collect()[0]
    spark.createDataFrame(
        [(run_id, "SUCCEEDED", totals["good_rows"], totals["dlq_rows"])],
        "run_id string, status string, good_rows bigint, dlq_rows bigint",
    ).coalesce(1).write.mode("overwrite").parquet(marker_dir)
    return final


def run_streaming_dedupe(spark: SparkSession, sf_dir: str, out_dir: str,
                         max_files_per_trigger: int | None = None,
                         source_dir: str | None = None) -> DataFrame:
    """dropDuplicates on the business key with a watermark bounding the
    dedup state — first arrival wins (the streaming-native contract;
    the warehouse layer's latest-wins merge refines it)."""
    dedup_dir = os.path.join(out_dir, "dedup")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(dedup_dir, ckpt)
    typed = tf.typed_trips(tf.raw_trips_from_events(
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)))
    wm = typed.withWatermark("loaded_at", "2 hours")
    # dropDuplicatesWithinWatermark bounds the dedup state by the
    # watermark horizon (the only viable contract at 100 TB/day);
    # duplicates in this feed arrive ≤1 h late, inside the 2 h horizon.
    try:
        deduped = wm.dropDuplicatesWithinWatermark(["trip_uid"])
    except AttributeError:
        deduped = wm.dropDuplicates(["trip_uid"])
    _run_available_now(
        deduped.writeStream.format("parquet")
        .option("path", dedup_dir)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(dedup_dir)


BLOOM_VERIFY_CAP = 4096


def run_bloom_seeded_dedupe(spark: SparkSession, sf_dir: str,
                            out_dir: str, corpus_table: str,
                            key_col: str = "event_id",
                            max_files_per_trigger: int | None = None,
                            source_dir: str | None = None) -> DataFrame:
    """Streaming dedupe AGAINST AN EXISTING BATCH CORPUS, seeded from
    the corpus's commit-time Bloom sidecars (cross-lane reuse of the
    point-lookup index): the stream must emit only events whose key
    is NOT already in the corpus, without loading corpus-scale key
    state into the state store and without joining every micro-batch
    against the full table.

    Per batch, three tiers:
      1. **Bloom gate (map-side, distributed)**: the corpus's per-dir
         bitmaps OR-union into one bitmap per (m, k, dtype)
         (bloomindex.union_bitmaps — KBs of metadata) folded into the
         plan as literals; ``bloom_maybe_expr`` tests each row with k
         ``getbit`` probes.  A NEGATIVE is PROOF of absence (same
         hash expression and dtype as the build) — those rows pass
         straight through, no corpus I/O at all.
      2. **Verify lookup for bloom hits — never a drop**: a bloom
         positive is only *maybe present* (~1% of genuinely-new keys
         false-positive at default sizing); dropping on the hit would
         silently lose exactly those events.  Hits verify with an
         anti-join: when the batch's hit-key set is small (≤
         BLOOM_VERIFY_CAP, limit-probed) the lookup scans only the
         bloom-surviving dirs (bloom_pruned_snapshot — O(dirs
         holding those keys)); larger hit sets fall back to a
         semi-join against the corpus keys with the SMALL side
         broadcast (corpus never shuffles).
      3. **In-stream dedupe**: duplicates WITHIN the stream dedupe
         through the watermark-bounded state store
         (dropDuplicatesWithinWatermark) — the state holds only the
         watermark horizon's keys, never the corpus (seeding 100 TB
         of corpus keys into the state store is exactly the
         non-design this operator exists to avoid).

    Determinism: output = stream events whose key is absent from the
    corpus, first arrival per key — batch-boundary independent, so
    the batch NOT-IN query is a FULL oracle; the false-positive
    rescue path is pinned by a forced-FP pytest
    (tests/test_streaming_bloom_dedupe.py)."""
    from ..operators import bloomindex, txnlog

    sink = os.path.join(out_dir, "new_events")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(sink, ckpt)
    groups, complete = bloomindex.union_bitmaps(corpus_table, key_col)
    # incomplete sidecar coverage → no gate: every row verifies
    # (conservative, like every pruning path)
    gate = (bloomindex.bloom_maybe_expr(key_col, groups)
            if complete else F.lit(True))
    corpus_keys = txnlog.snapshot(spark, corpus_table) \
        .select(key_col).distinct()
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    wm = ev.withWatermark("ts", "2 hours")
    try:
        deduped = wm.dropDuplicatesWithinWatermark([key_col])
    except AttributeError:  # pragma: no cover - older Spark
        deduped = wm.dropDuplicates([key_col])

    def route(batch: DataFrame, batch_id: int) -> None:
        batch = batch.withColumn("__maybe", gate)
        batch.persist()
        try:
            sure_new = batch.where(~F.col("__maybe")).drop("__maybe")
            hits = batch.where(F.col("__maybe")).drop("__maybe")
            sample = hits.select(key_col).distinct() \
                .limit(BLOOM_VERIFY_CAP + 1).collect()
            if len(sample) <= BLOOM_VERIFY_CAP:
                # point-lookup scale: open only bloom-surviving dirs
                lookup = bloomindex.bloom_pruned_snapshot(
                    spark, corpus_table, key_col,
                    [r[0] for r in sample]).select(key_col).distinct()
                present = F.broadcast(lookup)
            else:
                # bulk scale: corpus scans in place, hit keys broadcast
                present = F.broadcast(
                    corpus_keys.join(
                        F.broadcast(hits.select(key_col).distinct()),
                        key_col, "left_semi"))
            verified_new = hits.join(present, key_col, "left_anti")
            (sure_new.unionByName(verified_new)
             .write.mode("append").parquet(sink))
        finally:
            batch.unpersist()

    _run_available_now(
        deduped.writeStream.foreachBatch(route)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(sink).select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


def run_stream_stream_join(spark: SparkSession, sf_dir: str, out_dir: str,
                           max_files_per_trigger: int | None = None,
                           source_dir: str | None = None) -> DataFrame:
    """Stream-stream event-time interval join: each purchase matched to
    the same user's clicks in the preceding hour (click attribution).

    Watermarks on BOTH sides + the time-range join condition bound the
    buffered state to ~2 h of events per side — the only viable
    stream-join contract at scale (an unbounded-state join OOMs).  An
    inner join emits exactly the set of matching pairs regardless of
    micro-batch boundaries, so the sink equals the batch join — FULL
    oracle parity."""
    join_dir = os.path.join(out_dir, "joined")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(join_dir, ckpt)
    clicks = (
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
        .where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user_id"),
                F.col("event_id").alias("click_event_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id",
                F.col("event_id").alias("purchase_event_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"))
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr("""
            user_id = c_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts < click_ts + INTERVAL 1 HOUR
        """),
    ).drop("c_user_id")
    _run_available_now(
        joined.writeStream.format("parquet")
        .option("path", join_dir)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(join_dir)


def run_stream_stream_left_join(spark: SparkSession, sf_dir: str, out_dir: str,
                                max_files_per_trigger: int | None = None,
                                source_dir: str | None = None) -> DataFrame:
    """Stream-stream LEFT OUTER event-time interval join: every purchase
    emits — joined to each same-user click in the preceding hour, or
    with NULL click columns once the watermark proves no click can
    arrive.

    Outer-join emission is watermark-driven: an unmatched purchase is
    held in state until watermark > purchase_ts + horizon, and the
    final watermark is bounded by the LAGGING input — min over both
    sides of (per-side max event time) − delay.  The read-back
    therefore CUTS at min(click max_ts, purchase max_ts) − 2 h
    (watermark) − 1 min (strictness margin) — below that, every
    purchase has either matched or been evicted as unmatched, making
    the batch left join with the identical cutoff a FULL oracle.  The
    tail above the cutoff is exactly the rows a live deployment would
    still be buffering.

    Scale: both sides' state is bounded by the 2 h horizon; the join
    shuffles on user_id (high-cardinality)."""
    join_dir = os.path.join(out_dir, "joined")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(join_dir, ckpt)
    clicks = (
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
        .where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user_id"),
                F.col("event_id").alias("click_event_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id",
                F.col("event_id").alias("purchase_event_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr("""
            user_id = c_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts < click_ts + INTERVAL 1 HOUR
        """),
        "leftOuter",
    ).drop("c_user_id")
    _run_available_now(
        joined.writeStream.format("parquet")
        .option("path", join_dir)
        .option("checkpointLocation", ckpt))
    back = spark.read.parquet(join_dir)
    # the engine's global watermark is the MIN across both inputs
    # (a lagging click stream holds back purchase eviction): an
    # unmatched purchase emits only once min(click_max, purchase_max)
    # − 2 h passes its event time.  Cut one strict minute below that.
    ev = tf.events_ts_fixed(spark, sf_dir)
    side_max = (ev.where(F.col("event_type").isin("click", "purchase"))
                .groupBy("event_type").agg(F.max("ts").alias("m")))
    cutoff = (side_max.agg(F.min("m").alias("mm"))
              .select(F.expr("mm - INTERVAL '2:01' HOUR TO MINUTE"))
              .collect()[0][0])
    return back.where(F.col("purchase_ts") <= F.lit(cutoff))


def run_upsert(spark: SparkSession, sf_dir: str, out_dir: str,
               max_files_per_trigger: int | None = None,
               source_dir: str | None = None) -> DataFrame:
    """Hourly-upsert analog: per micro-batch, build the clean slice,
    dedupe it, and latest-wins-merge into the warehouse parquet dir.

    The merge order (loaded_at DESC, source_file_name DESC) is total, so
    warehouse_final = latest_wins(all slice rows) regardless of how the
    stream was batched — byte-identical to the batch trip_clean."""
    wh_dir = os.path.join(out_dir, "warehouse")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(wh_dir, ckpt)
    slice_stream = tf.clean_slice(tf.typed_trips(tf.raw_trips_from_events(
        events_stream(spark, sf_dir, max_files_per_trigger, source_dir))))

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        incoming = latest_wins(batch, ["trip_uid"], _order_by())
        prev = _read_state(spark_b, wh_dir)
        merged = incoming if prev is None else latest_wins(
            prev.unionByName(incoming), ["trip_uid"], _order_by())
        merged.write.mode("overwrite").parquet(wh_dir + "_tmp")
        _crash_safe_swap(wh_dir)

    _run_available_now(
        slice_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(wh_dir)


def run_dim_enrich(spark: SparkSession, sf_dir: str, out_dir: str,
                   max_files_per_trigger: int | None = None,
                   source_dir: str | None = None) -> DataFrame:
    """Stream-static broadcast enrichment: each micro-batch joins the
    event stream against a STATIC user-profile dimension (spend
    quartile, computed once batch-side) — the canonical hot-path lookup
    against a REPLICATE dim (the reference resolves streaming trips
    against the same mdl.dim_* tables:
    usp_upsert_fact_trip_streaming.sql).

    Stream-static inner joins are stateless — each batch probes the
    broadcast hash table and emits; the sink row set is therefore
    batching-independent, so the read-back rollup carries a FULL batch
    oracle.  The profile's quartile uses ntile with a total tiebreak
    (total_value, user_id) → deterministic on both engines."""
    enriched_dir = os.path.join(out_dir, "enriched")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(enriched_dir, ckpt)

    batch_ev = tf.events_ts_fixed(spark, sf_dir)
    # user tiers via the DISTRIBUTED rank + closed-form NTILE
    # (operators/ranks.py) — the per-user frame grows linearly with
    # the business, so no unpartitioned Window (same rebuild as
    # ntile_quartiles; output bit-identical)
    from ..operators.ranks import ntile_expr, with_global_rank

    spend = (batch_ev.groupBy("user_id")
             .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                  .alias("__total")))
    ranked, totals = with_global_rank(
        spend, [F.col("__total").desc(), F.col("user_id").asc()])
    n_users, _ = totals.get((), (0, None))
    if n_users:
        profile = ranked.select(
            "user_id", ntile_expr("__r", n_users, 4).cast("int")
            .alias("user_tier"))
    else:
        profile = spend.select(
            "user_id", F.lit(None).cast("int").alias("user_tier"))

    st = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    enriched = st.join(F.broadcast(profile), "user_id").select(
        "event_id", "user_id", "event_type", "user_tier",
        F.col("value").cast("decimal(18,2)").alias("value_dec"))

    _run_available_now(
        enriched.writeStream.format("parquet")
        .option("path", enriched_dir)
        .option("checkpointLocation", ckpt))
    back = spark.read.parquet(enriched_dir)
    return (back.groupBy("event_type", "user_tier")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum("value_dec").cast("double")
                 .alias("total_value")))


def run_distinct_sketch(spark: SparkSession, sf_dir: str,
                        out_dir: str,
                        max_files_per_trigger: int | None = None,
                        source_dir: str | None = None,
                        resume: bool = False) -> DataFrame:
    """Streaming distinct-cardinality sketch per event_type: the
    deterministic hash-threshold KMV variant (same construction as the
    batch corpus sketch, operators/corpus.py distinct_token_estimate)
    maintained incrementally over the event stream.

    State = ONLY the survivor set {(event_type, user_id) :
    md5-prefix(user_id) < thr} — a fixed 1/32 hash-domain sample, so
    state is bounded at ~|distinct users|/32 regardless of stream
    length, and the per-batch merge is a set UNION (idempotent +
    commutative + associative ⇒ the drained table is batching- and
    arrival-order-independent: FULL oracle against the batch events
    table).  HLL gives the same bound with smaller constants but an
    engine-specific register layout; the md5-threshold sketch trades a
    constant factor for bit-reproducibility (and keeps the driver's
    hash check meaningful).

    Reference parity: the streaming lane's incremental quality/ops
    rollups (sql/streaming/staging/0009_usp_log_quality_for_run.sql)
    generalized to a mergeable cardinality sketch."""
    state_dir = os.path.join(out_dir, "sketch_state")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(state_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    surv = (
        ev.select("event_type", F.col("user_id").cast("string").alias("uid"))
        .where(F.substring(F.md5(F.col("uid")), 1, 4) < F.lit("0800"))
    )

    def merge_survivors(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        part = batch.distinct()
        prev = _read_state(spark_b, state_dir)
        merged = part if prev is None else prev.unionByName(part).distinct()
        merged.write.mode("overwrite").parquet(state_dir + "_tmp")
        _crash_safe_swap(state_dir)

    _run_available_now(
        surv.writeStream.foreachBatch(merge_survivors)
        .option("checkpointLocation", ckpt))
    state = spark.read.parquet(state_dir)
    return state.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.round(F.count("*") * F.lit(32.0), 1).alias("est_distinct"),
    )


def run_txn_sink(spark: SparkSession, sf_dir: str, out_dir: str,
                 max_files_per_trigger: int | None = None,
                 source_dir: str | None = None,
                 resume: bool = False) -> DataFrame:
    """EXACTLY-ONCE streaming sink: every micro-batch appends through
    the transaction log (operators/txnlog.py) with its batch id in the
    manifest meta, and a redelivered batch (checkpoint rollback /
    foreachBatch retry — Spark's at-least-once contract) is SKIPPED
    when its id is <= the last committed one.  This is the canonical
    idempotent-foreachBatch pattern that upgrades at-least-once to
    exactly-once for transactional sinks; readers see only whole
    batches (snapshot isolation), never a torn write.

    Commits are PARTITIONED BY ``__date`` exactly like the raw
    archive's (_commit_raw_batch, shared): one manifest dir per
    event date per micro-batch, so a date-scoped replay of the
    CURATED lane (``snapshot(prune=("__date", lo, hi))``) opens only
    that date's dirs of every batch commit — the reference's
    streaming MERGE targets the date-sliced core table the same way
    (sql/streaming/staging/
    usp_upsert_trip_clean_from_slice_streaming.sql:1).

    Returns the per-event_type rollup of the final snapshot — append
    is order/batching-independent, so the batch events table is a FULL
    oracle."""
    from ..operators import txnlog

    table = os.path.join(out_dir, "table")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(table, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        _commit_raw_batch(table, batch, batch_id)

    _run_available_now(
        ev.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt))
    snap = txnlog.snapshot(spark, table)
    return snap.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double"), 6).alias("value_sum"),
    )


def build_txn_stream_source(spark: SparkSession, sf_dir: str,
                            table: str, upto_day: int = 31) -> int:
    """Seed (or extend) the SOURCE table for the txn stream-read
    pipeline: trip_clean split into three day-range commits (v0
    overwrite days ≤10, v1 append 11–20, v2 append ≥21), truncated at
    ``upto_day`` so the restart pytest can grow the table between
    runs.  Returns the latest committed version."""
    from ..operators import txnlog
    from ..session import pin

    clean = tf.trip_clean(
        tf.typed_trips(tf.raw_trips(spark, sf_dir))).transform(pin)
    day = F.dayofmonth("ingest_date")
    slices = [(day <= 10, "overwrite"),
              ((day >= 11) & (day <= 20), "append"),
              (day >= 21, "append")]
    bounds = (10, 20, 31)
    done = txnlog.latest_version(table)
    for i, (cond, mode) in enumerate(slices):
        if bounds[i] > upto_day:
            break
        if done is not None and i <= done:
            continue  # already committed on a previous run
        txnlog.commit(clean.where(cond), table, mode)
    return txnlog.latest_version(table)


def run_txn_stream_copy(spark: SparkSession, sf_dir: str,
                        out_dir: str, resume: bool = False,
                        upto_day: int = 31) -> DataFrame:
    """End-to-end EXACTLY-ONCE log-to-log pipeline: a transaction-log
    table consumed AS A STREAM (streaming/txn_source.py
    read_stream_txn — per-micro-batch consumption of newly committed
    versions, Delta's ``readStream.format("delta")`` shape) feeding
    the idempotent txn SINK (batch id in the manifest meta,
    redeliveries skipped) — the reference's hourly curated→warehouse
    consumer (orchestration/adf/pipeline/
    pl_streaming_curated_to_stg_core_mdl.json +
    t_hourly_backfill_streaming.json) as one checkpointed stream
    instead of a poll loop.

    Version offsets ride in the stream checkpoint: ``resume=True``
    keeps the source table, sink, and checkpoint, so appending new
    commits to the source and re-running continues at the next
    unconsumed version (the restart pytest drives this; stop →
    commit → resume delivers every row exactly once).

    Returns the per-ingest_date rollup of the final SINK snapshot —
    consumption is version-ordered append-for-append, so the rollup
    is batching-independent and the batch trip_clean table is a FULL
    oracle.  ``source_versions`` rides along as a structural pin
    (3 commits consumed)."""
    from ..operators import txnlog
    from .txn_source import read_stream_txn

    source = os.path.join(out_dir, "source")
    sink = os.path.join(out_dir, "sink")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(source, sink, ckpt)
    src_v = build_txn_stream_source(spark, sf_dir, source, upto_day)
    st = read_stream_txn(spark, source, starting_version=0)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _committed_batch_high(sink):
            return  # redelivery: already durably committed
        txnlog.commit(batch, sink, "append",
                      meta={"batch_id": batch_id})
        _advance_stream_high(sink, batch_id)

    _run_available_now(
        st.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt))
    snap = txnlog.snapshot(spark, sink)
    return snap.groupBy("ingest_date").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("fare_amount").cast("decimal(18,2)"))
        .cast("double").alias("fare_sum"),
        F.countDistinct("trip_uid").cast("bigint").alias("n_trips"),
    ).withColumn("source_versions",
                 F.lit(int(src_v) + 1).cast("int"))


def run_txn_stream_backpressure(spark: SparkSession, sf_dir: str,
                                out_dir: str) -> DataFrame:
    """The txn stream-copy pipeline under ADMISSION CONTROL
    (streaming/txn_source.py maxVersionsPerTrigger — Delta's
    maxFilesPerTrigger shape): the same 3-commit source drained with
    a ONE-VERSION-per-trigger cap through repeated availableNow runs
    (the pinned single-batch fallback: each run = one capped batch,
    checkpoint progress between runs).  Structural proof the cap
    bounded every batch: the idempotent txn SINK commits once per
    micro-batch, so ``sink_versions`` = 3 — an UNCAPPED availableNow
    run would land all three source versions as ONE batch (= 1 sink
    version); ``n_runs`` = 3 pins the drain length.  Content proof:
    version-ordered append-for-append consumption is
    batching-independent, so the final per-date rollup equals the
    batch trip_clean rollup regardless of the cap.  Reference
    parity: the hourly trigger's inherent one-slice-per-poll
    batching (orchestration/adf/trigger/
    t_hourly_backfill_streaming.json) as engine-level rate
    limiting."""
    from ..operators import txnlog
    from .txn_source import read_stream_txn

    source = os.path.join(out_dir, "source")
    sink = os.path.join(out_dir, "sink")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(source, sink, ckpt)
    build_txn_stream_source(spark, sf_dir, source)
    want = txnlog.snapshot(spark, source).count()
    st = read_stream_txn(spark, source, starting_version=0,
                         max_versions_per_trigger=1)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _committed_batch_high(sink):
            return  # redelivery: already durably committed
        txnlog.commit(batch, sink, "append",
                      meta={"batch_id": batch_id})
        _advance_stream_high(sink, batch_id)

    runs = 0
    while runs < 8:
        _run_available_now(
            st.writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", ckpt))
        runs += 1
        if txnlog.snapshot(spark, sink).count() >= want:
            break
    sink_versions = txnlog.latest_version(sink) + 1
    snap = txnlog.snapshot(spark, sink)
    return (snap.groupBy("ingest_date").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("fare_amount").cast("decimal(18,2)"))
        .cast("double").alias("fare_sum"),
        F.countDistinct("trip_uid").cast("bigint").alias("n_trips"))
        .withColumn("n_runs", F.lit(int(runs)).cast("int"))
        .withColumn("sink_versions",
                    F.lit(int(sink_versions)).cast("int")))


def run_group_sink(spark: SparkSession, sf_dir: str, out_dir: str,
                   max_files_per_trigger: int | None = None,
                   source_dir: str | None = None,
                   resume: bool = False) -> DataFrame:
    """Streaming sink where EVERY micro-batch lands the curated fact
    append AND its run-log row in ONE transaction group
    (operators/txnlog.py commit_group): readers see both tables'
    new versions or neither — the reference's sp-wrapped streaming
    upsert, which INSERTs the quality-log/audit row in the same
    batch as the fact MERGE
    (sql/streaming/staging/0009_stg.usp_log_quality_for_run.sql:1 +
    0006_LogSuccess.sql:1 around usp_upsert_fact_trip_streaming.sql),
    so a crash between fact and log can never leave an audited-but-
    unlogged (or logged-but-unaudited) run.

    Exactly-once composes with the group: the batch id rides in BOTH
    member manifests' meta, the skip test is the fact table's
    committed-batch high (group atomicity ⇒ fact committed iff log
    committed, so one high covers both), and a redelivered batch is
    skipped before any write.  A member failure mid-group unwinds
    the already-published member manifest — neither table advances
    (pinned by the mid-stream failure pytest).

    Scale: per micro-batch this costs the two members' own commits
    plus two tiny JSON publishes (commit_group's coordinator
    record) — nothing per-row and no cross-table lock; the run-log
    row is a one-row aggregate of the in-memory batch.

    Returns the per-event_type rollup of the final fact snapshot
    (append is batching-independent ⇒ the batch events table is a
    FULL oracle) plus two structurally-computed lockstep flags:
    versions_lockstep (fact and run-log latest versions are equal)
    and log_totals_match (run-log row/error totals equal the fact
    snapshot's, and there is exactly one log row per committed
    version) — TRUE constants to the oracle, live assertions here."""
    from ..operators import txnlog

    fact = os.path.join(out_dir, "fact")
    runlog = os.path.join(out_dir, "runlog")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(fact, runlog, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _committed_batch_high(fact):
            return  # redelivery: the whole group already landed
        log_row = batch.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("event_type") == "error", 1)
                  .otherwise(0)).cast("bigint").alias("n_error"),
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint")) \
         .withColumn("status", F.lit("success"))
        txnlog.commit_group(
            [(batch, fact), (log_row, runlog)], mode="append",
            meta={"batch_id": batch_id})
        _advance_stream_high(fact, batch_id)

    _run_available_now(
        ev.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt))

    fact_v = txnlog.latest_version(fact)
    if fact_v is None:
        # zero micro-batches (empty source feed): neither table was
        # ever created — snapshot() would raise and `fact_v >= 0`
        # would TypeError on None.  Return the empty rollup with the
        # lockstep flags FALSE: "nothing committed" is not lockstep
        # evidence (r9 ADVICE guard; the catalog feed is never empty
        # but reuse outside it can be).
        return spark.createDataFrame(
            [], "event_type string, n_events bigint, "
                "value_sum double, versions_lockstep boolean, "
                "log_totals_match boolean")
    log_v = txnlog.latest_version(runlog)
    snap = txnlog.snapshot(spark, fact)
    fact_tot = snap.agg(
        F.count("*").cast("bigint"),
        F.sum(F.when(F.col("event_type") == "error", 1)
              .otherwise(0)).cast("bigint")).collect()[0]
    log_tot = txnlog.snapshot(spark, runlog).agg(
        F.sum("n_rows").cast("bigint"),
        F.sum("n_error").cast("bigint"),
        F.count("*").cast("bigint")).collect()[0]
    lockstep = bool(fact_v >= 0 and fact_v == log_v)
    totals_match = bool(
        log_tot[0] == fact_tot[0] and log_tot[1] == fact_tot[1]
        and log_tot[2] == fact_v + 1)
    return snap.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double"), 6).alias("value_sum"),
    ).withColumn("versions_lockstep", F.lit(lockstep)) \
     .withColumn("log_totals_match", F.lit(totals_match))


def run_gdpr_delete_sink(spark: SparkSession, sf_dir: str,
                         out_dir: str,
                         max_files_per_trigger: int | None = None,
                         source_dir: str | None = None,
                         resume: bool = False) -> DataFrame:
    """Streaming ERASURE at tombstone cost — the curated lane's GDPR
    path at streaming cadence: seed the curated table (latest state
    per user over the batch events feed), then stream erasure
    REQUESTS (users with an 'error' event in the FIRST SIXTEENTH of
    the event-time range — a strict subset of users, so the surviving
    state is non-empty and the oracle hash actually discriminates;
    every user here has an error event SOMEWHERE, which made the old
    any-error rule erase everyone and compare 0 rows against 0 rows)
    and apply each micro-batch as ``delete_keys`` DELETION-VECTOR
    tombstones — no copy-on-write rewrite, no data dir touched; the
    point-set envelope + bloom pruning opens only dirs that can hold
    the batch's keys, and the DV chain self-coalesces past
    DV_COALESCE_LIVE_STORES so N chatty erasure batches never cost N
    anti-joins per read.  A batch past the DV_MAX_KEYS broadcast cap
    falls back to merge_apply's bulk copy-on-write delete — the
    documented big-delete path.

    The request-window cut is integer microsecond arithmetic
    (lo + (hi − lo) // 16 over unix_micros bounds of the batch feed)
    so the DuckDB oracle reproduces it bit-exactly with epoch_us.
    Erasure is UNCONDITIONAL BY KEY, so batching/arrival order are
    irrelevant (final state = latest per user, minus every user with
    any in-window erasure request — a full batch oracle) and
    checkpoint redelivery is idempotent by semantics: re-deleting an
    erased key tombstones nothing.  Reference parity: the streaming
    staging lane's key-scoped DELETE
    (sql/streaming/staging/0005_delete.sql:1) against the
    date-sliced core table; Delta's streaming GDPR pattern is the
    same foreachBatch-DELETE shape."""
    from ..operators import txnlog

    table = os.path.join(out_dir, "table")
    ckpt = os.path.join(out_dir, "ckpt")
    if not resume:
        _reset(table, ckpt)
        seed = latest_wins(
            tf.events_ts_fixed(spark, sf_dir)
            .select("user_id", "event_id", "ts", "event_type",
                    "value"),
            ["user_id"],
            [F.col("ts").desc(), F.col("event_id").desc()]
        ).select(
            "user_id", F.col("event_type").alias("last_op"),
            F.round(F.col("value").cast("double"), 6)
            .alias("last_value"),
            F.col("ts").alias("updated_at"))
        txnlog.commit(seed, table, "overwrite",
                      stats_cols=["user_id"], bloom_cols=["user_id"])
    # one scalar-agg collect fixes the deterministic request window;
    # integer µs so the SQL oracle's epoch_us arithmetic matches exactly
    bounds = (tf.events_ts_fixed(spark, sf_dir)
              .agg(F.unix_micros(F.min("ts")).alias("lo"),
                   F.unix_micros(F.max("ts")).alias("hi"))
              .collect()[0])
    cut_us = bounds["lo"] + (bounds["hi"] - bounds["lo"]) // 16
    requests = (
        events_stream(spark, sf_dir, max_files_per_trigger,
                      source_dir)
        .where((F.col("event_type") == "error")
               & (F.unix_micros(F.col("ts")) <= F.lit(cut_us)))
        .select("user_id"))

    def erase(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        keys = batch.select("user_id").distinct()
        probe = keys.limit(txnlog.DV_MAX_KEYS + 1).count()
        if probe == 0:
            return
        if probe > txnlog.DV_MAX_KEYS:
            txnlog.merge_apply(
                spark_b, table,
                keys.withColumn("__del", F.lit(True)),
                ["user_id"], "__del")
        else:
            txnlog.delete_keys(spark_b, table, keys, ["user_id"])

    _run_available_now(
        requests.writeStream.foreachBatch(erase)
        .option("checkpointLocation", ckpt))
    snap = txnlog.snapshot(spark, table)
    # runtime vacuity guard (r9 ADVICE): the non-vacuity of the
    # first-1/16 request window is data-distribution-dependent — at
    # another scale factor the erased set could silently become
    # empty (0==0 against the oracle, the exact r8 failure mode) or
    # all-users (survivors 0==0).  Both counts come from manifest
    # metadata (v0 seed rows; latest rows minus DV tombstones), so
    # the guard costs no data scan at any scale.
    seed_rows = txnlog.metadata_count(table, 0) or 0
    survivors = txnlog.metadata_count(table)
    n_erased = seed_rows - (survivors or 0)
    if not (0 < n_erased < seed_rows):
        raise AssertionError(
            f"GDPR erasure window is vacuous at this scale: "
            f"{seed_rows} seed users, {n_erased} erased — the "
            "oracle comparison no longer discriminates; re-cut the "
            "request window")
    # decimal accumulation: float-sum order would vary with the DV
    # anti-join's partitioning and break the hash oracle
    return snap.groupBy("last_op").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.sum(F.col("last_value").cast("decimal(18,6)"))
                .cast("double"), 6).alias("value_sum"))


def run_two_level_rollup(spark: SparkSession, sf_dir: str, out_dir: str,
                         max_files_per_trigger: int | None = None,
                         source_dir: str | None = None) -> DataFrame:
    """CHAINED stateful streaming aggregation (multiple stateful
    operators in one query — the engine-native continuous-aggregate
    hierarchy): a 5-minute tumbling count feeds an hourly rollup of
    the finalized windows, with the event-time watermark propagating
    through the first aggregate via window_time() so the second can
    finalize its hours (the streaming twin of the batch
    multi_res_rollup 'daily FROM hourly partials' shape).

    Append mode: an hour row emits exactly once, when the watermark
    passes its end — after the availableNow drain the sink holds every
    hour whose end ≤ final watermark (global max ts − 2 h), which is
    the cutoff the batch oracle carries.  n_windows counts the
    distinct finalized 5-minute buckets inside the hour (the partials
    a continuous-aggregate refresh would sum)."""
    roll_dir = os.path.join(out_dir, "hourly")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(roll_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    five = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "5 minutes").alias("w5"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n5"))
    )
    hourly = (
        five
        .groupBy(F.window(F.window_time("w5"), "1 hour").alias("wh"),
                 "event_type")
        .agg(F.sum("n5").cast("bigint").alias("n_events"),
             F.count("*").cast("bigint").alias("n_windows"))
        .select(F.col("wh.start").alias("hour_start"), "event_type",
                "n_events", "n_windows")
    )

    def append_hours(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("append").parquet(roll_dir)

    _run_available_now(
        hourly.writeStream.outputMode("append")
        .foreachBatch(append_hours)
        .option("checkpointLocation", ckpt))
    try:
        return spark.read.parquet(roll_dir)
    except Exception:
        return hourly.limit(0)  # nothing finalized (empty/short feed)


def run_session_windows(spark: SparkSession, sf_dir: str, out_dir: str,
                        max_files_per_trigger: int | None = None,
                        source_dir: str | None = None) -> DataFrame:
    """Streaming sessionization via the BUILT-IN session_window merging
    aggregate (gap 30 min, event-time watermark 2 h) — the streaming
    twin of the batch session_window_agg entry and the engine-native
    alternative to the applyInPandasWithState sessionizer.

    Session windows stream in APPEND mode only: a session row emits
    exactly once, when the event-time watermark passes its end.  After
    the availableNow drain the sink holds every session whose end ≤
    final watermark (global max ts − 2 h); the batch twin filtered at
    the same cutoff is a FULL oracle (the interval-join-outer entry
    uses the same watermark-cutoff comparison)."""
    sess_dir = os.path.join(out_dir, "sessions")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(sess_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("double"), 6).alias("session_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "session_value")
    )

    def append_sessions(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("append").parquet(sess_dir)

    _run_available_now(
        agg.writeStream.outputMode("append").foreachBatch(append_sessions)
        .option("checkpointLocation", ckpt))
    try:
        return spark.read.parquet(sess_dir)
    except Exception:
        return agg.limit(0)  # nothing finalized (empty/short feed)
