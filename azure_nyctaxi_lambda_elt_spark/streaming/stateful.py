"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

Spark has no built-in session operator with arbitrary per-session
aggregates + deterministic ids, so this is the designed-for escape
hatch: state is keyed by user, each micro-batch's rows are walked in
(ts, event_id) order, and every session TOUCHED by the batch is
(re-)emitted; the sink keeps the latest emission per (user_id,
session_id).  Because sessions only depend on per-user event order and
the merge is replace-by-key, the final sink state equals the batch
window-function answer (plans/catalog.py q_sessionize) for any
time-ordered arrival — verified against the same DuckDB oracle.

Numeric exactness: session_value accumulates in INTEGER CENTS
(values are 2-dec decimals), converted to double once at emission —
bit-identical to the oracle's SUM(DECIMAL(18,2))::DOUBLE.

Scale notes: state per key is O(1) (open-session aggregates only, not
buffered events); the shuffle is one hash exchange on user_id; Arrow
batches keep the Python hop columnar. State here never expires
(NoTimeout) because the feed is finite; a production deployment sets
an event-time timeout at the session gap to bound the store.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType, TimestampType)

from .lane import _reset, _run_available_now, events_stream

SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 min in ns (pandas datetime64)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", IntegerType()),
    StructField("n_events", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("session_value", DoubleType()),
])

# open-session register: session_id, n_events, start_ns, last_ns, cents
STATE_SCHEMA = StructType([
    StructField("session_id", IntegerType()),
    StructField("n_events", LongType()),
    StructField("start_ns", LongType()),
    StructField("last_ns", LongType()),
    StructField("cents", LongType()),
])


def _sessionize_group(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        sid, n, start_ns, last_ns, cents = state.get
    else:
        sid, n, start_ns, last_ns, cents = 0, 0, 0, 0, 0

    touched: dict[int, tuple[int, int, int, int]] = {}
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        # normalize to ns regardless of the Arrow-side unit (us vs ns)
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        vals = pdf["value"].to_numpy()
        for t, v in zip(ts_ns, vals):
            if n == 0 or t - last_ns > SESSION_GAP_NS:
                sid += 1
                n, start_ns, cents = 0, int(t), 0
            n += 1
            last_ns = int(t)
            # exact cents, half-up like the oracle's DECIMAL(18,2) cast
            # (feed values are non-negative)
            cents += int(float(v) * 100 + 0.5)
            touched[sid] = (n, start_ns, last_ns, cents)

    state.update((sid, n, start_ns, last_ns, cents))
    if touched:
        yield pd.DataFrame({
            "user_id": [user_id] * len(touched),
            "session_id": list(touched),
            "n_events": [t[0] for t in touched.values()],
            "session_start": pd.to_datetime(
                [t[1] for t in touched.values()]),
            "session_end": pd.to_datetime(
                [t[2] for t in touched.values()]),
            "session_value": [t[3] / 100.0 for t in touched.values()],
        })


def run_streaming_sessionize(spark: SparkSession, sf_dir: str, out_dir: str,
                             max_files_per_trigger: int | None = None,
                             source_dir: str | None = None) -> DataFrame:
    """Run the stateful sessionizer to completion; the sink keeps the
    latest emission per (user_id, session_id)."""
    sess_dir = os.path.join(out_dir, "sessions")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(sess_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    sessions = (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group, OUTPUT_SCHEMA, STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    )

    def replace_by_key(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        try:
            prev = spark_b.read.parquet(sess_dir)
        except Exception:
            prev = None
        merged = batch if prev is None else (
            prev.join(batch.select("user_id", "session_id").distinct(),
                      ["user_id", "session_id"], "left_anti")
            .unionByName(batch)
        )
        tmp = sess_dir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _reset(sess_dir)
        os.rename(tmp, sess_dir)

    _run_available_now(
        sessions.writeStream.outputMode("update")
        .foreachBatch(replace_by_key)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(sess_dir)
