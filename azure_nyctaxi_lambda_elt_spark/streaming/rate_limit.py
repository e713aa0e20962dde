"""Per-key rate limiting: at most N events per user per clock hour.

Reference parity: the ASA lane's per-key quality gating (asa-wire.sh
DQ routing, reference @ /root/reference) extended with the standard
ingest-protection operator a 100 TB event pipeline needs — a hot
producer must not flood the warehouse.

Two forms:
- ``rate_limit_batch`` — deterministic batch twin: row_number per
  (user, hour) ordered by (ts, event_id), keep the first N.  FULL
  DuckDB oracle.
- ``run_streaming_rate_limit`` — the streaming operator via
  ``applyInPandasWithState``: state per user holds the current hour
  bucket and its admit count (O(1) per key — older hours can never
  re-admit once the feed is time-ordered, mirroring the watermark
  contract).  Admission is FIRST-N-BY-ARRIVAL, so like
  streaming_dedupe the cross-engine check is rows-only; the pytest
  suite proves sink == batch twin for time-ordered arrival and state
  carry-over across micro-batches.

Scale notes: one hash exchange on user_id; per-key state is a handful
of longs; emissions are append-only (an admitted event is never
retracted), so the sink needs no merge pass.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StructField,
                               StructType, TimestampType)

from .lane import _reset, _run_available_now, events_stream

MAX_PER_HOUR = 40

OUTPUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("hour_bucket", TimestampType()),
    StructField("rn_in_window", IntegerType()),
])

# (current hour start ns, admitted in that hour)
STATE_SCHEMA = StructType([
    StructField("hour_ns", LongType()),
    StructField("admitted", LongType()),
])

_HOUR_NS = 3_600 * 1_000_000_000


def rate_limit_batch(events: DataFrame,
                     max_per_hour: int = MAX_PER_HOUR) -> DataFrame:
    """Deterministic batch twin: first N events per (user, hour) in
    (ts, event_id) order.  The window ranks within (user, hour) — a
    high-cardinality composite key, so no hot reducer at scale."""
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.select(
            "event_id", "user_id",
            F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
            F.row_number().over(w).cast("int").alias("rn_in_window"))
        .where(F.col("rn_in_window") <= max_per_hour)
    )


def _rate_limit_group(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    hour_ns, admitted = state.get if state.exists else (-1, 0)
    out_eid, out_hour, out_rn = [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        eids = pdf["event_id"].to_numpy()
        for t, eid in zip(ts_ns, eids):
            h = (int(t) // _HOUR_NS) * _HOUR_NS
            if h != hour_ns:
                hour_ns, admitted = h, 0
            if admitted < MAX_PER_HOUR:
                admitted += 1
                out_eid.append(int(eid))
                out_hour.append(hour_ns)
                out_rn.append(admitted)
    state.update((hour_ns, admitted))
    if out_eid:
        yield pd.DataFrame({
            "event_id": out_eid,
            "user_id": [user_id] * len(out_eid),
            "hour_bucket": pd.to_datetime(out_hour),
            "rn_in_window": out_rn,
        })


def run_streaming_rate_limit(spark: SparkSession, sf_dir: str, out_dir: str,
                             max_files_per_trigger: int | None = None,
                             source_dir: str | None = None) -> DataFrame:
    """Run the stateful rate limiter to completion; the sink is the
    append-only admitted set."""
    adm_dir = os.path.join(out_dir, "admitted")
    ckpt = os.path.join(out_dir, "ckpt")
    _reset(adm_dir, ckpt)
    ev = events_stream(spark, sf_dir, max_files_per_trigger, source_dir)
    admitted = (
        ev.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _rate_limit_group, OUTPUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout)
    )
    _run_available_now(
        admitted.writeStream.format("parquet")
        .option("path", adm_dir)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(adm_dir)
