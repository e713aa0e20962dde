"""Deterministic latest-wins dedupe.

Reference parity: core.trip_clean dedupe load
(sql/batchELT/core/12_trip_clean.dedupe_load.sql:8-16) — ROW_NUMBER()
PARTITION BY business key ORDER BY recency DESC, tiebreaks DESC; keep
rn = 1. Also the streaming slice dedupe
(sql/streaming/staging/usp_upsert_trips_from_streaming.sql:44-47).

Scale notes: one hash-partition shuffle on the dedupe key — the same
data movement the reference pays via DISTRIBUTION = HASH(trip_id).
High-cardinality keys (trip_id analog) spread evenly; AQE skew-join /
skew-partition handling covers pathological keys. The window never
needs a global sort — Spark sorts within each hash partition only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``
    (callers pass DESC recency columns + deterministic tiebreaks —
    always include a unique tiebreak for oracle-stable output).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
