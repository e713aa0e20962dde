"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join, both expressed in scale shapes that avoid the
naive O(|L|·|R|) inequality join.

Reference parity: the reference's streaming lane orders events by
producer timestamp and resolves "latest state as of t" during its
latest-wins merges (sql/streaming/staging/
usp_upsert_trips_from_streaming.sql); these operators generalize that
time-travel lookup to a first-class join.

As-of join — the union trick (single shuffle, linear):
  tag right rows side=0 and left rows side=1, union, then one window
  per partition key ordered by (ts, side, tiebreak): ``last(right
  payload, ignorenulls)`` over the unbounded-preceding frame gives each
  left row the most recent right row with r.ts <= l.ts.  One shuffle on
  the partition key; state per row is O(1).  This is how you as-of join
  two 100 TB tables — a range-condition join would rescan the right
  side per left row, and a point-lookup UDF would pull the right table
  to the driver.

Range join — bucketed equi-join expansion:
  explode each interval into the fixed-width time buckets it covers,
  join points on (key, bucket) EQUALITY (hash-partitionable!), then
  re-filter with the exact range predicate and aggregate.  Shuffle
  volume = |points| + Σ interval-widths/bucket instead of |L|·|R|.
  Bucket width should be chosen ≈ median interval width so each
  interval lands in O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# as-of join


def asof_join(left: DataFrame, right: DataFrame, partition_col: str,
              ts_col: str, right_payload: list[str],
              right_tiebreak: str) -> DataFrame:
    """For every left row, attach the latest right row of the same
    ``partition_col`` with ``right.ts <= left.ts`` (inclusive).

    Right rows are first deduped to one per (partition, ts) —
    ``right_tiebreak`` max wins — so the match is deterministic even
    with timestamp collisions.  Matched right columns come back as
    ``asof_<col>``; left rows with no prior right row keep NULLs
    (left-outer semantics).
    """
    rw = Window.partitionBy(partition_col, ts_col).orderBy(
        F.col(right_tiebreak).desc())
    r1 = (
        right.withColumn("__rn", F.row_number().over(rw))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("__r")
    left_cols = [f for f in left.columns]
    tagged_r = r1.select(
        F.col(partition_col), F.col(ts_col), F.lit(0).alias("__side"), payload,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
          for c in left_cols if c not in (partition_col, ts_col)],
    )
    tagged_l = left.select(
        F.col(partition_col), F.col(ts_col), F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}")
          for c in left_cols if c not in (partition_col, ts_col)],
    )
    # at equal ts the right row sorts first (side 0 < 1), so the
    # unbounded-preceding last() sees it — inclusive <= semantics
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tagged_l.unionByName(tagged_r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    out = matched.select(
        F.col(partition_col), F.col(ts_col),
        *[F.col(f"__l_{c}").alias(c)
          for c in left_cols if c not in (partition_col, ts_col)],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out


# ---------------------------------------------------------------------------
# bucketed range join

BUCKET_SECONDS = 3600


def range_join_buckets(intervals: DataFrame, points: DataFrame,
                       key_col: str, interval_id: str,
                       start_col: str, end_col: str,
                       ts_col: str, value_col: str,
                       bucket_seconds: int = BUCKET_SECONDS) -> DataFrame:
    """Count/sum points falling in [start, end) per interval, via
    bucketed equi-join (see module docstring).  Intervals with no
    points survive with zero counts (left-outer on the aggregate).
    """
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(bucket_seconds * 1_000_000)) \
        .cast("bigint")  # noqa: E731
    iv = intervals.select(
        key_col, interval_id, start_col, end_col,
        F.explode(F.sequence(bucket(start_col), bucket(end_col))).alias("__b"),
    )
    pt = points.select(
        F.col(key_col), F.col(ts_col), F.col(value_col),
        bucket(ts_col).alias("__b"),
    )
    joined = iv.join(
        pt,
        on=[key_col, "__b"],
    ).where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
    hits = joined.groupBy(key_col, interval_id).agg(
        F.count("*").cast("bigint").alias("n_in_window"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
        .alias("value_in_window"),
    )
    return (
        intervals.join(hits, on=[key_col, interval_id], how="left")
        .select(
            key_col, interval_id, start_col, end_col,
            F.coalesce(F.col("n_in_window"), F.lit(0)).cast("bigint")
            .alias("n_in_window"),
            F.coalesce(F.col("value_in_window"), F.lit(0.0)).cast("double")
            .alias("value_in_window"),
        )
    )


# ---------------------------------------------------------------------------
# gap filling (LOCF)


def gap_fill_locf(daily: DataFrame, key_col: str, date_col: str,
                  value_col: str) -> DataFrame:
    """Dense per-key daily series with last-observation-carried-forward
    fill — the hypertable `time_bucket_gapfill + locf` shape.

    ``daily`` is an already-aggregated (key, date, value) frame.  The
    date grid spans the GLOBAL min/max date (one broadcast one-row
    aggregate — no per-key grid skew) and is generated NARROWLY per key
    via sequence+explode from the key's first observation (no date-dim
    cross join, no shuffle to build the grid).  The fill itself is one
    window per key ordered by date with `last(..., ignorenulls=True)`
    — O(1) running state per key, the same bounded-state argument as
    sessionization.

    Leading days before a key's first observation are not emitted
    (nothing to carry forward) — matching the SQL oracle's
    per-key MIN(date) anchor."""
    bounds = daily.agg(
        F.max(F.col(date_col).cast("date")).alias("__dmax"))
    per_key = (daily.groupBy(key_col)
               .agg(F.min(F.col(date_col).cast("date")).alias("__dmin")))
    grid = (per_key.crossJoin(F.broadcast(bounds))
            .select(key_col,
                    F.explode(F.sequence("__dmin", "__dmax"))
                    .alias("__day")))
    obs = daily.select(
        key_col,
        F.col(date_col).cast("date").alias("__day"),
        F.col(value_col).alias("__v"))
    w = (Window.partitionBy(key_col).orderBy("__day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(obs, [key_col, "__day"], "left")
            .select(
                key_col,
                F.col("__day").alias("day"),
                F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
                F.col("__v").isNull().alias("was_gap")))
