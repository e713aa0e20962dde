"""Dimension building + surrogate-key resolution.

Reference parity:
- build_dim       ≈ mdl/load/10-14_dim_*.upsert.sql (distinct natural
  keys inserted when missing) + err/seed_unknowns.sql (-1 member).
  The reference uses IDENTITY surrogate keys (load-order dependent);
  a distributed engine wants DETERMINISTIC keys, so we assign
  dense_rank() over the natural key ordering — stable across runs,
  executors, and retries, and reproducible by the DuckDB oracle.
- resolve_fk      ≈ the fact load's LEFT JOIN dim + COALESCE(key,-1)
  (mdl/load/40_fact_trip.load.sql:96-118).
- build_dim_date  ≈ mdl/dim_date.table.sql, build_dim_time ≈
  mdl/dim_time.table.sql (generated calendar/time dims).

Scale notes: dims are small (the reference marks them REPLICATE) —
resolve_fk broadcasts them so the 100 TB fact side never shuffles for
dim resolution. build_dim's distinct IS a shuffle but over dim-sized
distinct keys (tiny). dim_date/dim_time are generated with
``spark.range`` — no source scan at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..session import pin

from .dedupe import latest_wins  # noqa: F401  (re-export convenience)

from ..functions.columns import hour_bucket


def build_dim(
    df: DataFrame,
    nk_cols: Sequence[str],
    key_col: str,
    unknown_nk: str | None = "UNKNOWN",
) -> DataFrame:
    """Distinct non-null natural keys → deterministic surrogate keys
    (dense_rank over NK order, 1-based) + a -1 unknown member.

    For multi-column NKs the unknown member sets every NK col to
    ``unknown_nk`` (cast as needed by the caller).
    """
    # NULL NK rows are excluded (reference: WHERE nk IS NOT NULL AND <> '')
    cond = None
    for c in nk_cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    nks = df.select(*nk_cols).where(cond).distinct()

    w = Window.orderBy(*[F.col(c).asc() for c in nk_cols])
    dim = nks.withColumn(key_col, F.dense_rank().over(w).cast("int"))

    if unknown_nk is not None:
        spark = df.sparkSession
        unknown = spark.createDataFrame(
            [tuple([unknown_nk] * len(nk_cols) + [-1])], list(nk_cols) + [key_col]
        )
        # align types with the dim before union
        unknown = unknown.select(
            *[F.col(c).cast(dict(dim.dtypes)[c]) for c in nk_cols],
            F.col(key_col).cast("int"),
        )
        dim = dim.unionByName(unknown)
    return dim.select(key_col, *nk_cols)


def build_dims_fused(clean: DataFrame,
                     specs: Sequence[tuple[str, object]],
                     pad_dims: Sequence[str] = (),
                     ) -> DataFrame:
    """ALL dims in ONE pass: melt the NK columns into (dim, nk) string
    pairs, one distinct shuffle, one per-dim dense_rank — then callers
    slice per dim.  Replaces N separate distinct+rank subtrees (N
    scans of trip_clean at warehouse scale) with a single scan; the
    returned frame is localCheckpoint'ed (it is dim-sized) so the N
    downstream broadcast builds read the materialized ranks instead of
    re-running the melt.

    ``specs`` = [(dim_name, nk Column), ...] — a dim may appear twice
    (location melts both PU and DO ids into one member set, exactly
    like the reference's union upsert).  ``pad_dims`` names dims whose
    NKs are non-negative integers: their rank order must be NUMERIC,
    so the sort key zero-pads the string form.  Surrogate keys equal
    build_dim's exactly (dense_rank over NK asc, 1-based) — pinned by
    tests/test_fact_plan_guardrail.py::test_fused_dims_equal_per_dim_builds.
    """
    melted = (
        clean.select(F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     nk.cast("string").alias("nk"))
            for d, nk in specs])).alias("m"))
        .select("m.d", "m.nk")
        .where(F.col("nk").isNotNull())
        .distinct()
    )
    sort_key = (
        F.when(F.col("d").isin(*pad_dims), F.lpad("nk", 12, "0"))
        .otherwise(F.col("nk")) if pad_dims else F.col("nk"))
    w = Window.partitionBy("d").orderBy(sort_key.asc())
    return melted.withColumn(
        "k", F.dense_rank().over(w).cast("int")).transform(pin)


def slice_fused_dim(ranked: DataFrame, d: str, key_col: str,
                    nk_col: str, nk_type: str, unknown_nk) -> DataFrame:
    """One dim out of the fused rank frame, with its -1 unknown member
    — output contract identical to build_dim."""
    base = ranked.where(F.col("d") == d).select(
        F.col("k").alias(key_col),
        F.col("nk").cast(nk_type).alias(nk_col))
    spark = ranked.sparkSession
    unk = spark.createDataFrame(
        [(-1, str(unknown_nk))], f"{key_col} int, {nk_col} string")
    return base.unionByName(
        unk.select(key_col, F.col(nk_col).cast(nk_type)))


def upsert_dim_append(existing: DataFrame | None, source: DataFrame,
                      nk_cols: Sequence[str], key_col: str,
                      unknown_nk) -> DataFrame:
    """Append-only dim upsert (IDENTITY analog — the reference's
    mdl/load/1*_dim_*.upsert.sql INSERT-when-missing): first load is the
    deterministic dense_rank build; afterwards unseen NKs get
    max(key)+rank(new NK order) and existing members are returned
    UNTOUCHED, so fact rows resolved in earlier runs stay valid."""
    if existing is None:
        return build_dim(source, nk_cols, key_col, unknown_nk=unknown_nk)
    cond = None
    for c in nk_cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    fresh = (
        source.select(*nk_cols).where(cond).distinct()
        .join(existing.select(*nk_cols), list(nk_cols), "left_anti")
    )
    w = Window.orderBy(*[F.col(c).asc() for c in nk_cols])
    base = existing.agg(F.max(key_col)).collect()[0][0] or 0
    appended = fresh.withColumn(
        key_col, (F.row_number().over(w) + F.lit(base)).cast("int"))
    return existing.unionByName(appended.select(key_col, *nk_cols))


def resolve_fk(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[tuple[str, str]],
    key_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """LEFT JOIN a broadcast dim and COALESCE the surrogate key to -1.

    ``on`` is a list of (fact_col, dim_nk_col) equi-join pairs.
    The dim is broadcast — the fact side stays in place (REPLICATE
    analog), no shuffle of the big table.
    """
    out_col = out_col or key_col
    cond = None
    for f_col, d_col in on:
        k = fact[f_col] == dim[d_col]
        cond = k if cond is None else (cond & k)
    joined = fact.join(broadcast(dim), cond, "left")
    resolved = joined.withColumn(out_col, F.coalesce(dim[key_col], F.lit(-1)))
    drop_cols = [dim[d] for _, d in on] + ([dim[key_col]] if out_col != key_col else [])
    result = resolved
    for c in {d for _, d in on} | ({key_col} if out_col != key_col else set()):
        result = result.drop(dim[c])
    return result


def build_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dim from ``start`` to ``end`` (inclusive), generated —
    columns mirror mdl/dim_date.table.sql.
    """
    days = spark.sql(
        f"SELECT explode(sequence(DATE'{start}', DATE'{end}')) AS date_value"
    )
    return days.select(
        (F.year("date_value") * 10000 + F.month("date_value") * 100
         + F.dayofmonth("date_value")).cast("int").alias("date_key"),
        F.col("date_value"),
        F.year("date_value").cast("int").alias("year"),
        F.quarter("date_value").cast("int").alias("quarter"),
        F.month("date_value").cast("int").alias("month"),
        F.dayofmonth("date_value").cast("int").alias("day"),
        F.weekofyear("date_value").cast("int").alias("iso_week"),
        # ISO year: the year owning the ISO week (differs at year edges)
        F.expr("extract(YEAROFWEEK FROM date_value)").cast("int").alias("iso_year"),
        # weekday() is 0=Monday..6=Sunday → weekend = 5,6
        (F.weekday("date_value") >= 5).cast("boolean").alias("is_weekend"),
    )


def build_dim_time(spark: SparkSession) -> DataFrame:
    """86400-row seconds-of-day dim — mirrors mdl/dim_time.table.sql
    (time_key 0..86399, hh/mm/ss, hour bucket, is_night 22:00-05:59).
    """
    t = spark.range(0, 86400).select(F.col("id").cast("int").alias("time_key"))
    hh = (F.col("time_key") / 3600).cast("int")
    mm = ((F.col("time_key") % 3600) / 60).cast("int")
    ss = (F.col("time_key") % 60).cast("int")
    return t.select(
        "time_key",
        hh.alias("hh24"),
        mm.alias("mm"),
        ss.alias("ss"),
        hour_bucket(hh).alias("hour_bucket"),
        ((hh >= 22) | (hh <= 5)).cast("boolean").alias("is_night"),
    )
