"""Testdata catalog: the driver's TPC-H-ish star schema + events stream
table + LLM-pipeline tables.

Scale notes: ``spark.read.parquet`` gives Catalyst a file-source relation
with full predicate pushdown / column pruning / partition pruning.  We
never materialize or cache by default — each query's plan prunes the
scan to exactly the columns/rows it needs (check ``ReadSchema`` and
``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_small_scan(df: DataFrame,
                      threshold_bytes: int = 64 << 20,
                      by: list[str] | None = None) -> DataFrame:
    """Redistribute a sub-split-size scan across the session's shuffle
    parallelism BEFORE per-row-expensive derivation (guide §2.5 "input
    skew: one huge unsplittable file → repartition immediately after
    the read").

    The driver testdata tables are single parquet files with ONE row
    group, so their scan stage is a single task and every expression
    evaluated before the first exchange runs on one core — measured
    ~1.6 s single-core for the trips dirty-feed derivation at sf0.1
    against ~0.05 s spread over 32.  The repartition is applied ONLY
    when the scan's total input is below one scan split
    (``threshold_bytes``, default 64 MB < the 128 MB
    ``spark.sql.files.maxPartitionBytes``): at warehouse scale the
    input is thousands of splits and this is an exact no-op — the
    helper can never insert a 100 TB shuffle.  The partition count is
    the session's pinned ``spark.sql.shuffle.partitions`` (the same
    determinism anchor apply_engine_conf documents), so results are
    reproducible at any core count.  Round-robin repartition is
    deterministic under Spark's default sort-before-repartition, and
    every cataloged consumer is partition-layout-independent (decimal
    aggregation convention + keyed windows with unique tiebreaks) —
    re-verified against the full DuckDB oracle after this change.

    Apply selectively where the scan feeds heavy per-row work: the
    A/B in OPTIMIZATION_r13.md shows join-shaped/light consumers LOSE
    (the extra exchange buys nothing), so this is opt-in per feed,
    never blanket.

    ``by``: hash-repartition on these columns instead of round-robin.
    When the downstream plan's first shuffle is keyed by (an alias
    of) the same columns, Catalyst's alias-aware output partitioning
    recognizes the distribution as already satisfied and the spread
    exchange REPLACES the downstream one instead of adding to it
    (trips feed: spreading events by event_id serves the
    trip_uid-keyed dedupe window — plan audited 2 Exchanges → 1)."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) > 4:
        return df  # already multi-file: the scan parallelizes itself
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return df  # non-local store: stay conservative, no-op
    if total >= threshold_bytes:
        return df
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if by:
        return df.repartition(n, *[df[c] for c in by])
    return df.repartition(n)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
