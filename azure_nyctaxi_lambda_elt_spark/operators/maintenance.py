"""Warehouse maintenance: small-file compaction and table statistics.

Reference parity: the batch lane runs post-load statistics maintenance
(README_BATCHELT.md "stats maintenance post-load"; Synapse UPDATE
STATISTICS) and relies on clustered columnstore segment quality — the
parquet-warehouse analogs are (a) compacting each partition to a target
file size so scans don't drown in file-open overhead, and (b) row/size
stats per partition to drive bucket/partition-count decisions.

Scale notes: compaction reads and rewrites ONLY the partitions whose
file counts exceed the target — at 100 TB you compact the trailing
(actively appended) partitions, never the whole table. The rewrite
uses dynamic partition overwrite, so it is crash-safe per partition
and concurrent readers of untouched partitions are unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_stats(spark: SparkSession, path: str,
                    partition_col: str) -> DataFrame:
    """(partition value, n_files, total_bytes, n_rows) per partition —
    the UPDATE STATISTICS stand-in that sizing decisions read."""
    df = spark.read.parquet(path)
    meta = df.select(
        F.col(partition_col),
        F.input_file_name().alias("__f"),
    ).groupBy(partition_col).agg(
        F.countDistinct("__f").alias("n_files"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    sizes = []
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if not (os.path.isdir(full) and "=" in entry):
            continue
        val = entry.split("=", 1)[1]
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(full) for f in files)
        sizes.append((val, total))
    size_df = spark.createDataFrame(
        sizes, f"{partition_col}_str string, total_bytes bigint")
    return (
        meta.withColumn(f"{partition_col}_str",
                        F.col(partition_col).cast("string"))
        .join(size_df, f"{partition_col}_str", "left")
        .drop(f"{partition_col}_str")
    )


def compact_partitions(spark: SparkSession, path: str, partition_col: str,
                       max_files_per_partition: int = 1,
                       target_file_bytes: int = TARGET_FILE_BYTES) -> list[str]:
    """Rewrite only the partitions with more than
    ``max_files_per_partition`` files, each to
    ceil(bytes/target_file_bytes) files. Returns compacted partition
    values."""
    stats = {r[0]: r for r in partition_stats(
        spark, path, partition_col).collect()}
    to_compact = [
        (val, row["total_bytes"]) for val, row in stats.items()
        if row["n_files"] > max_files_per_partition
    ]
    from .upsert import write_partition_overwrite

    compacted = []
    for val, total_bytes in to_compact:
        n_out = max(1, -(-int(total_bytes or 0) // target_file_bytes))
        part = (
            spark.read.parquet(path)
            .where(F.col(partition_col) == F.lit(val))
            .repartition(n_out)
        )
        write_partition_overwrite(part, path, [partition_col])
        compacted.append(str(val))
    return compacted


# ---------------------------------------------------------------------------
# Z-order clustering (Delta OPTIMIZE ZORDER / Iceberg sort-order analog)

Z_BITS = 16          # per-dimension quantization width
Z_BUCKET_SHIFT = 24  # keep the top 8 interleaved bits -> <=256 buckets


def zorder_value(a, b, stats_prefix: str = "__zs"):
    """Morton (Z-order) interleave of two columns, each min-max
    quantized to Z_BITS bits using the broadcast stats columns
    ``{stats_prefix}_{amin,amax,bmin,bmax}``.  Pure integer Column
    arithmetic (codegen-friendly, oracle-replayable)."""
    p = stats_prefix
    span_a = F.greatest(F.col(f"{p}_amax") - F.col(f"{p}_amin"), F.lit(1))
    span_b = F.greatest(F.col(f"{p}_bmax") - F.col(f"{p}_bmin"), F.lit(1))
    qa = ((a - F.col(f"{p}_amin")) * F.lit((1 << Z_BITS) - 1)) / span_a
    qb = ((b - F.col(f"{p}_bmin")) * F.lit((1 << Z_BITS) - 1)) / span_b
    qa = F.floor(qa).cast("bigint")
    qb = F.floor(qb).cast("bigint")
    z = F.lit(0).cast("bigint")
    for bit in range(Z_BITS):
        z = (z
             + (F.shiftright(qa, bit).bitwiseAND(F.lit(1))
                * F.lit(1 << (2 * bit + 1)))
             + (F.shiftright(qb, bit).bitwiseAND(F.lit(1))
                * F.lit(1 << (2 * bit))))
    return z


def zorder_cluster_stats(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Data-clustering maintenance readback: assign every row a Z-order
    bucket over (col_a, col_b) and report each bucket's row count and
    per-dimension min/max envelope — the file-skipping statistics a
    lakehouse OPTIMIZE ZORDER exists to narrow.  Because Z-order
    interleaves bits, every bucket's envelope is narrow in BOTH
    dimensions at once (a plain sort is narrow in only the leading
    one), which is what lets a predicate on either column prune most
    buckets.

    Scale shape: one tiny min/max aggregate broadcasts back, then the
    z-value + bucket id are a narrow map-side expression and the
    envelope readback is one partially-aggregated groupBy — no sort,
    no window.  (The physical rewrite would be repartitionByRange(z)
    + write, i.e. one range shuffle; the stats pass here is the
    decision input and the oracle surface.)"""
    a, b = F.col(col_a).cast("bigint"), F.col(col_b).cast("bigint")
    stats = df.agg(
        F.min(a).alias("__zs_amin"), F.max(a).alias("__zs_amax"),
        F.min(b).alias("__zs_bmin"), F.max(b).alias("__zs_bmax"))
    with_z = df.crossJoin(F.broadcast(stats)).select(
        a.alias("__a"), b.alias("__b"),
        zorder_value(a, b).alias("__z"))
    return (
        with_z.select(
            F.shiftright(F.col("__z"), Z_BUCKET_SHIFT).cast("int")
            .alias("z_bucket"),
            "__a", "__b")
        .groupBy("z_bucket")
        .agg(F.count("*").cast("bigint").alias("n_rows"),
             F.min("__a").alias("a_min"), F.max("__a").alias("a_max"),
             F.min("__b").alias("b_min"), F.max("__b").alias("b_max"))
    )
