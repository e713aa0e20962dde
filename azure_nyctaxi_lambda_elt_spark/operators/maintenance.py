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
