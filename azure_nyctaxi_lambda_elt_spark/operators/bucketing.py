"""Bucketed-table write path: pre-shuffled, co-located storage for the
joins a warehouse repeats every load.

Reference parity: the fact table is HASH-distributed on trip_id with
clustered columnstore (sql/batchELT/mdl/fact_trip.table.sql) exactly so
repeated MERGE/join work never re-distributes the big table.  Spark's
native analog is ``bucketBy(n, key)`` saved tables: both sides of an
equi-join bucketed on the join key with the same bucket count join with
NO Exchange — the shuffle was paid once at write time.

Scale notes: pick bucket counts so one bucket ≈ 100-500 MB at target
scale and keep them EQUAL across tables meant to co-join. Writes also
``sortBy`` the key so merge-join runs without a sort step. The
file-per-bucket-per-task explosion is contained by repartitioning on
the bucket key before the write (1 file per bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int,
                   bucket_cols: Sequence[str],
                   sort_cols: Sequence[str] | None = None) -> None:
    """Save as a bucketed+sorted managed table (overwrite).

    Repartition on the bucket key first so each bucket is written by
    exactly one task — otherwise every task emits a file per bucket
    (the classic small-files trap)."""
    sort_cols = list(sort_cols or bucket_cols)
    (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables; with equal bucket counts on the join
    key the plan contains no Exchange for either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
