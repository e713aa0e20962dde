"""Upsert / idempotent-write operators.

Reference parity:
- merge_latest ≈ the Synapse MERGE upsert (update-then-insert) used by
  the streaming lane (sql/streaming/staging/
  usp_upsert_trip_clean_from_slice_streaming.sql): matched rows take
  the update's values, unmatched updates insert. Expressed relationally
  as union + latest-wins — identical result, and at 100 TB it's one
  hash shuffle on the key instead of a row-by-row merge.
- write_partition_overwrite ≈ the batch lane's idempotent
  "DELETE WHERE ingest_date=@d then INSERT" partition wipe
  (sql/batchELT/core/12_trip_clean.dedupe_load.sql:5-16), done natively
  with dynamic partition overwrite so reruns/backfills replace exactly
  the touched partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import pin

from .dedupe import latest_wins


def merge_latest(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] | None = None,
    priority_col: str = "__src_priority",
) -> DataFrame:
    """MERGE semantics: for each key, the updates row wins over the
    existing row; within each side, later ``order_by`` rows win.

    ``order_by`` columns (DESC recency, tiebreaks) are evaluated on the
    unioned frame; the update-beats-existing rule is enforced with a
    source-priority column ahead of them.
    """
    tagged = existing.withColumn(priority_col, F.lit(0)).unionByName(
        updates.withColumn(priority_col, F.lit(1))
    )
    order = [F.col(priority_col).desc()] + list(order_by or [])
    return latest_wins(tagged, keys, order).drop(priority_col)


def replay_file_scoped(
    path: str,
    fresh: DataFrame,
    file_col: str,
    source_file: str,
    partition_cols: Sequence[str],
) -> None:
    """File-scoped idempotency replay — stg.usp_delete_trips_by_blob
    (sql/streaming/staging/0005_delete.sql:10-20: DELETE rows for ONE
    `_blobPath`, then the loader re-inserts that blob's rows).

    Parquet has no row-level DELETE, so the replay is expressed as a
    partition-surgical rewrite: find the partitions that contain the
    blob's rows (a tiny distinct over partition columns, pushed to the
    scan), rewrite ONLY those partitions as (kept rows ∪ fresh rows)
    via dynamic partition overwrite.  Untouched partitions never move —
    finer than wiping every partition the run touched, coarser than a
    true row delete (the Delta/Iceberg MERGE would be the managed-table
    form of the same contract).

    ``fresh`` must contain only rows belonging to ``source_file``
    (asserted cheaply via a filter, not a count).

    Scale note: locating the affected partitions filters the whole
    table on ``file_col``; parquet footer min/max stats prune the row
    groups of every file the blob's rows can't be in, so the discovery
    scan reads metadata, not data, for untouched files.  At Delta/
    Iceberg-table scale the same lookup is a manifest-stats query."""
    spark = fresh.sparkSession
    existing = spark.read.parquet(path)
    fresh_scoped = fresh.where(F.col(file_col) == source_file)
    # The affected set must cover BOTH sides of the heal: partitions
    # holding the blob's OLD rows and partitions receiving its NEW rows.
    # A fresh row can land in a partition the blob never touched before
    # (brand-new blob, or a corrected partition value — exactly the
    # healing use case); rewriting that partition without its existing
    # sibling rows would silently delete other blobs' data.
    affected = (
        existing.where(F.col(file_col) == source_file)
        .select(*partition_cols)
        .unionByName(fresh_scoped.select(*partition_cols))
        .distinct().collect())
    if not affected:
        return
    if len(partition_cols) == 1:
        in_affected = F.col(partition_cols[0]).isin(
            [r[0] for r in affected])
    else:
        in_affected = F.lit(False)
        for r in affected:
            clause = F.lit(True)
            for c, v in zip(partition_cols, r):
                clause = clause & (F.col(c) == F.lit(v))
            in_affected = in_affected | clause
    kept = existing.where(
        in_affected & (F.col(file_col) != source_file))
    replacement = kept.unionByName(fresh_scoped)
    # materialize BEFORE overwriting: the replacement reads the same
    # files the dynamic overwrite is about to delete
    replacement = replacement.transform(pin)
    # Dynamic overwrite only replaces partitions it writes rows INTO.
    # A partition the blob fully vacates (its rows moved elsewhere and
    # no sibling rows remain) gets zero replacement rows, so the stale
    # files would survive — drop those partition dirs explicitly, the
    # same file-removal a Delta/Iceberg MERGE's delete half performs.
    present = {
        tuple(r) for r in
        replacement.select(*partition_cols).distinct().collect()}
    emptied = [r for r in affected if tuple(r) not in present]
    write_partition_overwrite(replacement, path, partition_cols)
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for r in emptied:
            # hive-style dir per partition value (str() matches how our
            # date/string partition values are rendered by the writer)
            subdir = "/".join(
                f"{c}={v}" for c, v in zip(partition_cols, r))
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/{subdir}")
            fs = p.getFileSystem(hconf)
            fs.delete(p, True)


def write_partition_overwrite(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Idempotent partition-scoped write: replaces only the partitions
    present in ``df`` (dynamic mode), leaving others intact — the exact
    rerun/backfill contract of the reference's partition wipe+insert.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
