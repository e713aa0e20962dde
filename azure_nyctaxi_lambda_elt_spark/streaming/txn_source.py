"""Structured-Streaming SOURCE over a transaction-log table —
``readStream`` consumption of newly committed versions, the
Delta-streaming shape (``readStream.format("delta")`` with
``startingVersion=``) on this engine's manifest log.

Reference parity: the hourly curated→warehouse consumer is exactly a
poll-for-new-commits loop over the curated table
(orchestration/adf/pipeline/pl_streaming_curated_to_stg_core_mdl.json
+ orchestration/adf/trigger/t_hourly_backfill_streaming.json); here
the poll is a first-class streaming source, so the consumer composes
with watermarks, foreachBatch sinks, and checkpoint-exactly-once like
any other stream.

Built on PySpark's Python DataSource API (pyspark.sql.datasource) —
the engine-native way to add a source Spark lacks:

- **Offsets are versions.**  The stream's offset is simply the last
  consumed committed version ({"version": N}); Spark persists it in
  the checkpoint WAL, so restart/recovery resumes at the next commit
  with no source-side state.  ``latest_version`` already skips
  undecided transaction-group members at the head, so a group's
  versions only enter the stream after its atomic visibility flip.
- **A micro-batch is the NEW dirs of the consumed versions.**  Data
  files are immutable and an append's manifest lists parent dirs +
  new dirs, so the per-version payload is an O(dirs) set difference —
  no listing diffs, no per-file bookkeeping (the FileStreamSource
  problem this log solves).
- **One InputPartition per parquet file**, read executor-side with
  pyarrow and yielded as Arrow RecordBatches (never per-row Python),
  aligned to the manifest table schema so pre-evolution files
  null-backfill evolved columns exactly like the batch
  ``snapshot()`` read.
- **Append-only contract** (Delta's): physical-only maintenance
  commits (compact / zorder) are skipped silently — they change no
  logical row; a content-changing non-append commit (overwrite /
  restore / merge / delete) REFUSES by default, or is skipped with
  ``skip_change_commits=True`` (Delta's ``skipChangeCommits``).  The
  FIRST version of a table (v0) is the initial content and streams
  whole regardless of its mode.

Scale: offset resolution and partition planning read manifest JSON
only (KBs per trigger at any table size); the data plane is the same
immutable parquet files the batch reads scan, split per file across
executors.  A stream that falls behind the table's vacuum retention
refuses loudly (the consumed-to-latest window must be contiguous
retained history), exactly Delta's behavior.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

FORMAT_NAME = "txntable"


class _TxnFilesPartition(InputPartition):
    """One consumed parquet file: the executor-side read unit.
    Carries the STREAM's declared schema JSON (fixed at stream start
    — Spark requires every batch to match it) so the worker aligns
    the file's columns to it: pre-evolution files null-backfill
    missing columns and upcast narrower ints; columns added to the
    table AFTER the stream started are dropped until the stream is
    rebuilt with the new schema (Delta's contract too)."""

    def __init__(self, file_path: str, schema_json: str | None):
        self.file_path = file_path
        self.schema_json = schema_json


def _walk_parquet_files(base_dir: str) -> list[str]:
    """Data part-files under a manifest dir (skips _SUCCESS/.crc
    bookkeeping), sorted for deterministic partition planning."""
    out: list[str] = []
    for root, _, files in os.walk(base_dir):
        for f in files:
            if f.startswith((".", "_")):
                continue
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


class TxnTableStreamReader(DataSourceStreamReader):
    """Version-offset stream reader over a txnlog table (module
    docstring has the contract)."""

    def __init__(self, options: dict, schema_json: str | None = None):
        path = options.get("path")
        if not path:
            raise ValueError(
                "txntable source requires .option('path', <table>)")
        self.path = path
        # the stream's DECLARED schema (fixed at start): every batch
        # must align to it, not to the consumed version's own schema
        self.schema_json = schema_json
        # DataSource options arrive lower-cased string-valued
        self.start_v = int(options.get("startingversion", 0))
        self.skip_change = str(
            options.get("skipchangecommits", "false")).lower() == "true"

    # ------------------------------------------------ offsets
    def initialOffset(self) -> dict:
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        from ..operators import txnlog

        v = txnlog.latest_version(self.path)
        if v is None or v < self.start_v - 1:
            return {"version": self.start_v - 1}
        return {"version": v}

    # ------------------------------------------------ planning
    def partitions(self, start: dict, end: dict):
        from ..operators import txnlog

        parts: list[_TxnFilesPartition] = []
        prev_dirs: set | None = None
        for v in range(int(start["version"]) + 1,
                       int(end["version"]) + 1):
            try:
                man = txnlog._read_manifest(self.path, v)
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"txntable stream on {self.path} needs version "
                    f"{v}, but its manifest is gone (vacuumed past "
                    "the stream's position, or an aborted group "
                    "reclaimed it) — the stream fell behind the "
                    "table's retention; rebuild it from a fresh "
                    "startingVersion") from e
            # belt-and-braces: latest_version never returns an
            # undecided head, and writers never commit past an
            # undecided version, so this cannot fire mid-range
            txnlog._require_decided(self.path, v, man)
            op = (man.get("op") or {}).get("type") or (
                "append" if man.get("mode") == "append" else None)
            if v == 0:
                # table creation: the initial content streams whole
                new = list(man["dirs"])
            elif op == "maintenance":
                prev_dirs = set(man["dirs"])
                continue  # physical-only rewrite: no logical change
            elif op == "append":
                if prev_dirs is None:
                    try:
                        prev_dirs = set(
                            txnlog._read_manifest(
                                self.path, v - 1)["dirs"])
                    except FileNotFoundError as e:
                        raise RuntimeError(
                            f"txntable stream on {self.path} cannot "
                            f"diff version {v} against vacuumed "
                            f"parent {v - 1} — fell behind "
                            "retention") from e
                new = [d for d in man["dirs"] if d not in prev_dirs]
            elif self.skip_change:
                prev_dirs = set(man["dirs"])
                continue  # Delta skipChangeCommits semantics
            else:
                raise RuntimeError(
                    f"txntable stream on {self.path} hit a "
                    f"content-changing commit at version {v} "
                    f"({op or 'pre-op-era'}): the source serves "
                    "append-only history — pass "
                    "skip_change_commits=True to skip "
                    "replace/merge/delete commits, or consume them "
                    "through change_feed()")
            prev_dirs = set(man["dirs"])
            for d in new:
                full = d if os.path.isabs(d) \
                    else os.path.join(self.path, d)
                for f in _walk_parquet_files(full):
                    parts.append(
                        _TxnFilesPartition(f, self.schema_json))
        # Spark requires at least one partition per planned batch;
        # an empty file list (all-maintenance range) reads as empty
        return parts or [_TxnFilesPartition("", None)]

    # ------------------------------------------------ data plane
    def read(self, partition: _TxnFilesPartition):
        if not partition.file_path:
            return iter(())

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        def gen():
            pf = pq.ParquetFile(partition.file_path)
            if partition.schema_json is None:
                yield from pf.iter_batches()
                return
            target = to_arrow_schema(StructType.fromJson(
                json.loads(partition.schema_json)))
            for batch in pf.iter_batches():
                t = pa.Table.from_batches([batch])
                cols = []
                for field in target:
                    if field.name in t.column_names:
                        cols.append(
                            t.column(field.name).cast(field.type))
                    else:
                        # pre-evolution file: null-backfill, same as
                        # the batch snapshot() read
                        cols.append(pa.nulls(len(t), field.type))
                yield from pa.Table.from_arrays(
                    cols, schema=target).to_batches()

        return gen()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint WAL; the log
        # keeps nothing per-consumer (like Delta)


class TxnTableStreamDataSource(DataSource):
    """``spark.readStream.format("txntable")`` entry point; use
    :func:`read_stream_txn` for the registered-and-loaded one-liner."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from pyspark.sql.types import StructType

        from ..operators import txnlog

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "txntable source requires .option('path', <table>)")
        v = txnlog.latest_version(path)
        if v is None:
            raise FileNotFoundError(
                f"no committed version under {path}")
        sch = txnlog._read_manifest(path, v).get("schema")
        if not sch:
            raise ValueError(
                f"{path} predates manifest schema recording — "
                "re-commit once to record the table schema before "
                "streaming from it")
        return StructType.fromJson(json.loads(sch))

    def streamReader(self, schema):
        # the schema Spark hands back is the stream's DECLARED one
        # (self.schema() at start, or user-supplied): thread it to
        # the partition planner so every file aligns to it
        return TxnTableStreamReader(
            dict(self.options),
            schema.json() if schema is not None else None)


def read_stream_txn(spark: SparkSession, path: str,
                    starting_version: int = 0,
                    skip_change_commits: bool = False) -> DataFrame:
    """Open a txnlog table as a streaming DataFrame: registers the
    Python data source (idempotent per session) and returns
    ``readStream.format("txntable")`` over ``path``, consuming
    committed versions ``>= starting_version`` — compose with
    ``writeStream`` / ``foreachBatch`` like any stream.  Offsets ride
    in the sink's checkpoint, so stop/restart resumes at the next
    unconsumed commit (exactly-once with an idempotent sink — e.g.
    lane.run_txn_stream_copy's log-to-log pipeline)."""
    spark.dataSource.register(TxnTableStreamDataSource)
    return (spark.readStream.format(FORMAT_NAME)
            .option("path", os.path.abspath(path))
            .option("startingVersion", int(starting_version))
            .option("skipChangeCommits",
                    "true" if skip_change_commits else "false")
            .load())
