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

**Admission control** (Delta's ``maxFilesPerTrigger`` /
``maxBytesPerTrigger`` rate limiting): ``maxVersionsPerTrigger``
caps how many committed versions ``latestOffset`` admits past the
stream's position per trigger; ``maxFilesPerTrigger`` /
``maxBytesPerTrigger`` admit whole versions until the cumulative
NEW-file count / NEW-byte total reaches the cap (always at least
one version, so a single jumbo commit still flows — Delta's
soft-cap semantics).  Byte totals come from the manifests' per-dir
``files`` records written at commit time (txnlog._dir_file_stats),
so byte-capped admission reads manifest JSON only; dirs a
pre-files-era manifest never recorded fall back to per-file stat
calls over exactly those dirs.  A catch-up consumer against a long backlog
thereby processes bounded micro-batches with checkpoint progress
between them instead of one giant batch.  The Python DataSource API
passes no start offset to ``latestOffset``, so the reader tracks its
position itself: a fresh query measures from ``startingVersion``
(Spark calls ``latestOffset`` before ``initialOffset`` there), and a
restarted query re-plans the WAL's last batch BEFORE its first
``latestOffset``, so ``partitions``/``commit`` have already taught
the reader the checkpointed position — capping can never regress a
restarted stream's offset (both orders pinned by the tests).
Should a future Spark stop replaying before the first
``latestOffset``, a capped restart would compute an offset below
the checkpoint and ``partitions`` refuses loudly with the
backwards-batch error — a crash loop, never a silent regression;
capping from the start version when the position is unknown is
DELIBERATE (not fixed by returning the uncapped head on the first
trigger): a fresh capped query's FIRST batch being bounded is the
feature's main use case — the catch-up consumer against a long
backlog — and fresh-vs-unreplayed-restart is indistinguishable
from inside the reader (the DataSource API exposes no checkpoint).
Note Trigger.AvailableNow falls back to single-batch
execution for Python sources (Spark logs the fallback), so with a
cap an AvailableNow run lands ONE bounded batch and stops short of
the head — re-run to drain, or use a ProcessingTime trigger
(pinned by tests/test_txn_stream_read.py).
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
        self.max_versions = int(
            options.get("maxversionspertrigger", 0)) or None
        self.max_files = int(
            options.get("maxfilespertrigger", 0)) or None
        self.max_bytes = int(
            options.get("maxbytespertrigger", 0)) or None
        # best-known consumed position (a committed VERSION number):
        # seeded by initialOffset on a fresh query, re-learned from
        # partitions()/commit() on a restarted one — the admission
        # caps measure forward from here
        self._pos: int | None = None

    # ------------------------------------------------ offsets
    def initialOffset(self) -> dict:
        self._pos = self.start_v - 1
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        from ..operators import txnlog

        v = txnlog.latest_version(self.path)
        if v is None or v < self.start_v - 1:
            return {"version": self.start_v - 1}
        if (self.max_versions is None and self.max_files is None
                and self.max_bytes is None):
            return {"version": v}
        pos = self._pos
        if pos is None:
            # fresh query: Spark calls latestOffset BEFORE
            # initialOffset (observed under single-batch execution —
            # pinned by tests/test_txn_stream_read.py), so the
            # stream's own start is the position.  A RESTARTED query
            # re-plans the WAL's last batch first, so partitions()
            # has already taught us the checkpointed position by the
            # time latestOffset runs — capping from start_v here can
            # therefore never regress a restarted stream's offset.
            pos = self.start_v - 1
        if v <= pos:
            return {"version": v}
        return {"version": self._admit(pos, v)}

    def _admit(self, pos: int, head: int) -> int:
        """The capped batch end: admit whole versions past ``pos``
        until a cap trips — always at least one, so a single commit
        larger than maxFilesPerTrigger / maxBytesPerTrigger still
        flows (Delta's soft-cap semantics).  maxVersionsPerTrigger
        alone is pure arithmetic; the file/byte caps walk the
        candidate versions' manifests (JSON KBs — byte totals come
        from the manifests' commit-time ``files`` records), the same
        metadata the subsequent partitions() call reads anyway."""
        end = head
        if self.max_versions is not None:
            end = min(end, pos + self.max_versions)
        if self.max_files is None and self.max_bytes is None:
            return end
        files = nbytes = 0
        admitted = pos
        prev_dirs: set | None = None
        for v in range(pos + 1, end + 1):
            if admitted > pos and (
                    (self.max_files is not None
                     and files >= self.max_files)
                    or (self.max_bytes is not None
                        and nbytes >= self.max_bytes)):
                break
            try:
                vfiles, prev_dirs, vbytes = self._version_files(
                    v, prev_dirs)
            except (RuntimeError, FileNotFoundError):
                # fell behind retention or a refused commit class:
                # admit through it and let partitions() raise the
                # canonical loud error for the planned batch
                return end
            files += len(vfiles)
            nbytes += vbytes
            admitted = v
        return admitted

    # ------------------------------------------------ planning
    def _version_files(self, v: int,
                       prev_dirs: set | None) -> tuple[list, set, int]:
        """(new parquet files of version ``v``, ``v``'s dir set,
        new-dir byte total) under the append-only contract — the
        single source of truth for batch planning and file/byte-cap
        admission.  Bytes come from the manifest's per-dir ``files``
        records when present (zero stat calls); only dirs a
        pre-files-era manifest never recorded stat their walked
        files."""
        from ..operators import txnlog

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
            return [], set(man["dirs"]), 0  # physical-only rewrite
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
            return [], set(man["dirs"]), 0  # Delta skipChangeCommits
        else:
            raise RuntimeError(
                f"txntable stream on {self.path} hit a "
                f"content-changing commit at version {v} "
                f"({op or 'pre-op-era'}): the source serves "
                "append-only history — pass "
                "skip_change_commits=True to skip "
                "replace/merge/delete commits, or consume them "
                "through change_feed()")
        fmap = man.get("files", {})
        files: list[str] = []
        nbytes = 0
        for d in new:
            full = d if os.path.isabs(d) \
                else os.path.join(self.path, d)
            dfiles = _walk_parquet_files(full)
            files.extend(dfiles)
            if d in fmap:
                nbytes += int(fmap[d][1])
            else:
                # pre-files-era dir: stat exactly its own files once
                nbytes += sum(os.path.getsize(f) for f in dfiles)
        return files, set(man["dirs"]), nbytes

    def partitions(self, start: dict, end: dict):
        end_v = int(end["version"])
        if end_v < int(start["version"]):
            # a backwards range means an offset regressed somewhere
            # (checkpoint surgery, or an admission bug): serving it
            # as empty would let the WAL regress and re-deliver
            # consumed versions — fail loudly instead
            raise RuntimeError(
                f"txntable stream on {self.path} planned a "
                f"backwards batch ({start} -> {end}); refusing to "
                "regress the checkpointed position")
        # learn/advance the position: on a restart this is the first
        # sight of the checkpointed offsets, and re-planning a
        # retried batch never moves it backwards
        if self._pos is None or end_v > self._pos:
            self._pos = end_v
        parts: list[_TxnFilesPartition] = []
        prev_dirs: set | None = None
        for v in range(int(start["version"]) + 1, end_v + 1):
            files, prev_dirs, _ = self._version_files(v, prev_dirs)
            for f in files:
                parts.append(_TxnFilesPartition(f, self.schema_json))
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
        # offsets live in Spark's checkpoint WAL; the log keeps
        # nothing per-consumer (like Delta).  Only the admission
        # position advances here.
        v = int(end["version"])
        if self._pos is None or v > self._pos:
            self._pos = v


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
                    skip_change_commits: bool = False,
                    max_versions_per_trigger: int | None = None,
                    max_files_per_trigger: int | None = None,
                    max_bytes_per_trigger: int | None = None
                    ) -> DataFrame:
    """Open a txnlog table as a streaming DataFrame: registers the
    Python data source (idempotent per session) and returns
    ``readStream.format("txntable")`` over ``path``, consuming
    committed versions ``>= starting_version`` — compose with
    ``writeStream`` / ``foreachBatch`` like any stream.  Offsets ride
    in the sink's checkpoint, so stop/restart resumes at the next
    unconsumed commit (exactly-once with an idempotent sink — e.g.
    lane.run_txn_stream_copy's log-to-log pipeline).

    ``max_versions_per_trigger`` / ``max_files_per_trigger`` /
    ``max_bytes_per_trigger``: admission control for catch-up
    consumers (module docstring) — a long backlog drains as bounded
    micro-batches with checkpoint progress between them, Delta's
    ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` shape; the byte
    cap is served from the manifests' commit-time per-dir totals,
    so it adds no stat calls."""
    spark.dataSource.register(TxnTableStreamDataSource)
    rd = (spark.readStream.format(FORMAT_NAME)
          .option("path", os.path.abspath(path))
          .option("startingVersion", int(starting_version))
          .option("skipChangeCommits",
                  "true" if skip_change_commits else "false"))
    if max_versions_per_trigger is not None:
        rd = rd.option("maxVersionsPerTrigger",
                       int(max_versions_per_trigger))
    if max_files_per_trigger is not None:
        rd = rd.option("maxFilesPerTrigger",
                       int(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        rd = rd.option("maxBytesPerTrigger",
                       int(max_bytes_per_trigger))
    return rd.load()
