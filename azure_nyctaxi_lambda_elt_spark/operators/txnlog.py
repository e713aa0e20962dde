"""Versioned-manifest transaction log over a parquet directory —
the minimal Delta/Iceberg-shaped commit protocol that gives the
warehouse layer atomic commits, snapshot-isolated reads, and time
travel, without a table format dependency.

Reference parity: the reference's warehouse tables live in Synapse,
where MERGE/CTAS are transactional and readers never see a half-loaded
table (sql/batchELT/core/12_trip_clean.dedupe_load.sql relies on
that); on a plain parquet lake the same guarantee needs a commit
protocol.  This module provides the standard one:

- data files are immutable once written; a commit NEVER mutates files
  a previous version references;
- a version's manifest (``_txn/v{N}.json``) lists exactly the data
  directories that make up the table at version N;
- commits are atomic via write-to-temp + ``os.rename`` onto the
  version path.  rename also serves as the optimistic-concurrency
  lock: two writers racing to commit version N — both computed against
  parent N-1 — cannot both win; the loser's rename finds the path
  taken and raises ``TxnConflict`` (Delta's "concurrent modification"
  semantics), and its orphaned data dir is garbage, never visible;
- readers resolve the LATEST complete manifest (or a pinned
  ``version=`` for time travel) and read only the dirs it lists —
  a crash mid-write leaves data dirs without a manifest, which no
  reader ever sees.

Scale notes: the manifest holds directory names, not per-file rows, so
its size is O(commits retained), and the data-plane write is the same
partitioned parquet write the rest of the engine uses — the protocol
adds two tiny JSON I/Os per commit, nothing per row.  (Delta/Iceberg
add file-level stats for pruning; `partition_stats` + parquet footers
play that role here.)
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TxnConflict(RuntimeError):
    """Another writer committed the same version first."""


class ConcurrentModification(RuntimeError):
    """A keyed read-modify-write (MERGE / DELETE called with
    ``read_version=``) lost to a concurrent commit that touched the
    same logical rows — or one whose touched set is undecidable:
    retrying would silently overwrite the winner's change with intent
    computed before seeing it (a lost update), so the engine refuses
    instead (Delta's ConcurrentModificationException family).

    Deliberately a SIBLING of TxnConflict, not a subclass:
    ``commit_with_retry`` auto-retries TxnConflict (safe — every
    operation recomputes against the new snapshot) but must surface
    this one to the caller, who has to recompute their updates from
    the current table state before trying again.

    Isolation level: **WriteSerializable** (Delta's default) — blind
    appends and physical-only rewrites (compact / zorder) serialize
    before a concurrent keyed write without conflicting; keyed writes
    against overlapping keys, table replaces (overwrite / restore),
    and undecidable cases refuse.  The conflict matrix lives in
    :func:`_check_write_conflict`."""


class ConstraintViolation(ValueError):
    """A write's rows violate a declared table constraint — the
    commit is refused and the table is unchanged (Delta CHECK
    constraint semantics).  Carries ``violations``:
    {constraint_name: violating_row_count}."""

    def __init__(self, path: str, violations: dict[str, int]):
        self.violations = dict(violations)
        detail = ", ".join(f"{k}: {n} rows"
                           for k, n in sorted(violations.items()))
        super().__init__(
            f"constraint violation on {path}: {detail}")


class LogStore:
    """The commit primitive, isolated: publish ``tmp``'s bytes at key
    ``final`` IF AND ONLY IF ``final`` is not already published —
    create-if-absent or raise ``TxnConflict``.  Everything above this
    interface is store-agnostic; deployments pick the store that gives
    their storage a true test-and-set (Delta ships the same seam as its
    LogStore for S3/ABFS/GCS)."""

    def publish(self, final: str, tmp: str) -> None:
        raise NotImplementedError


class PosixLinkLogStore(LogStore):
    """Default: POSIX hard-link.  ``os.link`` is atomic and raises
    ``FileExistsError`` when the target exists (unlike ``os.rename``,
    which silently replaces — a rename-based commit would let writer B
    clobber writer A's already-verified manifest and both would report
    success)."""

    def publish(self, final: str, tmp: str) -> None:
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise TxnConflict(
                f"lost the commit race: {os.path.basename(final)} "
                "already published") from e


class InMemoryConditionalPutLogStore(LogStore):
    """Object-store double: models a conditional PUT (S3
    ``If-None-Match: *``, ABFS ETag precondition, GCS
    ``x-goog-if-generation-match: 0``) against an in-memory bucket.

    The test-and-set happens on the BUCKET under a lock — exactly the
    store-side atomicity those preconditions provide — and only the
    winner materializes ``final`` for readers; the loser raises
    ``TxnConflict`` without touching the key.  Used by the
    racing-writer tests to execute the documented object-store
    contract rather than assert it from a docstring."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._bucket: dict[str, bytes] = {}

    def publish(self, final: str, tmp: str) -> None:
        with open(tmp, "rb") as fh:
            body = fh.read()
        with self._lock:
            if final in self._bucket:
                raise TxnConflict(
                    f"lost the commit race: {os.path.basename(final)} "
                    "already published (precondition failed)")
            self._bucket[final] = body
        # winner's PUT is visible to readers: materialize the key
        with open(final, "wb") as fh:
            fh.write(body)


_LOG_STORE: LogStore = PosixLinkLogStore()


def set_log_store(store: LogStore | None) -> LogStore:
    """Swap the commit primitive (None restores the POSIX default);
    returns the previously active store."""
    global _LOG_STORE
    prev = _LOG_STORE
    _LOG_STORE = store if store is not None else PosixLinkLogStore()
    return prev


def _txn_dir(path: str) -> str:
    return os.path.join(path, "_txn")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_txn_dir(path), f"v{version:08d}.json")


def _head_hint_path(path: str) -> str:
    return os.path.join(_txn_dir(path), "_head")


def _write_head_hint(path: str, version: int) -> None:
    """Best-effort version hint (Delta's ``_last_checkpoint`` role):
    written AFTER a successful publish, atomically replaced,
    last-writer-wins.  A stale hint is always safe — readers probe
    FORWARD from it — and a lost/corrupt hint only costs the listing
    fallback, so the hint needs no coordination with the commit's
    test-and-set."""
    hint = _head_hint_path(path)
    tmp = f"{hint}.tmp-{os.getpid()}-{next(_TMP_SEQ)}"
    try:
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, hint)
    except OSError:  # hint is an optimization, never a failure
        if os.path.exists(tmp):
            os.remove(tmp)


def _latest_occupied(path: str) -> int | None:
    """Highest version whose manifest FILE exists — including members
    of an undecided or aborted transaction group.  This is the
    WRITER's number line (a new commit claims occupied+1); readers
    want :func:`latest_version`, which additionally skips invisible
    group members at the head.

    O(1) on the steady-state path: read the ``_head`` hint and probe
    forward (hint, hint+1, ...) until the first missing manifest —
    the hint is written after every commit, so the probe usually
    checks exactly two keys instead of LISTING the log directory
    (O(commits), and a paginated LIST call on an object store).
    Falls back to the full listing when the hint is absent, corrupt,
    or points at a vacuumed manifest."""
    d = _txn_dir(path)
    if not os.path.isdir(d):
        return None
    hint = None
    try:
        with open(_head_hint_path(path)) as fh:
            hint = int(fh.read().strip())
    except (OSError, ValueError):
        pass
    if hint is not None and os.path.exists(_manifest_path(path, hint)):
        v = hint
        while os.path.exists(_manifest_path(path, v + 1)):
            v += 1
        return v
    versions = [
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def latest_version(path: str) -> int | None:
    """Highest COMMITTED version visible to readers, or None for an
    uninitialized table.  A manifest published as a member of a
    multi-table transaction group (commit_group) is invisible until
    the group's coordinator record decides COMMITTED — pending and
    aborted members at the head are skipped, exactly MVCC's
    uncommitted-row rule.  Tables that never used groups pay one
    manifest read (the head is decided by definition of not having a
    group field)."""
    v = _latest_occupied(path)
    while v is not None and v >= 0:
        try:
            man = _read_manifest(path, v)
        except FileNotFoundError:
            # settled-away member manifest (a concurrent writer
            # cleared an aborted group): keep walking down.  ONLY
            # the vanished-file race walks — a manifest that still
            # exists but fails to parse (torn write, corruption)
            # re-raises: silently serving the PREVIOUS version as
            # latest would have snapshot/commit operate on stale
            # state with no error (r9 ADVICE medium)
            v -= 1
            continue
        if _group_state(man) in (None, "committed"):
            return v
        v -= 1
    return None


class TornManifest(ValueError):
    """A manifest's recorded content checksum does not match its
    bytes: a torn or bit-rotted write that still parses as JSON.
    Raised on READ — completing what the unparseable-manifest
    re-raise starts (r9 ADVICE): a corrupt-but-parseable manifest
    must surface as a loud refusal, never as a silently-wrong table
    state served to snapshot/commit."""


def _manifest_checksum(body: dict) -> str:
    """Content checksum over the manifest body MINUS the checksum
    field itself, computed on a canonical serialization (sorted keys,
    minimal separators) so the verify side can recompute it from the
    PARSED dict — json str/int/float/bool round-trip exactly, so
    write-side and read-side canonical forms are byte-equal iff the
    content is."""
    import hashlib

    canon = json.dumps(
        {k: v for k, v in body.items() if k != "checksum"},
        sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        man = json.load(fh)
    want = man.get("checksum")
    if want is not None and _manifest_checksum(man) != want:
        raise TornManifest(
            f"manifest v{version} of {path} fails its content "
            "checksum — torn or corrupted write; refusing to serve "
            "it (restore an intact copy or roll the table back)")
    return man


# -------------------------------------------- multi-table txn groups

GROUP_SETTLE_GRACE_SECONDS = 60.0
# ceiling on a DECLARED per-group grace (commit_group's
# grace_seconds): an unbounded or non-finite value would let one
# crashed writer wedge every member table forever — a day bounds the
# worst-case wedge while still covering any realistic multi-table
# data write
GROUP_GRACE_MAX_SECONDS = 86400.0


def _group_state(man: dict) -> str | None:
    """A manifest's transaction-group outcome: None (not a group
    member — decided by construction), 'committed', 'aborted', or
    'pending' (no decision readable).

    The coordinator record is the decision; the member's OWN
    ``marker`` file (written under each member table's _txn/groups
    right after a commit decision) is its durable mirror, so a
    committed member's visibility never depends on a FOREIGN table's
    files (r9 ADVICE medium: first-member table deleted/relocated ⇒
    other members' committed versions read as pending and were
    settle-aborted — silent loss of committed history).  A committed
    marker also overrides an aborted coord: markers are only ever
    written after a won COMMIT decision, so marker-committed with
    coord-aborted can only mean a settler recreated a lost coord
    file — the commit really happened."""
    g = man.get("group")
    if not g:
        return None
    rec = None
    try:
        with open(g["coord"]) as fh:
            rec = json.load(fh)
    except (OSError, ValueError):
        rec = None
    if rec is not None and rec.get("committed"):
        return "committed"
    if _any_member_marker_committed(g):
        # own marker OR any sibling's (the "members" list): a commit
        # decision that crashed mid-mirror still resurrects from
        # whichever member's marker landed
        return "committed"
    if rec is None:
        return "pending"
    return "aborted"


def _any_member_marker_committed(g: dict) -> bool:
    """Probe the group's decision mirrors — the member's own
    ``marker`` plus every sibling's (derived from the ``members``
    list).  Markers are written ONLY after a won COMMIT decision, so
    one surviving marker anywhere proves the group committed, even
    when the coordinator file (or its whole table) is gone and the
    mirror loop crashed partway: without the sibling probe, the
    marker-less members would read pending and eventually be
    settle-aborted while the marker-ed ones read committed — a torn
    multi-table transaction."""
    paths = [g["marker"]] if g.get("marker") else []
    gid = g.get("id", "")
    paths += [os.path.join(_txn_dir(p), "groups",
                           f"{gid}.decided.json")
              for p in g.get("members", [])]
    for mk in paths:
        try:
            with open(mk) as fh:
                if json.load(fh).get("committed"):
                    return True
        except (OSError, ValueError):
            continue
    return False


def _require_decided(path: str, v: int, man: dict) -> None:
    """Guard for PINNED-version operations (time travel, restore,
    clone, CDF, describe): an undecided or aborted group member is
    not part of the table's history — reading it would expose
    uncommitted MVCC state, and restoring/cloning it would resurrect
    an aborted write as a committed version."""
    if _group_state(man) not in (None, "committed"):
        raise ValueError(
            f"version {v} of {path} belongs to an uncommitted "
            "transaction group")


def _decide_group(g: dict, committed: bool) -> bool:
    """Race a decision onto the group's coordinator record — the
    LogStore test-and-set makes exactly ONE outcome win, however many
    writers race (the group's owner publishing commit vs a settler
    publishing abort).  Returns the DECIDED outcome, whoever won."""
    coord = g["coord"]
    os.makedirs(os.path.dirname(coord), exist_ok=True)
    tmp = f"{coord}.tmp-{os.getpid()}-{next(_TMP_SEQ)}"
    with open(tmp, "w") as fh:
        # the member list rides in the record so vacuum's group-file
        # GC can repair every member's own decision mirror before
        # retiring a committed coordinator file (pre-r11 records
        # without it are never GC'd — conservative)
        json.dump({"id": g["id"], "committed": committed,
                   "members": list(g.get("members", []))}, fh)
    try:
        _LOG_STORE.publish(coord, tmp)
    except TxnConflict:
        pass  # already decided — read which way below
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    with open(coord) as fh:
        return bool(json.load(fh).get("committed"))


def _settle_stale_groups(path: str) -> None:
    """Writer-side recovery, called before claiming a version: clear
    undecided/aborted group members from the occupied head so an
    abandoned group never wedges the table.  aborted → delete the
    member manifest (no reader ever saw it; its data dirs become
    vacuum-collectable orphans).  pending past the grace window → the
    group's writer is presumed dead: race an abort onto the
    coordinator record and clear.  pending and FRESH → leave it (an
    in-flight group is just a concurrent writer; this caller's own
    version claim will raise TxnConflict and retry)."""
    import time

    last = None
    while True:
        v = _latest_occupied(path)
        if v is None or v < 0:
            return
        if v == last:
            return  # no progress (e.g. corrupt manifest): stop;
            # the caller's own claim will surface the real error
        last = v
        mpath = _manifest_path(path, v)
        try:
            man = _read_manifest(path, v)
        except (OSError, ValueError):
            continue  # another settler cleared it; re-resolve
        st = _group_state(man)
        if st in (None, "committed"):
            if st == "committed":
                # SETTLE-REPAIR: committed-by-marker with the coord
                # file lost (first member table deleted, crash mid-
                # mirror) — republish the decision at the coord path
                # so later readers converge in one read instead of
                # probing every member's mirror
                g = man["group"]
                try:
                    with open(g["coord"]) as fh:
                        json.load(fh)
                except (OSError, ValueError):
                    _decide_group(g, committed=True)
            return
        if st == "pending":
            try:
                age = time.time() - os.path.getmtime(mpath)
            except OSError:
                continue
            # a group declaring a longer grace (long multi-table
            # data writes at scale) is honored by every settler —
            # a fixed 60 s would spuriously abort any group whose
            # later members write >60 s after the first publishes
            # (r9 ADVICE low).  Clamp defensively: a corrupt/hostile
            # manifest value (inf, NaN, negative — or a NON-NUMERIC
            # one, possible in pre-checksum/tampered manifests) must
            # neither wedge the table forever nor disable the
            # freshness check; a ValueError here would wedge every
            # subsequent writer's settle pass
            try:
                grace = float(man["group"].get(
                    "grace", GROUP_SETTLE_GRACE_SECONDS))
            except (TypeError, ValueError):
                grace = GROUP_SETTLE_GRACE_SECONDS
            if not (0.0 < grace <= GROUP_GRACE_MAX_SECONDS):
                grace = (GROUP_GRACE_MAX_SECONDS
                         if grace > GROUP_GRACE_MAX_SECONDS
                         else GROUP_SETTLE_GRACE_SECONDS)
            if age < grace:
                return
            if _decide_group(man["group"], committed=False):
                return  # raced the owner and LOST: group committed
        try:
            os.remove(mpath)
        except FileNotFoundError:
            pass


def _json_safe(v):
    """Normalize a collected stats value for the manifest (and for
    probes compared AGAINST manifest envelopes — both sides must go
    through the same mapping or comparisons cross types): dates and
    timestamps as ISO strings (string order == time order), Decimal
    as float (exact under 2^53 — money at scale 2 stays exact to
    ~9e15; pruning only needs order)."""
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v if isinstance(v, (int, float, str, type(None))) \
        else v.isoformat()


def _schema_json(df: DataFrame) -> str:
    return df.schema.json()


_WIDENING_CHAINS = (
    ["byte", "short", "integer", "long"],
    ["float", "double"],
)


def _wider_field(parent_f, new_f):
    """The field a parent/new pair merges to: same type passes
    through; a WIDENING atomic change (byte→short→int→long,
    float→double, in either direction of the write — the TABLE
    schema always keeps the wider end so old and new files both
    upcast) merges to the wider type; anything else raises.  Delta
    rejects narrowing writes the same way — committing the narrow
    type would make snapshot() read the old wider files through
    spark.read.schema and fail with parquet long→int conversion
    errors, an unreadable table (the r7 advice repro)."""
    from pyspark.sql.types import StructField

    pt, nt = parent_f.dataType, new_f.dataType
    # nullability merges as OR: either generation holding NULLs means
    # the table column is nullable
    nullable = parent_f.nullable or new_f.nullable
    if pt == nt:
        dt = nt
    else:
        dt = None
        for chain in _WIDENING_CHAINS:
            pn, nn = pt.typeName(), nt.typeName()
            if pn in chain and nn in chain:
                dt = pt if chain.index(pn) >= chain.index(nn) else nt
                break
        if dt is None:
            raise ValueError(
                f"incompatible type change for column "
                f"'{parent_f.name}': {pt.simpleString()} -> "
                f"{nt.simpleString()} (only widening within "
                f"{_WIDENING_CHAINS} is committable; anything else "
                f"needs an explicit overwrite of history)")
    return StructField(parent_f.name, dt, nullable, new_f.metadata)


def _merge_schema_json(parent_json: str | None,
                       new_json: str) -> str:
    """Table schema after a write: the parent's field order with the
    new write's fields merged in (Delta mergeSchema semantics) — new
    columns append at the end; a field present in both merges to the
    WIDER type (``_wider_field``), so an int→bigint generation change
    reads back widened (Spark's parquet reader upcasts the old
    files) while a NARROWING write raises instead of committing a
    schema the old dirs can't be read under."""
    import json as _json

    from pyspark.sql.types import StructType

    new_st = StructType.fromJson(_json.loads(new_json))
    if not parent_json:
        return new_json
    parent_st = StructType.fromJson(_json.loads(parent_json))
    new_by_name = {f.name: f for f in new_st.fields}
    fields = [
        _wider_field(f, new_by_name.pop(f.name))
        if f.name in new_by_name else f
        for f in parent_st.fields]
    fields += [f for f in new_st.fields if f.name in new_by_name]
    return StructType(fields).json()


def _col_stats(df: DataFrame, cols: list[str]) -> tuple[dict, int]:
    """Per-column [min, max] of ``df`` plus its row count, as JSON-safe
    values.  One aggregation job covers all columns and the count."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return ({c: [_json_safe(row[f"__lo_{c}"]), _json_safe(row[f"__hi_{c}"])]
             for c in cols}, int(row["__n"]))


_PARQUET_EXACT_RE = None


def _parquet_exact_type(simple: str) -> bool:
    """Spark types whose parquet write→read round-trip is value- and
    type-exact, so metrics computed ON THE WRITE JOB'S OWN ROWS
    (DataFrame.observe) equal a read-back aggregation over the
    written files bit for bit.  Anything else (nested types, void,
    interval) falls back to the legacy read-back jobs — correctness
    first, the optimization only claims the cases it can prove."""
    global _PARQUET_EXACT_RE
    if _PARQUET_EXACT_RE is None:
        import re
        _PARQUET_EXACT_RE = re.compile(
            r"^(tinyint|smallint|int|bigint|float|double|boolean|"
            r"date|timestamp|timestamp_ntz|string|binary|"
            r"decimal\(\d+,\d+\))$")
    return bool(_PARQUET_EXACT_RE.match(simple))


def _checks_resolvable(df: DataFrame, checks: dict) -> dict:
    """The subset of CHECK expressions that RESOLVE against ``df``'s
    own columns (driver-only analysis, no job).  A resolvable check
    evaluated on the write job's rows is exactly the read-back
    validation of the written dir — the files hold df's columns and
    values.  Unresolvable ones (expression referencing a column this
    write lacks, legal under schema evolution) keep the legacy
    read-back path, where the missing column reads NULL under the
    table schema."""
    out = {}
    for name, sql in checks.items():
        try:
            df.select(F.expr(sql)).schema  # forces analysis only
            out[name] = sql
        except Exception:
            pass
    return out


def _observed_write(spark: SparkSession, path: str, data_dir: str,
                    df: DataFrame, stat_cols: list[str],
                    bloom_cols: list[str],
                    checks: dict | None = None
                    ) -> tuple[dict, dict, dict, dict]:
    """Plain (unpartitioned) data-dir write with the commit's per-dir
    metadata computed INSIDE the write job: ``DataFrame.observe``
    rides the [min, max]/count stats and the declared bloom columns'
    bitmap aggregates (bloomindex.bitmap_agg_sql) on the same pass
    that persists the rows — ONE job where the previous shape paid
    the write plus a stats read-back agg plus one read-back build per
    bloom column (guide §1.2: fix the pass count before anything
    else; measured ~0.8-1.4 s of read-back jobs per commit at bench
    scale, a full extra scan of new data per commit at any scale).

    The nondeterministic-lineage rule the read-back formulation
    existed for HOLDS by construction: observe metrics are computed
    on the rows of the SAME evaluation the writer persisted, never a
    re-execution.  Equality with read-back needs the parquet
    round-trip to be value- and type-exact, so any stat/bloom column
    whose dtype is outside _parquet_exact_type falls back to the old
    read-back path for exactly that artifact
    (tests/test_r13_opt_equivalence.py pins byte-equality of both
    stats and sidecars).

    ``checks`` ({name: sql-boolean}, pre-filtered by
    _checks_resolvable) additionally rides the per-constraint
    violating-row counts on the same job — SQL CHECK semantics
    (NULL passes), the identical aggregate _validate_constraints
    computes by read-back.  The caller raises ConstraintViolation
    from the returned counts BEFORE publishing, so the refusal
    contract (claimed dir orphaned, table unchanged) is untouched.

    Returns ``(stats, rows, sidecar_bodies, violations)``:
    stats/rows are ``{dir_name: ...}`` maps (empty when
    ``stat_cols`` is empty, same as the callers recorded before),
    sidecar_bodies maps each bloom column to its ready-to-publish
    body for THIS dir (_maintain_bloom writes them without any
    further job; columns absent from the frame record the all-zero
    'absent' body exactly like the legacy build), and violations
    maps each ``checks`` name to its violating-row count."""
    from pyspark.sql import Observation

    from . import bloomindex  # function-scoped: bloomindex imports us

    name = os.path.basename(data_dir)
    dtypes = dict(df.dtypes)
    ok_stats = bool(stat_cols) and all(
        _parquet_exact_type(dtypes.get(c, "")) for c in stat_cols)
    bcols_obs = [c for c in bloom_cols
                 if c in dtypes and _parquet_exact_type(dtypes[c])]
    aggs = []
    if ok_stats:
        aggs.append(F.count(F.lit(1)).alias("__obs_n"))
        for c in stat_cols:
            aggs += [F.min(c).alias(f"__obs_lo_{c}"),
                     F.max(c).alias(f"__obs_hi_{c}")]
    for c in bcols_obs:
        for i, sql in enumerate(bloomindex.bitmap_agg_sql(c)):
            aggs.append(F.expr(sql).alias(f"__obs_bm_{c}_{i}"))
    check_names = sorted(checks or {})
    for i, cname in enumerate(check_names):
        aggs.append(
            F.sum(F.when(~F.coalesce(F.expr(checks[cname]),
                                     F.lit(True)), 1).otherwise(0))
            .cast("long").alias(f"__obs_ck_{i}"))
    if aggs:
        obs = Observation()
        df.observe(obs, *aggs).write.mode("overwrite") \
            .parquet(data_dir)
        row = obs.get
    else:
        df.write.mode("overwrite").parquet(data_dir)
        row = {}
    stats: dict = {}
    rows: dict = {}
    if ok_stats:
        stats = {name: {c: [_json_safe(row[f"__obs_lo_{c}"]),
                            _json_safe(row[f"__obs_hi_{c}"])]
                        for c in stat_cols}}
        rows = {name: int(row["__obs_n"])}
    elif stat_cols:
        # non-round-trip-exact stat dtype: envelopes from the WRITTEN
        # files, the pre-optimization formulation
        cstats, n = _col_stats(
            spark.read.parquet(data_dir), list(stat_cols))
        stats, rows = {name: cstats}, {name: n}
    bodies: dict = {}
    for c in bcols_obs:
        bits = bloomindex.merge_bitmap_parts(
            [row[f"__obs_bm_{c}_{i}"]
             for i in range(bloomindex.BLOOM_K)])
        bodies[c] = bloomindex.sidecar_body(c, dtypes[c], bits)
    for c in bloom_cols:
        if c not in dtypes:
            # written dir cannot hold the column: all-zero 'absent'
            # sidecar, no scan needed (legacy build reads the dir's
            # schema to conclude the same)
            bodies[c] = bloomindex.sidecar_body(
                c, "absent", bloomindex.merge_bitmap_parts([]))
    violations = {cname: int(row[f"__obs_ck_{i}"] or 0)
                  for i, cname in enumerate(check_names)}
    return stats, rows, bodies, violations


def _compute_generated(df: DataFrame,
                       gen: dict[str, str]) -> DataFrame:
    """GENERATED ALWAYS AS columns (Delta generated-column shape):
    each declared column ABSENT from the frame is computed from its
    SQL expression; columns the writer provided explicitly are left
    in place and validated AGAINST the expression post-write (a
    mismatch refuses the commit) — Delta's rule that explicit writes
    are allowed only when they equal the generation expression.
    Reference parity: the CTAS-derived night_flag / ingest_date
    columns (sql/batchELT/core/11_trip_clean.slice_ctas.sql:1)."""
    for c in sorted(gen):
        if c not in df.columns:
            df = df.withColumn(c, F.expr(gen[c]))
    return df


def _generated_checks(gen: dict[str, str]) -> dict[str, str]:
    """The validation twin: one synthesized CHECK per generated
    column — ``col <=> (expr)`` (null-safe, so an expression that
    evaluates NULL must be stored as NULL, never free-passed) — run
    through the SAME one-agg-job machinery as user CHECK constraints
    (_validate_constraints), post-write over the written files."""
    return {f"generated:{c}": f"{c} <=> ({sql})"
            for c, sql in gen.items()}


def _analyze_per_dir(spark: SparkSession, path: str,
                     rel_dirs: list[str],
                     cols: list[str]) -> dict:
    """ANALYZE-grade per-dir column statistics over NEWLY WRITTEN
    dirs: row count + per-column NULL count + exact NDV, computed by
    ONE input_file_name-tagged aggregation job covering every dir
    and column together (never a job per partition — the same shape
    as _write_partitioned's stats restatement).  Exact NDV (hash
    aggregate per dir) keeps the recorded stats oracle-pinnable; at
    petabyte scale swap F.count_distinct for F.approx_count_distinct
    here — the manifest format is unchanged.  Reference parity: the
    post-load statistics maintenance pass
    (sql/batchELT/mdl/load/45_postload_stats.sql:1).

    Partition columns ARE analyzable: the engine's partitioned
    layout keeps them as ordinary data columns in the leaf files
    (the dir name is layout, not the value authority —
    _write_partitioned's shadow-column invariant), so an
    analyze_cols entry naming one reads real values from the leaf
    scan like any other column (pinned by
    tests/test_txn_analyze.py::test_analyze_partition_column).

    Returns {rel_dir: {"rows": n, "cols": {col: {"nulls", "ndv"}}}}.
    """
    base = os.path.abspath(path)
    scan = spark.read.parquet(
        *[os.path.join(base, d) for d in rel_dirs])
    aggs = [F.count("*").cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).cast("long")
            .alias(f"__ndv_{c}"),
        ]
    out: dict = {}
    for r in (scan.withColumn("__dir", _dir_col_decoded())
              .groupBy("__dir").agg(*aggs).collect()):
        rel = os.path.relpath(r["__dir"], base)
        out[rel] = {
            "rows": int(r["__n"]),
            "cols": {c: {"nulls": int(r[f"__null_{c}"]),
                         "ndv": int(r[f"__ndv_{c}"])} for c in cols},
        }
    return out


def analyze_stats(path: str, version: int | None = None) -> list[dict]:
    """Metadata-only readback of the per-dir ANALYZE statistics
    recorded by ``commit(analyze_cols=...)`` — plain manifest JSON
    reads, NO data scan and no Spark job at all (the structural
    claim the txn_analyze_stats entry hashes): the null-count and
    distinct-count profile of a 100 TB table answers from KBs of
    metadata, which is what feeds join-size estimates and
    count-distinct rewrites.  Returns one record per (dir, column):
    {"dir", "version_born", "rows", "col", "nulls", "ndv"}, where
    version_born is parsed from the writer-unique dir name
    (data-v{version:08d}-...)."""
    v = latest_version(path) if version is None else int(version)
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    _require_decided(path, v, man)
    import re as _re

    out: list[dict] = []
    for d in sorted(man.get("analyze", {})):
        rec = man["analyze"][d]
        # \d+ not a fixed 8-char slice: {version:08d} grows past 8
        # digits at version >= 10^8 (the same width bug the codebook
        # GC regex had); clones key records by ABSOLUTE source path,
        # so search any path segment
        m = _re.search(r"(?:^|/)data-v(\d+)-", d)
        born = int(m.group(1)) if m else -1
        for c in sorted(rec["cols"]):
            s = rec["cols"][c]
            out.append({"dir": d, "version_born": born,
                        "rows": int(rec["rows"]), "col": c,
                        "nulls": int(s["nulls"]),
                        "ndv": int(s["ndv"])})
    return out


def _assign_identity(df: DataFrame, col: str,
                     hwm: int) -> tuple[DataFrame, int]:
    """Assign ``hwm+1 .. hwm+n`` to a new ``col`` — the distributed
    contiguous-id assignment (zipWithIndex's shape, DataFrame-native):
    one tiny job collects per-partition row counts (O(#partitions)
    driver rows, never data), cumulative offsets ride in a literal
    map, and ids are offset + intra-partition row_number.  The input
    is lazily localCheckpoint'ed first so BOTH jobs (count, write)
    see the same partition contents — a nondeterministic lineage
    re-evaluating differently between them would otherwise collide
    ids across partitions' reserved blocks.  Contiguity means the id
    SET of a table is exactly 1..hwm, which an oracle can verify
    without depending on which row drew which id (assignment order
    is partition-layout-dependent, like every distributed IDENTITY).
    Returns (df_with_col, new_hwm)."""
    from pyspark.sql.window import Window

    if col in df.columns:
        raise ValueError(
            f"identity column '{col}' is GENERATED ALWAYS: the "
            "engine assigns it; drop it from the write")
    src = df.localCheckpoint(eager=False)
    tagged = src.withColumn("__pid", F.spark_partition_id()) \
        .withColumn("__ord", F.monotonically_increasing_id())
    counts = sorted(
        (r["__pid"], r["n"]) for r in
        tagged.groupBy("__pid").agg(F.count("*").alias("n"))
        .collect())
    if not counts:
        return (df.withColumn(col, F.lit(None).cast("long")), hwm)
    offs, acc = [], hwm + 1
    for p, n in counts:
        offs.append((p, acc))
        acc += n
    omap = F.create_map(
        *[F.lit(x) for po in offs for x in po])
    w = Window.partitionBy("__pid").orderBy("__ord")
    out = (tagged
           .withColumn(col,
                       (F.element_at(omap, F.col("__pid"))
                        + F.row_number().over(w) - 1).cast("long"))
           .drop("__pid", "__ord"))
    return out, acc - 1


def _historical_hwm(path: str, col: str) -> int:
    """Highest high-water mark ``col`` ever reached across the
    table's surviving manifests.  Re-declaring a previously used
    identity column (after a '' clear, or switching columns and
    back) must CONTINUE from it — starting over at 0 would re-issue
    already-assigned surrogate ids, breaking the documented
    'ids are NEVER reused' contract that restore() preserves with
    the same monotone rule (r9 ADVICE low).  Only runs on the rare
    re-declaration branch, never on the inherit path."""
    try:
        names = os.listdir(_txn_dir(path))
    except OSError:
        return 0
    hwm = 0
    for f in names:
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        try:
            with open(os.path.join(_txn_dir(path), f)) as fh:
                ident = json.load(fh).get("identity")
        except (OSError, ValueError):
            continue
        if ident and ident.get("col") == col:
            hwm = max(hwm, int(ident.get("hwm", 0)))
    return hwm


def _resolve_identity(pman: dict, parent: int | None,
                      identity: str | None, mode: str,
                      path: str) -> dict | None:
    """The table's identity property for this commit: None inherits
    the parent's, a column name declares (hwm continues if the same
    column was already declared — including across a clear or a
    column switch, via the manifest-history scan), '' clears.
    Declaring on an APPEND to a table that already holds data is
    refused — the carried rows would read back with NULL ids (Delta
    only allows IDENTITY at table creation for the same reason);
    declare on an overwrite."""
    pident = pman.get("identity") if parent is not None else None
    if identity is None:
        return dict(pident) if pident else None
    if identity == "":
        return None
    if pident and pident["col"] == identity:
        return {"col": identity, "hwm": pident["hwm"]}
    if parent is not None and mode == "append" and pman.get("dirs"):
        raise ValueError(
            f"cannot declare identity column '{identity}' on an "
            "append: carried rows would have no ids — declare it on "
            "an overwrite (or at table creation)")
    return {"col": identity, "hwm": _historical_hwm(path, identity)}


def commit(df: DataFrame, path: str, mode: str = "overwrite",
           meta: dict | None = None,
           stats_cols: list[str] | None = None,
           bloom_cols: list[str] | None = None,
           partition_by: list[str] | None = None,
           constraints: dict[str, str] | None = None,
           identity: str | None = None,
           group: dict | None = None,
           analyze_cols: list[str] | None = None,
           generated: dict[str, str] | None = None,
           read_version: int | None = None) -> int:
    """Atomically commit ``df`` as the next version.

    ``generated`` declares GENERATED ALWAYS AS columns as a TABLE
    PROPERTY ({col: sql_expr} — Delta generated columns; None
    inherits the parent's, {} clears): a declared column absent from
    ``df`` is computed from its expression before the write; a
    column the writer provides explicitly is validated against the
    expression post-write over the WRITTEN files (null-safe
    equality) and a mismatch REFUSES the commit exactly like a CHECK
    violation — the table unchanged, no version consumed.  Newly
    declaring over existing data validates the carried dirs too
    (rows lacking the column read NULL and refuse unless the
    expression is NULL there).  MERGE computes absent generated
    columns on its upserts and re-validates its rewritten dirs;
    restore/clone/compact carry the property.

    ``analyze_cols`` additionally records ANALYZE-grade per-dir
    statistics (row count, per-column NULL count, exact NDV) in the
    manifest for the NEW dirs — one tagged aggregation job, read
    back without any data scan by :func:`analyze_stats`; appends
    carry the parent's recorded dirs forward (rewrite paths — merge,
    compact, zorder — drop the rewritten dirs' records; re-commit
    with analyze_cols to refresh them).

    mode='overwrite' → the new version is exactly df's rows;
    mode='append'    → the new version is the parent's dirs + df's.
    ``meta`` rides in the manifest (e.g. the streaming sink stores the
    micro-batch id there for exactly-once redelivery skips).
    ``stats_cols`` records per-dir [min, max] column envelopes in the
    manifest (Iceberg-style file stats at dir grain) — snapshot() can
    then prune dirs whose envelope misses a predicate's range.
    ``bloom_cols`` builds the per-dir Bloom sidecars for point-lookup
    skipping (operators/bloomindex.py) AT COMMIT TIME, over the NEW
    dir only, and records the column list in the manifest so every
    later commit / merge / compact on the table maintains the index
    without being asked — an index that requires remembering a second
    job after each commit is missing exactly when needed (the
    reference's columnstore segment elimination is always-on:
    sql/batchELT/core/12_trip_clean.dedupe_load.sql's key probes).
    On append the declared sets UNION with the parent manifest's, so
    declaring once at table creation is enough.
    ``partition_by`` splits the commit's data into ONE MANIFEST DIR
    PER PARTITION VALUE (Hive-style subdirs of the claimed dir, with
    per-dir stats over ``stats_cols`` ∪ ``partition_by``) — the
    intra-commit half of partition pruning: a date-range
    ``snapshot(prune=...)`` then opens only the matching partition
    dirs of every commit, not each commit's whole output.  The
    partition columns stay ORDINARY DATA COLUMNS in the files (the
    dir name is layout, not the value authority), so snapshot's
    per-dir reads need no basePath reconstruction and the table
    schema is unchanged.  Like ``bloom_cols`` it is a TABLE
    PROPERTY: pass it once at table creation and every later commit
    partitions the same way (None inherits; an explicit [] clears);
    compact() bin-packs WITHIN partition values, MERGE splits its
    copy-on-write rewrite per value, and restore/clone/zorder carry
    the property forward.
    ``constraints`` declares CHECK constraints as a TABLE PROPERTY
    (Delta ``ADD CONSTRAINT`` / NOT NULL analog): a name→SQL-boolean
    dict (NOT NULL is ``"col IS NOT NULL"``); every commit and MERGE
    validates its INCOMING rows with one agg job and raises
    ConstraintViolation instead of publishing (the claimed dir is
    orphaned and vacuumed; the table is unchanged — the reference's
    DQ gate moved into the log layer,
    sql/batchELT/dq/50_dq_modeling.sql's named checks).  SQL CHECK
    semantics: a NULL predicate passes, only literal false violates.
    None inherits the parent's set, an explicit dict REPLACES it
    ({} clears); newly added constraint names additionally validate
    the CARRIED dirs on an append (Delta's ADD CONSTRAINT scans
    existing data the same way).
    ``identity`` declares a GENERATED ALWAYS AS IDENTITY column as a
    TABLE PROPERTY (the warehouse surrogate key the reference gets
    from its MPP pool's IDENTITY): the engine assigns monotone ids
    above a manifest high-water mark to every committed row — writes
    must NOT provide the column — and the hwm rides in the manifest,
    so each commit's block is collision-free without any cross-writer
    coordination beyond the commit race itself.  Ids are contiguous
    per commit (hwm+1..hwm+n via per-partition offsets, no global
    sort; see _assign_identity) and NEVER reused: overwrites continue
    the hwm, restore keeps it monotone, MERGE assigns fresh ids only
    to rows whose key is new and keeps the matched row's id on
    updates.  None inherits, a name declares ('' clears); declaring
    on an append to existing data is refused (NULL-id rows).
    ``group`` marks this commit as a member of a multi-table
    transaction group (use :func:`commit_group`, which supplies it):
    the published manifest stays INVISIBLE to every reader until the
    group's coordinator record decides committed.
    ``read_version`` declares the snapshot this write derives from
    (same contract as merge_upsert's): a declared OVERWRITE refuses
    (ConcurrentModification) when ANY commit landed after it —
    publishing would silently discard that write — while a declared
    APPEND, which reads nothing, refuses only table REPLACES and
    serializes freely past appends / keyed writes / maintenance.
    Returns the committed version number.  Raises TxnConflict if a
    concurrent writer committed the same version first (retry against
    the new parent, Delta-style)."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    version = 0 if parent is None else parent + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    if read_version is not None:
        if group is not None:
            # a group member's manifest publishes at PREPARE but
            # becomes visible only at the group's atomic DECIDE flip,
            # so there is no single conflict point the declared
            # snapshot could be checked against (commits can land
            # between the member's prepare and the coordinator's
            # decision and would evade the check).  Refuse loudly
            # rather than offer a check that silently under-covers;
            # run keyed conflict-checked writes as per-table commits
            raise ValueError(
                "read_version inside a transaction group is not "
                "supported: a group member's visibility flips at the "
                "coordinator decision, after the conflict window this "
                "check could cover — commit conflict-checked writes "
                "outside the group")
        # declared-snapshot writer: run the full-table conflict rule
        # (overwrite conflicts with everything after read_version;
        # append only with replaces) BEFORE any work
        if parent is None:
            raise ValueError(
                f"read_version {read_version} on an empty table")
        _check_commit_conflict(path, read_version, parent, mode)
    pman = _read_manifest(path, parent) if parent is not None else {}
    # partition_by is a TABLE PROPERTY like bloom_cols: declared once
    # at table creation, every later commit (append OR overwrite)
    # partitions the same way without being asked — Delta keeps table
    # partitioning across INSERT OVERWRITE for the same reason.  Pass
    # an explicit list to (re)declare, None to inherit, [] to clear.
    if partition_by is None:
        partition_by = pman.get("partition_by", []) or None
    # constraints are a TABLE PROPERTY like partition_by: None
    # inherits, an explicit dict replaces ({} clears)
    pcons = pman.get("constraints", {}) if parent is not None else {}
    cons = dict(pcons) if constraints is None else dict(constraints)
    # generated columns are a TABLE PROPERTY exactly like constraints
    pgen = pman.get("generated", {}) if parent is not None else {}
    gen = dict(pgen) if generated is None else dict(generated)
    provided_gen_cols = set(gen) & set(df.columns)
    if gen:
        df = _compute_generated(df, gen)
    ident = _resolve_identity(pman, parent, identity, mode, path)
    if ident:
        # assignment happens BEFORE the data write so the ids are in
        # the files like any other column; the hwm advances by the
        # batch's row count and publishes atomically with the commit
        df, ident["hwm"] = _assign_identity(
            df, ident["col"], ident["hwm"])
    data_dir = _claim_data_dir(path, version)
    name = os.path.basename(data_dir)
    # bloom_cols is a TABLE PROPERTY, not per-version data state: it
    # survives overwrites like Delta's bloom index config — otherwise
    # one routine full-refresh silently stops indexing and the
    # point-lookup index is missing exactly when needed.  Resolved
    # BEFORE the write so the write job can compute the sidecar
    # bitmaps on its own pass (_observed_write).
    bcols = sorted(set(bloom_cols or []))
    if parent is not None:
        bcols = sorted(set(bcols) | set(pman.get("bloom_cols", [])))
    # the data write is invisible until the manifest rename lands.
    # Stats come from the WRITE JOB'S OWN ROWS (observe), never a
    # re-aggregation of df's lineage: a nondeterministic lineage
    # (rand/sample/range-sample) could evaluate differently a second
    # time and record an envelope that excludes rows actually in the
    # dir — pruning would then silently drop them.  observe keeps
    # that guarantee at one job instead of write + read-back(s)
    # (_observed_write docstring; byte-equality pinned by
    # tests/test_r13_opt_equivalence.py).
    bloom_pre: dict = {}
    obs_cons: dict = {}
    obs_gchecks: dict = {}
    obs_viol: dict = {}
    if partition_by:
        dirs, stats, rows, bloom_pre = _write_partitioned(
            df.sparkSession, path, data_dir, df, partition_by,
            stats_cols or [], bloom_cols=bcols)
    else:
        # CHECK constraints (and provided-generated-column checks)
        # that resolve against the written frame ride the write job
        # too — the read-back validation job below only runs for
        # expressions referencing columns this write lacks (schema
        # evolution) and for carried-dir ADD validation
        if cons:
            obs_cons = _checks_resolvable(df, cons)
        gprov = {c: sql for c, sql in gen.items()
                 if c in provided_gen_cols}
        if gprov:
            obs_gchecks = _checks_resolvable(
                df, _generated_checks(gprov))
        stats, rows, bodies, obs_viol = _observed_write(
            df.sparkSession, path, data_dir, df, stats_cols or [],
            bcols, checks={**obs_cons, **obs_gchecks})
        dirs = [name]
        if bodies:
            bloom_pre = {name: bodies}
    new_dirs = list(dirs)
    analyze: dict = {}
    if analyze_cols:
        analyze = _analyze_per_dir(
            df.sparkSession, path, new_dirs,
            sorted(set(analyze_cols)))
    # the table schema rides in the manifest (Delta-style): snapshot
    # reads apply it explicitly, so columns added by later commits
    # null-backfill over old dirs instead of being silently dropped
    # by the first-dir-schema default of a multi-path parquet read
    # (schema from a LEAF dir when partitioned — the shadow partition
    # names are layout, not table columns)
    written = _schema_json(df.sparkSession.read.parquet(
        os.path.join(path, dirs[0])))
    schema = written
    dv: list[dict] = []
    if mode == "append" and parent is not None:
        dirs = pman["dirs"] + dirs
        stats = {**pman.get("stats", {}), **stats}
        rows = {**pman.get("rows", {}), **rows}
        analyze = {**pman.get("analyze", {}), **analyze}
        schema = _merge_schema_json(pman.get("schema"), written)
        # old dirs stay in the manifest, so their tombstones must too
        dv = pman.get("dv", [])
    elif mode not in ("overwrite", "append"):
        raise ValueError(f"unknown commit mode {mode!r}")
    # validate BEFORE publishing: the incoming dirs against the full
    # constraint set, plus the carried dirs against any NEWLY added
    # constraints (ADD CONSTRAINT scans existing data).  A violation
    # leaves the claimed dir orphaned (vacuumed) and the table
    # unchanged.
    if cons:
        bad = {k: obs_viol[k] for k in sorted(cons)
               if obs_viol.get(k)}
        if bad:
            raise ConstraintViolation(path, bad)
        pending = {k: sql for k, sql in cons.items()
                   if k not in obs_cons}
        if pending:
            _validate_constraints(df.sparkSession, path, new_dirs,
                                  pending)
        added = {k: sql for k, sql in cons.items()
                 if pcons.get(k) != sql}
        carried = [d for d in dirs if d not in new_dirs]
        if added and carried:
            _validate_constraints(df.sparkSession, path, carried,
                                  added, man=pman)
    if gen:
        # explicit writes must EQUAL the generation expression —
        # validated from the written files through the same one-job
        # machinery as CHECK constraints, but ONLY for columns the
        # WRITER PROVIDED: engine-computed columns match their
        # (deterministic) expression by construction, and re-scanning
        # every new dir to prove it would tax the hot commit path for
        # nothing.  A newly declared column also validates the
        # carried dirs under the merged schema (rows lacking it read
        # NULL and refuse unless expr is NULL), with the carried
        # tombstones applied — invisible DV'd rows must not fail a
        # new declaration (same rule as ADD CONSTRAINT above).
        gprovided = {c: sql for c, sql in gen.items()
                     if c in provided_gen_cols}
        if gprovided:
            gchecks = _generated_checks(gprovided)
            gbad = {k: obs_viol[k] for k in sorted(gchecks)
                    if obs_viol.get(k)}
            if gbad:
                raise ConstraintViolation(path, gbad)
            gpending = {k: sql for k, sql in gchecks.items()
                        if k not in obs_gchecks}
            if gpending:
                _validate_constraints(df.sparkSession, path, new_dirs,
                                      gpending,
                                      man={"schema": schema})
        gadded = {c: sql for c, sql in gen.items()
                  if pgen.get(c) != sql}
        gcarried = [d for d in dirs if d not in new_dirs]
        if gadded and gcarried:
            _validate_constraints(df.sparkSession, path, gcarried,
                                  _generated_checks(gadded),
                                  man={"schema": schema, "dv": dv})
    v = _commit_manifest(path, version, mode, dirs, meta, stats,
                         rows, bcols, schema,
                         partition_by=list(partition_by or []), dv=dv,
                         constraints=cons, identity=ident,
                         group=group, analyze=analyze, generated=gen,
                         op={"type": mode})
    _maintain_bloom(df.sparkSession, path, v, bcols, new_dirs,
                    precomputed=bloom_pre)
    return v


def commit_group(writes: list[tuple[DataFrame, str]],
                 mode: str = "append",
                 meta: dict | None = None,
                 grace_seconds: float | None = None) -> dict[str, int]:
    """Multi-table TRANSACTION: commit one DataFrame per table such
    that readers see ALL the tables' new versions or NONE — the
    reference's sp-wrapped multi-statement batch (e.g. fact + run-log
    updated in one Synapse transaction,
    sql/batchELT/core/12_trip_clean.dedupe_load.sql +
    30_runs_log insert) on a parquet lake.

    Two-phase over the existing LogStore primitive, no new storage
    assumptions:

    1. PREPARE — each table's data is written and its manifest
       published at the next version via the normal per-table
       test-and-set, carrying a ``group`` marker; marked manifests
       are INVISIBLE to every reader (latest_version skips them,
       MVCC's uncommitted-row rule).
    2. DECIDE — one coordinator record (under the FIRST table's
       ``_txn/groups/``) is published, again via LogStore
       test-and-set, flipping every member visible ATOMICALLY: the
       group has exactly one decision whoever races it.

    Any member losing its per-table commit race — or any validation
    failure (ConstraintViolation, schema conflict) — aborts the whole
    group: the coordinator record is raced to ``aborted`` and the
    already-published member manifests are cleared (no reader ever
    saw them; version numbers are reclaimed, data dirs left to
    vacuum).  A crashed coordinator leaves members pending: readers
    skip them, and the next writer on any member table settles the
    group (abort) after the group's grace window —
    GROUP_SETTLE_GRACE_SECONDS by default, or ``grace_seconds`` when
    the writer declares a longer one (member data writes that take
    minutes at scale must not be aborted by design; the declared
    grace rides in every member manifest so all settlers honor it).

    After a COMMIT decision the record is MIRRORED into every member
    table's own ``_txn/groups/<gid>.decided.json``: read visibility
    of committed history never depends on a foreign table's files
    (first member deleted/relocated ⇒ without the mirror, the other
    members' committed versions would read as pending and eventually
    be settle-aborted — silent loss of durably committed history).

    KEYED WRITES AS MEMBERS (r11): an element of ``writes`` may be
    an OPERATION DESCRIPTOR dict instead of a plain ``(df, path)``
    pair —

    - ``{"op": "merge", "df": updates, "path": p, "key_cols": [...]}``
      → :func:`merge_upsert` as a group member;
    - ``{"op": "merge_apply", "df": changes, "path": p,
      "key_cols": [...], "delete_col": c}`` → full I/U/D merge;
    - ``{"op": "delete", "keys": kdf, "path": p, "key_cols": [...]}``
      → :func:`delete_keys` (deletion-vector commit);
    - ``{"op": "append"|"overwrite", "df": df, "path": p}`` → plain
      commit with that mode (overriding the call-level ``mode``).

    The atomicity story is unchanged because every one of these ends
    in the same ``_commit_manifest`` publish carrying the group
    marker: a keyed member's new version (and its DV store / claimed
    dirs) is INVISIBLE until the coordinator decides, an abort
    removes the member manifests (reclaiming version numbers; the
    orphaned dirs and stores are vacuum fodder), and the reference's
    sp-wrapped "MERGE fact + INSERT run-log in one transaction"
    (sql/streaming/staging/usp_upsert_fact_trip_streaming.sql +
    0006_LogSuccess.sql) maps one-to-one.  ``read_version`` is not
    accepted inside a group (no single conflict point across the
    visibility flip — the same refusal commit() makes).

    Scale: the transaction adds two tiny JSON publishes plus one
    mirror write per member beyond the members' own commits —
    nothing per row, no cross-table lock, no ordering constraint
    between the data writes (they could run in parallel; members are
    published sequentially only to keep the failure unwind simple).
    Returns {table_path: version}."""
    import uuid

    if not writes:
        return {}

    def _w_path(w) -> str:
        return w["path"] if isinstance(w, dict) else w[1]

    paths = [os.path.abspath(_w_path(w)) for w in writes]
    if len(set(paths)) != len(paths):
        raise ValueError(
            "commit_group: each table may appear once (batch its "
            "rows into one DataFrame per table)")
    gid = uuid.uuid4().hex[:16]
    g = {"id": gid,
         "coord": os.path.abspath(
             os.path.join(_txn_dir(paths[0]), "groups",
                          f"{gid}.json")),
         # every member manifest knows ALL member paths, so a reader
         # or settler can probe every decision mirror: one surviving
         # marker anywhere resurrects a commit whose coordinator
         # file (or table) was lost before the mirror loop finished
         "members": list(paths)}
    if grace_seconds is not None:
        gs = float(grace_seconds)
        if not (0.0 < gs <= GROUP_GRACE_MAX_SECONDS):
            raise ValueError(
                f"grace_seconds must be in (0, "
                f"{GROUP_GRACE_MAX_SECONDS}] — an unbounded grace "
                "would let a crashed writer wedge every member "
                "table forever")
        g["grace"] = gs

    def _marker(p: str) -> str:
        return os.path.join(_txn_dir(p), "groups",
                            f"{gid}.decided.json")

    done: dict[str, int] = {}

    def _unwind() -> None:
        if not _decide_group(g, committed=False):
            for p, v in done.items():
                try:
                    os.remove(_manifest_path(p, v))
                except FileNotFoundError:
                    pass

    try:
        for w in writes:
            path = _w_path(w)
            gm = {**g, "marker": _marker(path)}
            if isinstance(w, dict):
                op = w.get("op", "append")
                if op == "merge":
                    v = merge_upsert(
                        w["df"].sparkSession, path, w["df"],
                        list(w["key_cols"]), group=gm)
                elif op == "merge_apply":
                    v = merge_apply(
                        w["df"].sparkSession, path, w["df"],
                        list(w["key_cols"]), w["delete_col"],
                        group=gm)
                elif op == "delete":
                    v = delete_keys(
                        w["keys"].sparkSession, path, w["keys"],
                        list(w["key_cols"]), group=gm)
                elif op in ("append", "overwrite"):
                    v = commit(w["df"], path, op, meta=meta,
                               group=gm)
                else:
                    raise ValueError(
                        f"commit_group: unknown member op {op!r}")
            else:
                df, _ = w
                v = commit(df, path, mode, meta=meta, group=gm)
            done[os.path.abspath(path)] = v
    except BaseException:
        _unwind()
        raise
    if not _decide_group(g, committed=True):
        # a settler raced us past the grace window and won the abort
        _unwind()
        raise TxnConflict(
            "transaction group aborted by a concurrent writer "
            "before its coordinator record landed")
    for p in done:
        # best-effort durable mirror (the coord record is already
        # the decision; a member whose mirror write fails merely
        # keeps depending on the coord file)
        try:
            mk = _marker(p)
            os.makedirs(os.path.dirname(mk), exist_ok=True)
            tmp = f"{mk}.tmp-{os.getpid()}-{next(_TMP_SEQ)}"
            with open(tmp, "w") as fh:
                json.dump({"id": gid, "committed": True,
                           "members": list(paths)}, fh)
            os.replace(tmp, mk)
        except OSError:
            pass
    return done


def _write_partitioned(spark: SparkSession, path: str, data_dir: str,
                       df: DataFrame, pby: list[str],
                       stat_cols: list[str],
                       layout_cols: list[str] | None = None,
                       bloom_cols: tuple | list = ()
                       ) -> tuple[list[str], dict, dict, dict]:
    """THE place the dir-per-value invariant is written (shared by
    commit / MERGE / compact / optimize_zorder): duplicate the
    partition columns under layout-only shadow names (partitionBy
    MOVES its columns out of the files and into dir names, but
    snapshot() reads leaf dirs individually with no basePath, so the
    real columns must stay in the data), write one leaf dir per
    value, restate per-leaf stats over stat_cols ∪ pby with the
    shared input_file_name-tagged job, and fall back to a plain
    schema-carrying dir for an empty frame so the manifest stays
    readable.  ``layout_cols`` are ADDITIONAL existing layout-only
    columns folded into the dir tree after the shadows (zorder's
    __zb bucket id).  Returns (dirs, stats, rows)."""
    shadow = [f"__p_{c}" for c in pby]
    out = df
    for c, s in zip(pby, shadow):
        out = out.withColumn(s, F.col(c))
    out.write.mode("overwrite") \
        .partitionBy(*shadow, *(layout_cols or [])).parquet(data_dir)
    dirs, stats, rows, blooms = _partition_dir_stats(
        spark, path, data_dir, sorted(set(stat_cols) | set(pby)),
        bloom_cols)
    if not dirs:
        # empty frame: a partitioned write leaves no leaf dirs (just
        # _SUCCESS) — rewrite plain so the dir carries the schema
        df.drop(*(layout_cols or [])).limit(0) \
            .write.mode("overwrite").parquet(data_dir)
        dirs = [os.path.basename(data_dir)]
        stats, rows, blooms = {}, {}, {}
    return dirs, stats, rows, blooms


def _partition_dir_stats(spark: SparkSession, path: str,
                         data_dir: str, stat_cols: list[str],
                         bloom_cols: tuple | list = ()
                         ) -> tuple[list[str], dict, dict, dict]:
    """Per-leaf-partition-dir manifest entries for a partitioned
    commit: ONE job over the written tree (rows tagged with their
    owning dir via input_file_name — never a job per partition),
    yielding dir names relative to the table root plus each dir's
    [min, max] stats and row count.  Stats aggregate the REAL data
    columns (the shadow partition columns are layout only).

    ``bloom_cols``: the declared bloom columns' bitmap aggregates
    (bloomindex.bitmap_agg_sql) ride the SAME groupBy job — the
    previous shape paid one read-back build job PER LEAF DIR per
    column on top of this job (31 extra jobs in the partitioned-
    by-date scenario; guide §2.4: operations keyed the same way
    share one pass).  Returns (dirs, stats, rows, sidecar_bodies)
    with sidecar_bodies = {rel_dir: {col: body}}, dtypes taken from
    the written tree's read-back schema exactly like the legacy
    per-dir build."""
    from . import bloomindex  # function-scoped: bloomindex imports us

    if not any(f.endswith(".parquet")
               for _, _, files in os.walk(data_dir) for f in files):
        return [], {}, {}, {}  # empty frame wrote no leaves
    scan = spark.read.parquet(data_dir)
    tagged = scan.withColumn("__dir", _dir_col())
    dtypes = dict(scan.dtypes)
    aggs = [F.count("*").alias("__n")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"__lo_{c}"),
                 F.max(c).alias(f"__hi_{c}")]
    bcols_present = [c for c in bloom_cols if c in dtypes]
    for c in bcols_present:
        for i, sql in enumerate(bloomindex.bitmap_agg_sql(c)):
            aggs.append(F.expr(sql).alias(f"__bm_{c}_{i}"))
    base = os.path.abspath(path)
    dirs, stats, rows = [], {}, {}
    blooms: dict = {}
    for r in tagged.groupBy("__dir").agg(*aggs).collect():
        # input_file_name is a URI: percent-decode before relpath
        # (unquote, not unquote_plus — a literal '+' must survive)
        rel = os.path.relpath(
            urllib.parse.unquote(r["__dir"]), base)
        dirs.append(rel)
        stats[rel] = {c: [_json_safe(r[f"__lo_{c}"]),
                          _json_safe(r[f"__hi_{c}"])]
                      for c in stat_cols}
        rows[rel] = int(r["__n"])
        bodies = {}
        for c in bcols_present:
            bits = bloomindex.merge_bitmap_parts(
                [r[f"__bm_{c}_{i}"]
                 for i in range(bloomindex.BLOOM_K)])
            bodies[c] = bloomindex.sidecar_body(c, dtypes[c], bits)
        for c in bloom_cols:
            if c not in dtypes:
                bodies[c] = bloomindex.sidecar_body(
                    c, "absent", bloomindex.merge_bitmap_parts([]))
        if bodies:
            blooms[rel] = bodies
    dirs.sort()
    return dirs, stats, rows, blooms


def _maintain_bloom(spark: SparkSession, path: str, version: int,
                    bloom_cols: list[str],
                    new_dirs: list[str],
                    precomputed: dict | None = None) -> None:
    """Publish the declared Bloom sidecars for a commit's NEW dirs —
    called by the publish WINNER after its manifest lands.  Dirs
    whose bitmaps were already computed inside the write job
    (``precomputed`` = {dir: {col: body}} from _observed_write /
    _partition_dir_stats) publish as plain file writes with NO Spark
    job; anything not covered (non-round-trip-exact dtype, the
    empty-partitioned-frame fallback dir) takes the legacy one-agg-
    job-per-dir build.  Old dirs' sidecars are write-once and never
    rescanned.  Running after publish keeps the commit's atomicity
    untouched: a crash here leaves the dir unindexed, which pruning
    treats conservatively (full scan), never incorrectly."""
    if not bloom_cols:
        return
    from . import bloomindex  # function-scoped: bloomindex imports us

    for c in bloom_cols:
        rest = []
        for d in new_dirs:
            body = (precomputed or {}).get(d, {}).get(c)
            if body is None:
                rest.append(d)
            else:
                bloomindex.write_sidecar(path, d, c, body)
        if rest:
            bloomindex.build_bloom_index(
                spark, path, c, version=version, only_dirs=rest)


def _claim_data_dir(path: str, version: int) -> str:
    """Claim a writer-unique data dir via atomic mkdir so a racing
    writer targeting the same version can NEVER touch files another
    manifest references (immutability is what makes losing safe)."""
    os.makedirs(path, exist_ok=True)
    attempt = 0
    while True:
        data_dir = os.path.join(path, f"data-v{version:08d}-{attempt:04d}")
        try:
            os.mkdir(data_dir)
            return data_dir
        except FileExistsError:
            attempt += 1


def _publish_manifest(final: str, tmp: str) -> None:
    """The commit primitive: make ``tmp`` visible at ``final`` IF AND
    ONLY IF ``final`` does not already exist — a true test-and-set, so
    exactly one of two racing writers can ever succeed.

    Dispatches to the active ``LogStore``: POSIX ``os.link`` by default
    (atomic-exclusive on any POSIX filesystem); on S3/ABFS/GCS, where
    rename/link are neither atomic nor exclusive, ``set_log_store`` a
    conditional-put implementation (S3 ``If-None-Match: *``, ABFS ETag
    precondition, GCS ``x-goog-if-generation-match: 0``) or an external
    log store (Delta's DynamoDB/az-blob LogStore) with the same
    create-if-absent-or-raise semantics —
    ``InMemoryConditionalPutLogStore`` is the executable double of that
    contract.  Everything above this function is store-agnostic."""
    _LOG_STORE.publish(final, tmp)


_TMP_SEQ = itertools.count()


def _validate_constraints(spark: SparkSession, path: str,
                          dir_names: list[str],
                          constraints: dict[str, str],
                          man: dict | None = None) -> None:
    """Refuse-on-violation gate for a set of dirs against the table's
    declared CHECK constraints: ONE agg job sums violating rows per
    constraint (SQL CHECK semantics — a NULL predicate PASSES, only
    a literal false violates), raising ConstraintViolation with the
    per-constraint counts.  Validation cost is one narrow scan of
    exactly the dirs being introduced — never the carried table."""
    if not constraints or not dir_names:
        return
    df = (_read_dirs(spark, path, dir_names, man)
          if man is not None else
          spark.read.parquet(
              *[os.path.join(path, d) for d in dir_names]))
    if man is not None and man.get("dv"):
        # rows an earlier DELETE tombstoned are invisible to readers
        # and must not fail a newly-added constraint
        df = _apply_dv(spark, path, df, man["dv"])
    aggs = [
        F.sum(F.when(~F.coalesce(F.expr(sql), F.lit(True)), 1)
              .otherwise(0)).alias(name)
        for name, sql in sorted(constraints.items())]
    row = df.agg(*aggs).collect()[0]
    bad = {name: int(row[name]) for name in constraints
           if row[name]}
    if bad:
        raise ConstraintViolation(path, bad)


def _dir_file_stats(path: str, names: list[str]) -> dict:
    """Walk ONLY the named data dirs and return
    ``{name: [n_files, n_bytes]}`` over data files (dot/underscore
    bookkeeping skipped, same filter the stream source's planner
    uses).  This is the O(new files) commit-time half of
    metadata-served DESCRIBE DETAIL: the commit walks exactly the
    dirs it just wrote — the files it already knows — and the totals
    ride in the manifest forever (Delta records AddFile.size the
    same way), so describing a 100 TB table later costs zero stat
    calls instead of one per live file."""
    base = os.path.abspath(path)
    out: dict = {}
    for d in names:
        full = d if os.path.isabs(d) else os.path.join(base, d)
        n = b = 0
        for root, _, files in os.walk(full):
            for f in files:
                if f.startswith((".", "_")):
                    continue
                n += 1
                b += os.path.getsize(os.path.join(root, f))
        out[d] = [n, b]
    return out


def _commit_manifest(path: str, version: int, mode: str,
                     dirs: list[str], meta: dict | None,
                     stats: dict | None = None,
                     rows: dict | None = None,
                     bloom_cols: list[str] | None = None,
                     schema: str | None = None,
                     partition_by: list[str] | None = None,
                     dv: list[dict] | None = None,
                     constraints: dict[str, str] | None = None,
                     identity: dict | None = None,
                     group: dict | None = None,
                     analyze: dict | None = None,
                     generated: dict[str, str] | None = None,
                     op: dict | None = None,
                     files: dict | None = None) -> int:
    import time

    os.makedirs(_txn_dir(path), exist_ok=True)
    # per-dir {dir: [n_files, n_bytes]} bookkeeping: ``files`` is a
    # CARRY MAP of already-known entries (restore/clone pass the
    # source manifest's); when None it seeds from the parent manifest
    # so every ordinary commit/merge/maintenance carries untouched
    # dirs for free.  Dirs still missing after the carry — exactly
    # the NEW dirs this commit wrote (or a pre-files-era table's
    # whole dir set, the one-time migration) — are walked here,
    # O(their files), before the manifest publishes.
    carry = dict(files or {})
    if files is None and version > 0:
        try:
            carry = _read_manifest(path, version - 1).get("files", {})
        except (FileNotFoundError, TornManifest):
            carry = {}
    fmap = {d: carry[d] for d in dirs if d in carry}
    missing = [d for d in dirs if d not in fmap]
    if missing:
        fmap.update(_dir_file_stats(path, missing))
    # tmp name is unique PER ATTEMPT (pid + sequence), not just per
    # process: two threads of one driver racing to commit the same
    # version must not share a tmp file, or the loser's cleanup races
    # the winner's and a successful commit can crash post-publish
    tmp = (_manifest_path(path, version)
           + f".tmp-{os.getpid()}-{next(_TMP_SEQ)}")
    with open(tmp, "w") as fh:
        body = {"version": version, "mode": mode, "dirs": dirs,
                # commit wall time for AS OF TIMESTAMP resolution
                # (version_at_timestamp); pre-r10 manifests fall back
                # to the manifest file's mtime, Delta-style
                "committed_at": time.time(),
                "meta": meta or {}, "stats": stats or {},
                "rows": rows or {},
                "files": fmap,
                "bloom_cols": bloom_cols or [],
                "partition_by": partition_by or [],
                "dv": dv or [],
                "constraints": constraints or {}}
        if identity:
            body["identity"] = identity
        if analyze:
            body["analyze"] = analyze
        if generated:
            body["generated"] = generated
        if op:
            # operation descriptor for the WriteSerializable conflict
            # matrix (_check_write_conflict): type + the keyed ops'
            # key-set fingerprint
            body["op"] = op
        if group:
            body["group"] = {"id": group["id"],
                             "coord": os.path.abspath(group["coord"])}
            if group.get("marker"):
                body["group"]["marker"] = os.path.abspath(
                    group["marker"])
            if group.get("grace") is not None:
                body["group"]["grace"] = float(group["grace"])
            if group.get("members"):
                body["group"]["members"] = [
                    os.path.abspath(p) for p in group["members"]]
        if schema is not None:
            body["schema"] = schema
        # content checksum LAST, over everything above: read-side
        # recompute turns a torn-but-parseable manifest into a loud
        # TornManifest instead of a silently-wrong version
        body["checksum"] = _manifest_checksum(body)
        json.dump(body, fh)
    final = _manifest_path(path, version)
    try:
        # atomic-exclusive commit point (see _publish_manifest)
        _publish_manifest(final, tmp)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    _write_head_hint(path, version)  # only the publish WINNER advances
    if version and version % TS_INDEX_INTERVAL == 0:
        _maybe_write_ts_index(path, version)
    return version


OP_KEYS_CAP = 4096


def _key_set_descriptor(keys: DataFrame, key_cols: list[str]) -> dict:
    """Fingerprint of a keyed write's DISTINCT key set, recorded in
    the manifest's ``op`` entry so a LATER writer that declared its
    read snapshot can test key overlap against this commit from
    metadata alone (:func:`_check_write_conflict`) — Delta records
    per-file stats for the same adjudication; at dir-grain manifests
    the key set itself is the sharper instrument.

    Single-col keys record raw values (≤ OP_KEYS_CAP, ``_json_safe``
    normalized so stored and live sides compare in one domain) plus a
    [lo, hi] envelope; above the cap only the envelope survives
    (bulk × bulk degrades to range overlap — conservative, never
    silently wrong).  Multi-col keys record xxhash64 row hashes
    (a collision manufactures a FALSE CONFLICT, never a missed one);
    above the cap nothing is recorded and later overlap tests refuse
    conservatively.  Cost: one early-stop limit probe + at most one
    agg over the keys."""
    kdf = keys.select(*key_cols).distinct()
    if len(key_cols) > 1:
        probe = kdf.select(
            F.xxhash64(*[F.col(c) for c in key_cols]).alias("__h"))
        sample = probe.limit(OP_KEYS_CAP + 1).collect()
        if len(sample) > OP_KEYS_CAP:
            return {"kind": "hash", "hashes": None}
        return {"kind": "hash",
                "hashes": sorted(int(r[0]) for r in sample)}
    sample = kdf.limit(OP_KEYS_CAP + 1).collect()
    if len(sample) <= OP_KEYS_CAP:
        vals = [_json_safe(r[0]) for r in sample]
        nn = [v for v in vals if v is not None]
        return {"kind": "raw", "vals": vals,
                "lo": min(nn) if nn else None,
                "hi": max(nn) if nn else None}
    k = key_cols[0]
    row = kdf.agg(F.min(k).alias("lo"), F.max(k).alias("hi")) \
        .collect()[0]
    return {"kind": "raw", "vals": None,
            "lo": _json_safe(row["lo"]), "hi": _json_safe(row["hi"])}


def _keysets_overlap(a: dict, b: dict) -> bool:
    """True unless descriptors ``a`` and ``b`` PROVABLY share no key;
    anything unknown or incomparable answers True (the refuse side —
    a false conflict costs a recompute, a missed one loses a write)."""
    if not a or not b or a.get("kind") != b.get("kind"):
        return True
    if a["kind"] == "hash":
        if a.get("hashes") is None or b.get("hashes") is None:
            return True
        return bool(set(a["hashes"]) & set(b["hashes"]))
    av, bv = a.get("vals"), b.get("vals")
    if av is not None and bv is not None:
        return bool(set(av) & set(bv))
    # at least one side is bulk (envelope only).  Envelopes ignore
    # NULL keys, so a NULL anywhere is undecidable against a bulk
    # side; an unknown envelope (all-NULL set) likewise.
    for d in (a, b):
        if d.get("lo") is None or d.get("hi") is None:
            return True
    if av is not None and any(v is None for v in av):
        return True
    if bv is not None and any(v is None for v in bv):
        return True
    try:
        if av is not None:
            return any(b["lo"] <= v <= b["hi"] for v in av)
        if bv is not None:
            return any(a["lo"] <= v <= a["hi"] for v in bv)
        return not (a["hi"] < b["lo"] or b["hi"] < a["lo"])
    except TypeError:
        return True


def _check_write_conflict(path: str, read_version: int, parent: int,
                          key_cols: list[str], desc: dict,
                          op_name: str) -> None:
    """WriteSerializable conflict matrix (Delta's production
    contract; the reference gets the equivalent from its sp-wrapped
    MERGE's implicit table lock — sql/streaming/staging/
    usp_upsert_trip_clean_from_slice_streaming.sql) for a keyed
    read-modify-write that declared the snapshot its updates derive
    from.  Every version committed in (``read_version``, ``parent``]
    must be provably compatible:

      - ``append`` / ``maintenance`` (compact, zorder): compatible —
        blind inserts serialize before this write, physical rewrites
        change no logical row; the recompute sees their rows either
        way.
      - ``merge`` / ``delete`` on the SAME key_cols with a PROVABLY
        DISJOINT key set: compatible (concurrent disjoint-key MERGEs
        both land).
      - overlapping or undecidable keys, different key_cols,
        ``replace`` (overwrite / restore / clone re-seed), or a
        pre-op-era manifest: ConcurrentModification — retrying would
        silently last-wins over the winner."""
    if read_version > parent:
        raise ValueError(
            f"read_version {read_version} is ahead of the table "
            f"(latest committed version is {parent})")
    for v in range(read_version + 1, parent + 1):
        try:
            man = _read_manifest(path, v)
        except FileNotFoundError as e:
            # vacuumed-away interleaved commit: its touched set is
            # undecidable, and undecidable refuses (the class
            # contract) — callers following the recompute-and-retry
            # protocol catch ConcurrentModification, never a raw
            # FileNotFoundError out of the conflict window
            raise ConcurrentModification(
                f"{op_name} on {path} derives from version "
                f"{read_version}, but version {v}'s manifest was "
                "vacuumed away — its touched key set is undecidable; "
                "recompute against the current snapshot") from e
        op = man.get("op") or {}
        typ = op.get("type") or (
            "append" if man.get("mode") == "append" else None)
        if typ in ("append", "maintenance"):
            continue
        if typ in ("merge", "delete"):
            if op.get("key_cols") == list(key_cols) \
                    and not _keysets_overlap(op.get("keys") or {},
                                             desc):
                continue
            raise ConcurrentModification(
                f"{op_name} on {path} derives from version "
                f"{read_version}, but version {v} ({typ}) touched "
                "the same (or an undecidable) key set — recompute "
                "the updates against the current snapshot")
        raise ConcurrentModification(
            f"{op_name} on {path} derives from version "
            f"{read_version}, but version {v} "
            f"({typ or 'pre-conflict-tracking commit'}) replaced "
            "table content — recompute against the current snapshot")


def _check_commit_conflict(path: str, read_version: int, parent: int,
                           mode: str) -> None:
    """Conflict rule for DECLARED-SNAPSHOT full-table writers
    (``commit(read_version=)``): an OVERWRITE derived from version R
    replaces the whole table, so ANY commit after R invalidates it —
    publishing would silently discard the interleaved write (Delta:
    overwrite conflicts with everything).  A declared-snapshot APPEND
    reads nothing, so only a table REPLACE (overwrite / restore)
    after R invalidates it; keyed writes, other appends, and
    physical maintenance serialize before it (WriteSerializable)."""
    if read_version > parent:
        raise ValueError(
            f"read_version {read_version} is ahead of the table "
            f"(latest committed version is {parent})")
    for v in range(read_version + 1, parent + 1):
        try:
            man = _read_manifest(path, v)
        except FileNotFoundError as e:
            # same rule as _check_write_conflict: a vacuumed
            # interleaved commit is undecidable → refuse through the
            # documented exception, not a raw FileNotFoundError
            raise ConcurrentModification(
                f"commit to {path} derives from version "
                f"{read_version}, but version {v}'s manifest was "
                "vacuumed away — whether it replaced table content "
                "is undecidable; recompute against the current "
                "snapshot") from e
        op = man.get("op") or {}
        typ = op.get("type") or (
            "append" if man.get("mode") == "append" else None)
        if mode == "overwrite":
            raise ConcurrentModification(
                f"overwrite of {path} derives from version "
                f"{read_version}, but version {v} "
                f"({typ or 'pre-conflict-tracking commit'}) landed "
                "after it — publishing would discard that write; "
                "recompute against the current snapshot")
        if typ in ("append", "maintenance", "merge", "delete"):
            continue
        raise ConcurrentModification(
            f"append to {path} derives from version {read_version}, "
            f"but version {v} "
            f"({typ or 'pre-conflict-tracking commit'}) replaced "
            "table content — recompute against the current snapshot")


def _check_full_read_conflict(path: str, read_version: int,
                              parent: int, op_name: str) -> None:
    """Conflict rule for FULL-TABLE-READ writers (merge_sync_delete:
    the dead-key decision read every target key, so ANY logical
    content change after ``read_version`` invalidates it — a
    concurrent insert of a key outside the source universe would
    silently survive a "full sync" otherwise).  Only physical-only
    ``maintenance`` commits are compatible (they change no logical
    row, hence no key universe); everything else — appends, keyed
    writes regardless of key disjointness, replaces, pre-op-era or
    vacuumed manifests — refuses with ConcurrentModification.
    Strictly stronger than :func:`_check_write_conflict`."""
    if read_version > parent:
        raise ValueError(
            f"read_version {read_version} is ahead of the table "
            f"(latest committed version is {parent})")
    for v in range(read_version + 1, parent + 1):
        try:
            man = _read_manifest(path, v)
        except FileNotFoundError as e:
            raise ConcurrentModification(
                f"{op_name} on {path} derives from a full-table "
                f"read at version {read_version}, but version {v}'s "
                "manifest was vacuumed away — whether it changed "
                "content is undecidable; recompute against the "
                "current snapshot") from e
        op = man.get("op") or {}
        typ = op.get("type") or (
            "append" if man.get("mode") == "append" else None)
        if typ == "maintenance":
            continue
        raise ConcurrentModification(
            f"{op_name} on {path} derives from a full-table read at "
            f"version {read_version}, but version {v} "
            f"({typ or 'pre-conflict-tracking commit'}) changed "
            "table content — the decision read every key, so any "
            "logical change invalidates it; recompute against the "
            "current snapshot")


def merge_upsert(spark: SparkSession, path: str, updates: DataFrame,
                 key_cols: list[str],
                 read_version: int | None = None,
                 group: dict | None = None) -> int:
    """Copy-on-write row-level MERGE (Delta MERGE WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT, upsert form): rewrite ONLY the data dirs
    that contain matched keys — every other committed file is carried
    into the new manifest untouched, so the write cost scales with the
    touched fraction, not the table, and time travel keeps every prior
    version intact.

    Steps: (1) probe each of the parent manifest's data dirs with a
    broadcast LEFT SEMI join on the update keys (parquet footer
    min/max stats prune unmatched row groups; at manifest-stats scale
    this probe is a metadata query); (2) rewrite the affected dirs as
    (kept rows ANTI JOIN keys) ∪ updates into one fresh claimed dir;
    (3) commit parent_dirs − affected + [new] atomically.  Raises
    TxnConflict like commit() if another writer lands first.

    ``read_version`` declares the snapshot the updates were computed
    against (Delta's txn read version).  When passed, commits that
    landed after it are checked against the WriteSerializable
    conflict matrix (:class:`ConcurrentModification`): interleaved
    appends / compactions rebase silently, a disjoint-key concurrent
    MERGE/DELETE rebases too (both land), an overlapping or
    undecidable one REFUSES instead of silently last-winning.  None
    (the default) keeps the unchecked rebase-retry behavior for
    writers that genuinely want latest-wins."""
    return _merge_impl(spark, path, updates, updates, key_cols,
                       read_version=read_version, group=group)


def merge_apply(spark: SparkSession, path: str, changes: DataFrame,
                key_cols: list[str], delete_col: str,
                read_version: int | None = None,
                group: dict | None = None) -> int:
    """Full I/U/D row-level MERGE (Delta's WHEN MATCHED DELETE branch
    added to merge_upsert's upsert form): ``changes`` rows with
    ``delete_col`` true DELETE their keys from the table, the rest
    upsert.  Same copy-on-write shape — only dirs containing touched
    keys (updated OR deleted) rewrite; a delete whose key is absent is
    a no-op; prior versions stay time-travelable.  ``read_version``:
    same WriteSerializable conflict check as merge_upsert."""
    keys_src = changes.select(*key_cols).distinct()
    # NULL delete flag means NOT a delete: bare ~col(delete_col) is
    # NULL for NULL input, silently dropping the row from upserts
    # while its key still gets removed — an accidental delete
    upserts = changes.where(
        ~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    parent = latest_version(path)
    if parent is None:
        if read_version is not None:
            raise ValueError(
                f"read_version {read_version} on an empty table")
        return commit(upserts, path, "overwrite", group=group)
    return _merge_impl(spark, path, keys_src, upserts, key_cols,
                       read_version=read_version, group=group)


def _conditional_merge_ctx(spark: SparkSession, path: str,
                           source: DataFrame, key_cols: list[str],
                           read_version: int | None, parent: int,
                           op_label: str = "merge"):
    """Shared prologue of the conditional-MERGE pair
    (merge_upsert_when / merge_delete_when): distinct source keys,
    the full-source-key-set conflict descriptor (checked here
    against the declared snapshot AND handed back so the commit-time
    re-check covers the same set — see _merge_impl's
    conflict_desc), the table schema's column list, and the matched
    target rows from a manifest-pruned candidate scan, PERSISTED
    (the qualify split, fingerprints, and rewrite all reuse them —
    without the persist each action re-runs the candidate scan).
    Caller unpersists.  Returns (man, keys, full_desc, tcols,
    matched_t) with matched_t None when no candidate dir can hold a
    match."""
    man = _read_manifest(path, parent)
    keys = source.select(*key_cols).distinct()
    full_desc = None
    if read_version is not None:
        # conservative pre-check over the FULL source key set: the
        # condition READS every matched row, so any concurrent write
        # overlapping any source key invalidates the decision even
        # when that key ends up not qualifying
        full_desc = _key_set_descriptor(keys, key_cols)
        _check_write_conflict(path, read_version, parent, key_cols,
                              full_desc, op_label)
    tcols = None
    if man.get("schema"):
        from pyspark.sql.types import StructType
        tcols = StructType.fromJson(
            json.loads(man["schema"])).fieldNames()
    cand = _probe_candidate_dirs(spark, path, man, keys, key_cols,
                                 parent)
    matched_t = None
    if cand:
        cur = _read_dirs(spark, path, cand, man)
        if man.get("dv"):
            cur = _apply_dv(spark, path, cur, man["dv"])
        matched_t = cur.join(F.broadcast(keys), key_cols,
                             "left_semi").persist()
    return man, keys, full_desc, tcols, matched_t


def _pair_split(source: DataFrame, matched_t: DataFrame,
                key_cols: list[str], match_cond: str | None):
    """(qualifying, non-qualifying) (source, target) row pairs under
    ``match_cond`` with ``s.``/``t.`` scope — SQL WHEN MATCHED
    semantics: only literal TRUE qualifies, NULL means the clause
    does not fire (the row stays on the non-qualifying side)."""
    from functools import reduce
    from operator import and_

    on = reduce(and_, [F.col(f"s.{k}") == F.col(f"t.{k}")
                       for k in key_cols])
    pairs = source.alias("s").join(matched_t.alias("t"), on, "inner")
    cond = (F.expr(match_cond) if match_cond is not None
            else F.lit(True))
    return (pairs.where(cond),
            pairs.where(~F.coalesce(cond, F.lit(False))))


def merge_upsert_when(spark: SparkSession, path: str,
                      updates: DataFrame, key_cols: list[str],
                      match_cond: str | None = None,
                      set_exprs: dict[str, str] | None = None,
                      read_version: int | None = None,
                      group: dict | None = None) -> int:
    """Conditional MERGE — Delta's ``WHEN MATCHED [AND <cond>] THEN
    UPDATE SET <assignments> / WHEN NOT MATCHED THEN INSERT ALL``
    added to :func:`merge_upsert`'s unconditional form.

    ``match_cond`` is a SQL boolean evaluated per MATCHED
    (source, target) row pair — reference source columns as
    ``s.<col>`` and the table's current row as ``t.<col>`` (e.g.
    ``"s.updated_at > t.updated_at"``, the late-arriving-change
    guard).  A matched pair where the condition is not literal TRUE
    (false OR NULL, SQL semantics) leaves the target row UNTOUCHED —
    its dir is not even rewritten unless another key forces it.
    ``set_exprs`` maps assigned columns to SQL expressions over the
    same ``s.``/``t.`` scope (``{"fare_amount": "s.fare_amount",
    "note": "concat(t.note, ' restated')"}``); None updates ALL
    columns from the source (merge_upsert's semantics), a subset
    leaves unassigned target columns at their current values.
    Assigning a key / identity / GENERATED column refuses (the row's
    identity must survive the update; generated columns are always
    recomputed from their declared expression).  Unmatched source
    rows INSERT whole regardless of the condition.

    Delta refuses a MERGE whose source matches one target row twice
    (nondeterministic update); this does too, with the same
    key-uniqueness probe.  It also refuses assigning a column the
    table schema does not declare (Delta's rule — a typo'd SET name
    must not silently evolve the schema while the real column goes
    stale).  Duplicate target rows under one key each evaluate the
    condition independently: qualifying rows update, their
    non-qualifying siblings are carried byte-stable through the
    rewrite.

    Everything downstream of the pair evaluation — candidate-dir
    pruning, copy-on-write rewrite, schema evolution, constraint /
    generated validation, identity preservation, conflict
    descriptors — is :func:`merge_upsert`'s machinery
    (:func:`_merge_impl`); with ``read_version`` the conflict check
    covers the FULL source key set (a concurrent write to a
    matched-but-unqualified key invalidated the condition's inputs,
    so it must refuse, not silently win) — the full-set descriptor
    is checked both here AND threaded into _merge_impl's commit-time
    re-check, so a writer landing between the two is caught; the
    manifest op record still describes the WRITTEN keys (what later
    writers must adjudicate against).

    Scale shape: one manifest-pruned scan of the candidate dirs for
    the pair join (broadcast source keys, matched rows persisted —
    the qualify split, key-set fingerprint, and rewrite all reuse
    them), then the ordinary merge rewrite of only the dirs holding
    QUALIFYING keys — a mostly-non-qualifying restatement feed
    touches almost nothing.
    Reference parity: the sp-wrapped MERGE around
    sql/batchELT/core/12_trip_clean.dedupe_load.sql restates only
    rows whose incoming change is newer — exactly this guard."""
    if updates.groupBy(*key_cols).count() \
            .where(F.col("count") > 1).limit(1).count():
        raise ValueError(
            "merge_upsert_when requires a key-unique source: two "
            "source rows match the same target row, so the update "
            "is nondeterministic (Delta refuses multi-match MERGE "
            "the same way) — de-duplicate the source on "
            f"{key_cols} first")
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        if read_version is not None:
            raise ValueError(
                f"read_version {read_version} on an empty table")
        # empty table: every source row is WHEN NOT MATCHED INSERT
        return commit(updates, path, "overwrite", group=group)
    ctx = _conditional_merge_ctx(spark, path, updates, key_cols,
                                 read_version, parent)
    man, keys, full_desc, tcols, matched_t = ctx
    gen = man.get("generated", {})
    ident = man.get("identity") or {}
    if tcols is None:
        tcols = list(updates.columns)
    try:
        # SET-name resolution is CASE-INSENSITIVE like Spark's
        # default column resolution (Delta accepts `SET
        # FARE_AMOUNT = ...` against fare_amount); two SET names
        # colliding case-insensitively, an engine-owned target, or a
        # name outside the table schema all refuse — a typo'd SET
        # must never silently add a column while the real one goes
        # stale (the schema check runs against the SOURCE columns
        # when the manifest predates schema recording, so it is
        # never skipped)
        se_lookup: dict[str, str] = {}
        if set_exprs:
            for c, e in set_exprs.items():
                if c.lower() in se_lookup:
                    raise ValueError(
                        f"merge_upsert_when SET names collide "
                        f"case-insensitively on {c!r}")
                se_lookup[c.lower()] = e
            protected = {c.lower() for c in key_cols} \
                | {c.lower() for c in gen} \
                | ({ident["col"].lower()} if ident else set())
            bad = sorted(set(se_lookup) & protected)
            if bad:
                raise ValueError(
                    f"merge_upsert_when cannot assign {bad}: key, "
                    "identity, and GENERATED ALWAYS AS columns are "
                    "not assignable (the engine owns them)")
            unknown = sorted(
                set(se_lookup) - {c.lower() for c in tcols})
            if unknown:
                raise ValueError(
                    f"merge_upsert_when cannot assign {unknown}: "
                    "not columns of the table schema (a typo'd SET "
                    "name must refuse, not silently add a column — "
                    "Delta's rule; evolve the schema through the "
                    "source frame instead)")
        if matched_t is not None:
            qual, nonqual = _pair_split(updates, matched_t,
                                        key_cols, match_cond)
            if set_exprs is None:
                updated = qual.select(
                    *[F.col(f"s.{c}").alias(c)
                      for c in updates.columns])
            else:
                updated = qual.select(
                    *[F.expr(se_lookup[c.lower()]).alias(c)
                      if c.lower() in se_lookup
                      else F.col(f"t.{c}").alias(c) for c in tcols])
            qual_keys = qual.select(
                *[F.col(f"s.{k}").alias(k)
                  for k in key_cols]).distinct()
            # duplicate target rows under a qualifying key: the
            # non-qualifying siblings ride through the rewrite
            # unchanged (their dir rewrites because the key
            # qualifies elsewhere)
            carried = (nonqual
                       .select(*[F.col(f"t.{c}").alias(c)
                                 for c in tcols])
                       .join(F.broadcast(qual_keys), key_cols,
                             "left_semi"))
            if ident and carried.limit(1).count():
                # same refusal as merge_delete_when: a surviving
                # duplicate-key sibling cannot keep its own id
                # through the rewrite (one restored id per key would
                # collide with the updated row's) — refuse loudly
                # instead of silently duplicating surrogate keys
                raise ValueError(
                    f"merge_upsert_when on {path}: a qualifying key "
                    "has duplicate target rows, and the IDENTITY "
                    f"column '{ident['col']}' cannot be preserved "
                    "per-row through the rewrite — de-duplicate the "
                    "table on the merge keys first")
            mkeys = matched_t.select(*key_cols).distinct()
            inserts = updates.join(F.broadcast(mkeys), key_cols,
                                   "left_anti")
            drop = sorted((set(gen) | ({ident["col"]} if ident
                                       else set())) & set(tcols))
            if drop:
                # generated columns recompute deterministically in
                # _merge_impl; the identity column is engine-assigned
                # there too (matched keys keep their existing id)
                updated = updated.drop(*drop)
                carried = carried.drop(*drop)
            upserts = updated.unionByName(
                carried, allowMissingColumns=True).unionByName(
                inserts, allowMissingColumns=True)
            keys_src = qual_keys.unionByName(
                inserts.select(*key_cols)).distinct()
        else:
            # no candidate dir can hold a match: pure insert batch
            upserts = updates
            keys_src = keys
        return _merge_impl(spark, path, keys_src, upserts, key_cols,
                           read_version=read_version, group=group,
                           conflict_desc=full_desc)
    finally:
        if matched_t is not None:
            matched_t.unpersist()


def merge_delete_when(spark: SparkSession, path: str,
                      source: DataFrame, key_cols: list[str],
                      match_cond: str | None = None,
                      read_version: int | None = None,
                      group: dict | None = None,
                      _full_read: bool = False) -> int:
    """Conditional MERGE-DELETE — Delta's ``WHEN MATCHED
    [AND <cond>] THEN DELETE`` clause: a target row dies exactly
    when a source row matches its key AND the condition is literal
    TRUE over the (source, target) pair (``s.``/``t.`` scope, same
    contract as :func:`merge_upsert_when`); non-qualifying matched
    rows stay, unmatched source rows are IGNORED (no insert branch —
    this is the delete-feed statement), and a key absent from the
    table is a no-op.  Unlike merge_upsert_when the source may carry
    duplicate keys: deletion is a set decision (the row dies if ANY
    pair qualifies), so multi-match is deterministic — the same rule
    Delta applies to delete-only MERGEs.

    This differs from :func:`merge_apply`'s DELETE WHEN flag in one
    load-bearing way: the flag is computed source-side BEFORE the
    merge, while ``match_cond`` can reference the table's CURRENT
    row (``t.<col>``) — "delete my keys only where the stored state
    says so", the guard a CDC reaper needs.

    Copy-on-write through :func:`_merge_impl`: only dirs holding
    qualifying keys rewrite; duplicate target rows under one key
    each evaluate independently and non-qualifying siblings carry
    byte-stable (on an IDENTITY table those siblings keep their ids
    through the engine's matched-id restoration — exact when keys
    are unique, the table's normal state).  With ``read_version``
    the full-source-key-set conflict descriptor is checked against
    the declared snapshot AND threaded into the commit-time re-check
    (a concurrent write to a matched-but-unqualified key refuses,
    never silently wins).  Always commits a version (a no-match
    delete is a recorded operation, Delta-style) — but a
    nothing-qualifies run commits METADATA-ONLY with op class
    ``maintenance`` (no dir written, no logical row changed), so a
    downstream txntable stream flows past the idle tick instead of
    refusing a phantom content change."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    ctx = _conditional_merge_ctx(spark, path, source, key_cols,
                                 read_version, parent,
                                 op_label="delete")
    man, keys, full_desc, tcols, matched_t = ctx

    def _noop_delete() -> int:
        # nothing qualifies: commit a RECORDED no-op (metadata only —
        # dirs/stats/dv carry verbatim).  Op class is MAINTENANCE,
        # not delete: no logical row changed, so the append-only
        # stream contract is intact and later writers need no
        # conflict adjudication against an empty write set — a
        # `delete` op here would crash-loop every non-skip-change
        # txntable stream on a commit that changed nothing.  The
        # meta markers keep the audit trail honest.
        return _commit_manifest(
            path, parent + 1, "delete", man["dirs"],
            {"dv_rows_deleted": 0, "merge_delete_noop": True},
            man.get("stats", {}), man.get("rows", {}),
            man.get("bloom_cols", []), man.get("schema"),
            partition_by=man.get("partition_by", []),
            dv=man.get("dv", []),
            constraints=man.get("constraints", {}),
            identity=man.get("identity"),
            analyze=man.get("analyze", {}),
            generated=man.get("generated", {}),
            group=group, files=man.get("files", {}),
            op={"type": "maintenance"})

    if matched_t is None:
        return _noop_delete()
    if tcols is None:
        tcols = matched_t.columns
    try:
        qual, _ = _pair_split(source, matched_t, key_cols,
                              match_cond)
        dying = qual.select(
            *[F.col(f"t.{c}").alias(c) for c in tcols])
        qual_keys = dying.select(*key_cols).distinct()
        if not qual_keys.limit(1).count():
            return _noop_delete()
        # per-row semantics under duplicate target rows: only rows
        # whose OWN pair qualified die — siblings of a dying key
        # carry through the rewrite unchanged.  exceptAll is
        # multiplicity-exact, and a row matched by several
        # qualifying source rows (dup source keys) appears that many
        # times in `dying` — subtracting more copies than exist
        # floors at zero, exactly "the row dies once".
        carried = (matched_t
                   .join(F.broadcast(qual_keys), key_cols,
                         "left_semi")
                   .exceptAll(dying.select(*matched_t.columns)))
        gen = man.get("generated", {})
        ident = man.get("identity") or {}
        if ident and carried.limit(1).count():
            # a surviving duplicate-key sibling cannot keep its id
            # through the rewrite (the engine restores ONE id per
            # key — min over the key's existing rows, which includes
            # the DYING row's): silently resurrecting a deleted
            # surrogate key on different data is corruption, so
            # refuse loudly.  Unique-key identity tables (the normal
            # state) never reach here — their carried set is empty.
            raise ValueError(
                f"merge_delete_when on {path}: a qualifying key has "
                "surviving duplicate-key sibling rows, and the "
                f"IDENTITY column '{ident['col']}' cannot be "
                "preserved per-row through the rewrite — "
                "de-duplicate the table on the merge keys first")
        drop = sorted((set(gen) | ({ident["col"]} if ident
                                   else set()))
                      & set(carried.columns))
        if drop:
            # same rule as merge_upsert_when: _merge_impl refuses
            # upserts carrying the identity column and recomputes
            # generated columns — carried (here: none, the refusal
            # above) and unique-key rows are unaffected
            carried = carried.drop(*drop)
        return _merge_impl(spark, path, qual_keys, carried,
                           key_cols, read_version=read_version,
                           group=group, conflict_desc=full_desc,
                           full_read=_full_read)
    finally:
        matched_t.unpersist()


def merge_sync_delete(spark: SparkSession, path: str,
                      source: DataFrame, key_cols: list[str],
                      match_cond: str | None = None,
                      read_version: int | None = None,
                      group: dict | None = None) -> int:
    """Full-sync MERGE-DELETE — Delta's ``WHEN NOT MATCHED BY
    SOURCE [AND <cond>] THEN DELETE`` clause, the third leg of the
    MERGE triangle: target rows whose key has NO source match die
    (optionally gated by ``match_cond`` over the TARGET row,
    ``t.<col>`` scope only — there is no source row to reference).
    With the source as the desired key universe this is dimension
    full-sync: "make the table contain only what the feed still
    contains", the reaper half the reference's full-refresh dims get
    from TRUNCATE+reload (sql/batchELT/core dims) without losing
    history or rewriting matched rows.

    Two-phase: (1) ONE distinct-keys scan of the current snapshot
    anti-joined against the source's keys — no broadcast on the
    source side (a full-sync source carries nearly the whole key
    universe; Catalyst/AQE pick the join strategy) — yields the
    dead-key set, typically the small sync DELTA; (2) that set
    drives :func:`merge_delete_when` verbatim, inheriting the
    manifest-pruned candidate probe, per-row sibling carry, identity
    handling, the metadata-only no-op commit when nothing died, and
    the conflict-descriptor threading.  Deleting 0.1% of keys costs
    the key scan + a 0.1% rewrite, never a table rewrite.

    ``read_version``: the sync decision read EVERY target key, so
    the conflict rule is the strict full-read one
    (:func:`_check_full_read_conflict`) — ANY logical content commit
    after the declared snapshot refuses, including a disjoint-key
    append (its new key would silently survive the "full sync"
    otherwise); only physical maintenance is compatible.  Checked
    here before the scan AND again inside the merge against the
    parent the publish races on, so the coverage is gap-free.

    NULL-key target rows are KEPT (this engine's keyed operations
    are null-unsafe equality throughout, so a NULL key can neither
    match a source row nor be addressed as a deletable key) —
    Delta's ON-clause would delete them as never-matched; reap them
    explicitly with ``delete_where("k IS NULL")`` if that is the
    intent.  Pinned by tests."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    if read_version is not None:
        # fail fast BEFORE the key scan; the authoritative re-check
        # runs inside the merge against its own publish parent
        _check_full_read_conflict(path, read_version, parent,
                                  "merge_sync_delete")
    skeys = source.select(*key_cols).distinct()
    # persisted: the dead-key set feeds the candidate probe, the
    # broadcast, every pair-split evaluation, and the conflict
    # fingerprint downstream — without the persist each one re-runs
    # the full-table key scan
    dead_keys = (snapshot(spark, path, parent)
                 .select(*key_cols).distinct()
                 .join(skeys, key_cols, "left_anti").persist())
    try:
        return merge_delete_when(spark, path, dead_keys, key_cols,
                                 match_cond=match_cond,
                                 read_version=read_version,
                                 group=group, _full_read=True)
    finally:
        dead_keys.unpersist()


def alter_constraints(spark: SparkSession, path: str,
                      add: dict[str, str] | None = None,
                      drop: list[str] | None = None) -> int:
    """Delta ``ALTER TABLE ... ADD CONSTRAINT <name> CHECK (<expr>)``
    / ``DROP CONSTRAINT <name>`` on a live table: change the
    declared CHECK set WITHOUT a data write — constraints are a
    table property carried by every commit, but until now (re)
    declaring one required riding a data commit; this is the
    standalone METADATA-ONLY statement.

    ``add`` names→SQL-boolean (NOT NULL is ``"col IS NOT NULL"``);
    adding validates the table's CURRENT visible rows first, one agg
    job over all live dirs with tombstones applied (Delta's ADD
    CONSTRAINT scans existing data the same way) — a violation
    refuses with ConstraintViolation and the table is unchanged.
    Re-declaring an existing name with a DIFFERENT expression
    refuses (Delta errors on duplicate names; drop it first);
    re-declaring the identical expression is an idempotent no-op
    entry.  ``drop`` removes by name; an unknown name refuses
    loudly (a typo'd DROP must not silently leave the constraint
    enforced).

    The commit carries dirs/stats/dv/files verbatim with op class
    ``maintenance`` — no logical row changed, so txntable streams
    flow past it and concurrent keyed writers need no adjudication
    against it.  Enforcement from the NEXT write on is the ordinary
    commit/MERGE validation path.  Returns the committed version."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, parent)
    cons = dict(man.get("constraints", {}))
    for name in (drop or []):
        if name not in cons:
            raise ValueError(
                f"DROP CONSTRAINT {name!r}: no such constraint on "
                f"{path} (declared: {sorted(cons) or 'none'})")
        del cons[name]
    added: dict[str, str] = {}
    for name, sql in (add or {}).items():
        if name in cons and cons[name] != sql:
            raise ValueError(
                f"ADD CONSTRAINT {name!r}: already declared with a "
                f"different expression ({cons[name]!r}); DROP it "
                "first (Delta refuses duplicate constraint names "
                "the same way)")
        if cons.get(name) != sql:
            added[name] = sql
        cons[name] = sql
    if added and man["dirs"]:
        # the new constraints must hold over the CURRENT visible
        # rows — validate before publishing, tombstones applied
        _validate_constraints(spark, path, man["dirs"], added,
                              man=man)
    return _commit_manifest(
        path, parent + 1, man.get("mode", "overwrite"), man["dirs"],
        {"alter_constraints": {"added": sorted(added),
                               "dropped": sorted(drop or [])}},
        man.get("stats", {}), man.get("rows", {}),
        man.get("bloom_cols", []), man.get("schema"),
        partition_by=man.get("partition_by", []),
        dv=man.get("dv", []),
        constraints=cons,
        identity=man.get("identity"),
        analyze=man.get("analyze", {}),
        generated=man.get("generated", {}),
        files=man.get("files", {}),
        op={"type": "maintenance"})


def convert_to_txn(spark: SparkSession, data_dir: str, path: str,
                   stats_cols: list[str] | None = None,
                   bloom_cols: list[str] | None = None,
                   partition_by: list[str] | None = None) -> int:
    """Delta ``CONVERT TO DELTA`` analog: adopt an EXISTING plain
    parquet directory as a transaction-log table WITHOUT copying or
    rewriting a byte — ``path``'s v0 manifest references
    ``data_dir`` by absolute path (the shallow_clone mechanism), so
    converting a 100 TB lake directory is one schema read + one
    O(files) stat walk + one JSON write, and every txnlog capability
    (snapshot, time travel, MERGE, DELETE, streaming, SQL
    statements) works over it immediately; later commits land in
    ``path``'s own claimed dirs, never touching the adopted bytes.

    ``stats_cols`` additionally records the per-dir [min, max]
    envelopes pruning reads need — ONE aggregation scan over the
    adopted files (Delta's CONVERT reads footers for the same
    reason); omit it for a stats-free metadata-only convert.
    ``partition_by`` / ``bloom_cols`` declare the usual table
    properties for FUTURE commits (the adopted dir is one manifest
    dir regardless — converting preserves layout, it does not
    re-partition).

    Refuses when ``path`` already has commits, when ``data_dir`` has
    no parquet files, or when the two paths coincide (the table root
    holds ``_txn`` bookkeeping a self-referencing data scan would
    read as data).  Shares shallow_clone's retention caveat: the
    adopted dir lives OUTSIDE the table root, so the table's own
    vacuum never reclaims it."""
    src_abs = os.path.abspath(data_dir)
    dst_abs = os.path.abspath(path)
    if src_abs == dst_abs or src_abs.startswith(dst_abs + os.sep) \
            or dst_abs.startswith(src_abs + os.sep):
        # both nestings are fatal: a data_dir under the root would
        # scan _txn bookkeeping as data, and a root under the
        # data_dir would put the table's own future data-v* dirs
        # (and manifests) INSIDE the adopted dir — every later walk
        # or raw read of it double-counts them
        raise ValueError(
            "convert_to_txn adopts the directory BY REFERENCE: "
            f"data_dir {src_abs} and table root {dst_abs} must be "
            "disjoint (neither inside the other — the root holds "
            "_txn bookkeeping and claims its own data dirs)")
    if latest_version(path) is not None:
        raise ValueError(f"convert target {path} already has commits")
    fstats = _dir_file_stats(path, [src_abs])
    if fstats[src_abs][0] == 0:
        raise FileNotFoundError(
            f"no data files under {src_abs} to convert")
    df = spark.read.parquet(src_abs)
    stats: dict = {}
    rows: dict = {}
    if stats_cols:
        cstats, n = _col_stats(df, sorted(set(stats_cols)))
        stats, rows = {src_abs: cstats}, {src_abs: n}
    os.makedirs(path, exist_ok=True)
    v = _commit_manifest(
        path, 0, "overwrite", [src_abs],
        {"converted_from": src_abs}, stats, rows,
        sorted(set(bloom_cols or [])), _schema_json(df),
        partition_by=list(partition_by or []),
        files=fstats,
        # adoption seeds fresh content: replace semantics for any
        # keyed write that somehow declared an older snapshot
        op={"type": "replace"})
    if bloom_cols:
        _maintain_bloom(spark, path, v, sorted(set(bloom_cols)),
                        [src_abs])
    return v


MERGE_BLOOM_PROBE_CAP = 4096


def _probe_candidate_dirs(spark: SparkSession, path: str, man: dict,
                          keys: DataFrame, key_cols: list[str],
                          parent: int) -> list[str]:
    """Manifest-metadata candidate pruning for a keyed probe (shared
    by MERGE and delete_keys): drop dirs whose recorded state proves
    they cannot hold any of ``keys``.

    Stats fast path: a dir whose key envelope misses the keys' range
    can't contain matches — skip its probe scan entirely.
    Bloom fast path: on a HIGH-CARDINALITY key whose per-dir
    envelopes each span most of the key space, the min/max test
    never prunes (exactly the gap the bloom index exists for) —
    probe the declared sidecars with the keys and drop dirs whose
    bitmaps reject every key.  Only engaged for SMALL key sets
    (≤ MERGE_BLOOM_PROBE_CAP distinct keys, checked with a
    limit-probe, never a full count): the point is turning a small
    keyed operation into O(dirs-touched); a bulk operation's
    distributed semi-join probe already scales and needs no
    driver-side key list."""
    candidates = man["dirs"]
    stats = man.get("stats", {})
    has_stats = len(key_cols) == 1 and any(
        key_cols[0] in s for s in stats.values())
    has_bloom = len(key_cols) == 1 \
        and key_cols[0] in man.get("bloom_cols", [])
    if not (has_stats or has_bloom):
        return candidates
    kc = key_cols[0]
    # limit-probe FIRST: a small key set (the common point-op case)
    # is fully in hand after one job — its min/max/null facts are
    # driver arithmetic, so the separate agg job only runs for bulk
    # sets (was: agg always + limit for small sets = 2 jobs where 1
    # does; same decisions in every case)
    sample = keys.limit(MERGE_BLOOM_PROBE_CAP + 1).collect()
    if not sample:
        return []  # empty key set: nothing can match any dir
    if len(sample) <= MERGE_BLOOM_PROBE_CAP:
        vals = [r[0] for r in sample]
        if any(v is None for v in vals):
            # NULL keys present: stats envelopes ignore NULLs (an
            # all-NULL-key dir has no envelope to overlap) and bloom
            # sidecars only record non-null values, so NEITHER fast
            # path may prune — the null-safe semi-join probe over
            # all dirs is what finds the NULL rows (delete_keys'
            # null-safe contract; the r7 advice repro'd NULL rows
            # surviving a delete on a stats/bloom table)
            return candidates
        # small key set: per-value envelope + bloom conjunction
        # through the shared point-set seam (prune_point_set)
        kept, _ = prune_point_set(
            spark, path, kc, vals, version=parent, null_safe=True)
        return kept
    krow = keys.agg(
        F.count(F.lit(1)).alias("__n"), F.count(kc).alias("__nk"),
        F.min(kc).alias("lo"), F.max(kc).alias("hi")).collect()[0]
    if int(krow["__nk"]) < int(krow["__n"]):
        return candidates  # NULL keys in a bulk set: same rule
    if has_stats:
        # bulk key set (no driver-side value list): range-envelope
        # pruning only — the distributed semi-join probe downstream
        # already scales.  Probe values go through the SAME
        # normalization the manifest stats did (ISO strings for
        # timestamps, float for Decimal) — raw collect() values
        # would compare cross-type and throw
        lo, hi = _json_safe(krow["lo"]), _json_safe(krow["hi"])
        candidates = [d for d in candidates
                      if _overlaps(stats, d, kc, lo, hi)]
    return candidates


def _merge_impl(spark: SparkSession, path: str, keys_src: DataFrame,
                upserts: DataFrame, key_cols: list[str],
                read_version: int | None = None,
                group: dict | None = None,
                conflict_desc: dict | None = None,
                full_read: bool = False) -> int:
    """Shared copy-on-write merge core: remove ``keys_src``'s keys
    from the affected dirs, land ``upserts`` in the fresh dir.
    ``group`` marks the commit as a multi-table transaction member
    (invisible until the coordinator decides — commit_group supplies
    it); read_version inside a group refuses exactly like commit().
    ``conflict_desc`` widens the read_version conflict CHECK to a
    caller-supplied key-set descriptor (the conditional merges pass
    their FULL source key set — the condition read rows the write
    set excludes, and a concurrent writer touching those must
    refuse); the manifest's op record still fingerprints
    ``keys_src`` — the keys this commit actually WROTE, which is
    what later writers adjudicate against.  ``full_read`` escalates
    the check to :func:`_check_full_read_conflict` (the sync-delete
    contract: the decision read EVERY key, so any content commit —
    even a disjoint-key append — refuses); running it HERE, against
    the parent this commit's test-and-set publish races on, makes
    the coverage gap-free: a commit landing after this check loses
    the version race and surfaces as TxnConflict."""
    if group is not None and read_version is not None:
        raise ValueError(
            "read_version inside a transaction group is not "
            "supported: a group member's visibility flips at the "
            "coordinator decision, after the conflict window this "
            "check could cover — commit conflict-checked writes "
            "outside the group")
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        if read_version is not None:
            raise ValueError(
                f"read_version {read_version} on an empty table")
        return commit(upserts, path, "overwrite", group=group)
    version = parent + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    man = _read_manifest(path, parent)
    # refuse an incompatible column-type change BEFORE any rewrite
    # job runs: the union below would otherwise coerce (e.g. cast a
    # string upsert to the table's bigint) and die mid-write — or
    # worse, silently commit a coerced schema.  Raises ValueError
    # exactly like a narrowing commit() does (r7 advice semantics).
    if man.get("schema"):
        _merge_schema_json(man["schema"], _schema_json(upserts))
    stats = man.get("stats", {})
    # the distinct key set drives FOUR separate consumers (op-desc
    # fingerprint, candidate probe, broadcast build, anti-join) —
    # persist it so the distinct shuffle computes once, not per
    # consumer (guide §5: cache only what is reused and cheap)
    keys = keys_src.select(*key_cols).distinct().persist()
    try:
        # fingerprint the key set ONCE: recorded in the manifest so later
        # read_version-declaring writers can adjudicate against THIS
        # commit, and checked HERE against the commits that landed since
        # our own declared snapshot (before any rewrite work runs)
        op_desc = _key_set_descriptor(keys, key_cols)
        if read_version is not None:
            if full_read:
                _check_full_read_conflict(path, read_version, parent,
                                          "merge_sync_delete")
            else:
                _check_write_conflict(path, read_version, parent,
                                      key_cols, conflict_desc or op_desc,
                                      "merge")
        bkeys = F.broadcast(keys)
        candidates = _probe_candidate_dirs(
            spark, path, man, keys, key_cols, parent)
        # ONE probe job over all candidate dirs (not one job per dir — a
        # long-appended table would otherwise pay thousands of serial tiny
        # jobs): multi-path scan tagged with the owning dir via
        # input_file_name(), broadcast semi-join, distinct surviving dirs.
        if candidates:
            # tag rows with their owning dir's full path (scheme stripped,
            # final /part-file component dropped): manifest dir entries may
            # be bare names OR absolute paths (shallow clones reference the
            # source's dirs absolutely), and two tables' dirs can share a
            # basename — only the full path identifies the dir
            # manifest-schema read (_read_dirs), NOT a raw multipath scan:
            # after a schema-evolving append the raw read takes the FIRST
            # dir's column set, so a probe on an evolution-added key would
            # miss rows and the rewrite below would silently drop evolved
            # columns from kept rows (repro'd: a post-evolution merge
            # nulled the added column table-wide)
            tagged = (
                _read_dirs(spark, path, candidates, man)
                .withColumn("__dir", _dir_col())
                .join(bkeys, key_cols, "left_semi"))
            # input_file_name is a URI: percent-decode so paths with
            # spaces/non-ASCII compare equal to os.path.abspath (unquote,
            # not unquote_plus — a literal '+' must survive)
            hit = {urllib.parse.unquote(r["__dir"])
                   for r in tagged.select("__dir").distinct().collect()}
            affected = [
                d for d in candidates
                if os.path.abspath(os.path.join(path, d)) in hit]
        else:
            affected = []
        existing = None
        if affected:
            existing = _read_dirs(spark, path, affected, man)
            if man.get("dv"):
                # rows an earlier DELETE tombstoned must not be
                # resurrected by the rewrite
                existing = _apply_dv(spark, path, existing, man["dv"])
        gen = man.get("generated", {})
        provided_gen_cols = set(gen) & set(upserts.columns)
        if gen:
            # upserts written without the generated columns get them
            # computed here, BEFORE the identity split and the union —
            # otherwise the rewrite would null-backfill them and the
            # post-write validation below would refuse the merge
            upserts = _compute_generated(upserts, gen)
        ident = man.get("identity")
        if ident:
            icol = ident["col"]
            if icol in upserts.columns:
                raise ValueError(
                    f"identity column '{icol}' is GENERATED ALWAYS: "
                    "the engine assigns it; drop it from the upserts")
            if existing is not None:
                # updates KEEP the matched row's id (IDENTITY is the
                # stable surrogate key — a merge must not reassign it);
                # every key present anywhere in the table lives in an
                # affected dir, so `existing` covers all matches
                matched = (existing.join(bkeys, key_cols, "left_semi")
                           .groupBy(*key_cols).agg(F.min(icol).alias(icol)))
                joined = upserts.join(matched, key_cols, "left")
                inserts = joined.where(F.col(icol).isNull()).drop(icol)
                updates = joined.where(F.col(icol).isNotNull())
            else:
                inserts, updates = upserts, None
            assigned, new_hwm = _assign_identity(
                inserts, icol, ident["hwm"])
            ident = {"col": icol, "hwm": new_hwm}
            upserts = assigned if updates is None \
                else updates.unionByName(assigned)
        if existing is not None:
            # allowMissingColumns = MERGE schema evolution, both ways
            # (Delta mergeSchema-on-MERGE): upserts carrying a NEW column
            # null-backfill the kept rows; upserts written against an
            # OLDER schema null-fill the evolved columns on their own
            # rows while kept rows keep their values
            rewritten = existing.join(bkeys, key_cols, "left_anti") \
                .unionByName(upserts, allowMissingColumns=True)
        else:
            rewritten = upserts
        data_dir = _claim_data_dir(path, version)
        name = os.path.basename(data_dir)
        pby = man.get("partition_by", [])
        bcols = man.get("bloom_cols", [])
        stat_cols = sorted({c for s in stats.values() for c in s})
        new_stats, new_rows = {}, {}
        bloom_pre: dict = {}
        if pby:
            # partition-aware rewrite: the copy-on-write dir splits per
            # partition value like every commit on this table, so
            # dir-per-value stays an INVARIANT through MERGE (a date-
            # scoped read after an upsert still opens only that date's
            # leaves) instead of an eventual state compact() restores
            new_names, new_stats, new_rows, bloom_pre = _write_partitioned(
                spark, path, data_dir, rewritten, pby, stat_cols,
                bloom_cols=bcols)
        else:
            # one pass: the write job itself carries the restated stats
            # and bloom bitmaps (observe — see commit(); this keeps the
            # envelope pinned to the rows actually on disk WITHOUT
            # re-executing the anti-join ∪ upserts, which is exactly what
            # the old read-back existed to avoid)
            new_stats, new_rows, bodies, _ = _observed_write(
                spark, path, data_dir, rewritten, stat_cols, bcols)
            new_names = [name]
            if bodies:
                bloom_pre = {name: bodies}
        dirs = [d for d in man["dirs"] if d not in affected] + new_names
        kept_stats = {d: s for d, s in stats.items() if d in dirs}
        kept_stats.update(new_stats)
        prows = man.get("rows", {})
        kept_rows = {d: n for d, n in prows.items() if d in dirs}
        kept_rows.update(new_rows)
        schema = _merge_schema_json(
            man.get("schema"),
            _schema_json(spark.read.parquet(
                os.path.join(path, new_names[0]))))
        # carry tombstones ONLY for dirs still in the manifest (a
        # rewritten dir's replacement already excludes its tombstoned
        # rows, so keeping its contribution would double-count deletes
        # in metadata_count); entries drained of dirs drop entirely
        dv = _filter_dv(man.get("dv", []), dirs)
        cons = man.get("constraints", {})
        if cons:
            # MERGE validates the rewritten dirs (kept rows satisfied the
            # constraints already — the upserts are what can violate),
            # under the MERGED table schema so a constraint referencing
            # an evolved column resolves even when this rewrite's dir was
            # written against an older column set (NULL there → passes,
            # SQL CHECK semantics)
            _validate_constraints(spark, path, new_names, cons,
                                  man={"schema": schema})
        gprovided = {c: sql for c, sql in gen.items()
                     if c in provided_gen_cols}
        if gprovided:
            # a provided-but-mismatched generated value in the upserts
            # refuses the whole merge, same contract as the commit path;
            # engine-computed columns skip the scan (match by
            # construction, same rule as commit)
            _validate_constraints(spark, path, new_names,
                                  _generated_checks(gprovided),
                                  man={"schema": schema})
        # ANALYZE records for SURVIVING dirs carry (their bytes are
        # untouched); only the rewritten dirs' records drop — the
        # documented contract on commit(analyze_cols=...)
        kept_analyze = {d: a for d, a in man.get("analyze", {}).items()
                        if d in dirs}
        v = _commit_manifest(path, version, "merge", dirs,
                             {"rewrote": affected}, kept_stats,
                             kept_rows, bcols, schema,
                             partition_by=pby, dv=dv,
                             constraints=cons, identity=ident,
                             generated=gen, analyze=kept_analyze,
                             group=group,
                             op={"type": "merge",
                                 "key_cols": list(key_cols),
                                 "keys": op_desc})
        # surviving dirs keep their write-once sidecars; only the fresh
        # leaves need indexing, so the index stays always-on through MERGE
        _maintain_bloom(spark, path, v, bcols, new_names,
                        precomputed=bloom_pre)
        return v
    finally:
        keys.unpersist()


def _dv_delta_rows(spark: SparkSession, path: str, man_a: dict,
                   man_b: dict, shared: list[str]) -> DataFrame | None:
    """Rows visible at version A, living in dirs CARRIED into
    version B, whose (dir, key) pair is tombstoned in B but not in A
    — the delete contribution of the deletion-vector commits between
    the two versions, for :func:`change_feed`.

    Works on tombstone pair SETS (union of B's stores minus union of
    A's, per key-column signature), so store coalescing
    (_append_dv_entry's fold) and per-dir entry filtering between A
    and B never change the answer.  Tombstones in carried dirs only
    GROW from A to B under normal writes (the only operation that
    sheds pairs rewrites the dir away, removing it from `shared`),
    so the set difference is exactly "deleted between A and B" —
    EXCEPT :func:`restore`, a metadata-only commit that carries dirs
    unchanged while reverting dv to an older, smaller set.  A shrink
    means rows RESURRECTED between A and B, which this B-minus-A
    delta cannot express (they belong on the feed's added side); the
    guard below detects per-signature pair loss over the carried
    dirs and refuses loudly instead of emitting a silently
    incomplete feed (the pre-r11 contract for feeds across a
    restore).  Scan cost: tombstone
    stores are KB-scale by the DV_MAX_KEYS contract, and the data
    scan opens ONLY the carried dirs the B-side entries name — the
    dirs the deletes actually touched.  Rows already invisible at A
    (an older tombstone, any key signature) are excluded by applying
    A's vectors before the pair match."""
    base = os.path.abspath(path)
    shared_set = set(shared)
    dv_a, dv_b = man_a.get("dv", []), man_b.get("dv", [])

    def pairs(entries, kc: tuple) -> DataFrame | None:
        dfs = [spark.read.parquet(_dv_store_dir(path, e["store"]))
               .select("__dv_dir", *kc)
               for e in entries if tuple(e["key_cols"]) == kc]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out.distinct()

    # shrink guard: for every A-side signature, the A-pairs living in
    # CARRIED dirs must all survive into B — pairs() frames are
    # KB-scale by the DV_MAX_KEYS contract, so this is a cheap
    # driver-side set check, exact where an op-type walk would
    # over-refuse (a restore that re-commits an identical dv set is
    # harmless and passes)
    for kc in sorted({tuple(e["key_cols"]) for e in dv_a}):
        # metadata short-circuit 1: the A-side entries' dir maps name
        # every dir their stores can reference — no carried dir
        # named, no shrink possible for this signature, no store read
        a_dirs = sorted({d for e in dv_a
                         if tuple(e["key_cols"]) == kc
                         for d in e.get("dirs", {})} & shared_set)
        if not a_dirs:
            continue
        # metadata short-circuit 2: stores are immutable files, so
        # if every A-side store (this signature) is still referenced
        # by B, B's pair union is a superset of A's — no shrink,
        # zero I/O.  The common no-restore feed exits here; a
        # coalescing fold (which legitimately drops store names
        # while preserving pairs) falls through to the exact
        # pair-set check below.
        a_stores = {e["store"] for e in dv_a
                    if tuple(e["key_cols"]) == kc}
        b_stores = {e["store"] for e in dv_b
                    if tuple(e["key_cols"]) == kc}
        if a_stores <= b_stores:
            continue
        pa = pairs(dv_a, kc)
        if pa is None:
            continue
        # semi-join against the carried-dir list, not isin(): a
        # 100k-literal In expression bloats the plan; the dir frame
        # broadcasts at any realistic dir count
        sh_df = F.broadcast(spark.createDataFrame(
            [(d,) for d in a_dirs], ["__dv_dir"]))
        pa_shared = pa.join(sh_df, "__dv_dir", "left_semi")
        pb = pairs(dv_b, kc)
        shed = pa_shared if pb is None else pa_shared.exceptAll(pb)
        if shed.limit(1).count():
            raise ValueError(
                "change_feed across a restore that resurrected "
                "DV-deleted rows in carried dirs: the B-minus-A "
                "tombstone delta cannot express un-deletes (key "
                f"signature {list(kc)}).  Narrow the feed window to "
                "exclude the restore commit, or read the two "
                "snapshots directly.")
    result = None
    for kc in sorted({tuple(e["key_cols"]) for e in dv_b}):
        pb = pairs(dv_b, kc)
        pa = pairs(dv_a, kc)
        delta = pb if pa is None else pb.exceptAll(pa)
        # dirs the B-side entries of this signature name, ∩ carried:
        # a conservative superset of the delta's dirs, known from
        # manifest metadata without collecting the delta
        target = sorted({d for e in dv_b
                         if tuple(e["key_cols"]) == kc
                         for d in e.get("dirs", {})} & shared_set)
        if not target:
            continue
        rows = (_read_dirs(spark, path, target, man_b)
                .withColumn("__dir", _dir_col_decoded()))
        eff_a = _filter_dv(dv_a, target)
        if eff_a:
            rows = _apply_dv(spark, path, rows, eff_a,
                             keep_dir=True)
        bdelta = F.broadcast(delta.select(
            F.concat(F.lit(base + "/"), F.col("__dv_dir"))
            .alias("__t_abs"),
            *[F.col(k).alias(f"__t_{k}") for k in kc]))
        cond = F.col("__dir") == F.col("__t_abs")
        for k in kc:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__t_{k}"))
        hit = rows.join(bdelta, cond, "left_semi").drop("__dir")
        result = hit if result is None else result.unionByName(hit)
    return result


def change_feed(spark: SparkSession, path: str,
                from_version: int | None = None,
                to_version: int | None = None,
                key_cols: list[str] | None = None,
                from_ts=None, to_ts=None) -> DataFrame:
    """Change-data-feed between two committed versions (Delta CDF /
    `table_changes` analog): every row delta classified as
    ``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` in a ``_change_type`` column.

    Each endpoint can be given as a version number OR a wall-clock
    instant (``from_ts`` / ``to_ts`` — Delta's
    ``table_changes(..., startingTimestamp, endingTimestamp)``),
    resolved through :func:`version_at_timestamp` (latest version at
    or before the instant; pre-epoch refuses).  Pass exactly one
    form per endpoint.

    Scale: data dirs carried UNCHANGED between the two manifests are
    skipped entirely — immutability means a dir present in both
    versions contributed no change, so the scan cost is proportional
    to the symmetric difference (the dirs the intervening commits and
    merges actually touched), not the table.  The diff itself is two
    full-row exceptAlls over those dirs; rows whose key appears on
    both sides are update pre/post images, the rest are
    inserts/deletes.

    Deletion-vector commits (r11): the feed is DV-EXACT without
    materializing.  Each side shows only the rows VISIBLE at its
    version (its own vectors applied over its exclusive dirs), and
    rows in CARRIED dirs whose (dir, key) tombstone pair exists at
    ``to`` but not at ``from`` join the removed side
    (:func:`_dv_delta_rows` — pair-set semantics, so store
    coalescing never confuses it; a DV-deleted key re-inserted by a
    later commit classifies as update pre/post, Delta's own CDF+DV
    behavior).  The extra scan opens only the carried dirs the new
    tombstones name."""
    if key_cols is None:
        raise TypeError("change_feed requires key_cols")
    if (from_version is None) == (from_ts is None):
        raise ValueError(
            "pass exactly one of from_version / from_ts")
    if (to_version is None) == (to_ts is None):
        raise ValueError("pass exactly one of to_version / to_ts")
    if from_ts is not None:
        from_version = version_at_timestamp(path, from_ts)
    if to_ts is not None:
        to_version = version_at_timestamp(path, to_ts)
    man_a = _read_manifest(path, from_version)
    man_b = _read_manifest(path, to_version)
    _require_decided(path, from_version, man_a)
    _require_decided(path, to_version, man_b)
    dv_a, dv_b = man_a.get("dv", []), man_b.get("dv", [])
    dv_aware = dv_a != dv_b
    only_a = [d for d in man_a["dirs"] if d not in set(man_b["dirs"])]
    only_b = [d for d in man_b["dirs"] if d not in set(man_a["dirs"])]
    shared = [d for d in man_a["dirs"] if d in set(man_b["dirs"])]

    def read(dirs: list[str], like: list[str]) -> DataFrame:
        # both sides read under the TO-version's manifest schema
        # (Delta CDF emits the latest schema): dirs written before a
        # schema evolution null-backfill the added columns instead of
        # a raw multipath read pinning whichever dir lists first
        src = dirs or like  # empty side: borrow a dir for the paths
        df = _read_dirs(spark, path, src, man_b)
        return df.limit(0) if not dirs else df

    old = read(only_a, man_b["dirs"])
    # exceptAll aligns columns POSITIONALLY — pin the new side to the
    # old side's column order (a merge-written dir can serialize its
    # columns in a different order than the original commit)
    new = read(only_b, man_a["dirs"]).select(*old.columns)
    if dv_aware:
        # deletion-vector commits change NO dirs, so the dir-set diff
        # alone would miss their deletes.  Three adjustments make the
        # feed DV-exact (pair-SET semantics, so store coalescing and
        # per-dir entry filtering never confuse it):
        # (1) the A side shows only rows VISIBLE at A — a dir dropped
        #     between A and B may carry A-era tombstones whose rows
        #     must not surface as deletes twice;
        # (2) the B side likewise (a dir appended then DV-deleted
        #     between A and B);
        # (3) rows in CARRIED dirs whose (dir, key) pair is
        #     tombstoned in B but not A join the removed side — the
        #     DV-delete contribution, scanned ONLY over the dirs the
        #     new tombstones actually name.
        eff_a = _filter_dv(dv_a, only_a)
        if eff_a:
            old = _apply_dv(spark, path, old, eff_a)
        eff_b = _filter_dv(dv_b, only_b)
        if eff_b:
            new = _apply_dv(spark, path, new, eff_b)
            new = new.select(*old.columns)
    removed = old.exceptAll(new)
    added = new.exceptAll(old)
    if dv_aware and shared:
        dv_removed = _dv_delta_rows(spark, path, man_a, man_b,
                                    shared)
        if dv_removed is not None:
            removed = removed.unionByName(
                dv_removed.select(*old.columns))
    both = (removed.select(*key_cols)
            .intersect(added.select(*key_cols)))
    bkeys = F.broadcast(both)
    pre = removed.join(bkeys, key_cols, "left_semi") \
        .withColumn("_change_type", F.lit("update_preimage"))
    post = added.join(bkeys, key_cols, "left_semi") \
        .withColumn("_change_type", F.lit("update_postimage"))
    dels = removed.join(bkeys, key_cols, "left_anti") \
        .withColumn("_change_type", F.lit("delete"))
    ins = added.join(bkeys, key_cols, "left_anti") \
        .withColumn("_change_type", F.lit("insert"))
    return pre.unionByName(post).unionByName(dels).unionByName(ins)


def compact(spark: SparkSession, path: str,
            target_dirs: int = 1) -> int | None:
    """Bin-pack the table's data dirs (Delta OPTIMIZE compaction): a
    long-appended table accumulates one dir per commit; compaction
    rewrites the CURRENT snapshot into one fresh dir and commits it as
    the next version.  On a table whose ``partition_by`` property is
    set, the rewrite bin-packs WITHIN partition values — one dir per
    live partition value, exactly Delta's OPTIMIZE on a partitioned
    table — so partition pruning survives maintenance instead of
    being flattened away.  Content is untouched (pure layout change),
    prior versions stay time-travelable (old dirs remain until
    vacuum), and manifest stats are restated over the compacted dirs
    so pruning keeps working.  No-op (returns None) when the table
    already has <= ``target_dirs`` dirs (for a partitioned table pass
    target_dirs = the live partition count to make repeat OPTIMIZE
    idempotent)."""
    _settle_stale_groups(path)
    v = latest_version(path)
    if v is None:
        return None
    man = _read_manifest(path, v)
    if len(man["dirs"]) <= target_dirs and not man.get("dv"):
        # at target layout AND no deletion vectors to materialize
        return None
    # pin BOTH the snapshot version and the commit target: routing
    # through commit() would re-resolve the parent, so a writer
    # landing v+1 between our snapshot and our publish would be
    # silently overwritten by v's compacted content (lost update);
    # pinning makes that race a TxnConflict instead — retryable via
    # commit_with_retry, never silent
    version = v + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    snap = snapshot(spark, path, v)  # DV-filtered: compaction
    # MATERIALIZES deletion vectors (the new manifest carries dv=[])
    data_dir = _claim_data_dir(path, version)
    name = os.path.basename(data_dir)
    pby = man.get("partition_by", [])
    bcols = man.get("bloom_cols", [])
    stat_cols = sorted({c for s in man.get("stats", {}).values()
                        for c in s})
    stats, rows = {}, {}
    bloom_pre: dict = {}
    if pby:
        new_dirs, stats, rows, bloom_pre = _write_partitioned(
            spark, path, data_dir, snap, pby, stat_cols,
            bloom_cols=bcols)
    else:
        # stats + bloom bitmaps ride the rewrite job (see commit())
        stats, rows, bodies, _ = _observed_write(
            spark, path, data_dir, snap, stat_cols, bcols)
        new_dirs = [name]
        if bodies:
            bloom_pre = {name: bodies}
    out = _commit_manifest(
        path, version, "overwrite", new_dirs,
        {"compacted_from": len(man["dirs"])}, stats, rows, bcols,
        man.get("schema"), partition_by=pby,
        constraints=man.get("constraints", {}),
        identity=man.get("identity"),
        generated=man.get("generated", {}),
        # physical-only rewrite: no logical row changes, compatible
        # with any concurrent keyed write (conflict matrix)
        op={"type": "maintenance"})
    _maintain_bloom(spark, path, out, bcols, new_dirs,
                    precomputed=bloom_pre)
    return out


def _last_zorder_by(path: str, v: int) -> list | None:
    """The column pair of the most recent zorder commit at or before
    version ``v`` (None if the table was never clustered) — a
    newest-first meta walk, O(commits since last cluster)."""
    w = v
    while w >= 0:
        try:
            m = _read_manifest(path, w)
        except FileNotFoundError:  # vacuumed tail
            return None
        zb = m.get("meta", {}).get("zorder_by")
        if zb is not None:
            return zb
        w -= 1
    return None


def optimize_zorder(spark: SparkSession, path: str, col_a: str,
                    col_b: str, shuffle_partitions: int = 32,
                    incremental: bool = False) -> int | None:
    """Delta ``OPTIMIZE ... ZORDER BY (a, b)`` as a TRANSACTION-LOG
    commit: rewrite the current snapshot clustered by the Morton
    interleave of (``col_a``, ``col_b``) — one manifest dir per
    Z-bucket, each with restated per-dir [min, max] envelopes over
    the zorder columns (plus any previously tracked stats columns) —
    and publish it atomically as the next version.

    Content is untouched (pure layout change, like compact()); prior
    versions stay time-travelable; and because the envelopes live in
    MANIFEST STATS, the pruned read is the ordinary
    ``snapshot(prune=[(a, lo, hi), (b, lo, hi)])`` every other
    skipping read uses — no ad-hoc sidecar path.  A rectangle query
    then opens only the buckets whose envelope reaches it, and
    Z-order keeps both dimensions' envelopes tight at once (a 1-D
    sort would prune on one column only).

    ``incremental=True`` is the liquid-clustering shape for
    append-heavy tables: bucket dirs produced by a previous zorder
    commit OVER THE SAME COLUMNS are carried untouched (their
    envelopes stay valid — the dirs are immutable) and only the
    dirs appended since recluster, into a new bucket generation
    under this commit's claimed dir.  Rewrite cost scales with the
    tail, not the table: reclustering a 100 TB table after a 1%
    append touches 1%.  Each generation quantizes against its own
    bounds, which is fine — pruning decisions read per-dir
    envelopes, never bucket ids.  Returns None when there is
    nothing to recluster (the no-op contract compact() uses).

    Scale shape: one stats agg (4 scalars) over the recluster set,
    one map-side bucket-id expression, ONE repartitionByRange
    shuffle for the rewrite, one partial-agg groupBy over the
    written layout for the envelopes (bounded by the ≤256 bucket
    count), two JSON I/Os for the commit.  Declared bloom columns
    are re-indexed per new bucket dir by the same commit-time hook
    as every write; carried buckets keep their write-once
    sidecars."""
    from .maintenance import Z_BUCKET_SHIFT, zorder_value

    _settle_stale_groups(path)
    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    carried: list[str] = []
    target = list(man["dirs"])
    if (incremental and _last_zorder_by(path, v) == [col_a, col_b]
            and not man.get("dv")):
        # bucket dirs from the same-column clustering stay; a dir a
        # later MERGE rewrote came back as a PLAIN dir, so name-based
        # detection only ever carries genuinely clustered bytes.
        # With live deletion vectors the carry is skipped: a carried
        # dir's tombstones would be dropped with the dv=[] commit, so
        # EVERYTHING reclusters through the DV-filtered read instead
        carried = [d for d in target if "/__zb=" in d]
        target = [d for d in target if "/__zb=" not in d]
    if not target and not man.get("dv"):
        return None  # fully clustered already, nothing to materialize
    # pin BOTH ends like compact(): a writer landing v+1 between our
    # snapshot and our publish must surface as TxnConflict, not a
    # silent lost update
    version = v + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    snap = _read_dirs(spark, path, target, man)
    if man.get("dv"):
        # the clustering rewrite materializes tombstones (commit
        # below carries dv=[]), so the scan must be DV-filtered
        snap = _apply_dv(spark, path, snap, man["dv"])
    a = F.col(col_a).cast("bigint")
    b = F.col(col_b).cast("bigint")
    pby = man.get("partition_by", [])
    if pby:
        # cluster WITHIN partitions (Delta forbids zordering BY a
        # partition column for the same reason: the partition dir
        # already prunes that column — Z-order's job is the columns
        # INSIDE each partition).  Bounds are computed per live
        # partition value and broadcast back with a null-safe join
        # (NULL is a real partition value; a plain equi-join would
        # silently drop its rows from the rewrite = data loss), so
        # each partition quantizes against its OWN bounds — the same
        # per-generation rule incremental mode already relies on.
        if col_a in pby or col_b in pby:
            raise ValueError(
                f"zorder columns must not be partition columns {pby}")
        from functools import reduce
        from operator import and_

        bounds = snap.groupBy(*pby).agg(
            F.min(a).alias("__zs_amin"), F.max(a).alias("__zs_amax"),
            F.min(b).alias("__zs_bmin"), F.max(b).alias("__zs_bmax"))
        bnd = bounds.select(
            *[F.col(c).alias(f"__bk_{c}") for c in pby],
            "__zs_amin", "__zs_amax", "__zs_bmin", "__zs_bmax")
        cond = reduce(and_, [F.col(c).eqNullSafe(F.col(f"__bk_{c}"))
                             for c in pby])
        withb = snap.join(F.broadcast(bnd), cond) \
            .drop(*[f"__bk_{c}" for c in pby])
    else:
        st = snap.agg(
            F.min(a).alias("amin"), F.max(a).alias("amax"),
            F.min(b).alias("bmin"), F.max(b).alias("bmax")).collect()[0]
        withb = (
            snap.withColumn("__zs_amin", F.lit(st["amin"]))
            .withColumn("__zs_amax", F.lit(st["amax"]))
            .withColumn("__zs_bmin", F.lit(st["bmin"]))
            .withColumn("__zs_bmax", F.lit(st["bmax"])))
    clustered = (
        withb.withColumn(
            "__zb",
            F.coalesce(  # all-null zorder cols in a partition: one bucket
                F.shiftright(zorder_value(a, b), Z_BUCKET_SHIFT)
                .cast("int"), F.lit(-1)))
        .drop("__zs_amin", "__zs_amax", "__zs_bmin", "__zs_bmax"))
    data_dir = _claim_data_dir(path, version)
    stat_cols = sorted({c for s in man.get("stats", {}).values()
                        for c in s} | {col_a, col_b} | set(pby))
    # ONE shared write path for both layouts (__zb folds into the dir
    # names after any partition shadows, so each bucket dir reads
    # back with exactly the table schema — the bucket id is a layout
    # artifact, not a data column); per-leaf envelopes + row counts
    # come from the shared input_file_name-tagged job, and the
    # empty-frame fallback keeps an empty table's manifest readable
    bcols = man.get("bloom_cols", [])
    new_dirs, stats, rows, bloom_pre = _write_partitioned(
        spark, path, data_dir,
        clustered.repartitionByRange(shuffle_partitions, *pby, "__zb"),
        pby, stat_cols, layout_cols=["__zb"], bloom_cols=bcols)
    dirs = list(carried) + new_dirs
    stats = {**{d: s for d, s in man.get("stats", {}).items()
                if d in carried}, **stats}
    rows = {**{d: n for d, n in man.get("rows", {}).items()
               if d in carried}, **rows}
    out = _commit_manifest(
        path, version, "overwrite", dirs,
        {"zorder_by": [col_a, col_b],
         "clustered_from": len(target),
         "carried_buckets": len(carried)}, stats, rows, bcols,
        man.get("schema"), partition_by=man.get("partition_by", []),
        constraints=man.get("constraints", {}),
        identity=man.get("identity"),
        generated=man.get("generated", {}),
        analyze={d: a for d, a in man.get("analyze", {}).items()
                 if d in carried},
        # physical-only recluster: compatible with concurrent keyed
        # writes (conflict matrix)
        op={"type": "maintenance"})
    _maintain_bloom(spark, path, out, bcols, new_dirs,
                    precomputed=bloom_pre)
    return out


def restore(path: str, to_version: int | None = None,
            as_of_ts=None) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION`` — roll the table back by
    committing a NEW version whose dirs / stats / row counts are
    exactly ``to_version``'s manifest.  Metadata-only: no data file is
    read, written, or deleted, so restoring a 100 TB table after a bad
    load is one tiny JSON commit, the bad version stays time-travelable
    for the post-mortem, and concurrent-writer safety is the same
    test-and-set as any commit.

    ``as_of_ts`` restores to the version live AT a wall-clock instant
    (``RESTORE ... TO TIMESTAMP AS OF``; resolution + refusal rules
    in :func:`version_at_timestamp`) — pass exactly one of
    ``to_version`` / ``as_of_ts``."""
    if (to_version is None) == (as_of_ts is None):
        raise ValueError("pass exactly one of to_version / as_of_ts")
    _settle_stale_groups(path)
    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    if as_of_ts is not None:
        to_version = version_at_timestamp(path, as_of_ts)
    man = _read_manifest(path, to_version)
    _require_decided(path, to_version, man)
    # the identity high-water mark NEVER rolls back (Delta RESTORE
    # keeps it monotone): ids handed out after to_version must not be
    # re-issued to post-restore inserts
    ident = man.get("identity")
    cur_ident = _read_manifest(path, v).get("identity")
    if ident and cur_ident and cur_ident["col"] == ident["col"]:
        ident = {"col": ident["col"],
                 "hwm": max(ident["hwm"], cur_ident["hwm"])}
    return _commit_manifest(
        path, v + 1, "overwrite", man["dirs"],
        {"restored_from": to_version},
        man.get("stats", {}), man.get("rows", {}),
        man.get("bloom_cols", []), man.get("schema"),
        partition_by=man.get("partition_by", []),
        dv=man.get("dv", []),
        constraints=man.get("constraints", {}),
        identity=ident,
        analyze=man.get("analyze", {}),
        generated=man.get("generated", {}),
        # the restored-to manifest already recorded its dirs' file/
        # byte totals — carry them so the metadata-only contract
        # holds (the latest manifest may not list these dirs at all)
        files=man.get("files", {}),
        # content replace: a keyed write reading across this refuses
        op={"type": "replace"})


def shallow_clone(src: str, dst: str, version: int | None = None) -> int:
    """Delta ``SHALLOW CLONE`` — create table ``dst`` whose v0 manifest
    references ``src``'s data dirs BY ABSOLUTE PATH: zero data copied,
    so forking a 100 TB table for an experiment is one JSON write.
    Commits to the clone land in the clone's own dirs and never touch
    the source (data files are immutable); the source evolves
    independently.  Caveat shared with Delta: vacuuming the SOURCE can
    drop dirs the clone still references — retention policy must cover
    live clones."""
    v = latest_version(src) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {src}")
    if latest_version(dst) is not None:
        raise ValueError(f"clone target {dst} already has commits")
    man = _read_manifest(src, v)
    if version is not None:
        _require_decided(src, v, man)
    if man.get("dv"):
        # tombstone stores live under the SOURCE's _txn dir and are
        # recorded relative to it — a clone cannot resolve them.
        # Materialize first (Delta gates CLONE+DV the same way).
        raise ValueError(
            "shallow_clone of a table with live deletion vectors: "
            "run compact() on the source first to materialize them")
    src_abs = os.path.abspath(src)
    # os.path.join(dst, d) passes absolute dirs through untouched, so
    # snapshot()/merge/compact on the clone need no special casing
    abs_dirs = [os.path.join(src_abs, d) for d in man["dirs"]]
    stats = {os.path.join(src_abs, d): s
             for d, s in man.get("stats", {}).items() if d in man["dirs"]}
    rows = {os.path.join(src_abs, d): r
            for d, r in man.get("rows", {}).items() if d in man["dirs"]}
    os.makedirs(dst, exist_ok=True)
    return _commit_manifest(
        dst, 0, "overwrite", abs_dirs,
        {"cloned_from": src_abs, "source_version": v}, stats, rows,
        man.get("bloom_cols", []), man.get("schema"),
        partition_by=man.get("partition_by", []),
        constraints=man.get("constraints", {}),
        identity=man.get("identity"),
        generated=man.get("generated", {}),
        # same abspath re-keying as stats/rows: the cloned dirs are
        # byte-identical, so their ANALYZE profile stays valid
        analyze={os.path.join(src_abs, d): a
                 for d, a in man.get("analyze", {}).items()
                 if d in man["dirs"]},
        # ... and their file/byte totals: zero walks for the clone
        files={os.path.join(src_abs, d): f
               for d, f in man.get("files", {}).items()
               if d in man["dirs"]},
        # a clone's v0 seeds fresh content (replace semantics for
        # any keyed write that somehow declared an older snapshot)
        op={"type": "replace"})


def metadata_count(path: str, version: int | None = None) -> int | None:
    """Row count of a version answered from MANIFEST METADATA ALONE —
    no data-file scan, no Spark job (Iceberg's `snapshot summary` /
    Delta's stats-based `SELECT COUNT(*)` pushdown): every commit that
    records stats also records each dir's row count, and a version's
    count is their sum.  Returns None when any dir in the version
    predates row-count recording (the caller falls back to a scan —
    conservative, like stats pruning)."""
    v = latest_version(path) if version is None else version
    if v is None:
        return None
    man = _read_manifest(path, v)
    rows = man.get("rows", {})
    if any(d not in rows for d in man["dirs"]):
        return None
    # deletion vectors: each entry carries exact per-dir deleted-row
    # counts, and _filter_dv keeps them scoped to live dirs, so the
    # metadata answer stays exact through DELETE and MERGE
    deleted = sum(n for e in man.get("dv", [])
                  for n in e.get("dirs", {}).values())
    return sum(rows[d] for d in man["dirs"]) - deleted


def history(spark: SparkSession, path: str,
            limit: int | None = None) -> DataFrame:
    """``DESCRIBE HISTORY`` analog (Delta's table-history view, the
    audit surface the reference reads from its warehouse's load-run
    log — sql/batchELT/obs/70_obs_run_log.sql): one row per committed
    version, newest first, from MANIFEST METADATA ALONE — version,
    commit epoch, operation (the conflict-matrix op descriptor's
    type; pre-op-era manifests fall back to mode), mode, dir count,
    visible rows (metadata_count: exact, DV-aware), live DV stores,
    and the transaction-group id for group members.  O(versions)
    tiny JSON reads, no data scan — describing a 100 TB table's
    history costs the same as a 100 MB one.  ``limit`` keeps only
    the newest N versions."""
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StringType, StructField,
                                   StructType)

    latest = latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed version under {path}")
    lo = 0 if limit is None else max(0, latest + 1 - limit)
    rows = []
    for v in range(latest, lo - 1, -1):
        try:
            man = _read_manifest(path, v)
        except FileNotFoundError:
            continue  # vacuumed-away version: not part of the
            # retained history (Delta's history stops there too)
        except TornManifest:
            continue  # torn manifest: skipped here like a vacuumed
            # one so one rotted old file can't brick the whole audit
            # view; SERVING that version (snapshot/restore/clone)
            # still refuses loudly with TornManifest
        op = man.get("op") or {}
        g = man.get("group") or {}
        rows.append({
            "version": v,
            "committed_at": commit_time(path, v),
            "operation": op.get("type") or man.get("mode"),
            "mode": man.get("mode"),
            "n_dirs": len(man["dirs"]),
            "rows_visible": metadata_count(path, v),
            "dv_stores": len(man.get("dv", [])),
            "group_id": g.get("id"),
        })
    schema = StructType([
        StructField("version", IntegerType()),
        StructField("committed_at", DoubleType()),
        StructField("operation", StringType()),
        StructField("mode", StringType()),
        StructField("n_dirs", IntegerType()),
        StructField("rows_visible", LongType()),
        StructField("dv_stores", IntegerType()),
        StructField("group_id", StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def describe_detail(spark: SparkSession, path: str,
                    version: int | None = None) -> DataFrame:
    """Delta ``DESCRIBE DETAIL`` analog: ONE metadata-only row about
    the table at ``version`` (latest when None) — version, commit
    mode, data-dir / file / byte totals, the manifest-bookkept row
    count (NULL when some dir predates row recording), and the
    declared table properties (partition columns, bloom columns,
    constraint names, GENERATED ALWAYS AS column names, identity
    column + high-water mark, live deletion-vector stores).

    File and byte totals come from the MANIFEST's per-dir ``files``
    records (written at commit time over exactly the new dirs —
    Delta serves DESCRIBE DETAIL from AddFile.size the same way), so
    this is manifest JSON only: zero data reads AND zero per-file
    stat calls — describing a 100 TB table with 10⁶ files costs the
    same as a 100 MB one.  Only dirs a pre-files-era manifest never
    recorded fall back to a one-time walk of those dirs."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    if version is not None:
        _require_decided(path, v, man)
    base = os.path.abspath(path)
    fmap = man.get("files", {})
    legacy = [d for d in man["dirs"] if d not in fmap]
    if legacy:
        fmap = {**fmap, **_dir_file_stats(path, legacy)}
    n_files = sum(int(fmap[d][0]) for d in man["dirs"])
    n_bytes = sum(int(fmap[d][1]) for d in man["dirs"])
    ident = man.get("identity") or {}
    row = {
        "table_path": base,
        "version": v,
        "mode": man.get("mode"),
        "num_dirs": len(man["dirs"]),
        "num_files": n_files,
        "size_bytes": n_bytes,
        "num_rows": metadata_count(path, v),
        "partition_by": list(man.get("partition_by", [])),
        "bloom_cols": list(man.get("bloom_cols", [])),
        "constraints": sorted(man.get("constraints", {})),
        "generated_cols": sorted(man.get("generated", {})),
        "identity_col": ident.get("col"),
        "identity_hwm": ident.get("hwm"),
        "num_dv_stores": len(man.get("dv", [])),
    }
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("table_path", StringType()),
        StructField("version", IntegerType()),
        StructField("mode", StringType()),
        StructField("num_dirs", IntegerType()),
        StructField("num_files", IntegerType()),
        StructField("size_bytes", LongType()),
        StructField("num_rows", LongType()),
        StructField("partition_by", ArrayType(StringType())),
        StructField("bloom_cols", ArrayType(StringType())),
        StructField("constraints", ArrayType(StringType())),
        StructField("generated_cols", ArrayType(StringType())),
        StructField("identity_col", StringType()),
        StructField("identity_hwm", LongType()),
        StructField("num_dv_stores", IntegerType()),
    ])
    return spark.createDataFrame([row], schema)


def manifest_stats(path: str, version: int | None = None) -> dict:
    """A version's per-dir stats envelopes ``{dir: {col: [lo, hi]}}``
    — the metadata a skipping read decides on, exposed so callers can
    derive table-level bounds (min of mins / max of maxes) WITHOUT a
    data scan, the Iceberg `table statistics` role."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    return _read_manifest(path, v).get("stats", {})


def latest_meta(path: str) -> dict:
    """The latest committed manifest's meta dict ({} if none)."""
    v = latest_version(path)
    if v is None:
        return {}
    return _read_manifest(path, v).get("meta", {})


def _overlaps(stats: dict, d: str, col: str, lo, hi) -> bool:
    """True unless dir ``d``'s recorded [min, max] for ``col`` is
    disjoint from [lo, hi].  Dirs without stats are always read
    (pruning must be conservative).  Bounds arrive pre-normalized
    into the envelope domain by prune_plan; disjointness uses the
    same provable-order compare as auto-pruning (prefix-related ISO
    strings are inconclusive → overlap assumed), and a cross-type
    compare keeps the dir rather than raising."""
    env = stats.get(d, {}).get(col)
    if not env or env[0] is None or env[1] is None:
        return True
    try:
        return not ((lo is not None and _env_provably_gt(lo, env[1]))
                    or (hi is not None
                        and _env_provably_gt(env[0], hi)))
    except TypeError:
        return True  # incomparable literal: can't prove, open


def prune_plan(path: str, version: int | None,
               predicates: list[tuple]) -> tuple[list[str], list[str]]:
    """(kept_dir_names, all_dir_names) for a conjunction of range
    predicates ``[(col, lo, hi), ...]`` against a version's manifest
    stats — the skipping DECISION without the read, so callers (and
    tests) can observe how many dirs a predicate opens.  A dir
    survives only if its envelope overlaps EVERY range; dirs without
    stats always survive (conservative)."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    stats = man.get("stats", {})
    # bounds into the envelope TYPE domain: datetime/date/Decimal
    # via _json_safe (both sides must compare as one type).  String
    # separator normalization (space vs 'T') is NOT applied here —
    # _overlaps' _env_provably_gt proves disjointness in both string
    # domains, so a one-sided mapping can never flip the bug onto
    # string columns holding space-form values
    predicates = [(col, _json_safe(lo), _json_safe(hi))
                  for (col, lo, hi) in predicates]
    kept = [d for d in man["dirs"]
            if all(_overlaps(stats, d, col, lo, hi)
                   for (col, lo, hi) in predicates)]
    return kept, list(man["dirs"])


def prune_point_set(spark: SparkSession, path: str, col: str,
                    values: list, version: int | None = None,
                    null_safe: bool = False
                    ) -> tuple[list[str], list[str]]:
    """(kept_dirs, all_dirs) for a ``col IN {v1..vn}`` POINT-SET
    probe — the one seam every small-keyed dir-narrowing operation
    routes through (MERGE's candidate probe, delete_keys, the
    needle-lookup reads), so envelope and bloom pruning conjoin in
    one place instead of two code paths.

    Decision per dir, conservative at every step: (1) per-VALUE
    envelope test — kept iff ANY probe value lands inside the dir's
    recorded [min, max] (tighter than the [min(values), max(values)]
    range test: {1, 1000} prunes a [400, 600] dir); (2) bloom
    sidecar probe over the envelope survivors (bloomindex.prune_dirs
    — false negatives impossible by construction).  Dirs without
    stats/sidecars always survive their step.

    NULL probe values: with ``null_safe=True`` (delete/merge
    semantics — NULL is a legal key target) any NULL stands the
    whole prune down, since envelopes and bitmaps only describe
    non-null values; with ``null_safe=False`` (IN-list lookup
    semantics — IN never matches NULL) NULLs are dropped from the
    probe set.  ``values`` is a driver-side list by contract
    (callers cap at MERGE_BLOOM_PROBE_CAP-scale; bulk key sets use
    the distributed semi-join probe, not this)."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    all_dirs = list(man["dirs"])
    vals = list(values)
    if any(x is None for x in vals):
        if null_safe:
            return all_dirs, all_dirs
        vals = [x for x in vals if x is not None]
    if not vals:
        return [], all_dirs
    stats = man.get("stats", {})
    # sorted probe set + bisect per dir: O(dirs × log|values|) on the
    # driver, not O(dirs × |values|) — at 100k-dir × 4096-value scale
    # the naive product is ~10^8 comparisons of pure Python
    import bisect

    svals = sorted(_json_safe(x) for x in vals)
    # string probes additionally test in the space→'T' normalized
    # domain: a timestamp column's envelopes are isoformat ('T')
    # while a probe literal may be space-form — and a STRING column
    # may hold space-form values — so a dir is pruned only when BOTH
    # domains prove exclusion (same both-domain rule as
    # _env_provably_gt; the r12 self-review catch)
    nvals = sorted(_norm_iso_literal(v) for v in svals) \
        if svals and isinstance(svals[0], str) else None

    def _hit(sv, lo, hi) -> bool:
        i = bisect.bisect_left(sv, lo)
        return i < len(sv) and sv[i] <= hi

    kept = []
    for d in all_dirs:
        env = stats.get(d, {}).get(col)
        if not env or env[0] is None or env[1] is None:
            kept.append(d)  # no envelope: conservative keep
            continue
        try:
            hit = _hit(svals, env[0], env[1])
            if (not hit and nvals is not None
                    and isinstance(env[0], str)
                    and isinstance(env[1], str)):
                hit = _hit(nvals, _norm_iso_literal(env[0]),
                           _norm_iso_literal(env[1]))
        except TypeError:
            hit = True  # cross-type probe: can't prove, open
        if hit:
            kept.append(d)  # some probe value inside [lo, hi]
    if kept:
        # unconditional (NOT gated on the manifest's bloom_cols
        # declaration): explicitly-built sidecars
        # (bloomindex.build_bloom_index) exist without a declaration,
        # and prune_dirs is conservative per dir — no sidecar, no
        # Spark job, dir kept
        from . import bloomindex  # function-scoped: imports us

        bkept, _ = bloomindex.prune_dirs(
            spark, path, col, vals, version=v)
        bset = set(bkept)
        kept = [d for d in kept if d in bset]
    return kept, all_dirs


def commit_time(path: str, version: int) -> float:
    """Epoch commit time of ``version``: the manifest's recorded
    ``committed_at`` when present (r10+), else the manifest FILE's
    modification time — the same fallback Delta uses to timestamp its
    log entries, so pre-r10 tables stay timestamp-travelable."""
    man = _read_manifest(path, version)
    ts = man.get("committed_at")
    return float(ts) if ts is not None \
        else os.path.getmtime(_manifest_path(path, version))


def _to_epoch(ts) -> float:
    """Accepted AS OF forms → epoch seconds: numbers pass through,
    ISO-8601 strings and datetime/date parse with naive values read
    as LOCAL time (what a SQL session's unqualified literal means)."""
    import datetime as _dt

    if isinstance(ts, bool) or not isinstance(
            ts, (int, float, str, _dt.date, _dt.datetime)):
        raise TypeError(
            f"unsupported AS OF timestamp type: {type(ts).__name__}")
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if not isinstance(ts, _dt.datetime):  # plain date → midnight
        ts = _dt.datetime.combine(ts, _dt.time.min)
    return ts.timestamp()


# checkpoint cadence for the timestamp index: every K-th commit
# rolls the adjusted commit-time array up into _txn/ts-index.json so
# AS OF TIMESTAMP resolution reads O(K) manifests instead of
# O(versions) on long-history tables (Delta's _last_checkpoint plays
# the same role for its log replay)
TS_INDEX_INTERVAL = 100


def _ts_index_path(path: str) -> str:
    return os.path.join(_txn_dir(path), "ts-index.json")


def _load_ts_index(path: str) -> dict | None:
    """Advisory read: a missing/corrupt/ill-shaped index returns None
    and resolution falls back to the full manifest walk — the index
    can speed the answer up but can never change it."""
    try:
        with open(_ts_index_path(path)) as fh:
            idx = json.load(fh)
        if (isinstance(idx.get("base"), int)
                and isinstance(idx.get("upto"), int)
                and isinstance(idx.get("times"), list)
                and len(idx["times"]) == idx["upto"] - idx["base"] + 1
                and all(isinstance(t, (int, float))
                        for t in idx["times"])
                and all(a <= b for a, b in zip(idx["times"],
                                               idx["times"][1:]))):
            return idx
    except (OSError, ValueError):
        pass
    return None


def _maybe_write_ts_index(path: str, version: int) -> None:
    """Roll the adjusted commit-time array up to ``version`` into the
    index file (tmp + atomic replace; LAST-WINS — the index is
    advisory, so two racing checkpointers can't corrupt anything a
    reader trusts).  Extends the previous checkpoint when present;
    rebuilds from the earliest retained manifest otherwise.  Never
    fails the commit that triggered it: this is a hint path, like
    the head hint."""
    try:
        prev = _load_ts_index(path)
        if prev and prev["upto"] >= version:
            return
        if prev and os.path.exists(
                _manifest_path(path, prev["upto"])):
            base, times = prev["base"], list(prev["times"])
            start, running = prev["upto"] + 1, prev["times"][-1]
        else:
            base, times, start, running = None, [], 0, None
        for v in range(start, version + 1):
            try:
                t = commit_time(path, v)
            except (FileNotFoundError, TornManifest):
                # vacuumed — or torn, same treatment for the
                # advisory index: resolution skips it either way
                if not times:
                    continue  # vacuumed prefix: base starts later
                t = running  # vacuumed mid-range: carry (monotone)
            if base is None:
                base = v
            running = t if running is None else max(running, t)
            times.append(running)
        if base is None:
            return
        tmp = _ts_index_path(path) + \
            f".tmp-{os.getpid()}-{next(_TMP_SEQ)}"
        with open(tmp, "w") as fh:
            json.dump({"base": base, "upto": version,
                       "times": times}, fh)
        os.replace(tmp, _ts_index_path(path))
    except (OSError, ValueError, KeyError):
        pass  # advisory hint: a lost checkpoint costs a full walk


def version_at_timestamp(path: str, ts) -> int:
    """``AS OF TIMESTAMP`` resolution (the form Delta and Iceberg
    both serve, and the one a GDPR/audit consumer actually uses): the
    LATEST version whose commit time ≤ ``ts``.  Commit times are made
    monotone with a running max before comparing (file mtimes and
    clock skew can invert adjacent commits; Delta applies the same
    adjustment to its log timestamps), so a version never resolves
    before its parent.  A timestamp EARLIER than version 0's commit
    raises ValueError — the table did not exist yet, and serving v0
    would fabricate history.  Accepts epoch seconds, ISO-8601
    strings, datetime/date.  Manifest metadata only — no data scan;
    long histories resolve through the rolled-up checkpoint index
    (every TS_INDEX_INTERVAL-th commit; O(log n + K) instead of
    O(versions)), with the full walk as the always-correct
    fallback."""
    epoch = _to_epoch(ts)
    latest = latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed version under {path}")
    # checkpoint fast path: binary-search the rolled-up adjusted
    # times, walk only the manifests past the checkpoint — O(log n +
    # K) instead of O(versions).  Falls through to the full walk
    # whenever the index can't prove the answer (pre-base timestamp,
    # vacuumed candidate, stale/corrupt index).
    idx = _load_ts_index(path)
    if idx and idx["upto"] <= latest:
        import bisect

        pos = bisect.bisect_right(idx["times"], epoch) - 1
        if pos >= 0:
            best = idx["base"] + pos
            running = idx["times"][-1]
            for v in range(idx["upto"] + 1, latest + 1):
                try:
                    t = commit_time(path, v)
                except (FileNotFoundError, TornManifest):
                    continue
                running = max(running, t)
                if running <= epoch:
                    best = v
                else:
                    break
            try:
                _read_manifest(path, best)
                return best
            except (FileNotFoundError, TornManifest):
                pass  # candidate unservable: full walk decides
    best, running, earliest = None, None, None
    for v in range(latest + 1):
        try:
            t = commit_time(path, v)
        except (FileNotFoundError, TornManifest):
            # vacuumed-away manifest: that version's state is no
            # longer servable — resolution starts at the earliest
            # RETAINED version (Delta can't time-travel past its
            # retention either).  A TORN manifest is treated the
            # same way FOR RESOLUTION ONLY (skip it, keep the
            # running max from its neighbors): one bit-rotted old
            # file must not brick AS OF travel for every timestamp
            # table-wide.  SERVING the torn version itself still
            # refuses loudly — snapshot/_read_manifest raise
            # TornManifest — so loudness is preserved exactly where
            # it matters
            continue
        earliest = v if earliest is None else earliest
        running = t if running is None else max(running, t)
        if running <= epoch:
            best = v
        else:
            break  # running max only grows — no later version fits
    if best is None:
        raise ValueError(
            f"timestamp {ts!r} precedes the retained history of "
            f"{path} (earliest retained version {earliest}, "
            f"committed at epoch {commit_time(path, earliest)}); "
            "there is no servable table state that old")
    return best


def snapshot(spark: SparkSession, path: str,
             version: int | None = None,
             prune: tuple | list | None = None,
             as_of_ts=None) -> DataFrame:
    """Snapshot-isolated read of ``path`` at ``version`` (default:
    latest).  Reads exactly the dirs that version's manifest lists —
    concurrent commits and crashed half-writes are invisible.

    ``prune=(col, lo, hi)`` skips dirs whose manifest [min, max]
    envelope for ``col`` misses the range (Iceberg-style stats
    pruning); a LIST of such triples prunes on their conjunction —
    the multi-column form a Z-ordered layout exists for, where each
    clustered dir is tight on SEVERAL columns at once
    (optimize_zorder).  Pruning only narrows WHICH dirs are scanned;
    callers still apply their row predicate — surviving dirs may
    carry rows outside the range.

    ``as_of_ts`` reads the table AS OF a wall-clock instant instead
    of a version number (``SELECT ... TIMESTAMP AS OF``; resolution
    rules in :func:`version_at_timestamp`) — mutually exclusive with
    ``version``."""
    if as_of_ts is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        version = version_at_timestamp(path, as_of_ts)
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = _read_manifest(path, v)
    if version is not None:
        _require_decided(path, v, man)
    names = man["dirs"]
    if prune is not None:
        preds = prune if isinstance(prune[0], (list, tuple)) \
            else [prune]
        names, _ = prune_plan(path, v, list(preds))
        if not names:
            names = man["dirs"][:1]
            return _read_dirs(spark, path, names, man).limit(0)
    # one multi-path scan, not a union chain: a long-appended table
    # (thousands of commits) stays a single FileScan node
    df = _read_dirs(spark, path, names, man)
    dv = man.get("dv") or []
    if dv:
        # deletion vectors: broadcast anti-join per DV commit — a
        # DV-free table (the common case) takes the bare scan above
        df = _apply_dv(spark, path, df, dv)
    return df


def snapshot_sql(spark: SparkSession, path: str, view_name: str,
                 version: int | None = None,
                 prune: tuple | list | None = None,
                 as_of_ts=None) -> str:
    """SQL front-end for versioned reads: register
    ``snapshot(path, version=|as_of_ts=)`` as a TEMP VIEW so SQL-text
    consumers reach time travel the way ``sql_bi_view`` reaches the
    BI view — ``SELECT ... FROM <view_name>`` is the engine's
    ``SELECT ... FROM t VERSION AS OF v`` / ``TIMESTAMP AS OF ts``.
    The view captures the RESOLVED manifest's dir list at
    registration (snapshot isolation: later commits never leak in),
    stays lazy (no materialization — Catalyst plans through it, so
    filters still push into the parquet scan), and re-registering the
    name repoints it.  Returns ``view_name`` for call chaining.
    Reference parity: the reference's consumers are T-SQL views over
    Synapse tables (sql/batchELT/bi/20_bi_views.sql); this is the
    same surface over a pinned table version."""
    snapshot(spark, path, version=version, prune=prune,
             as_of_ts=as_of_ts).createOrReplaceTempView(view_name)
    return view_name


def history_sql(spark: SparkSession, path: str, view_name: str,
                limit: int | None = None) -> str:
    """SQL front-end for the table-history audit view: register
    :func:`history` as a TEMP VIEW so SQL-text consumers reach
    ``DESCRIBE HISTORY`` the way ``snapshot_sql`` reaches versioned
    reads — the reference's ops run-log consumers are T-SQL
    (sql/batchELT/staging/stg_logrun.sql,
    sql/batchELT/obs/70_obs_run_log.sql), and this is that surface
    over the manifest log.  The view holds the history AS OF
    registration (one tiny driver-side frame — O(versions) manifest
    JSON reads, no data scan at any table size); re-register to
    refresh after new commits.  Returns ``view_name`` for
    chaining."""
    history(spark, path, limit=limit) \
        .createOrReplaceTempView(view_name)
    return view_name


def describe_detail_sql(spark: SparkSession, path: str,
                        view_name: str,
                        version: int | None = None) -> str:
    """SQL front-end for :func:`describe_detail` — ``DESCRIBE
    DETAIL`` as a one-row TEMP VIEW (table layout, size, row count,
    declared properties), the same T-SQL-consumer contract as
    :func:`history_sql`.  Manifest metadata only at registration
    (file/byte totals come from the manifest's commit-time records);
    re-register to refresh.  Returns ``view_name``."""
    describe_detail(spark, path, version=version) \
        .createOrReplaceTempView(view_name)
    return view_name


def change_feed_sql(spark: SparkSession, path: str, view_name: str,
                    from_version: int | None = None,
                    to_version: int | None = None,
                    key_cols: list[str] | None = None,
                    from_ts=None, to_ts=None) -> str:
    """SQL front-end for the change-data-feed — Delta's
    ``table_changes('t', from, to)`` TVF as a TEMP VIEW, completing
    the SQL surface family (snapshot_sql / history_sql /
    describe_detail_sql): ``SELECT ... FROM <view_name>`` serves the
    classified row deltas (``_change_type`` ∈ insert / delete /
    update_preimage / update_postimage) between two committed
    versions or instants.  The view stays LAZY — change_feed is a
    DataFrame plan (dir-set diff + exceptAlls + DV pair deltas), so
    Catalyst plans through the view and endpoint resolution happens
    at registration (the endpoints are pinned, later commits never
    leak in).  Returns ``view_name`` for chaining."""
    change_feed(spark, path, from_version=from_version,
                to_version=to_version, key_cols=key_cols,
                from_ts=from_ts, to_ts=to_ts) \
        .createOrReplaceTempView(view_name)
    return view_name


def _read_dirs(spark: SparkSession, path: str, names: list[str],
               man: dict) -> DataFrame:
    """Scan manifest dirs under the manifest-recorded table schema
    when present: an explicit read schema makes columns added by
    later commits null-backfill over pre-evolution dirs (and old
    narrower int files upcast), where the multi-path parquet default
    would silently take the FIRST dir's schema and drop them.
    Manifests from before schema recording read as before."""
    dirs = [os.path.join(path, d) for d in names]
    sch = man.get("schema")
    if sch:
        from pyspark.sql.types import StructType

        st = StructType.fromJson(json.loads(sch))
        return spark.read.schema(st).parquet(*dirs)
    return spark.read.parquet(*dirs)


def _dir_col():
    """Owning-dir tag for a multi-path scan: input_file_name()'s URI
    with the scheme stripped and the final /part-file dropped.  Still
    percent-ENCODED (decode driver-side with urllib.parse.unquote
    when comparing to os paths, or compare against encoded names)."""
    return F.regexp_replace(
        F.regexp_replace(F.input_file_name(),
                         r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "/"),
        r"/[^/]*$", "")


def _dir_col_decoded():
    """_dir_col() percent-DECODED executor-side (the on-disk dir
    path, byte-equal to what os.path sees), so dir comparisons work
    for table paths and partition values with spaces/non-ASCII.
    java.net.URLDecoder is form-decoding ('+' → space), so literal
    '+' is pre-escaped to %2B first — the same unquote-not-
    unquote_plus rule the driver-side decodes follow."""
    return F.call_function(
        "reflect", F.lit("java.net.URLDecoder"), F.lit("decode"),
        F.regexp_replace(_dir_col(), r"\+", "%2B"), F.lit("UTF-8"))


DV_MAX_KEYS = 100_000
# delete_keys folds a same-key_cols tombstone chain into one store
# once it would exceed this many live entries — every snapshot read
# pays one broadcast anti-join per live store, so the chain length
# (not the tombstone bytes) is what must stay bounded between
# compactions
DV_COALESCE_LIVE_STORES = 8


def _dv_store_dir(path: str, store: str) -> str:
    return os.path.join(_txn_dir(path), "dv", store)


def _claim_dv_store(path: str, version: int) -> str:
    """Claim a UNIQUE tombstone store dir for this commit ATTEMPT
    (atomic mkdir, suffix bumped on collision) — a deterministic
    per-version name would let a racing loser overwrite the bytes
    the winner's already-published manifest references, the exact
    clobber _claim_data_dir exists to prevent for data dirs.  A
    loser's orphan store is unreferenced and vacuumed later."""
    os.makedirs(os.path.join(_txn_dir(path), "dv"), exist_ok=True)
    i = 0
    while True:
        cand = f"dv-v{version:08d}-{i:04d}"
        try:
            os.mkdir(_dv_store_dir(path, cand))
            return cand
        except FileExistsError:
            i += 1


def _apply_dv(spark: SparkSession, path: str, df: DataFrame,
              dv_entries: list[dict],
              keep_dir: bool = False) -> DataFrame:
    """Apply deletion-vector tombstones to a manifest-dirs scan: one
    broadcast LEFT ANTI join per DV commit, matching on (OWNING DIR,
    key) — the dir scope is what makes delete-then-reinsert correct
    (a later commit's dir is never listed in an older tombstone).
    Tombstone stores are KB-to-MB-scale by the DV_MAX_KEYS contract,
    so the anti-joins broadcast and stay map-side at any table size.
    An existing ``__dir`` tag is reused (input_file_name() cannot be
    re-derived after a join introduces a second file source)."""
    # both sides of the dir match use the DECODED on-disk path form
    # (tombstones record the decoded rel name at delete time), so
    # table paths and partition values with spaces/non-ASCII compare
    # byte-equal — the same normalization the driver-side decodes use
    tagged = df if "__dir" in df.columns \
        else df.withColumn("__dir", _dir_col_decoded())
    base = os.path.abspath(path)
    for e in dv_entries:
        store = spark.read.parquet(_dv_store_dir(path, e["store"]))
        tomb = store.select(
            F.concat(F.lit(base + "/"),
                     F.col("__dv_dir")).alias("__dv_abs"),
            *[F.col(k).alias(f"__dv_{k}") for k in e["key_cols"]])
        cond = F.col("__dir") == F.col("__dv_abs")
        for k in e["key_cols"]:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__dv_{k}"))
        tagged = tagged.join(F.broadcast(tomb), cond, "left_anti")
    return tagged if keep_dir else tagged.drop("__dir")


def _filter_dv(dv_entries: list[dict],
               surviving_dirs: list[str]) -> list[dict]:
    """Scope DV entries to the dirs still present in a new manifest:
    a rewritten/dropped dir's tombstone contribution goes with it
    (its replacement bytes already exclude the deleted rows)."""
    live = set(surviving_dirs)
    out = []
    for e in dv_entries:
        dirs = {d: n for d, n in e.get("dirs", {}).items()
                if d in live}
        if dirs:
            out.append({**e, "dirs": dirs})
    return out


def _append_dv_entry(spark: SparkSession, path: str, version: int,
                     dv: list[dict], pairs: DataFrame,
                     key_cols: list[str],
                     per_dir: dict) -> tuple[list[dict], dict]:
    """Write ``pairs`` ((__dv_dir, *key_cols) rows) as a tombstone
    store and append its entry to ``dv`` — the shared tail of
    delete_keys and delete_where's DV lane.  Bounds the live-store
    CHAIN: _apply_dv adds one broadcast anti-join per listed store,
    so N chatty deletes before a compact would put N joins in every
    snapshot read; once the same-key_cols chain reaches
    DV_COALESCE_LIVE_STORES it folds (plus the new pairs) into ONE
    store — never more broadcast bytes than the N separate stores
    summed (the pairs are disjoint: each delete applies the live DVs
    before tombstoning), but one join instead of N.
    compact()/zorder stay the real materialization.  Returns the
    updated (dv, per_dir) — per_dir absorbs folded entries' per-dir
    deleted-row counts so metadata_count stays exact."""
    same = [e for e in dv if e["key_cols"] == list(key_cols)]
    if len(same) >= DV_COALESCE_LIVE_STORES:
        for e in same:
            pairs = pairs.unionByName(
                spark.read.parquet(
                    _dv_store_dir(path, e["store"]))
                .select("__dv_dir", *key_cols))
        merged: dict = {}
        for e in same:
            for d, n in e["dirs"].items():
                merged[d] = merged.get(d, 0) + n
        for d, n in per_dir.items():
            merged[d] = merged.get(d, 0) + n
        per_dir = merged
        dv = [e for e in dv if e["key_cols"] != list(key_cols)]
    store_name = _claim_dv_store(path, version)
    (pairs.distinct()
     .write.mode("overwrite").parquet(
         _dv_store_dir(path, store_name)))
    dv = list(dv)
    dv.append({"store": store_name,
               "key_cols": list(key_cols),
               "dirs": per_dir})
    return dv, per_dir


def delete_keys(spark: SparkSession, path: str, keys: DataFrame,
                key_cols: list[str],
                read_version: int | None = None,
                group: dict | None = None) -> int:
    """DELETE as a DELETION VECTOR commit (Delta DV shape): a small
    delete against a big table writes NO data dir — the keys' owning
    dirs are found with one tagged semi-join probe, the (dir, key)
    pairs land as a tombstone parquet store under _txn/dv/, and the
    new manifest lists the store in ``dv``; every snapshot read then
    applies it as a broadcast anti-join scoped to the listed dirs.
    Write cost is O(|keys|), not O(touched dirs) — the copy-on-write
    rewrite merge_apply pays for the same delete.  A key deleted here
    and RE-INSERTED by a later commit survives, because tombstones
    match on the owning dir and new dirs are never listed.

    Lifecycle: appends carry tombstones forward; compact() and
    optimize_zorder materialize them away (their rewrites read the
    DV-filtered snapshot and commit dv=[]); MERGE applies them before
    rewriting and carries the rest; restore/time-travel see each
    version's own dv list; vacuum GCs stores no kept manifest
    references; shallow_clone REFUSES across live DVs (compact
    first — the stores live under the SOURCE's _txn dir), while
    change_feed (r11) is DV-exact: tombstone pair-set deltas surface
    DV deletes in the feed without materializing.  Stats
    envelopes stay valid (conservative supersets); metadata_count
    subtracts each entry's recorded rows_deleted and stays exact.

    Deletes bigger than DV_MAX_KEYS distinct keys must use
    merge_apply — a tombstone that big stops broadcasting, which is
    the point of the cap.  ``read_version``: same WriteSerializable
    conflict check as merge_upsert — a commit that landed after the
    declared snapshot and touched (or might touch) these keys raises
    ConcurrentModification instead of silently tombstoning rows the
    caller never saw.  Returns the committed version.
    Reference parity: the reference DELETEs through Synapse
    (sql/batchELT/core/12_trip_clean.dedupe_load.sql's key-scoped
    maintenance); a parquet lake needs the explicit tombstone layer."""
    from functools import reduce
    from operator import and_

    if group is not None and read_version is not None:
        raise ValueError(
            "read_version inside a transaction group is not "
            "supported (see commit()); run conflict-checked deletes "
            "outside the group")
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    version = parent + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    man = _read_manifest(path, parent)
    if any(os.path.isabs(d) for d in man["dirs"]):
        # a shallow clone references the SOURCE's dirs absolutely;
        # the rel-dir tombstone math below would silently match
        # nothing — refuse like clone-of-DV does, compact resolves
        raise ValueError(
            "delete_keys on a table referencing external dirs "
            "(shallow clone): run compact() first to localize them")
    kdf = keys.select(*key_cols).distinct()
    sample = kdf.limit(DV_MAX_KEYS + 1).collect()
    if len(sample) > DV_MAX_KEYS:
        raise ValueError(
            f"delete_keys caps at {DV_MAX_KEYS} distinct keys (the "
            "tombstone must stay broadcastable); use merge_apply for "
            "bulk deletes")
    bk = spark.createDataFrame(sample, kdf.schema)
    # key-set fingerprint for the manifest op record; single-col
    # builds straight from the already-collected sample (no job),
    # multi-col needs one tiny xxhash64 job over the local frame
    if len(key_cols) == 1:
        if len(sample) <= OP_KEYS_CAP:
            vals = [_json_safe(r[0]) for r in sample]
            nn = [v for v in vals if v is not None]
            op_desc = {"kind": "raw", "vals": vals,
                       "lo": min(nn) if nn else None,
                       "hi": max(nn) if nn else None}
        else:
            nn = [_json_safe(r[0]) for r in sample
                  if r[0] is not None]
            op_desc = {"kind": "raw", "vals": None,
                       "lo": min(nn) if nn else None,
                       "hi": max(nn) if nn else None}
    else:
        op_desc = _key_set_descriptor(bk, key_cols)
    if read_version is not None:
        _check_write_conflict(path, read_version, parent, key_cols,
                              op_desc, "delete_keys")
    candidates = _probe_candidate_dirs(
        spark, path, man, bk, key_cols, parent)
    base = os.path.abspath(path)
    dv = list(man.get("dv", []))
    n_rows, per_dir = 0, {}
    if candidates:
        # null-safe semi-join: a NULL key is a legal delete target
        # (purging unkeyed rows) and _apply_dv matches it null-safely
        bprobe = F.broadcast(bk.select(
            *[F.col(k).alias(f"__k_{k}") for k in key_cols]))
        cond = reduce(and_, [F.col(k).eqNullSafe(F.col(f"__k_{k}"))
                             for k in key_cols])
        tagged = (
            _read_dirs(spark, path, candidates, man)
            .withColumn("__dir", _dir_col_decoded())
            .join(bprobe, cond, "left_semi"))
        if man.get("dv"):
            # deleting from an already-DV'd table: don't re-tombstone
            # rows an earlier vector already killed (harmless, noisy).
            # keep_dir: input_file_name can't be re-derived post-join
            tagged = _apply_dv(spark, path, tagged, man["dv"],
                               keep_dir=True)
        # per-dir deleted ROW counts (duplicate keys within a dir all
        # die) ride in the entry so metadata_count stays EXACT even
        # after a later merge rewrites some tombstoned dirs (their
        # contribution is dropped with the dir); the store holds
        # distinct (dir, key) pairs, dir names DECODED and relative —
        # the same form the manifest's dirs list uses
        hits = tagged.persist()
        try:
            rel = F.expr(f"substring(__dir, {len(base) + 2})")
            per_dir = {r["__d"]: int(r["n"])
                       for r in hits.groupBy(rel.alias("__d"))
                       .agg(F.count("*").alias("n")).collect()}
            n_rows = sum(per_dir.values())
            if n_rows:
                pairs = hits.select(
                    rel.alias("__dv_dir"), *key_cols).distinct()
                dv, per_dir = _append_dv_entry(
                    spark, path, version, dv, pairs, key_cols,
                    per_dir)
        finally:
            hits.unpersist()
    # ANALYZE records describe a dir's VISIBLE rows; a dir that just
    # gained tombstones would overreport (rows/nulls/ndv of rows
    # readers can no longer see), so its record drops — untouched
    # dirs keep theirs (metadata_count stays exact via the dv
    # subtraction; analyze has no per-row breakdown to subtract)
    kept_analyze = {d: a for d, a in man.get("analyze", {}).items()
                    if d not in per_dir}
    return _commit_manifest(
        path, version, "delete", man["dirs"],
        {"dv_rows_deleted": int(n_rows)},
        man.get("stats", {}), man.get("rows", {}),
        man.get("bloom_cols", []), man.get("schema"),
        partition_by=man.get("partition_by", []), dv=dv,
        constraints=man.get("constraints", {}),
        identity=man.get("identity"),
        analyze=kept_analyze,
        generated=man.get("generated", {}),
        group=group,
        op={"type": "delete", "key_cols": list(key_cols),
            "keys": op_desc})


_ISO_DATE_RE = None  # compiled lazily in _norm_iso_literal


def _norm_iso_literal(s: str) -> str:
    """Map a SQL date/timestamp literal into the manifest-envelope
    string domain.  Envelopes store timestamps via
    ``datetime.isoformat()`` — a 'T' separator — while SQL literals
    use a space (``'2024-01-05 23:59:59'``); since ' ' < 'T', a raw
    lexicographic compare against an envelope bound silently prunes
    dirs whose every row matches (an under-delete).  Normalizing the
    separator puts both sides in the same total order.  Non-temporal
    strings pass through untouched."""
    global _ISO_DATE_RE
    if _ISO_DATE_RE is None:
        import re as _re
        _ISO_DATE_RE = _re.compile(
            r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}")
    if _ISO_DATE_RE.match(s):
        return s.replace(" ", "T", 1)
    return s


def _env_provably_gt(a, b) -> bool:
    """``a > b`` ONLY when EVERY plausible string domain can prove
    it.  Two hazards meet here: (1) timestamp columns store
    envelopes as ``datetime.isoformat()`` ('T' separator) while SQL
    literals use a space — since ' ' < 'T' a raw compare proves
    false disjointness; (2) a STRING column may legitimately hold
    space-form values, so normalizing only one side would flip the
    bug to the other domain (the r12 self-review catch).  Resolution:
    prove in BOTH domains — the raw compare AND the compare after
    mapping each side through the same space→'T' literal
    normalization.  Whichever domain is the column's true one, its
    test keeps every dir that could match, so the conjunction is
    conservative in all of them.  ISO-date-shaped prefix pairs are
    inconclusive in either domain: a date-only literal
    ``'2024-01-05'`` semantically means midnight on a timestamp
    column but sorts BELOW every same-day isoformat bound — prefix
    falls to "can't prove" (the dir stays open; pruning may only
    widen).  A timestamp-shaped side carrying an EXPLICIT UTC offset
    (``'... 23:00:00+13:00'`` or a trailing ``Z``) is inconclusive
    outright: the offset text participates in string order while the
    semantic instant lives up to ±14 h away, so no lexicographic
    domain can prove disjointness — the dir stays open."""
    if isinstance(a, str) and isinstance(b, str):
        na, nb = _norm_iso_literal(a), _norm_iso_literal(b)
        if _tz_suffixed(a) or _tz_suffixed(b):
            return False
        if (len(a) >= 10 and len(b) >= 10
                and a[:4].isdigit() and b[:4].isdigit()
                and a[4] == "-" and b[4] == "-"
                and (na.startswith(nb) or nb.startswith(na))):
            return False
        return a > b and na > nb
    return a > b


_TZ_SUFFIX_RE = None  # compiled lazily in _tz_suffixed


def _tz_suffixed(s: str) -> bool:
    """True for a date/timestamp-shaped string whose tail carries an
    explicit UTC offset (``+HH:MM`` / ``-HH:MM`` / ``+HH`` /
    ``+HHMM``) or a trailing ``Z`` — the class of literals
    :func:`_env_provably_gt` must treat as incomparable.  The check
    requires the ISO date prefix so ordinary strings that merely end
    in 'Z' or digits never trip it (a false True only widens
    pruning; a false False is the under-delete hazard, so the tail
    patterns are deliberately broad)."""
    global _TZ_SUFFIX_RE
    if _TZ_SUFFIX_RE is None:
        import re as _re
        _TZ_SUFFIX_RE = _re.compile(
            r"^\d{4}-\d{2}-\d{2}[ T].*"
            r"(Z|[+-]\d{2}(:?\d{2})?)$")
    return bool(_TZ_SUFFIX_RE.match(s))


def _ranges_from_predicate(predicate: str) -> list[tuple]:
    """CONSERVATIVE range extraction from a predicate string for
    manifest-stats dir pruning (the automatic half of
    delete_where/update_where's ``prune=``): only a top-level AND of
    ``col <op> literal`` / ``literal <op> col`` / ``col BETWEEN a
    AND b`` / ``col IN (lit, ...)`` clauses contributes; any OR /
    NOT / unflattenable parenthesis / IS NULL bails to no pruning,
    and an unparseable AND-ed clause (or an ``IS NOT NULL``, which
    carries no range) is simply ignored — dropping a conjunct can
    only WIDEN the kept-dir set, the safe side.  String literals are
    stashed behind placeholder tokens FIRST, so quoted content
    containing AND/OR/parens can never confuse the clause split
    (a mis-split could otherwise manufacture a false range and
    under-delete).  Literals: numbers and single-quoted strings (ISO
    dates/timestamps compare lexicographically, the same normalized
    domain the manifest envelopes store via _json_safe).  IN lists
    contribute their [min, max] literal envelope; parenthesized
    pure-AND groups flatten (an OR/NOT anywhere still bails, checked
    AFTER flattening).  Equality contributes a point range;
    one-sided comparisons leave the other bound open (None).
    Returns [(col, lo, hi), ...]; [] means no pruning."""
    import re as _re

    s = predicate.strip()
    # stash string literals FIRST: everything below operates on
    # placeholder tokens, immune to quoted AND/OR/parens
    stash: list[str] = []

    def _hide(m):
        stash.append(m.group(0)[1:-1])
        return f"~L{len(stash) - 1}~"

    s = _re.sub(r"'[^']*'", _hide, s)
    if "'" in s:
        return []  # unbalanced quote: refuse to guess
    lit = r"(?:-?\d+(?:\.\d+)?|~L\d+~)"

    def _val(tok: str):
        if tok.startswith("~"):
            # RAW literal — domain normalization lives in the
            # compare (_env_provably_gt proves in both the raw and
            # the space→'T' domain), so normalizing here would
            # re-introduce the one-sided-normalization bug for
            # string columns holding space-form values
            return stash[int(tok[2:-1])]
        return float(tok) if "." in tok else int(tok)

    # IS NOT NULL conjuncts carry no range information — neutralize
    # them BEFORE the NOT bail (ignoring a conjunct only widens)
    s = _re.sub(r"\b\w+\s+IS\s+NOT\s+NULL\b", "~TRUE~", s,
                flags=_re.IGNORECASE)
    # IN lists are disjunctions of equalities on ONE column: their
    # [min, max] literal envelope bounds the clause — rewrite to
    # BETWEEN before the paren bail (conservative superset)
    def _in_to_between(m):
        vals = _re.findall(lit, m.group(2))
        if not vals:
            return m.group(0)
        try:
            lo = min(vals, key=_val)
            hi = max(vals, key=_val)
            # the [lo, hi] envelope must cover the list in EVERY
            # plausible string domain: if the space→'T' normalized
            # order picks different endpoints (mixed literal forms
            # in one IN list), no single pair covers both — leave
            # the clause unrewritten (bails to no pruning, safe)
            if isinstance(_val(lo), str):
                def _nk(t):
                    return _norm_iso_literal(_val(t))

                if (lo is not min(vals, key=_nk)
                        or hi is not max(vals, key=_nk)):
                    return m.group(0)
        except TypeError:
            return m.group(0)  # mixed literal types: leave (bails)
        return f"{m.group(1)} BETWEEN {lo} AND {hi}"

    s = _re.sub(
        rf"\b(\w+)\s+IN\s*\(\s*({lit}(?:\s*,\s*{lit})*)\s*\)",
        _in_to_between, s, flags=_re.IGNORECASE)
    # parenthesized groups containing ONLY AND-ed clauses are
    # associativity noise: flatten them (innermost-out); a group
    # hiding an OR/NOT stays parenthesized and the bail below fires
    prev = None
    while prev != s:
        prev = s
        s = _re.sub(
            r"\(([^()]*)\)",
            lambda m: (" " + m.group(1) + " ")
            if not _re.search(r"\bOR\b|\bNOT\b", m.group(1),
                              _re.IGNORECASE) else m.group(0), s)
    if _re.search(r"\(|\)|\bOR\b|\bNOT\b|\bIS\s+NULL\b", s,
                  _re.IGNORECASE):
        return []
    # protect BETWEEN's own AND before splitting conjuncts
    s = _re.sub(rf"(\bBETWEEN\s+{lit})\s+AND\s+", r"\1 ~BTW~ ", s,
                flags=_re.IGNORECASE)
    out: list[tuple] = []
    for clause in _re.split(r"\bAND\b", s, flags=_re.IGNORECASE):
        clause = clause.strip()
        m = _re.fullmatch(
            rf"(\w+)\s+BETWEEN\s+({lit})\s+~BTW~\s+({lit})",
            clause, _re.IGNORECASE)
        if m:
            lo, hi = _val(m.group(2)), _val(m.group(3))
            if type(lo) is not type(hi) and not (
                    isinstance(lo, (int, float))
                    and isinstance(hi, (int, float))):
                continue  # mixed-type bounds: ignore (widens)
            out.append((m.group(1), lo, hi))
            continue
        m = _re.fullmatch(rf"(\w+)\s*(>=|<=|=|==|>|<)\s*({lit})",
                          clause)
        if m:
            c, op, v = m.group(1), m.group(2), _val(m.group(3))
        else:
            m = _re.fullmatch(rf"({lit})\s*(>=|<=|=|==|>|<)\s*(\w+)",
                              clause)
            if not m:
                continue  # unparseable conjunct: ignore (widens)
            v, c = _val(m.group(1)), m.group(3)
            op = {">": "<", "<": ">", ">=": "<=",
                  "<=": ">="}.get(m.group(2), m.group(2))
        if op in ("=", "=="):
            out.append((c, v, v))
        elif op in (">", ">="):
            # strictness ignored: envelope pruning is inclusive
            # either way (conservative)
            out.append((c, v, None))
        else:
            out.append((c, None, v))
    return out


def _auto_prune_names(path: str, parent: int, man: dict,
                      predicate: str) -> list[str]:
    """Dir names the discovery scan must open for ``predicate``:
    manifest-envelope pruning on the ranges the predicate provably
    implies, with every failure mode falling back to all dirs."""
    ranges = [(c, lo, hi) for c, lo, hi
              in _ranges_from_predicate(predicate)
              if any(c in s for s in man.get("stats", {}).values())]
    if not ranges:
        return man["dirs"]
    stats = man.get("stats", {})
    kept = []
    for d in man["dirs"]:
        keep = True
        for c, lo, hi in ranges:
            env = stats.get(d, {}).get(c)
            if not env or env[0] is None or env[1] is None:
                continue  # no envelope: must open (conservative)
            try:
                if ((hi is not None and _env_provably_gt(env[0], hi))
                        or (lo is not None
                            and _env_provably_gt(lo, env[1]))):
                    keep = False
                    break
            except TypeError:
                continue  # cross-type literal: can't prove, open
        if keep:
            kept.append(d)
    return kept


def delete_where(spark: SparkSession, path: str, predicate: str,
                 key_cols: list[str] | None = None,
                 read_version: int | None = None,
                 prune: tuple | list | None = None) -> int:
    """Predicate-level row DELETE — ``DELETE FROM t WHERE <pred>``
    (Delta's arbitrary-predicate DELETE; reference parity: the
    delete-by-blob-predicate maintenance statement
    sql/streaming/staging/0005_delete.sql generalized from its fixed
    blob predicate to any row predicate).  SQL DELETE semantics: only
    rows where the predicate evaluates literal TRUE die; NULL keeps
    the row.

    One DISCOVERY scan finds the affected rows and their owning dirs
    (Catalyst pushes the predicate into the parquet scan, so footer
    min/max prune row groups; ``prune=(col, lo, hi)`` — or a list of
    such triples — additionally skips whole dirs via the manifest
    stats envelopes, same contract as ``snapshot(prune=)``; pruning
    a dir the predicate could match UNDER-deletes, so pass only
    ranges implied by the predicate).  Then one of two lanes:

    - **DV lane** (small delete on a big table): when ``key_cols``
      is given, the matched keys are ≤ DV_MAX_KEYS, and tombstoning
      those (dir, key) pairs would kill EXACTLY the matched rows
      (verified with one counting probe over the affected dirs — a
      non-matching row sharing a key with a matching one means the
      key under-identifies rows and forces the rewrite lane), the
      delete lands as a deletion-vector commit: no data dir written,
      O(|matched|) cost, same lifecycle as :func:`delete_keys`.
    - **Copy-on-write lane** (bulk or un-keyed): only the affected
      dirs rewrite (kept rows = predicate-false-or-null, prior DVs
      applied so tombstoned rows are not resurrected); every other
      dir carries into the new manifest untouched — cost scales with
      the touched fraction, not the table.

    A zero-match delete still commits a (content-identical) delete
    version, like ``delete_keys`` — the op record keeps declared-
    snapshot bookkeeping simple.  ``read_version``: the same
    WriteSerializable conflict matrix as merge/delete_keys, checked
    against the DISCOVERED key set when ``key_cols`` is given; with
    no key_cols the touched set is undecidable to later writers and
    this writer refuses any interleaved keyed write or replace
    (conservative both directions).  Returns the committed version."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    version = parent + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    man = _read_manifest(path, parent)
    if any(os.path.isabs(d) for d in man["dirs"]):
        raise ValueError(
            "delete_where on a table referencing external dirs "
            "(shallow clone): run compact() first to localize them")
    base = os.path.abspath(path)
    if prune is not None:
        preds = prune if isinstance(prune[0], (list, tuple)) \
            else [prune]
        names, _ = prune_plan(path, parent, list(preds))
    else:
        # automatic: ranges the predicate PROVABLY implies prune
        # dirs through the manifest envelopes (conservative parser —
        # anything unprovable opens the dir; explicit prune= hints
        # override for predicates the parser won't touch)
        names = _auto_prune_names(path, parent, man, predicate)
    pred = F.expr(predicate)
    hit_pred = F.coalesce(pred, F.lit(False))
    dv = list(man.get("dv", []))
    if names:
        # predicate FIRST, __dir tag second: the tag expressions
        # (input_file_name / reflect-decode) are NONDETERMINISTIC,
        # and Catalyst refuses to push any predicate through a
        # projection containing one — tagging first leaves the scan
        # reading every row of every file.  Filtering below the tag
        # puts the bare conjunction straight on the FileScan as
        # PushedFilters (footer min/max skip row groups).  The BARE
        # predicate, not coalesce(pred, false): WHERE already drops
        # predicate-NULL rows (same matched set) and stays pushable.
        # Plan-audited; pinned by tests/test_r11_plan_shapes.py.
        scan = (_read_dirs(spark, path, names, man)
                .where(pred)
                .withColumn("__dir", _dir_col_decoded()))
        if man.get("dv"):
            # DV after the filter: tombstone application is an
            # anti-join on (dir, key) — order with the row predicate
            # is immaterial, and the matched set stays DV-exact
            scan = _apply_dv(spark, path, scan, man["dv"],
                             keep_dir=True)
        matched = scan.persist()
    else:
        matched = None
    try:
        rel = F.expr(f"substring(__dir, {len(base) + 2})")
        per_dir = {} if matched is None else {
            r["__d"]: int(r["n"])
            for r in matched.groupBy(rel.alias("__d"))
            .agg(F.count("*").alias("n")).collect()}
        n_rows = sum(per_dir.values())
        affected = sorted(per_dir)
        if key_cols and matched is not None:
            op_desc = _key_set_descriptor(matched, key_cols)
            op_kc = list(key_cols)
        else:
            # no key identity declared: later declared-snapshot
            # writers see key_cols=[] / keys={} and refuse
            # (undecidable — the conservative side)
            op_desc, op_kc = {}, list(key_cols or [])
        if read_version is not None:
            _check_write_conflict(path, read_version, parent,
                                  op_kc, op_desc, "delete_where")
        carry = dict(
            partition_by=man.get("partition_by", []),
            constraints=man.get("constraints", {}),
            identity=man.get("identity"),
            generated=man.get("generated", {}))
        op = {"type": "delete", "key_cols": op_kc, "keys": op_desc}
        if n_rows == 0:
            return _commit_manifest(
                path, version, "delete", man["dirs"],
                {"predicate": predicate, "dv_rows_deleted": 0,
                 "lane": "noop"},
                man.get("stats", {}), man.get("rows", {}),
                man.get("bloom_cols", []), man.get("schema"),
                dv=dv, analyze=man.get("analyze", {}),
                op=op, **carry)
        use_dv, pairs = False, None
        if key_cols:
            # cardinality gate only — count the capped distinct set
            # instead of collecting 100k+1 key ROWS to the driver
            # just to take len() (guide §5: the driver does no data
            # work; matched is persisted so this is a cheap pass)
            n_keys = (matched.select(*key_cols).distinct()
                      .limit(DV_MAX_KEYS + 1).count())
            if n_keys <= DV_MAX_KEYS:
                pairs = matched.select(
                    rel.alias("__dv_dir"), *key_cols).distinct()
                # SAFETY PROBE: a key tombstone kills EVERY row
                # sharing (dir, key), not just predicate matches —
                # count the rows the tombstone would kill and take
                # the DV lane only when that equals the matched
                # count (per-dir counts then match too: would-die
                # covers matched per dir, so equal totals force
                # equality everywhere)
                bpairs = F.broadcast(pairs.select(
                    F.concat(F.lit(base + "/"), F.col("__dv_dir"))
                    .alias("__t_abs"),
                    *[F.col(k).alias(f"__t_{k}")
                      for k in key_cols]))
                cond = F.col("__dir") == F.col("__t_abs")
                for k in key_cols:
                    cond = cond & F.col(k).eqNullSafe(
                        F.col(f"__t_{k}"))
                aff_scan = (_read_dirs(spark, path, affected, man)
                            .withColumn("__dir", _dir_col_decoded()))
                if man.get("dv"):
                    aff_scan = _apply_dv(spark, path, aff_scan,
                                         man["dv"], keep_dir=True)
                would_die = aff_scan.join(
                    bpairs, cond, "left_semi").count()
                use_dv = would_die == n_rows
        if use_dv:
            dv, per_dir_m = _append_dv_entry(
                spark, path, version, dv, pairs, key_cols, per_dir)
            # same ANALYZE rule as delete_keys: a dir that gained
            # tombstones would overreport visible rows — drop its
            # record, untouched dirs keep theirs
            kept_analyze = {
                d: a for d, a in man.get("analyze", {}).items()
                if d not in per_dir_m}
            return _commit_manifest(
                path, version, "delete", man["dirs"],
                {"predicate": predicate,
                 "dv_rows_deleted": int(n_rows), "lane": "dv"},
                man.get("stats", {}), man.get("rows", {}),
                man.get("bloom_cols", []), man.get("schema"),
                dv=dv, analyze=kept_analyze, op=op, **carry)
        # COPY-ON-WRITE lane: rewrite ONLY the affected dirs minus
        # their matching rows; everything else carries untouched
        existing = (_read_dirs(spark, path, affected, man)
                    .withColumn("__dir", _dir_col_decoded()))
        if man.get("dv"):
            existing = _apply_dv(spark, path, existing, man["dv"],
                                 keep_dir=True)
        kept = existing.where(~hit_pred).drop("__dir")
        data_dir = _claim_data_dir(path, version)
        name = os.path.basename(data_dir)
        pby = man.get("partition_by", [])
        stats = man.get("stats", {})
        bcols = man.get("bloom_cols", [])
        stat_cols = sorted({c for s in stats.values() for c in s})
        new_stats, new_rows_map = {}, {}
        bloom_pre: dict = {}
        if pby:
            new_names, new_stats, new_rows_map, bloom_pre = \
                _write_partitioned(spark, path, data_dir, kept, pby,
                                   stat_cols, bloom_cols=bcols)
        else:
            # envelopes + bloom bitmaps ride the write job itself
            # (same one-pass rule as commit/merge; _observed_write)
            new_stats, new_rows_map, bodies, _ = _observed_write(
                spark, path, data_dir, kept, stat_cols, bcols)
            new_names = [name]
            if bodies:
                bloom_pre = {name: bodies}
        gone = set(affected)
        dirs = [d for d in man["dirs"] if d not in gone] + new_names
        kept_stats = {d: s for d, s in stats.items() if d in dirs}
        kept_stats.update(new_stats)
        kept_rows = {d: n for d, n in man.get("rows", {}).items()
                     if d in dirs}
        kept_rows.update(new_rows_map)
        v = _commit_manifest(
            path, version, "delete", dirs,
            {"predicate": predicate, "rewrote": affected,
             "rows_deleted": int(n_rows), "lane": "rewrite"},
            kept_stats, kept_rows, bcols, man.get("schema"),
            dv=_filter_dv(dv, dirs),
            analyze={d: a for d, a in man.get("analyze", {}).items()
                     if d in dirs},
            op=op, **carry)
        _maintain_bloom(spark, path, v, bcols, new_names,
                        precomputed=bloom_pre)
        return v
    finally:
        if matched is not None:
            matched.unpersist()


def update_where(spark: SparkSession, path: str, predicate: str,
                 set_exprs: dict[str, str],
                 key_cols: list[str] | None = None,
                 read_version: int | None = None,
                 prune: tuple | list | None = None) -> int:
    """Predicate-level row UPDATE — ``UPDATE t SET c = expr WHERE
    <pred>`` (Delta's arbitrary-predicate UPDATE; reference parity:
    the slice-correction maintenance the reference runs through
    Synapse UPDATEs on trip_clean,
    sql/batchELT/core/12_trip_clean.dedupe_load.sql's key-scoped
    restatements).  SQL UPDATE semantics: rows where the predicate is
    literal TRUE take the SET expressions (evaluated SIMULTANEOUSLY
    against the pre-update row, standard UPDATE assignment); NULL or
    false leaves the row untouched.

    Same discovery-scan-then-two-lanes shape as :func:`delete_where`:

    - **DV update lane** (small update on a big table — what Delta
      does with deletion vectors enabled): when ``key_cols`` is
      given, the matched keys pass the DV cap AND the counting
      safety probe (the (dir, key) tombstones must kill EXACTLY the
      matched rows), ONE commit tombstones the old row versions and
      appends a fresh dir holding just the UPDATED rows — cost
      O(|matched|), not O(affected dirs); visible row count is
      unchanged by construction and metadata_count stays exact
      (added rows == tombstoned rows).
    - **Copy-on-write lane** otherwise: only the affected dirs
      rewrite, each row mapped through ``CASE WHEN pred THEN expr
      ELSE col END`` in one projection; every other dir carries.

    ``set_exprs`` may only name existing non-generated, non-identity
    columns (generated columns are recomputed from their declared
    expressions on the updated rows — so a SET touching a generated
    column's SOURCE keeps the stored value consistent; identity
    values ride along unchanged, the stable surrogate key).  CHECK
    constraints validate the updated rows before publish, exactly
    like MERGE.  ``read_version``: the WriteSerializable matrix on
    the DISCOVERED key set (op type ``merge`` — an update is a keyed
    rewrite to later writers).  Returns the committed version."""
    _settle_stale_groups(path)
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no committed version under {path}")
    version = parent + 1
    if os.path.exists(_manifest_path(path, version)):
        raise TxnConflict(f"version {version} already committed")
    man = _read_manifest(path, parent)
    if any(os.path.isabs(d) for d in man["dirs"]):
        raise ValueError(
            "update_where on a table referencing external dirs "
            "(shallow clone): run compact() first to localize them")
    gen = man.get("generated", {})
    ident = man.get("identity") or {}
    for c in set_exprs:
        if c in gen:
            raise ValueError(
                f"column '{c}' is GENERATED ALWAYS AS — the engine "
                "recomputes it from its expression; SET its source "
                "columns instead")
        if c == ident.get("col"):
            raise ValueError(
                f"identity column '{c}' is GENERATED ALWAYS: "
                "updates keep the matched row's id")
    base = os.path.abspath(path)
    if prune is not None:
        preds = prune if isinstance(prune[0], (list, tuple)) \
            else [prune]
        names, _ = prune_plan(path, parent, list(preds))
    else:
        # automatic: ranges the predicate PROVABLY implies prune
        # dirs through the manifest envelopes (conservative parser —
        # anything unprovable opens the dir; explicit prune= hints
        # override for predicates the parser won't touch)
        names = _auto_prune_names(path, parent, man, predicate)
    pred = F.expr(predicate)
    hit_pred = F.coalesce(pred, F.lit(False))
    dv = list(man.get("dv", []))

    def _check_set_cols(cols: list[str]) -> None:
        missing = sorted(set(set_exprs) - set(cols))
        if missing:
            raise ValueError(
                f"SET names columns not in the table: {missing}")

    def _apply_set(df: DataFrame, everywhere: bool) -> DataFrame:
        """One projection = simultaneous assignment from the
        pre-update row; ``everywhere`` skips the per-row CASE when
        the frame holds only matched rows (DV lane)."""
        cols = [c for c in df.columns if c != "__dir"]
        _check_set_cols(cols)
        out = []
        for c in cols:
            if c in set_exprs:
                e = F.expr(set_exprs[c]).cast(df.schema[c].dataType)
                out.append((e if everywhere
                            else F.when(hit_pred, e)
                            .otherwise(F.col(c))).alias(c))
            else:
                out.append(F.col(c))
        res = df.select(*out)
        if gen:
            # recompute generated columns from their declared
            # expressions so a SET on a source column can't leave a
            # stale stored value (deterministic exprs: untouched
            # rows recompute to their existing values)
            res = _compute_generated(res.drop(*gen.keys()), gen)
        return res

    if names:
        # predicate FIRST, __dir tag second: the tag expressions
        # (input_file_name / reflect-decode) are NONDETERMINISTIC,
        # and Catalyst refuses to push any predicate through a
        # projection containing one — tagging first leaves the scan
        # reading every row of every file.  Filtering below the tag
        # puts the bare conjunction straight on the FileScan as
        # PushedFilters (footer min/max skip row groups).  The BARE
        # predicate, not coalesce(pred, false): WHERE already drops
        # predicate-NULL rows (same matched set) and stays pushable.
        # Plan-audited; pinned by tests/test_r11_plan_shapes.py.
        scan = (_read_dirs(spark, path, names, man)
                .where(pred)
                .withColumn("__dir", _dir_col_decoded()))
        if man.get("dv"):
            # DV after the filter: tombstone application is an
            # anti-join on (dir, key) — order with the row predicate
            # is immaterial, and the matched set stays DV-exact
            scan = _apply_dv(spark, path, scan, man["dv"],
                             keep_dir=True)
        matched = scan.persist()
    else:
        matched = None
    try:
        rel = F.expr(f"substring(__dir, {len(base) + 2})")
        per_dir = {} if matched is None else {
            r["__d"]: int(r["n"])
            for r in matched.groupBy(rel.alias("__d"))
            .agg(F.count("*").alias("n")).collect()}
        n_rows = sum(per_dir.values())
        affected = sorted(per_dir)
        if key_cols and matched is not None:
            if set(set_exprs) & set(key_cols):
                # SET rewrites a key column: the commit touches BOTH
                # the pre-update key values (rows leaving them) and
                # the post-update ones (rows arriving at them).  A
                # descriptor holding only the pre-set would let a
                # later declared-snapshot writer on the NEW values
                # prove disjointness and silently last-wins over this
                # update — record the union (matched is persisted, so
                # the post-image projection is one cheap pass; cap
                # overflow degrades to the envelope, conservative)
                post = _apply_set(matched.drop("__dir"),
                                  everywhere=True)
                op_desc = _key_set_descriptor(
                    matched.select(*key_cols)
                    .unionByName(post.select(*key_cols)), key_cols)
            else:
                op_desc = _key_set_descriptor(matched, key_cols)
            op_kc = list(key_cols)
        else:
            op_desc, op_kc = {}, list(key_cols or [])
        if read_version is not None:
            _check_write_conflict(path, read_version, parent,
                                  op_kc, op_desc, "update_where")
        carry = dict(
            partition_by=man.get("partition_by", []),
            constraints=man.get("constraints", {}),
            identity=man.get("identity"),
            generated=gen)
        op = {"type": "merge", "key_cols": op_kc, "keys": op_desc}
        cons = man.get("constraints", {})
        if n_rows == 0:
            # still verify the SET names resolve (a typo'd no-op
            # UPDATE should fail loudly, not silently succeed)
            if man.get("schema"):
                _check_set_cols([f["name"] for f in json.loads(
                    man["schema"])["fields"]])
            return _commit_manifest(
                path, version, "update", man["dirs"],
                {"predicate": predicate, "rows_updated": 0,
                 "lane": "noop"},
                man.get("stats", {}), man.get("rows", {}),
                man.get("bloom_cols", []), man.get("schema"),
                dv=dv, analyze=man.get("analyze", {}),
                op=op, **carry)
        use_dv, pairs = False, None
        if key_cols:
            # cardinality gate only — a count moves zero rows to the
            # driver where the collect moved up to 100k+1 (guide §5)
            n_keys = (matched.select(*key_cols).distinct()
                      .limit(DV_MAX_KEYS + 1).count())
            if n_keys <= DV_MAX_KEYS:
                pairs = matched.select(
                    rel.alias("__dv_dir"), *key_cols).distinct()
                # same safety probe as delete_where: the tombstones
                # must kill exactly the matched rows, or the update
                # would silently DELETE non-matching key-sharers
                bpairs = F.broadcast(pairs.select(
                    F.concat(F.lit(base + "/"), F.col("__dv_dir"))
                    .alias("__t_abs"),
                    *[F.col(k).alias(f"__t_{k}")
                      for k in key_cols]))
                cond = F.col("__dir") == F.col("__t_abs")
                for k in key_cols:
                    cond = cond & F.col(k).eqNullSafe(
                        F.col(f"__t_{k}"))
                aff_scan = (_read_dirs(spark, path, affected, man)
                            .withColumn("__dir", _dir_col_decoded()))
                if man.get("dv"):
                    aff_scan = _apply_dv(spark, path, aff_scan,
                                         man["dv"], keep_dir=True)
                would_die = aff_scan.join(
                    bpairs, cond, "left_semi").count()
                use_dv = would_die == n_rows
        data_dir = _claim_data_dir(path, version)
        name = os.path.basename(data_dir)
        pby = man.get("partition_by", [])
        stats = man.get("stats", {})
        bcols = man.get("bloom_cols", [])
        stat_cols = sorted({c for s in stats.values() for c in s})
        if use_dv:
            # DV update lane: tombstone the old row versions, land
            # ONLY the updated rows in the fresh dir — one atomic
            # manifest carries both sides
            payload = _apply_set(matched.drop("__dir"),
                                 everywhere=True)
            rewrote: list[str] = []
        else:
            existing = (_read_dirs(spark, path, affected, man)
                        .withColumn("__dir", _dir_col_decoded()))
            if man.get("dv"):
                existing = _apply_dv(spark, path, existing,
                                     man["dv"], keep_dir=True)
            payload = _apply_set(existing, everywhere=False)
            rewrote = affected
        new_stats, new_rows_map = {}, {}
        bloom_pre: dict = {}
        obs_checks: dict = {}
        obs_viol: dict = {}
        gchecks = _generated_checks(gen) if gen else {}
        if pby:
            new_names, new_stats, new_rows_map, bloom_pre = \
                _write_partitioned(spark, path, data_dir, payload,
                                   pby, stat_cols, bloom_cols=bcols)
        else:
            # envelopes + bloom bitmaps + CHECK/generated validation
            # ride the write job (see commit(); one job instead of
            # write + read-backs)
            obs_checks = _checks_resolvable(
                payload, {**cons, **gchecks})
            new_stats, new_rows_map, bodies, obs_viol = \
                _observed_write(spark, path, data_dir, payload,
                                stat_cols, bcols, checks=obs_checks)
            new_names = [name]
            if bodies:
                bloom_pre = {name: bodies}
        if cons:
            # only the updated rows can newly violate — but the
            # written dir is the validation unit, same as MERGE
            bad = {k: obs_viol[k] for k in sorted(cons)
                   if obs_viol.get(k)}
            if bad:
                raise ConstraintViolation(path, bad)
            pending = {k: sql for k, sql in cons.items()
                       if k not in obs_checks}
            if pending:
                _validate_constraints(
                    spark, path, new_names, pending,
                    man={"schema": man.get("schema")})
        if gen:
            gbad = {k: obs_viol[k] for k in sorted(gchecks)
                    if obs_viol.get(k)}
            if gbad:
                raise ConstraintViolation(path, gbad)
            gpending = {k: sql for k, sql in gchecks.items()
                        if k not in obs_checks}
            if gpending:
                _validate_constraints(
                    spark, path, new_names, gpending,
                    man={"schema": man.get("schema")})
        if use_dv:
            dv, per_dir_m = _append_dv_entry(
                spark, path, version, dv, pairs, key_cols, per_dir)
            dirs = list(man["dirs"]) + new_names
            kept_analyze = {
                d: a for d, a in man.get("analyze", {}).items()
                if d not in per_dir_m}
            lane = "dv"
        else:
            gone = set(affected)
            dirs = [d for d in man["dirs"]
                    if d not in gone] + new_names
            dv = _filter_dv(dv, dirs)
            kept_analyze = {
                d: a for d, a in man.get("analyze", {}).items()
                if d in dirs}
            lane = "rewrite"
        kept_stats = {d: s for d, s in stats.items() if d in dirs}
        kept_stats.update(new_stats)
        kept_rows = {d: n for d, n in man.get("rows", {}).items()
                     if d in dirs}
        kept_rows.update(new_rows_map)
        v = _commit_manifest(
            path, version, "update", dirs,
            {"predicate": predicate, "rewrote": rewrote,
             "rows_updated": int(n_rows), "lane": lane},
            kept_stats, kept_rows, bcols, man.get("schema"),
            dv=dv, analyze=kept_analyze, op=op, **carry)
        _maintain_bloom(spark, path, v, bcols, new_names,
                        precomputed=bloom_pre)
        return v
    finally:
        if matched is not None:
            matched.unpersist()


def _repair_member_markers(gid: str, members: list) -> bool:
    """Pre-GC repair for a COMMITTED group record about to be
    retired: every member table whose RETAINED manifests still
    reference ``gid`` must carry its OWN decision mirror
    (``_txn/groups/<gid>.decided.json``) before the record holding
    the decision is deleted — otherwise that member's committed
    version would read pending and eventually be settle-aborted.
    Probes each member's manifest listing (O(retained manifests),
    only on the rare retire-a-group path); an unreadable manifest is
    conservatively assumed to reference the group.  Returns False
    when any repair could not be completed — the caller then keeps
    the record file."""
    ok = True
    for m in members:
        try:
            mk = os.path.join(_txn_dir(m), "groups",
                              f"{gid}.decided.json")
            if os.path.isfile(mk):
                continue
            refs = False
            d = _txn_dir(m)
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if not (f.startswith("v") and f.endswith(".json")):
                        continue
                    try:
                        with open(os.path.join(d, f)) as fh:
                            man = json.load(fh)
                    except (OSError, ValueError):
                        refs = True  # torn/unreadable: could
                        break        # reference the group — repair
                    if (man.get("group") or {}).get("id") == gid:
                        refs = True
                        break
            if not refs:
                continue  # nothing resolves through this member
            os.makedirs(os.path.dirname(mk), exist_ok=True)
            tmp = f"{mk}.tmp-{os.getpid()}-{next(_TMP_SEQ)}"
            with open(tmp, "w") as fh:
                json.dump({"id": gid, "committed": True,
                           "members": list(members)}, fh)
            os.replace(tmp, mk)
        except OSError:
            ok = False  # could not prove or repair: keep the record
    return ok


def vacuum(path: str, keep_latest: int = 2,
           grace_seconds: float = 3600.0,
           dry_run: bool = False) -> list[str]:
    """Drop data dirs unreachable from the ``keep_latest`` newest
    manifests (and the older manifests themselves) — Delta VACUUM.
    Returns the removed dir names.

    ``grace_seconds`` is the retention window protecting in-flight
    writers: a dir claimed by a commit/merge whose manifest has not
    landed yet is unreachable from every manifest, and removing it
    would delete the data that writer is about to publish.  Dirs whose
    mtime is within the grace window are skipped (Delta's VACUUM
    retention check plays the same role).  Pass ``grace_seconds=0``
    only when no writer can be concurrent.

    ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``) reports exactly
    what a real run would reclaim — same walks, same grace checks —
    WITHOUT deleting anything: audit the blast radius first, then
    run for real."""
    import time

    latest = latest_version(path)
    if latest is None:
        return []
    keep_versions = [v for v in range(latest + 1)
                     if v > latest - keep_latest]
    live: set[str] = set()
    for v in keep_versions:
        live |= set(_read_manifest(path, v)["dirs"])
    now = time.time()
    removed = []
    for entry in sorted(os.listdir(path)):
        # a manifest may reference a SUBDIR of a claimed dir (one
        # entry per Z-bucket after optimize_zorder) — the top-level
        # dir stays protected while any subpath of it is live
        if entry.startswith("data-v") and entry not in live and \
                not any(d.startswith(entry + "/") for d in live):
            full = os.path.join(path, entry)
            if not os.path.isdir(full):
                continue  # stray data-v*-named FILE is not ours to GC
            if now - os.path.getmtime(full) < grace_seconds:
                continue  # possibly an in-flight writer's claim
            if not dry_run:
                shutil.rmtree(full)
            removed.append(entry)
    # leaf-grain GC: a partitioned MERGE (or zorder) rewrites SOME
    # leaves of a claimed dir — the replaced leaf becomes unreachable
    # while its siblings stay live, so the whole-tree loop above must
    # keep the top-level dir and the dead leaf would leak forever.
    # Walk each partially-live tree bottom-up and drop subdirs with
    # no live path at or below them (same grace rule; bottom-up so a
    # dead parent whose dead leaves were just removed goes too).
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("data-v") or entry in live:
            continue
        full = os.path.join(path, entry)
        if not os.path.isdir(full):
            continue
        if not any(d.startswith(entry + "/") for d in live):
            continue  # fully-dead tree: handled (or grace-kept) above
        # snapshot mtimes BEFORE removing anything: rmtree of a child
        # bumps the parent's mtime, which would make a dead parent
        # look freshly written and survive its own grace check
        walk = [(root, os.path.getmtime(root))
                for root, _, _ in os.walk(full, topdown=False)]
        for root, mtime in walk:
            if not os.path.isdir(root):
                continue  # removed along with a dead parent
            rel = os.path.relpath(root, path)
            if rel == entry:
                continue  # the claimed dir itself stays (has live leaves)
            if any(d == rel or d.startswith(rel + "/") for d in live):
                continue
            if now - mtime < grace_seconds:
                continue
            if not dry_run:
                shutil.rmtree(root)
            removed.append(rel)
    for v in range(latest + 1):
        if v not in keep_versions:
            m = _manifest_path(path, v)
            if os.path.exists(m) and not dry_run:
                os.remove(m)
    # GC deletion-vector stores no kept manifest references (same
    # grace rule: a store written by an in-flight delete_keys whose
    # manifest has not landed yet must survive)
    dv_root = os.path.join(_txn_dir(path), "dv")
    if os.path.isdir(dv_root):
        live_stores = {e["store"] for v2 in keep_versions
                       for e in _read_manifest(path, v2).get("dv", [])}
        for entry in sorted(os.listdir(dv_root)):
            full = os.path.join(dv_root, entry)
            if entry in live_stores or not os.path.isdir(full):
                continue
            if now - os.path.getmtime(full) < grace_seconds:
                continue
            if not dry_run:
                shutil.rmtree(full)
            removed.append(f"_txn/dv/{entry}")
    # GC per-table ANN codebook artifacts (operators/clustering.py
    # fit_centroids_txn stores them under _txn/codebooks named
    # codebook-v{version}-{hash}.json): an artifact indexing a
    # version whose manifest this vacuum drops is dead — the
    # snapshot it was trained on is no longer readable (same grace
    # rule for an in-flight trainer's fresh write)
    cb_root = os.path.join(_txn_dir(path), "codebooks")
    if os.path.isdir(cb_root):
        import re as _re

        for entry in sorted(os.listdir(cb_root)):
            # \d+ not \d{8}: _artifact_path formats {version:08d},
            # which grows past 8 digits at version >= 10^8 — a fixed
            # width would leak those artifacts forever (r9 ADVICE)
            m = _re.match(r"codebook-v(\d+)-", entry)
            if not m or int(m.group(1)) in keep_versions:
                continue
            full = os.path.join(cb_root, entry)
            if not os.path.isfile(full):
                continue
            if now - os.path.getmtime(full) < grace_seconds:
                continue
            if not dry_run:
                os.unlink(full)
            removed.append(f"_txn/codebooks/{entry}")
    # GC multi-table transaction-group bookkeeping (coordinator
    # records + per-member decision markers under _txn/groups): the
    # per-micro-batch group sink (streaming/lane.py run_group_sink)
    # writes two tiny files per batch that would otherwise accumulate
    # forever.  A file whose gid is still referenced by any KEPT
    # manifest stays — readers resolve those versions' visibility
    # through it.  For unreferenced files past the grace window:
    # aborted records delete freely (the aborted member manifests
    # were already cleared at settle — nothing resolves through
    # them); committed records first REPAIR every member's own
    # decision mirror (a member manifest in ANOTHER table may still
    # reference the gid with its mirror lost to a crash mid-mirror —
    # deleting the only surviving commit evidence would flip that
    # member committed → pending → settle-aborted, silently losing
    # durably committed history), then delete; records without a
    # member list (pre-r11 format) are kept, conservative.
    groups_root = os.path.join(_txn_dir(path), "groups")
    if os.path.isdir(groups_root):
        live_gids = set()
        for v2 in keep_versions:
            gref = _read_manifest(path, v2).get("group") or {}
            if gref.get("id"):
                live_gids.add(gref["id"])
        for entry in sorted(os.listdir(groups_root)):
            full = os.path.join(groups_root, entry)
            gid = entry.split(".", 1)[0]
            if gid in live_gids or not os.path.isfile(full):
                continue
            if now - os.path.getmtime(full) < grace_seconds:
                continue
            try:
                with open(full) as fh:
                    rec = json.load(fh)
            except (OSError, ValueError):
                rec = None  # unreadable: carries no decision any
                # reader can resolve through — removal is
                # state-neutral (reads identically to absent)
            if rec is not None and rec.get("committed"):
                members = rec.get("members")
                if members is None:
                    continue  # pre-members record: not provably safe
                if not dry_run and not _repair_member_markers(
                        gid, members):
                    continue  # a referencing member could not be
                    # repaired — keep the evidence file
            if not dry_run:
                os.remove(full)
            removed.append(f"_txn/groups/{entry}")
    # GC bloom sidecars of the dropped dirs (operators/bloomindex.py
    # names them <quote(dirname)>.<col>.json under _txn/bloom) — a
    # sidecar for a vacuumed dir is dead weight; sidecars for a
    # CLONE's source-referencing dirs encode absolute paths and are
    # untouched by the clone's own dir removals
    bloom_root = os.path.join(_txn_dir(path), "bloom")
    if removed and not dry_run and os.path.isdir(bloom_root):
        prefixes = tuple(
            urllib.parse.quote(name, safe="") + sep
            for name in removed
            # subdir-grain sidecars (zorder buckets) quote the "/" —
            # cover both "name.col.json" and "name%2F<sub>.col.json"
            for sep in (".", urllib.parse.quote("/", safe="")))
        for f in os.listdir(bloom_root):
            if f.startswith(prefixes):
                os.remove(os.path.join(bloom_root, f))
    return removed


def commit_with_retry(fn, max_attempts: int = 3,
                      backoff_seconds: float = 0.0):
    """Run ``fn()`` — any operation ending in a commit (``commit``,
    ``merge_upsert``, ``merge_apply``, ``compact``, ``restore``) —
    retrying on ``TxnConflict``: Delta's automatic
    concurrent-modification retry, where the losing writer recomputes
    against the winner's result instead of surfacing the conflict.

    Correctness hinges on ``fn`` re-resolving table state per call,
    which every operation in this module does (each resolves
    ``latest_version`` at call time) — so a read-modify-write like
    MERGE re-probes the NEW parent's dirs on retry and cannot lose
    the winner's update (write skew is impossible: the recompute sees
    every committed row).  Static appends/overwrites are trivially
    retryable for the same reason.

    Unchecked retry is LATEST-WINS for overlapping keyed writes: two
    concurrent MERGEs on the same key both land, the loser's rebase
    replacing the winner's value.  Writers that need Delta's refusal
    contract instead pass ``read_version=`` to merge_upsert /
    merge_apply / delete_keys: each (re)attempt then re-runs the
    WriteSerializable conflict matrix against everything committed
    since that snapshot, and an overlapping or undecidable
    interleaved write raises :class:`ConcurrentModification` — which
    this loop deliberately does NOT catch (it is not a TxnConflict):
    the caller must recompute its updates before retrying.

    Each lost attempt orphans one claimed data dir; orphans are
    unreferenced by any manifest (never visible) and reclaimed by
    ``vacuum`` after its retention grace.  ``backoff_seconds`` jitters
    linearly (attempt * backoff) to de-synchronize herds of writers.
    Re-raises the final ``TxnConflict`` after ``max_attempts``."""
    import time

    attempt = 0
    while True:
        try:
            return fn()
        except TxnConflict:
            attempt += 1
            if attempt >= max_attempts:
                raise
            if backoff_seconds:
                time.sleep(attempt * backoff_seconds)
