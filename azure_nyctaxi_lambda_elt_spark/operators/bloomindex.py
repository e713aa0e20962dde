"""Bloom-filter directory index for transaction-log tables — the
point-lookup half of data skipping.

The manifest's per-dir [min, max] envelopes (txnlog ``stats_cols`` /
``snapshot(prune=...)``) skip dirs for RANGE predicates, but a needle
query on a high-cardinality key (trip_uid, document id) gains nothing
from min/max when every dir spans most of the key space.  Parquet
solves this with per-column Bloom filters in the file footer; Delta
with per-file bloom index files.  This module is that index at the
txn log's dir grain:

- one Bloom bitmap per (data dir, column), built by a single Spark
  aggregation over the dir (k salted ``xxhash64`` bit positions per
  row, distinct positions collected — bounded by m bits, i.e. O(m)
  driver metadata no matter how many rows the dir holds);
- stored as a write-once JSON sidecar under ``<table>/_txn/bloom/``.
  Data dirs are immutable, so a sidecar never needs invalidation; a
  dir without a sidecar is always scanned (pruning stays
  conservative, exactly like manifest stats);
- probes hash with the SAME Spark expression (one tiny job over the
  probe values) and each sidecar RECORDS the physical dtype it hashed
  (xxhash64 hashes an INT and a LONG differently), so build and probe
  can never disagree on hash or type — even when dirs drift types
  across commits via schema evolution — and a false negative is
  structurally impossible;
- a pruned read keeps a dir iff ANY probe value has all k bits set
  in that dir's bitmap; missing rows are impossible, extra dirs are
  only a false-positive cost (~0.9% per key at the default m=32768,
  k=4, ~3k keys/dir).

Scale shape: building is one narrow agg job per NEW dir at commit
time (never rescans old dirs); the index itself is O(m/8) bytes per
dir — at 100 TB a point lookup reads the manifest + a few KB of
sidecars and opens O(1) data dirs instead of all of them.  Size m to
the dir's expected key count (the classic m ≈ 1.44 · n · log2(1/p)
bits for false-positive rate p, what parquet's builder does from
NDV): a saturated bitmap never loses rows — it just stops pruning —
so undersizing degrades cost, not correctness.  The default m=2^15
suits the test-scale ~3k-90k keys/dir; pass m per table at larger
dir grain.

Reference parity: the reference's point lookups hit Synapse B-tree
/ columnstore segment elimination (sql/batchELT/core/
12_trip_clean.dedupe_load.sql's key probes); a parquet lake needs an
explicit skipping index.
"""

from __future__ import annotations

import base64
import json
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# same-package txn internals: the index is a txn-log companion and
# reads manifests directly (dir lists are not part of snapshot()'s
# public surface on purpose — readers normally never see dir names)
from . import txnlog

BLOOM_M = 1 << 15   # bits per bitmap (4 KiB packed)
BLOOM_K = 4         # hash functions


def _bloom_root(path: str) -> str:
    return os.path.join(path, "_txn", "bloom")


def _sidecar_path(path: str, dirname: str, col: str) -> str:
    # manifest dir entries may be absolute paths (a shallow clone
    # references the source's dirs absolutely) — percent-encode the
    # separator so the sidecar always lands INSIDE this table's
    # _txn/bloom (os.path.join would reset on an absolute component
    # and scatter sidecars into the source table's root)
    safe = urllib.parse.quote(dirname, safe="")
    return os.path.join(_bloom_root(path), f"{safe}.{col}.json")


def _resolve_sidecar(path: str, dirname: str, col: str) -> str | None:
    """Locate the sidecar describing (``dirname``, ``col``) for a
    reader of table ``path``: the table's own ``_txn/bloom`` first,
    then — for a SHALLOW CLONE's absolute-path dir — the SOURCE
    table's sidecar.  Data dirs are immutable, so the source's
    write-once sidecar describes exactly the bytes the clone
    references; without this resolution a clone reads unpruned until
    someone re-indexes it (conservative but wasteful).  The source
    root is found by walking up from the dir to the ancestor holding
    ``_txn`` (one level for plain dirs, two for zorder bucket
    subdirs).  Returns None when no sidecar exists anywhere
    (conservative scan)."""
    side = _sidecar_path(path, dirname, col)
    if os.path.exists(side):
        return side
    if not os.path.isabs(dirname):
        return None
    root = os.path.dirname(dirname)
    rel = os.path.basename(dirname)
    while root and root != os.path.dirname(root):
        if os.path.isdir(os.path.join(root, "_txn")):
            cand = _sidecar_path(root, rel, col)
            return cand if os.path.exists(cand) else None
        rel = os.path.join(os.path.basename(root), rel)
        root = os.path.dirname(root)
    return None


def _positions(col: str, m: int, k: int):
    """Array of the k bit positions for ``col`` — salted xxhash64,
    pmod to [0, m).  Pure Column expression: the one hash definition
    both the build and the probe evaluate."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m))
        for i in range(k)
    ])


def _pack_bits(positions: list[int], m: int) -> str:
    buf = bytearray(m // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def bitmap_agg_sql(col: str, m: int = BLOOM_M, k: int = BLOOM_K
                   ) -> list[str]:
    """The k bitmap-aggregate SQL expressions whose OR is this
    module's bitmap — the form that rides INSIDE another job
    (DataFrame.observe on the commit's write, or the per-dir groupBy
    of a partitioned commit) instead of a separate read-back job per
    (dir, column).  ``bitmap_bit_position(p + 1)`` maps position
    p ∈ [0, m) into bucket 1 of Spark's 32768-bit bitmap, and
    ``bitmap_construct_agg`` packs bits in exactly ``_pack_bits``'s
    byte/bit order (pinned byte-identical by
    tests/test_r13_opt_equivalence.py), so the merged result is THE
    sidecar bitmap, not an approximation of it.  Requires m <= 32768
    (one Spark bitmap bucket) — true for the module default; larger
    m falls back to the legacy build."""
    if m > (1 << 15):
        raise ValueError(f"bitmap_agg_sql caps at m=32768, got {m}")
    return [
        f"bitmap_construct_agg(bitmap_bit_position("
        f"pmod(xxhash64({i}, `{col}`), {m}) + 1))"
        for i in range(k)
    ]


def merge_bitmap_parts(parts: list, m: int = BLOOM_M) -> str:
    """OR the k bitmap-agg results (bytes, or None for a zero-row
    aggregate) into the sidecar's base64 bitmap."""
    buf = bytearray(m // 8)
    for b in parts:
        if b is None:
            continue
        for j, byte in enumerate(bytes(b)[: m // 8]):
            buf[j] |= byte
    return base64.b64encode(bytes(buf)).decode("ascii")


def sidecar_body(col: str, dtype: str, bits_b64: str,
                 m: int = BLOOM_M, k: int = BLOOM_K) -> dict:
    """The sidecar JSON body — single shape shared by the legacy
    read-back build and the in-write-job builds."""
    return {"col": col, "m": m, "k": k, "dtype": dtype,
            "bits": bits_b64}


def write_sidecar(path: str, dirname: str, col: str,
                  body: dict) -> bool:
    """Publish a precomputed sidecar for (``dirname``, ``col``) under
    table ``path`` — same write-once semantics as build_bloom_index
    (skip when any sidecar already describes these immutable bytes;
    tmp + atomic replace).  Returns True when written."""
    if _resolve_sidecar(path, dirname, col) is not None:
        return False
    os.makedirs(_bloom_root(path), exist_ok=True)
    side = _sidecar_path(path, dirname, col)
    tmp = f"{side}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(body, fh)
    os.replace(tmp, side)
    return True


def _bit_set(packed: bytes, p: int) -> bool:
    return bool(packed[p >> 3] & (1 << (p & 7)))


def build_bloom_index(spark: SparkSession, path: str, col: str,
                      version: int | None = None,
                      m: int = BLOOM_M, k: int = BLOOM_K,
                      only_dirs: list[str] | None = None) -> list[str]:
    """Build the (dir, ``col``) Bloom sidecars missing for ``version``
    (default latest) and return the dir names built.  Incremental by
    construction: dirs already indexed are skipped, so appending the
    Nth commit costs one agg job over the NEW dir only.
    ``only_dirs`` narrows the candidate set further (the commit-time
    hook passes exactly the dir it just wrote, skipping even the
    existence probes on old sidecars).

    Each sidecar records the ``simpleString`` of the Spark dtype it
    hashed: per-dir physical types can DRIFT across commits (schema
    evolution, e.g. int→bigint), and a probe hashed at the wrong
    dtype silently misses every bit — sidecar-recorded dtype makes
    the probe side per-dir exact.  A dir whose parquet schema lacks
    ``col`` entirely gets an all-zero bitmap with dtype ``"absent"``:
    its rows read back NULL for the column, and an IN-list predicate
    never matches NULL, so pruning such a dir can never drop a row."""
    v = txnlog.latest_version(path) if version is None else version
    if v is None:
        return []
    man = txnlog._read_manifest(path, v)
    os.makedirs(_bloom_root(path), exist_ok=True)
    built = []
    targets = man["dirs"] if only_dirs is None else [
        d for d in man["dirs"] if d in set(only_dirs)]
    for d in targets:
        if _resolve_sidecar(path, d, col) is not None:
            continue  # own sidecar, or a clone-source one — either
            # describes these immutable bytes exactly
        side = _sidecar_path(path, d, col)
        df = spark.read.parquet(os.path.join(path, d))
        if col not in df.columns:
            pos, dtype = [], "absent"
        else:
            dtype = df.schema[col].dataType.simpleString()
            # distinct bit positions: ≤ m rows regardless of dir size
            # — the collect is index metadata, not data (same class as
            # the manifest min/max stats collect in txnlog._col_stats)
            pos = [
                r["p"] for r in
                df.select(F.explode(_positions(col, m, k)).alias("p"))
                .distinct().collect()
            ]
        body = {"col": col, "m": m, "k": k, "dtype": dtype,
                "bits": _pack_bits(pos, m)}
        # write-once publish: dirs are immutable so two builders can
        # only ever produce identical bytes — last replace wins
        tmp = f"{side}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        os.replace(tmp, side)
        built.append(d)
    return built


def _probe_positions(spark: SparkSession, values: list, col: str,
                     m: int, k: int, dtype: str) -> list[list[int]]:
    """Bit-position lists for the probe values, computed with the SAME
    Spark hash expression the build used (one tiny job over the
    values).  ``dtype`` is the sidecar-recorded physical type the
    build hashed: xxhash64 hashes an INT and a LONG differently, so
    the probe values must cast to exactly that type or every bit test
    misses (silent false negatives through Python type inference).
    Values that cast to NULL for this dtype are dropped — NULL never
    matches an IN-list equality, so they cannot keep a dir alive."""
    vdf = spark.createDataFrame([(v,) for v in values], [col])
    cast = vdf.select(F.col(col).cast(dtype).alias(col)) \
        .where(F.col(col).isNotNull())
    rows = cast.select(_positions(col, m, k).alias("__p")).collect()
    return [list(r["__p"]) for r in rows]


def prune_dirs(spark: SparkSession, path: str, col: str,
               values: list, version: int | None = None
               ) -> tuple[list[str], list[str]]:
    """(kept_dirs, all_dirs) for a ``col IN values`` point lookup at
    ``version`` (default latest).  A dir is kept iff it has no sidecar
    (conservative) or ANY probe value has all k bits set in its
    bitmap — so every dir that could hold a matching row is kept.
    An empty ``values`` list matches nothing: kept is empty.

    Probe positions are computed (one tiny Spark job) and cached PER
    (m, k, dtype) GROUP: each sidecar recorded the dtype its dir was
    hashed at, so dirs whose physical types drifted across commits
    (schema evolution) each get probes hashed at their own type —
    never the first dir's.  Legacy sidecars without a recorded dtype
    fall back to THAT dir's own parquet schema; a sidecar recorded as
    ``"absent"`` (column missing from the dir) can never match a
    non-NULL probe and is pruned outright."""
    v = txnlog.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = txnlog._read_manifest(path, v)
    all_dirs = list(man["dirs"])
    if not values:
        return [], all_dirs
    nn_values = [x for x in values if x is not None]
    if not nn_values:
        return [], all_dirs
    # (m, k, dtype) -> list of per-value position lists
    probe_cache: dict[tuple, list[list[int]]] = {}
    kept = []
    for d in all_dirs:
        side = _resolve_sidecar(path, d, col)
        if side is None:
            kept.append(d)
            continue
        with open(side) as fh:
            idx = json.load(fh)
        dtype = idx.get("dtype")
        if dtype == "absent":
            continue  # all rows NULL for col: IN-list can't match
        if dtype is None:
            # legacy sidecar: the build hashed THIS dir's parquet type
            sch = spark.read.parquet(os.path.join(path, d)).schema
            if col not in sch.names:
                continue
            dtype = sch[col].dataType.simpleString()
        key = (idx["m"], idx["k"], dtype)
        if key not in probe_cache:
            probe_cache[key] = _probe_positions(
                spark, nn_values, col, idx["m"], idx["k"], dtype)
        packed = base64.b64decode(idx["bits"])
        if any(all(_bit_set(packed, p) for p in pos)
               for pos in probe_cache[key]):
            kept.append(d)
    return kept, all_dirs


def union_bitmaps(path: str, col: str,
                  version: int | None = None
                  ) -> tuple[list[dict], bool]:
    """OR-union of every dir's sidecar bitmap, grouped per
    (m, k, dtype) — the whole-table membership summary a STREAMING
    consumer can fold into its plan as literals (KBs of driver
    metadata, no matter the table size).  Returns (groups, complete):
    ``complete`` is False when any dir lacks a sidecar for ``col``,
    in which case a membership gate must treat every value as a
    potential member (conservative, like every pruning path here).
    Each group carries the bitmap as 64-bit little-endian words ready
    for ``bloom_maybe_expr``; "absent"-dtype sidecars contribute
    nothing (their dirs cannot match an IN-list)."""
    v = txnlog.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    man = txnlog._read_manifest(path, v)
    groups: dict[tuple, bytearray] = {}
    complete = True
    for d in man["dirs"]:
        side = _resolve_sidecar(path, d, col)
        if side is None:
            complete = False
            continue
        with open(side) as fh:
            idx = json.load(fh)
        dtype = idx.get("dtype")
        if dtype == "absent":
            continue
        if dtype is None:
            complete = False  # legacy sidecar: dtype unknown here
            continue
        key = (idx["m"], idx["k"], dtype)
        packed = base64.b64decode(idx["bits"])
        acc = groups.setdefault(key, bytearray(len(packed)))
        for i, byte in enumerate(packed):
            acc[i] |= byte
    out = []
    for (m, k, dtype), acc in sorted(groups.items(),
                                     key=lambda kv: str(kv[0])):
        words = []
        for w in range(0, len(acc), 8):
            u = int.from_bytes(acc[w:w + 8], "little")
            words.append(u - (1 << 64) if u >= (1 << 63) else u)
        out.append({"m": m, "k": k, "dtype": dtype, "words": words})
    return out, complete


def bloom_maybe_expr(col: str, groups: list[dict]):
    """Column expression: True iff ``col``'s value MIGHT be in the
    indexed corpus, False iff it is PROVABLY absent — the fully
    DISTRIBUTED membership gate (no driver-side key list, no join):
    k ``getbit`` probes per (m, k, dtype) group against the union
    bitmap folded into the plan as an array<bigint> literal, hashing
    with the exact build expression and dtype, so a False can never
    drop a real member.  NULL values gate to False (an IN-list never
    matches NULL).  An empty ``groups`` list gates everything True
    (nothing indexed → stay conservative)."""
    if not groups:
        return F.lit(True)
    tests = []
    for g in groups:
        words = F.array(*[F.lit(w).cast("bigint")
                          for w in g["words"]])
        c = F.col(col).cast(g["dtype"])
        per = None
        for i in range(g["k"]):
            p = F.pmod(F.xxhash64(F.lit(i), c), F.lit(g["m"]))
            word = F.element_at(words, (p / F.lit(64)).cast("int") + 1)
            bit = F.call_function(
                "getbit", word, F.pmod(p, F.lit(64)).cast("int")) == 1
            per = bit if per is None else (per & bit)
        tests.append(c.isNotNull() & per)
    out = tests[0]
    for t in tests[1:]:
        out = out | t
    return out


def bloom_pruned_snapshot(spark: SparkSession, path: str, col: str,
                          values: list,
                          version: int | None = None) -> DataFrame:
    """Snapshot read for a ``col IN values`` lookup scanning only the
    dirs surviving the shared point-set seam
    (``txnlog.prune_point_set``: per-value stats-envelope test AND
    bloom-sidecar probe — the same decision MERGE's candidate probe
    and delete_keys route through).  Like ``txnlog.snapshot(
    prune=...)``, this narrows WHICH dirs are scanned; callers still
    apply the row predicate (surviving dirs may be false
    positives)."""
    # resolve the version ONCE and pin both the prune and the manifest
    # read to it — resolving twice would let a commit landing in
    # between apply the newer manifest's schema/DVs to the older
    # version's kept-dir list (snapshot isolation)
    v = txnlog.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {path}")
    kept, all_dirs = txnlog.prune_point_set(
        spark, path, col, values, version=v)
    man = txnlog._read_manifest(path, v)
    if not kept:
        # schema-only frame, under the manifest-recorded table schema
        # (not all_dirs[0]'s, which is narrower under evolution): the
        # empty result must carry the same columns a non-empty one
        # and the plain snapshot would
        return txnlog._read_dirs(
            spark, path, all_dirs[:1], man).limit(0)
    df = txnlog._read_dirs(spark, path, kept, man)
    if man.get("dv"):
        # tombstoned rows must not resurface through the bloom path
        df = txnlog._apply_dv(spark, path, df, man["dv"])
    return df
