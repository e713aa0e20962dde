"""SQL STATEMENT front-end for the transaction-log maintenance /
DML / audit surface — the action half of the T-SQL-consumer story
(the view half is txnlog's snapshot_sql / history_sql /
describe_detail_sql / change_feed_sql temp-view registrations).

Delta ships a SQL extension parser (DeltaSqlParser) so operators can
type ``OPTIMIZE t`` / ``VACUUM t`` / ``RESTORE t`` instead of
calling Scala APIs; the reference's audience writes exactly such
maintenance statements (sql/streaming/staging/0005_delete.sql's
DELETE, the sp-wrapped MERGE restatements around
sql/batchELT/core/12_trip_clean.dedupe_load.sql, Synapse OPTIMIZE
runbooks).  :func:`txn_sql` is that surface over this engine's log:
ONE statement string in, ONE result DataFrame out.

Grammar (keywords case-insensitive, the table is a single-quoted
path, ``[...]`` optional):

- ``DESCRIBE HISTORY '<path>' [LIMIT <n>]``
- ``DESCRIBE DETAIL '<path>' [VERSION AS OF <n>]``
- ``INSERT INTO '<path>' <select-query>`` /
  ``INSERT OVERWRITE '<path>' <select-query>`` — the query text
  runs through ``spark.sql`` verbatim (views, CTEs, anything SQL),
  the result commits as one append / overwrite version
- ``MERGE INTO '<path>' USING <view | (subquery)> KEY BY
  (c1[, c2…]) [DELETE WHEN <flagcol>]`` — key-matched rows rewrite,
  the rest insert (txnlog.merge_upsert's WHEN MATCHED UPDATE ALL /
  WHEN NOT MATCHED INSERT ALL semantics); with ``DELETE WHEN``,
  source rows whose boolean ``<flagcol>`` is true DELETE their keys
  instead (txnlog.merge_apply — Delta's WHEN MATCHED DELETE branch,
  the CDC I/U/D contract; the flag column is dropped from upserts)
- ``MERGE INTO '<path>' USING <view | (subquery)> KEY BY (c1[, …])
  WHEN MATCHED [AND <cond>] THEN UPDATE SET * | c = <expr>[, …]``
  — Delta's conditional-update clause (txnlog.merge_upsert_when):
  ``<cond>`` and the SET expressions reference the source row as
  ``s.<col>`` and the table's current row as ``t.<col>``; matched
  rows failing the condition stay untouched, ``SET *`` updates all
  columns from the source, a SET subset leaves unassigned columns
  at their current values, unmatched source rows insert whole.
  Not combinable with ``DELETE WHEN`` (one action clause per
  statement)
- ``MERGE INTO '<path>' USING <view | (subquery)> KEY BY (c1[, …])
  WHEN MATCHED [AND <cond>] THEN DELETE`` — the conditional-delete
  branch (txnlog.merge_delete_when): matched rows whose pair passes
  ``<cond>`` die, non-qualifying matched rows stay, unmatched
  source rows are ignored (no insert branch — the delete-feed
  statement; unlike ``DELETE WHEN`` the condition can reference the
  table's current row as ``t.<col>``)
- ``MERGE INTO '<path>' USING <view | (subquery)> KEY BY (c1[, …])
  WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE`` — the
  full-sync branch (txnlog.merge_sync_delete): target rows whose
  key has NO source match die (cond over the target row only),
  matched rows are untouched — "make the table contain only what
  the feed still contains" without a TRUNCATE+reload
- ``ALTER '<path>' ADD CONSTRAINT <name> CHECK (<expr>)`` /
  ``ALTER '<path>' DROP CONSTRAINT <name>`` — change the declared
  CHECK set on a live table WITHOUT a data write
  (txnlog.alter_constraints, metadata-only maintenance commit);
  ADD validates the current visible rows first and refuses with
  ConstraintViolation on a violation, DROP of an unknown name
  refuses
- ``CONVERT '<plain-parquet-dir>' TO '<path>' [STATS (c1[, …])]``
  — adopt an existing parquet directory as a txnlog table by
  reference, zero bytes copied (txnlog.convert_to_txn — Delta's
  CONVERT TO DELTA); STATS additionally records pruning envelopes
  (one aggregation scan)
- ``DELETE FROM '<path>' [KEY BY (c1[, c2…])] WHERE <pred>``
- ``UPDATE '<path>' SET c = <expr>[, …] [KEY BY (…)] WHERE <pred>``
- ``OPTIMIZE '<path>' [ZORDER BY (colA, colB)]``
- ``VACUUM '<path>' [RETAIN <n> VERSIONS] [GRACE <s> SECONDS]
  [DRY RUN]``
- ``RESTORE '<path>' TO VERSION AS OF <n> |
  TO TIMESTAMP AS OF '<ts>'``

``KEY BY`` is this engine's (non-Delta) extension declaring the row
identity so DELETE/UPDATE can take the deletion-vector lane and
record conflict descriptors — omitted, both fall back to
copy-on-write with the conservative undecidable-op record
(txnlog.delete_where's documented contract).  ``GRACE`` exposes
vacuum's retention window for test/runbook use (Delta:
``spark.databricks.delta.retentionDurationCheck``).

The parser is deliberately CONSERVATIVE: predicates and SET
expressions pass through VERBATIM to delete_where/update_where
(Spark SQL semantics, same strings their own API takes), clause
splitting is quote- and paren-aware so string literals containing
keywords or commas can never confuse it, and any statement that
does not match the grammar refuses loudly with the supported forms
— a mis-parse must be an error, never a different action.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

from . import txnlog

_GRAMMAR = (
    "supported statements: DESCRIBE HISTORY '<path>' [LIMIT n] | "
    "DESCRIBE DETAIL '<path>' [VERSION AS OF n] | "
    "INSERT INTO|OVERWRITE '<path>' <select-query> | "
    "MERGE INTO '<path>' USING <view|(subquery)> KEY BY (cols) "
    "[WHEN MATCHED [AND <cond>] THEN UPDATE SET *|c=expr,... | "
    "WHEN MATCHED [AND <cond>] THEN DELETE | "
    "WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE | "
    "DELETE WHEN <flagcol>] | "
    "ALTER '<path>' ADD CONSTRAINT <name> CHECK (<expr>) | "
    "ALTER '<path>' DROP CONSTRAINT <name> | "
    "CONVERT '<dir>' TO '<path>' [STATS (cols)] | "
    "DELETE FROM '<path>' [KEY BY (cols)] WHERE <pred> | "
    "UPDATE '<path>' SET c = expr[, ...] [KEY BY (cols)] "
    "WHERE <pred> | OPTIMIZE '<path>' [ZORDER BY (colA, colB)] | "
    "VACUUM '<path>' [RETAIN n VERSIONS] [GRACE s SECONDS] "
    "[DRY RUN] | RESTORE '<path>' TO VERSION AS OF n | "
    "RESTORE '<path>' TO TIMESTAMP AS OF '<ts>'")


def _refuse(statement: str) -> ValueError:
    return ValueError(
        f"txn_sql could not parse: {statement!r}\n{_GRAMMAR}")


def _skip_quoted(s: str, i: int) -> int:
    """``i`` points at an opening quote (``'``, ``"``, or a
    backtick); return the index just past the closing quote.
    Understands the full Spark SQL literal syntax the plain
    find-next-quote scan missed: doubled-quote escapes (``'it''s'``,
    ``"a""b"``, `` `a``b` ``) and, inside ' / " literals only,
    backslash escapes (``'it\\'s'``) — backticked identifiers treat
    backslash as an ordinary character, matching Spark's parser.
    Raises ValueError on an unbalanced quote (callers refuse)."""
    q = s[i]
    esc = q in "'\""
    j, n = i + 1, len(s)
    while j < n:
        c = s[j]
        if esc and c == "\\":
            j += 2
            continue
        if c == q:
            if j + 1 < n and s[j + 1] == q:  # doubled-quote escape
                j += 2
                continue
            return j + 1
        j += 1
    raise ValueError(f"unbalanced quote in {s!r}")


def _find_top_keyword(s: str, word: str) -> int:
    """Index of the first occurrence of ``word`` at paren-depth 0
    outside string literals and backticked identifiers (-1 if none)
    — so a WHERE/KEY inside a quoted literal or a function call can
    never split a clause.  Quote handling is the full
    :func:`_skip_quoted` syntax (double-quoted strings, ``''`` /
    ``\\'`` escapes), keeping the module contract that literal
    CONTENT can never confuse the split."""
    depth = 0
    i, n, w = 0, len(s), len(word)
    up = s.upper()
    while i < n:
        c = s[i]
        if c in "'\"`":
            try:
                i = _skip_quoted(s, i)
            except ValueError:
                return -1  # unbalanced quote: caller refuses
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (depth == 0 and up.startswith(word, i)
              and (i == 0 or not (s[i - 1].isalnum()
                                  or s[i - 1] == "_"))
              and (i + w == n or not (s[i + w].isalnum()
                                      or s[i + w] == "_"))):
            return i
        i += 1
    return -1


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at depth 0 outside quoted literals /
    identifiers (SET-list items — ``greatest(a, b)``, ``'x,y'``,
    ``"x,y"``, and ``'it''s, really'`` stay whole)."""
    out, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            j = _skip_quoted(s, i)  # ValueError propagates: refuse
            buf.append(s[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return out


def _cols_list(inner: str) -> list[str]:
    cols = [c.strip() for c in inner.split(",")]
    if not cols or any(not re.fullmatch(r"\w+", c) for c in cols):
        raise ValueError(f"expected a column list, got {inner!r}")
    return cols


def _one_row(spark: SparkSession, fields: list[tuple]) -> DataFrame:
    """One-row result frame from [(name, value, sparktype), ...]."""
    schema = StructType(
        [StructField(n, t) for n, _, t in fields])
    return spark.createDataFrame(
        [tuple(v for _, v, _ in fields)], schema)


def txn_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Execute one maintenance / DML / audit statement against a
    txnlog table (module docstring: grammar + contract).  Returns
    the statement's result DataFrame: the audit frame for DESCRIBE,
    a one-row outcome summary (committed version, affected rows,
    lane taken) for DML/OPTIMIZE/RESTORE, and the reclaimed-dir
    report for VACUUM."""
    s = statement.strip().rstrip(";").strip()
    up = s.upper()

    m = re.match(r"DESCRIBE\s+HISTORY\s+'([^']+)'"
                 r"(?:\s+LIMIT\s+(\d+))?$", s, re.IGNORECASE)
    if m:
        return txnlog.history(
            spark, m.group(1),
            limit=int(m.group(2)) if m.group(2) else None)

    m = re.match(r"DESCRIBE\s+DETAIL\s+'([^']+)'"
                 r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?$", s,
                 re.IGNORECASE)
    if m:
        return txnlog.describe_detail(
            spark, m.group(1),
            version=int(m.group(2)) if m.group(2) else None)

    m = re.match(r"INSERT\s+(INTO|OVERWRITE)\s+'([^']+)'\s+(.+)$",
                 s, re.IGNORECASE | re.DOTALL)
    if m:
        mode = ("append" if m.group(1).upper() == "INTO"
                else "overwrite")
        df = spark.sql(m.group(3)).persist()
        try:
            # persist so the count and the committed write are ONE
            # evaluation of the query (a non-deterministic SELECT
            # must not produce a count from a different run)
            n = df.count()
            v = txnlog.commit(df, m.group(2), mode)
        finally:
            df.unpersist()
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("mode", mode, StringType()),
            ("rows_inserted", int(n), LongType())])

    m = re.match(r"MERGE\s+INTO\s+'([^']+)'\s+USING\s+(.+)$", s,
                 re.IGNORECASE | re.DOTALL)
    if m:
        path, rest = m.group(1), m.group(2)
        # locate the KEY BY *clause* with the quote- and paren-aware
        # scanner (not a non-greedy regex): a subquery whose string
        # literal contains ' KEY BY (' must not mis-split (r12
        # ADVICE) — same probe loop as the UPDATE branch, because a
        # subquery may legitimately select a column named `key`
        ki, probe = -1, 0
        while True:
            k = _find_top_keyword(rest[probe:], "KEY")
            if k < 0:
                break
            k += probe
            if re.match(r"KEY\s+BY\s*\(", rest[k:], re.IGNORECASE):
                ki = k
                break
            probe = k + 3
        if ki < 0:
            raise _refuse(statement)
        src = rest[:ki].strip()
        km = re.match(r"KEY\s+BY\s*\(([^)]*)\)\s*(.*)$", rest[ki:],
                      re.IGNORECASE | re.DOTALL)
        if not km:
            raise _refuse(statement)
        key_cols = _cols_list(km.group(1))
        tail = km.group(2).strip()
        delete_col = match_cond = None
        set_exprs: dict[str, str] | None = None
        conditional = False
        if tail:
            dm = re.fullmatch(r"DELETE\s+WHEN\s+(\w+)", tail,
                              re.IGNORECASE)
            sm = re.match(r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\b"
                          r"(.*)$", tail, re.IGNORECASE | re.DOTALL)
            wm = re.match(r"WHEN\s+MATCHED\b(.*)$", tail,
                          re.IGNORECASE | re.DOTALL)
            if dm:
                delete_col = dm.group(1)
            elif sm:
                # WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
                # DELETE — the full-sync clause (merge_sync_delete);
                # cond references the TARGET row only (t.<col>)
                conditional = "sync"
                body = sm.group(1).strip()
                ti, probe = -1, 0
                while True:
                    t = _find_top_keyword(body[probe:], "THEN")
                    if t < 0:
                        break
                    t += probe
                    if re.match(r"THEN\s+DELETE\b", body[t:],
                                re.IGNORECASE):
                        ti = t
                        break
                    probe = t + 4
                if ti < 0:
                    raise _refuse(statement)
                head, act = body[:ti].strip(), body[ti + 4:].strip()
                if head:
                    am = re.match(r"AND\s+(.+)$", head,
                                  re.IGNORECASE | re.DOTALL)
                    if not am:
                        raise _refuse(statement)
                    match_cond = am.group(1).strip()
                if not re.fullmatch(r"DELETE", act, re.IGNORECASE):
                    raise _refuse(statement)
            elif wm:
                # WHEN MATCHED [AND <cond>] THEN UPDATE SET
                # * | col = expr[, ...] — Delta's conditional-update
                # clause — or THEN DELETE (the conditional-delete
                # branch); cond/exprs reference s.<col> / t.<col>
                body = wm.group(1).strip()
                # the THEN that ends the condition is the top-level
                # one followed by the action keyword — a CASE ...
                # THEN ... END inside the condition must not split it
                ti, probe = -1, 0
                while True:
                    t = _find_top_keyword(body[probe:], "THEN")
                    if t < 0:
                        break
                    t += probe
                    if re.match(r"THEN\s+(UPDATE\s+SET\b|DELETE\b)",
                                body[t:], re.IGNORECASE):
                        ti = t
                        break
                    probe = t + 4
                if ti < 0:
                    raise _refuse(statement)
                head, act = body[:ti].strip(), body[ti + 4:].strip()
                if head:
                    am = re.match(r"AND\s+(.+)$", head,
                                  re.IGNORECASE | re.DOTALL)
                    if not am:
                        raise _refuse(statement)
                    match_cond = am.group(1).strip()
                if re.fullmatch(r"DELETE", act, re.IGNORECASE):
                    conditional = "delete"
                else:
                    conditional = "update"
                    um = re.match(r"UPDATE\s+SET\s+(.+)$", act,
                                  re.IGNORECASE | re.DOTALL)
                    if not um:
                        raise _refuse(statement)
                    assigns = um.group(1).strip()
                    if assigns != "*":
                        set_exprs = {}
                        for item in _split_top_commas(assigns):
                            am = re.match(r"\s*(\w+)\s*=\s*(.+)$",
                                          item, re.DOTALL)
                            if not am:
                                raise _refuse(statement)
                            set_exprs[am.group(1)] = \
                                am.group(2).strip()
                        if not set_exprs:
                            raise _refuse(statement)
            else:
                raise _refuse(statement)
        if src.startswith("(") and src.endswith(")"):
            updf = spark.sql(src[1:-1])
        elif re.fullmatch(r"\w+", src):
            updf = spark.table(src)
        else:
            raise _refuse(statement)
        updf = updf.persist()
        try:
            n = updf.count()
            if delete_col:
                v = txnlog.merge_apply(spark, path, updf, key_cols,
                                       delete_col=delete_col)
            elif conditional == "sync":
                v = txnlog.merge_sync_delete(
                    spark, path, updf, key_cols,
                    match_cond=match_cond)
            elif conditional == "delete":
                v = txnlog.merge_delete_when(
                    spark, path, updf, key_cols,
                    match_cond=match_cond)
            elif conditional:
                v = txnlog.merge_upsert_when(
                    spark, path, updf, key_cols,
                    match_cond=match_cond, set_exprs=set_exprs)
            else:
                v = txnlog.merge_upsert(spark, path, updf, key_cols)
        finally:
            updf.unpersist()
        meta = txnlog._read_manifest(path, v).get("meta", {})
        # rows_upserted = SOURCE row count (with DELETE WHEN it
        # includes the delete-flagged rows — the change-set size;
        # with WHEN MATCHED it includes non-qualifying rows — the
        # change-set OFFERED, not the rows written)
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("rows_upserted", int(n), LongType()),
            ("rewrote_dirs", len(meta.get("rewrote", [])),
             LongType())])

    if up.startswith("DELETE"):
        m = re.match(r"DELETE\s+FROM\s+'([^']+)'\s*(.*)$", s,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise _refuse(statement)
        path, rest = m.group(1), m.group(2).strip()
        key_cols = None
        km = re.match(r"KEY\s+BY\s*\(([^)]*)\)\s*(.*)$", rest,
                      re.IGNORECASE | re.DOTALL)
        if km:
            key_cols = _cols_list(km.group(1))
            rest = km.group(2).strip()
        if not re.match(r"WHERE\b", rest, re.IGNORECASE):
            raise _refuse(statement)
        pred = rest[5:].strip()
        if not pred:
            raise _refuse(statement)
        v = txnlog.delete_where(spark, path, pred,
                                key_cols=key_cols)
        meta = txnlog._read_manifest(path, v).get("meta", {})
        n = meta.get("rows_deleted", meta.get("dv_rows_deleted", 0))
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("rows_deleted", int(n), LongType()),
            ("lane", meta.get("lane"), StringType())])

    if up.startswith("UPDATE"):
        m = re.match(r"UPDATE\s+'([^']+)'\s+SET\s+(.*)$", s,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise _refuse(statement)
        path, rest = m.group(1), m.group(2)
        wi = _find_top_keyword(rest, "WHERE")
        if wi < 0:
            raise _refuse(statement)
        set_part, pred = rest[:wi].strip(), rest[wi + 5:].strip()
        key_cols = None
        # find the KEY BY *clause*, not the bare word KEY — a SET
        # target or expression may legitimately reference a column
        # named `key` (r12 self-review catch): only a top-level KEY
        # immediately followed by BY( is the clause; anything else
        # stays part of the SET list
        ki, probe = -1, 0
        while True:
            k = _find_top_keyword(set_part[probe:], "KEY")
            if k < 0:
                break
            k += probe
            if re.match(r"KEY\s+BY\s*\(", set_part[k:],
                        re.IGNORECASE):
                ki = k
                break
            probe = k + 3
        if ki >= 0:
            km = re.match(r"KEY\s+BY\s*\(([^)]*)\)\s*$",
                          set_part[ki:], re.IGNORECASE | re.DOTALL)
            if not km:
                raise _refuse(statement)
            key_cols = _cols_list(km.group(1))
            set_part = set_part[:ki].strip().rstrip(",").strip()
        set_exprs: dict[str, str] = {}
        for item in _split_top_commas(set_part):
            am = re.match(r"\s*(\w+)\s*=\s*(.+)$", item, re.DOTALL)
            if not am:
                raise _refuse(statement)
            set_exprs[am.group(1)] = am.group(2).strip()
        if not set_exprs or not pred:
            raise _refuse(statement)
        v = txnlog.update_where(spark, path, pred, set_exprs,
                                key_cols=key_cols)
        meta = txnlog._read_manifest(path, v).get("meta", {})
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("rows_updated", int(meta.get("rows_updated", 0)),
             LongType()),
            ("lane", meta.get("lane"), StringType())])

    m = re.match(r"OPTIMIZE\s+'([^']+)'"
                 r"(?:\s+ZORDER\s+BY\s*\((\w+)\s*,\s*(\w+)\))?$",
                 s, re.IGNORECASE)
    if m:
        path = m.group(1)
        if m.group(2):
            v = txnlog.optimize_zorder(spark, path, m.group(2),
                                       m.group(3))
            action = "zorder"
        else:
            v = txnlog.compact(spark, path)
            action = "compact"
        return _one_row(spark, [
            ("version", None if v is None else int(v),
             IntegerType()),
            ("action", action, StringType()),
            ("noop", v is None, BooleanType())])

    m = re.match(r"VACUUM\s+'([^']+)'"
                 r"(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?"
                 r"(?:\s+GRACE\s+(\d+(?:\.\d+)?)\s+SECONDS)?"
                 r"(\s+DRY\s+RUN)?$", s, re.IGNORECASE)
    if m:
        kw: dict = {"dry_run": bool(m.group(4))}
        if m.group(2):
            kw["keep_latest"] = int(m.group(2))
        if m.group(3):
            kw["grace_seconds"] = float(m.group(3))
        removed = txnlog.vacuum(m.group(1), **kw)
        # the reclaimed-path SET rides along (array column, same
        # convention as DESCRIBE DETAIL's property arrays): a DRY
        # RUN's value IS the paths — an operator auditing before
        # reclaim must see them through the SQL surface, not just
        # a count
        from pyspark.sql.types import ArrayType

        return _one_row(spark, [
            ("removed_dirs", len(removed), LongType()),
            ("dry_run", bool(m.group(4)), BooleanType()),
            ("paths", sorted(removed),
             ArrayType(StringType()))])

    m = re.match(r"ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)"
                 r"\s+CHECK\s*\((.+)\)$", s,
                 re.IGNORECASE | re.DOTALL)
    if m:
        # the CHECK body is everything inside the OUTERMOST parens —
        # the anchored .+ with the trailing )$ keeps nested parens
        # and quoted content whole; the expression passes through
        # VERBATIM to the validation agg (Spark SQL semantics)
        v = txnlog.alter_constraints(
            spark, m.group(1), add={m.group(2): m.group(3).strip()})
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("action", "add_constraint", StringType()),
            ("name", m.group(2), StringType())])
    m = re.match(r"ALTER\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)$",
                 s, re.IGNORECASE)
    if m:
        v = txnlog.alter_constraints(spark, m.group(1),
                                     drop=[m.group(2)])
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("action", "drop_constraint", StringType()),
            ("name", m.group(2), StringType())])

    m = re.match(r"CONVERT\s+'([^']+)'\s+TO\s+'([^']+)'"
                 r"(?:\s+STATS\s*\(([^)]*)\))?$", s, re.IGNORECASE)
    if m:
        stats_cols = _cols_list(m.group(3)) if m.group(3) else None
        v = txnlog.convert_to_txn(spark, m.group(1), m.group(2),
                                  stats_cols=stats_cols)
        man = txnlog._read_manifest(m.group(2), v)
        fmap = man.get("files", {})
        return _one_row(spark, [
            ("version", int(v), IntegerType()),
            ("num_files",
             sum(int(fmap[d][0]) for d in man["dirs"]), LongType()),
            ("size_bytes",
             sum(int(fmap[d][1]) for d in man["dirs"]), LongType())])

    m = re.match(r"RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF"
                 r"\s+(\d+)$", s, re.IGNORECASE)
    if m:
        v = txnlog.restore(m.group(1), to_version=int(m.group(2)))
        return _one_row(spark, [("version", int(v), IntegerType())])
    m = re.match(r"RESTORE\s+'([^']+)'\s+TO\s+TIMESTAMP\s+AS\s+OF"
                 r"\s+'([^']+)'$", s, re.IGNORECASE)
    if m:
        # the literal passes through VERBATIM: txnlog._to_epoch is
        # the single place defining the AS OF clock convention
        # (naive = session-local), so the SQL surface can never
        # diverge from the Python API's
        v = txnlog.restore(m.group(1), as_of_ts=m.group(2))
        return _one_row(spark, [("version", int(v), IntegerType())])

    raise _refuse(statement)
