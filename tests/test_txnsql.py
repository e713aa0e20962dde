"""SQL statement front-end (operators/txnsql.py txn_sql): one
statement string in, one result DataFrame out — DESCRIBE HISTORY /
DETAIL, DELETE, UPDATE (quote- and paren-aware SET splitting),
OPTIMIZE [ZORDER BY], VACUUM [RETAIN/GRACE/DRY RUN], RESTORE, and
the conservative-refusal contract (a statement outside the grammar
errors loudly; it can never become a different action)."""

from __future__ import annotations

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.operators.txnsql import txn_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _seed(spark, path):
    txnlog.commit(
        _df(spark, [(i, "a" if i % 2 else "b", i * 1.0)
                    for i in range(1, 11)]),
        path, "overwrite", stats_cols=["id"])
    txnlog.commit(
        _df(spark, [(i, "c", i * 1.0) for i in range(11, 21)]),
        path, "append", stats_cols=["id"])
    return txnlog.latest_version(path)


def _vals(spark, path):
    return {r["id"]: r["v"] for r in
            txnlog.snapshot(spark, path).collect()}


def test_delete_statement_dv_lane(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    out = txn_sql(
        spark,
        f"DELETE FROM '{path}' KEY BY (id) WHERE id % 5 = 0")
    row = out.collect()[0]
    assert row["version"] == 2
    assert row["rows_deleted"] == 4  # 5, 10, 15, 20
    assert row["lane"] == "dv"
    assert set(_vals(spark, path)) == set(range(1, 21)) - {5, 10,
                                                           15, 20}


def test_delete_unkeyed_rewrite_lane(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    out = txn_sql(spark,
                  f"DELETE FROM '{path}' WHERE id >= 18;")
    row = out.collect()[0]
    assert row["rows_deleted"] == 3 and row["lane"] == "rewrite"


def test_update_statement_multi_set_and_quotes(spark, tmp_path):
    """SET splitting is paren- and quote-aware: a function call
    with commas and a string literal containing ', WHERE x' stay
    whole; assignments evaluate simultaneously."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    out = txn_sql(
        spark,
        f"UPDATE '{path}' SET v = greatest(v, 3.0), "
        "grp = 'x, WHERE y' KEY BY (id) WHERE id <= 2")
    row = out.collect()[0]
    assert row["rows_updated"] == 2 and row["lane"] == "dv"
    got = {r["id"]: (r["v"], r["grp"]) for r in
           txnlog.snapshot(spark, path).where("id <= 2").collect()}
    assert got == {1: (3.0, "x, WHERE y"), 2: (3.0, "x, WHERE y")}


def test_optimize_and_vacuum_statements(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    row = txn_sql(spark, f"OPTIMIZE '{path}'").collect()[0]
    assert row["version"] == 2 and row["action"] == "compact" \
        and not row["noop"]
    # repeat OPTIMIZE is a no-op (already one dir, no DVs)
    row = txn_sql(spark, f"OPTIMIZE '{path}'").collect()[0]
    assert row["noop"] and row["version"] is None
    # dry run reports the two pre-compact dirs, deletes nothing
    row = txn_sql(
        spark,
        f"VACUUM '{path}' RETAIN 1 VERSIONS GRACE 0 SECONDS "
        "DRY RUN").collect()[0]
    assert row["removed_dirs"] == 2 and row["dry_run"]
    assert txnlog.snapshot(spark, path, 0).count() == 10  # intact
    row = txn_sql(
        spark,
        f"VACUUM '{path}' RETAIN 1 VERSIONS GRACE 0 SECONDS"
    ).collect()[0]
    assert row["removed_dirs"] == 2 and not row["dry_run"]
    assert txnlog.snapshot(spark, path).count() == 20  # head intact


def test_optimize_zorder_statement(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    row = txn_sql(
        spark, f"OPTIMIZE '{path}' ZORDER BY (id, v)").collect()[0]
    assert row["action"] == "zorder" and row["version"] == 2
    assert txnlog.snapshot(spark, path).count() == 20


def test_restore_and_describe_statements(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    txn_sql(spark, f"DELETE FROM '{path}' KEY BY (id) "
                   "WHERE id = 7")
    row = txn_sql(
        spark,
        f"RESTORE '{path}' TO VERSION AS OF 1").collect()[0]
    assert row["version"] == 3
    assert 7 in _vals(spark, path)  # resurrected
    hist = txn_sql(spark, f"DESCRIBE HISTORY '{path}'")
    ops = [r["operation"] for r in hist.collect()]
    assert ops == ["replace", "delete", "append", "overwrite"]
    hist2 = txn_sql(spark, f"DESCRIBE HISTORY '{path}' LIMIT 2")
    assert hist2.count() == 2
    det = txn_sql(spark, f"DESCRIBE DETAIL '{path}'").collect()[0]
    assert det["version"] == 3 and det["num_rows"] == 20
    det1 = txn_sql(
        spark,
        f"DESCRIBE DETAIL '{path}' VERSION AS OF 0").collect()[0]
    assert det1["num_rows"] == 10


def test_unparseable_statements_refuse(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    for stmt in (
            f"DROP TABLE '{path}'",
            f"DELETE FROM '{path}'",          # no WHERE
            f"UPDATE '{path}' SET WHERE id=1",  # no assignment
            f"UPDATE '{path}' SET v = 1.0",     # no WHERE
            f"OPTIMIZE '{path}' ZORDER BY (id)",  # needs two cols
            "VACUUM missing_quotes",
    ):
        with pytest.raises(ValueError):
            txn_sql(spark, stmt)
    # a malformed predicate passes through verbatim and refuses in
    # Spark's own parser (ParseException) — still loud, still
    # BEFORE any commit
    with pytest.raises(Exception, match="PARSE_SYNTAX_ERROR|error"):
        txn_sql(spark,
                f"DELETE FROM '{path}' WHERE id = 1 OR (")
    # the original table is untouched by every refusal
    assert txnlog.latest_version(path) == 1
    assert len(_vals(spark, path)) == 20


def test_insert_statements_build_table(spark, tmp_path):
    """INSERT OVERWRITE creates v0, INSERT INTO appends v1 — the
    query text runs through spark.sql verbatim (views/CTEs work),
    and the result row reports the committed version + row count."""
    path = str(tmp_path / "t")
    _df(spark, [(i, "a", i * 1.0) for i in range(1, 6)]) \
        .createOrReplaceTempView("src_lo")
    _df(spark, [(i, "b", i * 1.0) for i in range(6, 11)]) \
        .createOrReplaceTempView("src_hi")
    row = txn_sql(
        spark,
        f"INSERT OVERWRITE '{path}' SELECT * FROM src_lo"
    ).collect()[0]
    assert (row["version"], row["mode"], row["rows_inserted"]) \
        == (0, "overwrite", 5)
    row = txn_sql(
        spark,
        f"INSERT INTO '{path}' "
        "WITH x AS (SELECT * FROM src_hi WHERE id <= 8) "
        "SELECT * FROM x").collect()[0]
    assert (row["version"], row["mode"], row["rows_inserted"]) \
        == (1, "append", 3)
    assert set(_vals(spark, path)) == set(range(1, 9))


def test_merge_statement_view_and_subquery(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    _df(spark, [(2, "z", 222.0), (99, "z", 999.0)]) \
        .createOrReplaceTempView("upserts_v")
    row = txn_sql(
        spark,
        f"MERGE INTO '{path}' USING upserts_v KEY BY (id)"
    ).collect()[0]
    assert row["rows_upserted"] == 2 and row["rewrote_dirs"] == 1
    got = _vals(spark, path)
    assert got[2] == 222.0 and got[99] == 999.0 and len(got) == 21
    # subquery source
    row = txn_sql(
        spark,
        f"MERGE INTO '{path}' USING "
        "(SELECT id, 'q' AS grp, v * 10 AS v FROM upserts_v "
        "WHERE id = 2) KEY BY (id)").collect()[0]
    assert row["rows_upserted"] == 1
    assert _vals(spark, path)[2] == 2220.0
    # a bare non-identifier source refuses
    with pytest.raises(ValueError):
        txn_sql(spark,
                f"MERGE INTO '{path}' USING no such KEY BY (id)")


def test_merge_delete_when_branch(spark, tmp_path):
    """MERGE ... DELETE WHEN <flag>: flagged source rows delete
    their keys (merge_apply's CDC I/U/D contract), the rest upsert,
    and the flag column never lands in the table."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    spark.createDataFrame(
        [(1, "z", 111.0, False), (3, "z", 0.0, True),
         (99, "z", 999.0, False)],
        "id long, grp string, v double, is_del boolean"
    ).createOrReplaceTempView("cdc_v")
    row = txn_sql(
        spark,
        f"MERGE INTO '{path}' USING cdc_v KEY BY (id) "
        "DELETE WHEN is_del").collect()[0]
    assert row["rows_upserted"] == 3
    got = _vals(spark, path)
    assert 3 not in got                      # deleted
    assert got[1] == 111.0 and got[99] == 999.0
    assert len(got) == 20                    # 20 - 1 del + 1 insert
    cols = txnlog.snapshot(spark, path).columns
    assert "is_del" not in cols


def test_restore_timestamp_statement(spark, tmp_path):
    """RESTORE ... TO TIMESTAMP AS OF '<iso>': the instant resolves
    through version_at_timestamp in the same clock domain as
    commit_time."""
    import datetime

    path = str(tmp_path / "t")
    _seed(spark, path)
    t1 = txnlog.commit_time(path, 1)
    txn_sql(spark, f"DELETE FROM '{path}' KEY BY (id) WHERE id = 7")
    iso = datetime.datetime.fromtimestamp(t1).isoformat()
    row = txn_sql(
        spark,
        f"RESTORE '{path}' TO TIMESTAMP AS OF '{iso}'").collect()[0]
    assert row["version"] == 3
    assert 7 in _vals(spark, path)


def test_update_set_referencing_column_named_key(spark, tmp_path):
    """r12 self-review: only the two-word `KEY BY (` sequence is the
    clause — a SET list referencing (or targeting) a column named
    `key` must parse, not refuse."""
    path = str(tmp_path / "t")
    txnlog.commit(
        spark.createDataFrame([(1, 10.0, 5.0), (2, 20.0, 6.0)],
                              "id long, key double, v double"),
        path, "overwrite")
    row = txn_sql(
        spark,
        f"UPDATE '{path}' SET v = key + 1.0, key = 0.0 "
        "WHERE id = 1").collect()[0]
    assert row["rows_updated"] == 1
    got = {r["id"]: (r["key"], r["v"]) for r in
           txnlog.snapshot(spark, path).collect()}
    assert got == {1: (0.0, 11.0), 2: (20.0, 6.0)}
