"""CHECK constraints as a transaction-log TABLE PROPERTY
(operators/txnlog.py commit(constraints=...) / ConstraintViolation):
refuse-on-violation commits and merges, SQL CHECK NULL semantics,
inheritance across appends and maintenance commits, ADD-CONSTRAINT
validation of carried data, and the DV interplay (tombstoned rows
are invisible to a newly added constraint).  Delta CHECK / NOT NULL
parity at the log layer — the reference's DQ gate
(sql/batchELT/dq/50_dq_modeling.sql named checks) moved into the
commit path."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_constraint_test"

CONS = {"v_nonneg": "v >= 0", "id_not_null": "id IS NOT NULL"}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _table(spark, name, constraints=CONS):
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10), (2, 20)]), path,
                  "overwrite", constraints=constraints)
    return path


def test_violating_commit_refused_table_unchanged(spark):
    path = _table(spark, "t_refuse")
    v0 = txnlog.latest_version(path)
    with pytest.raises(txnlog.ConstraintViolation) as ei:
        txnlog.commit(_df(spark, [(3, -5), (4, 40), (None, 1)]),
                      path, "append")
    assert ei.value.violations == {"v_nonneg": 1, "id_not_null": 1}
    # refused: no new version, snapshot identical
    assert txnlog.latest_version(path) == v0
    assert txnlog.snapshot(spark, path).count() == 2
    # a valid append still lands and the property is INHERITED
    # (no redeclaration)
    txnlog.commit(_df(spark, [(3, 30)]), path, "append")
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["constraints"] == CONS
    assert txnlog.snapshot(spark, path).count() == 3


def test_null_predicate_passes_sql_check_semantics(spark):
    """SQL CHECK: an unknown (NULL) predicate PASSES — only literal
    false violates.  'v >= 0' over a NULL v is NULL → pass; the
    explicit NOT NULL form is its own constraint."""
    path = os.path.join(OUT, "t_nullsem")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10)]), path, "overwrite",
                  constraints={"v_nonneg": "v >= 0"})
    txnlog.commit(_df(spark, [(2, None)]), path, "append")  # passes
    assert txnlog.snapshot(spark, path).count() == 2
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit(_df(spark, [(3, None)]), path, "append",
                      constraints={"v_nonneg": "v >= 0",
                                   "v_not_null": "v IS NOT NULL"})


def test_merge_validates_upserts_and_carries_property(spark):
    path = _table(spark, "t_merge")
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(1, -99)]), ["id"])
    assert txnlog.snapshot(spark, path) \
        .where("id = 1").collect()[0]["v"] == 10
    txnlog.merge_upsert(spark, path, _df(spark, [(1, 11)]), ["id"])
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["constraints"] == CONS
    assert txnlog.snapshot(spark, path) \
        .where("id = 1").collect()[0]["v"] == 11


def test_add_constraint_validates_carried_dirs(spark):
    """Declaring a NEW constraint on an append validates the
    EXISTING dirs too (Delta ADD CONSTRAINT scans current data):
    a table already holding v=20 refuses 'v <= 15'."""
    path = _table(spark, "t_addcons")
    with pytest.raises(txnlog.ConstraintViolation) as ei:
        txnlog.commit(_df(spark, [(9, 9)]), path, "append",
                      constraints={**CONS, "v_small": "v <= 15"})
    assert ei.value.violations == {"v_small": 1}  # the carried v=20
    # the same declaration on a compliant table lands
    path2 = os.path.join(OUT, "t_addcons2")
    shutil.rmtree(path2, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10)]), path2, "overwrite",
                  constraints=CONS)
    txnlog.commit(_df(spark, [(9, 9)]), path2, "append",
                  constraints={**CONS, "v_small": "v <= 15"})
    man = txnlog._read_manifest(path2, txnlog.latest_version(path2))
    assert "v_small" in man["constraints"]


def test_explicit_empty_dict_clears(spark):
    path = _table(spark, "t_clear")
    txnlog.commit(_df(spark, [(5, -1)]), path, "append",
                  constraints={})
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["constraints"] == {}
    assert txnlog.snapshot(spark, path).where("v < 0").count() == 1


def test_maintenance_commits_carry_constraints(spark):
    path = _table(spark, "t_maint")
    txnlog.commit(_df(spark, [(3, 30)]), path, "append")
    cv = txnlog.compact(spark, path)
    assert txnlog._read_manifest(path, cv)["constraints"] == CONS
    rv = txnlog.restore(path, cv - 1)
    assert txnlog._read_manifest(path, rv)["constraints"] == CONS
    dst = os.path.join(OUT, "t_maint_clone")
    shutil.rmtree(dst, ignore_errors=True)
    txnlog.shallow_clone(path, dst)
    assert txnlog._read_manifest(dst, 0)["constraints"] == CONS
    # and the clone ENFORCES them on its own commits
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit(_df(spark, [(7, -7)]), dst, "append")


def test_dv_tombstoned_rows_invisible_to_new_constraint(spark):
    """Rows killed by a deletion vector must not fail a newly added
    constraint — the carried-dir validation reads the DV-filtered
    view, exactly what every reader sees."""
    path = os.path.join(OUT, "t_dvcons")
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10), (2, -20), (3, 30)]), path,
                  "overwrite")
    txnlog.delete_keys(
        spark, path, spark.createDataFrame([(2,)], "id long"), ["id"])
    # the only v<0 row is tombstoned: adding v_nonneg succeeds
    txnlog.commit(_df(spark, [(4, 40)]), path, "append",
                  constraints={"v_nonneg": "v >= 0"})
    snap = txnlog.snapshot(spark, path)
    assert snap.count() == 3 and snap.where("v < 0").count() == 0
    # and had the bad row NOT been deleted it would refuse
    path2 = os.path.join(OUT, "t_dvcons2")
    shutil.rmtree(path2, ignore_errors=True)
    txnlog.commit(_df(spark, [(1, 10), (2, -20)]), path2, "overwrite")
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit(_df(spark, [(4, 40)]), path2, "append",
                      constraints={"v_nonneg": "v >= 0"})


def test_partitioned_and_bloom_tables_enforce_too(spark):
    """Constraints compose with the other table properties: a
    partitioned commit validates its per-value leaf dirs, a
    stats+bloom table validates before sidecar maintenance."""
    path = os.path.join(OUT, "t_props")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, p string, v long")
    txnlog.commit(df, path, "overwrite", partition_by=["p"],
                  stats_cols=["id"], bloom_cols=["id"],
                  constraints={"v_nonneg": "v >= 0"})
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.commit(
            spark.createDataFrame([(3, "a", -1)],
                                  "id long, p string, v long"),
            path, "append")
    assert txnlog.snapshot(spark, path).count() == 2
    txnlog.commit(
        spark.createDataFrame([(3, "c", 30)],
                              "id long, p string, v long"),
        path, "append")
    assert txnlog.snapshot(
        spark, path, prune=("p", "c", "c")).count() == 1


def test_append_validation_never_scans_carried_dirs(spark, monkeypatch):
    """The 100 TB contract: validating an append against an INHERITED
    constraint set reads ONLY the incoming dirs — appending a 1 MB
    batch to a 100 TB table must not rescan the table.  Spy on every
    parquet read during the append and assert no carried data dir is
    opened (the ADD-CONSTRAINT path, which legitimately scans carried
    data, is exercised separately above)."""
    path = _table(spark, "t_scan_scope")
    man0 = txnlog._read_manifest(path, 0)
    carried = {os.path.join(path, d) for d in man0["dirs"]}
    scanned: list[str] = []
    real_read = type(spark.read).parquet

    def spy(reader, *paths):
        scanned.extend(paths)
        return real_read(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    txnlog.commit(_df(spark, [(7, 70)]), path, "append")
    monkeypatch.undo()
    hit = [p for p in scanned
           if os.path.abspath(p) in {os.path.abspath(c)
                                     for c in carried}]
    assert hit == [], f"carried dirs scanned on plain append: {hit}"
