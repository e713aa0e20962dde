"""MERGE x schema evolution on the transaction log: the r8
data-loss fix (a copy-on-write rewrite after a schema-evolving
append read the affected dirs RAW, so the first dir's column set
silently stripped evolved columns from kept rows) plus the features
the fix unlocks — Delta mergeSchema-on-MERGE in both directions,
CDF across evolved generations, and constraints over evolved
columns.  Reference parity: the reference's MERGE targets evolve by
ALTER TABLE + sp re-deploy (sql/batchELT/core/
12_trip_clean.dedupe_load.sql); the log layer owns both halves
here."""

from __future__ import annotations

import os
import shutil

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_merge_evo_test"


def _mk(spark, name):
    """v0 old schema (id, v); v1 appends evolved (id, v, extra)."""
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(spark.createDataFrame([(1, 10), (2, 20)],
                                        "id long, v long"),
                  path, "overwrite")
    txnlog.commit(spark.createDataFrame([(3, 30, "x3"), (4, 40, "x4")],
                                        "id long, v long, extra string"),
                  path, "append")
    return path


def test_old_schema_upsert_keeps_evolved_values(spark):
    """The r8 silent-data-loss repro: upserts in the OLD column set
    touching keys in BOTH generations must not strip the evolved
    column from untouched rows (pre-fix: raw multipath read pinned
    the first dir's 2-column schema and x3/x4 read back NULL)."""
    path = _mk(spark, "t_lossfix")
    txnlog.merge_upsert(spark, path,
                        spark.createDataFrame([(1, 11), (3, 31)],
                                              "id long, v long"),
                        ["id"])
    rows = {r["id"]: r.asDict()
            for r in txnlog.snapshot(spark, path).collect()}
    assert rows[4]["extra"] == "x4"          # kept row, kept value
    assert rows[1]["v"] == 11 and rows[3]["v"] == 31
    # the upserted rows were written without the column → NULL
    assert rows[3]["extra"] is None


def test_merge_evolves_schema_with_new_column(spark):
    """mergeSchema-on-MERGE: upserts carrying a NEW column evolve the
    table schema in the same commit; kept rows null-backfill."""
    path = _mk(spark, "t_evolve")
    txnlog.merge_upsert(
        spark, path,
        spark.createDataFrame([(2, 21, "x2", 99)],
                              "id long, v long, extra string, q long"),
        ["id"])
    snap = txnlog.snapshot(spark, path)
    assert "q" in snap.columns
    rows = {r["id"]: r.asDict() for r in snap.collect()}
    assert rows[2]["q"] == 99 and rows[2]["extra"] == "x2"
    assert rows[1]["q"] is None               # kept, null-backfilled
    assert rows[4]["extra"] == "x4"           # untouched generation
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert '"q"' in man["schema"]


def test_merge_incompatible_type_change_refused(spark):
    """A merge whose upserts change a column to an incompatible type
    raises instead of committing an unreadable table schema."""
    path = _mk(spark, "t_badtype")
    v = txnlog.latest_version(path)
    with pytest.raises(ValueError, match="incompatible type change"):
        txnlog.merge_upsert(
            spark, path,
            spark.createDataFrame([(1, "not a number")],
                                  "id long, v string"), ["id"])
    assert txnlog.latest_version(path) == v


def test_change_feed_across_evolved_generations(spark):
    """CDF between versions whose dirs carry different column sets:
    both sides read under the TO-version's schema (old generation
    null-backfills), so the diff classifies by content instead of
    failing or silently dropping the evolved column."""
    path = _mk(spark, "t_cdf")
    v1 = txnlog.latest_version(path)
    v2 = txnlog.merge_upsert(
        spark, path,
        spark.createDataFrame([(1, 11, "x1"), (5, 50, "x5")],
                              "id long, v long, extra string"),
        ["id"])
    feed = txnlog.change_feed(spark, path, v1, v2, ["id"])
    by = {(r["id"], r["_change_type"]): r.asDict()
          for r in feed.collect()}
    assert by[(5, "insert")]["extra"] == "x5"
    assert by[(1, "update_preimage")]["extra"] is None  # old gen
    assert by[(1, "update_postimage")]["extra"] == "x1"
    assert (2, "delete") not in by


def test_constraint_on_evolved_column_with_old_schema_upsert(spark):
    """A CHECK constraint naming an evolved column resolves even when
    the merge's rewrite dir was written against the old column set
    (NULL → passes), and still refuses a literal violation."""
    path = _mk(spark, "t_cons_evo")
    txnlog.commit(spark.createDataFrame([(6, 60, "ok")],
                                        "id long, v long, extra string"),
                  path, "append",
                  constraints={"extra_len": "length(extra) <= 4"})
    # old-schema upsert: extra is NULL on its rows → passes
    txnlog.merge_upsert(spark, path,
                        spark.createDataFrame([(1, 12)],
                                              "id long, v long"),
                        ["id"])
    # violating value on the evolved column → refused
    with pytest.raises(txnlog.ConstraintViolation):
        txnlog.merge_upsert(
            spark, path,
            spark.createDataFrame([(7, 70, "way too long")],
                                  "id long, v long, extra string"),
            ["id"])
    assert txnlog.snapshot(spark, path) \
        .where("id = 7").count() == 0
