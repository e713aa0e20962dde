"""GENERATED ALWAYS AS columns as a transaction-log table property
(operators/txnlog.py commit(generated=...)): absent columns computed
from the declared SQL expression at commit, explicit writes
validated post-write against the expression (null-safe — mismatch
refuses like a CHECK violation), property inherited / cleared /
carried through MERGE and maintenance commits.  Reference parity:
the CTAS-derived night_flag / ingest_date columns
(sql/batchELT/core/11_trip_clean.slice_ctas.sql)."""

from __future__ import annotations

import os
import shutil

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_txn_generated_test"

GEN = {"v2": "v * 2", "tag": "CASE WHEN v >= 3 THEN 'hi' END"}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _mk(spark, name, rows=((1, 1), (2, 2), (3, 3))):
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    txnlog.commit(_df(spark, list(rows)), path, "overwrite",
                  generated=GEN)
    return path


def test_absent_columns_computed_and_property_inherited(spark):
    path = _mk(spark, "t_compute")
    got = {r["k"]: (r["v2"], r["tag"]) for r in
           txnlog.snapshot(spark, path).collect()}
    assert got == {1: (2, None), 2: (4, None), 3: (6, "hi")}
    # append WITHOUT redeclaring: property inherited, cols computed
    txnlog.commit(_df(spark, [(4, 4)]), path, "append")
    got = {r["k"]: (r["v2"], r["tag"]) for r in
           txnlog.snapshot(spark, path).collect()}
    assert got[4] == (8, "hi")
    assert txnlog._read_manifest(path, 1)["generated"] == GEN


def test_matching_explicit_write_accepted_mismatch_refused(spark):
    path = _mk(spark, "t_refuse")
    v_before = txnlog.latest_version(path)
    ok = (_df(spark, [(5, 5)])
          .selectExpr("k", "v", "v * 2 AS v2",
                      "CASE WHEN v >= 3 THEN 'hi' END AS tag"))
    txnlog.commit(ok, path, "append")       # equal values: accepted
    bad = (_df(spark, [(6, 6)])
           .selectExpr("k", "v", "v * 2 + 1 AS v2",
                       "CASE WHEN v >= 3 THEN 'hi' END AS tag"))
    with pytest.raises(txnlog.ConstraintViolation,
                       match="generated:v2"):
        txnlog.commit(bad, path, "append")
    # table unchanged, no version consumed by the refusal
    assert txnlog.latest_version(path) == v_before + 1
    assert txnlog.snapshot(spark, path).count() == 4
    # a NULL where the expression is non-NULL is a mismatch too
    bad_null = (_df(spark, [(7, 7)])
                .selectExpr("k", "v", "CAST(NULL AS LONG) AS v2"))
    with pytest.raises(txnlog.ConstraintViolation,
                       match="generated:v2"):
        txnlog.commit(bad_null, path, "append")


def test_clearing_and_late_declaration_over_existing_data(spark):
    path = _mk(spark, "t_declare")
    # {} clears: subsequent appends stop computing
    txnlog.commit(_df(spark, [(9, 9)]), path, "overwrite",
                  generated={})
    assert "v2" not in txnlog.snapshot(spark, path).columns
    # re-declaring over carried data that LACKS the column refuses
    # (carried rows read NULL under the merged schema)
    with pytest.raises(txnlog.ConstraintViolation,
                       match="generated:v2"):
        txnlog.commit(_df(spark, [(10, 10)]), path, "append",
                      generated={"v2": "v * 2"})
    # ...but declaring on an OVERWRITE (fresh data) lands
    txnlog.commit(_df(spark, [(11, 11)]), path, "overwrite",
                  generated={"v2": "v * 2"})
    assert [r["v2"] for r in
            txnlog.snapshot(spark, path).collect()] == [22]


def test_late_declaration_ignores_tombstoned_rows(spark):
    """Declaring a generated column over carried data that CONTAINS
    the column validates only VISIBLE rows: a contradicting row
    already killed by a deletion vector must not refuse the
    declaration (same rule as ADD CONSTRAINT)."""
    path = os.path.join(OUT, "t_dv_declare")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, 1, 2), (2, 2, 4), (3, 3, 99)],   # row 3 contradicts v*2
        "k long, v long, v2 long")
    txnlog.commit(df, path, "overwrite")       # no property yet
    # without the DV, the late declaration refuses on row 3
    with pytest.raises(txnlog.ConstraintViolation,
                       match="generated:v2"):
        txnlog.commit(spark.createDataFrame([(4, 4, 8)], df.schema),
                      path, "append", generated={"v2": "v * 2"})
    # tombstone the contradicting row; now the declaration lands
    txnlog.delete_keys(spark, path,
                       spark.createDataFrame([(3,)], "k long"), ["k"])
    txnlog.commit(spark.createDataFrame([(4, 4, 8)], df.schema),
                  path, "append", generated={"v2": "v * 2"})
    got = {r["k"]: r["v2"] for r in
           txnlog.snapshot(spark, path).collect()}
    assert got == {1: 2, 2: 4, 4: 8}
    # and the property now computes on later appends
    txnlog.commit(_df(spark, [(5, 5)]), path, "append")
    assert {r["k"]: r["v2"] for r in
            txnlog.snapshot(spark, path).collect()}[5] == 10


def test_merge_computes_on_upserts_and_validates(spark):
    path = _mk(spark, "t_merge")
    txnlog.merge_upsert(spark, path,
                        _df(spark, [(2, 20), (9, 9)]), ["k"])
    got = {r["k"]: (r["v"], r["v2"], r["tag"]) for r in
           txnlog.snapshot(spark, path).collect()}
    assert got[2] == (20, 40, "hi")       # updated row recomputed
    assert got[9] == (9, 18, "hi")        # insert computed
    assert got[1] == (1, 2, None)         # kept row untouched
    # the property survives the merge manifest
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["generated"] == GEN
    # a provided-mismatched generated value refuses the whole merge
    bad = (_df(spark, [(1, 100)])
           .selectExpr("k", "v", "v * 3 AS v2"))
    v = txnlog.latest_version(path)
    with pytest.raises(txnlog.ConstraintViolation,
                       match="generated:v2"):
        txnlog.merge_upsert(spark, path, bad, ["k"])
    assert txnlog.latest_version(path) == v
    assert {r["k"]: r["v"] for r in
            txnlog.snapshot(spark, path).collect()}[1] == 1


def test_property_carried_through_compact_and_describe(spark):
    path = _mk(spark, "t_carry")
    txnlog.commit(_df(spark, [(4, 4)]), path, "append")
    txnlog.compact(spark, path)
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    assert man["generated"] == GEN
    txnlog.commit(_df(spark, [(5, 5)]), path, "append")
    got = {r["k"]: r["v2"] for r in
           txnlog.snapshot(spark, path).collect()}
    assert got[5] == 10                   # still computing post-compact
    row = txnlog.describe_detail(spark, path).collect()[0]
    assert sorted(row["generated_cols"]) == ["tag", "v2"]
