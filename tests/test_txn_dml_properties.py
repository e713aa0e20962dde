"""Property-based tests (hypothesis) for the predicate DML surface
(operators/txnlog.py delete_where / update_where): whatever lane the
engine picks — DV tombstones behind the collision safety probe,
copy-on-write rewrite, or the no-op version — the visible table
state must equal a row-at-a-time Python reference applying SQL
WHERE/UPDATE NULL semantics, across random tables, commit splits,
predicates, and key declarations."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

# unique ids; grp may be NULL; v small ints (ties likely)
ROWS = st.lists(
    st.tuples(st.integers(0, 999),
              st.sampled_from(["a", "b", "c", None]),
              st.integers(-20, 20)),
    min_size=1, max_size=24, unique_by=lambda r: r[0])

# (template, python-evaluator) pairs; evaluator returns True/False
# with SQL NULL semantics collapsed to False (WHERE drops NULL)
PREDS = st.sampled_from([
    ("v > 5", lambda r: r[2] > 5),
    ("v <= -3", lambda r: r[2] <= -3),
    ("grp = 'a'", lambda r: r[1] == "a"),
    ("grp IS NULL", lambda r: r[1] is None),
    ("id % 3 = 1", lambda r: r[0] % 3 == 1),
    ("v > 0 AND grp = 'b'", lambda r: r[2] > 0 and r[1] == "b"),
    ("id >= 500", lambda r: r[0] >= 500),
    ("id < 0", lambda r: False),          # no-op lane
])

KEYS = st.sampled_from([None, ["id"], ["grp"]])
SPLIT = st.integers(0, 999)


def _commit_rows(spark, path, rows, split):
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    lo = df.where(f"id <= {split}")
    hi = df.where(f"id > {split}")
    txnlog.commit(lo, path, "overwrite", stats_cols=["id"])
    if hi.limit(1).count():
        txnlog.commit(hi, path, "append", stats_cols=["id"])


def _state(spark, path):
    return {(r["id"], r["grp"], r["v"]) for r in
            txnlog.snapshot(spark, path).collect()}


@settings(max_examples=10, deadline=None)
@given(rows=ROWS, pred=PREDS, keys=KEYS, split=SPLIT)
def test_delete_where_equals_reference(spark, tmp_path_factory,
                                       rows, pred, keys, split):
    path = str(tmp_path_factory.mktemp("dml") / "t")
    _commit_rows(spark, path, rows, split)
    sql, ref = pred
    dv = txnlog.delete_where(spark, path, sql, key_cols=keys)
    want = {tuple(r) for r in rows if not ref(r)}
    assert _state(spark, path) == want
    # the pre-delete version still time-travels whole
    assert {(r["id"], r["grp"], r["v"]) for r in
            txnlog.snapshot(spark, path, dv - 1).collect()} \
        == {tuple(r) for r in rows}


@settings(max_examples=10, deadline=None)
@given(rows=ROWS, pred=PREDS, keys=KEYS, split=SPLIT)
def test_update_where_equals_reference(spark, tmp_path_factory,
                                       rows, pred, keys, split):
    path = str(tmp_path_factory.mktemp("dml") / "t")
    _commit_rows(spark, path, rows, split)
    sql, ref = pred
    txnlog.update_where(spark, path, sql, {"v": "v + 1000"},
                        key_cols=keys)
    want = {(r[0], r[1], r[2] + 1000 if ref(r) else r[2])
            for r in rows}
    assert _state(spark, path) == want
    # row count is invariant under UPDATE, by metadata alone
    assert txnlog.metadata_count(path) == len(rows)
