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


# ------------------------------------------------------------------
# conditional MERGE (merge_upsert_when) vs a row-at-a-time reference
# ------------------------------------------------------------------
# source ids 500..1499: roughly half match the table's 0..999 range
SRC_ROWS = st.lists(
    st.tuples(st.integers(500, 1499),
              st.sampled_from(["a", "b", "z", None]),
              st.integers(-20, 20)),
    min_size=1, max_size=12, unique_by=lambda r: r[0])

# (cond-sql, python-evaluator(s, t)) with NULL collapsing to False
# (WHEN MATCHED AND <cond> fires only on literal TRUE)
CONDS = st.sampled_from([
    ("s.v > t.v", lambda s, t: s[2] > t[2]),
    ("t.grp = 'a'", lambda s, t: t[1] == "a"),
    ("s.v % 2 = 0", lambda s, t: s[2] % 2 == 0),
    (None, lambda s, t: True),
])

# (set_exprs, python-builder(s, t) -> updated row)
SET_FORMS = st.sampled_from([
    (None, lambda s, t: s),
    ({"v": "s.v"}, lambda s, t: (t[0], t[1], s[2])),
    ({"v": "t.v + s.v", "grp": "s.grp"},
     lambda s, t: (t[0], s[1], t[2] + s[2])),
])


@settings(max_examples=10, deadline=None)
@given(rows=ROWS, src=SRC_ROWS, cond=CONDS, setf=SET_FORMS,
       split=SPLIT)
def test_merge_upsert_when_equals_reference(spark, tmp_path_factory,
                                            rows, src, cond, setf,
                                            split):
    path = str(tmp_path_factory.mktemp("mw") / "t")
    _commit_rows(spark, path, rows, split)
    csql, cref = cond
    sexprs, sbuild = setf
    sdf = spark.createDataFrame(src, "id long, grp string, v long")
    v = txnlog.merge_upsert_when(spark, path, sdf, ["id"],
                                 match_cond=csql, set_exprs=sexprs)
    table = {r[0]: tuple(r) for r in rows}
    want = set()
    for t in rows:
        s = next((x for x in src if x[0] == t[0]), None)
        if s is not None and cref(s, t):
            want.add(sbuild(s, tuple(t)))
        else:
            want.add(tuple(t))
    for s in src:
        if s[0] not in table:
            want.add(tuple(s))
    assert _state(spark, path) == want
    # the pre-merge version still time-travels whole
    assert {(r["id"], r["grp"], r["v"]) for r in
            txnlog.snapshot(spark, path, v - 1).collect()} \
        == {tuple(r) for r in rows}


# hostile literal CONTENT through the WHEN MATCHED grammar: the
# quoted payload may contain every keyword / quote form the parser
# splits on — it must land VERBATIM (mis-parse is an error by the
# module contract, a different action is the bug class under test)
HOSTILE = [
    " KEY BY (trap)",
    "WHEN MATCHED AND x THEN UPDATE SET v = 1",
    "it's got quotes, 'nested', even",
    'double "quoted" content',
    "), (1, 2) THEN",
    "s.v > t.v AND DELETE WHEN f",
    "x'); DROP TABLE t; --",
]


@pytest.mark.parametrize("payload", HOSTILE)
def test_when_matched_hostile_literal_content(spark, tmp_path,
                                              payload):
    from azure_nyctaxi_lambda_elt_spark.operators import txnsql

    path = str(tmp_path / "t")
    txnlog.commit(
        spark.createDataFrame([(1, "a", 5)],
                              "id long, grp string, v long"),
        path, "overwrite")
    spark.createDataFrame([(1, "b", 6)],
                          "id long, grp string, v long") \
        .createOrReplaceTempView("hostile_src")
    lit = payload.replace("'", "''")
    txnsql.txn_sql(
        spark,
        f"MERGE INTO '{path}' USING hostile_src KEY BY (id) "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET "
        f"grp = '{lit}', v = s.v")
    row = txnlog.snapshot(spark, path).collect()[0]
    assert row["grp"] == payload and row["v"] == 6
