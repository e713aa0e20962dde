"""Property-based tests (hypothesis) for the merge/dedupe algebra the
streaming lane's determinism contract rests on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROW = st.tuples(
    st.integers(0, 5),            # key
    st.integers(0, 100),          # version (recency)
    st.text("ab", min_size=1, max_size=3),  # tiebreak
    st.integers(-50, 50),         # payload
)


def _latest(spark, rows):
    from azure_nyctaxi_lambda_elt_spark.operators.dedupe import latest_wins

    df = spark.createDataFrame(rows, "k int, v int, t string, x int")
    return latest_wins(df, ["k"], [F.col("v").desc(), F.col("t").desc(),
                                   F.col("x").desc()])


@settings(max_examples=15, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=20),
       st.lists(ROW, min_size=0, max_size=20))
def test_latest_wins_is_batching_independent(spark, a, b):
    """latest_wins(A ∪ B) == latest_wins(latest_wins(A) ∪ B) — the
    associativity that makes the streaming upsert's final state
    independent of micro-batch boundaries (streaming/lane.py)."""
    one_shot = sorted(map(tuple, _latest(spark, a + b).collect()))
    incremental = sorted(map(tuple, _latest(
        spark, [tuple(r) for r in _latest(spark, a).collect()] + b).collect()))
    assert one_shot == incremental


@settings(max_examples=10, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=20))
def test_latest_wins_one_row_per_key_and_is_max(spark, rows):
    out = _latest(spark, rows).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))
    best = {}
    for k, v, t, x in rows:
        cand = (v, t, x)
        if k not in best or cand > best[k]:
            best[k] = cand
    assert {r["k"]: (r["v"], r["t"], r["x"]) for r in out} == best


RANK_ROW = st.tuples(
    st.integers(0, 3),             # group
    st.integers(-100, 100),        # value (ties likely)
    st.integers(0, 10_000),        # unique-ish id (tiebreak)
)


@settings(max_examples=10, deadline=None)
@given(st.lists(RANK_ROW, min_size=1, max_size=60, unique_by=lambda r: r[2]))
def test_global_rank_matches_window_form(spark, rows):
    """with_global_rank (range-repartition + offsets) must be
    bit-identical to the unpartitioned-Window rank it replaces, for
    any grouping, tie pattern, and partition spread — including the
    running sum and per-group totals."""
    from pyspark.sql import Window

    from azure_nyctaxi_lambda_elt_spark.operators.ranks import (
        with_global_rank)

    df = spark.createDataFrame(rows, "g int, v int, id int")
    ranked, totals = with_global_rank(
        df, [F.asc("v"), F.asc("id")], value_col="v", group_cols=["g"])
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.select(
        "g", "id",
        F.row_number().over(w).cast("bigint").alias("want_r"),
        F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("want_cum"))
    got = {(r["g"], r["id"]): (r["__r"], r["__cum"])
           for r in ranked.collect()}
    for r in want.collect():
        assert got[(r["g"], r["id"])] == (r["want_r"], r["want_cum"])
    by_g = {}
    for g, v, _ in rows:
        n, s = by_g.get(g, (0, 0))
        by_g[g] = (n + 1, s + v)
    assert {k[0]: v for k, v in totals.items()} == by_g
