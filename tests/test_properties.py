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
