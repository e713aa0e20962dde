"""Plan-shape guardrail for the flagship fact chain.

fact_build_star is the only bench entry that has regressed two rounds
running (dim growth: 4 → 6 dims).  Before a 7th dim lands, pin the
invariant that makes the plan scale: the ONLY full-fact-width shuffle
is the dedupe window on trip_uid; every dim resolves via broadcast.
"""

from __future__ import annotations

import re

from conftest import SF_SMOKE

# the small-side shuffle keys the star build is ALLOWED: per-dim
# distinct-NK aggregation inputs (tiny frames)
_DIM_NK_KEYS = {
    "vendor_code", "payment_type_nk", "rate_code_nk", "flag_nk",
    "location_id_nk",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hash_keys(plan: str) -> set[str]:
    """Distinct first-column base names of every hash-partitioning
    exchange.  Distinct, not counted: the persisted trip_clean subtree
    prints once per InMemoryTableScan reference but executes once."""
    return {
        m.group(1).split("#")[0]
        for m in re.finditer(r"Exchange hashpartitioning\((\S+?)[,)]", plan)
    }


def test_fact_star_single_big_side_shuffle(spark):
    """≤ 1 shuffle of the big side; dims broadcast, never sort-merge.

    Since the r13 keyed small-scan spread, the one fact-width
    exchange is the spread's hashpartitioning(event_id) at the
    events scan — trip_uid IS event_id, so alias-aware output
    partitioning satisfies the dedupe window from it and the window
    adds NO second exchange.  Accept either key name but never both:
    both present would mean the spread stopped covering the window
    and the chain regressed to two fact-width shuffles."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    plan = _plan(tf.fact_trip(spark, SF_SMOKE))
    keys = _hash_keys(plan)
    fact_keys = keys - _DIM_NK_KEYS
    assert fact_keys in ({"trip_uid"}, {"event_id"}), keys
    assert plan.count("BroadcastHashJoin") == 6, plan
    assert "SortMergeJoin" not in plan, plan


def test_fact_dim_stage_adds_no_fact_shuffle(spark):
    """The dim-resolve stage on its own (fact_from_clean over a
    materialized trip_clean) must add ZERO fact-width shuffles — its
    only exchanges are the tiny per-dim NK aggregations."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    clean = tf.trip_clean(
        tf.typed_trips(tf.raw_trips(spark, SF_SMOKE))).localCheckpoint()
    plan = _plan(tf.fact_from_clean(clean))
    keys = _hash_keys(plan)
    assert keys <= _DIM_NK_KEYS, keys
    assert "SortMergeJoin" not in plan, plan


def test_fused_dims_equal_per_dim_builds(spark):
    """The fused melt build must produce EXACTLY the per-dim build_dim
    outputs (same surrogate keys, same members) for all five dims —
    including location's numeric rank order surviving the string
    melt."""
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    clean = tf.trip_clean(
        tf.typed_trips(tf.raw_trips(spark, SF_SMOKE))).localCheckpoint()
    fused = tf.fused_star_dims(clean)
    singles = {
        "vendor": tf.dim_vendor(clean),
        "payment": tf.dim_payment(clean),
        "rate_code": tf.dim_rate_code(clean),
        "flag": tf.dim_flag(clean),
        "location": tf.dim_location(clean),
    }
    for name, want in singles.items():
        got = fused[name]
        assert sorted(got.columns) == sorted(want.columns), name
        cols = sorted(want.columns)
        d = (got.select(cols).exceptAll(want.select(cols)).count()
             + want.select(cols).exceptAll(got.select(cols)).count())
        assert d == 0, name
