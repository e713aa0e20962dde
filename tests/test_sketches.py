"""Accuracy pins for the approximate sketches (rows-only ops): the
GK quantile sketch and HLL distinct-count must land within their
documented error bounds of the exact answers."""

from __future__ import annotations

from conftest import SF_SMOKE


def _exact_quantiles(spark, sf_dir):
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf

    ev = tf.events_ts_fixed(spark, sf_dir).select("event_type", "value")
    rows = ev.collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    out = {}
    for t, vals in by_type.items():
        vals.sort()
        out[t] = {
            q: vals[min(len(vals) - 1, int(q * len(vals)))]
            for q in (0.5, 0.9, 0.99)
        }
    return out


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx(accuracy=10000) guarantees rank error
    ≤ n/10000; with sf0.001's group sizes that is ≲ 1 rank — compare
    against the exact empirical quantile with a small value
    tolerance."""
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_approx_quantile_sketch)

    exact = _exact_quantiles(spark, SF_SMOKE)
    got = {r.event_type: r
           for r in q_approx_quantile_sketch(spark, SF_SMOKE).collect()}
    assert set(got) == set(exact)
    for t, e in exact.items():
        spread = max(e[0.99], 1.0) - min(e[0.5], 0.0)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            row = got[t]
            lo = getattr(row, f"{col}_lo")
            hi = getattr(row, f"{col}_hi")
            # the sketch landed inside its exact rank-error bracket
            assert getattr(row, f"{col}_ok") is True, (t, q)
            assert lo <= hi
            # and the bracket itself hugs the exact quantile
            assert lo - 1e-9 <= e[q] <= hi + 0.05 * spread + 1e-6, (
                t, q, lo, hi, e[q])


def test_hll_within_rsd(spark):
    """approx_count_distinct(rsd=0.02) must land within ~3×rsd of the
    exact distinct count (3 standard deviations)."""
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_hll_distinct_users)

    ev = tf.events_ts_fixed(spark, SF_SMOKE)
    exact = {r.event_type: r.n
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    got = {r.event_type: r.approx_users
           for r in q_hll_distinct_users(spark, SF_SMOKE).collect()}
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) <= max(3, 0.06 * n), (t, got[t], n)
