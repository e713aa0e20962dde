"""Unit semantics for operators/temporal.py, lsh_jaccard_verified, and
the repetition / distinct-sketch corpus operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def _asof(spark, left_rows, right_rows):
    from azure_nyctaxi_lambda_elt_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        left_rows, "user_id bigint, ts timestamp, event_id bigint")
    right = spark.createDataFrame(
        right_rows,
        "user_id bigint, ts timestamp, click_event_id bigint,"
        " click_value double")
    return asof_join(left, right, "user_id", "ts",
                     ["click_event_id", "click_value"],
                     right_tiebreak="click_event_id")


def test_asof_join_basic_prior_match(spark):
    out = _asof(
        spark,
        [(1, _ts(10), 100), (1, _ts(30), 101)],
        [(1, _ts(5), 900, 1.0), (1, _ts(20), 901, 2.0)],
    ).collect()
    got = {r["event_id"]: r["asof_click_event_id"] for r in out}
    assert got == {100: 900, 101: 901}


def test_asof_join_inclusive_same_instant(spark):
    # right at the exact left ts matches (<= semantics)
    out = _asof(spark, [(1, _ts(10), 100)], [(1, _ts(10), 900, 1.0)]).collect()
    assert out[0]["asof_click_event_id"] == 900


def test_asof_join_no_prior_is_null(spark):
    out = _asof(spark, [(1, _ts(1), 100)], [(1, _ts(5), 900, 1.0)]).collect()
    assert out[0]["asof_click_event_id"] is None
    assert out[0]["asof_click_value"] is None


def test_asof_join_tiebreak_dedupes_right(spark):
    # two right rows at the same (user, ts): max tiebreak id wins
    out = _asof(
        spark,
        [(1, _ts(10), 100)],
        [(1, _ts(5), 900, 1.0), (1, _ts(5), 901, 2.0)],
    ).collect()
    assert out[0]["asof_click_event_id"] == 901


def test_asof_join_partition_isolation(spark):
    # user 2's clicks must never match user 1's purchases
    out = _asof(spark, [(1, _ts(10), 100)], [(2, _ts(5), 900, 1.0)]).collect()
    assert out[0]["asof_click_event_id"] is None


def test_range_join_buckets_boundaries_and_empty(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.temporal import (
        range_join_buckets)

    iv = spark.createDataFrame(
        [(1, 10, _ts(0), dt.datetime(2024, 1, 1, 14, 0)),
         (2, 11, _ts(0), dt.datetime(2024, 1, 1, 14, 0))],
        "user_id bigint, interval_id bigint, w_start timestamp,"
        " w_end timestamp")
    pts = spark.createDataFrame(
        [(1, _ts(0), 1.0),                          # == start: included
         (1, dt.datetime(2024, 1, 1, 14, 0), 2.0),  # == end: excluded
         (1, dt.datetime(2024, 1, 1, 13, 59), 4.0),  # inside, 2nd bucket
         (1, dt.datetime(2024, 1, 1, 15, 0), 8.0)],  # after
        "user_id bigint, ts timestamp, value double")
    out = {r["interval_id"]: (r["n_in_window"], r["value_in_window"])
           for r in range_join_buckets(
               iv, pts, "user_id", "interval_id", "w_start", "w_end",
               "ts", "value").collect()}
    assert out[10] == (2, 5.0)
    assert out[11] == (0, 0.0)  # interval with no points survives


def test_range_join_buckets_small_bucket_width(spark):
    # bucket width much smaller than the interval: explode covers all
    from azure_nyctaxi_lambda_elt_spark.operators.temporal import (
        range_join_buckets)

    iv = spark.createDataFrame(
        [(1, 10, _ts(0), dt.datetime(2024, 1, 1, 13, 0))],
        "user_id bigint, interval_id bigint, w_start timestamp,"
        " w_end timestamp")
    pts = spark.createDataFrame(
        [(1, _ts(k), 1.0) for k in range(0, 60, 7)],
        "user_id bigint, ts timestamp, value double")
    out = range_join_buckets(iv, pts, "user_id", "interval_id",
                             "w_start", "w_end", "ts", "value",
                             bucket_seconds=60).collect()
    assert out[0]["n_in_window"] == 9


def test_lsh_jaccard_verified_subset_of_candidates(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import (
        lsh_jaccard_verified, minhash_lsh_candidates)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),  # identical
         (3, "completely different text with no overlap at all here")],
        "doc_id bigint, text string")
    ver = lsh_jaccard_verified(docs, n=3, threshold=0.3).collect()
    cand = {(r["doc_i"], r["doc_j"])
            for r in minhash_lsh_candidates(docs, 3).collect()}
    assert {(r["doc_i"], r["doc_j"]) for r in ver} <= cand or not cand
    exact = {(r["doc_i"], r["doc_j"]): r for r in ver}
    assert exact[(1, 2)]["jaccard"] == 1.0
    assert exact[(1, 2)]["is_dup"] is True


def test_doc_repetition_extremes(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import doc_repetition

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, ""), (4, "solo")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in doc_repetition(docs).collect()}
    assert 3 not in out  # zero-token doc dropped
    r1 = out[1]
    assert r1["top_token_frac"] == 1.0
    assert r1["dup_2gram_frac"] == round((3 - 1) / 3, 6)
    assert r1["is_repetitive"] is True
    r2 = out[2]
    assert r2["top_token_frac"] == 0.25
    assert r2["dup_2gram_frac"] == 0.0
    assert r2["is_repetitive"] is True  # 0.25 > 0.2 top-token cut
    r4 = out[4]  # single token: no 2-grams → frac 0, top frac 1.0
    assert r4["dup_2gram_frac"] == 0.0
    assert r4["top_token_frac"] == 1.0


def test_distinct_sketch_exact_and_deterministic(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import (
        distinct_token_estimate)

    docs = spark.createDataFrame(
        [(1, "a b c a", "en"), (2, "b c d", "en"), (3, "x y", "fr")],
        "doc_id bigint, text string, lang string")
    out1 = sorted(map(tuple, distinct_token_estimate(docs).collect()))
    out2 = sorted(map(tuple, distinct_token_estimate(docs).collect()))
    assert out1 == out2  # md5-threshold sampling is run-stable
    by_lang = {t[0]: t for t in out1}
    assert by_lang["en"][1] == 4  # a b c d
    assert by_lang["fr"][1] == 2
    for t in out1:  # estimate = 32 * sampled, rounded to 1dp
        assert t[3] == round(t[2] * 32.0, 1)


# ---------------------------------------------------------------------------
# t-digest


def test_tdigest_merge_property_and_accuracy():
    """merge(digest(A), digest(B)) must estimate quantiles of A∪B
    within the same rank-error budget as digest(A∪B) — the mergeable
    guarantee a distributed tree-merge relies on."""
    import numpy as np

    from azure_nyctaxi_lambda_elt_spark.operators.tdigest import (
        build_digest, digest_quantile, merge_digests, rank_error_bound)

    rng = np.random.RandomState(7)
    a = rng.lognormal(0.0, 1.0, 20_000)
    b = rng.normal(50.0, 5.0, 15_000)
    union = np.sort(np.concatenate([a, b]))
    n = len(union)

    merged = merge_digests(build_digest(a), build_digest(b))
    direct = build_digest(union)
    for q in (0.5, 0.9, 0.99):
        err = rank_error_bound(n, q)
        import math
        target = int(math.ceil(q * n))
        lo = union[max(1, target - err) - 1]
        hi = union[min(n, target + err) - 1]
        for label, d in (("merged", merged), ("direct", direct)):
            est = digest_quantile(*d, q)
            assert lo <= est <= hi, (label, q, est, lo, hi)


def test_tdigest_brackets_query(spark):
    """The catalog entry's ok flags must hold and its brackets must be
    genuine order statistics of the group."""
    from conftest import SF_SMOKE

    from azure_nyctaxi_lambda_elt_spark.plans.serving2_catalog import (
        q_tdigest_quantiles)

    rows = q_tdigest_quantiles(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        for c in ("p50", "p90", "p99"):
            assert getattr(r, f"{c}_ok") is True, (r.event_type, c)
            assert getattr(r, f"{c}_lo") <= getattr(r, f"{c}_hi")
