"""Unit semantics for the extension set (plans/ext_catalog.py):
k-means vs a numpy reference, paragraph dedup winners, heuristic
filter rules, funnel ordering edge cases."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_kmeans_matches_numpy_reference(spark):
    """Spark Lloyd's == the same algorithm run in numpy (same init,
    same iteration count) — assignment-level agreement."""
    from azure_nyctaxi_lambda_elt_spark.operators.clustering import (
        KMEANS_ITERS, KMEANS_K, kmeans_assign)
    from azure_nyctaxi_lambda_elt_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])

    C = X[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(KMEANS_K):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    expected = dict(zip(ids.tolist(), d2.argmin(axis=1).tolist()))

    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(emb).collect()
    }
    assert got == expected
    # every cluster non-trivially populated at this SF
    assert len(set(got.values())) == KMEANS_K


def test_semantic_dedup_matches_numpy_reference(spark):
    """SemDeDup == numpy reference: same k-means assignment, then a doc
    is a dup iff some lower-id SAME-cluster doc has cosine ≥ tau, with
    dup_of = the lowest such id."""
    from azure_nyctaxi_lambda_elt_spark.operators.clustering import (
        KMEANS_ITERS, KMEANS_K, semantic_dedup)
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import SEMDEDUP_TAU
    from azure_nyctaxi_lambda_elt_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])

    C = X[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(KMEANS_K):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)

    norm = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 6)
    expected = {}
    for j in range(len(ids)):
        lower = [i for i in range(j)
                 if cluster[i] == cluster[j] and cos[i, j] >= SEMDEDUP_TAU]
        expected[ids[j]] = (int(cluster[j]),
                            ids[min(lower)] if lower else None)

    got = {r["vec_id"]: (r["cluster_id"], r["dup_of"])
           for r in semantic_dedup(emb, tau=SEMDEDUP_TAU).collect()}
    assert got == expected
    # the threshold actually splits the corpus at this SF
    n_dups = sum(1 for _, d in got.values() if d is not None)
    assert 0 < n_dups < len(got)


def test_paragraph_dedup_first_occurrence_wins(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import paragraph_dedup

    para = "tok " * 15 + "tok"  # exactly 16 tokens, identical content
    docs = spark.createDataFrame(
        [(1, para + " tail words here"), (2, para), (7, "unique words only")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["chunk_id"]): r
           for r in paragraph_dedup(docs).collect()}
    first = out[(1, 0)]
    dup = out[(2, 0)]
    assert not first["is_duplicate"] and dup["is_duplicate"]
    assert dup["canonical_doc_id"] == 1 and dup["canonical_chunk_id"] == 0
    assert dup["group_size"] == 2
    assert not out[(7, 0)]["is_duplicate"]


def test_heuristic_filter_rules(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import (
        FILTER_MIN_TOKENS, heuristic_filter)
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import STOPWORDS

    good = "the quick brown fox and the lazy dog ran with " \
           "some other fine words padding this out to twenty tokens total."
    short = "too short"
    symbols = "the " + "# " * 30 + "and done"
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in heuristic_filter(docs, STOPWORDS["en"]).collect()}
    assert out[1]["keep"]
    assert out[1]["has_terminal_punct"]
    assert not out[2]["keep"] and out[2]["n_tokens"] < FILTER_MIN_TOKENS
    assert not out[3]["keep"] and out[3]["symbol_ratio"] > 0.1
    assert 4 not in out  # zero-token docs dropped


def test_funnel_requires_stage_order(spark):
    """A click BEFORE signup must not count; purchase only counts
    after a qualifying click."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import (
        q_funnel_conversion)

    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 10:00:00", 1, "signup"),
        (2, "2024-01-01 11:00:00", 1, "click"),
        (3, "2024-01-01 12:00:00", 1, "purchase"),
        # u2: click precedes signup; purchase precedes (absent) click
        (4, "2024-01-01 09:00:00", 2, "click"),
        (5, "2024-01-01 10:00:00", 2, "signup"),
        (6, "2024-01-01 11:00:00", 2, "purchase"),
        # u3: no signup at all → excluded
        (7, "2024-01-01 10:00:00", 3, "click"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import azure_nyctaxi_lambda_elt_spark.plans.trips_feed as tf
    orig = tf.events_ts_fixed
    tf.events_ts_fixed = lambda spark_, sf_dir_: ev
    try:
        out = {r["user_id"]: r for r in
               q_funnel_conversion(spark, SF_SMOKE).collect()}
    finally:
        tf.events_ts_fixed = orig

    assert out[1]["funnel_stage"] == 3
    assert out[2]["funnel_stage"] == 1  # pre-signup click ignored
    assert out[2]["t_click"] is None and out[2]["t_purchase"] is None
    assert 3 not in out


def test_snapshot_diff_categories(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext_catalog import q_snapshot_diff

    out = q_snapshot_diff(spark, SF_SMOKE).collect()
    kinds = {r["change_type"] for r in out}
    assert kinds == {"added", "removed", "changed"}
    for r in out:
        if r["change_type"] == "changed":
            assert r["new_price"] == r["old_price"] + 5
