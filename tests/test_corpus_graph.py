"""Unit semantics for operators/graph.py and operators/corpus.py."""

from __future__ import annotations

import pytest


def test_connected_components_chain_triangle_singleton(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.graph import (
        connected_components)

    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {99} (isolated)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)],
        "src bigint, dst bigint")
    verts = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 4, 10, 11, 12, 99)], "node bigint")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(edges, verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_long_chain_converges(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.graph import (
        connected_components)

    n = 20  # diameter 19 — exercises multi-round convergence + the
    # sum-based fixpoint detection
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint")
    verts = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(edges, verts).collect()}
    assert got == {i: 0 for i in range(n)}


def test_dedup_clusters_canonical_and_size(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame(
        [(i, "x") for i in (1, 2, 3, 7)], "doc_id bigint, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_i bigint, doc_j bigint")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[1]["is_canonical"] and rows[1]["cluster_size"] == 3
    assert not rows[2]["is_canonical"] and rows[2]["cluster_id"] == 1
    assert rows[7]["is_canonical"] and rows[7]["cluster_size"] == 1


def test_doc_chunks_windows_and_short_docs(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import doc_chunks

    docs = spark.createDataFrame(
        [
            (1, " ".join(str(i) for i in range(10))),  # 10 toks: chunks @1,@5,@9
            (2, "only three tokens"),                  # single short chunk
            (3, ""),                                   # no tokens → no chunks
        ],
        "doc_id bigint, text string")
    rows = doc_chunks(docs, chunk=4, stride=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == ["0 1 2 3", "4 5 6 7", "8 9"]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 2]
    assert [r["start_tok"] for r in c1] == [1, 5, 9]
    assert by_doc[2][0]["chunk_text"] == "only three tokens"
    assert 3 not in by_doc


def test_pii_redact_counts_and_spans(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and x@y.io or +1-555-123-4567 now"),
            (2, "no pii here"),
        ],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted_text"] == \
        "mail <EMAIL> and <EMAIL> or <PHONE> now"
    assert rows[2]["n_emails"] == 0 and rows[2]["redacted_text"] == "no pii here"


def test_stratified_sample_deterministic_and_rate(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import (
        stratified_sample)

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id bigint, lang string")
    kept1 = {r["doc_id"] for r in
             stratified_sample(docs, {"en": 0.5}, 0.25).collect()}
    kept2 = {r["doc_id"] for r in
             stratified_sample(docs, {"en": 0.5}, 0.25).collect()}
    assert kept1 == kept2  # deterministic
    en = sum(1 for d in kept1 if d % 2 == 0) / 1000
    de = sum(1 for d in kept1 if d % 2 == 1) / 1000
    assert en == pytest.approx(0.5, abs=0.08)
    assert de == pytest.approx(0.25, abs=0.08)


def test_vocab_topk_counts(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.corpus import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "A b c"), (3, "b")],
        "doc_id bigint, text string")
    rows = {r["token"]: r for r in vocab_topk(docs, k=2).collect()}
    # lowercased: a→tf3 df2, b→tf3 df3, c cut by k=2; tie a/b → 'a' first
    assert set(rows) == {"a", "b"}
    assert rows["a"]["tf"] == 3 and rows["a"]["df"] == 2 and rows["a"]["rnk"] == 1
    assert rows["b"]["tf"] == 3 and rows["b"]["df"] == 3 and rows["b"]["rnk"] == 2


def test_bigstar_matches_minlabel_on_varied_graphs(spark):
    """The two CC engines must agree on every graph shape: chains,
    triangles, stars, isolated nodes, duplicate/reversed edges."""
    from azure_nyctaxi_lambda_elt_spark.operators.graph import (
        connected_components, connected_components_bigstar)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
         (20, 25), (25, 21), (21, 24), (24, 22),   # zig-zag chain
         (2, 1), (1, 2),                            # dup + reversed
         (30, 30)],                                 # self-loop
        "src bigint, dst bigint")
    verts = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 24, 25,
                        30, 99)], "node bigint")
    a = {r["node"]: r["cluster_id"]
         for r in connected_components(edges, verts).collect()}
    b = {r["node"]: r["cluster_id"]
         for r in connected_components_bigstar(edges, verts).collect()}
    assert a == b
    assert b[25] == 20 and b[22] == 20 and b[30] == 30 and b[99] == 99


def test_bigstar_long_chain_logarithmic_rounds(spark):
    """A 64-node chain (diameter 63) must resolve well inside the
    20-round cap — the O(log²) property the escalation exists for."""
    from azure_nyctaxi_lambda_elt_spark.operators.graph import (
        connected_components_bigstar)

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint")
    verts = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components_bigstar(
               edges, verts, max_iter=10).collect()}
    assert got == {i: 0 for i in range(n)}


def test_dedup_clusters_bigstar_contract(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.graph import (
        dedup_clusters_bigstar)

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_i bigint, doc_j bigint")
    out = {r["doc_id"]: r for r in dedup_clusters_bigstar(docs, pairs).collect()}
    assert out[1]["is_canonical"] and out[1]["cluster_size"] == 3
    assert not out[3]["is_canonical"] and out[3]["cluster_id"] == 1
    assert out[7]["cluster_size"] == 1 and out[7]["is_canonical"]
