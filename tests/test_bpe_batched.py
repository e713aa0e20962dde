"""Batched BPE training (operators/bpe.py): token-disjoint batch
selection, merge-table equivalence vs the one-merge-per-pass
reference on a corpus where batching is provably safe, and the
round-count reduction that is the point of batching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import bpe


@pytest.fixture()
def safe_docs(spark):
    """A corpus where batching is exactly the sequential greedy order:
    each doc is one isolated pair occurrence, so merges create tokens
    with NO neighbors (no new pairs ever appear) and all top pairs are
    token-disjoint with strictly decreasing counts."""
    rows = []
    i = 0
    for pair, n in [("a b", 100), ("c d", 90), ("e f", 80),
                    ("g h", 70), ("i j", 60)]:
        for _ in range(n):
            rows.append((i, pair, "src"))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")


def test_batched_equals_sequential_on_safe_corpus(safe_docs):
    seq = bpe.bpe_train(safe_docs, n_merges=5, batch_k=1).collect()
    bat = bpe.bpe_train(safe_docs, n_merges=5, batch_k=3).collect()
    # merge-table equivalence: same merges, same order, same counts
    # (corpus_tokens_after is recounted per ROUND in the batched
    # trainer — per merge in the sequential one — so it is excluded)
    key = ["merge_rank", "merge_left", "merge_right", "pair_count"]
    assert [[r[c] for c in key] for r in seq] == \
           [[r[c] for c in key] for r in bat]
    assert [r["merge_left"] + "+" + r["merge_right"] for r in bat] == \
           ["a+b", "c+d", "e+f", "g+h", "i+j"]
    # the final corpus state agrees too: end-of-training token counts
    assert seq[-1]["corpus_tokens_after"] == bat[-1]["corpus_tokens_after"]


def test_select_batch_enforces_token_disjointness(spark):
    pc = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 9), ("c", "d", 8),
         ("e", "f", 7), ("f", "g", 6), ("h", "i", 5)],
        "l string, r string, cnt bigint")
    batch = bpe._select_batch(pc, 4)
    # (b,c) shares b with (a,b); (c,d) shares c with (b,c)? no — (b,c)
    # was REJECTED, so its tokens are not reserved: accepted order is
    # (a,b) -> skip (b,c) -> (c,d) -> (e,f) -> skip (f,g) -> (h,i)
    assert batch == [("a", "b", 10), ("c", "d", 8),
                     ("e", "f", 7), ("h", "i", 5)]


def test_batched_rounds_cut_corpus_passes(safe_docs, monkeypatch):
    """5 merges at batch_k=3 must cost 2 corpus passes, not 5 — the
    scale payoff (O(vocab/k) rounds)."""
    calls = []
    real = bpe._pair_counts

    def spy(strings):
        calls.append(1)
        return real(strings)

    monkeypatch.setattr(bpe, "_pair_counts", spy)
    bpe.bpe_train(safe_docs, n_merges=5, batch_k=3)
    assert len(calls) == 2
    calls.clear()
    bpe.bpe_train(safe_docs, n_merges=5, batch_k=1)
    assert len(calls) == 5


def test_apply_uses_batched_merge_table(safe_docs):
    out = {r["source"]: r for r in bpe.bpe_apply(safe_docs).collect()}
    r = out["src"]
    # every doc collapses from 2 tokens to 1 merged token
    assert r["tokens_before"] == 2 * r["n_docs"]
    assert r["tokens_after"] == r["n_docs"]
    assert abs(r["compression"] - 0.5) < 1e-9


def test_tokens_after_matches_recount_semantics(safe_docs):
    """Batched rows within one round report the SAME post-round
    count, and the value equals before - sum(counts in the round)
    on this no-overlap corpus."""
    bat = bpe.bpe_train(safe_docs, n_merges=5, batch_k=3).collect()
    total_before = 2 * 400  # 400 docs x 2 tokens
    round1 = [r for r in bat if r["merge_rank"] <= 3]
    assert len({r["corpus_tokens_after"] for r in round1}) == 1
    assert round1[0]["corpus_tokens_after"] == \
        total_before - sum(r["pair_count"] for r in round1)


def test_train_on_vocab_equals_train_on_corpus(spark):
    """The Sennrich vocab-table trainer (default) must produce a
    bit-identical merge table to corpus-row training on a corpus WITH
    heavy duplication and within-doc repeats — the weighted pair
    counts, the argmax order, the per-round rewrites, and the weighted
    token recount all have to agree."""
    rows = []
    i = 0
    texts = ["the cat sat on the mat", "the cat sat", "on the mat",
             "a b a b a b", "the cat"]
    for t, n in zip(texts, [40, 25, 25, 10, 1]):
        for _ in range(n):
            rows.append((i, t, f"s{i % 3}"))
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    for k in (1, 3):
        vocab = bpe.bpe_train(docs, n_merges=5, batch_k=k,
                              on_vocab=True).collect()
        corpus = bpe.bpe_train(docs, n_merges=5, batch_k=k,
                               on_vocab=False).collect()
        assert [tuple(r) for r in vocab] == [tuple(r) for r in corpus]
    assert vocab, "corpus must yield merges"


def test_vocab_table_redupes_after_colliding_merge(spark):
    """After a merge two distinct sequences can become equal ('a b c'
    and pre-merged 'a+b c'); the vocab trainer re-dedupes so weights
    consolidate and later pair counts stay exact."""
    rows = ([(i, "a b c", "s") for i in range(10)]
            + [(100 + i, "x y", "s") for i in range(20)])
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    out = bpe.bpe_train(docs, n_merges=2, batch_k=1).collect()
    # merge 1: (x,y) 20 > (a,b)=(b,c) 10 -> x+y; merge 2: a+b (tie l,r)
    assert (out[0]["merge_left"], out[0]["merge_right"]) == ("x", "y")
    assert out[0]["pair_count"] == 20
    assert (out[1]["merge_left"], out[1]["merge_right"]) == ("a", "b")
    assert out[1]["pair_count"] == 10
    # weighted recount: 10 docs x ['a+b','c'] + 20 x ['x+y'] = 40
    assert out[1]["corpus_tokens_after"] == 40
