"""Exact similarity join via prefix filtering (operators/llm_text.py
prefix_filter_pairs — AllPairs/PPJoin family): recall 1.0 against
the brute all-pairs join at the same integer threshold, knife-edge
prefix lengths, and the length filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import llm_text as lt
from conftest import SF_SMOKE


def _docs(spark):
    return (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text"))


def test_matches_brute_force_exactly(spark):
    """The whole point: prefix pruning must drop NO qualifying pair
    and admit NO extra pair — output identical to the brute
    all-pairs join at the same integer τ (brute run uncapped:
    max_df=None, since the prefix path applies no hot-shingle cap)."""
    docs = _docs(spark)
    got = sorted(map(tuple, lt.prefix_filter_pairs(docs).collect()))
    brute = (lt.ngram_jaccard_pairs(docs, threshold=0.0, max_df=None)
             .where(F.lit(lt.PF_TAU_DEN) * F.expr(
                 "cast(round(jaccard * 1000000) as bigint)")
                 >= F.lit(lt.PF_TAU_NUM) * F.lit(1_000_000)))
    # integer-exact brute: recompute the 5i >= 4u test from raw parts
    # rather than trusting rounded doubles on knife edges
    sh = lt.doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (sh.alias("a").join(
        sh.alias("b"), (F.col("a.hg") == F.col("b.hg"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_i"),
                 F.col("b.doc_id").alias("doc_j"))
        .agg(F.count("*").alias("i")))
    want = sorted(map(tuple, (
        inter.join(sizes.selectExpr("doc_id doc_i", "n na"), "doc_i")
        .join(sizes.selectExpr("doc_id doc_j", "n nb"), "doc_j")
        .withColumn("u", F.col("na") + F.col("nb") - F.col("i"))
        .where(lt.PF_TAU_DEN * F.col("i") >= lt.PF_TAU_NUM * F.col("u"))
        .select("doc_i", "doc_j",
                F.round(F.col("i").cast("double")
                        / F.col("u").cast("double"), 6).alias("jaccard"))
    ).collect()))
    assert len(want) > 0, "smoke data must contain J>=0.8 pairs"
    assert got == want
    assert len(brute.collect()) == len(want)  # rounded brute agrees too


def test_knife_edge_prefix_lengths(spark):
    """Docs engineered so ceil(0.8*n) sits on the integer boundary
    (n=5, 10, 15): identical docs (J=1) must pair, and a pair one
    shingle short of τ must NOT."""
    rows = []
    # doc pair sharing 4 of 5 shingles: J = 4/6 < 0.8 -> out
    base = "w1 w2 w3 w4 w5 w6 w7"        # 5 3-gram shingles
    rows += [(1, base), (2, base.replace("w7", "x7"))]
    # identical 7-word docs: J = 1 -> in
    rows += [(3, "a1 a2 a3 a4 a5 a6 a7"), (4, "a1 a2 a3 a4 a5 a6 a7")]
    # 10-shingle doc vs itself minus last word: i=9, u=10 -> 5*9>=4*10 in
    d12 = " ".join(f"b{i}" for i in range(12))
    d11 = " ".join(f"b{i}" for i in range(11))
    rows += [(5, d12), (6, d11)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_i"], r["doc_j"]): r["jaccard"]
           for r in lt.prefix_filter_pairs(docs).collect()}
    assert (1, 2) not in got
    assert got[(3, 4)] == 1.0
    assert got[(5, 6)] == 0.9


def test_length_filter_excludes_incompatible_sizes(spark):
    """A tiny doc fully contained in a huge one shares prefix tokens
    but can never reach J=0.8 — the integer length filter must prune
    it at candidate time (and the output must not contain it)."""
    small = "c1 c2 c3 c4"                 # 2 shingles
    big = " ".join(f"c{i}" for i in range(1, 40))   # 37 shingles
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string")
    assert lt.prefix_filter_pairs(docs).collect() == []
