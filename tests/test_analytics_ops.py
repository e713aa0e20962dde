"""Edge-case unit semantics for the round-1 widening batch:
SCD2 build, benchmark decontamination, tf-idf, length histogram.
(Value parity vs DuckDB is covered by test_oracle_parity.py; these
pin the per-operator contracts on tiny adversarial frames.)
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import corpus as cp


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_scd2_collapses_consecutive_same_values(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import q_scd2_dim  # noqa: F401  (shape doc)
    from pyspark.sql import Window

    rows = [
        # user 1: A A B A  → 3 versions (A, B, A), middle run collapsed
        (1, _ts("2024-01-01T00:00:00"), 1, "A"),
        (1, _ts("2024-01-01T01:00:00"), 2, "A"),
        (1, _ts("2024-01-01T02:00:00"), 3, "B"),
        (1, _ts("2024-01-01T03:00:00"), 4, "A"),
        # user 2: single observation → one current row
        (2, _ts("2024-01-01T00:00:00"), 5, "Z"),
    ]
    e = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("_prev", F.lag("event_type").over(w))
        .where(F.col("_prev").isNull() | (F.col("event_type") != F.col("_prev")))
    )
    out = changes.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    ).collect()

    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.version)
    assert [r.attr_value for r in u1] == ["A", "B", "A"]
    # interval chain: valid_to of v(n) == valid_from of v(n+1); last open
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    assert u1[2].valid_to is None and u1[2].is_current
    assert not u1[0].is_current and not u1[1].is_current
    (u2,) = [r for r in out if r.user_id == 2]
    assert u2.is_current and u2.version == 1


def test_benchmark_decontam_flags_normalized_dups(spark):
    rows = [
        (10, "The  quick brown fox"),   # benchmark (id % 10 == 0)
        (20, "unique benchmark text"),  # benchmark
        (11, "the quick BROWN fox "),   # corpus — normalizes to doc 10's text
        (12, "totally different"),      # corpus — clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cp.benchmark_decontam(docs).collect()}
    assert set(out) == {11, 12}  # benchmark rows are not in the output
    assert out[11].is_contaminated and out[11].benchmark_doc_id == 10
    assert not out[12].is_contaminated and out[12].benchmark_doc_id is None


def test_tfidf_rare_term_outranks_common(spark):
    rows = [
        (1, "alpha alpha zebra zebra"),
        (2, "alpha beta"),
        (3, "alpha gamma"),
        (4, "alpha delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cp.tfidf_topk(docs, k=1).collect()
    top = {r.doc_id: r.token for r in out}
    # equal tf in doc 1, but 'zebra' (df=1, idf=ln(5/2)+1) outranks
    # 'alpha' (df=4, idf=ln(5/5)+1=1)
    assert top[1] == "zebra"
    assert all(r.rnk == 1 for r in out)


def test_doc_len_histogram_buckets_and_mass(spark):
    rows = [
        (1, "a b c", "en"),                      # 3 tokens → bucket 0
        (2, " ".join(["t"] * 50), "en"),         # 50 tokens → bucket 1
        (3, " ".join(["t"] * 149), "en"),        # 149 → bucket 2
        (4, "x", "de"),                          # 1 → bucket 0 (other lang)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.lang, r.bucket): r for r in cp.doc_length_histogram(docs).collect()}
    assert out[("en", 0)].n_docs == 1 and out[("en", 0)].total_tokens == 3
    assert out[("en", 1)].bucket_lo == 50 and out[("en", 1)].min_tokens == 50
    assert out[("en", 2)].max_tokens == 149
    assert out[("de", 0)].n_docs == 1


def test_bigram_topk_counts_duplicates(spark):
    rows = [(1, "a b a b"), (2, "a b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bigram: r for r in cp.bigram_topk(docs, k=10).collect()}
    # doc1 contributes 'a b' twice ('a b','b a','a b'), doc2 once
    assert out["a b"].tf == 3 and out["a b"].df == 2
    assert out["b a"].tf == 1 and out["b a"].df == 1
    assert out["a b"].rnk == 1
