"""Unit semantics for extension set J (round 3): BM25, bigram-LM
scoring, CMS heavy hitters, duplicate-span ladder — on tiny crafted
frames plus python-replicated math."""

from __future__ import annotations

import math

import pytest


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "spark hash spark join table"),
        (2, "sort merge sort merge sort"),
        (3, "window scan window scan window scan window"),
        (4, "the quick brown fox"),
        (5, "spark hash"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_python_reference(docs):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        BM25_B, BM25_K1, BM25_QUERIES, bm25_topk)

    corpus = {
        1: "spark hash spark join table".split(),
        2: "sort merge sort merge sort".split(),
        3: "window scan window scan window scan window".split(),
        4: "the quick brown fox".split(),
        5: "spark hash".split(),
    }
    n_docs = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n_docs

    def py_score(terms, doc):
        toks = corpus[doc]
        from decimal import Decimal
        s = Decimal(0)
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for d in corpus.values() if t in d)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            tfn = tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) / avgdl))
            s += Decimal(str(round(idf * tfn, 6)))
        return round(float(s), 6)

    out = {(r["query_id"], r["doc_id"]): r["score"]
           for r in bm25_topk(docs).collect()}
    queries = dict(BM25_QUERIES)
    # doc 1 and doc 5 both match q_spark_hash; python reference agrees
    assert out[("q_spark_hash", 1)] == py_score(queries["q_spark_hash"], 1)
    assert out[("q_spark_hash", 5)] == py_score(queries["q_spark_hash"], 5)
    # doc 4 contains no query terms for q_sort_merge → absent
    assert ("q_sort_merge", 4) not in out
    # shorter doc with same tf beats longer doc (length normalization):
    # doc 5 has tf(spark)=1 in 2 tokens; doc 1 tf=2 in 5 tokens — doc 1
    # still wins on tf, so just assert both present and ordered by score
    assert out[("q_spark_hash", 1)] > 0 and out[("q_spark_hash", 5)] > 0


def test_bm25_rank_is_dense_per_query(docs):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import bm25_topk

    rows = bm25_topk(docs).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_ngram_lm_score_python_reference(docs):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import ngram_lm_score

    corpus = {
        1: "spark hash spark join table".split(),
        2: "sort merge sort merge sort".split(),
        3: "window scan window scan window scan window".split(),
        4: "the quick brown fox".split(),
        5: "spark hash".split(),
    }
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for toks in corpus.values():
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)

    def py_nll(doc):
        # HALF_UP like Spark/DuckDB round(), not python's banker's
        from decimal import ROUND_HALF_UP, Decimal
        toks = corpus[doc]
        terms = [
            Decimal(str(round(-math.log(
                (big[(a, b)] + 1.0) / (uni[a] + v)), 6)))
            for a, b in zip(toks, toks[1:])
        ]
        q = Decimal(str(float(sum(terms)) / len(terms)))
        return float(q.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))

    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    for d, toks in corpus.items():
        assert out[d]["n_bigrams"] == len(toks) - 1
        assert out[d]["avg_nll"] == py_nll(d)
    # repeated bigrams (doc 2/3) are more probable → lower nll than the
    # all-unique doc 4
    assert out[3]["avg_nll"] < out[4]["avg_nll"]


def test_ngram_lm_short_doc_zero(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import ngram_lm_score

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens here")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["avg_nll"] == 0.0
    assert out[2]["n_bigrams"] == 2


def test_cms_never_undercounts(docs):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        cms_heavy_hitters)

    rows = cms_heavy_hitters(docs).collect()
    assert rows, "tiny corpus: every token clears the 1% bar"
    for r in rows:
        assert r["est_count"] >= r["exact_count"]
        assert r["overcount"] == r["est_count"] - r["exact_count"]
    # tiny vocab in 2048 cells: no collisions → est exact
    exact = {r["token"]: r["exact_count"] for r in rows}
    assert exact["spark"] == 3 and exact["sort"] == 3 and exact["window"] == 4


def test_dup_span_ladder(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        SPAN_LADDER, longest_dup_span)

    run16 = " ".join(f"t{i}" for i in range(16))
    run8 = " ".join(f"u{i}" for i in range(8))
    rows = [
        (1, run16 + " tail one"),          # shares the 16-run with doc 2
        (2, "head " + run16),
        (3, run8 + " filler filler2"),     # shares only the 8-run with 4
        (4, "other " + run8),
        (5, "completely unique words that never repeat anywhere at all "
            "plus padding so length exceeds eight tokens easily"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["max_dup_span"] for r in longest_dup_span(docs).collect()}
    assert out[1] == 16 and out[2] == 16
    assert out[3] == 8 and out[4] == 8
    assert out[5] == 0
    assert all(v in {0, *SPAN_LADDER} for v in out.values())


def test_source_kl_single_source_is_zero(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        source_kl_divergence)

    docs = spark.createDataFrame(
        [(1, "a b c", "s0"), (2, "c b a", "s0")],
        "doc_id long, text string, source string")
    out = source_kl_divergence(docs).collect()
    assert len(out) == 1
    r = out[0]
    # one source ⇒ P = Q ⇒ KL exactly 0
    assert r["kl_vs_corpus"] == 0.0
    assert r["n_tokens"] == 6 and r["n_types"] == 3


def test_source_kl_nonnegative_and_skew_ranks_higher(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        source_kl_divergence)

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h", "balanced"),
         (2, "a a a a a a a a", "skewed"),
         (3, "a b c d a b c d", "mixed")],
        "doc_id long, text string, source string")
    out = {r["source"]: r["kl_vs_corpus"]
           for r in source_kl_divergence(docs).collect()}
    # Gibbs: KL ≥ 0 (up to the 1e-12 rounding grid)
    assert all(v >= -1e-6 for v in out.values())
    # the source furthest from the corpus mix diverges most
    assert out["skewed"] > out["balanced"] > 0


def test_heaps_law_curve_prefix_semantics(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        heaps_law_curve)

    # 60 docs: doc i introduces token "t{i}" plus always-present "the"
    rows = [(i, f"the t{i}") for i in range(1, 61)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["checkpoint_docs"]: r for r in heaps_law_curve(docs).collect()}
    # checkpoints beyond the 60-doc corpus are dropped
    assert set(out) == {50}
    assert out[50]["cum_tokens"] == 100       # 2 tokens/doc × 50 docs
    assert out[50]["vocab_size"] == 51        # "the" + t1..t50


def test_watermark_lateness_ordered_vs_disordered(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        watermark_lateness_profile)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        # user 1, ordered feed: no lateness
        (1, s(0), 1, "a", 0.0, None), (2, s(10), 1, "a", 0.0, None),
        (3, s(20), 1, "a", 0.0, None),
        # user 2, one event 30s late behind the running max
        (4, s(100), 2, "b", 0.0, None), (5, s(70), 2, "b", 0.0, None),
        (6, s(110), 2, "b", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["event_type"]: r
           for r in watermark_lateness_profile(ev).collect()}
    assert out["a"]["n_late"] == 0 and out["a"]["max_lateness_sec"] == 0
    assert out["b"]["n_late"] == 1 and out["b"]["max_lateness_sec"] == 30


def test_source_overlap_matrix_shared_grams(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        source_overlap_matrix)

    run = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, run + " sa tail", "s1"),
         (2, run + " sb tail", "s2"),       # shares exactly the w0..w7 gram
         (3, "totally different words all over this longer document", "s3")],
        "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r
           for r in source_overlap_matrix(docs).collect()}
    assert out[("s1", "s2")]["n_shared"] == 1
    assert ("s1", "s3") not in out  # no shared grams → no row
    j = out[("s1", "s2")]
    assert j["jaccard"] == round(1 / (j["n_grams_a"] + j["n_grams_b"] - 1), 6)


def test_attribution_last_touch_window_and_ties(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        attribution_last_touch)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        (1, m(0), 7, "click", 0.0, None),
        (2, m(30), 7, "click", 0.0, None),    # last touch for purchase 10
        (3, m(30), 7, "click", 0.0, None),    # same ts → higher id wins
        (10, m(45), 7, "purchase", 9.99, None),
        (4, m(100), 8, "click", 0.0, None),   # 65 min before → outside 60m
        (11, m(165), 8, "purchase", 5.0, None),
        (12, m(200), 9, "purchase", 1.0, None),  # user never clicked
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["purchase_id"]: r for r in attribution_last_touch(ev).collect()}
    assert out[10]["click_id"] == 3 and out[10]["user_id"] == 7
    assert out[11]["click_id"] is None and out[11]["user_id"] == 8
    assert out[12]["click_id"] is None


def test_dup_graph_triangles_census(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        dup_graph_triangles)

    # K4 on {1,2,3,4} (4 triangles) + a chain 10-11-12 (0 triangles)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (10, 11), (11, 12)],
        "doc_i bigint, doc_j bigint")
    r = dup_graph_triangles(pairs).collect()[0]
    assert r["n_nodes"] == 7 and r["n_edges"] == 8
    assert r["n_triangles"] == 4
    # open wedges: K4 = 4·C(3,2)=12, chain: node 11 has C(2,2)=1 → 13
    assert r["clustering_coef"] == round(3.0 * 4 / 13, 6)


def test_time_weighted_avg_weights_by_duration(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        time_weighted_avg)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # value 10 held for 90s, value 20 held for 10s, last has no weight
        (1, t0, 1, "a", 10.0, None),
        (2, t0 + dt.timedelta(seconds=90), 1, "a", 20.0, None),
        (3, t0 + dt.timedelta(seconds=100), 1, "a", 99.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = time_weighted_avg(ev).collect()[0]
    assert r["n_segments"] == 2
    assert r["covered_us"] == 100_000_000
    assert r["twap"] == round((10.0 * 90 + 20.0 * 10) / 100, 6)  # 11.0


def test_column_stats_histogram_equi_depth(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        column_stats_histogram)

    li = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 101)],
        "l_orderkey long, l_linenumber int, l_extendedprice double")
    out = {r["bucket"]: r for r in column_stats_histogram(li).collect()}
    assert len(out) == 10
    assert all(out[b]["n_rows"] == 10 for b in out)
    assert out[1]["lo"] == 1.0 and out[1]["hi"] == 10.0
    assert out[10]["lo"] == 91.0 and out[10]["hi"] == 100.0
    # buckets tile the domain without overlap
    for b in range(1, 10):
        assert out[b]["hi"] < out[b + 1]["lo"]


def test_session_window_agg_merges_and_splits(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        session_window_agg)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        (1, m(0), 7, "a", 1.0, None),
        (2, m(10), 7, "a", 2.0, None),    # same session (gap 10 < 30)
        (3, m(50), 7, "a", 4.0, None),    # gap 40 → new session
        (4, m(0), 8, "a", 8.0, None),     # other user: own session
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = sorted(session_window_agg(ev).collect(),
                 key=lambda r: (r["user_id"], r["session_start"]))
    assert [(r["user_id"], r["n_events"], r["session_value"]) for r in out] \
        == [(7, 2, 3.0), (7, 1, 4.0), (8, 1, 8.0)]
    assert out[0]["session_end"] == m(40)   # last event + 30 min gap


def test_fuzzy_linkage_complete_vs_brute_force(spark):
    """Split-half blocking must find EVERY lev<=1 pair the brute-force
    cross product finds (pigeonhole completeness for one substitution),
    and nothing above the threshold."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        fuzzy_name_linkage)

    names = ["ID#0001", "ID#0002", "ID#0011", "ID#9999",
             "ID#0101", "XX#0001"]
    cust = spark.createDataFrame([(n,) for n in names], "c_name string")
    got = {(r["name_a"], r["name_b"]): r["lev"]
           for r in fuzzy_name_linkage(cust).collect()}

    def lev(a, b):
        import itertools
        d = {(i, 0): i for i in range(len(a) + 1)}
        for j in range(len(b) + 1):
            d[(0, j)] = j
        for i, j in itertools.product(range(1, len(a) + 1),
                                      range(1, len(b) + 1)):
            d[(i, j)] = min(d[i-1, j] + 1, d[i, j-1] + 1,
                            d[i-1, j-1] + (a[i-1] != b[j-1]))
        return d[len(a), len(b)]

    brute = {(a, b): lev(a, b)
             for i, a in enumerate(sorted(names))
             for b in sorted(names)[i+1:] if lev(a, b) <= 1}
    assert got == brute
    assert ("ID#0001", "ID#0002") in got and got[("ID#0001", "ID#0002")] == 1
    assert ("ID#0001", "ID#9999") not in got


def test_quality_calibration_deciles_and_ece(spark):
    """Equal-frequency deciles: bucket sizes differ by at most one,
    every scored+flagged doc lands in exactly one bucket, frac_keep
    is a true fraction, and ECE is the n-weighted mean absolute gap
    (in [0, 1], constant across rows)."""
    from conftest import SF_SMOKE

    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        q_quality_calibration)

    rows = q_quality_calibration(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 10
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal-frequency NTILE
    assert len({r["bucket"] for r in rows}) == len(rows)
    eces = {r["ece"] for r in rows}
    assert len(eces) == 1  # one corpus-level ECE, repeated
    ece = eces.pop()
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0.0 <= r["frac_keep"] <= 1.0
        assert 0.0 <= r["mean_score"] <= 1.0
    # ECE really is the n-weighted mean |mean_score - frac_keep|
    n_all = sum(sizes)
    want = sum(r["n_docs"] * abs(r["mean_score"] - r["frac_keep"])
               for r in rows) / n_all
    assert abs(ece - want) < 1e-6


def test_rrf_fusion_combines_both_rank_lists(docs):
    """RRF semantics on the crafted corpus: every fused row carries
    each system's rank (0 = absent from that top-K list), the fused
    score is exactly sum of round(1/(60+rank), 6) over present
    systems, and a doc ranked by BOTH systems outscores a doc the
    same rank in one list only."""
    from azure_nyctaxi_lambda_elt_spark.plans.ext3_catalog import (
        RRF_K, rrf_fusion_topk)

    out = rrf_fusion_topk(docs).collect()
    assert out, "fusion produced no rows"
    for r in out:
        want = round(
            (round(1.0 / (RRF_K + r["rnk_bm25"]), 6)
             if r["rnk_bm25"] > 0 else 0.0)
            + (round(1.0 / (RRF_K + r["rnk_tfidf"]), 6)
               if r["rnk_tfidf"] > 0 else 0.0), 6)
        assert r["rrf_score"] == pytest.approx(want, abs=1e-9)
        assert r["rnk_bm25"] > 0 or r["rnk_tfidf"] > 0
    # per query: rnk is dense 1..n and ordered by fused score desc
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # doc 1 ('spark hash spark join table') and doc 5 ('spark hash')
    # both rank for q_spark_hash in BOTH systems: their fused score
    # must exceed any doc present in only one list at any rank
    spark_rows = {r["doc_id"]: r for r in by_q["q_spark_hash"]}
    both = [r for r in spark_rows.values()
            if r["rnk_bm25"] > 0 and r["rnk_tfidf"] > 0]
    only = [r for r in spark_rows.values()
            if (r["rnk_bm25"] > 0) != (r["rnk_tfidf"] > 0)]
    assert both, "expected docs ranked by both systems"
    if only:
        assert min(r["rrf_score"] for r in both) > \
            max(r["rrf_score"] for r in only) - 2.0 / (RRF_K + 1)
