"""Unit semantics for the LLM-pipeline operators (set D) on tiny
crafted frames — edge rows the sf tables don't guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   brown fox jumps over the lazy dog"),  # = 1 after norm
        (3, "the quick brown fox jumps over the lazy cat"),      # near-dup of 1
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog"),      # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import exact_dedup

    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert out[1]["canonical_doc_id"] == 1 and not out[1]["is_duplicate"]
    assert out[2]["canonical_doc_id"] == 1 and out[2]["is_duplicate"]
    assert out[5]["canonical_doc_id"] == 1 and out[5]["is_duplicate"]
    assert out[4]["group_size"] == 1 and not out[4]["is_duplicate"]


def test_ngram_jaccard_finds_near_dup(docs):
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import ngram_jaccard_pairs

    pairs = {(r["doc_i"], r["doc_j"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    assert pairs[(1, 5)] == 1.0          # exact dup
    assert 0.3 <= pairs[(1, 3)] < 1.0    # near dup
    assert all(4 not in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_catches_exact_and_near(docs):
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import (
        N_BANDS, minhash_lsh_candidates)

    cand = {(r["doc_i"], r["doc_j"]): r["n_shared_bands"]
            for r in minhash_lsh_candidates(docs).collect()}
    assert cand[(1, 5)] == N_BANDS  # identical docs share every band
    assert all(4 not in p for p in cand)


def test_simhash_identical_docs_hamming_zero(docs):
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import simhash_pairs

    pairs = {(r["doc_i"], r["doc_j"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=16).collect()}
    assert pairs[(1, 5)] == 0
    assert pairs[(1, 2)] == 0  # simhash is token-multiset based; same tokens


def test_simhash_banding_exact_at_default_threshold(spark):
    """The 4x16-bit banding guarantee: at the default max_hamming (3),
    banded candidate generation finds EVERY pair within threshold —
    compare against brute-force all-pairs hamming on sf0.001 docs."""
    from azure_nyctaxi_lambda_elt_spark.operators.llm_text import (
        SIMHASH_HAMMING_MAX, simhash_halves, simhash_pairs)

    assert SIMHASH_HAMMING_MAX == 3  # the pigeonhole-exact threshold

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    banded = {(r["doc_i"], r["doc_j"]): r["hamming"]
              for r in simhash_pairs(docs).collect()}

    sig = simhash_halves(docs)
    a = sig.select(F.col("doc_id").alias("doc_i"), F.col("h_hi").alias("ahi"),
                   F.col("h_lo").alias("alo"))
    b = sig.select(F.col("doc_id").alias("doc_j"), F.col("h_hi").alias("bhi"),
                   F.col("h_lo").alias("blo"))
    ham = (F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
           + F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))).cast("int")
    brute = {(r["doc_i"], r["doc_j"]): r["h"]
             for r in a.crossJoin(b)
             .where(F.col("doc_i") < F.col("doc_j"))
             .select("doc_i", "doc_j", ham.alias("h"))
             .where(F.col("h") <= SIMHASH_HAMMING_MAX).collect()}
    assert banded == brute


def test_ann_lsh_recall_vs_brute_force(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.ann import (
        cosine_topk, lsh_bucket_topk)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    brute = {(r["q_id"], r["neighbor_id"])
             for r in cosine_topk(emb, pred, 5).collect()}
    bucketed = {(r["q_id"], r["neighbor_id"])
                for r in lsh_bucket_topk(emb, pred, 5).collect()}
    recall = len(brute & bucketed) / len(brute)
    assert recall >= 0.2, f"LSH recall {recall:.2f} too low"
    assert len(bucketed) <= len(brute)  # at most k per query


def test_ann_ivf_recall_vs_brute_force(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.ann import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    brute = {(r["q_id"], r["neighbor_id"])
             for r in cosine_topk(emb, pred, 5).collect()}
    ivf = {(r["q_id"], r["neighbor_id"])
           for r in ivf_topk(emb, pred, 5).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"
    assert len(ivf) <= len(brute)


def test_hard_negative_ivf_recall_and_label_purity(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.ann import (
        hard_negative_mine, ivf_topk)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    brute_rows = hard_negative_mine(emb, pred, 5).collect()
    ivf_rows = ivf_topk(emb, pred, 5, exclude_label_col="label").collect()
    # every mined negative must genuinely mismatch the query label
    assert all(r["q_label"] != r["neg_label"]
               for r in brute_rows + ivf_rows)
    brute = {(r["q_id"], r["neighbor_id"]) for r in brute_rows}
    ivf = {(r["q_id"], r["neighbor_id"]) for r in ivf_rows}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"hard-negative IVF recall {recall:.2f} too low"
    assert len(ivf) <= len(brute)


def test_multimodal_decode_real_formats(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.multimodal import (
        decode_media, decode_one, _encode_bmp, _encode_wav, _encode_gif,
        _bmp_params, _wav_params, _gif_params, with_media_payload)

    # kernel-level: parser recovers the encode params from raw bytes
    for i in (0, 7, 123, 4567):
        w, h = _bmp_params(i)
        d = decode_one(_encode_bmp(i))
        assert (d["width"], d["height"], d["bit_depth"]) == (w, h, 24)
        ch, sr, nf = _wav_params(i)
        d = decode_one(_encode_wav(i))
        assert (d["n_channels"], d["sample_rate"], d["n_frames"]) == (ch, sr, nf)
        gw, gh, fr, _ = _gif_params(i)
        d = decode_one(_encode_gif(i))
        assert (d["width"], d["height"], d["n_frames"]) == (gw, gh, fr)
    # unknown magic must raise, not fake an answer
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_one(b"\x89PNG\r\n\x1a\nxxxxxxxx")

    # distributed path: deterministic + shape-sane
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    a = decode_media(with_media_payload(docs)).collect()
    b = decode_media(with_media_payload(docs)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r["media_type"] in ("image", "audio", "video")
        assert r["byte_len"] > 0 and 0 <= r["data_sum"] < 997
        if r["media_type"] == "image":
            assert r["n_frames"] == 1 and r["width"] >= 16
        if r["media_type"] == "audio":
            assert r["sample_rate"] >= 8000 and r["width"] == 0


def test_lang_id_deterministic_argmax(spark):
    from azure_nyctaxi_lambda_elt_spark.plans.llm_catalog import q_lang_id

    out = q_lang_id(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        scores = {l: r[f"score_{l}"] for l in ("de", "en", "es", "fr", "zh")}
        best = max(scores.values())
        # predicted lang must be the alphabetically-first argmax
        winners = [l for l in sorted(scores) if scores[l] == best]
        assert r["predicted_lang"] == winners[0]


def test_ann_ivfpq_recall_and_refinement(spark):
    """IVF-PQ must match plain IVF's probe-limited recall (the PQ
    approximation may not become the bottleneck once the refinement
    pool re-ranks exactly), and every reported cos_sim must be the
    EXACT dot — refinement, not the quantized estimate."""
    from pyspark.sql import functions as F

    from azure_nyctaxi_lambda_elt_spark.operators.ann import (
        cosine_topk, ivfpq_topk)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pred = F.col("vec_id") % 100 == 0
    brute = {(r["q_id"], r["neighbor_id"]): r["cos_sim"]
             for r in cosine_topk(emb, pred, 5).collect()}
    got = ivfpq_topk(emb, pred, 5).collect()
    pq = {(r["q_id"], r["neighbor_id"]): r for r in got}
    recall = len(set(brute) & set(pq)) / len(brute)
    assert recall >= 0.3, f"IVF-PQ recall {recall:.2f} too low"
    # exact refinement: where PQ found a true neighbor, the reported
    # sim equals brute force's exact value bit-for-bit
    for key in set(brute) & set(pq):
        assert pq[key]["cos_sim"] == brute[key]
    # probing everything isolates PQ quality: recall must improve
    all_probe = {(r["q_id"], r["neighbor_id"])
                 for r in ivfpq_topk(emb, pred, 5, n_probes=16).collect()}
    assert len(set(brute) & all_probe) / len(brute) >= recall


def test_random_projection_hand_example_and_plan(spark):
    """proj_j = dot(e, signs_j)/sqrt(k) with the md5-derived ±1 matrix;
    the plan is map-only (no Exchange at any corpus size)."""
    import math

    from azure_nyctaxi_lambda_elt_spark.operators.ann import (
        DIM, K_PROJ, random_projection, rp_signs)

    signs = rp_signs()
    vec = [float(i % 7) - 3.0 for i in range(DIM)]
    df = spark.createDataFrame(
        [(1, vec, 0)], "vec_id bigint, embedding array<float>, label int")
    out = random_projection(df)
    row = out.collect()[0]
    assert [f.name for f in out.schema.fields] == (
        ["vec_id", "label"] + [f"proj_{j}" for j in range(K_PROJ)])
    fvec = [float(__import__("struct").unpack(
        "f", __import__("struct").pack("f", x))[0]) for x in vec]
    for j in range(K_PROJ):
        acc = 0.0
        for x, s in zip(fvec, signs[j]):
            acc += x * s
        assert row[f"proj_{j}"] == acc / math.sqrt(float(K_PROJ))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_codebook_cache_trains_once_per_key(spark, tmp_path, monkeypatch):
    """fit_centroids(cache_key=...) is the stored-artifact seam: the
    second invocation with the same (key, k, iters) must NOT rerun
    Lloyd (bench reruns and sibling entries amortize the fit), must
    return identical centroids, and a changed key/param must refit."""
    from azure_nyctaxi_lambda_elt_spark.operators import clustering

    monkeypatch.setenv(clustering._CODEBOOK_STORE_ENV,
                       str(tmp_path / "cb"))  # isolate the disk tier
    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (i + 3)) % 17).cast("float")
                  for i in range(8)]).alias("embedding"))
    calls = []
    real_fit = clustering._fit

    def counting_fit(pts, k, iters):
        calls.append((k, iters))
        return real_fit(pts, k, iters)

    clustering.clear_codebook_cache()
    orig = clustering._fit
    clustering._fit = counting_fit
    try:
        a = clustering.fit_centroids(emb, 4, 2, cache_key="t/one")
        b = clustering.fit_centroids(emb, 4, 2, cache_key="t/one")
        assert len(calls) == 1          # second call served from cache
        assert a == b
        c = clustering.fit_centroids(emb, 4, 2, cache_key="t/two")
        assert len(calls) == 2          # new key refits
        assert c == a                   # deterministic fit, same input
        clustering.fit_centroids(emb, 4, 3, cache_key="t/one")
        assert len(calls) == 3          # param change refits
        # mutating a returned codebook must not poison the cache
        a[0][0] = 1e9
        d = clustering.fit_centroids(emb, 4, 2, cache_key="t/one")
        assert d == b
    finally:
        clustering._fit = orig
        clustering.clear_codebook_cache()


def test_codebook_cache_persists_across_sessions(spark, tmp_path,
                                                 monkeypatch):
    """The on-disk codebook artifact is the CROSS-SESSION half of the
    cache: after the in-memory dict is wiped (a process restart), the
    same (key, k, iters) must serve from disk with ZERO Lloyd fits
    and bit-identical centroids; a corrupt artifact refits instead of
    failing; corpus_cache_key invalidates when the file changes."""
    import json
    import os

    from azure_nyctaxi_lambda_elt_spark.operators import clustering

    monkeypatch.setenv(clustering._CODEBOOK_STORE_ENV,
                       str(tmp_path / "cb"))
    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (i + 3)) % 17).cast("float")
                  for i in range(8)]).alias("embedding"))
    calls = []
    real_fit = clustering._fit

    def counting_fit(pts, k, iters):
        calls.append(k)
        return real_fit(pts, k, iters)

    clustering.clear_codebook_cache()
    clustering._fit = counting_fit
    try:
        a = clustering.fit_centroids(emb, 4, 2, cache_key="t/disk")
        assert len(calls) == 1
        clustering._CODEBOOK_CACHE.clear()   # "process restart"
        b = clustering.fit_centroids(emb, 4, 2, cache_key="t/disk")
        assert len(calls) == 1               # served from disk
        assert b == a
        # a torn artifact is ignored — refit, never a crash
        p = clustering._artifact_path(("t/disk", 4, 2))
        with open(p, "w") as f:
            f.write('{"key": ["t/disk", 4')  # truncated JSON
        clustering._CODEBOOK_CACHE.clear()
        c = clustering.fit_centroids(emb, 4, 2, cache_key="t/disk")
        assert len(calls) == 2 and c == a
        # a foreign artifact under the same filename is refused too
        with open(p, "w") as f:
            json.dump({"key": ["other", 4, 2],
                       "centroids": [[0.0] * 8] * 4}, f)
        clustering._CODEBOOK_CACHE.clear()
        d = clustering.fit_centroids(emb, 4, 2, cache_key="t/disk")
        assert len(calls) == 3 and d == a
    finally:
        clustering._fit = real_fit
        clustering.clear_codebook_cache()

    # corpus_cache_key: same path, regenerated bytes -> different key
    corpus = tmp_path / "corpus.parquet"
    corpus.write_bytes(b"one")
    k1 = clustering.corpus_cache_key(str(corpus))
    corpus.write_bytes(b"three")
    os.utime(corpus, ns=(1, 2))
    k2 = clustering.corpus_cache_key(str(corpus))
    assert k1 != k2
    # and a missing path RAISES instead of folding to a stable
    # "p|0|0" key that would pin one codebook to a typo'd path
    with pytest.raises(FileNotFoundError):
        clustering.corpus_cache_key(str(tmp_path / "nope"))


def test_ivf_entries_share_cached_codebook(spark, tmp_path, monkeypatch):
    """ann_ivf and hard_negative_mine_ivf train on the same corpus
    with the same params: in one session the second entry must reuse
    the first's codebook (zero additional fits) and stay
    oracle-identical (same centroids by determinism)."""
    from azure_nyctaxi_lambda_elt_spark.operators import clustering
    from azure_nyctaxi_lambda_elt_spark.plans.llm_catalog import (
        q_ann_ivf, q_hard_negative_mine_ivf)

    monkeypatch.setenv(clustering._CODEBOOK_STORE_ENV,
                       str(tmp_path / "cb"))  # isolate the disk tier

    calls = []
    real_fit = clustering._fit

    def counting_fit(pts, k, iters):
        calls.append(k)
        return real_fit(pts, k, iters)

    clustering.clear_codebook_cache()
    clustering._fit = counting_fit
    try:
        q_ann_ivf(spark, SF_SMOKE).collect()
        n_first = len(calls)
        assert n_first == 1
        q_hard_negative_mine_ivf(spark, SF_SMOKE).collect()
        assert len(calls) == n_first  # cache hit: no new fit
    finally:
        clustering._fit = real_fit
        clustering.clear_codebook_cache()


def test_per_table_codebook_artifact_lifecycle(spark, tmp_path):
    """fit_centroids_txn (r7 verdict ask): a TXN-managed embedding
    table's codebook lives under the table's OWN _txn/codebooks,
    keyed by (path, version, k, iters) — reuse at the same version
    with zero fits, invalidation on a new commit by construction,
    and vacuum GCs artifacts for the versions it drops."""
    import os

    from azure_nyctaxi_lambda_elt_spark.operators import (
        clustering, txnlog)

    path = str(tmp_path / "embtab")
    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (i + 3)) % 17).cast("float")
                  for i in range(8)]).alias("embedding"))
    txnlog.commit(emb, path, "overwrite")

    calls = []
    real_fit = clustering._fit

    def counting_fit(pts, k, iters):
        calls.append(k)
        return real_fit(pts, k, iters)

    clustering.clear_codebook_cache()
    clustering._fit = counting_fit
    try:
        a = clustering.fit_centroids_txn(spark, path, 4, 2)
        assert len(calls) == 1
        cb = clustering.codebook_store_dir(path)
        files_v0 = os.listdir(cb)
        assert len(files_v0) == 1 and \
            files_v0[0].startswith("codebook-v00000000-")
        # same version: session hit; and across a "restart", disk hit
        assert clustering.fit_centroids_txn(spark, path, 4, 2) == a
        clustering._CODEBOOK_CACHE.clear()
        assert clustering.fit_centroids_txn(spark, path, 4, 2) == a
        assert len(calls) == 1
        # matches an uncached fit on the same snapshot
        assert a == real_fit(
            clustering._points(txnlog.snapshot(spark, path, 0))
            .persist(), 4, 2)
        # a new commit invalidates by construction: new version, new
        # artifact, refit over the grown corpus
        more = spark.range(64, 96).select(
            F.col("id").alias("vec_id"),
            F.array(*[((F.col("id") * (i + 5)) % 13).cast("float")
                      for i in range(8)]).alias("embedding"))
        txnlog.commit(more, path, "append")
        b = clustering.fit_centroids_txn(spark, path, 4, 2)
        assert len(calls) == 2 and b != a
        assert len(os.listdir(cb)) == 2
        # vacuum(keep_latest=1) drops v0's manifest AND its codebook
        removed = txnlog.vacuum(path, keep_latest=1, grace_seconds=0)
        assert any(r.startswith("_txn/codebooks/codebook-v00000000-")
                   for r in removed)
        left = os.listdir(cb)
        assert len(left) == 1 and \
            left[0].startswith("codebook-v00000001-")
        # the surviving artifact still serves
        clustering._CODEBOOK_CACHE.clear()
        assert clustering.fit_centroids_txn(spark, path, 4, 2) == b
        assert len(calls) == 2
    finally:
        clustering._fit = real_fit
        clustering.clear_codebook_cache()
