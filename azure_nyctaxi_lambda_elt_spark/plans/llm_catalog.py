"""Set D: LLM-training-data pipeline operators over the ``documents``
and ``embeddings`` tables, with DuckDB oracle twins.

Hash primitives (md5) and rounding conventions are chosen so the oracle
reproduces every value bit-for-bit; see plans/catalog.py docstring for
the shared conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus as cp
from ..operators import llm_text as lt
from ..operators.ann import (cosine_pairs, cosine_topk, ivf_topk,
                             lsh_bucket_topk)
from ..operators.graph import dedup_clusters, dedup_clusters_bigstar
from ..operators.multimodal import (decode_media, transform_media,
                                    with_media_payload)
from ..session import apply_engine_conf, pin
from ..sources.tables import load_table

JACCARD_N = 3
JACCARD_TAU = 0.3
ANN_K = 5
ANN_QUERY_MOD = 50  # queries = vec_id % 50 == 0


def _docs(spark: SparkSession, sf_dir: str,
          spread: bool = False) -> DataFrame:
    """``spread=True`` redistributes the single-file documents scan
    before per-row-heavy work (tokenization/shingling/hashing) —
    sources/tables.py spread_small_scan; a no-op above one scan
    split.  Opt-in per entry: the r13 A/B showed tokenization-heavy
    consumers win 0.4-2.8 s each at sf0.1 while light/join-shaped
    ones lose to the extra exchange (OPTIMIZATION_r13.md)."""
    df = load_table(spark, sf_dir, "documents")
    if spread:
        from ..sources.tables import spread_small_scan

        return spread_small_scan(df)
    return df


def _emb(spark: SparkSession, sf_dir: str,
         spread: bool = False) -> DataFrame:
    """``spread=True``: see _docs — opt-in single-file-scan
    redistribution where brute per-row vector math dominates."""
    df = load_table(spark, sf_dir, "embeddings")
    if spread:
        from ..sources.tables import spread_small_scan

        return spread_small_scan(df)
    return df


def _emb_key(sf_dir: str) -> str:
    """Codebook-cache identity for the embeddings corpus: path +
    size + mtime fingerprint, so the PERSISTED codebook artifact
    (operators/clustering.py) invalidates if the corpus is
    regenerated in place between sessions."""
    import os

    from ..operators.clustering import corpus_cache_key

    return corpus_cache_key(os.path.join(sf_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# queries

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return lt.exact_dedup(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return lt.ngram_jaccard_pairs(_docs(spark, sf_dir, spread=True), JACCARD_N, JACCARD_TAU)


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact similarity JOIN at τ=0.8 via prefix filtering
    (operators/llm_text.py prefix_filter_pairs — AllPairs/PPJoin):
    rarest-first global shingle order, prefix-only self-join (recall
    1.0 by pigeonhole), integer-ratio thresholds, exact verify on
    candidates.  The oracle is the BRUTE all-pairs Jaccard — passing
    proves the pruning dropped no qualifying pair."""
    apply_engine_conf(spark)
    return lt.prefix_filter_pairs(_docs(spark, sf_dir), JACCARD_N)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return lt.minhash_lsh_candidates(_docs(spark, sf_dir, spread=True), JACCARD_N)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return lt.simhash_pairs(_docs(spark, sf_dir, spread=True))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cosine_topk(_emb(spark, sf_dir),
                       F.col("vec_id") % ANN_QUERY_MOD == 0, ANN_K)


def q_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return lsh_bucket_topk(_emb(spark, sf_dir),
                           F.col("vec_id") % ANN_QUERY_MOD == 0, ANN_K)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return ivf_topk(_emb(spark, sf_dir),
                    F.col("vec_id") % ANN_QUERY_MOD == 0, ANN_K,
                    cache_key=_emb_key(sf_dir))


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (operators/ann.py ivfpq_topk): coarse cells +
    product-quantized 4-bit codes + exact refinement — the
    memory-bounded index shape for corpora whose float vectors no
    longer fit.  FULL literal-replay oracle since r4: all 9 nested
    Lloyd fits (coarse + 8 subspaces) unroll into namespaced SQL CTE
    chains (_ann_ivfpq_oracle), plus the recall/compression pytest."""
    apply_engine_conf(spark)
    from ..operators.ann import ivfpq_topk

    return ivfpq_topk(_emb(spark, sf_dir),
                      F.col("vec_id") % ANN_QUERY_MOD == 0, ANN_K,
                      cache_key=_emb_key(sf_dir))


COS_TAU = 0.45


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cosine_pairs(_emb(spark, sf_dir, spread=True), COS_TAU)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir, spread=True)
    toks = docs.select(
        "doc_id", "lang", lt.ws_tokens(F.lower(F.col("text"))).alias("__t"))
    scores = lt.lang_scores(F.col("__t"))
    out = toks.select(
        "doc_id", "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in lt.LANGS],
    )
    pick = lt.lang_pick_sql({lang: f"score_{lang}" for lang in lt.LANGS})
    return out.withColumn("predicted_lang", F.expr(pick))


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: confusion matrix of the lang-ID
    heuristic against the labeled `lang` column — (true, predicted)
    counts plus per-true-language recall.  The eval loop every
    heuristic quality filter needs before it gates a corpus; one
    partial-aggregated groupBy over the map-side scorer."""
    preds = q_lang_id(spark, sf_dir).select("doc_id", "lang",
                                            "predicted_lang")
    cm = preds.groupBy("lang", "predicted_lang").agg(
        F.count("*").cast("bigint").alias("n_docs"))
    totals = cm.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("__t"))
    return (
        cm.join(totals, "lang")
        .select("lang", "predicted_lang", "n_docs",
                F.round(F.col("n_docs") / F.col("__t"), 6).alias("frac"))
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    # tokens materialized once (see doc_shingles docstring on HOF CSE)
    staged = docs.select(
        "doc_id", "text", lt.ws_tokens(F.lower(text)).alias("__t"))
    n_chars = F.length(text)
    n_tokens = F.size(F.col("__t"))
    punct_cnt = n_chars - F.length(F.regexp_replace(text, "[.,;:!?]", ""))
    digit_cnt = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    alpha_cnt = n_chars - F.length(F.regexp_replace(text, "[a-zA-Z]", ""))
    stop_cnt = F.size(F.filter(
        F.col("__t"),
        lambda t: t.isin(*lt.STOPWORDS["en"]),
    ))
    out = staged.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        F.round(punct_cnt.cast("double") / n_chars.cast("double"), 6).alias("punct_ratio"),
        F.round(digit_cnt.cast("double") / n_chars.cast("double"), 6).alias("digit_ratio"),
        F.round(alpha_cnt.cast("double") / n_chars.cast("double"), 6).alias("alpha_ratio"),
        F.round(stop_cnt.cast("double") / n_tokens.cast("double"), 6).alias("stop_ratio"),
    )
    score = F.round(
        F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
        * (F.lit(1.0) - F.col("punct_ratio"))
        * (F.lit(1.0) - F.col("digit_ratio"))
        * (F.lit(0.5) + F.lit(0.5) * F.least(F.lit(1.0), F.col("stop_ratio") * 5.0)),
        6,
    )
    return out.withColumn("quality_score", score)


TOKEN_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    n_chars = F.length(text)
    return docs.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        F.size(lt.ws_tokens(text)).cast("int").alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(TOKEN_PAT)).cast("int").alias("n_regex_tokens"),
        F.ceil(n_chars / F.lit(4.0)).cast("int").alias("approx_bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully NARROW winnowing fingerprint: shingle array materialized
    once per row, min-md5 via array_min — no explode, no shuffle at all
    (min over duplicates equals min over distinct)."""
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir, spread=True)
    staged = docs.select(
        "doc_id", F.array_distinct(lt.char_shingles(F.col("text"), 8)).alias("__sgs"))
    return staged.select(
        "doc_id",
        F.size("__sgs").cast("bigint").alias("n_shingles"),
        F.array_min(F.transform(F.col("__sgs"), F.md5)).alias("fingerprint"),
    ).withColumn("fp_prefix", F.substring(F.col("fingerprint"), 1, 16))


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-format multimodal decode: docs get BMP/WAV/GIF payloads
    (operators/multimodal.py encode_kernel), then an Arrow mapInPandas
    struct parser recovers dimensions / sample rate / frame counts /
    data-section byte sums from the raw bytes.  The oracle recomputes
    every feature arithmetically from doc_id — a hash match proves the
    parser read the headers correctly."""
    apply_engine_conf(spark)
    return decode_media(with_media_payload(_docs(spark, sf_dir)))


def q_multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature pipeline, write half: nearest-neighbor image
    resize (stride to max side 8), audio decimation (every 4th PCM
    frame, rate/4), and video frame-sampling (every 2nd GIF frame) as
    REAL byte-level transforms over mapInPandas
    (operators/multimodal.py transform_kernel).  Each transformed
    payload is re-decoded by the strict struct parser, so the reported
    features prove the transform emitted VALID format bytes; the
    oracle recomputes them arithmetically from the encode params."""
    apply_engine_conf(spark)
    return transform_media(with_media_payload(_docs(spark, sf_dir)))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of verified near-dup pairs → one canonical
    doc per duplicate cluster (operators/graph.py)."""
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir, spread=True)
    pairs = lt.ngram_jaccard_pairs(docs, JACCARD_N, JACCARD_TAU)
    return dedup_clusters(docs, pairs)


def q_dedup_clusters_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same transitive closure via the large-star/small-star engine
    (Kiveris et al. SoCC'14) — O(log²) rounds vs diameter rounds; the
    output contract (and oracle) is identical to dedup_clusters, so the
    driver row attests the two engines agree on real pairs."""
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir, spread=True)
    pairs = lt.ngram_jaccard_pairs(docs, JACCARD_N, JACCARD_TAU)
    return dedup_clusters_bigstar(docs, pairs)


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.vocab_topk(_docs(spark, sf_dir))


def _augmented_pii_text(docs: DataFrame) -> DataFrame:
    """The synthetic corpus carries no PII, so plant deterministic
    email/phone spans (phone on even doc_ids only) — the SAME
    expression is built in the oracle SQL."""
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" or +1-555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", aug.alias("text"))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.pii_redact(_augmented_pii_text(_docs(spark, sf_dir, spread=True)))


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.doc_chunks(_docs(spark, sf_dir))


def q_dedup_lsh_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates → exact-Jaccard verify ON CANDIDATES ONLY
    (the production composition — operators/llm_text.py)."""
    apply_engine_conf(spark)
    return lt.lsh_jaccard_verified(_docs(spark, sf_dir, spread=True), JACCARD_N, JACCARD_TAU)


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.doc_repetition(_docs(spark, sf_dir, spread=True))


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.distinct_token_estimate(_docs(spark, sf_dir))


SAMPLE_RATES = {"en": 0.5}
SAMPLE_DEFAULT_RATE = 0.25


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.stratified_sample(_docs(spark, sf_dir), SAMPLE_RATES,
                                SAMPLE_DEFAULT_RATE)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.tfidf_topk(_docs(spark, sf_dir))


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.bigram_topk(_docs(spark, sf_dir, spread=True))


def q_doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.doc_length_histogram(_docs(spark, sf_dir))


def q_benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.benchmark_decontam(_docs(spark, sf_dir))


def q_ngram_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.ngram_decontam(_docs(spark, sf_dir, spread=True))


def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.per_source_cap(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# oracle SQL

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

# hg mirrors the Spark-side 60-bit md5-prefix shingle key (llm_text.
# doc_shingles): intersection joins run on hg, so any hash collision
# is reproduced identically in both engines
_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, sg,
         CAST(concat('0x', substring(md5(sg), 1, 15)) AS BIGINT) AS hg
  FROM toks, UNNEST([array_to_string(t[i:i+{JACCARD_N - 1}], ' ')
                     FOR i IN generate_series(1, len(t) - {JACCARD_N - 1})]) u(sg)
)
"""


def _stop_in(words: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"t IN ({quoted})"


def _lang_score_sql(lang: str) -> str:
    return (
        "CAST(len(list_filter(string_split(lower(text), ' '), "
        f"t -> {_stop_in(lt.STOPWORDS[lang])})) AS INT)"
    )


_MH_COLS = ",\n    ".join(
    f"MIN((CAST(concat('0x', substring(md5(sg), 1, 8)) AS BIGINT)"
    f" * {a} + {b}) % 4294967296) AS mh{i}"
    for i, (a, b) in enumerate(lt.MIX_CONSTS)
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, md5({expr}) AS band_sig FROM mh".format(
        b=b,
        expr=" || '|' || ".join(
            f"mh{b * lt.ROWS_PER_BAND + r}" for r in range(lt.ROWS_PER_BAND)
        ),
    )
    for b in range(lt.N_BANDS)
)

LLM_ORACLES: dict[str, str] = {
    # every feature the binary parser extracts is a deterministic
    # function of doc_id (operators/multimodal.py encode params), so the
    # oracle recomputes them arithmetically: a value-hash match proves
    # the mapInPandas kernel recovered the fields from the real bytes
    "multimodal_decode": """
        SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_type,
          CAST(CASE doc_id % 3
            WHEN 0 THEN 54 + ((((16 + (doc_id*7)%49)*3 + 3) // 4) * 4)
                          * (16 + (doc_id*13)%33)
            WHEN 1 THEN 44 + (100 + (doc_id*11)%900) * (1 + doc_id%2) * 2
            ELSE 14 + (1 + doc_id%8) * (21 + (1 + doc_id%5))
          END AS INT) AS byte_len,
          CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id*7)%49
               WHEN 1 THEN 0 ELSE 32 + (doc_id*5)%97 END AS INT) AS width,
          CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id*13)%33
               WHEN 1 THEN 0 ELSE 32 + (doc_id*3)%61 END AS INT) AS height,
          CAST(CASE doc_id % 3 WHEN 0 THEN 1
               WHEN 1 THEN 100 + (doc_id*11)%900
               ELSE 1 + doc_id%8 END AS INT) AS n_frames,
          CAST(CASE doc_id % 3 WHEN 1 THEN 8000 * (1 + (doc_id//2)%3)
               ELSE 0 END AS INT) AS sample_rate,
          CAST(CASE doc_id % 3 WHEN 1 THEN 1 + doc_id%2
               ELSE 0 END AS INT) AS n_channels,
          CAST(CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 16
               ELSE 8 END AS INT) AS bit_depth,
          CAST(CASE doc_id % 3
            WHEN 0 THEN ((doc_id % 251) * ((((16 + (doc_id*7)%49)*3 + 3) // 4) * 4)
                          * (16 + (doc_id*13)%33)) % 997
            WHEN 1 THEN ((doc_id % 251) * ((100 + (doc_id*11)%900)
                          * (1 + doc_id%2) * 2)) % 997
            ELSE ((doc_id % 251) * ((1 + doc_id%8) * (1 + doc_id%5))) % 997
          END AS INT) AS data_sum
        FROM documents
    """,
    # the transform twin: stride-resize / decimate / frame-sample
    # outcomes recomputed arithmetically (k = ceil(max(w,h)/8) resize
    # stride, ceil(n/4) kept PCM frames at rate/4, ceil(n/2) kept GIF
    # frames; zero row padding -> image sum counts 3*out_w bytes/row)
    "multimodal_transform": """
        SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_type,
          CAST(CASE doc_id % 3
            WHEN 0 THEN 54 +
              (((((16 + (doc_id*7)%49) + ((greatest(16 + (doc_id*7)%49,
                    16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8))
                * 3 + 3) // 4 * 4)
              * (((16 + (doc_id*13)%33) + ((greatest(16 + (doc_id*7)%49,
                    16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8))
            WHEN 1 THEN 44 + (((100 + (doc_id*11)%900) + 3) // 4)
                          * (1 + doc_id%2) * 2
            ELSE 14 + (((1 + doc_id%8) + 1) // 2) * (21 + (1 + doc_id%5))
          END AS INT) AS out_bytes,
          CAST(CASE doc_id % 3
            WHEN 0 THEN ((16 + (doc_id*7)%49) + ((greatest(16 + (doc_id*7)%49,
                  16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8)
            WHEN 1 THEN 0 ELSE 32 + (doc_id*5)%97 END AS INT) AS out_w,
          CAST(CASE doc_id % 3
            WHEN 0 THEN ((16 + (doc_id*13)%33) + ((greatest(16 + (doc_id*7)%49,
                  16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8)
            WHEN 1 THEN 0 ELSE 32 + (doc_id*3)%61 END AS INT) AS out_h,
          CAST(CASE doc_id % 3 WHEN 0 THEN 1
               WHEN 1 THEN ((100 + (doc_id*11)%900) + 3) // 4
               ELSE ((1 + doc_id%8) + 1) // 2 END AS INT) AS out_frames,
          CAST(CASE doc_id % 3 WHEN 1 THEN 2000 * (1 + (doc_id//2)%3)
               ELSE 0 END AS INT) AS out_rate,
          CAST(CASE doc_id % 3
            WHEN 0 THEN ((doc_id % 251) * 3
              * (((16 + (doc_id*7)%49) + ((greatest(16 + (doc_id*7)%49,
                    16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8))
              * (((16 + (doc_id*13)%33) + ((greatest(16 + (doc_id*7)%49,
                    16 + (doc_id*13)%33) + 7) // 8) - 1)
                 // ((greatest(16 + (doc_id*7)%49, 16 + (doc_id*13)%33) + 7) // 8))
              ) % 997
            WHEN 1 THEN ((doc_id % 251) * ((((100 + (doc_id*11)%900) + 3) // 4)
                          * (1 + doc_id%2) * 2)) % 997
            ELSE ((doc_id % 251) * ((((1 + doc_id%8) + 1) // 2)
                          * (1 + doc_id%5))) % 997
          END AS INT) AS out_sum
        FROM documents
    """,
    # SimHash is pure md5-derived integer arithmetic, so the whole
    # signature build (±1 per bit per token, sign threshold, 16-bit
    # banding, hamming prune) replays exactly in SQL — upgraded from
    # rows-only in round 2.  Threshold 3 = the banding's pigeonhole
    # guarantee (4 bands ⇒ exact recall for hamming ≤ 3), so the
    # operator's stated semantics and the candidate generation agree.
    "dedup_simhash": """
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                            t -> t <> '')) AS t
          FROM documents),
        h AS (
          SELECT doc_id,
                 CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT) AS hi,
                 CAST(concat('0x', substring(md5(t), 9, 8)) AS BIGINT) AS lo
          FROM toks),
        bits AS (
          SELECT doc_id, b.b,
                 SUM(CASE WHEN (hi >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s_hi,
                 SUM(CASE WHEN (lo >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s_lo
          FROM h, (SELECT unnest(generate_series(0, 31)) AS b) b
          GROUP BY 1, 2),
        sig AS (
          SELECT doc_id,
                 SUM(CASE WHEN s_hi > 0 THEN (CAST(1 AS BIGINT) << b)
                     ELSE 0 END) AS h_hi,
                 SUM(CASE WHEN s_lo > 0 THEN (CAST(1 AS BIGINT) << b)
                     ELSE 0 END) AS h_lo
          FROM bits GROUP BY 1),
        bands AS (
          SELECT doc_id, h_hi, h_lo, 0 AS band_id,
                 (h_hi >> 16) & 65535 AS val FROM sig
          UNION ALL SELECT doc_id, h_hi, h_lo, 1, h_hi & 65535 FROM sig
          UNION ALL SELECT doc_id, h_hi, h_lo, 2, (h_lo >> 16) & 65535 FROM sig
          UNION ALL SELECT doc_id, h_hi, h_lo, 3, h_lo & 65535 FROM sig)
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j,
               CAST(bit_count(xor(a.h_hi, b.h_hi))
                    + bit_count(xor(a.h_lo, b.h_lo)) AS INT) AS hamming
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.val = b.val
                    AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h_hi, b.h_hi))
              + bit_count(xor(a.h_lo, b.h_lo)) <= 3
    """,
    "dedup_exact": """
        SELECT doc_id, content_hash,
               MIN(doc_id) OVER (PARTITION BY content_hash) AS canonical_doc_id,
               COUNT(*) OVER (PARTITION BY content_hash) AS group_size,
               doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS is_duplicate
        FROM (SELECT doc_id,
                     md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS content_hash
              FROM documents) t
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
        shf AS (
          SELECT * FROM sh WHERE hg NOT IN (
            SELECT hg FROM sh GROUP BY hg
            HAVING COUNT(*) > {lt.MAX_SHINGLE_DF})),
        inter AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
          FROM shf a JOIN shf b ON a.hg = b.hg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_i, doc_j,
               round(CAST(n_inter AS DOUBLE)
                     / CAST(sa.n_sg + sb.n_sg - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = doc_i
        JOIN sz sb ON sb.doc_id = doc_j
        WHERE round(CAST(n_inter AS DOUBLE)
                    / CAST(sa.n_sg + sb.n_sg - n_inter AS DOUBLE), 6) >= {JACCARD_TAU}
    """,
    # brute all-pairs at the SAME integer threshold — a hash match
    # proves the prefix filter's recall-1.0 claim (no dropped pair)
    "dedup_prefix_filter": f"""
        WITH {_SHINGLES_CTE},
        sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.hg = b.hg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_i, doc_j,
               round(CAST(n_inter AS DOUBLE)
                     / CAST(sa.n_sg + sb.n_sg - n_inter AS DOUBLE), 6)
                 AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = doc_i
        JOIN sz sb ON sb.doc_id = doc_j
        WHERE {lt.PF_TAU_DEN} * n_inter
              >= {lt.PF_TAU_NUM} * (sa.n_sg + sb.n_sg - n_inter)
    """,
    "dedup_minhash_lsh": f"""
        WITH {_SHINGLES_CTE},
        mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY 1),
        bands AS ({_BAND_SELECTS})
        SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_shared_bands
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    "ann_cosine_topk": f"""
        WITH v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings),
        n AS (SELECT vec_id, e, list_sum([x * x FOR x IN e]) AS ssq FROM v),
        q AS (SELECT vec_id AS q_id, e AS qe, ssq AS qssq FROM n
              WHERE vec_id % {ANN_QUERY_MOD} = 0),
        p AS (
          SELECT q_id, vec_id AS neighbor_id,
                 round(list_sum([qe[i] * e[i] FOR i IN generate_series(1, len(e))])
                       / (sqrt(qssq) * sqrt(ssq)), 6) AS cos_sim
          FROM q JOIN n ON vec_id <> q_id)
        SELECT q_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
        FROM p
        QUALIFY rnk <= {ANN_K}
    """,
    "dedup_embedding_cosine": f"""
        WITH v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings),
        n AS (SELECT vec_id, e, list_sum([x * x FOR x IN e]) AS ssq FROM v)
        SELECT a.vec_id AS id_i, b.vec_id AS id_j,
               round(list_sum([a.e[k] * b.e[k] FOR k IN generate_series(1, len(a.e))])
                     / (sqrt(a.ssq) * sqrt(b.ssq)), 6) AS cos_sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_sum([a.e[k] * b.e[k] FOR k IN generate_series(1, len(a.e))])
                    / (sqrt(a.ssq) * sqrt(b.ssq)), 6) >= {COS_TAU}
    """,
    "lang_id": (
        "WITH s AS (SELECT doc_id, lang, "
        + ", ".join(f"{_lang_score_sql(lang)} AS score_{lang}" for lang in lt.LANGS)
        + " FROM documents) SELECT doc_id, lang, "
        + ", ".join(f"score_{lang}" for lang in lt.LANGS)
        + ", "
        + lt.lang_pick_sql({lang: f"score_{lang}" for lang in lt.LANGS})
        + " AS predicted_lang FROM s"
    ),
    "text_quality": f"""
        WITH m AS (
          SELECT doc_id,
                 CAST(length(text) AS INT) AS n_chars,
                 CAST(len({_TOKS}) AS INT) AS n_tokens,
                 CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS punct_cnt,
                 CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS digit_cnt,
                 CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS INT) AS alpha_cnt,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                      t -> {_stop_in(lt.STOPWORDS["en"])})) AS INT) AS stop_cnt
          FROM documents),
        r AS (
          SELECT doc_id, n_chars, n_tokens,
                 round(CAST(punct_cnt AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
                 round(CAST(digit_cnt AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS digit_ratio,
                 round(CAST(alpha_cnt AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS alpha_ratio,
                 round(CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio
          FROM m)
        SELECT *,
               round(least(1.0, n_tokens / 100.0)
                     * (1.0 - punct_ratio) * (1.0 - digit_ratio)
                     * (0.5 + 0.5 * least(1.0, stop_ratio * 5.0)), 6) AS quality_score
        FROM r
    """,
    "token_count": f"""
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars,
               CAST(len({_TOKS}) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{TOKEN_PAT}')) AS INT) AS n_regex_tokens,
               CAST(ceil(length(text) / 4.0) AS INT) AS approx_bpe_tokens
        FROM documents
    """,
    "doc_fingerprint": """
        WITH sh AS (
          SELECT DISTINCT doc_id, sg
          FROM documents,
               UNNEST([substring(text, i, 8)
                       FOR i IN generate_series(1, len(text) - 7)]) u(sg))
        SELECT doc_id, COUNT(*) AS n_shingles, MIN(md5(sg)) AS fingerprint,
               substring(MIN(md5(sg)), 1, 16) AS fp_prefix
        FROM sh GROUP BY 1
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
        shf AS (
          SELECT * FROM sh WHERE hg NOT IN (
            SELECT hg FROM sh GROUP BY hg
            HAVING COUNT(*) > {lt.MAX_SHINGLE_DF})),
        inter AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
          FROM shf a JOIN shf b ON a.hg = b.hg AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_i, doc_j FROM inter
          JOIN sz sa ON sa.doc_id = doc_i
          JOIN sz sb ON sb.doc_id = doc_j
          WHERE round(CAST(n_inter AS DOUBLE)
                      / CAST(sa.n_sg + sb.n_sg - n_inter AS DOUBLE), 6)
                >= {JACCARD_TAU}),
        edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
                  UNION ALL SELECT doc_j AS a, doc_i AS b FROM pairs),
        reach AS (
          SELECT doc_id AS node, doc_id AS lbl FROM documents
          UNION
          SELECT e.a AS node, r.lbl FROM edges e JOIN reach r ON r.node = e.b),
        labels AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
                   FROM reach GROUP BY 1)
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               doc_id = cluster_id AS is_canonical
        FROM labels
    """,
    "dedup_lsh_jaccard": f"""
        WITH {_SHINGLES_CTE},
        mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY 1),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
                 COUNT(*) AS n_shared_bands
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                      AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.hg = b.hg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT c.doc_i, c.doc_j, c.n_shared_bands,
               round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                     / CAST(sa.n_sg + sb.n_sg - COALESCE(i.n_inter, 0)
                            AS DOUBLE), 6) AS jaccard,
               round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                     / CAST(sa.n_sg + sb.n_sg - COALESCE(i.n_inter, 0)
                            AS DOUBLE), 6) >= {JACCARD_TAU} AS is_dup
        FROM cand c
        JOIN sz sa ON sa.doc_id = c.doc_i
        JOIN sz sb ON sb.doc_id = c.doc_j
        LEFT JOIN inter i ON i.doc_i = c.doc_i AND i.doc_j = c.doc_j
    """,
    "doc_repetition": f"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                     t -> t <> '') AS t
          FROM documents),
        nz AS (SELECT * FROM toks WHERE len(t) > 0),
        mx AS (
          SELECT doc_id, MAX(c) AS maxrun FROM (
            SELECT doc_id, u.token, COUNT(*) AS c
            FROM nz, UNNEST(t) u(token) GROUP BY 1, 2) tc
          GROUP BY 1),
        gg AS (
          SELECT doc_id, len(t) AS n,
                 [array_to_string(t[i:i+1], ' ')
                  FOR i IN generate_series(1, len(t) - 1)] AS g2,
                 [array_to_string(t[i:i+2], ' ')
                  FOR i IN generate_series(1, len(t) - 2)] AS g3
          FROM nz)
        SELECT gg.doc_id,
               CAST(n AS INT) AS n_tokens,
               round(CAST(maxrun AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS top_token_frac,
               CASE WHEN len(g2) > 0 THEN
                 round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                       / CAST(len(g2) AS DOUBLE), 6) ELSE 0.0 END
                 AS dup_2gram_frac,
               CASE WHEN len(g3) > 0 THEN
                 round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                       / CAST(len(g3) AS DOUBLE), 6) ELSE 0.0 END
                 AS dup_3gram_frac,
               (round(CAST(maxrun AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  > {cp.TOP_TOKEN_FRAC_MAX}
                OR (CASE WHEN len(g2) > 0 THEN
                      round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                            / CAST(len(g2) AS DOUBLE), 6) ELSE 0.0 END)
                   > {cp.DUP_2GRAM_FRAC_MAX}) AS is_repetitive
        FROM gg JOIN mx ON mx.doc_id = gg.doc_id
    """,
    "distinct_sketch": f"""
        WITH toks AS (
          SELECT DISTINCT lang, u.token
          FROM (SELECT lang, list_filter(string_split(lower(text), ' '),
                                         t -> t <> '') AS t
                FROM documents) d, UNNEST(t) u(token)),
        agg AS (
          SELECT lang, COUNT(*) AS n_distinct_exact,
                 CAST(SUM(CASE WHEN substring(md5(token), 1, 4)
                          < '{cp.SKETCH_THR_HEX4}' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled
          FROM toks GROUP BY 1)
        SELECT lang, n_distinct_exact, n_sampled,
               CAST(round(n_sampled * {cp.SKETCH_SCALE}, 1) AS DOUBLE)
                 AS est_distinct,
               round(abs(round(n_sampled * {cp.SKETCH_SCALE}, 1)
                         - n_distinct_exact) / n_distinct_exact, 6) AS rel_err
        FROM agg
    """,
    "vocab_topk": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
          FROM documents),
        ex AS (SELECT doc_id, u.token FROM toks, UNNEST(t) u(token)),
        agg AS (SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
                FROM ex GROUP BY 1)
        SELECT token, tf, df,
               CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS INT) AS rnk
        FROM agg
        QUALIFY rnk <= {cp.VOCAB_TOP_K}
    """,
    "pii_redact": f"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' Contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com'
                 || CASE WHEN doc_id % 2 = 0
                    THEN ' or +1-555-'
                         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{cp.EMAIL_PAT}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{cp.PHONE_PAT}')) AS INT) AS n_phones,
               regexp_replace(
                 regexp_replace(text, '{cp.PHONE_PAT}', '<PHONE>', 'g'),
                 '{cp.EMAIL_PAT}', '<EMAIL>', 'g') AS redacted_text
        FROM aug
    """,
    "doc_chunking": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS t FROM documents)
        SELECT doc_id,
               CAST((i - 1) // {cp.CHUNK_STRIDE} AS INT) AS chunk_id,
               CAST(i AS INT) AS start_tok,
               CAST(len(t[i:i + {cp.CHUNK_TOKENS - 1}]) AS INT) AS n_chunk_tokens,
               array_to_string(t[i:i + {cp.CHUNK_TOKENS - 1}], ' ') AS chunk_text
        FROM toks, UNNEST(generate_series(1, len(t), {cp.CHUNK_STRIDE})) u(i)
    """,
    "stratified_sample": """
        SELECT doc_id, lang,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key,
               CASE WHEN lang = 'en' THEN '8000' ELSE '4000' END AS threshold
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < CASE WHEN lang = 'en' THEN '8000' ELSE '4000' END
    """,
    "tfidf_topk": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
          FROM documents),
        ex AS (SELECT doc_id, u.token FROM toks, UNNEST(t) u(token)),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
        dfc AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, token, tf, df,
               round(CAST(tf AS DOUBLE)
                     * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY doc_id
                 ORDER BY round(CAST(tf AS DOUBLE)
                   * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) DESC,
                   token ASC) AS INT) AS rnk
        FROM tf JOIN dfc USING (token) CROSS JOIN n
        QUALIFY rnk <= {cp.TFIDF_TOP_K}
    """,
    "bigram_topk": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
          FROM documents),
        gg AS (
          SELECT doc_id, [array_to_string(t[i:i+1], ' ')
                          FOR i IN generate_series(1, len(t) - 1)] AS g2
          FROM toks),
        ex AS (SELECT doc_id, u.bigram FROM gg, UNNEST(g2) u(bigram)),
        agg AS (SELECT bigram, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
                FROM ex GROUP BY 1)
        SELECT bigram, tf, df,
               CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, bigram ASC) AS INT) AS rnk
        FROM agg
        QUALIFY rnk <= {cp.BIGRAM_TOP_K}
    """,
    "doc_len_histogram": f"""
        WITH m AS (
          SELECT lang,
                 len(list_filter(string_split(lower(text), ' '),
                                 t -> t <> '')) AS n
          FROM documents)
        SELECT lang,
               CAST(floor(n / {cp.HIST_BUCKET_TOKENS}) AS INT) AS bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(MIN(n) AS INT) AS min_tokens,
               CAST(MAX(n) AS INT) AS max_tokens,
               CAST(floor(n / {cp.HIST_BUCKET_TOKENS})
                    * {cp.HIST_BUCKET_TOKENS} AS INT) AS bucket_lo
        FROM m GROUP BY 1, 2, 7
    """,
    "ngram_decontam": f"""
        WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, sg,
                 CAST(concat('0x', substring(md5(sg), 1, 15)) AS BIGINT) AS hg
          FROM toks, UNNEST([array_to_string(t[i:i+{cp.DECONTAM_N - 1}], ' ')
                             FOR i IN generate_series(1, len(t) - {cp.DECONTAM_N - 1})]) u(sg)
        ),
        sz AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh
               WHERE doc_id % 10 <> 0 GROUP BY 1),
        shared AS (
          SELECT c.doc_id, b.doc_id AS benchmark_doc_id, COUNT(*) AS n_overlap
          FROM sh c JOIN sh b ON c.hg = b.hg
          WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
          GROUP BY 1, 2)
        SELECT s.doc_id, s.benchmark_doc_id, s.n_overlap, z.n_grams,
               round(CAST(s.n_overlap AS DOUBLE)
                     / CAST(z.n_grams AS DOUBLE), 6) AS overlap_frac
        FROM shared s JOIN sz z ON z.doc_id = s.doc_id
        WHERE round(CAST(s.n_overlap AS DOUBLE)
                    / CAST(z.n_grams AS DOUBLE), 6) >= {cp.DECONTAM_TAU}
    """.replace("{toks}", _TOKS),
    "per_source_cap": f"""
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS samp_key,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
                 AS INT) AS samp_rank
        FROM documents
        QUALIFY samp_rank <= {cp.SOURCE_CAP}
    """,
    "benchmark_decontam": """
        WITH h AS (
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS content_hash
          FROM documents),
        b AS (SELECT content_hash, MIN(doc_id) AS benchmark_doc_id
              FROM h WHERE doc_id % 10 = 0 GROUP BY 1)
        SELECT c.doc_id, c.content_hash, b.benchmark_doc_id,
               b.benchmark_doc_id IS NOT NULL AS is_contaminated
        FROM h c LEFT JOIN b USING (content_hash)
        WHERE c.doc_id % 10 <> 0
    """,
}

# ann_lsh_bucket oracle: the hyperplanes are md5-derived constants
# (operators/ann.py hyperplanes) embedded as literals, and bucket bits
# use round-6 dot signs — the whole multiprobe bucketed-ANN path
# replays in SQL (upgraded from rows-only in round 2)
from ..operators.ann import N_PLANES as _N_PLANES  # noqa: E402
from ..operators.ann import hyperplanes as _hyperplanes  # noqa: E402


def _plane_lit(row: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in row) + "]"


_SIG_EXPR = " + ".join(
    f"CASE WHEN round(list_sum([e[i] * ({_plane_lit(row)})[i] "
    f"FOR i IN generate_series(1, len(e))]), 6) >= 0 "
    f"THEN {1 << p} ELSE 0 END"
    for p, row in enumerate(_hyperplanes()))
_PROBES = ", ".join(["qb"] + [f"xor(qb, {1 << p})" for p in range(_N_PLANES)])

# identical output contract → identical oracle
LLM_ORACLES["dedup_clusters_bigstar"] = LLM_ORACLES["dedup_clusters"]


# ann_ivf full literal-replay oracle (r3): the coarse codebook is the
# SAME deterministic Lloyd fit kmeans_embeddings unrolls into SQL —
# reuse that chain (k=16, iters=3 — ivf_topk's training params), then
# replay the cosine assignment, 3-cell probing, and exact re-rank.
def _ann_ivf_oracle(k: int = ANN_K, n_centroids: int = 16,
                    n_probes: int = 3, train_iters: int = 3,
                    hard_negatives: bool = False) -> str:
    from .ext_catalog import _kmeans_replay_chain

    chain = _kmeans_replay_chain(n_centroids, train_iters, 64)
    fin = f"cx{train_iters}"
    if hard_negatives:
        label_join = ("JOIN embeddings eq ON eq.vec_id = pr.q_id\n"
                      "          JOIN embeddings en "
                      "ON en.vec_id = a.vec_id")
        label_pred = " AND en.label <> eq.label"
        final_select = """
        SELECT t.q_id, eq.label AS q_label, t.neighbor_id,
               en.label AS neg_label, t.cos_sim, t.rnk
        FROM ranked t
        JOIN embeddings eq ON eq.vec_id = t.q_id
        JOIN embeddings en ON en.vec_id = t.neighbor_id"""
    else:
        label_join, label_pred = "", ""
        final_select = "SELECT q_id, neighbor_id, cos_sim, rnk FROM ranked"
    return chain + f""",
        cssq AS (SELECT cid, SUM(cx * cx) AS cs FROM {fin} GROUP BY 1),
        vssq AS (SELECT vec_id, SUM(x * x) AS vs FROM px GROUP BY 1),
        vc AS (
          SELECT p.vec_id, c.cid,
                 round(SUM(p.x * c.cx)
                       / (sqrt(vs.vs) * sqrt(cs.cs)), 6) AS ccos
          FROM px p
          JOIN {fin} c ON c.i = p.i
          JOIN vssq vs ON vs.vec_id = p.vec_id
          JOIN cssq cs ON cs.cid = c.cid
          GROUP BY p.vec_id, c.cid, vs.vs, cs.cs),
        assigned AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
            FROM vc) t
          WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, cid AS cell FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
            FROM vc WHERE vec_id % {ANN_QUERY_MOD} = 0) t
          WHERE rn <= {n_probes}),
        cand AS (
          SELECT pr.q_id, a.vec_id AS neighbor_id
          FROM probes pr JOIN assigned a ON a.cell = pr.cell
          {label_join}
          WHERE a.vec_id != pr.q_id{label_pred}),
        pcos AS (
          SELECT c.q_id, c.neighbor_id,
                 round(SUM(pq.x * pn.x)
                       / (sqrt(vq.vs) * sqrt(vn.vs)), 6) AS cos_sim
          FROM cand c
          JOIN px pq ON pq.vec_id = c.q_id
          JOIN px pn ON pn.vec_id = c.neighbor_id AND pn.i = pq.i
          JOIN vssq vq ON vq.vec_id = c.q_id
          JOIN vssq vn ON vn.vec_id = c.neighbor_id
          GROUP BY c.q_id, c.neighbor_id, vq.vs, vn.vs),
        ranked AS (
          SELECT q_id, neighbor_id, cos_sim,
                 CAST(row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INT)
                   AS rnk
          FROM pcos
          QUALIFY rnk <= {k})
        {final_select}"""


LLM_ORACLES["ann_ivf"] = _ann_ivf_oracle()
LLM_ORACLES["hard_negative_mine_ivf"] = _ann_ivf_oracle(
    hard_negatives=True)


# ann_ivfpq full literal-replay oracle (r4): the same unroll technique
# as ann_ivf, extended to the 9 nested Lloyd fits (1 coarse + 8
# subspace codebooks) over UNIT-normalized vectors.  Normalization
# runs in DuckDB's list domain with list_reduce so the sum-of-squares
# fold is sequential left-to-right exactly like Spark's F.aggregate
# (an out-of-order SUM feeding the TRAINING would risk flipping an
# argmin; inside round(,6) readouts the precedent accepts SUM).
def _pq_lloyd_chain(prefix: str, px: str, init_sql: str,
                    k: int, iters: int, dim: int) -> str:
    """Lloyd CTE chain with namespaced CTEs: {prefix}cx{iters} holds
    the final centroids, {prefix}asg the final (vec_id, cid, d2)
    assignment — mirrors ext_catalog._kmeans_replay_chain but over an
    arbitrary (vec_id, i, x) point table and init list."""
    sql = [f""",
        {prefix}init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cid, e
          FROM ({init_sql})),
        {prefix}cx0 AS (
          SELECT cid, u.i, e[u.i] AS cx
          FROM {prefix}init,
               (SELECT unnest(generate_series(1, {dim})) AS i) u)"""]
    prev = f"{prefix}cx0"
    for it in range(1, iters + 1):
        sql.append(f""",
        {prefix}d{it} AS (
          SELECT p.vec_id, c.cid,
                 SUM((p.x - c.cx) * (p.x - c.cx)) AS d2
          FROM {px} p JOIN {prev} c ON c.i = p.i
          GROUP BY 1, 2),
        {prefix}a{it} AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM {prefix}d{it}) t WHERE rn = 1),
        {prefix}m{it} AS (
          SELECT a.cid, p.i, AVG(p.x) AS cx
          FROM {prefix}a{it} a JOIN {px} p ON p.vec_id = a.vec_id
          GROUP BY 1, 2),
        {prefix}cx{it} AS (
          SELECT prev.cid, prev.i, COALESCE(m.cx, prev.cx) AS cx
          FROM {prev} prev
          LEFT JOIN {prefix}m{it} m
            ON m.cid = prev.cid AND m.i = prev.i)""")
        prev = f"{prefix}cx{it}"
    sql.append(f""",
        {prefix}dfin AS (
          SELECT p.vec_id, c.cid,
                 SUM((p.x - c.cx) * (p.x - c.cx)) AS d2
          FROM {px} p JOIN {prev} c ON c.i = p.i
          GROUP BY 1, 2),
        {prefix}asg AS (
          SELECT vec_id, cid, d2 FROM (
            SELECT vec_id, cid, d2, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM {prefix}dfin) t
          WHERE rn = 1)""")
    return "".join(sql)


def _ann_ivfpq_oracle(k: int = ANN_K, n_centroids: int = 16,
                      n_probes: int = 3, m: int = 8, n_codes: int = 16,
                      train_iters: int = 2, refine: int = 10,
                      dim: int = 64) -> str:
    sub_d = dim // m
    sql = [f"""
        WITH pts AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        upts AS (
          SELECT vec_id,
                 list_transform(e, x -> x / sqrt(
                   list_reduce(list_transform(e, y -> y * y),
                               (acc, v) -> acc + v))) AS u
          FROM pts),
        idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
        px AS (SELECT vec_id, i, u[i] AS x FROM upts, idx)"""]
    # coarse codebook over the full unit vectors
    sql.append(_pq_lloyd_chain(
        "c_", "px",
        f"SELECT vec_id, u AS e FROM upts ORDER BY vec_id LIMIT {n_centroids}",
        n_centroids, train_iters, dim))
    # 8 subspace codebooks over the unit-vector slices
    for j in range(m):
        lo, hi = j * sub_d + 1, (j + 1) * sub_d
        sql.append(f""",
        spx{j} AS (
          SELECT vec_id, i - {lo - 1} AS i, x FROM px
          WHERE i BETWEEN {lo} AND {hi})""")
        sql.append(_pq_lloyd_chain(
            f"s{j}_", f"spx{j}",
            f"SELECT vec_id, u[{lo}:{hi}] AS e FROM upts "
            f"ORDER BY vec_id LIMIT {n_codes}",
            n_codes, train_iters, sub_d))
        sql.append(f""",
        recon{j} AS (
          SELECT a.vec_id, c.i + {lo - 1} AS i, c.cx AS rx
          FROM s{j}_asg a
          JOIN s{j}_cx{train_iters} c ON c.cid = a.cid)""")
    recon_union = " UNION ALL ".join(
        f"SELECT * FROM recon{j}" for j in range(m))
    sql.append(f""",
        recon AS ({recon_union}),
        probes AS (
          SELECT vec_id AS q_id, cid AS cell FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM c_dfin WHERE vec_id % {ANN_QUERY_MOD} = 0) t
          WHERE rn <= {n_probes}),
        cand AS (
          SELECT pr.q_id, a.vec_id AS neighbor_id
          FROM probes pr JOIN c_asg a ON a.cid = pr.cell
          WHERE a.vec_id != pr.q_id),
        adc AS (
          SELECT c.q_id, c.neighbor_id,
                 round(SUM(pq.x * r.rx), 6) AS approx_sim
          FROM cand c
          JOIN px pq ON pq.vec_id = c.q_id
          JOIN recon r ON r.vec_id = c.neighbor_id AND r.i = pq.i
          GROUP BY 1, 2),
        pool AS (
          SELECT q_id, neighbor_id, approx_sim FROM (
            SELECT *, row_number() OVER (
              PARTITION BY q_id
              ORDER BY approx_sim DESC, neighbor_id ASC) AS pr
            FROM adc) t
          WHERE pr <= {refine * k}),
        refined AS (
          SELECT p.q_id, p.neighbor_id, p.approx_sim,
                 round(SUM(pq.x * pn.x), 6) AS cos_sim
          FROM pool p
          JOIN px pq ON pq.vec_id = p.q_id
          JOIN px pn ON pn.vec_id = p.neighbor_id AND pn.i = pq.i
          GROUP BY 1, 2, 3)
        SELECT q_id, neighbor_id, cos_sim, approx_sim,
               CAST(row_number() OVER (
                 PARTITION BY q_id
                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
        FROM refined
        QUALIFY rnk <= {k}""")
    return "".join(sql)


LLM_ORACLES["ann_ivfpq"] = _ann_ivfpq_oracle()


def _lang_confusion_oracle() -> str:
    """Confusion-matrix rollup over the lang_id oracle chain."""
    lang_sql = LLM_ORACLES["lang_id"]
    return f"""
        WITH preds AS ({lang_sql}),
        cm AS (
          SELECT lang, predicted_lang,
                 CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM preds GROUP BY 1, 2),
        t AS (SELECT lang, SUM(n_docs) AS tt FROM cm GROUP BY 1)
        SELECT cm.lang, cm.predicted_lang, cm.n_docs,
               round(CAST(cm.n_docs AS DOUBLE) / t.tt, 6) AS frac
        FROM cm JOIN t USING (lang)
    """


LLM_ORACLES["lang_id_confusion"] = _lang_confusion_oracle()

LLM_ORACLES["ann_lsh_bucket"] = f"""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
      FROM embeddings),
    n AS (SELECT vec_id, e, list_sum([x * x FOR x IN e]) AS ssq FROM v),
    s AS (SELECT vec_id, e, ssq, ({_SIG_EXPR}) AS bucket FROM n),
    q AS (SELECT vec_id AS q_id, e AS qe, ssq AS qssq, bucket AS qb
          FROM s WHERE vec_id % {ANN_QUERY_MOD} = 0),
    probes AS (SELECT q_id, qe, qssq, unnest([{_PROBES}]) AS probe FROM q),
    cand AS (
      SELECT DISTINCT p.q_id, s.vec_id AS neighbor_id,
             round(list_sum([p.qe[i] * s.e[i]
                             FOR i IN generate_series(1, len(s.e))])
                   / (sqrt(p.qssq) * sqrt(s.ssq)), 6) AS cos_sim
      FROM probes p JOIN s ON s.bucket = p.probe
      WHERE s.vec_id <> p.q_id)
    SELECT q_id, neighbor_id, cos_sim,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
    FROM cand
    QUALIFY rnk <= {ANN_K}
"""

def q_embedding_int8_quantize(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit
    (operators/ann.py int8_quantize_stats — the FAISS SQ8 storage-
    shrink step): per label, mean scale, mean reconstruction error,
    and worst-vector error.  Map-only array HOFs; DECIMAL(18,6)
    error quantization makes the rollup order-independent; the
    oracle replays the identical fold arithmetic with DuckDB list
    HOFs (both engines fold left-to-right)."""
    from ..operators.ann import int8_quantize_stats

    apply_engine_conf(spark)
    return int8_quantize_stats(_emb(spark, sf_dir))


def q_embedding_random_projection(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """JL / Rademacher random projection (operators/ann.py
    random_projection): 64-dim embeddings → 8 dims with a
    deterministic ±1 matrix, the byte-shrink preprocessing before ANN
    indexing or k-means at corpus scale.  Map-only (no shuffle at any
    size); ±1 multiplies are exact sign flips so the oracle's
    identical-literal replay is bit-exact."""
    from ..operators.ann import random_projection

    apply_engine_conf(spark)
    return random_projection(_emb(spark, sf_dir))


def q_hard_negative_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training
    (operators/ann.py hard_negative_mine): per query vector, the
    top-{k} most-similar corpus vectors with a DIFFERENT label —
    exact brute with guard; the IVF cell join is the 100 TB candidate
    path.  Same query set as the other ANN entries."""
    from ..operators.ann import hard_negative_mine

    apply_engine_conf(spark)
    return hard_negative_mine(
        _emb(spark, sf_dir),
        F.col("vec_id") % ANN_QUERY_MOD == 0, k=ANN_K)


LLM_ORACLES["hard_negative_mine"] = f"""
    WITH v AS (
      SELECT vec_id, label,
             [CAST(x AS DOUBLE) FOR x IN embedding] AS e
      FROM embeddings),
    n AS (SELECT vec_id, label, e,
                 list_sum([x * x FOR x IN e]) AS ssq FROM v),
    q AS (SELECT vec_id AS q_id, label AS q_label, e AS qe, ssq AS qssq
          FROM n WHERE vec_id % {ANN_QUERY_MOD} = 0),
    p AS (
      SELECT q_id, q_label, vec_id AS neighbor_id, label AS neg_label,
             round(list_sum([qe[i] * e[i]
                             FOR i IN generate_series(1, len(e))])
                   / (sqrt(qssq) * sqrt(ssq)), 6) AS cos_sim
      FROM q JOIN n ON label <> q_label)
    SELECT q_id, q_label, neighbor_id, neg_label, cos_sim,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
    FROM p
    QUALIFY rnk <= {ANN_K}
"""


def q_corpus_curation_pipeline(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """PRODUCTION COMPOSITION — the end-to-end curation run an LLM
    data pipeline actually executes, chained from the individually-
    tested stages: (1) Gopher-style heuristic_filter quality gate;
    (2) exact dedup (normalized-md5 content hash, min-id canonical);
    (3) near-dup collapse (char-n-gram Jaccard pairs ≥ τ → connected
    components → canonical survivors only); (4) per-source survivor
    accounting after every stage — the funnel report a curation run
    ships with its output.  Each stage consumes only the previous
    stage's survivors (the real cost profile: the expensive pair pass
    runs on the post-filter, post-exact corpus).  Full oracle: the
    stage CTEs compose the same way in SQL, with the shingle pass
    scoped to the stage-2 survivors."""
    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    hf = cp.heuristic_filter(docs, lt.STOPWORDS["en"])
    kept1 = docs.join(
        hf.where("keep").select("doc_id"), "doc_id").transform(pin)
    ex = lt.exact_dedup(kept1)
    k2docs = kept1.join(
        ex.where(~F.col("is_duplicate")).select("doc_id"),
        "doc_id").transform(pin)
    pairs = lt.ngram_jaccard_pairs(k2docs, JACCARD_N, JACCARD_TAU)
    kept3 = dedup_clusters(k2docs, pairs) \
        .where("is_canonical").select("doc_id")

    def per_source(df, name):
        return df.groupBy("source").agg(
            F.count("*").cast("bigint").alias(name))

    raw_s = per_source(docs, "n_raw")
    f_s = per_source(kept1, "n_filtered")
    e_s = per_source(k2docs, "n_exact")
    fin = (k2docs.join(kept3, "doc_id").groupBy("source")
           .agg(F.count("*").cast("bigint").alias("n_final"),
                F.sum(F.length("text")).cast("bigint")
                .alias("chars_final")))
    z = F.lit(0).cast("bigint")
    return (
        raw_s.join(f_s, "source", "left")
        .join(e_s, "source", "left")
        .join(fin, "source", "left")
        .select("source", "n_raw",
                F.coalesce("n_filtered", z).alias("n_filtered"),
                F.coalesce("n_exact", z).alias("n_exact"),
                F.coalesce("n_final", z).alias("n_final"),
                F.coalesce("chars_final", z).alias("chars_final"))
    )


def _curation_oracle() -> str:
    from .ext_catalog import EXT_ORACLES

    hf = EXT_ORACLES["heuristic_filter"]
    shingles_scoped = _SHINGLES_CTE.replace("FROM documents",
                                            "FROM k2docs")
    return f"""
    WITH RECURSIVE
    hf AS ({hf}),
    kept1 AS (
      SELECT d.doc_id, d.text, d.source
      FROM documents d JOIN hf ON hf.doc_id = d.doc_id AND hf.keep),
    ex AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS h
      FROM kept1),
    kept2 AS (
      SELECT doc_id FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS c
        FROM ex) t
      WHERE doc_id = c),
    k2docs AS (
      SELECT k.doc_id, k.text, k.source
      FROM kept1 k JOIN kept2 USING (doc_id)),
    {shingles_scoped},
    sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
    shf AS (
      SELECT * FROM sh WHERE hg NOT IN (
        SELECT hg FROM sh GROUP BY hg
        HAVING COUNT(*) > {lt.MAX_SHINGLE_DF})),
    inter AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
      FROM shf a JOIN shf b ON a.hg = b.hg AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_i, doc_j FROM inter
      JOIN sz sa ON sa.doc_id = doc_i
      JOIN sz sb ON sb.doc_id = doc_j
      WHERE round(CAST(n_inter AS DOUBLE)
                  / CAST(sa.n_sg + sb.n_sg - n_inter AS DOUBLE), 6)
            >= {JACCARD_TAU}),
    edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
              UNION ALL SELECT doc_j AS a, doc_i AS b FROM pairs),
    reach AS (
      SELECT doc_id AS node, doc_id AS lbl FROM k2docs
      UNION
      SELECT e.a AS node, r.lbl
      FROM edges e JOIN reach r ON r.node = e.b),
    labels AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
               FROM reach GROUP BY 1),
    kept3 AS (SELECT doc_id FROM labels WHERE doc_id = cluster_id),
    raw_s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
              FROM documents GROUP BY 1),
    f_s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_filtered
            FROM kept1 GROUP BY 1),
    e_s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM k2docs GROUP BY 1),
    fin AS (
      SELECT k.source, CAST(COUNT(*) AS BIGINT) AS n_final,
             CAST(SUM(length(k.text)) AS BIGINT) AS chars_final
      FROM k2docs k JOIN kept3 USING (doc_id) GROUP BY 1)
    SELECT r.source, r.n_raw,
           CAST(COALESCE(f.n_filtered, 0) AS BIGINT) AS n_filtered,
           CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(fn.n_final, 0) AS BIGINT) AS n_final,
           CAST(COALESCE(fn.chars_final, 0) AS BIGINT) AS chars_final
    FROM raw_s r
    LEFT JOIN f_s f USING (source)
    LEFT JOIN e_s e USING (source)
    LEFT JOIN fin fn USING (source)
    """


LLM_ORACLES["corpus_curation_pipeline"] = _curation_oracle()


def q_hard_negative_mine_ivf(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The SCALE PATH for hard-negative mining: IVF coarse cells
    generate the candidates (broadcast codebook, cell-equality join
    touching ~n_probes/M of the corpus) and the label-mismatch
    predicate rides the candidate join (operators/ann.py ivf_topk
    with exclude_label_col) — no corpus×queries brute pass.  Full
    literal-replay oracle: the ann_ivf Lloyd chain with the label
    filter on candidates.  Recall-vs-brute pinned in pytest."""
    from ..operators.ann import ivf_topk

    apply_engine_conf(spark)
    return ivf_topk(
        _emb(spark, sf_dir),
        F.col("vec_id") % ANN_QUERY_MOD == 0, k=ANN_K,
        exclude_label_col="label", cache_key=_emb_key(sf_dir))


# JL projection: identical ±1 literals, identical sequential fold
# (list_sum == Spark aggregate's left fold), sqrt(k) is IEEE-exact
from ..operators.ann import K_PROJ as _K_PROJ  # noqa: E402
from ..operators.ann import rp_signs as _rp_signs  # noqa: E402

_RP = _rp_signs()
LLM_ORACLES["embedding_random_projection"] = (
    "WITH v AS (SELECT vec_id, label, "
    "[CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings) "
    "SELECT vec_id, label, "
    + ", ".join(
        "list_sum([e[i] * ([" + ",".join(str(s) for s in _RP[j]) + "])[i]"
        f" FOR i IN generate_series(1, {len(_RP[j])})])"
        f" / sqrt({_K_PROJ}) AS proj_{j}"
        for j in range(_K_PROJ))
    + " FROM v")

LLM_ORACLES["embedding_int8_quantize"] = """
    WITH base AS (
      SELECT label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    scaled AS (
      SELECT label, e,
             CASE WHEN list_max(list_transform(e, x -> abs(x))) > 0
                  THEN list_max(list_transform(e, x -> abs(x))) / 127.0
                  ELSE 0.0 END AS s
      FROM base),
    perv AS (
      SELECT label,
             CAST(CASE WHEN s > 0 THEN
               list_reduce(
                 list_prepend(0.0, list_transform(e,
                   x -> abs(x - LEAST(127.0, GREATEST(-127.0,
                                round(x / s))) * s))),
                 (a, b) -> a + b) / len(e)
             ELSE 0.0 END AS DECIMAL(18,6)) AS err,
             CAST(s AS DECIMAL(18,6)) AS sc
      FROM scaled)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST((2 * CAST(SUM(sc) * 1000000 AS BIGINT) + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS avg_scale,
           CAST((2 * CAST(SUM(err) * 1000000 AS BIGINT) + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS avg_err,
           CAST(MAX(err) AS DOUBLE) AS max_err
    FROM perv GROUP BY 1
"""


LLM_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "embedding_int8_quantize": q_embedding_int8_quantize,
    "embedding_random_projection": q_embedding_random_projection,
    "hard_negative_mine": q_hard_negative_mine,
    "hard_negative_mine_ivf": q_hard_negative_mine_ivf,
    "corpus_curation_pipeline": q_corpus_curation_pipeline,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_prefix_filter": q_dedup_prefix_filter,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_bucket": q_ann_lsh_bucket,
    "ann_ivf": q_ann_ivf,
    "ann_ivfpq": q_ann_ivfpq,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_transform": q_multimodal_transform,
    "lang_id_confusion": q_lang_id_confusion,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_bigstar": q_dedup_clusters_bigstar,
    "dedup_lsh_jaccard": q_dedup_lsh_jaccard,
    "doc_repetition": q_doc_repetition,
    "distinct_sketch": q_distinct_sketch,
    "vocab_topk": q_vocab_topk,
    "pii_redact": q_pii_redact,
    "doc_chunking": q_doc_chunking,
    "stratified_sample": q_stratified_sample,
    "tfidf_topk": q_tfidf_topk,
    "bigram_topk": q_bigram_topk,
    "doc_len_histogram": q_doc_len_histogram,
    "benchmark_decontam": q_benchmark_decontam,
    "ngram_decontam": q_ngram_decontam,
    "per_source_cap": q_per_source_cap,
}
