"""Corpus-preparation operators for LLM training-data pipelines:
vocabulary building, PII redaction, document chunking, deterministic
stratified sampling.

All are built-in Column expressions (JVM-side, codegen) — no Python
UDFs.  Hash/regex primitives are chosen to be bit-reproducible in the
DuckDB oracle (md5 hex, RE2-compatible regex syntax).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .llm_text import (doc_shingles, normalized_text, shingle_arrays,
                       word_shingles, ws_tokens)

# ---------------------------------------------------------------------------
# vocabulary (word-count, the canonical map-side-combine aggregation)

VOCAB_TOP_K = 100


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOP_K,
               text_col: str = "text") -> DataFrame:
    """Top-k tokens by corpus term frequency (ties → token asc).

    Scale shape: explode → partial-aggregated groupBy(token) — the
    shuffle carries (token, partial_count), not token occurrences.
    The top-k selection is orderBy().limit(k) — Catalyst compiles it
    to TakeOrderedAndProject, a per-partition bounded heap merged on
    the driver, so the |V|-row vocab (Heaps-law large at 100 TB) is
    never sorted through one reducer; the rank window then runs over
    the k-row result only."""
    ex = docs.select(
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
        F.col("doc_id"),
    )
    agg = ex.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = agg.orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))  # k rows only
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# PII redaction

# Java-regex ∩ RE2 compatible (no lookaround/backrefs) so Spark and the
# DuckDB oracle replace the exact same spans
EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_PAT = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace email/phone spans with <EMAIL>/<PHONE> placeholders and
    count matches per doc.  Pure per-row regexp — map-only, no
    shuffle; at 100 TB this pipelines with the scan."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_count(text, F.lit(EMAIL_PAT)).cast("int").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_PAT)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(text, PHONE_PAT, "<PHONE>"),
            EMAIL_PAT, "<EMAIL>",
        ).alias("redacted_text"),
    )


# ---------------------------------------------------------------------------
# chunking

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def doc_chunks(docs: DataFrame, chunk: int = CHUNK_TOKENS,
               stride: int = CHUNK_STRIDE,
               text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunks (size ``chunk``, step
    ``stride``); trailing windows may be short.  Narrow transform +
    one Generate — each task chunks its own partition's docs, no
    shuffle.  The token array is materialized in its own projection
    (HOF CSE — see llm_text.doc_shingles)."""
    toks = docs.select(
        "doc_id", ws_tokens(F.col(text_col)).alias("__t"))
    # zero-token docs emit no chunks; also required because Spark's
    # sequence(1, 0, step) raises where DuckDB's generate_series is empty
    toks = toks.where(F.size("__t") > 0)
    c = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(1, size(__t), {stride}), i -> named_struct("
            f"'chunk_id', cast((i - 1) div {stride} as int), "
            f"'start_tok', cast(i as int), "
            f"'n_chunk_tokens', cast(size(slice(__t, i, {chunk})) as int), "
            f"'chunk_text', array_join(slice(__t, i, {chunk}), ' ')))"
        )).alias("c"),
    )
    return c.select("doc_id", "c.chunk_id", "c.start_tok",
                    "c.n_chunk_tokens", "c.chunk_text")


# ---------------------------------------------------------------------------
# repetition-based quality filtering (Gopher-style)

TOP_TOKEN_FRAC_MAX = 0.2
DUP_2GRAM_FRAC_MAX = 0.5

# max run length over the SORTED token array == max token multiplicity,
# computed narrowly per row (no explode / groupBy(doc_id, token) shuffle)
_MAX_RUN_EXPR = """
aggregate(
  array_sort(__t),
  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
  (acc, x) -> named_struct(
    'prev', x,
    'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),
    'best', greatest(acc.best,
                     IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))),
  acc -> acc.best)
"""


def doc_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition metrics per doc — the Gopher/MassiveText-style
    quality signals (Rae et al. 2021 §A1.1): most-frequent-token
    fraction and duplicate word-n-gram fraction, plus a keep/drop flag.

    Entirely NARROW: token array materialized once, max token
    multiplicity via a sorted-run fold, n-gram dup fractions via
    array_distinct — no shuffle at all; at 100 TB this is a map-only
    pass that pipelines with the scan.  Zero-token docs are dropped.
    """
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.col(text_col))).alias("__t"),
    ).where(F.size("__t") > 0)
    staged = toks.select(
        "doc_id",
        F.size("__t").alias("__n"),
        F.expr(_MAX_RUN_EXPR).alias("__maxrun"),
        word_shingles(F.col("__t"), 2).alias("__g2"),
        word_shingles(F.col("__t"), 3).alias("__g3"),
    )

    def dup_frac(g: str) -> Column:
        n = F.size(g)
        return F.when(
            n > 0,
            F.round((n - F.size(F.array_distinct(g))).cast("double")
                    / n.cast("double"), 6),
        ).otherwise(F.lit(0.0))

    out = staged.select(
        "doc_id",
        F.col("__n").cast("int").alias("n_tokens"),
        F.round(F.col("__maxrun").cast("double") / F.col("__n").cast("double"),
                6).alias("top_token_frac"),
        dup_frac("__g2").alias("dup_2gram_frac"),
        dup_frac("__g3").alias("dup_3gram_frac"),
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("top_token_frac") > TOP_TOKEN_FRAC_MAX)
        | (F.col("dup_2gram_frac") > DUP_2GRAM_FRAC_MAX),
    )


# ---------------------------------------------------------------------------
# distinct-count sketch (deterministic hash-threshold sampling)

SKETCH_THR_HEX4 = "0800"  # keep hashes < 0x0800/0x10000 → p = 1/32
SKETCH_SCALE = 0x10000 / 0x0800


def distinct_token_estimate(docs: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """Distinct-token cardinality per lang: exact count next to a
    deterministic hash-threshold sketch estimate.

    The sketch: keep only tokens with md5 prefix < SKETCH_THR_HEX4
    (a fixed p = 1/32 uniform sample OF THE HASH DOMAIN, so duplicates
    agree everywhere), count distinct survivors, scale by 1/p — the
    fixed-threshold variant of the KMV / adaptive-sampling distinct
    sketch (Bar-Yossef et al. 2002).  Deterministic in the data (md5),
    so the DuckDB oracle reproduces it exactly — unlike HLL, whose
    register layout is engine-specific.

    Scale shape: the survivor filter is map-side (1/32 of token
    occurrences reach the shuffle); the exact column is the expensive
    full distinct and exists here only to exhibit the sketch's error —
    at 100 TB you compute survivors only.
    """
    toks = docs.select(
        "lang",
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    ).distinct()
    surv = F.substring(F.md5(F.col("token")), 1, 4) < SKETCH_THR_HEX4
    agg = toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_distinct_exact"),
        F.sum(F.when(surv, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )
    est = F.round(F.col("n_sampled") * F.lit(float(SKETCH_SCALE)), 1)
    return agg.select(
        "lang", "n_distinct_exact", "n_sampled",
        est.alias("est_distinct"),
        F.round(F.abs(est - F.col("n_distinct_exact"))
                / F.col("n_distinct_exact"), 6).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# tf-idf (per-doc salient terms — classic corpus-selection signal)

TFIDF_TOP_K = 3


def tfidf_topk(docs: DataFrame, k: int = TFIDF_TOP_K,
               text_col: str = "text") -> DataFrame:
    """Top-k tokens per doc by smoothed tf-idf
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smooth_idf convention).

    Scale shape: tf is a partial-aggregated groupBy(doc_id, token); df
    re-aggregates the ALREADY-REDUCED tf table (|doc·vocab| rows, far
    smaller than token occurrences), and the df join keys on token —
    vocab-sized, so AQE turns it into a broadcast at typical corpus
    vocab sizes.  The ranking window partitions by doc_id — fully
    parallel, no global sort.  N is resolved once on the driver (one
    column-pruned count scan) and folded in as a literal."""
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfc = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = tf.join(dfc, "token").select(
        "doc_id", "token", "tf", "df",
        F.round(F.col("tf").cast("double") * idf, 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# corpus n-gram statistics

BIGRAM_TOP_K = 50


def bigram_topk(docs: DataFrame, k: int = BIGRAM_TOP_K,
                text_col: str = "text") -> DataFrame:
    """Top-k word bigrams by corpus frequency (ties → bigram asc).
    Same map-side-combine shape as vocab_topk; the bigram array is
    built narrowly per row (word_shingles) before the explode."""
    staged = docs.select(
        "doc_id",
        word_shingles(ws_tokens(F.lower(F.col(text_col))), 2).alias("__g2"))
    ex = staged.select("doc_id", F.explode("__g2").alias("bigram"))
    agg = ex.groupBy("bigram").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # TakeOrderedAndProject heap, then rank the k-row result only
    top = agg.orderBy(F.desc("tf"), F.asc("bigram")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("bigram"))
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# corpus shape profiling

HIST_BUCKET_TOKENS = 50


def doc_length_histogram(docs: DataFrame,
                         bucket: int = HIST_BUCKET_TOKENS,
                         text_col: str = "text") -> DataFrame:
    """Token-length histogram per lang: doc counts + token mass per
    fixed-width bucket.  The bucket id is computed map-side, so the
    shuffle carries one partial row per (lang, bucket) per task —
    constant-sized regardless of corpus size."""
    staged = docs.select(
        "lang", F.size(ws_tokens(F.lower(F.col(text_col)))).alias("__n"))
    b = F.floor(F.col("__n") / F.lit(bucket)).cast("int")
    return (
        staged.groupBy("lang", b.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("total_tokens"),
            F.min("__n").cast("int").alias("min_tokens"),
            F.max("__n").cast("int").alias("max_tokens"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * bucket).cast("int"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination

def benchmark_decontam(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flag corpus docs whose normalized content hash collides with a
    held-out benchmark set (doc_id % 10 == 0 plays the benchmark role
    here) — the standard eval-decontamination pass before training.

    Scale shape: the benchmark side aggregates to one row per distinct
    hash and is BROADCAST — benchmark suites are tiny next to a 100 TB
    corpus, so the corpus side never shuffles; the whole op is a
    map-side hash-probe that pipelines with the scan."""
    norm_hash = F.md5(normalized_text(F.col(text_col)))
    hashed = docs.select("doc_id", norm_hash.alias("content_hash"))
    bench = (
        hashed.where(F.col("doc_id") % 10 == 0)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("benchmark_doc_id"))
    )
    corpus = hashed.where(F.col("doc_id") % 10 != 0)
    return (
        corpus.join(F.broadcast(bench), "content_hash", "left")
        .select(
            "doc_id", "content_hash", "benchmark_doc_id",
            F.col("benchmark_doc_id").isNotNull().alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram overlap decontamination (GPT-3 appendix-C style)

DECONTAM_N = 5
DECONTAM_TAU = 0.1


def ngram_decontam(docs: DataFrame, n: int = DECONTAM_N,
                   tau: float = DECONTAM_TAU) -> DataFrame:
    """Fuzzy eval-set decontamination: corpus docs sharing ≥ tau of
    their distinct word-n-grams with any benchmark doc (doc_id % 10 == 0
    plays the benchmark role).  Complements benchmark_decontam (exact
    hash): this catches partial containment — quoted spans, truncated
    copies — the way GPT-3's 13-gram overlap filter did.

    Scale shape: both sides reduce to DISTINCT 60-bit shingle hashes
    (doc_shingles); the benchmark side is BROADCAST (benchmark suites
    are ~10⁵ docs vs a 100 TB corpus), so the corpus side never
    shuffles for the probe — only the per-pair overlap count aggregates,
    and that output is bounded by true near-matches, not the corpus."""
    sh = doc_shingles(docs, n)
    bench = (
        sh.where(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("benchmark_doc_id"), "hg")
    )
    corp = sh.where(F.col("doc_id") % 10 != 0)
    sizes = (
        shingle_arrays(docs, n)
        .where(F.col("doc_id") % 10 != 0)
        .select("doc_id", F.size("sgs").cast("bigint").alias("n_grams"))
    )
    shared = (
        corp.join(F.broadcast(bench), "hg")
        .groupBy("doc_id", "benchmark_doc_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )
    frac = F.round(
        F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"), 6)
    return (
        shared.join(sizes, "doc_id")
        .withColumn("overlap_frac", frac)
        .where(F.col("overlap_frac") >= tau)
        .select("doc_id", "benchmark_doc_id", "n_overlap", "n_grams",
                "overlap_frac")
    )


# ---------------------------------------------------------------------------
# per-source cap (domain balancing)

SOURCE_CAP = 10


def per_source_cap(docs: DataFrame, cap: int = SOURCE_CAP,
                   source_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Cap each source/domain at ``cap`` docs, picked by deterministic
    md5 priority (the per-domain cap every web-corpus pipeline applies
    so no single domain dominates the mixture).  Reproducible across
    runs — same corpus → same kept set.

    Scale shape: one hash-partitioned window on source.  A skewed
    giant domain concentrates on one task; for pathological skew
    pre-filter with an approximate per-source count and a salted
    two-level top-k before the exact window."""
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(
        key.asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), F.col(source_col), key.alias("samp_key"))
        .withColumn("samp_rank", F.row_number().over(w).cast("int"))
        .where(F.col("samp_rank") <= cap)
    )


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (C4-style line dedup at chunk granularity)

PARA_TOKENS = 16


def paragraph_dedup(docs: DataFrame, para: int = PARA_TOKENS,
                    text_col: str = "text") -> DataFrame:
    """Exact dedup at sub-document granularity: non-overlapping
    ``para``-token windows, hashed, first occurrence wins (C4 does this
    per line; the synthetic corpus has no newlines so fixed token
    windows play the paragraph role).

    The (doc, chunk) winner is encoded as ONE sortable bigint
    (doc_id·2²⁰ + chunk_id) so canonical selection is a single MIN
    window over the chunk hash — one shuffle on a high-cardinality,
    uniformly-distributed key (the reference's HASH-distribution
    pattern, core/12_trip_clean.dedupe_load.sql's latest-wins analog
    flipped to first-wins)."""
    chunks = doc_chunks(docs, chunk=para, stride=para, text_col=text_col)
    pos_key = (F.col("doc_id") * F.lit(1 << 20)
               + F.col("chunk_id")).cast("bigint")
    staged = chunks.select(
        "doc_id", "chunk_id",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
        pos_key.alias("__pk"),
    )
    w = Window.partitionBy("chunk_hash")
    out = staged.select(
        "doc_id", "chunk_id", "chunk_hash",
        F.min("__pk").over(w).alias("__canon"),
        F.count("*").over(w).cast("bigint").alias("group_size"),
        F.col("__pk").alias("__pk"),
    )
    return out.select(
        "doc_id", "chunk_id", "chunk_hash", "group_size",
        F.floor(F.col("__canon") / F.lit(1 << 20)).cast("bigint")
            .alias("canonical_doc_id"),
        (F.col("__canon") % F.lit(1 << 20)).cast("int")
            .alias("canonical_chunk_id"),
        (F.col("__pk") != F.col("__canon")).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# heuristic document quality filter (Gopher/C4-style rules)

FILTER_MIN_TOKENS = 20
FILTER_MAX_TOKENS = 100_000
FILTER_MWL_MIN = 3.0
FILTER_MWL_MAX = 10.0
FILTER_SYMBOL_RATIO_MAX = 0.1
FILTER_MIN_STOPWORDS = 2
SYMBOL_PAT = "[#@*^~|<>{}]"


def heuristic_filter(docs: DataFrame, stopwords: tuple[str, ...],
                     text_col: str = "text") -> DataFrame:
    """Gopher-style (Rae et al. 2021 §A1.1) rule-based quality flags:
    token-count bounds, mean-word-length band, symbol-to-char ratio,
    distinct-stopword floor, terminal punctuation — plus the composite
    ``keep`` verdict.  The reference's domain-filter pass
    (core/11_trip_clean.slice_ctas.sql WHERE block) re-expressed for
    text corpora.

    Entirely NARROW (token array materialized once, per-row folds) —
    a map-only pass that pipelines with the scan at 100 TB."""
    text = F.col(text_col)
    staged = docs.select(
        "doc_id", text.alias("__txt"),
        ws_tokens(F.lower(text)).alias("__t"),
    ).where(F.size("__t") > 0)
    n = F.size("__t")
    tok_chars = F.aggregate(
        F.transform("__t", F.length), F.lit(0), lambda a, x: a + x)
    mwl = F.round(tok_chars.cast("double") / n.cast("double"), 6)
    sym_ratio = F.round(
        F.regexp_count(F.col("__txt"), F.lit(SYMBOL_PAT)).cast("double")
        / F.length("__txt").cast("double"), 6)
    n_stop = F.size(F.array_intersect(
        "__t", F.array(*[F.lit(s) for s in stopwords])))
    term = F.col("__txt").rlike("[.!?]$")
    m = staged.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        n_stop.cast("int").alias("n_stop_distinct"),
        term.alias("has_terminal_punct"),
    )
    keep = (
        (F.col("n_tokens") >= FILTER_MIN_TOKENS)
        & (F.col("n_tokens") <= FILTER_MAX_TOKENS)
        & (F.col("mean_word_len") >= FILTER_MWL_MIN)
        & (F.col("mean_word_len") <= FILTER_MWL_MAX)
        & (F.col("symbol_ratio") < FILTER_SYMBOL_RATIO_MAX)
        & (F.col("n_stop_distinct") >= FILTER_MIN_STOPWORDS)
    )
    return m.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# deterministic stratified sampling

def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float, strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum Bernoulli sample, deterministic in the row id.

    keep ⟺ first 16 bits of md5(id) < floor(rate·2¹⁶), compared as
    4-hex-digit strings (lexicographic = numeric for fixed width).
    Reproducible across engines/runs — re-running the pipeline samples
    the SAME rows (unlike rand()-based sampling), which is what you
    want for auditable training-data cuts.  Map-only, no shuffle."""
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    thr = None
    for stratum, rate in rates.items():
        hexthr = F.lit(format(int(rate * 65536), "04x"))
        thr = (F.when(F.col(strata_col) == stratum, hexthr) if thr is None
               else thr.when(F.col(strata_col) == stratum, hexthr))
    thr = thr.otherwise(F.lit(format(int(default_rate * 65536), "04x")))
    return (
        docs.select(F.col(id_col), F.col(strata_col),
                    key.alias("sample_key"), thr.alias("threshold"))
        .where(F.col("sample_key") < F.col("threshold"))
    )


# ---------------------------------------------------------------------------
# deterministic dataset split

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10


def dataset_split(docs: DataFrame, id_col: str = "doc_id",
                  train_pct: int = SPLIT_TRAIN_PCT,
                  val_pct: int = SPLIT_VAL_PCT) -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id) mod 100 →
    percentage bucket → split label.  Map-only (no shuffle, no RNG
    state): the assignment is a pure function of the id, so it is
    stable under re-runs, backfills, and engine changes — the property
    a training pipeline needs so a doc never migrates between splits
    between pipeline runs.  Reference parity: the deterministic
    SHA-256 trip_id derivation (mdl/load/40_fact_trip.load.sql) — same
    content-addressed-identity idea applied to split assignment."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100).cast("int")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("split_bucket"),
        F.when(bucket < train_pct, "train")
         .when(bucket < train_pct + val_pct, "val")
         .otherwise("test").alias("split"))


# ---------------------------------------------------------------------------
# sequence packing

PACK_SEQ_TOKENS = 256


def sequence_packing(docs: DataFrame, seq_tokens: int = PACK_SEQ_TOKENS,
                     group_col: str = "source", id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Pack documents into fixed-token-budget training sequences by
    cumulative-sum binning within each source group: docs in id order,
    bin = floor((cumsum_before) / seq_tokens).

    Spark-first shape: token counts are narrow; the running cumsum is
    ONE window shuffle partitioned by the source group (packing is
    per-domain, so no global total order — the degenerate
    single-partition global cumsum is exactly what this avoids at
    100 TB); bin stats are a map-side-combined groupBy over the already
    co-partitioned (group, bin) keys.  Greedy first-fit-decreasing
    packs tighter but is inherently sequential; cumsum binning is the
    streaming-friendly deterministic strategy (overflow docs spill into
    the next bin, fill_ratio reports the realized packing
    efficiency)."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: t != "")).cast("bigint").alias("n_tok"))
    w = (Window.partitionBy("grp").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = toks.select(
        "grp", "doc_id", "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok"))
                / F.lit(seq_tokens)).cast("bigint").alias("bin_id"))
    return (binned.groupBy(F.col("grp").alias("source"), "bin_id")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_tok").alias("sum_tokens"),
                 F.round(F.sum("n_tok").cast("double")
                         / F.lit(float(seq_tokens)), 6).alias("fill_ratio")))
