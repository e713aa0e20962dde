"""LLM-training-data text operators: dedup family + text analysis.

All hot paths are built-in Column expressions (JVM-side, inside
WholeStageCodegen) — no Python UDFs.  Hash primitives are md5/sha2 so the
DuckDB oracle can reproduce them bit-for-bit.

Scale notes (100 TB corpus):
- Shingling explodes each doc into ~|text| rows; the per-shingle joins
  below shuffle on the shingle/band key (high cardinality, well spread).
- Exact-Jaccard self-join is quadratic per shared shingle — it is the
  verification stage; at scale you run it only on MinHash-LSH candidate
  pairs (``minhash_lsh_candidates``), never all-pairs.
- MinHash banding shuffles only (band_id, signature) pairs — the classic
  MMDS ch.3 scheme — so the candidate join touches a tiny fraction of
  the corpus cross product.
- SimHash reduces each doc to 64 bits; candidate generation joins on
  16-bit band equality (4 bands → hamming ≤ 3 guaranteed recall within
  a band scheme, wider via threshold on exact hamming).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling primitives

def ws_tokens(col: Column | str) -> Column:
    """Non-empty whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def normalized_text(col: Column | str) -> Column:
    """lower + trim + collapse runs of whitespace — canonical form for
    exact dedup (normalization-then-hash, the standard corpus-dedup
    pre-step)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, " +", " ")))


def word_shingles(tokens: Column, n: int) -> Column:
    """Ordered word n-gram shingles (duplicates preserved; wrap with
    array_distinct for set semantics)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_shingles(col: Column | str, n: int) -> Column:
    """Ordered character n-gram shingles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - (n - 1)),
            lambda i: F.substring(c, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, hg) — one row per DISTINCT word-n-gram shingle per doc,
    keyed by a 60-bit md5-prefix hash of the shingle rather than the
    string itself: the downstream self-join then shuffles and compares
    16-byte (bigint, bigint) rows instead of variable-length strings
    (~15% on the all-pairs join at sf0.1; proportionally more at scale
    where shuffle IO dominates).  md5-derived, so the DuckDB oracle
    reproduces the exact key (collisions included, were any to occur).

    Tokenization is a SEPARATE projection: inlining it into the shingle
    expression makes Spark re-evaluate split+filter once per reference
    (measured 10x slower at sf0.1 — no common-subexpression elimination
    inside interpreted higher-order functions)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.col(text_col)).alias("__t"),
    )
    arr = toks.select(
        "doc_id", F.array_distinct(word_shingles(F.col("__t"), n)).alias("sgs"))
    return arr.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sgs, s -> cast(conv(substring(md5(s), 1, 15), 16, 10)"
            " as bigint))")).alias("hg"),
    )


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Normalize→md5 content hash; canonical winner = min doc id per
    group (deterministic).  One shuffle on the hash (high-cardinality,
    uniform — the ideal partitioning key at 100 TB)."""
    h = F.md5(normalized_text(F.col(text_col))).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (
        docs.select(F.col(id_col).alias("doc_id"), h)
        .withColumn("canonical_doc_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w).cast("bigint"))
        .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_doc_id"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs

MAX_SHINGLE_DF = 1000


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.3,
                        max_df: int | None = MAX_SHINGLE_DF) -> DataFrame:
    """All pairs with word-n-gram set Jaccard ≥ threshold.

    inter(i,j) via a self-join on the shingle key; |A∪B| = |A|+|B|−inter.

    Hot-key guard: shingles occurring in more than ``max_df`` documents
    (stop-phrase-like, carrying no dedup signal) are dropped BEFORE the
    self-join — a shingle shared by d docs contributes d² join rows, so
    one ubiquitous shingle at 100 TB would melt a reducer.  Capping
    bounds per-shingle fan-out at max_df²; union sizes |A|,|B| stay
    uncapped, so capped-pair Jaccard is a (slight) underestimate over
    ubiquitous phrases only.  The DuckDB oracles mirror the identical
    cap.  At 100 TB run this only on LSH candidates — see module
    docstring.

    The (doc_id, hg) frame is materialized ONCE via localCheckpoint:
    it feeds the size aggregate, the df-cap aggregate, and both sides
    of the self-join — without the materialization barrier each
    consumer re-runs the tokenize+shingle expression tree (~5 full
    text passes; tokenization dominates).  localCheckpoint (not
    persist) so nothing stays pinned in executor memory for the rest
    of a long-lived session — the block-manager copy is released with
    the frame, the same lifecycle exact_substring_dedup uses.  The
    per-doc distinct-shingle count is read from the same frame instead
    of a second tokenize of the corpus."""
    sh = doc_shingles(docs, n).localCheckpoint()
    # |A| per doc = rows per doc in the DISTINCT-shingle frame
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sg"))
    if max_df is not None:
        hot = (sh.groupBy("hg").agg(F.count("*").alias("__df"))
               .where(F.col("__df") > max_df).select("hg"))
        sh = sh.join(hot, "hg", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.hg") == F.col("b.hg"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.round(
        F.col("n_inter").cast("double")
        / (F.col("sa.n_sg") + F.col("sb.n_sg") - F.col("n_inter")).cast("double"),
        6,
    ).alias("jaccard")
    return (
        inter.join(sa, F.col("doc_i") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_j") == F.col("sb.doc_id"))
        .select("doc_i", "doc_j", jac)
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# exact similarity join via prefix filtering (AllPairs / PPJoin family)

# τ = PF_TAU_NUM / PF_TAU_DEN, kept as an integer RATIO so every
# threshold comparison (prefix length, length filter, final Jaccard
# test) is exact integer arithmetic on BOTH engines — ceil(0.8·n) in
# doubles rounds the wrong way on knife-edge sizes (0.8·5 →
# 4.000000000000000222 → ceil 5) and would silently shrink prefixes.
PF_TAU_NUM, PF_TAU_DEN = 4, 5


def prefix_filter_pairs(docs: DataFrame, n: int = 3) -> DataFrame:
    """All pairs with word-n-gram set Jaccard ≥ τ (= 4/5) — EXACT,
    via PREFIX FILTERING (the AllPairs/PPJoin family: Bayardo et al.
    WWW'07, Xiao et al. WWW'08) instead of the full shingle
    self-join: order every doc's shingles by a GLOBAL rarest-first
    total order (document frequency, shingle-hash tiebreak); any
    pair with J ≥ τ has intersection ≥ ⌈τ·|A|⌉, and by pigeonhole
    its globally-rarest common shingle falls inside BOTH docs' first
    |d| − ⌈τ·|d|⌉ + 1 shingles — so joining ONLY prefix rows has no
    false negatives.  At τ = 0.8 the prefix is ≈20% of each doc's
    rarest shingles, so the self-join shuffles a fifth of the rows
    of the brute path into buckets keyed by RARE shingles (tiny
    fan-out by construction — the frequent shingles that melt
    reducers in the brute join sort to the suffix and never enter).
    Candidates then verify with exact Jaccard on candidate rows only
    (array_intersect — no per-shingle shuffle), the same
    candidates-then-verify shape as lsh_jaccard_verified but with a
    PROOF of recall 1.0 instead of a probabilistic bound.  The
    length filter (τ·|A| ≤ |B| ≤ |A|/τ, integer form) prunes
    size-incompatible pairs at candidate time.

    Compare: ngram_jaccard_pairs = brute all-pairs (the quadratic
    verifier), dedup_minhash_lsh = probabilistic candidates.  This
    is the exact-at-scale third lane: recall-1.0 joins at high τ.
    Reference parity target: the same dedup slice the staging lane
    dedupes exactly (sql/batchELT/core/12_trip_clean.dedupe_load
    .sql:1) — re-expressed for near-dup text at corpus scale."""
    sh = doc_shingles(docs, n).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sg"))
    dfreq = sh.groupBy("hg").agg(
        F.count("*").cast("bigint").alias("__df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__df").asc(), F.col("hg").asc())
    prefix_len = (
        F.col("n_sg")
        - F.expr(f"({PF_TAU_NUM} * n_sg + {PF_TAU_DEN - 1}) "
                 f"div {PF_TAU_DEN}")
        + F.lit(1))
    ranked = (
        sh.join(dfreq, "hg")
        .withColumn("__pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(F.col("__pos") <= prefix_len)
        .select("doc_id", "hg", "n_sg"))
    a = ranked.select(F.col("doc_id").alias("doc_i"),
                      F.col("hg").alias("__hg"),
                      F.col("n_sg").alias("__na"))
    b = ranked.select(F.col("doc_id").alias("doc_j"),
                      F.col("hg").alias("__hg"),
                      F.col("n_sg").alias("__nb"))
    cand = (
        a.join(b, "__hg")
        .where((F.col("doc_i") < F.col("doc_j"))
               & (PF_TAU_NUM * F.col("__na")
                  <= PF_TAU_DEN * F.col("__nb"))
               & (PF_TAU_NUM * F.col("__nb")
                  <= PF_TAU_DEN * F.col("__na")))
        .select("doc_i", "doc_j").distinct())
    # verify on HG-HASH arrays folded from the SAME checkpointed
    # frame the candidates came from: no second tokenize pass of the
    # corpus (tokenization dominates — see ngram_jaccard_pairs), and
    # intersections count the identical 60-bit keys the oracle
    # counts, so a hash collision lands on BOTH sides instead of
    # diverging the compare (doc_shingles' stated contract)
    sgs = sh.groupBy("doc_id").agg(F.collect_list("hg").alias("sgs"))
    av = sgs.select(F.col("doc_id").alias("doc_i"),
                    F.col("sgs").alias("__sa"))
    bv = sgs.select(F.col("doc_id").alias("doc_j"),
                    F.col("sgs").alias("__sb"))
    inter = F.size(F.array_intersect(
        F.col("__sa"), F.col("__sb"))).cast("bigint")
    uni = (F.size("__sa") + F.size("__sb")).cast("bigint") - inter
    return (
        cand.join(av, "doc_i").join(bv, "doc_j")
        .withColumn("__i", inter).withColumn("__u", uni)
        .where(PF_TAU_DEN * F.col("__i") >= PF_TAU_NUM * F.col("__u"))
        .select(
            "doc_i", "doc_j",
            F.round(F.col("__i").cast("double")
                    / F.col("__u").cast("double"), 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# MinHash + banded LSH

N_PERMS = 12
N_BANDS = 4
ROWS_PER_BAND = N_PERMS // N_BANDS

# 'permutation' i = linear mix (a·h32 + b) mod 2³² of ONE shared 32-bit
# md5 prefix per shingle — 1 md5 per shingle instead of N_PERMS md5s
# (measured ~2x on the LSH family at sf0.1).  a is odd < 2³⁰ and h < 2³²
# so a·h + b < 2⁶² never overflows 64-bit (Spark ANSI mode and DuckDB
# both raise on bigint overflow).  Constants are Knuth/xxhash-style
# multiplicative-mix primes; both engines evaluate the same literals.
MIX_CONSTS: list[tuple[int, int]] = [
    (
        ((2654435761 * (i + 1)) & ((1 << 30) - 1)) | 1,
        (2246822519 * (i + 1) + 3266489917) & ((1 << 32) - 1),
    )
    for i in range(N_PERMS)
]
_H32_EXPR = "transform(sgs, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"


def shingle_arrays(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, sgs) with sgs = DISTINCT word-n-gram array, materialized
    in its own projection (HOF CSE — see doc_shingles)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.col(text_col)).alias("__t"),
    )
    return toks.select(
        "doc_id", F.array_distinct(word_shingles(F.col("__t"), n)).alias("sgs"))


def minhash_signatures(docs: DataFrame, n: int = 3,
                       n_perms: int = N_PERMS) -> DataFrame:
    """One row per doc with mh0..mh{P-1} MinHash components (bigint).

    'Permutation' i = ordering induced by (aᵢ·h32(shingle) + bᵢ) mod 2³²
    over a single shared 32-bit md5 prefix (MIX_CONSTS) — exactly
    reproducible in any engine with md5 + 64-bit integer arithmetic.
    Computed NARROWLY as array_min over the per-doc hash array — no
    explode, no shuffle; the only shuffle in the whole LSH pipeline is
    the tiny (band, signature) candidate join.  The h32 array gets its
    own projection (HOF CSE — see doc_shingles): inlined, the md5
    transform would re-run once per permutation."""
    sh = shingle_arrays(docs, n)
    hashed = sh.select("doc_id", F.expr(_H32_EXPR).alias("__h"))

    def _perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(1 << 32)

    cols = [
        F.array_min(F.transform(F.col("__h"), _perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(MIX_CONSTS[:n_perms])
    ]
    return hashed.select("doc_id", *cols)


def minhash_lsh_candidates(docs: DataFrame, n: int = 3) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ≥1 of the 4 bands
    (3 rows each).  Only (band_id, band_sig) flows through the shuffle.

    The signature table is persisted (NOT localCheckpoint: the returned
    plan is lazy, so an eager checkpoint would pay an extra
    materialization job per call — measured +0.3-0.7 s/query at sf0.1;
    the ~2 KB/doc cache is LRU-evictable): it feeds BOTH sides of the band
    self-join, and without the materialization barrier the optimizer
    pushes the join's isnotnull filters below the signature projection,
    inlining (= recomputing) the whole narrow MinHash expression per
    filter reference.  ~2 KB/doc — at 100 TB corpus scale this is the
    classic write-signatures-then-join step."""
    sig = minhash_signatures(docs, n).persist()
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                                     for r in range(ROWS_PER_BAND)])).alias("band_sig"),
        )
        for b in range(N_BANDS)
    ])
    exploded = (
        sig.select("doc_id", F.explode(bands).alias("bd"))
        .select("doc_id", F.col("bd.band_id").alias("band_id"),
                F.col("bd.band_sig").alias("band_sig"))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .agg(F.count("*").cast("bigint").alias("n_shared_bands"))
    )


def lsh_jaccard_verified(docs: DataFrame, n: int = 3,
                         threshold: float = 0.3) -> DataFrame:
    """The PRODUCTION near-dup composition: MinHash-LSH candidate
    generation followed by exact-Jaccard verification ON CANDIDATES
    ONLY — never the all-pairs join.

    Scale shape (this is the one you run at 100 TB):
      1. candidate pairs via banded LSH — shuffle carries only
         (band_id, band_sig);
      2. the candidate table (tiny: |C| ≪ |D|²) hash-joins the per-doc
         shingle-ARRAY table twice on doc_id;
      3. Jaccard is computed NARROWLY per candidate row with
         array_intersect — no shingle explode, no per-shingle shuffle.
    Compare ``ngram_jaccard_pairs``, the brute-force verifier whose
    per-shingle self-join is the quadratic path LSH exists to avoid.
    Output keeps recall metadata (n_shared_bands) next to the verified
    jaccard so downstream can audit the LSH filter.
    """
    cand = minhash_lsh_candidates(docs, n)
    sgs = shingle_arrays(docs, n).persist()
    a = sgs.select(F.col("doc_id").alias("doc_i"), F.col("sgs").alias("__sa"))
    b = sgs.select(F.col("doc_id").alias("doc_j"), F.col("sgs").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    uni = F.size("__sa") + F.size("__sb") - inter
    jac = F.round(inter.cast("double") / uni.cast("double"), 6)
    return (
        cand.join(a, "doc_i").join(b, "doc_j")
        .select("doc_i", "doc_j", "n_shared_bands", jac.alias("jaccard"))
        .withColumn("is_dup", F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash

# 4 bands x 16 bits: by pigeonhole any pair within hamming <= 3 MUST
# agree on at least one full band, so banded candidate generation is
# EXACT for the default threshold.  (Guaranteeing <= 8 would need 9
# blocks of ~7 bits — 128-value bucket keys whose buckets grow O(n²/128)
# pairs, which is not a scale-safe shuffle; callers who pass a larger
# max_hamming get recall < 1 above 3, as documented on simhash_pairs.)
SIMHASH_HAMMING_MAX = 3


def simhash_halves(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """64-bit SimHash as two 32-bit halves (h_hi, h_lo as longs).

    Token hash = md5 hex split into two 32-bit words; each bit
    contributes +1/−1 per token occurrence; the sign of each bit-sum is
    the signature bit (Charikar 2002).

    Computed NARROWLY: the 64 bit-sums fold over the per-doc token
    array with a single aggregate/zip_with accumulator — no explode, no
    shuffle, and a small generated-code footprint (the previous
    64-separate-sum-aggregates formulation spent ~3 s per run in Janino
    compilation alone).  Docs with zero tokens are dropped (parity with
    the explode-based formulation)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.lower(F.col(text_col))).alias("__t"),
    ).where(F.size("__t") > 0)
    # md5 halves materialized once per token in their own projection,
    # then one fold: acc[64] += (+1|-1) per bit of each token hash
    hashed = toks.select(
        "doc_id",
        F.expr(
            "transform(__t, t -> named_struct("
            "'hi', cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint), "
            "'lo', cast(conv(substring(md5(t), 9, 8), 16, 10) as bigint)))"
        ).alias("__h"),
    )
    sums = hashed.select(
        "doc_id",
        F.expr(
            "aggregate(__h, array_repeat(0, 64), (acc, x) -> zip_with(acc, concat("
            "transform(sequence(0, 31), b -> IF((shiftright(x.hi, b) & 1) = 1, 1, -1)), "
            "transform(sequence(0, 31), b -> IF((shiftright(x.lo, b) & 1) = 1, 1, -1))"
            "), (a, c) -> a + c))"
        ).alias("__s"),
    )
    return sums.select(
        "doc_id",
        F.expr("aggregate(sequence(0, 31), 0L, "
               "(a, b) -> a + IF(__s[b] > 0, shiftleft(1L, b), 0L))").alias("h_hi"),
        F.expr("aggregate(sequence(0, 31), 0L, "
               "(a, b) -> a + IF(__s[b + 32] > 0, shiftleft(1L, b), 0L))").alias("h_lo"),
    )


def simhash_pairs(docs: DataFrame,
                  max_hamming: int = SIMHASH_HAMMING_MAX) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidates join on equality of one of four 16-bit bands; any pair
    within hamming ≤ 3 must share a band (pigeonhole), so for the
    default ``max_hamming = SIMHASH_HAMMING_MAX = 3`` the result is
    EXACT.  A larger ``max_hamming`` is honored but has recall < 1:
    pairs at distance 4+ are emitted only when they happen to share a
    band.  The shuffle carries (band_id, 16-bit value) keys.

    The 16-bytes/doc signature table is persisted: it feeds both sides
    of the band self-join, and without the barrier the optimizer pushes
    the join's isnotnull filters below the signature projection and
    inlines the full 64-bit fold into each filter condition (measured
    ~6x recompute of the md5 transform).  persist, not an eager
    localCheckpoint: the checkpoint pays a separate materialization job
    per call (measured 3.1 s vs 0.6 s best-of-2 at sf0.1) and the
    cached copy is ~16 B/doc, LRU-evictable."""
    sig = simhash_halves(docs).persist()
    bands = F.array(
        F.struct(F.lit(0).alias("band_id"),
                 F.shiftright(F.col("h_hi"), 16).bitwiseAND(F.lit(0xFFFF)).alias("val")),
        F.struct(F.lit(1).alias("band_id"),
                 F.col("h_hi").bitwiseAND(F.lit(0xFFFF)).alias("val")),
        F.struct(F.lit(2).alias("band_id"),
                 F.shiftright(F.col("h_lo"), 16).bitwiseAND(F.lit(0xFFFF)).alias("val")),
        F.struct(F.lit(3).alias("band_id"),
                 F.col("h_lo").bitwiseAND(F.lit(0xFFFF)).alias("val")),
    )
    ex = (
        sig.select("doc_id", "h_hi", "h_lo", F.explode(bands).alias("bd"))
        .select("doc_id", "h_hi", "h_lo",
                F.col("bd.band_id").alias("band_id"), F.col("bd.val").alias("val"))
    )
    a, b = ex.alias("a"), ex.alias("b")
    ham = (
        F.bit_count(F.col("a.h_hi").bitwiseXOR(F.col("b.h_hi")))
        + F.bit_count(F.col("a.h_lo").bitwiseXOR(F.col("b.h_lo")))
    )
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"),
                ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# language ID / quality / tokens / fingerprint

STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "es": ("el", "la", "de", "y", "es", "no", "un", "con"),
    "fr": ("le", "la", "les", "et", "est", "ne", "un", "avec"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}
LANGS = tuple(sorted(STOPWORDS))


def _in_list(t: Column, words: tuple[str, ...]) -> Column:
    return t.isin(*words)


def lang_scores(tokens_col: Column) -> dict[str, Column]:
    """Stopword-hit count per language. ``tokens_col`` must be a
    MATERIALIZED lowercase-token array column (project it first — the
    five per-language filters would otherwise each re-tokenize)."""
    return {
        lang: F.size(F.filter(tokens_col, lambda t: _in_list(t, words))).cast("int")
        for lang, words in STOPWORDS.items()
    }


def lang_pick_sql(score_cols: dict[str, str]) -> str:
    """Shared ANSI CASE that argmaxes scores with alphabetical-lang
    tie-break — the SAME sql text runs under Spark (F.expr) and DuckDB,
    so the decision is definitionally identical in both engines."""
    langs = list(LANGS)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        rest = [score_cols[l] for l in langs[i + 1:]]
        rest_expr = rest[0] if len(rest) == 1 else f"greatest({', '.join(rest)})"
        clauses.append(f"WHEN {score_cols[lang]} >= {rest_expr} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"
