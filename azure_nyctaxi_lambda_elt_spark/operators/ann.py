"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
- ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus; every arithmetic step is a built-in higher-order
  function (zip_with / aggregate) evaluated JVM-side in double
  precision, element-cast first so the DuckDB oracle reproduces the
  exact float path.
- ``lsh_bucket_topk`` — the 100 TB path: random-hyperplane signatures
  bucket the corpus; a query only scans its own (multi-probed) buckets,
  so the per-query cost is |bucket| · n_probes instead of |corpus|.
  Hyperplanes are md5-derived (deterministic, no RNG state to ship).

Scale notes: the corpus side is never shuffled for brute force (the
query side broadcasts); for LSH the corpus shuffles ONCE on the bucket
key and can be written bucketed-by-signature so repeated query batches
join shuffle-free.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import pin

DIM = 64
N_PLANES = 6

# brute-force guards: the exact paths are verify/oracle twins; refusing
# oversized inputs (instead of melting an executor) makes the catalog
# entries themselves scale-safe.  Each guard's count() runs over a
# localCheckpoint()ed prep frame, so the projection is materialized
# exactly once (count + downstream joins share it) and nothing stays
# pinned in executor memory after the consumer drops the frame.
MAX_BRUTE_QUERIES = 10_000    # cosine_topk broadcasts the query set
MAX_BRUTE_CORPUS = 100_000    # cosine_pairs is corpus² work


def _guard_brute(n: int, cap: int, what: str, alt: str) -> None:
    if n > cap:
        raise ValueError(
            f"{what}: {n} rows exceeds the brute-force cap {cap}; "
            f"use the scale path ({alt}) instead")


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def vec_dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (oracle-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vec_ssq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _prep(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        as_double_vec(vec_col).alias("e"),
    ).withColumn("ssq", vec_ssq(F.col("e")))


def cosine_topk(embeddings: DataFrame, query_pred: Column, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for every row matching query_pred.

    Rank orders by the ROUNDED similarity (6 dp) with vec_id tie-break
    so the ordering is engine-independent.
    """
    from pyspark.sql import Window

    corpus = _prep(embeddings, id_col, vec_col).transform(pin)
    queries = corpus.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"),
        F.col("ssq").alias("qssq"),
    )
    _guard_brute(queries.count(), MAX_BRUTE_QUERIES,
                 "cosine_topk query set", "lsh_bucket_topk / ivf_topk")
    cos = F.round(
        vec_dot(F.col("qe"), F.col("e"))
        / (F.sqrt(F.col("qssq")) * F.sqrt(F.col("ssq"))),
        6,
    )
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )


def cosine_pairs(embeddings: DataFrame, tau: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: all (i < j) with rounded cosine
    ≥ tau — exact brute force.

    At 100 TB this is the VERIFY stage over LSH candidates
    (``lsh_bucket_topk``'s signature-equality join generates them);
    all-pairs is only run directly at oracle scale — the guard REFUSES
    larger inputs rather than planning a corpus² nested-loop join."""
    corpus = _prep(embeddings, id_col, vec_col).transform(pin)
    _guard_brute(corpus.count(), MAX_BRUTE_CORPUS,
                 "cosine_pairs corpus", "semantic_dedup / lsh_bucket_topk")
    a = corpus.select(F.col("vec_id").alias("id_i"), F.col("e").alias("ea"),
                      F.col("ssq").alias("sa"))
    b = corpus.select(F.col("vec_id").alias("id_j"), F.col("e").alias("eb"),
                      F.col("ssq").alias("sb"))
    cos = F.round(
        vec_dot(F.col("ea"), F.col("eb"))
        / (F.sqrt(F.col("sa")) * F.sqrt(F.col("sb"))),
        6,
    )
    return (
        a.join(b, F.col("id_i") < F.col("id_j"))
        .select("id_i", "id_j", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= tau)
    )


def ivf_topk(embeddings: DataFrame, query_pred: Column, k: int = 5,
             n_centroids: int = 16, n_probes: int = 3,
             train_iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_label_col: str | None = None,
             cache_key: str | None = None) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells,
    probe only the query's ``n_probes`` nearest cells.

    The codebook is a REAL k-means fit (operators/clustering.py
    fit_centroids — deterministic init, ``train_iters`` Lloyd rounds),
    trained offline-style then broadcast as a tiny centroid frame; at
    100 TB the fit runs on a corpus sample and the resulting codebook
    is a stored artifact.  ``cache_key`` (an immutable corpus
    identity, e.g. the sf_dir) routes the fit through the session
    codebook cache so repeat invocations — bench reruns, the
    hard-negative miner sharing ann_ivf's corpus — train ONCE and
    reuse identical centroids.  The rest is the production IVF shape: one
    broadcast pass assigns cells, the query join touches ~n_probes/M of
    the corpus, and the cell id is the natural bucketing key for the
    stored index.

    Scale notes: the index build is one broadcast pass over the corpus
    (|corpus| x M dot products, no shuffle of the corpus); centroid
    training shuffles only (cluster, pos, partial-sum) rows per
    round."""
    from pyspark.sql import Window

    from .clustering import fit_centroids

    corpus = _prep(embeddings, id_col, vec_col)
    if exclude_label_col:
        # hard-negative mode: carry the label so candidates can be
        # restricted to label mismatches (contrastive mining)
        corpus = corpus.join(
            embeddings.select(F.col(id_col).alias("vec_id"),
                              F.col(exclude_label_col).alias("label")),
            "vec_id")
    codebook = fit_centroids(
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding")),
        n_centroids, train_iters,
        cache_key=None if cache_key is None
        else f"{cache_key}/ivf-{id_col}-{vec_col}")
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(codebook)],
        "c_id int, ce array<double>",
    ).withColumn("cssq", vec_ssq(F.col("ce")))
    cent_cos = F.round(
        vec_dot(F.col("e"), F.col("ce"))
        / (F.sqrt(F.col("ssq")) * F.sqrt(F.col("cssq"))),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("__ccos").desc(), F.col("c_id").asc())
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", cent_cos)
        .withColumn("__r", F.row_number().over(w_assign))
        .where(F.col("__r") == 1)
        .select("vec_id", "e", "ssq", F.col("c_id").alias("cell"),
                *(["label"] if exclude_label_col else []))
    )
    queries = assigned.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"),
        F.col("ssq").alias("qssq"),
        *([F.col("label").alias("q_label")] if exclude_label_col else []),
    )
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", F.round(
            vec_dot(F.col("qe"), F.col("ce"))
            / (F.sqrt(F.col("qssq")) * F.sqrt(F.col("cssq"))), 6))
        .withColumn("__r", F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.col("__ccos").desc(), F.col("c_id").asc())))
        .where(F.col("__r") <= n_probes)
        .select("q_id", "qe", "qssq", F.col("c_id").alias("cell"),
                *(["q_label"] if exclude_label_col else []))
    )
    cos = F.round(
        vec_dot(F.col("qe"), F.col("e"))
        / (F.sqrt(F.col("qssq")) * F.sqrt(F.col("ssq"))),
        6,
    )
    joined = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id")))
    if exclude_label_col:
        pairs = (
            joined.where(F.col("label") != F.col("q_label"))
            .select("q_id", "q_label",
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("neg_label"),
                    cos.alias("cos_sim")))
    else:
        pairs = joined.select(
            "q_id", F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim from md5 —
    reproducible across drivers/executors with no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / 0xFFFFFFFF * 2.0 - 1.0)
        planes.append(row)
    return planes


def _bucket_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Signature = integer whose bit p is sign(dot(vec, plane_p)).

    The dot is ROUNDED to 6 dp before the sign test so the bucket
    assignment is engine-independent (the DuckDB oracle replays the
    same planes; unrounded near-zero dots could flip under a different
    summation order)."""
    sig = F.lit(0)
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(w) for w in row])
        bit = F.when(F.round(vec_dot(vec, plane), 6) >= 0,
                     F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig + bit
    return sig.cast("int")


def lsh_bucket_topk(embeddings: DataFrame, query_pred: Column, k: int = 5,
                    n_planes: int = N_PLANES, multiprobe: bool = True,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: exact cosine only within the query's signature
    bucket (plus all hamming-1 probe buckets when multiprobe)."""
    from pyspark.sql import Window

    planes = hyperplanes(n_planes)
    corpus = _prep(embeddings, id_col, vec_col).withColumn(
        "bucket", _bucket_bits(F.col("e"), planes))
    queries = corpus.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"),
        F.col("ssq").alias("qssq"), F.col("bucket").alias("qb"),
    )
    if multiprobe:
        probes = F.array(F.col("qb"), *[
            F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ])
        queries = queries.withColumn("probe", F.explode(probes))
    else:
        queries = queries.withColumn("probe", F.col("qb"))
    cos = F.round(
        vec_dot(F.col("qe"), F.col("e"))
        / (F.sqrt(F.col("qssq")) * F.sqrt(F.col("ssq"))),
        6,
    )
    pairs = (
        corpus.join(F.broadcast(queries), F.col("bucket") == F.col("probe"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + product-quantized codes + exact refinement

PQ_M = 8        # subspaces (64-dim → 8 × 8-dim)
PQ_CODES = 16   # codewords per subspace (4-bit codes)
PQ_REFINE = 10  # refinement pool = PQ_REFINE × k approx candidates


def _argmin_code(sub: Column, book: list[list[float]]) -> Column:
    """Nearest-codeword (L2) over a literal codebook as one folded
    expression — same shape as clustering._dist2_expr, parameterized
    on the input column."""
    entries = []
    for cid, c in enumerate(book):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(sub, cvec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        entries.append(F.struct(d2.alias("dist2"), F.lit(cid).alias("cid")))
    return F.array_min(F.array(*entries))["cid"]


def ivfpq_topk(embeddings: DataFrame, query_pred: Column, k: int = 5,
               n_centroids: int = 16, n_probes: int = 3,
               m: int = PQ_M, n_codes: int = PQ_CODES,
               train_iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cache_key: str | None = None) -> DataFrame:
    """IVF-PQ ANN (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI'11): coarse IVF cells + per-subspace
    product-quantized codes + exact re-rank of the approx pool.

    Pipeline (all vectors unit-normalized, so cosine ≡ dot):
      1. coarse k-means codebook (deterministic init, fixed iters) →
         every vector assigned to a cell (broadcast literals, map-side)
      2. m per-subspace codebooks (k-means on the 8-dim slices); each
         vector stores m 4-bit codes — a 64-dim float vector compresses
         to 4 bytes, the compression that lets a 100 TB corpus' index
         live in memory
      3. query probes its n_probes nearest cells; candidates score by
         ADC (dot of the exact query against the candidate's
         RECONSTRUCTION, algebraically = the classic per-subspace
         lookup-table sum)
      4. the top PQ_REFINE×k approx pool re-ranks with exact dots →
         final top-k (refinement reads only pool×dim floats)

    Scale notes: codebooks train on a sample and broadcast as folded
    literals (no UDF, no join); encode is one narrow map over the
    corpus; the candidate join touches ~n_probes/n_centroids of the
    corpus; nothing ever shuffles the full vector table.  Evidence:
    full literal-replay oracle (llm_catalog._ann_ivfpq_oracle unrolls
    all 9 nested Lloyd fits into SQL) + the recall/compression
    pytest."""
    from .clustering import fit_centroids

    corpus = _prep(embeddings, id_col, vec_col)
    # localCheckpoint, not persist: the copy is released with the frame
    # (a persist here outlived every consumer — the 9 nested
    # fit_centroids calls all re-derive from this frame, so a leaked
    # cache entry pinned executor memory for the whole session)
    unit = corpus.select(
        "vec_id",
        F.transform("e", lambda x: x / F.sqrt(F.col("ssq"))).alias("__e"),
    ).transform(pin)
    dim = DIM
    sub_d = dim // m

    # the 9 fits (coarse + m subspaces) are the dominant cost of the
    # whole index build — with cache_key they train once per session
    # (codebooks are stored artifacts at scale, retrained on corpus
    # refresh, not per query)
    ck = (lambda s: None if cache_key is None
          else f"{cache_key}/pq-{id_col}-{vec_col}-{s}")
    coarse = fit_centroids(
        unit.select("vec_id", F.col("__e").alias("embedding")),
        n_centroids, train_iters, cache_key=ck("coarse"))
    subbooks = [
        fit_centroids(
            unit.select("vec_id",
                        F.slice("__e", j * sub_d + 1, sub_d).alias("embedding")),
            n_codes, train_iters, cache_key=ck(f"sub{j}-of-{m}"))
        for j in range(m)
    ]

    cell = _argmin_code(F.col("__e"), coarse)
    recon_parts = []
    code_cols = []
    for j, book in enumerate(subbooks):
        code = _argmin_code(F.slice("__e", j * sub_d + 1, sub_d), book)
        code_cols.append(code.cast("int"))
        booklit = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in book])
        recon_parts.append(F.element_at(booklit, code + 1))
    encoded = unit.select(
        "vec_id", "__e",
        cell.cast("int").alias("cell"),
        F.array(*code_cols).alias("codes"),
        F.flatten(F.array(*recon_parts)).alias("__recon"),
    )

    queries = encoded.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("__e").alias("qe"))
    cent_structs = []
    for cid, c in enumerate(coarse):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(F.col("qe"), cvec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        cent_structs.append(
            F.struct(d2.alias("dist2"), F.lit(cid).alias("cid")))
    probes = queries.select(
        "q_id", "qe",
        F.explode(F.slice(
            F.array_sort(F.array(*cent_structs)), 1, n_probes))
        .alias("__p"),
    ).select("q_id", "qe", F.col("__p.cid").alias("cell"))

    approx = F.round(vec_dot(F.col("qe"), F.col("__recon")), 6)
    pool = (
        encoded.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qe", F.col("vec_id").alias("neighbor_id"),
                F.col("__e").alias("ne"), approx.alias("approx_sim"))
        .withColumn("__pr", F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.col("approx_sim").desc(), F.col("neighbor_id").asc())))
        .where(F.col("__pr") <= PQ_REFINE * k)
    )
    exact = F.round(vec_dot(F.col("qe"), F.col("ne")), 6)
    return (
        pool.withColumn("cos_sim", exact)
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.col("cos_sim").desc(), F.col("neighbor_id").asc()))
            .cast("int"))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "approx_sim", "rnk")
    )


def int8_quantize_stats(embeddings: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        group_col: str = "label") -> DataFrame:
    """Symmetric per-vector int8 quantization + reconstruction-error
    audit — the storage-shrink step before shipping an embedding
    corpus to an ANN index (FAISS SQ8 / scalar-quantizer shape): each
    vector gets scale s = max|x|/127, codes q_i = clamp(round(x_i/s)),
    and the audit reports per-group mean scale, mean |x - q*s|
    reconstruction error, and the worst vector's error.

    Map-only (one narrow pass, array HOFs inside codegen, no shuffle
    until the tiny per-group rollup) — at 100 TB the quantization
    itself would write q as binary; the stats here are the QUALITY
    GATE that decides whether int8 is acceptable for the corpus.
    Error/scale quantize to DECIMAL(18,6) before summing so the
    per-group averages are order-independent and oracle-exact."""
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    absmax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    s = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(0.0))
    base = embeddings.select(
        F.col(group_col), F.col(id_col), e.alias("e"), s.alias("s"))

    def recon_err(x: Column) -> Column:
        q = F.least(F.lit(127.0), F.greatest(
            F.lit(-127.0), F.round(x / F.col("s"))))
        return F.abs(x - q * F.col("s"))

    err = F.when(
        F.col("s") > 0,
        F.aggregate(F.col("e"), F.lit(0.0),
                    lambda acc, x: acc + recon_err(x))
        / F.size("e")).otherwise(F.lit(0.0))
    perv = base.select(
        group_col,
        err.cast("decimal(18,6)").alias("err"),
        F.col("s").cast("decimal(18,6)").alias("sc"))
    return (
        perv.groupBy(group_col)
        .agg(F.count("*").cast("bigint").alias("n_vecs"),
             # 6-dp averages in exact integer micro-units (the sums
             # are DECIMAL(18,6), values non-negative) — engine
             # round(double, 6) diverges on knife-edge quotients
             F.expr("CAST((2 * CAST(SUM(sc) * 1000000 AS BIGINT)"
                    " + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
                    " / 1000000.0").alias("avg_scale"),
             F.expr("CAST((2 * CAST(SUM(err) * 1000000 AS BIGINT)"
                    " + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
                    " / 1000000.0").alias("avg_err"),
             F.max("err").cast("double").alias("max_err"))
    )


def hard_negative_mine(embeddings: DataFrame, query_pred: Column,
                       k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Hard-negative mining — the contrastive-pair construction step
    of an embedding-training pipeline: for each query vector, the
    top-k most-cosine-similar corpus vectors with a DIFFERENT label
    (the negatives nearest the decision boundary, which drive most of
    the training signal).

    Exact brute-force with the usual guard; ranking orders by the
    ROUNDED similarity (6 dp) + neighbor_id tiebreak so the output is
    engine-independent.  At 100 TB the candidate set comes from the
    IVF cell join (``ivf_topk``'s broadcast-codebook path) with the
    label-mismatch predicate pushed into the candidates — identical
    composition to dedup_embedding_cosine's LSH-then-verify split."""
    from pyspark.sql import Window

    corpus = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            as_double_vec(vec_col).alias("e"),
            F.col(label_col).alias("label"))
        .withColumn("ssq", vec_ssq(F.col("e")))
        .transform(pin))
    queries = corpus.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"),
        F.col("ssq").alias("qssq"), F.col("label").alias("q_label"))
    _guard_brute(queries.count(), MAX_BRUTE_QUERIES,
                 "hard_negative_mine query set",
                 "ivf_topk + label filter")
    cos = F.round(
        vec_dot(F.col("qe"), F.col("e"))
        / (F.sqrt(F.col("qssq")) * F.sqrt(F.col("ssq"))), 6)
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("label") != F.col("q_label"))
        .select("q_id", "q_label",
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("neg_label"),
                cos.alias("cos_sim")))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )


# ------------------------------------------------------ random projection

K_PROJ = 8


def rp_signs(k: int = K_PROJ, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 Rademacher matrix: sign(j, i) from md5 parity
    of "rp:j:i" — no RNG, so the projection is reproducible across
    sessions/engines and the oracle interpolates the SAME literals."""
    import hashlib

    return [[1 if int(hashlib.md5(f"rp:{j}:{i}".encode())
                      .hexdigest(), 16) % 2 == 0 else -1
             for i in range(dim)] for j in range(k)]


def random_projection(embeddings: DataFrame,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      group_col: str = "label",
                      k: int = K_PROJ) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a Rademacher
    (±1) matrix (Achlioptas, JCSS'03: database-friendly random
    projections) — the preprocessing that shrinks an embedding corpus
    before ANN indexing / clustering: x'_j = (1/√k) Σ_i s_{j,i} x_i
    preserves pairwise distances within ε w.h.p. while cutting the
    vector bytes DIM/k-fold.

    Scale: map-only — k dot products per row against a BROADCAST-free
    literal sign matrix folded into codegen (vec_dot's sequential
    fold, oracle-stable); no shuffle at any corpus size.  ±1
    multiplication is an exact sign flip in IEEE double, so both
    engines produce bit-identical projections."""
    import math

    signs = rp_signs(k)
    base = embeddings.select(
        F.col(id_col), F.col(group_col),
        as_double_vec(vec_col).alias("e"))
    scale = F.lit(math.sqrt(float(k)))
    cols = [F.col(id_col), F.col(group_col)]
    for j in range(k):
        sj = F.array(*[F.lit(float(s)) for s in signs[j]])
        cols.append(
            (vec_dot(F.col("e"), sj) / scale).alias(f"proj_{j}"))
    return base.select(*cols)
