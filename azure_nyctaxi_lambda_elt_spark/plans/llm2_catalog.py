"""LLM-pipeline extension set 2: exact-substring (cross-document
token-gram span) dedup and temperature-weighted source mixture
sampling.

Reference parity: extends the same dedup/quality family as
plans/llm_catalog.py — the reference's dedupe stage
(`sql/batchELT/core/12_trip_clean.dedupe_load.sql`, reference @
/root/reference) generalized to corpus curation (exact-substring dedup
a la Lee et al. 2021 "Deduplicating Training Data Makes Language
Models Better"; mixture reweighting a la GPT-3/The Pile source
sampling).

Oracle conventions: identical md5-derived keys on both sides; doubles
only in final formulas with identical parenthesization; round(…, 6)
BEFORE any branch that gates on a double, so both engines branch on
the same value.

Scale notes (100 TB):
- exact_substring_dedup shuffles (gram-hash, doc_id) pairs — two
  narrow columns — never text.  The duplicated-gram set is the output
  of a HAVING over the same shuffle; the per-doc counts re-join on the
  hash.  The gram frame is persisted across its two consumers (the
  reference materializes core.trip_clean for the same reason).
- mixture_weights reduces the corpus to |sources| rows in one
  map-side-combined agg; the per-source keep-rate broadcasts back and
  the keep decision is a map-only md5-threshold test (deterministic,
  reproducible cuts — same property as stratified_sample /
  dataset_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_engine_conf, pin
from ..sources.tables import load_table

GRAM_TOKENS = 8
MIX_TAU = 0.5
MIX_BUDGET = 2000


# ---------------------------------------------------------------------------
# exact-substring dedup — duplicated 8-token spans across documents


def _doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, g=md5 of each consecutive 8-token window) — tokenize
    once, windows via one narrow transform+explode (no per-window
    re-split)."""
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("__t"))
    win = F.transform(
        F.sequence(F.lit(0), F.size("__t") - GRAM_TOKENS),
        lambda i: F.md5(
            F.array_join(F.slice(F.col("__t"), i + 1, GRAM_TOKENS), " ")))
    return (toks
            .where(F.size("__t") >= GRAM_TOKENS)
            .select("doc_id", F.explode(win).alias("g")))


def q_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how much of it is made of 8-token spans that also
    occur in ANOTHER document (exact-substring dedup signal, Lee et
    al. 2021).  Docs shorter than 8 tokens report zero grams.

    dup gram := appears in ≥ 2 distinct docs; dup_frac = dup windows /
    total windows, rounded."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    grams = _doc_grams(docs).persist()
    dupg = (grams.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("__dc"))
            .where(F.col("__dc") >= 2)
            .select("g"))
    n_grams = grams.groupBy("doc_id").agg(
        F.count("*").alias("__n_grams"))
    n_dup = (grams.join(dupg, "g")
             .groupBy("doc_id").agg(F.count("*").alias("__n_dup")))
    # materialize the two doc-sized aggregates eagerly, then release the
    # gram cache (the largest intermediate) so it doesn't stay pinned in
    # executor memory for the rest of a long-lived session
    n_grams = n_grams.transform(pin)
    n_dup = n_dup.transform(pin)
    grams.unpersist()
    return (
        docs.select("doc_id")
        .join(n_grams, "doc_id", "left")
        .join(n_dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__n_grams", F.lit(0)).cast("bigint")
            .alias("n_grams"),
            F.coalesce("__n_dup", F.lit(0)).cast("bigint")
            .alias("n_dup_grams"),
            F.when(
                F.coalesce("__n_grams", F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col("__n_dup"), F.lit(0)).cast("double")
                    / F.col("__n_grams").cast("double"), 6))
            .otherwise(0.0).alias("dup_frac")))


# ---------------------------------------------------------------------------
# mixture weights — temperature-reweighted source sampling


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture plan + deterministic sample execution:
    temperature-flattened share w_i = (n_i/N)^τ (τ=0.5 upsamples small
    sources), target docs under a fixed budget, and the md5-threshold
    keep count that realizes it (reproducible cut, no RNG).

    The keep rate is rounded to 6 dp before the hex-threshold
    derivation so both engines gate on the same double (see module
    docstring)."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("__N"))
    w = F.pow(F.col("n_docs").cast("double") / F.col("__N"),
              F.lit(MIX_TAU))
    weighted = counts.join(F.broadcast(tot)).withColumn("__w", w)
    sumw = weighted.agg(F.sum("__w").alias("__sumw"))
    plan = (
        weighted.join(F.broadcast(sumw))
        .withColumn("raw_share",
                    F.round(F.col("n_docs").cast("double") / F.col("__N"), 6))
        .withColumn("mix_frac", F.round(F.col("__w") / F.col("__sumw"), 6))
        .withColumn("target_docs",
                    F.floor(F.lit(float(MIX_BUDGET)) * F.col("mix_frac"))
                    .cast("bigint"))
        .withColumn(
            "__rate",
            F.round(
                F.least(F.lit(1.0),
                        F.col("target_docs").cast("double")
                        / F.col("n_docs").cast("double")), 6))
        .withColumn(
            "__thresh",
            F.lpad(F.lower(F.hex(
                F.floor(F.col("__rate") * 65536.0).cast("bigint"))),
                4, "0")))
    keyed = docs.select(
        "source",
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(":mix"))), 1, 4).alias("__u"))
    kept = (
        keyed.join(F.broadcast(plan.select("source", "__rate", "__thresh")),
                   "source")
        .where((F.col("__rate") >= 1.0) | (F.col("__u") < F.col("__thresh")))
        .groupBy("source").agg(F.count("*").cast("bigint")
                               .alias("kept_docs")))
    return (
        plan.join(kept, "source", "left")
        .select("source", "n_docs", "raw_share", "mix_frac", "target_docs",
                F.coalesce("kept_docs", F.lit(0)).cast("bigint")
                .alias("kept_docs")))


# ---------------------------------------------------------------------------
# oracles

LLM2_ORACLES: dict[str, str] = {
    "exact_substring_dedup": f"""
        WITH toks AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
                 md5(array_to_string(t[i:i + {GRAM_TOKENS - 1}], ' ')) AS g
          FROM toks, UNNEST(generate_series(1, len(t) - {GRAM_TOKENS - 1}))
               u(i)
          WHERE len(t) >= {GRAM_TOKENS}),
        dupg AS (
          SELECT g FROM grams GROUP BY g
          HAVING COUNT(DISTINCT doc_id) >= 2),
        cnt AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
        dup AS (
          SELECT doc_id, COUNT(*) AS n_dup
          FROM grams WHERE g IN (SELECT g FROM dupg) GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(c.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
               CASE WHEN coalesce(c.n_grams, 0) > 0
                    THEN round(CAST(coalesce(p.n_dup, 0) AS DOUBLE)
                               / CAST(c.n_grams AS DOUBLE), 6)
                    ELSE 0.0 END AS dup_frac
        FROM documents d
        LEFT JOIN cnt c USING (doc_id)
        LEFT JOIN dup p USING (doc_id)
    """,
    "mixture_weights": f"""
        WITH counts AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS N FROM counts),
        weighted AS (
          SELECT c.source, c.n_docs, t.N,
                 power(CAST(c.n_docs AS DOUBLE) / t.N, {MIX_TAU}) AS w
          FROM counts c, tot t),
        sw AS (SELECT SUM(w) AS sumw FROM weighted),
        plan AS (
          SELECT source, n_docs,
                 round(CAST(n_docs AS DOUBLE) / N, 6) AS raw_share,
                 round(w / s.sumw, 6) AS mix_frac,
                 CAST(floor({float(MIX_BUDGET)} * round(w / s.sumw, 6))
                      AS BIGINT) AS target_docs
          FROM weighted, sw s),
        rated AS (
          SELECT *,
                 round(least(1.0, CAST(target_docs AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE)), 6) AS rate
          FROM plan),
        threshed AS (
          SELECT *,
                 lpad(lower(to_hex(CAST(floor(rate * 65536.0) AS BIGINT))),
                      4, '0') AS thresh
          FROM rated),
        kept AS (
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS kept_docs
          FROM documents d JOIN threshed t ON d.source = t.source
          WHERE t.rate >= 1.0
             OR substring(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 4)
                < t.thresh
          GROUP BY 1)
        SELECT t.source, t.n_docs, t.raw_share, t.mix_frac, t.target_docs,
               CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs
        FROM threshed t LEFT JOIN kept k USING (source)
    """,
}

LLM2_QUERIES = {
    "exact_substring_dedup": q_exact_substring_dedup,
    "mixture_weights": q_mixture_weights,
}
