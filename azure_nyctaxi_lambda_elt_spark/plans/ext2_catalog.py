"""Extension set I (round 2): time-series M4 downsampling, MinHash
Jaccard estimation accuracy, and deterministic weighted sampling.

Reference parity: extends the serving/corpus families —
- m4_downsample is the canonical lossless-for-pixels time-series
  reduction behind dashboard rendering over the reference's
  hourly/daily rollups (mdl/views + Quality_Audit chain, reference @
  /root/reference).
- dedup_minhash_estimate closes the loop on the MinHash family: the
  estimator (shared signature components / P) vs the exact Jaccard it
  approximates, per LSH candidate pair — the measurement a 100 TB
  dedup deployment uses to tune bands/rows.
- weighted_sample is Efraimidis–Spirakis A-ES weighted sampling made
  deterministic (md5-uniforms, log-domain keys) — the
  quality-weighted corpus subsampling step of a training-data
  pipeline (mixture_weights' per-document refinement).

Oracle conventions: md5-derived randomness both sides; log/pow results
rounded to 6 dp BEFORE any ranking (libm 1-ulp divergence suppressed);
unique-id tiebreaks on every rank.

Scale notes:
- m4_downsample is one partial-aggregatable groupBy per (series,
  bucket) — min/max/first/last are all map-side combinable; output is
  4 points per pixel bucket regardless of input size.
- dedup_minhash_estimate reuses the banded-LSH candidate join (shuffles
  carry (band, signature) pairs only) + a per-pair narrow comparison of
  two P-component signature structs.
- weighted_sample shuffles once on the stratum for the top-k window
  over the REDUCED (id, key) projection; the weight→key map is
  map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import llm_text as lt
from ..session import apply_engine_conf
from ..sources.tables import load_table
from . import trips_feed as tf

M4_BUCKETS = 64
WS_PER_STRATUM = 50


# ---------------------------------------------------------------------------
# M4 downsampling — min/max/first/last per pixel bucket per series


def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per (event_type, pixel bucket) emit
    the first/last/min/max points — the 4 values that make a line
    rendering at B pixels lossless.  Bucket = floor(B · (ts − t0) /
    (t1 − t0 + 1)) over the global micros range.

    One partial-aggregatable groupBy; the global (t0, t1) scalar is a
    one-row broadcast.  Ties (same value in a bucket) resolve to the
    earliest (ts, event_id) — deterministic both engines."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    rng = ev.agg(
        F.min(F.unix_micros("ts")).alias("__t0"),
        F.max(F.unix_micros("ts")).alias("__t1"))
    us = F.unix_micros("ts")
    bucket = F.floor(
        F.lit(M4_BUCKETS) * (us - F.col("__t0"))
        / (F.col("__t1") - F.col("__t0") + 1)).cast("int")
    pts = (ev.crossJoin(F.broadcast(rng))
           .select("event_type", bucket.alias("bucket"),
                   us.alias("ts_us"), F.round("value", 6).alias("v"),
                   "event_id"))
    # orderable encodings: (ts, event_id) for first/last, (v, ts,
    # event_id) for min/max — min/max of STRUCTs is lexicographic in
    # both engines, giving deterministic tie resolution
    t_key = F.struct(F.col("ts_us"), F.col("event_id"), F.col("v"))
    v_key = F.struct(F.col("v"), F.col("ts_us"), F.col("event_id"))
    return (pts.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n_pts"),
        F.min(t_key).getField("v").alias("v_first"),
        F.max(t_key).getField("v").alias("v_last"),
        F.min(v_key).getField("v").alias("v_min"),
        F.max(v_key).getField("v").alias("v_max"),
        F.min(t_key).getField("ts_us").alias("ts_first_us"),
        F.max(t_key).getField("ts_us").alias("ts_last_us")))


# ---------------------------------------------------------------------------
# MinHash estimator accuracy — est vs exact Jaccard per candidate pair


def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per LSH candidate pair: MinHash Jaccard ESTIMATE (matching
    signature components / P) next to the exact shingle Jaccard and the
    absolute error — the band/row tuning measurement.  Signatures and
    candidates reuse the production LSH path (md5-derived, oracle-
    reproducible); the exact value reuses the verified-candidates
    composition, so nothing here touches the all-pairs space."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    verified = lt.lsh_jaccard_verified(docs, 3, 0.0).select(
        "doc_i", "doc_j", "jaccard")
    sigs = lt.minhash_signatures(docs, 3)
    a = sigs.select(F.col("doc_id").alias("doc_i"),
                    *[F.col(f"mh{i}").alias(f"__ai{i}")
                      for i in range(lt.N_PERMS)])
    b = sigs.select(F.col("doc_id").alias("doc_j"),
                    *[F.col(f"mh{i}").alias(f"__bj{i}")
                      for i in range(lt.N_PERMS)])
    n_match = sum(
        F.when(F.col(f"__ai{i}") == F.col(f"__bj{i}"), 1).otherwise(0)
        for i in range(lt.N_PERMS))
    return (
        verified.join(a, "doc_i").join(b, "doc_j")
        .select(
            "doc_i", "doc_j",
            F.col("jaccard").alias("exact_jaccard"),
            n_match.cast("int").alias("n_matching_components"),
            F.round(n_match / F.lit(float(lt.N_PERMS)), 6)
            .alias("est_jaccard"),
            F.round(F.abs(n_match / F.lit(float(lt.N_PERMS))
                          - F.col("jaccard")), 6).alias("abs_err")))


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis A-ES)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministic: per
    language stratum keep the top-k documents by the A-ES key
    ln(u)/w — u an md5-derived uniform in (0,1], w = n_chars (longer
    docs proportionally likelier) — the quality-weighted subsample
    step of a corpus pipeline, reproducible across reruns/backfills.

    The key is rounded to 6 dp BEFORE ranking (log's 1-ulp engine
    divergence suppressed), tiebroken on doc_id.  Selection probability
    follows Efraimidis–Spirakis (2006); determinism comes from hashing,
    not an RNG."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    # u in (0,1]: (h + 1) / 2^32 over a 32-bit md5 prefix
    h = F.conv(F.substring(F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))), 1, 8),
        16, 10).cast("bigint")
    u = (h + 1) / F.lit(float(1 << 32))
    w = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    key = F.round(F.log(u) / w, 6)
    keyed = docs.select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"),
        key.alias("ws_key"))
    win = Window.partitionBy("lang").orderBy(
        F.col("ws_key").desc(), F.col("doc_id").asc())
    return (keyed.withColumn("rnk", F.row_number().over(win).cast("int"))
            .where(F.col("rnk") <= WS_PER_STRATUM))


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup — the "state as of T" warehouse query

ASOF_TS = "2024-01-15 00:00:00"


def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD Type-2 dimension: each user's
    attribute version valid AS OF a fixed timestamp — the query every
    BI 'state at close of business' report runs against a versioned
    dim (reference parity: the MERGE-maintained dims in
    sql/streaming/staging/usp_upsert_*.sql read at a point in time,
    reference @ /root/reference).

    Scale: the validity-interval filter is a narrow predicate over the
    SCD2 build (one shuffle inherited from the window); at warehouse
    scale the dim is stored and this is a partition-pruned scan."""
    apply_engine_conf(spark)
    from .catalog import q_scd2_dim

    t = F.lit(ASOF_TS).cast("timestamp")
    scd = q_scd2_dim(spark, sf_dir)
    return scd.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t)))


# ---------------------------------------------------------------------------
# burst-collapse dedupe — telemetry debounce

BURST_GAP_SEC = 5


def q_burst_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: collapse per-user event bursts (inter-event
    gap ≤ 5 s) to their first event, reporting burst id and size — the
    duplicate-click / sensor-chatter suppression a 100 TB event feed
    needs before sessionization.

    One window shuffle on user_id; the burst id is a cumulative sum of
    gap-break flags (same shape as sessionize, tighter gap)."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    gap_break = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
           > BURST_GAP_SEC * 1_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bursts = (ev.select("user_id", "event_id", "ts", "event_type")
              .withColumn("__brk", gap_break)
              .withColumn("burst_id", F.sum("__brk").over(wsum).cast("int")))
    wb = Window.partitionBy("user_id", "burst_id")
    return (bursts
            .withColumn("burst_size", F.count("*").over(wb).cast("bigint"))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy("user_id", "burst_id")
                .orderBy(F.col("ts").asc(), F.col("event_id").asc())))
            .where(F.col("__rn") == 1)
            .select("user_id", "burst_id", "event_id", "ts", "event_type",
                    "burst_size"))


# ---------------------------------------------------------------------------
# chi-square independence table — categorical association check

def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency table of event_type × ISO weekday:
    observed counts, expected counts under independence, and per-cell
    contribution — the DQ-style categorical drift check over the
    warehouse (corr_stats' categorical sibling; exact integer counts,
    one final double formula identical on both engines).

    Scale: one groupBy to |types × 7| cells; the marginals broadcast
    back as window sums over the tiny cell frame."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    # ISO weekday 1=Mon..7=Sun: Spark weekday() is 0-based-Monday,
    # DuckDB isodow is 1-based-Monday — +1 aligns them
    cells = (ev.groupBy("event_type",
                        (F.weekday("ts") + 1).cast("int").alias("dow"))
             .agg(F.count("*").cast("bigint").alias("n_obs")))
    row_tot = F.sum("n_obs").over(Window.partitionBy("event_type"))
    col_tot = F.sum("n_obs").over(Window.partitionBy("dow"))
    grand = F.sum("n_obs").over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing))
    expected = row_tot.cast("double") * col_tot.cast("double") / grand.cast("double")
    contrib = (F.col("n_obs").cast("double") - expected) * \
        (F.col("n_obs").cast("double") - expected) / expected
    return cells.select(
        "event_type", "dow", "n_obs",
        F.round(expected, 6).alias("expected"),
        F.round(contrib, 6).alias("chi2_contrib"))


# ---------------------------------------------------------------------------
# oracles (LSH pieces reused from the llm_catalog oracle fragments so
# both entries stay in lockstep with the production MinHash path)

from .llm_catalog import _BAND_SELECTS, _SHINGLES_CTE  # noqa: E402

_MH_EST_COLS = ",\n    ".join(
    f"MIN((CAST(concat('0x', substring(md5(sg), 1, 8)) AS BIGINT)"
    f" * {a} + {b}) % 4294967296) AS mh{i}"
    for i, (a, b) in enumerate(lt.MIX_CONSTS))
_N_MATCH = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
    for i in range(lt.N_PERMS))

EXT2_ORACLES: dict[str, str] = {
    "dedup_minhash_estimate": f"""
        WITH {_SHINGLES_CTE},
        mh AS (SELECT doc_id, {_MH_EST_COLS} FROM sh GROUP BY 1),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                      AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sz AS (SELECT doc_id, COUNT(*) AS n_sg FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.hg = b.hg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT c.doc_i, c.doc_j,
               round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                     / CAST(sa.n_sg + sb.n_sg - COALESCE(i.n_inter, 0)
                            AS DOUBLE), 6) AS exact_jaccard,
               CAST({{nm}} AS INT) AS n_matching_components,
               round(({{nm}}) / {float(lt.N_PERMS)}, 6) AS est_jaccard,
               round(abs(({{nm}}) / {float(lt.N_PERMS)}
                     - round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                             / CAST(sa.n_sg + sb.n_sg
                                    - COALESCE(i.n_inter, 0) AS DOUBLE), 6)),
                     6) AS abs_err
        FROM cand c
        JOIN mh a ON a.doc_id = c.doc_i
        JOIN mh b ON b.doc_id = c.doc_j
        JOIN sz sa ON sa.doc_id = c.doc_i
        JOIN sz sb ON sb.doc_id = c.doc_j
        LEFT JOIN inter i ON i.doc_i = c.doc_i AND i.doc_j = c.doc_j
    """.replace("{nm}", _N_MATCH),
    "m4_downsample": f"""
        WITH rng AS (
          SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1
          FROM events),
        pts AS (
          SELECT event_type,
                 CAST(floor({M4_BUCKETS} * (epoch_us(ts) - r.t0)
                            / (r.t1 - r.t0 + 1)) AS INT) AS bucket,
                 epoch_us(ts) AS ts_us,
                 round("value", 6) AS v,
                 event_id
          FROM events, rng r)
        SELECT event_type, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pts,
               MIN(struct_pack(ts_us := ts_us, event_id := event_id,
                               v := v)).v AS v_first,
               MAX(struct_pack(ts_us := ts_us, event_id := event_id,
                               v := v)).v AS v_last,
               MIN(struct_pack(v := v, ts_us := ts_us,
                               event_id := event_id)).v AS v_min,
               MAX(struct_pack(v := v, ts_us := ts_us,
                               event_id := event_id)).v AS v_max,
               MIN(struct_pack(ts_us := ts_us, event_id := event_id,
                               v := v)).ts_us AS ts_first_us,
               MAX(struct_pack(ts_us := ts_us, event_id := event_id,
                               v := v)).ts_us AS ts_last_us
        FROM pts GROUP BY 1, 2
    """,
    "weighted_sample": f"""
        WITH keyed AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                 round(
                   ln((CAST(concat('0x', substring(md5(
                         CAST(doc_id AS VARCHAR) || ':ws'), 1, 8))
                       AS BIGINT) + 1) / {float(1 << 32)})
                   / greatest(CAST(n_chars AS DOUBLE), 1.0), 6) AS ws_key
          FROM documents)
        SELECT doc_id, lang, n_chars, ws_key,
               CAST(rnk AS INT) AS rnk
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY ws_key DESC, doc_id ASC) AS rnk
              FROM keyed) t
        WHERE rnk <= {WS_PER_STRATUM}
    """,
}

EXT2_ORACLES["burst_collapse"] = f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > {BURST_GAP_SEC * 1_000_000}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    bursts AS (
      SELECT *, CAST(SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING) AS INT) AS burst_id
      FROM flagged),
    sized AS (
      SELECT user_id, burst_id, event_id, ts, event_type,
             CAST(COUNT(*) OVER (PARTITION BY user_id, burst_id)
                  AS BIGINT) AS burst_size,
             ROW_NUMBER() OVER (PARTITION BY user_id, burst_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM bursts)
    SELECT user_id, burst_id, event_id, ts, event_type, burst_size
    FROM sized WHERE rn = 1
"""

EXT2_ORACLES["chi2_independence"] = """
    WITH cells AS (
      SELECT event_type, CAST(isodow(ts) AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1, 2),
    marg AS (
      SELECT *,
             SUM(n_obs) OVER (PARTITION BY event_type) AS row_tot,
             SUM(n_obs) OVER (PARTITION BY dow) AS col_tot,
             SUM(n_obs) OVER () AS grand
      FROM cells)
    SELECT event_type, dow, n_obs,
           round(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                 / CAST(grand AS DOUBLE), 6) AS expected,
           round((CAST(n_obs AS DOUBLE)
                  - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                    / CAST(grand AS DOUBLE))
                 * (CAST(n_obs AS DOUBLE)
                    - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                      / CAST(grand AS DOUBLE))
                 / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                    / CAST(grand AS DOUBLE)), 6) AS chi2_contrib
    FROM marg
"""

EXT2_QUERIES = {
    "m4_downsample": q_m4_downsample,
    "dedup_minhash_estimate": q_dedup_minhash_estimate,
    "weighted_sample": q_weighted_sample,
    "scd2_asof_lookup": q_scd2_asof_lookup,
    "burst_collapse": q_burst_collapse,
    "chi2_independence": q_chi2_independence,
}
