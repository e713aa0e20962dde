"""Extension set E: wider analytics shapes (CUBE, funnel, retention,
ntile, exact-decimal correlation, snapshot diff, JSON extraction) and
two more corpus passes (paragraph dedup, heuristic quality filter) plus
iterative k-means over embeddings.

Same oracle conventions as plans/catalog.py: exact DECIMAL
intermediates, identical final-double formulas (same parenthesization
on both sides ⇒ bit-identical IEEE results), round(…, 6), identical
aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import corpus as cp
from ..operators.clustering import (KMEANS_ITERS, KMEANS_K, kmeans_assign,
                                    semantic_dedup)

SEMDEDUP_TAU = 0.45
from ..operators.llm_text import STOPWORDS
from ..session import apply_engine_conf
from . import trips_feed as tf
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# queries


def _dec(col: str | F.Column, spec: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(spec)


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE subtotals over (returnflag, linestatus) with grouping_id —
    all 2² grouping sets in ONE aggregation pass (single shuffle; the
    Expand adds rows map-side).  Reference parity: the BI rollup views
    over vw_fact_trip_bi."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1) - _dec("l_discount", "decimal(4,4)"))
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(_dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
            F.round(F.sum(rev), 2).cast("double").alias("sum_revenue"),
        )
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel signup → click → purchase per user, each
    stage's timestamp constrained to follow the previous stage.

    Spark-first shape: ONE shuffle (groupBy user) collecting the per-
    stage timestamp arrays, then the sequential min-after constraints
    run as narrow array HOFs — no self-joins, no re-shuffles.  Per-user
    state is bounded by that user's click/purchase counts (same bounded-
    key-state argument as sessionization).  Reference parity: the
    streaming lane's per-key ordered walk (usp_upsert_* producer-ts
    logic) generalized to multi-stage order."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
            .alias("t_signup"),
        F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            .alias("__clicks"),
        F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            .alias("__purchases"),
    )
    t_click = F.array_min(F.filter(
        "__clicks", lambda c: c >= F.col("t_signup")))
    staged = per_user.where(F.col("t_signup").isNotNull()).select(
        "user_id", "t_signup", t_click.alias("t_click"), "__purchases")
    t_purchase = F.array_min(F.filter(
        "__purchases", lambda p: p >= F.col("t_click")))
    out = staged.select(
        "user_id", "t_signup", "t_click", t_purchase.alias("t_purchase"))
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return out.withColumn("funnel_stage", stage.cast("int"))


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted once per (cohort, week-offset) they were active in.

    Scale shape: first-ts aggregation shuffles on user once; the
    activity join re-uses the same user hash partitioning (co-located),
    and the final agg reduces to |cohorts × offsets| rows."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("__first_ts"))
    j = ev.select("user_id", "ts").join(firsts, "user_id")
    cohort = F.date_trunc("week", F.col("__first_ts"))
    offset = F.floor(
        F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))),
                   F.to_date(cohort)) / 7)
    active = j.select(
        "user_id",
        # DATE-typed cohort key (DuckDB's date_trunc('week') yields DATE)
        F.to_date(cohort).alias("cohort_week"),
        offset.cast("int").alias("week_offset"),
    ).distinct()
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles — NTILE(4) output over a fully-
    tiebroken order, but computed as a DISTRIBUTED rank + closed-form
    bucket assignment (operators/ranks.py), not an unpartitioned
    Window: the per-customer frame grows linearly with the business,
    and NTILE over a known row count is pure integer arithmetic on the
    global rank.  Bit-identical to the Window form."""
    from ..operators.ranks import ntile_expr, with_global_rank

    apply_engine_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice", "decimal(12,2)")).alias("spend"))
    ranked, totals = with_global_rank(
        spend, [F.desc("spend"), F.asc("o_custkey")])
    n, _ = totals.get((), (0, None))
    if n == 0:
        return spark.createDataFrame(
            [], "o_custkey bigint, spend double, quartile int")
    return ranked.select(
        "o_custkey", F.col("spend").cast("double").alias("spend"),
        ntile_expr("__r", n, 4).cast("int").alias("quartile"),
    )


def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type dispersion + value↔hour correlation, computed
    from EXACT decimal moment sums (n, Σx, Σx², Σy, Σy², Σxy) with one
    final double formula — deterministic regardless of partitioning /
    accumulation order, unlike float stddev/corr aggregates (the same
    trick the decimal revenue sums use; moments are associative, so the
    shuffle carries 6 numbers per group per task)."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    v = _dec("value", "decimal(18,6)")
    h = F.hour("ts").cast("decimal(4,0)")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(v).alias("__sx"),
        F.sum(v * v).alias("__sxx"),
        F.sum(h).alias("__sy"),
        F.sum(h * h).alias("__syy"),
        F.sum(v * h).alias("__sxy"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_num = n * sxx - sx * sx
    cov_num = n * sxy - sx * sy
    hvar_num = n * syy - sy * sy
    return m.select(
        "event_type", "n_events",
        F.round(sx / n, 6).alias("avg_value"),
        F.when(F.col("n_events") > 1,
               F.round(F.sqrt(var_num / (n * (n - F.lit(1.0)))), 6))
            .alias("stddev_value"),
        F.round(sy / n, 6).alias("avg_hour"),
        F.when((var_num > 0) & (hvar_num > 0),
               F.round(cov_num / F.sqrt(var_num * hvar_num), 6))
            .alias("corr_value_hour"),
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style table diff between two deterministic snapshots of
    orders (old = keys % 11 ≠ 0; new = keys % 13 ≠ 0 with price bumped
    on keys % 7 = 0) → added / removed / changed rows.

    Scale shape: one full-outer sort-merge join on the key — both
    sides hash-partition identically, and unchanged rows (the vast
    majority at 100 TB) are filtered before any downstream work.
    Reference parity: the MERGE source/target matching in
    usp_upsert_trip_clean_from_slice_streaming.sql, surfaced as a diff
    instead of applied."""
    apply_engine_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice", "decimal(12,2)")
    old = (
        orders.where(F.col("o_orderkey") % 11 != 0)
        .select("o_orderkey", price.alias("old_price"))
    )
    new = (
        orders.where(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, price + F.lit(5))
            .otherwise(price).cast("decimal(13,2)").alias("new_price"),
        )
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), "added")
        .when(F.col("new_price").isNull(), "removed")
        .when(F.col("old_price").cast("decimal(13,2)")
              != F.col("new_price"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type") != "unchanged")
        .select("o_orderkey",
                F.col("old_price").cast("double").alias("old_price"),
                F.col("new_price").cast("double").alias("new_price"),
                "change_type")
    )


def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSON property extraction + rollup — the ASA lane's
    schema-on-read JSON parse (infra/scripts/asa-wire.sh) as a batch
    op.  get_json_object is JVM-side (Jayway path eval inside codegen);
    the aggregation reduces map-side to |event_type| rows."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    staged = ev.select("event_type", "user_id", k.alias("__k"))
    return staged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("__k").cast("bigint").alias("sum_k"),
        F.min("__k").cast("int").alias("min_k"),
        F.max("__k").cast("int").alias("max_k"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def q_json_dualkey_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Camel/snake/legacy dual-key JSON tolerance (asa-wire.sh's
    COALESCE(GetRecordPropertyValue 'puLocationId'/'PULocationID'/
    'pu_location_id') parse, reference @ /root/reference): a feed whose
    producers drift between casings is parsed with a per-field
    COALESCE over all key variants, entirely in JVM-side
    get_json_object — no UDF, pushdown-friendly.

    The mixed-casing feed is derived deterministically from events
    (integer payloads only, so both engines render identical JSON) and
    the rollup proves every casing path extracted: n_extracted must
    equal n_rows per event_type."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    eid, uid, val = F.col("event_id"), F.col("user_id"), F.col("value")
    # explicit floor(): a bare double→bigint CAST truncates in Spark but
    # rounds in DuckDB — floor is identical in both engines
    cents = F.floor(val * 100).cast("bigint").cast("string")
    i, u = eid.cast("string"), (uid % 50).cast("string")
    doc = (
        F.when(eid % 3 == 0, F.concat(
            F.lit('{"eventId": '), i, F.lit(', "fareCents": '), cents,
            F.lit(', "puLocationId": '), u, F.lit('}')))
        .when(eid % 3 == 1, F.concat(
            F.lit('{"event_id": '), i, F.lit(', "fare_cents": '), cents,
            F.lit(', "pu_location_id": '), u, F.lit('}')))
        .otherwise(F.concat(
            F.lit('{"EventID": '), i, F.lit(', "fare_cents": '), cents,
            F.lit(', "PULocationID": '), u, F.lit('}'))))

    def pick(*paths: str) -> F.Column:
        return F.coalesce(*[F.get_json_object(F.col("__doc"), f"$.{p}")
                            for p in paths]).cast("bigint")

    staged = ev.select("event_type", doc.alias("__doc"))
    parsed = staged.select(
        "event_type",
        pick("eventId", "EventID", "event_id").alias("__id"),
        pick("fareCents", "fare_cents").alias("__fare"),
        pick("puLocationId", "PULocationID", "pu_location_id").alias("__loc"))
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("__id").cast("bigint").alias("n_extracted"),
        F.sum("__fare").cast("bigint").alias("sum_fare_cents"),
        F.sum("__loc").cast("bigint").alias("sum_pu_loc"))


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.paragraph_dedup(load_table(spark, sf_dir, "documents"))


def q_heuristic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return cp.heuristic_filter(
        load_table(spark, sf_dir, "documents"), STOPWORDS["en"])


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return kmeans_assign(load_table(spark, sf_dir, "embeddings"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-bucketed embedding dedup — the quadratic
    cosine pass runs per cluster (|corpus|²/k expected work) instead of
    all-pairs over the corpus.  FULL oracle since r3: the unrolled
    Lloyd SQL chain (_semantic_dedup_oracle) replays the assignment,
    then the per-cluster cosine pass + lowest-lower-id keeper rule;
    tests/test_ext_ops.py additionally holds numpy-reference parity.
    Reference parity: the dedupe stage generalized to semantic
    near-dups (core/12_trip_clean.dedupe_load.sql's role for
    embeddings)."""
    apply_engine_conf(spark)
    from ..sources.tables import spread_small_scan

    return semantic_dedup(
        spread_small_scan(load_table(spark, sf_dir, "embeddings")),
        tau=SEMDEDUP_TAU)


def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue series per event type with LOCF gap fill
    (time_bucket_gapfill + locf hypertable shape): per-key date grid
    generated narrowly via sequence+explode, fill = one bounded-state
    window per key.  Reference parity: the BI layer's daily trend
    serving over a continuous calendar (mdl/dim_date.table.sql gives
    the dense grid; this op fuses grid + fill)."""
    apply_engine_conf(spark)
    from ..operators.temporal import gap_fill_locf
    ev = tf.events_ts_fixed(spark, sf_dir)
    daily = (ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(_dec("value", "decimal(18,2)")).cast("double")
             .alias("total_value")))
    return gap_fill_locf(daily, "event_type", "day", "total_value")


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/val/test split over documents —
    map-only, no RNG state, stable across re-runs/backfills."""
    apply_engine_conf(spark)
    return cp.dataset_split(load_table(spark, sf_dir, "documents"))


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget training-sequence packing via per-source
    cumsum binning — one window shuffle per domain group, no global
    total order."""
    apply_engine_conf(spark)
    return cp.sequence_packing(load_table(spark, sf_dir, "documents"))


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the pathologically-skewed
    event_type key (|types| ≈ 5 over the whole feed — every key is
    hot): partial agg on (key, salt16) spreads each hot key over 16
    reducers, final combine sees ≤ 16 rows per key.  The result is
    identical to the plain groupBy (exact decimal sums are associative)
    — which is exactly what the full oracle checks."""
    apply_engine_conf(spark)
    from ..operators.skew import salted_sum_count
    ev = tf.events_ts_fixed(spark, sf_dir).select(
        "event_type", "event_id",
        _dec("value", "decimal(18,2)").alias("value_dec"))
    out = salted_sum_count(ev, ["event_type"], ["value_dec"], "event_id")
    return out.select(
        "event_type",
        F.col("sum_value_dec").cast("double").alias("total_value"),
        "row_count")


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe replicated join: events (big, hot user keys) against a
    per-user first-seen-day table too big to assume broadcastable —
    the small side is replicated 16× against a deterministic salt on
    the big side, so no reducer owns a whole hot key.  Salting must not
    change the answer (count of events landing on their user's
    first-seen day, per type) — the full oracle is the plain join."""
    apply_engine_conf(spark)
    from ..operators.skew import salted_join
    ev = tf.events_ts_fixed(spark, sf_dir)
    first_day = (ev.groupBy("user_id")
                 .agg(F.min(F.col("ts").cast("date")).alias("first_day")))
    j = salted_join(ev.select("user_id", "event_id", "event_type",
                              F.col("ts").cast("date").alias("day")),
                    first_day, "user_id", "event_id")
    return (j.where(F.col("day") == F.col("first_day"))
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_first_day_events")))


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov edge counts):
    lag over (user, ts, event_id) then count (prev → next) pairs.

    ONE window shuffle on the high-cardinality user_id, then an agg
    over the tiny |types|² key space — map-side partials collapse it.
    Reference parity: the streaming lane's per-key ordered walk
    (producer-ts ordering in usp_upsert_trips_from_streaming.sql)."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"))
    return (stepped.where(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count("*").cast("bigint").alias("n_transitions")))


# ---------------------------------------------------------------------------
# oracle SQL

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"
_STOP_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

EXT_ORACLES: dict[str, str] = {
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,4)))), 2) AS DOUBLE) AS sum_revenue
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "funnel_conversion": """
        WITH s AS (
          SELECT user_id, MIN(ts) AS t_signup FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts >= s.t_signup GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase,
               CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                         WHEN c.t_click IS NOT NULL THEN 2
                         ELSE 1 END AS INT) AS funnel_stage
        FROM s
        LEFT JOIN c ON c.user_id = s.user_id
        LEFT JOIN p ON p.user_id = s.user_id
    """,
    "retention_cohort": """
        WITH f AS (SELECT user_id, MIN(ts) AS first_ts
                   FROM events GROUP BY 1),
        act AS (
          SELECT DISTINCT e.user_id,
                 CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
                 CAST(floor(date_diff('day',
                        CAST(date_trunc('week', f.first_ts) AS DATE),
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7)
                      AS INT) AS week_offset
          FROM events e JOIN f ON f.user_id = e.user_id)
        SELECT cohort_week, week_offset, COUNT(*) AS n_users
        FROM act GROUP BY 1, 2
    """,
    "ntile_quartiles": """
        WITH spend AS (
          SELECT o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
          FROM orders GROUP BY 1)
        SELECT o_custkey, CAST(spend AS DOUBLE) AS spend,
               CAST(NTILE(4) OVER (ORDER BY spend DESC, o_custkey ASC)
                    AS INT) AS quartile
        FROM spend
    """,
    "corr_stats": """
        WITH m AS (
          SELECT event_type,
                 COUNT(*) AS n_events,
                 SUM(CAST(value AS DECIMAL(18,6))) AS sx,
                 SUM(CAST(value AS DECIMAL(18,6))
                     * CAST(value AS DECIMAL(18,6))) AS sxx,
                 SUM(CAST(hour(ts) AS DECIMAL(4,0))) AS sy,
                 SUM(CAST(hour(ts) AS DECIMAL(4,0))
                     * CAST(hour(ts) AS DECIMAL(4,0))) AS syy,
                 SUM(CAST(value AS DECIMAL(18,6))
                     * CAST(hour(ts) AS DECIMAL(4,0))) AS sxy
          FROM events GROUP BY 1),
        d AS (
          SELECT event_type, n_events,
                 CAST(n_events AS DOUBLE) AS n,
                 CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
                 CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy,
                 CAST(sxy AS DOUBLE) AS sxy
          FROM m)
        SELECT event_type, n_events,
               round(sx / n, 6) AS avg_value,
               CASE WHEN n_events > 1 THEN
                 round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 6)
               END AS stddev_value,
               round(sy / n, 6) AS avg_hour,
               CASE WHEN (n * sxx - sx * sx) > 0
                     AND (n * syy - sy * sy) > 0 THEN
                 round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               END AS corr_value_hour
        FROM d
    """,
    "snapshot_diff": """
        WITH old AS (
          SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS old_price
          FROM orders WHERE o_orderkey % 11 <> 0),
        new AS (
          SELECT o_orderkey,
                 CAST(CASE WHEN o_orderkey % 7 = 0
                      THEN CAST(o_totalprice AS DECIMAL(12,2)) + 5
                      ELSE CAST(o_totalprice AS DECIMAL(12,2)) END
                      AS DECIMAL(13,2)) AS new_price
          FROM orders WHERE o_orderkey % 13 <> 0)
        SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CAST(old_price AS DOUBLE) AS old_price,
               CAST(new_price AS DOUBLE) AS new_price,
               CASE WHEN old_price IS NULL THEN 'added'
                    WHEN new_price IS NULL THEN 'removed'
                    WHEN CAST(old_price AS DECIMAL(13,2)) <> new_price
                      THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
        WHERE CASE WHEN old_price IS NULL THEN 'added'
                   WHEN new_price IS NULL THEN 'removed'
                   WHEN CAST(old_price AS DECIMAL(13,2)) <> new_price
                     THEN 'changed'
                   ELSE 'unchanged' END <> 'unchanged'
    """,
    "json_dualkey_extract": """
        WITH staged AS (
          SELECT event_type,
            CASE
              WHEN event_id % 3 = 0 THEN
                '{"eventId": ' || CAST(event_id AS VARCHAR)
                || ', "fareCents": ' || CAST(CAST(floor("value" * 100) AS BIGINT) AS VARCHAR)
                || ', "puLocationId": ' || CAST(user_id % 50 AS VARCHAR) || '}'
              WHEN event_id % 3 = 1 THEN
                '{"event_id": ' || CAST(event_id AS VARCHAR)
                || ', "fare_cents": ' || CAST(CAST(floor("value" * 100) AS BIGINT) AS VARCHAR)
                || ', "pu_location_id": ' || CAST(user_id % 50 AS VARCHAR) || '}'
              ELSE
                '{"EventID": ' || CAST(event_id AS VARCHAR)
                || ', "fare_cents": ' || CAST(CAST(floor("value" * 100) AS BIGINT) AS VARCHAR)
                || ', "PULocationID": ' || CAST(user_id % 50 AS VARCHAR) || '}'
            END AS doc
          FROM events),
        parsed AS (
          SELECT event_type,
            CAST(COALESCE(json_extract_string(doc, '$.eventId'),
                          json_extract_string(doc, '$.EventID'),
                          json_extract_string(doc, '$.event_id')) AS BIGINT) AS id,
            CAST(COALESCE(json_extract_string(doc, '$.fareCents'),
                          json_extract_string(doc, '$.fare_cents')) AS BIGINT) AS fare,
            CAST(COALESCE(json_extract_string(doc, '$.puLocationId'),
                          json_extract_string(doc, '$.PULocationID'),
                          json_extract_string(doc, '$.pu_location_id')) AS BIGINT) AS loc
          FROM staged)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(id) AS BIGINT) AS n_extracted,
               CAST(SUM(fare) AS BIGINT) AS sum_fare_cents,
               CAST(SUM(loc) AS BIGINT) AS sum_pu_loc
        FROM parsed GROUP BY 1
    """,
    "json_extract_props": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT)
                 AS min_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT)
                 AS max_k,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "paragraph_dedup": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        ch AS (
          SELECT doc_id,
                 CAST((i - 1) // {cp.PARA_TOKENS} AS INT) AS chunk_id,
                 md5(array_to_string(t[i:i + {cp.PARA_TOKENS - 1}], ' '))
                   AS chunk_hash,
                 doc_id * {1 << 20}
                   + CAST((i - 1) // {cp.PARA_TOKENS} AS BIGINT) AS pk
          FROM toks, UNNEST(generate_series(1, len(t), {cp.PARA_TOKENS})) u(i)
          WHERE len(t) > 0)
        SELECT doc_id, chunk_id, chunk_hash,
               COUNT(*) OVER (PARTITION BY chunk_hash) AS group_size,
               CAST(MIN(pk) OVER (PARTITION BY chunk_hash) // {1 << 20}
                    AS BIGINT) AS canonical_doc_id,
               CAST(MIN(pk) OVER (PARTITION BY chunk_hash) % {1 << 20}
                    AS INT) AS canonical_chunk_id,
               pk <> MIN(pk) OVER (PARTITION BY chunk_hash) AS is_duplicate
        FROM ch
    """,
    "heuristic_filter": f"""
        WITH staged AS (
          SELECT doc_id, text AS txt,
                 list_filter(string_split(lower(text), ' '),
                             t -> t <> '') AS t
          FROM documents),
        nz AS (SELECT * FROM staged WHERE len(t) > 0),
        m AS (
          SELECT doc_id,
                 CAST(len(t) AS INT) AS n_tokens,
                 round(CAST(list_sum([length(x) FOR x IN t]) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE), 6) AS mean_word_len,
                 round(CAST(len(regexp_extract_all(txt, '{cp.SYMBOL_PAT}'))
                            AS DOUBLE)
                       / CAST(length(txt) AS DOUBLE), 6) AS symbol_ratio,
                 CAST(len(list_distinct(list_filter(t,
                      x -> x IN ({_STOP_EN})))) AS INT) AS n_stop_distinct,
                 regexp_matches(txt, '[.!?]$') AS has_terminal_punct
          FROM nz)
        SELECT *,
               (n_tokens >= {cp.FILTER_MIN_TOKENS}
                AND n_tokens <= {cp.FILTER_MAX_TOKENS}
                AND mean_word_len >= {cp.FILTER_MWL_MIN}
                AND mean_word_len <= {cp.FILTER_MWL_MAX}
                AND symbol_ratio < {cp.FILTER_SYMBOL_RATIO_MAX}
                AND n_stop_distinct >= {cp.FILTER_MIN_STOPWORDS}) AS keep
        FROM m
    """,
    # kmeans_embeddings: deterministic (lowest-vec_id init, fixed
    # iteration count) → the Lloyd loop UNROLLS into SQL; full oracle
    # built below by _kmeans_replay_oracle()
    # semantic_dedup: k-means-based + per-cluster neighborhood walk →
    # rows-only + tests/test_ext_ops.py numpy-reference parity
    "gap_fill_locf": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT MAX(day) AS dmax FROM daily),
        pk AS (SELECT event_type, MIN(day) AS dmin FROM daily GROUP BY 1),
        grid AS (
          SELECT p.event_type, CAST(g.d AS DATE) AS day
          FROM pk p, bounds b,
               UNNEST(generate_series(CAST(p.dmin AS TIMESTAMP),
                                      CAST(b.dmax AS TIMESTAMP),
                                      INTERVAL 1 DAY)) g(d))
        SELECT g.event_type, g.day,
               LAST_VALUE(d.total_value IGNORE NULLS) OVER (
                 PARTITION BY g.event_type ORDER BY g.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_filled,
               d.total_value IS NULL AS was_gap
        FROM grid g
        LEFT JOIN daily d
          ON d.event_type = g.event_type AND d.day = g.day
    """,
    "dataset_split": f"""
        WITH b AS (
          SELECT doc_id,
                 CAST(CAST(concat('0x',
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS INT) AS split_bucket
          FROM documents)
        SELECT doc_id, split_bucket,
               CASE WHEN split_bucket < {cp.SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN split_bucket < {cp.SPLIT_TRAIN_PCT
                                         + cp.SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "sequence_packing": f"""
        WITH toks AS (
          SELECT source AS grp, doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS BIGINT) AS n_tok
          FROM documents),
        binned AS (
          SELECT grp, n_tok,
                 CAST(floor((SUM(n_tok) OVER (
                        PARTITION BY grp ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) - n_tok) / {cp.PACK_SEQ_TOKENS}) AS BIGINT)
                   AS bin_id
          FROM toks)
        SELECT grp AS source, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               round(CAST(SUM(n_tok) AS DOUBLE)
                     / {float(cp.PACK_SEQ_TOKENS)}, 6) AS fill_ratio
        FROM binned GROUP BY 1, 2
    """,
    "skew_salted_agg": """
        SELECT event_type,
               CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value,
               CAST(COUNT(*) AS BIGINT) AS row_count
        FROM events GROUP BY event_type
    """,
    "skew_salted_join": """
        WITH fd AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id)
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_first_day_events
        FROM events e JOIN fd ON e.user_id = fd.user_id
        WHERE CAST(e.ts AS DATE) = fd.first_day
        GROUP BY e.event_type
    """,
    "event_transitions": """
        WITH stepped AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM stepped WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
}


def _kmeans_replay_chain(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                         dim: int = 64) -> str:
    """Full SQL replay of kmeans_assign (operators/clustering.py):
    deterministic init (k lowest vec_ids) + fixed Lloyd iterations
    unroll into one CTE chain — assign (argmin over centroids, ties →
    min cid) then per-(cluster, position) mean, repeated ``iters``
    times, then the final assignment pass.  Element-wise work runs on
    an (id, position, value) long table so the SQL needs no lambda
    support; empty clusters keep their previous centroid via the LEFT
    JOIN COALESCE exactly like the Spark keep-branch."""
    sql = [f"""
        WITH pts AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
        px AS (SELECT vec_id, i, e[i] AS x FROM pts, idx),
        init AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cid, e
          FROM (SELECT vec_id, e FROM pts ORDER BY vec_id LIMIT {k})),
        cx0 AS (SELECT cid, i, e[i] AS cx FROM init, idx)"""]
    prev = "cx0"
    for it in range(1, iters + 1):
        sql.append(f""",
        d{it} AS (
          SELECT p.vec_id, c.cid,
                 SUM((p.x - c.cx) * (p.x - c.cx)) AS d2
          FROM px p JOIN {prev} c ON c.i = p.i
          GROUP BY 1, 2),
        a{it} AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d{it}) t WHERE rn = 1),
        m{it} AS (
          SELECT a.cid, p.i, AVG(p.x) AS cx
          FROM a{it} a JOIN px p ON p.vec_id = a.vec_id
          GROUP BY 1, 2),
        cx{it} AS (
          SELECT prev.cid, prev.i, COALESCE(m.cx, prev.cx) AS cx
          FROM {prev} prev
          LEFT JOIN m{it} m ON m.cid = prev.cid AND m.i = prev.i)""")
        prev = f"cx{it}"
    sql.append(f""",
        dfin AS (
          SELECT p.vec_id, c.cid,
                 SUM((p.x - c.cx) * (p.x - c.cx)) AS d2
          FROM px p JOIN {prev} c ON c.i = p.i
          GROUP BY 1, 2),
        asg AS (
          SELECT vec_id, cid, d2 FROM (
            SELECT vec_id, cid, d2, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM dfin) t
          WHERE rn = 1)""")
    return "".join(sql)


def _kmeans_replay_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                          dim: int = 64) -> str:
    return _kmeans_replay_chain(k, iters, dim) + """
        SELECT vec_id, CAST(cid AS INT) AS cluster_id,
               ROUND(sqrt(d2), 6) AS dist
        FROM asg"""


def _semantic_dedup_oracle(tau: float, k: int = KMEANS_K,
                           iters: int = KMEANS_ITERS,
                           dim: int = 64) -> str:
    """semantic_dedup (operators/clustering.py) replayed in SQL: the
    unrolled-Lloyd assignment chain, then the per-cluster pairwise
    cosine pass and the lowest-lower-id-neighbor keeper rule."""
    return _kmeans_replay_chain(k, iters, dim) + f""",
        ssq AS (SELECT vec_id, SUM(x * x) AS s FROM px GROUP BY 1),
        cpairs AS (
          SELECT ai.vec_id AS id_i, aj.vec_id AS id_j
          FROM asg ai
          JOIN asg aj ON ai.cid = aj.cid AND ai.vec_id < aj.vec_id),
        cosv AS (
          SELECT p.id_i, p.id_j,
                 round(SUM(pa.x * pb.x) / (sqrt(si.s) * sqrt(sj.s)), 6)
                   AS c
          FROM cpairs p
          JOIN px pa ON pa.vec_id = p.id_i
          JOIN px pb ON pb.vec_id = p.id_j AND pb.i = pa.i
          JOIN ssq si ON si.vec_id = p.id_i
          JOIN ssq sj ON sj.vec_id = p.id_j
          GROUP BY p.id_i, p.id_j, si.s, sj.s),
        dups AS (
          SELECT id_j AS vec_id, MIN(id_i) AS dup_of
          FROM cosv WHERE c >= {tau} GROUP BY 1)
        SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
               CAST(a.cid AS INT) AS cluster_id,
               (d.dup_of IS NOT NULL) AS is_dup,
               CAST(d.dup_of AS BIGINT) AS dup_of
        FROM asg a LEFT JOIN dups d USING (vec_id)"""


EXT_ORACLES["kmeans_embeddings"] = _kmeans_replay_oracle()
EXT_ORACLES["semantic_dedup"] = _semantic_dedup_oracle(SEMDEDUP_TAU)

EXT_QUERIES = {
    "cube_revenue": q_cube_revenue,
    "funnel_conversion": q_funnel_conversion,
    "retention_cohort": q_retention_cohort,
    "ntile_quartiles": q_ntile_quartiles,
    "corr_stats": q_corr_stats,
    "snapshot_diff": q_snapshot_diff,
    "json_extract_props": q_json_extract_props,
    "json_dualkey_extract": q_json_dualkey_extract,
    "paragraph_dedup": q_paragraph_dedup,
    "heuristic_filter": q_heuristic_filter,
    "kmeans_embeddings": q_kmeans_embeddings,
    "semantic_dedup": q_semantic_dedup,
    "event_transitions": q_event_transitions,
    "gap_fill_locf": q_gap_fill_locf,
    "dataset_split": q_dataset_split,
    "sequence_packing": q_sequence_packing,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
}
