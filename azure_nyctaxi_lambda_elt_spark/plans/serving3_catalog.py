"""Serving set H: the remaining classic decision-support shapes
(TPC-H Q12/Q20/Q21 analogs), hierarchical multi-resolution rollup
(continuous-aggregate / hypertable shape), EWMA trend smoothing, robust
MAD outlier capture, and an explicit Bloom-filter runtime-prune join.

Reference parity: the same serving/DQ layer as serving2_catalog —
`mdl/views/vw_fact_trip_bi.view.sql` priority/lateness reports,
`sql/test/40_data_quality.sql` outlier checks, and the hourly
`stg.TripsStreaming_Quality_Audit` rollup's daily re-aggregation
(reference @ /root/reference).

Oracle conventions (same as plans/catalog.py): exact DECIMAL
intermediates; doubles only in final formulas with IDENTICAL
parenthesization on both sides; round(…, 6); identical aliases;
deterministic tiebreaks on every rank/limit.

Scale notes (100 TB):
- Q12/Q21 join lineitem↔orders on the high-cardinality orderkey — the
  one unavoidable shuffle; everything after runs on per-order
  aggregates (Q21's correlated EXISTS/NOT-EXISTS pair is rewritten as
  ONE groupBy computing supplier counts — no double self-join of the
  fact against itself).
- Q20 reduces lineitem to (suppkey, partkey) partials first; the
  per-part total is a re-aggregation of that reduced frame, then
  broadcast back.  The fact is scanned once.
- multi_res_rollup is the continuous-aggregate pattern: daily is
  computed FROM hourly partials (sum-of-sums), never from raw — at
  100 TB the raw scan happens once and every coarser resolution reads
  the previous rollup (hours → ~24× smaller, days → ~576×).
- ewma_daily / mad_outliers window and median over frames already
  reduced to |type × days| / |type| rows; stats broadcast back.
- bloom_join_prune is the runtime-filter pattern Spark applies
  internally, made explicit and deterministic: a 1024-bit / 3-hash
  bitmap built from the small side (16 longs — broadcast as ONE row),
  probe rows pass the bitmap BEFORE the exact semi-join.  At 100 TB
  the bitmap removes ~all non-matching probe rows without shuffling
  the fact; false positives are removed by the exact join, so results
  are identical to the plain semi-join (full oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import apply_engine_conf
from ..sources.tables import load_table
from . import trips_feed as tf


def _dec(col: str | F.Column, spec: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(spec)


# ---------------------------------------------------------------------------
# Q12 analog — shipping status vs order priority


def q_ship_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines shipped in 1997 bucketed by line status × order-priority
    class (TPC-H Q12 shape; l_linestatus stands in for l_shipmode).

    Scale: the year filter pushes to the lineitem scan; both sides are
    pruned to two columns before the orderkey shuffle join; the final
    agg is |statuses| rows."""
    apply_engine_conf(spark)
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_orderkey", "l_linestatus"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
            .alias("low_line_count"),
        ))


# ---------------------------------------------------------------------------
# Q20 analog — dominant suppliers of a part family


def q_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half of a PROMO part's 1997
    volume (TPC-H Q20 shape, partsupp's availqty threshold re-expressed
    over shipped quantity).

    Scale: part is filtered + broadcast; lineitem reduces to (suppkey,
    partkey) partials in ONE shuffle; the per-part total re-aggregates
    the reduced frame (associative sum-of-sums) and is broadcast back.
    The >50% gate is decimal multiply-through (2·supp > total): exact,
    no division."""
    apply_engine_conf(spark)
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_type") == "PROMO")
            .select("p_partkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    sp = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(_dec("l_quantity", "decimal(12,2)")).alias("supp_qty")))
    totals = (sp.groupBy("l_partkey")
              .agg(F.sum("supp_qty").alias("part_qty")))
    dominant = (sp.join(F.broadcast(totals), "l_partkey")
                .where(F.col("supp_qty") * 2 > F.col("part_qty")))
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
            .select("s_suppkey", "s_name", "n_name"))
    return (
        dominant.groupBy("l_suppkey")
        .agg(F.count("*").cast("bigint").alias("n_dominant_parts"),
             F.sum("supp_qty").cast("double").alias("dominant_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(_dec("s_suppkey", "bigint").alias("s_suppkey"),
                "s_name", "n_name", "n_dominant_parts", "dominant_qty"))


# ---------------------------------------------------------------------------
# Q21 analog — the sole late supplier on multi-supplier orders


def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on orders involving ≥2
    suppliers (TPC-H Q21 shape).  "Late" = shipped > 60 days after the
    order date.

    Spark-first: Q21's correlated EXISTS (another supplier on the
    order) + NOT EXISTS (another LATE supplier) pair is rewritten as a
    single per-order aggregate — count(distinct supplier), count
    (distinct late supplier), max(late supplier) — then filtered to
    (≥2, =1).  One orderkey shuffle replaces two self-joins of the
    fact; at 100 TB that's the difference between 1× and 3× fact
    shuffles."""
    apply_engine_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        j.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey")))
            .alias("__n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("__late_supp"),
        )
        .where((F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)))
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
            .select("s_suppkey", "s_name", "n_name"))
    return (
        per_order.groupBy("__late_supp")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .join(F.broadcast(supp), F.col("__late_supp") == supp.s_suppkey)
        .select(_dec("s_suppkey", "bigint").alias("s_suppkey"),
                "s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20))


# ---------------------------------------------------------------------------
# multi-resolution rollup — the continuous-aggregate pattern


def q_multi_res_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type activity computed FROM hourly partials
    (hypertable continuous-aggregate shape: raw → hourly → daily).

    The daily frame never touches raw events: it re-aggregates the
    hourly rollup's (count, exact-decimal sum) partials — valid because
    both are associative.  n_hours_active falls out of the hierarchy
    for free (count of hourly rows).  At 100 TB each coarser resolution
    reads the ~24×-smaller previous level, the reference's
    Quality_Audit-hour → daily-report chain."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", F.col("ts")).alias("__hour"))
        .agg(F.count("*").alias("__n"),
             F.sum(_dec("value", "decimal(18,6)")).alias("__sv")))
    return (
        hourly.groupBy(
            "event_type",
            F.col("__hour").cast("date").alias("day"))
        .agg(F.sum("__n").cast("bigint").alias("n_events"),
             F.round(F.sum("__sv"), 2).cast("double").alias("sum_value"),
             F.count("*").cast("bigint").alias("n_hours_active")))


# ---------------------------------------------------------------------------
# EWMA — finite-window exponential smoothing over the daily series

EWMA_ALPHA = 0.4
EWMA_LAGS = 8


def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-term EWMA of daily revenue per event type: a truncated
    exponential filter (weights α·(1−α)^k, renormalized over the lags
    that exist near the series start).

    Spark-first: the daily series is ONE reduction of events
    (|types×days| rows); the 8 lag terms share a single window sort.
    An unbounded recursive EWMA is order-dependent and unbounded-state;
    the truncated FIR form is exact over its window, mergeable, and
    oracle-checkable (weights beyond k=8 are < 0.007·α).

    Lag semantics are ROWS, not calendar days: lag k is the k-th
    previous day WITH ACTIVITY, so calendar gaps are compressed (a day
    after a 5-day gap smooths against week-old totals at full weight).
    The oracle matches this exactly.  For gap-sensitive smoothing,
    densify first with the gap_fill_locf operator (plans/ext_catalog)
    and run this EWMA over the filled grid."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(_dec("value", "decimal(18,6)")).cast("double")
             .alias("__x")))
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(EWMA_LAGS):
        wk = EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** k
        xk = F.lag("__x", k).over(w)
        num = num + F.when(xk.isNotNull(), F.lit(wk) * xk).otherwise(0.0)
        den = den + F.when(xk.isNotNull(), F.lit(wk)).otherwise(0.0)
    return daily.select(
        "event_type", "day",
        F.round("__x", 6).alias("daily_total"),
        F.round(num / den, 6).alias("ewma8"))


def _ewma_oracle() -> str:
    num_terms, den_terms = [], []
    for k in range(EWMA_LAGS):
        wk = repr(EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** k)
        lagk = f"LAG(x, {k}) OVER w"
        num_terms.append(
            f"CASE WHEN {lagk} IS NOT NULL THEN {wk} * {lagk} ELSE 0.0 END")
        den_terms.append(
            f"CASE WHEN {lagk} IS NOT NULL THEN {wk} ELSE 0.0 END")
    num = "(" + " + ".join(num_terms) + ")"
    den = "(" + " + ".join(den_terms) + ")"
    return f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
          FROM events GROUP BY 1, 2)
        SELECT event_type, day,
               round(x, 6) AS daily_total,
               round((0.0 + {num}) / (0.0 + {den}), 6) AS ewma8
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """


# ---------------------------------------------------------------------------
# MAD outliers — robust dispersion gate


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events deviating > 3 MADs from their type's median — the robust
    twin of zscore_outliers (medians don't move under the heavy tail
    that drags a mean).

    Both stats frames reduce to |event types| rows and broadcast back;
    the events scan is never shuffled.  Medians are rounded to 6 dp
    BEFORE the deviation pass so both engines gate on identical
    doubles."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    med = (ev.groupBy("event_type")
           .agg(F.round(F.median("value"), 6).alias("__med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("__dev", F.abs(F.col("value") - F.col("__med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.round(F.median("__dev"), 6).alias("__mad"))
           .where(F.col("__mad") > 0))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("__dev") > 3 * F.col("__mad"))
        .select(
            "event_id", "event_type",
            F.round("value", 6).alias("value"),
            F.col("__med").alias("type_median"),
            F.col("__mad").alias("type_mad"),
            F.round((F.col("value") - F.col("__med")) / F.col("__mad"), 6)
            .alias("robust_z")))


# ---------------------------------------------------------------------------
# Bloom-filter runtime prune — explicit, deterministic, exact result

BLOOM_HASHES = 3
BLOOM_BITS_PER_KEY = 16          # m/n = 16 with k = 3 → ~0.5% FPR
BLOOM_MAX_BITS = 1 << 24         # 16 Mbit = 256 K longs ≈ 2 MB broadcast


def bloom_n_bits(n_keys: int) -> int:
    """Bitmap size for a build side of ``n_keys``: next power of two
    ≥ 16 bits/key, floored at 1024 and capped at 16 Mbit (beyond that
    the build side is no longer 'small' and a shuffled semi-join is the
    right plan anyway)."""
    want = max(1, n_keys) * BLOOM_BITS_PER_KEY
    return min(max(1024, 1 << (want - 1).bit_length()), BLOOM_MAX_BITS)


def _bloom_pos_sql(key_sql: str, j: int, n_bits: int) -> str:
    """Deterministic bit position j for a key: 8 md5 hex chars → bigint
    mod n_bits (same derivation both build and probe side)."""
    return (f"CAST(conv(substring(md5(CAST({key_sql} AS STRING)), "
            f"{1 + 8 * j}, 8), 16, 10) AS BIGINT) % {n_bits}")


def bloom_bitmap(keys: DataFrame, key_col: str, n_bits: int) -> DataFrame:
    """ONE-row bitmap frame: word index → OR-ed bit longs."""
    pos = keys.select(F.explode(F.array(
        *[F.expr(_bloom_pos_sql(key_col, j, n_bits)).alias(f"p{j}")
          for j in range(BLOOM_HASHES)])).alias("pos"))
    return (
        pos.select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("__word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .alias("__bit"))
        .groupBy("__word").agg(F.expr("bit_or(__bit)").alias("__bits"))
        .agg(F.map_from_arrays(F.collect_list("__word"),
                               F.collect_list("__bits")).alias("__bloom")))


def bloom_probe_predicate(key_sql: str, n_bits: int) -> str:
    """SQL predicate testing all k bits against the broadcast __bloom."""
    tests = [
        f"(coalesce(element_at(__bloom, CAST(({_bloom_pos_sql(key_sql, j, n_bits)})"
        f" DIV 64 AS INT)), CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT),"
        f" CAST(({_bloom_pos_sql(key_sql, j, n_bits)}) % 64 AS INT))) != 0"
        for j in range(BLOOM_HASHES)
    ]
    return " AND ".join(tests)


def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join of orders against BUILDING-segment customers with an
    explicit Bloom-filter prefilter: a 3-hash bitmap SIZED FROM THE
    BUILD-SIDE COUNT (16 bits/key, next power of two — a fixed-size
    bitmap saturates once the dim outgrows it and the prefilter
    degenerates to pure overhead), broadcast as ONE map row and probed
    map-side before the exact semi-join removes false positives.

    This is Spark's runtime-filter / the reference's replicated-dim
    pruning made explicit and deterministic (md5-derived positions, so
    the oracle can ignore it: the final result EQUALS the plain
    semi-join).  At 100 TB the bitmap rejects non-matching fact rows in
    the scan stage — no shuffle, no broadcast-hash probe — and the
    exact join only sees survivors.  The one-row count() on the pruned
    dim side is the same scalar the AQE runtime-filter planner pays."""
    apply_engine_conf(spark)
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    n_bits = bloom_n_bits(cust.count())
    bloom = bloom_bitmap(cust, "c_custkey", n_bits)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice")
    probe = orders.join(F.broadcast(bloom))
    candidates = probe.where(F.expr(bloom_probe_predicate("o_custkey", n_bits)))
    exact = candidates.join(F.broadcast(cust),
                            candidates.o_custkey == cust.c_custkey,
                            "left_semi")
    return (
        exact.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(_dec("o_totalprice", "decimal(12,2)"))
             .cast("double").alias("total_price")))


# ---------------------------------------------------------------------------
# oracles

SERVING3_ORACLES: dict[str, str] = {
    "ship_mode_priority": """
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "excess_shipments": """
        WITH sp AS (
          SELECT l.l_partkey, l.l_suppkey,
                 SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS supp_qty
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_type = 'PROMO'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2),
        tot AS (
          SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sp GROUP BY 1),
        dom AS (
          SELECT sp.l_suppkey, sp.supp_qty
          FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
          WHERE sp.supp_qty * 2 > tot.part_qty)
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_dominant_parts,
               CAST(SUM(d.supp_qty) AS DOUBLE) AS dominant_qty
        FROM dom d
        JOIN supplier s ON d.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3
    """,
    "waiting_orders": """
        WITH per_order AS (
          SELECT l.l_orderkey,
                 COUNT(DISTINCT l.l_suppkey) AS n_supp,
                 COUNT(DISTINCT CASE WHEN l.l_shipdate >
                         o.o_orderdate + INTERVAL 60 DAY
                       THEN l.l_suppkey END) AS n_late_supp,
                 MAX(CASE WHEN l.l_shipdate >
                         o.o_orderdate + INTERVAL 60 DAY
                     THEN l.l_suppkey END) AS late_supp
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1)
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, n.n_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order p
        JOIN supplier s ON p.late_supp = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.n_supp >= 2 AND p.n_late_supp = 1
        GROUP BY 1, 2, 3
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20
    """,
    "multi_res_rollup": """
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS sum_value,
               CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
                 AS n_hours_active
        FROM events
        GROUP BY 1, 2
    """,
    "ewma_daily": _ewma_oracle(),
    "mad_outliers": """
        WITH med AS (
          SELECT event_type, round(median(value), 6) AS med
          FROM events GROUP BY 1),
        dev AS (
          SELECT e.event_id, e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS dv
          FROM events e JOIN med m ON e.event_type = m.event_type),
        mad AS (
          SELECT event_type, round(median(dv), 6) AS mad
          FROM dev GROUP BY 1)
        SELECT d.event_id, d.event_type,
               round(d.value, 6) AS value,
               d.med AS type_median,
               a.mad AS type_mad,
               round((d.value - d.med) / a.mad, 6) AS robust_z
        FROM dev d JOIN mad a ON d.event_type = a.event_type
        WHERE a.mad > 0 AND d.dv > 3 * a.mad
    """,
    "bloom_join_prune": """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
                    AS DOUBLE) AS total_price
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        GROUP BY 1
    """,
}

SERVING3_QUERIES = {
    "ship_mode_priority": q_ship_mode_priority,
    "excess_shipments": q_excess_shipments,
    "waiting_orders": q_waiting_orders,
    "multi_res_rollup": q_multi_res_rollup,
    "ewma_daily": q_ewma_daily,
    "mad_outliers": q_mad_outliers,
    "bloom_join_prune": q_bloom_join_prune,
}
