"""Serving set G: second wave of classic decision-support shapes
(TPC-H Q3/Q6/Q7/Q10 analogs) plus GROUPING SETS, Pareto cumulative
share, an inverted-index corpus pass, and moment-exact z-score outlier
detection.

Reference parity: the same BI serving layer the reference exposes via
`mdl/views/vw_fact_trip_bi.view.sql` + `sql/test/40_data_quality.sql`
(reference @ /root/reference) — top-N revenue reports, period filters,
multi-join star rollups, and outlier/dispersion checks over the fact.

Oracle conventions (same as plans/catalog.py): exact DECIMAL
intermediates; one final double formula with IDENTICAL parenthesization
on both sides; round(…, 6); identical aliases; deterministic tiebreaks
on every rank/limit.

Scale notes (100 TB):
- Q3/Q10 top-N: orderBy().limit(N) compiles to TakeOrderedAndProject —
  each task keeps a N-row heap; no global sort materializes.
- Q6 is scan→filter→one-stage partial agg: predicate pushdown serves
  the date bounds to the parquet reader, output is one row.
- Q7's four dims are broadcast; the lineitem scan never shuffles for
  dim resolution (REPLICATE analog).
- grouping-sets runs all sets in ONE aggregation pass via Expand
  (map-side row replication, single shuffle).
- Pareto/z-score first reduce to |customers| / |event types| rows;
  windows and stat join-backs run over the reduced frame only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranks import with_global_rank
from ..session import apply_engine_conf
from ..sources.tables import load_table
from . import trips_feed as tf


def _dec(col: str | F.Column, spec: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(spec)


def _rev() -> F.Column:
    return _dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1) - _dec("l_discount", "decimal(4,4)"))


_REV = ("CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,4)))")


# ---------------------------------------------------------------------------
# Q3 analog — unshipped-order shipping priority


def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 highest-revenue orders taken before a cutoff but shipped
    after it, for one market segment (TPC-H Q3 shape).

    Scale: customer is pruned to (key, segment) and broadcast; orders
    filters push to the scan; the only real shuffle is the groupBy on
    l_orderkey (high-cardinality, even).  The final top-10 is
    TakeOrderedAndProject — a 10-row heap per task, never a full sort."""
    apply_engine_conf(spark)
    cutoff = "1998-06-01"
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey))
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select(
            _dec("l_orderkey", "bigint").alias("l_orderkey"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority", "revenue")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10))


# ---------------------------------------------------------------------------
# Q6 analog — forecast revenue change


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta from a hypothetical discount change (TPC-H Q6
    shape): tight scan-side filters, one-row exact aggregate.

    Scale: all three predicates push to the parquet scan
    (PushedFilters); the single-stage partial agg emits one row per
    task — network cost is O(tasks)."""
    apply_engine_conf(spark)
    disc = _dec("l_discount", "decimal(4,4)")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01")
                 & (F.col("l_quantity") < 24))
          .where((disc >= F.lit("0.02").cast("decimal(4,4)"))
                 & (disc <= F.lit("0.04").cast("decimal(4,4)"))))
    return li.agg(
        F.sum(_dec("l_extendedprice", "decimal(12,2)") * disc)
        .cast("double").alias("revenue_delta"),
        F.count("*").cast("bigint").alias("n_lines"))


# ---------------------------------------------------------------------------
# Q7 analog — volume shipping between two nations


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by ship year (TPC-H
    Q7 shape): supplier-nation × customer-nation directed pairs.

    Scale: supplier/customer/nation are broadcast; the OR-of-pairs
    predicate is applied AFTER the cheap broadcast joins, so the fact
    scan pipelines scan→join→filter→partial-agg in one stage with a
    final shuffle of ≤ |pairs × years| rows."""
    apply_engine_conf(spark)
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
            .select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation")))
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
            .select(F.col("c_custkey"), F.col("n_name").alias("cust_nation")))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1998-01-01")))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
         .where(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1"))))
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
             F.count("*").cast("bigint").alias("n_lines")))


# ---------------------------------------------------------------------------
# Q10 analog — returned-item revenue report


def q_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter
    (TPC-H Q10 shape).

    Scale: orders' quarter filter pushes down; nation broadcasts; the
    groupBy shuffles on c_custkey (high-cardinality).  Top-20 is a
    TakeOrderedAndProject heap, tiebroken on c_custkey for
    determinism."""
    apply_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= "1997-01-01")
                     & (F.col("o_orderdate") < "1997-04-01"))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey))
    return (
        j.groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
             F.round(F.min("c_acctbal"), 6).alias("c_acctbal"))
        .select(_dec("c_custkey", "bigint").alias("c_custkey"),
                "c_name", "n_name", "c_mktsegment", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20))


# ---------------------------------------------------------------------------
# GROUPING SETS — arbitrary set list in one Expand pass


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((flag, status), (flag), ()) — unlike
    cube/rollup, an arbitrary set list, still ONE aggregation pass
    (Expand replicates rows map-side; a single shuffle serves all
    sets).  Reference parity: the BI layer's subtotal views."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    sets = [["l_returnflag", "l_linestatus"], ["l_returnflag"], []]
    agg_cols = [
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(_dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
        F.round(F.sum(_rev()), 2).cast("double").alias("sum_revenue"),
    ]
    return li.groupingSets(sets, "l_returnflag", "l_linestatus").agg(*agg_cols)


# ---------------------------------------------------------------------------
# Pareto cumulative share — which customers make up 80% of revenue


def q_pareto_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend ranked with exact cumulative share and an
    in-top-80% flag (Pareto / ABC analysis).

    Scale: spend first reduces to |customers| rows (one even shuffle
    on o_custkey) — but that frame still grows linearly with the
    business, so the rank and running sum are computed DISTRIBUTED via
    operators/ranks.py (range-repartition + per-partition offsets; the
    only Window is partitioned by spark_partition_id), not through an
    unpartitioned Window's single reducer.  The 80% gate is decimal
    multiply-through (cum*10 ≤ total*8): no double division before the
    filter, exact and order-independent — the corpus total arrives as
    an exact Decimal literal from the offset pass, no second scan."""
    apply_engine_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(F.sum(_dec("o_totalprice", "decimal(12,2)"))
                  .alias("total_spend")))
    ranked, totals = with_global_rank(
        spend, [F.col("total_spend").desc(), F.col("o_custkey").asc()],
        value_col="total_spend")
    _n, tot = totals.get((), (0, None))
    if tot is None:
        return spark.createDataFrame(
            [], "o_custkey bigint, total_spend double, spend_rank "
                "bigint, cum_share double, in_top80 boolean")
    cum = F.col("__cum")
    return ranked.select(
        _dec("o_custkey", "bigint").alias("o_custkey"),
        _dec("total_spend", "decimal(18,2)").cast("double").alias("total_spend"),
        F.col("__r").alias("spend_rank"),
        F.round(cum.cast("double") / F.lit(float(tot)), 6)
        .alias("cum_share"),
        (cum * 10 <= F.lit(tot) * 8).alias("in_top80"),
    )


# ---------------------------------------------------------------------------
# Inverted index — token → posting list over the corpus


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inverted index: token → document frequency + sorted
    posting list (comma-joined doc_ids), tokens appearing in ≥ 2 docs.

    Spark-first: tokenize once into an array column (narrow), explode,
    distinct (token, doc_id) via the groupBy itself (collect_set), ONE
    shuffle keyed on token.  The posting list is sort_array'd so output
    is deterministic under any partitioning.

    Scale: at 100 TB the posting payload dominates — the shuffle
    carries (token, doc_id) pairs only (two narrow columns), and
    map-side partial collect_set dedupes within-partition repeats
    before the wire."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), " "),
                         lambda t: F.length(t) > 3))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.collect_set("doc_id").alias("__docs"))
        .where(F.size("__docs") >= 2)
        .select(
            "token",
            F.size("__docs").cast("bigint").alias("df"),
            F.array_join(
                F.transform(F.sort_array(F.col("__docs")),
                            lambda d: d.cast("string")), ",")
            .alias("postings")))


# ---------------------------------------------------------------------------
# Z-score outliers — moment-exact dispersion gate


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates > 2σ from their event-type mean,
    with the z computed from EXACT decimal moment sums (n, Σx, Σx²) —
    deterministic under any partitioning, unlike float stddev
    aggregates (same trick as corr_stats).

    Reference parity: the DQ domain checks in
    `sql/test/40_data_quality.sql` (value-range outlier capture).

    Scale: the stats frame reduces to |event types| rows and is
    broadcast back — the events scan is touched exactly twice with no
    wide shuffle (stats agg is map-side partial; join-back is
    broadcast)."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    v = _dec("value", "decimal(18,6)")
    stats = (ev.groupBy("event_type")
             .agg(F.count("*").cast("bigint").alias("__n"),
                  F.sum(v).alias("__sx"),
                  F.sum(v * v).alias("__sxx")))
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    var_num = n * sxx - sx * sx
    stats = (stats.where((F.col("__n") > 1) & (var_num > 0))
             .select("event_type", "__n", "__sx", "__sxx"))
    j = ev.join(F.broadcast(stats), "event_type")
    mean = sx / n
    sd = F.sqrt(var_num / (n * (n - F.lit(1.0))))
    z = (F.col("value") - mean) / sd
    return (j.where(F.abs(z) > 2)
            .select("event_id", "event_type",
                    F.round("value", 6).alias("value"),
                    F.round(z, 6).alias("zscore")))


# ---------------------------------------------------------------------------
# approximate sketches — the 100 TB path next to the exact twins


QSKETCH_ACC = 10000
QSKETCH_QS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def q_approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p90/p99 via percentile_approx (Greenwald-Khanna
    sketch): single pass, mergeable partials, bounded memory — the
    100 TB replacement for the exact rank-selection percentile_value
    (exact needs a full sort per group; the sketch shuffles
    O(1/ε log εN) tuples per partition).

    The sketch estimate itself is merge-tree-dependent, so the
    COMPARABLE output carries the guarantee instead of the estimate:
    for each q, the EXACT values at ranks ⌈q·n⌉ ± (⌈n/acc⌉ + 1)
    (``<q>_lo``/``<q>_hi`` — deterministic order statistics) and
    ``<q>_ok`` = whether the sketch landed inside that bracket.  The
    oracle recomputes the brackets exactly and pins ok = TRUE, making
    the driver row a per-run check of the GK rank-error guarantee.
    The bracket computation sorts each group once (exact rank
    selection) — it is the VERIFICATION harness around the sketch, not
    the production path; production consumers read the sketch alone."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    est = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        *[F.percentile_approx("value", q, QSKETCH_ACC).alias(f"__{c}_est")
          for c, q in QSKETCH_QS])
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("value")).alias("rn"))
    j = ranked.join(F.broadcast(est), "event_type")
    err = F.ceil(F.col("n_events") / F.lit(QSKETCH_ACC)) + F.lit(1)
    aggs = []
    for c, q in QSKETCH_QS:
        target = F.ceil(F.lit(q) * F.col("n_events"))
        lo_rank = F.greatest(F.lit(1), target - err)
        hi_rank = F.least(F.col("n_events"), target + err)
        aggs.append(F.max(F.when(F.col("rn") == lo_rank, F.col("value")))
                    .alias(f"{c}_lo"))
        aggs.append(F.max(F.when(F.col("rn") == hi_rank, F.col("value")))
                    .alias(f"{c}_hi"))
    bounds = j.groupBy("event_type").agg(*aggs)
    out = est.join(bounds, "event_type")
    cols = [F.col("event_type"), F.col("n_events")]
    for c, _ in QSKETCH_QS:
        cols += [
            F.col(f"{c}_lo"), F.col(f"{c}_hi"),
            F.col(f"__{c}_est").between(F.col(f"{c}_lo"), F.col(f"{c}_hi"))
            .alias(f"{c}_ok"),
        ]
    return out.select(*cols)


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p90/p99 via a t-digest (Dunning & Ertl): the
    MERGEABLE tail-accurate quantile sketch — relative rank error
    ~q(1−q)·4/δ concentrates accuracy at the tails where GK's uniform
    bound wastes budget.  Arrow-batched numpy kernel (applyInPandas),
    chunk-partial + fold-merge construction (the distributed
    tree-merge shape, made deterministic by sorting; merge property
    pinned in tests/test_temporal_sketch.py).

    Output = exact rank brackets + ok flags (same verification
    encoding as approx_quantile_sketch): the oracle recomputes the
    brackets exactly and pins ok = TRUE, so the driver row asserts
    the digest's rank-error guarantee every run."""
    apply_engine_conf(spark)
    from ..operators.tdigest import tdigest_quantile_brackets
    ev = tf.events_ts_fixed(spark, sf_dir)
    return tdigest_quantile_brackets(ev, "event_type", "value")


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via HyperLogLog++
    (approx_count_distinct, rsd 2%): constant 1.5 KB state per group
    vs the exact COUNT(DISTINCT)'s full key shuffle — at 100 TB the
    exact form shuffles every (type, user) pair; HLL merges fixed-size
    registers map-side.

    Rows-only oracle (register merge is partition-order dependent only
    in its low bits, but DuckDB's approx algorithm differs anyway);
    tests/test_sketches.py pins the ±2% rsd against exact counts."""
    apply_engine_conf(spark)
    ev = tf.events_ts_fixed(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.approx_count_distinct("user_id", 0.02).cast("bigint")
            .alias("approx_users"),
        ))


# ---------------------------------------------------------------------------
# oracles

SERVING2_ORACLES: dict[str, str] = {
    "ship_priority": f"""
        SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               o.o_orderpriority,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,4)))
                    AS DOUBLE) AS revenue_delta,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_quantity < 24
          AND CAST(l_discount AS DECIMAL(4,4))
              BETWEEN CAST('0.02' AS DECIMAL(4,4))
                  AND CAST('0.04' AS DECIMAL(4,4))
    """,
    "volume_shipping": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
               OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "returned_item": f"""
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
               c.c_name, n.n_name, c.c_mktsegment,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               round(CAST(MIN(c.c_acctbal) AS DOUBLE), 6) AS c_acctbal
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,4)))), 2) AS DOUBLE) AS sum_revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
    "pareto_customer_share": """
        WITH spend AS (
          SELECT o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_spend
          FROM orders GROUP BY 1),
        run AS (
          SELECT o_custkey, total_spend,
                 ROW_NUMBER() OVER w AS spend_rank,
                 SUM(total_spend) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum,
                 SUM(total_spend) OVER () AS tot
          FROM spend
          WINDOW w AS (ORDER BY total_spend DESC, o_custkey))
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(total_spend AS DOUBLE) AS total_spend,
               CAST(spend_rank AS BIGINT) AS spend_rank,
               round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 AS cum_share,
               cum * 10 <= tot * 8 AS in_top80
        FROM run
    """,
    "inverted_index": """
        WITH toks AS (
          SELECT DISTINCT doc_id, u.token
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '),
                                   t -> length(t) > 3) AS t
                FROM documents) d, UNNEST(t) u(token)),
        agg AS (
          SELECT token, COUNT(*) AS df,
                 array_to_string(
                   list_transform(list_sort(list(doc_id)),
                                  d -> CAST(d AS VARCHAR)), ',') AS postings
          FROM toks GROUP BY 1)
        SELECT token, CAST(df AS BIGINT) AS df, postings
        FROM agg WHERE df >= 2
    """,
    # approx_quantile_sketch: the bracket columns are exact order
    # statistics (deterministic) and the ok flags assert the GK
    # guarantee — the oracle recomputes the brackets and pins TRUE.
    # The float literals are CAST to DOUBLE so DuckDB's decimal
    # literals don't ceil() differently from Spark's double arithmetic.
    "approx_quantile_sketch": """
        WITH nf AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1),
        ranked AS (
          SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY value) AS rn
          FROM events),
        j AS (
          SELECT r.event_type, r.value, r.rn, f.n_events,
                 CEIL(CAST(f.n_events AS DOUBLE) / 10000.0) + 1 AS err
          FROM ranked r JOIN nf f USING (event_type))
        SELECT event_type, n_events,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.5 AS DOUBLE)
              * n_events) - err) THEN value END) AS p50_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.5 AS DOUBLE)
              * n_events) + err) THEN value END) AS p50_hi,
          TRUE AS p50_ok,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.9 AS DOUBLE)
              * n_events) - err) THEN value END) AS p90_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.9 AS DOUBLE)
              * n_events) + err) THEN value END) AS p90_hi,
          TRUE AS p90_ok,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.99 AS DOUBLE)
              * n_events) - err) THEN value END) AS p99_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.99 AS DOUBLE)
              * n_events) + err) THEN value END) AS p99_hi,
          TRUE AS p99_ok
        FROM j GROUP BY event_type, n_events
    """,
    # tdigest_quantiles: same bracket-encoding as approx_quantile_
    # sketch; the error budget is the t-digest's tail-proportional
    # 4·n·q(1−q)/δ (δ=100) instead of GK's uniform n/acc.  Arithmetic
    # order mirrors operators/tdigest.py rank_error_bound exactly.
    "tdigest_quantiles": """
        WITH nf AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1),
        ranked AS (
          SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY value) AS rn
          FROM events),
        j AS (
          SELECT r.event_type, r.value, r.rn, f.n_events
          FROM ranked r JOIN nf f USING (event_type))
        SELECT event_type, n_events,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.5 AS DOUBLE)
              * n_events) - (CEIL(8.0 * n_events * CAST(0.5 AS DOUBLE)
              * (1.0 - CAST(0.5 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p50_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.5 AS DOUBLE)
              * n_events) + (CEIL(8.0 * n_events * CAST(0.5 AS DOUBLE)
              * (1.0 - CAST(0.5 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p50_hi,
          TRUE AS p50_ok,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.9 AS DOUBLE)
              * n_events) - (CEIL(8.0 * n_events * CAST(0.9 AS DOUBLE)
              * (1.0 - CAST(0.9 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p90_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.9 AS DOUBLE)
              * n_events) + (CEIL(8.0 * n_events * CAST(0.9 AS DOUBLE)
              * (1.0 - CAST(0.9 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p90_hi,
          TRUE AS p90_ok,
          MAX(CASE WHEN rn = GREATEST(1, CEIL(CAST(0.99 AS DOUBLE)
              * n_events) - (CEIL(8.0 * n_events * CAST(0.99 AS DOUBLE)
              * (1.0 - CAST(0.99 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p99_lo,
          MAX(CASE WHEN rn = LEAST(n_events, CEIL(CAST(0.99 AS DOUBLE)
              * n_events) + (CEIL(8.0 * n_events * CAST(0.99 AS DOUBLE)
              * (1.0 - CAST(0.99 AS DOUBLE)) / 100.0) + 2))
              THEN value END) AS p99_hi,
          TRUE AS p99_ok
        FROM j GROUP BY event_type, n_events
    """,
    "zscore_outliers": """
        WITH m AS (
          SELECT event_type,
                 COUNT(*) AS n_ev,
                 SUM(CAST(value AS DECIMAL(18,6))) AS sx,
                 SUM(CAST(value AS DECIMAL(18,6))
                     * CAST(value AS DECIMAL(18,6))) AS sxx
          FROM events GROUP BY 1),
        d AS (
          SELECT event_type,
                 CAST(n_ev AS DOUBLE) AS n,
                 CAST(sx AS DOUBLE) AS sx,
                 CAST(sxx AS DOUBLE) AS sxx
          FROM m
          WHERE n_ev > 1
            AND CAST(n_ev AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0)
        SELECT e.event_id, e.event_type,
               round(e.value, 6) AS value,
               round((e.value - d.sx / d.n)
                     / sqrt((d.n * d.sxx - d.sx * d.sx)
                            / (d.n * (d.n - 1.0))), 6) AS zscore
        FROM events e JOIN d ON e.event_type = d.event_type
        WHERE abs((e.value - d.sx / d.n)
                  / sqrt((d.n * d.sxx - d.sx * d.sx)
                         / (d.n * (d.n - 1.0)))) > 2
    """,
}

SERVING2_QUERIES = {
    "ship_priority": q_ship_priority,
    "forecast_revenue": q_forecast_revenue,
    "volume_shipping": q_volume_shipping,
    "returned_item": q_returned_item,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "pareto_customer_share": q_pareto_customer_share,
    "approx_quantile_sketch": q_approx_quantile_sketch,
    "tdigest_quantiles": q_tdigest_quantiles,
    "hll_distinct_users": q_hll_distinct_users,
    "inverted_index": q_inverted_index,
    "zscore_outliers": q_zscore_outliers,
}
