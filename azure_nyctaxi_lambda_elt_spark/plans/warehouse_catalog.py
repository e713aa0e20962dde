"""Warehouse set F: the classic decision-support join/agg shapes the
reference's BI layer serves (market share, profit rollup, customer
distribution, promo ratio, top-supplier, correlated-avg filter,
having-join, disjunctive-predicate join, anti-join with scalar
subquery, share-of-total, cheapest-supplier join-back).  TPC-H
Q2/Q8/Q9/Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q22/Q11 analogs adapted to the
driver's schema (no partsupp table; part cost approximated from
p_retailprice, supplier "complaints" from negative s_acctbal).

Reference parity: these are the serving-query shapes behind
`mdl/views/vw_fact_trip_bi.view.sql` and the DQ rollups in
`sql/test/40_data_quality.sql` — multi-join star aggregations with
broadcast dims, conditional ratios, EXISTS/NOT-EXISTS, and
share-of-total gates (reference @ /root/reference).

Scale notes (100 TB):
- Every dim side (part/supplier/customer/nation/region and derived
  one-row scalars) is explicitly broadcast — the lineitem scan never
  shuffles for dim resolution.
- Correlated scalar subqueries (Q17/Q22/Q11) become one-row or
  per-key aggregates broadcast back — never a per-row recompute.
- Threshold comparisons against averages are restated as
  multiply-through integer/decimal inequalities (qty*5*cnt < sum)
  so no double division happens before the filter — exact math,
  order-independent, and Catalyst can push the join-side filters.
- Final ratios are double-rounded(6) with the IDENTICAL formula and
  parenthesization as the DuckDB oracle; all exact sums carry an
  explicit final DECIMAL cast so both engines agree on scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.columns import exact_round_div
from ..session import apply_engine_conf
from ..sources.tables import load_table


def _dec(col: str | F.Column, spec: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(spec)


def _rev() -> F.Column:
    return _dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1) - _dec("l_discount", "decimal(4,4)"))


_REV = ("CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,4)))")


# ---------------------------------------------------------------------------
# Q13 analog — customer order-count distribution


def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N qualifying orders (TPC-H Q13
    shape): LEFT OUTER customer→orders, per-customer count, then a
    histogram over the counts.

    Scale: first agg shuffles on o_custkey (high-cardinality, even);
    second agg's input is |customers| rows already reduced — the
    map-side partial makes the second shuffle carry ≤ |distinct
    counts| rows per task."""
    apply_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey"))
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").cast("bigint").alias("custdist")))


# ---------------------------------------------------------------------------
# Q14 analog — promo revenue ratio per month


def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly share of revenue from PROMO-type parts (TPC-H Q14 shape):
    conditional aggregate ratio after a broadcast part join.

    Scale: part is broadcast (REPLICATE analog) so the lineitem scan
    pipelines scan→join→partial-agg in one stage; the only shuffle
    carries ≤ 12 partial rows per task.  The percentage is computed by
    exact_round_div on the exact decimal sums — engine round(double, 6)
    diverges on knife-edge quotients (the r5 sf0.1 find)."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    month = F.date_trunc("month", F.col("l_shipdate")).cast("date")
    agg = (
        j.groupBy(month.alias("ship_month"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p_type") == "PROMO", _rev())),
                F.lit(0).cast("decimal(22,6)")).alias("__p"),
            F.sum(_rev()).alias("__t"),
        ))
    return agg.select(
        "ship_month",
        F.expr(exact_round_div("__p", "__t", 6, mult=100))
            .alias("promo_pct"),
        F.round(F.col("__t"), 2).cast("double").alias("total_revenue"))


# ---------------------------------------------------------------------------
# Q15 analog — top supplier(s) by quarterly revenue


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the maximum revenue in 1997Q1 (TPC-H Q15
    shape: view + max-over-aggregate).

    Scale: the window max runs over the ALREADY-AGGREGATED |supplier|
    rows (tiny), not the fact; supplier names resolve via broadcast.
    Exact decimal revenue ⇒ the max-equality match is deterministic."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("__rev")))
    w = Window.partitionBy(F.lit(1))
    best = (per_supp
            .withColumn("__max", F.max("__rev").over(w))
            .where(F.col("__rev") == F.col("__max")))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.round(F.col("__rev"), 2).cast("double").alias("total_revenue")))


# ---------------------------------------------------------------------------
# Q17 analog — small-quantity-order revenue (correlated avg subquery)


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20%
    of the part's average order quantity) for one brand were dropped
    (TPC-H Q17 shape: correlated scalar subquery).

    Spark-first: the per-part average becomes a per-part (sum, count)
    aggregate over ONLY the brand's lineitems, broadcast back — and the
    threshold `qty < 0.2 * sum/cnt` is restated multiply-through as
    `qty * 5 * cnt < sum`, all exact decimal/integer math (no division
    before the filter, no double drift)."""
    apply_engine_conf(spark)
    part_ids = (load_table(spark, sf_dir, "part")
                .where(F.col("p_brand") == "Brand#13")
                .select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    brand_li = li.join(F.broadcast(part_ids),
                       li.l_partkey == part_ids.p_partkey).drop("p_partkey")
    per_part = (brand_li.groupBy(F.col("l_partkey").alias("__pk"))
                .agg(F.sum(_dec("l_quantity", "decimal(12,2)")).alias("__sum_qty"),
                     F.count("*").alias("__cnt")))
    qty5cnt = (_dec("l_quantity", "decimal(12,2)") * F.lit(5)
               * F.col("__cnt"))
    small = (brand_li.join(F.broadcast(per_part),
                           F.col("l_partkey") == F.col("__pk"))
             .where(qty5cnt < F.col("__sum_qty")))
    return small.agg(
        F.round(F.sum(_dec("l_extendedprice", "decimal(12,2)"))
                .cast("double") / F.lit(7.0), 6).alias("avg_yearly"),
        F.count("*").cast("bigint").alias("n_small_lines"))


# ---------------------------------------------------------------------------
# Q18 analog — large-volume orders


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds a threshold, with
    customer attribution (TPC-H Q18 shape: HAVING-filtered agg joined
    back to the fact graph).

    Scale: the HAVING agg reduces lineitem to qualifying orderkeys
    BEFORE any join; the join back to orders shuffles only that
    filtered set against orders on the high-cardinality key, and
    customer resolves via broadcast."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity", "decimal(12,2)")).alias("sum_qty"))
           .where(F.col("sum_qty") > 150))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round(F.col("o_totalprice").cast("double"), 6)
                .alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty")))


# ---------------------------------------------------------------------------
# Q19 analog — disjunctive predicate join


def q_disjunctive_pred_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three OR-ed brand/size/quantity channels (TPC-H Q19
    shape): a join predicate that is a disjunction of conjunctions.

    Scale: part is broadcast and the common l_partkey = p_partkey
    equi-conjunct is factored out, so this stays a broadcast HASH join
    with the OR evaluated as a post-join filter inside codegen — not a
    nested-loop join."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    ch1 = ((F.col("p_brand") == "Brand#1")
           & F.col("p_size").between(1, 15) & qty.between(1, 20))
    ch2 = ((F.col("p_brand") == "Brand#13")
           & F.col("p_size").between(10, 30) & qty.between(10, 40))
    ch3 = ((F.col("p_type") == "PROMO")
           & F.col("p_size").between(20, 50) & qty.between(20, 50))
    return (j.where(ch1 | ch2 | ch3)
            .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
                 F.count("*").cast("bigint").alias("n_lines")))


# ---------------------------------------------------------------------------
# Q22 analog — idle customers with above-average balances


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment count + balance of customers with above-average
    positive balances and NO RECENT orders (TPC-H Q22 shape: scalar
    subquery + NOT EXISTS; recency window 1998-06-01, non-empty at
    every test scale: 1 / 3 / 68 customers at sf0.001/0.01/0.1 — an
    all-time no-orders gate is empty on this data, and a window that
    only yields rows at the driver scales would leave the pytest smoke
    check vacuous).

    Spark-first: the global average is a one-row (sum, count) aggregate
    cross-broadcast back, restated multiply-through
    (`bal * cnt > sum`, exact decimal); NOT EXISTS is a LEFT ANTI join
    whose build side is the date-filtered o_custkey projection."""
    apply_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    bal = _dec("c_acctbal", "decimal(12,2)")
    pos = cust.where(bal > 0)
    scalar = pos.agg(F.sum(bal).alias("__sum_bal"),
                     F.count("*").alias("__cnt"))
    rich = (cust.crossJoin(F.broadcast(scalar))
            .where(bal * F.col("__cnt") > F.col("__sum_bal")))
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >= "1998-06-01")
              .select("o_custkey"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (idle.groupBy("c_mktsegment")
            .agg(F.count("*").cast("bigint").alias("numcust"),
                 F.sum(bal).cast("double").alias("totacctbal")))


# ---------------------------------------------------------------------------
# Q11 analog — parts above a share-of-total revenue threshold


def q_important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue share exceeds 1.5× the average per-part share
    (TPC-H Q11 shape: HAVING against a scalar-subquery fraction of the
    total; the gate is RELATIVE to the part count, so it stays
    non-vacuous at every scale — Q11's fixed 0.0001/SF fraction is the
    same idea).

    Spark-first: the per-part aggregate is PERSISTED so the scalar
    total re-aggregates from |parts| reduced rows instead of rescanning
    and reshuffling the fact (without it Catalyst plans two full
    lineitem scans — verified in test_warehouse_plan_shapes); the share
    gate is the exact-decimal multiply-through
    `2 * part_rev * n_parts > 3 * total` (share > 1.5× average —
    the synthetic feed is near-uniform, max share ≈ 1.8× average, so a
    larger multiplier would make the check vacuous)."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(_rev()).alias("__rev"))
                .persist())
    total = per_part.agg(F.sum("__rev").alias("__total"),
                         F.count("*").alias("__nparts"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.lit(2) * F.col("__rev") * F.col("__nparts")
               > F.lit(3) * F.col("__total"))
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            F.round(F.col("__rev"), 2).cast("double").alias("part_revenue")))


# ---------------------------------------------------------------------------
# Q8 analog — market share of one supplying nation within a region


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly share of a region's PROMO-part revenue supplied by one
    nation (TPC-H Q8 shape: 6-way star join + conditional ratio).

    Scale: ALL dim sides — part (filtered), the customer→nation→region
    subtree, and the supplier→nation subtree — broadcast; lineitem and
    orders join once on the high-cardinality orderkey.  The share is
    computed by exact_round_div on the exact decimal sums (engine
    round(double, 6) knife-edge divergence, the r5 sf0.1 find)."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_type") == "PROMO").select("p_partkey"))
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    nation = load_table(spark, sf_dir, "nation")
    region = (load_table(spark, sf_dir, "region")
              .where(F.col("r_name") == "ASIA"))
    cust_in_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation),
              F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region),
              F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey"))
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("__snk"),
            F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("__snk"))
        .select("s_suppkey", "supp_nation"))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust_in_region),
               orders.o_custkey == cust_in_region.c_custkey)
         .join(F.broadcast(supp_nation),
               li.l_suppkey == supp_nation.s_suppkey))
    year = F.year("o_orderdate").cast("int")
    target = F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()))
    total = F.sum(_rev())
    agg = (j.groupBy(year.alias("o_year"))
           .agg(F.coalesce(target, F.lit(0).cast("decimal(22,6)"))
                .alias("__tgt"),
                total.alias("__t")))
    return agg.select(
        "o_year",
        F.expr(exact_round_div("__tgt", "__t", 6)).alias("mkt_share"),
        F.round(F.col("__t"), 2).cast("double").alias("total_revenue"))


# ---------------------------------------------------------------------------
# Q9 analog — product-line profit by nation and year


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus an approximated part cost) per supplying
    nation per year for one product family (TPC-H Q9 shape; part cost =
    10% of p_retailprice per unit since there is no partsupp table).

    Scale: part (name-filtered) and supplier→nation broadcast; the
    revenue and cost terms are SUMMED SEPARATELY as exact decimals and
    subtracted once as doubles — identical shape both engines, no
    decimal-scale-alignment divergence."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_name").contains("widget"))
            .select("p_partkey", "p_retailprice"))
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation),
              F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation")))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    cost = (_dec("p_retailprice", "decimal(12,2)")
            * _dec("l_quantity", "decimal(12,2)"))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
         .join(orders, li.l_orderkey == orders.o_orderkey))
    return (j.groupBy("nation", F.year("o_orderdate").cast("int")
                      .alias("o_year"))
            .agg(F.round(F.sum(_rev()).cast("double")
                         - F.sum(cost).cast("double") / F.lit(10.0), 6)
                 .alias("sum_profit")))


# ---------------------------------------------------------------------------
# Q16 analog — supplier breadth per brand/type


def q_brand_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers shipping each (brand, type) family, excluding
    suppliers in deficit (TPC-H Q16 shape: count-distinct with an
    anti-join exclusion; negative s_acctbal stands in for the
    complaints filter).

    Scale: the exclusion list is a broadcast LEFT ANTI; the
    count-distinct runs on the (brand, type, suppkey) projection after
    a broadcast part join — partial dedupe map-side first."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)).select(
        "p_partkey", "p_brand", "p_type")
    bad_supp = (load_table(spark, sf_dir, "supplier")
                .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(F.broadcast(bad_supp),
               li.l_suppkey == bad_supp.s_suppkey, "left_anti"))
    return (j.groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").cast("bigint")
                 .alias("supplier_cnt")))


# ---------------------------------------------------------------------------
# Q2 analog — cheapest observed supplier per part in a region


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part shipped from EUROPE-based suppliers, the supplier
    with the minimum observed unit price (TPC-H Q2 shape: min-cost
    join-back; unit price = extendedprice/quantity since there is no
    partsupp.ps_supplycost).

    Scale: one window shuffle partitioned by the high-cardinality
    p_partkey with a full deterministic tiebreak (price, suppkey,
    orderkey, linenumber); supplier/nation/region prune to a broadcast
    before touching lineitem."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    nation = load_table(spark, sf_dir, "nation")
    region = (load_table(spark, sf_dir, "region")
              .where(F.col("r_name") == "EUROPE"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .select("s_suppkey", "s_name", F.col("n_name").alias("nation")))
    # 6-dp unit price in EXACT integer micro-units: prices are 2-dp
    # and quantities whole numbers, so round-half-up((ep*1e6)/qty) =
    # (ep_cents*20000 + qty) DIV (2*qty) — engine round(double, 6)
    # implementations disagree on knife-edge doubles (seen at sf0.1:
    # 266.9078125 → Spark .907813, DuckDB .907812); integer DIV
    # cannot
    priced = (li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
              .withColumn("__epc", F.round(
                  F.col("l_extendedprice") * 100).cast("bigint"))
              .withColumn("__q", F.col("l_quantity").cast("bigint"))
              .select("l_partkey", "l_orderkey", "l_linenumber",
                      "s_name", "nation",
                      F.expr("CAST((__epc * 20000 + __q) DIV (__q * 2)"
                             " AS DOUBLE) / 1000000.0")
                      .alias("unit_price")))
    w = (Window.partitionBy("l_partkey")
         .orderBy("unit_price", "s_name", "l_orderkey", "l_linenumber"))
    best = (priced.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (best.join(F.broadcast(part),
                      best.l_partkey == part.p_partkey)
            .select(
                F.col("p_partkey").cast("bigint").alias("p_partkey"),
                "p_name", "s_name", "nation", "unit_price"))


# ---------------------------------------------------------------------------
# distribution-window ranking


def q_customer_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment customer spend ranking with the distribution window
    family (dense_rank / percent_rank / cume_dist) over exact-decimal
    totals with a full deterministic tiebreak.

    Scale: the frame is the ALREADY-AGGREGATED |customers| table (one
    fact shuffle on o_custkey), but with only ~5 segments a
    segment-partitioned Window still sorts |customers|/5 rows per
    reducer — linear in the business.  Since round 5 the rank is
    DISTRIBUTED (operators/ranks.py: range-repartition on
    (segment, spend desc, custkey) + per-(partition, segment) offsets),
    and because the order is fully tiebroken (custkey is unique) all
    three distribution functions are closed-form in the group rank r
    and group size n: dense_rank == r, percent_rank == (r-1)/(n-1),
    cume_dist == r/n — bit-identical to the Window forms, no
    per-segment single-reducer sort anywhere in the plan."""
    from ..operators.ranks import with_global_rank

    apply_engine_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    spend = (orders.groupBy("o_custkey")
             .agg(F.sum(_dec("o_totalprice", "decimal(12,2)"))
                  .alias("total_spend")))
    j = spend.join(F.broadcast(cust),
                   spend.o_custkey == cust.c_custkey)
    ranked, totals = with_global_rank(
        j, [F.col("total_spend").desc(), F.col("c_custkey").asc()],
        group_cols=["c_mktsegment"])
    if not totals:
        return spark.createDataFrame(
            [], "c_custkey bigint, c_mktsegment string, total_spend "
                "double, seg_rank bigint, pct_rank double, cume double")
    n_map = F.create_map(*[
        lit for (seg,), (n, _v) in sorted(totals.items())
        for lit in (F.lit(seg), F.lit(n))])
    n = F.element_at(n_map, F.col("c_mktsegment")).cast("bigint")
    r = F.col("__r")
    pct = F.when(n > 1, (r - 1).cast("double") / (n - 1).cast("double")
                 ).otherwise(F.lit(0.0))
    return ranked.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_mktsegment",
        F.col("total_spend").cast("double").alias("total_spend"),
        r.alias("seg_rank"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(r.cast("double") / n.cast("double"), 6).alias("cume"))


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB twins — identical formulas/aliases)

WAREHOUSE_ORACLES: dict[str, str] = {
    "cust_order_distribution": """
        WITH per_cust AS (
          SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN (SELECT * FROM orders
                     WHERE o_orderpriority <> '4-NOT SPECIFIED') o
            ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "promo_revenue_ratio": f"""
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               {exact_round_div(
                   "COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN "
                   + _REV + " END), CAST(0 AS DECIMAL(22,6)))",
                   "SUM(" + _REV + ")", 6, mult=100, dialect="duckdb")}
                 AS promo_pct,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "top_supplier": f"""
        WITH per_supp AS (
          SELECT l_suppkey, SUM({_REV}) AS rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
               CAST(round(p.rev, 2) AS DOUBLE) AS total_revenue
        FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
        WHERE p.rev = (SELECT MAX(rev) FROM per_supp)
    """,
    "small_qty_revenue": """
        WITH brand_li AS (
          SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#13'),
        per_part AS (
          SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
                 COUNT(*) AS cnt
          FROM brand_li GROUP BY l_partkey)
        SELECT round(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(12,2)))
                          AS DOUBLE) / 7.0, 6) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_small_lines
        FROM brand_li b JOIN per_part pp ON b.l_partkey = pp.pk
        WHERE CAST(b.l_quantity AS DECIMAL(12,2)) * 5 * pp.cnt < pp.sum_qty
    """,
    "large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
               CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               round(CAST(o.o_totalprice AS DOUBLE), 6) AS o_totalprice,
               CAST(b.sum_qty AS DOUBLE) AS sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "disjunctive_pred_join": f"""
        SELECT CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """,
    "idle_customers": """
        WITH scalar AS (
          SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal,
                 COUNT(*) AS cnt
          FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2)))
                    AS DOUBLE) AS totacctbal
        FROM customer c, scalar s
        WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * s.cnt > s.sum_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1998-06-01')
        GROUP BY c.c_mktsegment
    """,
    "important_part_share": f"""
        WITH per_part AS (
          SELECT l_partkey, SUM({_REV}) AS rev
          FROM lineitem GROUP BY l_partkey)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(round(rev, 2) AS DOUBLE) AS part_revenue
        FROM per_part
        WHERE 2 * rev * (SELECT COUNT(*) FROM per_part)
              > 3 * (SELECT SUM(rev) FROM per_part)
    """,
    "market_share": f"""
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {exact_round_div(
                   "COALESCE(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN "
                   + _REV + " END), CAST(0 AS DECIMAL(22,6)))",
                   "SUM(" + _REV + ")", 6, dialect="duckdb")}
                 AS mkt_share,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
          AND r.r_name = 'ASIA'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "product_profit": f"""
        SELECT sn.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(CAST(SUM({_REV}) AS DOUBLE)
                     - CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))
                                * CAST(l.l_quantity AS DECIMAL(12,2)))
                            AS DOUBLE) / 10.0, 6) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
          AND p.p_name LIKE '%widget%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """,
    "brand_supplier_cnt": """
        SELECT p.p_brand, p.p_type,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type
    """,
    "customer_value_rank": """
        WITH spend AS (
          SELECT o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_spend
          FROM orders GROUP BY o_custkey)
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_mktsegment,
               CAST(s.total_spend AS DOUBLE) AS total_spend,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS seg_rank,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               round(CUME_DIST() OVER w, 6) AS cume
        FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
        WINDOW w AS (PARTITION BY c.c_mktsegment
                     ORDER BY s.total_spend DESC, c.c_custkey)
    """,
    "min_price_supplier": """
        WITH supp AS (
          SELECT s.s_suppkey, s.s_name, n.n_name AS nation
          FROM supplier s
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'EUROPE'),
        priced AS (
          SELECT l.l_partkey, l.l_orderkey, l.l_linenumber,
                 sp.s_name, sp.nation,
                 CAST((CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * 20000 + CAST(l.l_quantity AS BIGINT))
                      // (CAST(l.l_quantity AS BIGINT) * 2)
                      AS DOUBLE) / 1000000.0 AS unit_price
          FROM lineitem l JOIN supp sp ON l.l_suppkey = sp.s_suppkey
          WHERE l.l_quantity > 0),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY l_partkey
                   ORDER BY unit_price, s_name, l_orderkey, l_linenumber
                 ) AS rn
          FROM priced)
        SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_name,
               rk.s_name, rk.nation, rk.unit_price
        FROM ranked rk JOIN part p ON rk.l_partkey = p.p_partkey
        WHERE rk.rn = 1
    """,
}

WAREHOUSE_QUERIES = {
    "cust_order_distribution": q_cust_order_distribution,
    "promo_revenue_ratio": q_promo_revenue_ratio,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "large_orders": q_large_orders,
    "disjunctive_pred_join": q_disjunctive_pred_join,
    "idle_customers": q_idle_customers,
    "important_part_share": q_important_part_share,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "brand_supplier_cnt": q_brand_supplier_cnt,
    "min_price_supplier": q_min_price_supplier,
    "customer_value_rank": q_customer_value_rank,
}
