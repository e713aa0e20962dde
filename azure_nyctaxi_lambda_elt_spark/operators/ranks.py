"""Distributed global rank / running sum — no unpartitioned Window.

``Window.orderBy(...)`` with no partitionBy funnels every row through
ONE reducer: fine on a reduced frame at test scale, a single-machine
sort of 10^8-10^9 rows once the frame grows linearly with the business
(per-customer aggregates at 100x).  This module computes bit-identical
ranks, running sums, and NTILE buckets as a DISTRIBUTED plan — the
machinery built for the equi-depth histogram stats pass, factored out
for every rank-family operator:

1. ``repartitionByRange`` on the full (tiebroken) sort key — Spark's
   sampled range partitioner yields ordered, non-overlapping ranges;
2. ``localCheckpoint`` pins ONE materialization: the counts branch and
   the rank branch must see identical range boundaries (the
   partitioner re-SAMPLES per action otherwise — observed as bucket
   drift at sf0.01);
3. per-partition (x per-group) counts and value sums collect to the
   driver — a numPartitions-row frame, scalar control flow — and
   prefix-sum into offsets;
4. global rank = broadcast offset + partition-local row_number;
   running sum = broadcast value-offset + partition-local running sum
   (the only Windows are partitioned by spark_partition_id);
5. NTILE over a known row count is closed-form in INTEGER arithmetic
   (the first n%b buckets hold ceil(n/b) rows) — a map-side
   expression, no second pass.

Reference parity: the warehouse's ranked serving views (RANK/NTILE
OVER (ORDER BY ...) in Synapse) — re-expressed so the sort scales out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import pin


def with_global_rank(
    df: DataFrame,
    sort_cols: Sequence[Column],
    value_col: str | None = None,
    group_cols: Sequence[str] = (),
    rank_col: str = "__r",
    cum_col: str = "__cum",
) -> tuple[DataFrame, dict]:
    """Attach a global dense total-order rank (``rank_col``) — and,
    when ``value_col`` is given, the inclusive running sum
    (``cum_col``) — over ``sort_cols``, per ``group_cols`` group.

    ``sort_cols`` must be a FULLY TIEBROKEN order (append a unique key)
    so the rank is deterministic.  ``group_cols`` values must be
    non-null (they ride an equi-join).  Returns ``(df, totals)`` where
    ``totals[group_tuple] = (row_count, value_sum | None)`` — callers
    use it for closed-form bucket math without another pass."""
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    range_cols = [F.asc(g) for g in group_cols] + list(sort_cols)
    ranged = (
        df.repartitionByRange(nparts, *range_cols)
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin)
    )
    key = ["__pid", *group_cols]
    aggs = [F.count("*").alias("__cnt")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("__vs"))
    part_stats = ranged.groupBy(*key).agg(*aggs)
    rows = sorted(part_stats.collect(), key=lambda r: r["__pid"])

    totals: dict = {}
    data = []
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        n_so_far, v_so_far = totals.get(g, (0, None))
        data.append((r["__pid"], *g, n_so_far, v_so_far))
        n_new = n_so_far + r["__cnt"]
        if value_col is not None:
            v = r["__vs"]
            v_new = v if v_so_far is None else (
                v_so_far if v is None else v_so_far + v)
        else:
            v_new = None
        totals[g] = (n_new, v_new)
    if not data:
        out = ranged.withColumn(rank_col, F.lit(None).cast("bigint"))
        if value_col is not None:
            out = out.withColumn(cum_col, F.lit(None).cast("double"))
        return out.drop("__pid"), totals

    fields = [T.StructField("__pid", T.IntegerType())]
    for gc in group_cols:
        fields.append(T.StructField(gc, ranged.schema[gc].dataType))
    fields.append(T.StructField("__off", T.LongType()))
    if value_col is not None:
        vs_type = part_stats.schema["__vs"].dataType
        fields.append(T.StructField("__voff", vs_type, nullable=True))
    else:
        data = [row[:-1] for row in data]
    offsets = F.broadcast(
        spark.createDataFrame(data, T.StructType(fields)))

    w = Window.partitionBy(*key).orderBy(*sort_cols)
    out = (
        ranged.join(offsets, key)
        .withColumn(rank_col, (F.col("__off")
                               + F.row_number().over(w)).cast("bigint"))
    )
    if value_col is not None:
        run = F.sum(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = out.withColumn(
            cum_col, F.coalesce(F.col("__voff") + run, run))
        out = out.drop("__voff")
    return out.drop("__pid", "__off"), totals


def ntile_expr(rank_col: str, n: int, buckets: int) -> Column:
    """Closed-form NTILE(buckets) of a 1-based global rank over ``n``
    rows: buckets 1..rem hold q+1 rows, the rest hold q.  Ceil-division
    stays in INTEGER arithmetic ((x + d - 1) DIV d) — F.ceil over a
    double quotient misassigns boundary ranks once n is large enough
    for the division to pick up float error (observed at sf0.01:
    30085/6017 → 5.0000000000000009 → a phantom 11th bucket)."""
    q, rem = divmod(n, buckets)
    big = rem * (q + 1)  # ranks <= big land in the (q+1)-sized buckets
    if q == 0:
        return F.col(rank_col)
    return F.when(
        F.col(rank_col) <= F.lit(big),
        F.expr(f"({rank_col} + {q}) DIV {q + 1}")
    ).otherwise(
        F.expr(f"{rem} + ({rank_col} - {big} + {q - 1}) DIV {q}"))
