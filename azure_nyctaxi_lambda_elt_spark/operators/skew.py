"""Skew mitigation: salted two-phase aggregation and salted joins.

The engine's first line of defense is AQE skew-join splitting
(session.py turns it on); these helpers cover the cases AQE can't fix:
- a groupBy where one key holds a disproportionate share of rows
  (two-phase salted agg spreads the hot key over N reducers);
- a shuffle join against a side too big to broadcast where a handful of
  keys dominate (replicate-small-side salted join).

Both are deterministic: the salt is a hash of a caller-chosen spread
column, never a random number — reruns produce identical partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, spread_col: str | Column, n_salts: int) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a
    high-cardinality spread column (e.g. the row's unique id)."""
    c = F.col(spread_col) if isinstance(spread_col, str) else spread_col
    return df.withColumn(SALT_COL, F.pmod(F.hash(c), F.lit(n_salts)))


def salted_sum_count(df: DataFrame, keys: Sequence[str],
                     agg_cols: Sequence[str], spread_col: str,
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe sum+count: partial agg on (keys, salt) —
    spreading a hot key across n_salts reducers — then final combine on
    keys alone (tiny input: ≤ n_salts rows per key).

    Output: keys + sum_<col> per agg col + row_count."""
    salted = with_salt(df, spread_col, n_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[F.sum(c).alias(f"__ps_{c}") for c in agg_cols],
        F.count("*").alias("__pc"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in agg_cols],
        F.sum("__pc").cast("bigint").alias("row_count"),
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                spread_col: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically and
    replicate the small side n_salts× so every (key, salt) bucket finds
    its match. Shuffle volume: big side unchanged, small side ×n_salts —
    the classic trade when the small side is modest but not
    broadcastable."""
    salted_big = with_salt(big, spread_col, n_salts)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_big.join(replicated, [key, SALT_COL], how)
    return out.drop(SALT_COL)
