"""Cleaning / staging operators: typed coercion and good/bad routing.

Reference parity:
- typed_cast      ≈ stg.trip TRY_CAST staging shape
  (sql/batchELT/staging/stg_trip.sql) — Spark's ``try_cast`` has the
  same NULL-on-failure semantics as T-SQL TRY_CAST.
- split_good_bad  ≈ the ASA curated/DLQ router (infra/scripts/asa-wire.sh
  enriched CTE + sinks 1/2) and err.trip capture
  (sql/batchELT/err/21_err_trip.capture.sql): rows failing any rule go
  to the bad side with a FIRST-matching reason; rows passing all rules
  are the curated set.

Scale notes: both operators are pure narrow projections/filters — no
shuffle, fully pushdown-friendly. ``split_good_bad`` evaluates the rule
predicates once per row inside codegen; at 100 TB the two outputs are
written in one pass each (or one pass total with a persisted flag
column when both sinks are materialized together).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def typed_cast(df: DataFrame, schema_map: Mapping[str, str]) -> DataFrame:
    """TRY_CAST each named column to the target type (NULL on failure),
    leaving other columns untouched.
    """
    cols = []
    for name in df.columns:
        if name in schema_map:
            cols.append(
                F.col(name).try_cast(schema_map[name]).alias(name)
            )
        else:
            cols.append(F.col(name))
    return df.select(*cols)


@dataclass(frozen=True)
class Rule:
    """One DQ rule: rows where ``predicate`` is TRUE are REJECTED with
    ``reason`` (first matching rule wins, like the reference's CASE)."""

    reason: str
    predicate: Column


def split_good_bad(
    df: DataFrame, rules: Sequence[Rule], reason_col: str = "reject_reason"
) -> tuple[DataFrame, DataFrame]:
    """Route rows into (good, bad). A row is bad when ANY rule predicate
    is TRUE (NULL-safe: NULL predicate = not rejected by that rule,
    matching T-SQL WHERE semantics in err/21_err_trip.capture.sql).
    Bad rows carry the first matching rule's reason.
    """
    if not rules:
        return df, df.limit(0).withColumn(reason_col, F.lit(None).cast("string"))

    reason_expr: Column | None = None
    any_bad: Column | None = None
    for rule in rules:
        fires = F.coalesce(rule.predicate, F.lit(False))
        reason_expr = (
            F.when(fires, F.lit(rule.reason))
            if reason_expr is None
            else reason_expr.when(fires, F.lit(rule.reason))
        )
        any_bad = fires if any_bad is None else (any_bad | fires)

    flagged = df.withColumn(reason_col, reason_expr)
    good = flagged.where(~any_bad).drop(reason_col)
    bad = flagged.where(any_bad)
    return good, bad
