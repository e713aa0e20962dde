"""Pure Column-expression building blocks.

Every function here returns a Catalyst ``Column`` built from
``pyspark.sql.functions`` primitives — JVM-side, codegen-friendly, no
Python UDFs — so they stay inside WholeStageCodegen on the 100 TB path.

Reference parity is cited per function (file:line in /root/reference).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

MILES_TO_KM = 1.609344


def norm_str(col: Column | str) -> Column:
    """UPPER(NULLIF(LTRIM(RTRIM(x)), '')) — the reference's string
    normalization idiom (sql/batchELT/core/11_trip_clean.slice_ctas.sql:17).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.upper(F.trim(c)), F.lit(""))


def canonical_map(col: Column | str, mapping: Mapping[str, str],
                  default: Column | None = None) -> Column:
    """CASE-based canonicalization with an optional fallback, mirroring
    ref.payment_type_map + the inline CASE fallback
    (sql/batchELT/core/11_trip_clean.slice_ctas.sql:28-35).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for src, std in mapping.items():
        cond = c == F.lit(src)
        expr = F.when(cond, F.lit(std)) if expr is None else expr.when(cond, F.lit(std))
    if expr is None:
        return default if default is not None else F.lit(None).cast("string")
    return expr.otherwise(default) if default is not None else expr


def miles_to_km(col: Column | str, scale: int = 3) -> Column:
    """ROUND(x * 1.609344, 3) (slice_ctas.sql:23-26)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * F.lit(MILES_TO_KM), scale)


def is_night_hour(ts: Column | str) -> Column:
    """1 if pickup hour in 22-23 or 0-5 (slice_ctas.sql:37-42)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    h = F.hour(c)
    return F.when(c.isNotNull() & ((h >= 22) | (h <= 5)), F.lit(1)).otherwise(F.lit(0))


def date_key(ts: Column | str) -> Column:
    """YYYYMMDD int key (mdl/load/40_fact_trip.load.sql:91)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def time_key(ts: Column | str) -> Column:
    """Seconds-of-day int key 0..86399 (40_fact_trip.load.sql:92-94)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)).cast("int")


def hour_bucket(hh: Column | str) -> Column:
    """'22:00-22:59' style label (mdl/dim_time.table.sql:8)."""
    c = F.col(hh) if isinstance(hh, str) else hh
    h2 = F.lpad(c.cast("string"), 2, "0")
    return F.concat(h2, F.lit(":00-"), h2, F.lit(":59"))


def safe_ratio(num: Column | str, den: Column | str, scale: int = 6) -> Column:
    """num/den with NULL when den<=0 — tip_pct / fare_per_km idiom
    (mdl/views/vw_fact_trip_bi.view.sql:33-38)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.when(d > 0, F.round(n.cast("double") / d.cast("double"), scale))


def exact_round_div(num: str, den: str, scale: int = 6, *,
                    mult: int = 1, signed: bool = False,
                    dialect: str = "spark") -> str:
    """SQL fragment: ``round-half-up(mult * num / den, scale)`` as DOUBLE
    via exact integer arithmetic — the portable form of the reference's
    ratio metrics (vw_fact_trip_bi.view.sql:33-38 computes them in T-SQL
    decimal; engines' ``round(double, n)`` disagree on knife-edge
    quotients, e.g. 266.9078125 at sf0.1).

    ``num``/``den`` must be SQL fragments of EXACT decimal values with
    scale <= 6 and |value| < 10^21 (they are cast through DECIMAL(27,6)
    so the *1e6 shift stays exact under Spark's precision-38 cap);
    ``den`` must be > 0.  The QUOTIENT must satisfy
    |mult * num / den| < ~9.2e12 at scale 6: Spark's ``DIV`` returns
    BIGINT and silently NULLs above 2^63 where DuckDB's HUGEINT ``//``
    stays exact, so a larger quotient diverges between the dialects
    (every call site is a ratio/average/share, orders of magnitude
    inside the bound).  For non-negative a and b > 0,
    round-half-up(a/b) at 10^-s = (2*a*10^s + b) DIV (2*b) on integers;
    ``signed=True`` mirrors through CASE for half-away-from-zero on
    negative numerators (NULLs propagate).  ``dialect`` picks Spark
    (``DIV`` on DECIMAL(38,0)) or DuckDB (``//`` on HUGEINT) spellings;
    both evaluate the identical rational, so oracle hashes cannot
    diverge on representation.  At 100 TB this is still one scalar
    expression per row/group — no extra shuffle, stays in codegen.

    MULTIPLE-EVALUATION HAZARD: ``num`` and ``den`` are interpolated
    verbatim SEVERAL times (num/den twice each in the positive
    branch, roughly doubled again under ``signed=True``), so pass
    COLUMN ALIASES, never expensive or non-deterministic
    subexpressions — a rand()/scan-derived fragment would evaluate
    differently per occurrence and corrupt the quotient (every
    current call site passes aliases).  The ``den > 0`` precondition
    is likewise the CALLER's: a negative denominator silently flips
    the rounding direction rather than failing (all call sites are
    count/sum-of-positive denominators; guard with CASE WHEN at the
    call site if a signed denominator can ever occur).
    """
    if dialect == "spark":
        big, div = "DECIMAL(38,0)", "DIV"
    elif dialect == "duckdb":
        big, div = "HUGEINT", "//"
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect {dialect!r}")
    f = 2 * mult * 10 ** scale
    nu = f"CAST(CAST(({num}) AS DECIMAL(27,6)) * 1000000 AS {big})"
    du = f"CAST(CAST(({den}) AS DECIMAL(27,6)) * 1000000 AS {big})"
    pos = f"(({nu}) * {f} + ({du})) {div} (({du}) * 2)"
    if signed:
        neg = f"-(((-({nu})) * {f} + ({du})) {div} (({du}) * 2))"
        core = f"(CASE WHEN ({nu}) < 0 THEN {neg} ELSE {pos} END)"
    else:
        core = f"({pos})"
    return f"(CAST({core} AS DOUBLE) / {10 ** scale}.0)"


def ts_iso(ts: Column | str) -> Column:
    """ISO-8601 text with microseconds — the CONVERT(...,126) analog used
    inside the SHA-256 business key (40_fact_trip.load.sql:85-86).
    Microsecond precision keeps the key deterministic for parquet
    microsecond timestamps.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def sha256_key(*parts: Column, sep: str = "|") -> Column:
    """Deterministic SHA-256 hex business key over NULL-safe parts
    (40_fact_trip.load.sql:82-90). NULL parts become '' exactly like the
    reference's COALESCE(...,'').
    """
    safe = [F.coalesce(p.cast("string"), F.lit("")) for p in parts]
    return F.sha2(F.concat_ws(sep, *safe), 256)
