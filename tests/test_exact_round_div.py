"""exact_round_div: the portable round-half-up quotient used by the
ratio metrics (pricing_summary avgs, promo_revenue_ratio, market_share,
moving_avg_7d, mom_pct_change).

Property: for exact decimal operands, BOTH dialect spellings equal the
rational round-half-away-from-zero computed with Python Fractions —
i.e. the fragment cannot hit the engine round(double, n) knife-edge
class (Spark HALF_UP on the binary expansion vs DuckDB's *1e6-first).
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb

from azure_nyctaxi_lambda_elt_spark.functions.columns import exact_round_div


def _want(fr: Fraction, scale: int) -> float:
    q = fr * 10 ** scale
    n, d = q.numerator, q.denominator
    m = (2 * n + d) // (2 * d) if n >= 0 else -((2 * (-n) + d) // (2 * d))
    return m / 10 ** scale


def _cases(n: int, seed: int):
    rng = random.Random(seed)
    for _ in range(n):
        ka, kb = rng.randint(0, 6), rng.randint(0, 6)
        na = rng.randint(-10 ** 12, 10 ** 12)
        nb = rng.randint(1, 10 ** 12)
        scale = rng.choice([2, 6])
        mult = rng.choice([1, 100])
        yield na, ka, nb, kb, scale, mult


def _frag(na, ka, nb, kb, scale, mult, dialect):
    num = f"CAST('{na}e-{ka}' AS DECIMAL(27,6))"
    den = f"CAST('{nb}e-{kb}' AS DECIMAL(27,6))"
    return exact_round_div(num, den, scale, mult=mult,
                           signed=na < 0, dialect=dialect)


def test_duckdb_matches_fractions():
    con = duckdb.connect()
    for na, ka, nb, kb, scale, mult in _cases(500, 11):
        got = con.sql(
            "SELECT " + _frag(na, ka, nb, kb, scale, mult, "duckdb")
        ).fetchone()[0]
        want = _want(Fraction(mult) * Fraction(na, 10 ** ka)
                     / Fraction(nb, 10 ** kb), scale)
        assert got == want, (na, ka, nb, kb, scale, mult)


def test_spark_matches_fractions(spark):
    cases = list(_cases(200, 13))
    exprs, wants = [], []
    for i, (na, ka, nb, kb, scale, mult) in enumerate(cases):
        exprs.append(_frag(na, ka, nb, kb, scale, mult, "spark")
                     + f" AS c{i}")
        wants.append(_want(Fraction(mult) * Fraction(na, 10 ** ka)
                           / Fraction(nb, 10 ** kb), scale))
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    for i, want in enumerate(wants):
        assert row[i] == want, cases[i]


def test_null_propagates(spark):
    con = duckdb.connect()
    for dialect, runner in (
        ("spark", lambda q: spark.sql(q).collect()[0][0]),
        ("duckdb", lambda q: con.sql(q).fetchone()[0]),
    ):
        frag = exact_round_div("CAST(NULL AS DECIMAL(27,6))", "1",
                               6, signed=True, dialect=dialect)
        assert runner(f"SELECT {frag}") is None
