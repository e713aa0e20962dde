"""Replica of the driver's t2 gate: every QUERIES entry vs its ORACLES
SQL in DuckDB — row count, column names, and order-insensitive exact
value compare.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from conftest import SF_ORACLE


def _norm_cell(v):
    if v is None:
        return ("∅",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    return (type(v).__name__, str(v))


def _norm_rows(rows, col_names):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _query_names():
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_parity(name, spark, duck):
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_ORACLE)
    s_cols = sdf.columns
    s_rows = sdf.collect()

    if name not in ORACLES:
        assert len(s_rows) >= 0  # rows-only check
        return

    rel = duck.sql(ORACLES[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    sn = _norm_rows([tuple(r) for r in s_rows], s_cols)
    dn = _norm_rows(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
