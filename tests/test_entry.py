"""Smoke test of the driver contract surface."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "trip_id" in df.columns
    # sha-256 hex key
    assert all(len(r["trip_id"]) == 64 for r in rows[:20])


def test_queries_and_oracles_aligned():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), "oracle for a query that doesn't exist"
    assert len(q) >= 20
