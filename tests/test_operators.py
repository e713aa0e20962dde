"""Unit semantics for the core operators on tiny in-memory frames —
edge rows: nulls, negatives, dupes, empty strings (SURVEY §5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_split_good_bad_first_match_and_null_safety(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.clean import Rule, split_good_bad

    df = spark.createDataFrame(
        [(1, -5.0), (2, 5.0), (3, None), (4, -1.0)], ["id", "amt"]
    )
    rules = [
        Rule("NEG", F.col("amt") < 0),
        Rule("NULL_AMT", F.col("amt").isNull()),
    ]
    good, bad = split_good_bad(df, rules)
    assert {r["id"] for r in good.collect()} == {2}
    reasons = {r["id"]: r["reject_reason"] for r in bad.collect()}
    assert reasons == {1: "NEG", 3: "NULL_AMT", 4: "NEG"}


def test_latest_wins_deterministic(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.dedupe import latest_wins

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 2)
    df = spark.createDataFrame(
        [(1, t0, "a", 10.0), (1, t1, "b", 20.0), (2, t0, "a", 5.0),
         (1, t1, "a", 30.0)],
        ["k", "at", "src", "v"],
    )
    out = latest_wins(df, ["k"], [F.col("at").desc(), F.col("src").desc()])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 20.0, 2: 5.0}  # newest at, then src desc tiebreak


def test_merge_latest_update_beats_existing(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import merge_latest

    t = datetime.datetime(2024, 1, 1)
    existing = spark.createDataFrame([(1, t, 10.0), (2, t, 20.0)], ["k", "at", "v"])
    updates = spark.createDataFrame([(2, t, 99.0), (3, t, 30.0)], ["k", "at", "v"])
    out = merge_latest(existing, updates, ["k"], [F.col("at").desc()])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}


def test_build_dim_unknown_member_and_dense_keys(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.dims import build_dim

    df = spark.createDataFrame(
        [("B",), ("A",), (None,), ("B",)], ["nk"]
    )
    dim = build_dim(df, ["nk"], "k", unknown_nk="UNKNOWN")
    got = {r["nk"]: r["k"] for r in dim.collect()}
    assert got == {"A": 1, "B": 2, "UNKNOWN": -1}


def test_check_counts_single_pass_and_statuses(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.dq import (
        DQGateError,
        check_counts,
        dq_gate,
    )

    df = spark.createDataFrame([(1, -2.0), (2, 3.0)], ["id", "amt"])
    res = check_counts(
        df,
        {"neg_amt": F.col("amt") < 0, "null_id": F.col("id").isNull()},
        fail_checks=["neg_amt"],
    )
    rows = {r["check_name"]: (r["cnt"], r["status"]) for r in res.collect()}
    assert rows["neg_amt"] == (1, "FAILED")
    assert rows["null_id"] == (0, "PASSED")
    with pytest.raises(DQGateError):
        dq_gate(res)


def test_write_partition_overwrite_is_idempotent(spark, tmp_path):
    from azure_nyctaxi_lambda_elt_spark.operators.upsert import (
        write_partition_overwrite,
    )

    path = str(tmp_path / "t")
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], ["v", "p"])
    write_partition_overwrite(d1, path, ["p"])
    # rewrite partition 'a' only; 'b' must remain
    d2 = spark.createDataFrame([(10, "a")], ["v", "p"])
    write_partition_overwrite(d2, path, ["p"])
    got = {(r["v"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert got == {(10, "a"), (2, "b")}
