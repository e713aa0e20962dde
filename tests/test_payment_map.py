"""ref.payment_type_map as a maintained table (01_payment_type_map.sql):
the broadcast-join lookup must reproduce the CASE literal, a mapping
change must be a ROW update (no code edit), and the validity windows
must drive the point-in-time (AS OF) resolution."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE

from azure_nyctaxi_lambda_elt_spark.functions.columns import canonical_map
from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf


@pytest.fixture(scope="module")
def typed(request):
    spark = request.getfixturevalue("spark")
    return tf.typed_trips(tf.raw_trips(spark, SF_SMOKE)).persist()


def test_active_src_codes_unique(spark):
    """The left join is row-preserving only if active src codes are
    unique — the invariant the reference enforces via its insert's
    NOT-EXISTS guard."""
    pm = tf.payment_map_ref(spark).where("is_active")
    n = pm.count()
    assert pm.select("payment_type_src").distinct().count() == n


def test_join_map_equals_case_literal(spark, typed):
    """The broadcast-join path (explicit payment_map frame) and the
    compiled-CASE default resolve identically — the equivalence that
    lets clean_slice skip the per-query broadcast job for the seed."""
    via_join = tf.clean_slice(typed,
                              payment_map=tf.payment_map_ref(spark))
    good, _ = tf.split_trips(typed)
    via_case = good.select(
        "trip_uid",
        canonical_map("payment_src", tf.PAYMENT_MAP).alias("payment_type"))
    diff = (
        via_join.select("trip_uid", "payment_type")
        .exceptAll(via_case)
        .unionAll(via_case.exceptAll(
            via_join.select("trip_uid", "payment_type")))
    )
    assert diff.count() == 0


def test_map_update_is_a_row_change(spark, typed):
    """Retiring '2'->'CASH' and mapping '2'->'CASH_APP' instead must
    flow through clean_slice with NO code change — only seed rows."""
    updated = [
        row if row[0] != "2" else ("2", "CASH", False,
                                   "1970-01-01 00:00:00",
                                   "2024-02-01 00:00:00")
        for row in tf.PAYMENT_MAP_SEED
    ] + [("2", "CASH_APP", True, "2024-02-01 00:00:00", None)]
    out = tf.clean_slice(typed, payment_map=tf.payment_map_ref(
        spark, updated))
    got = {r[0] for r in out.select("payment_type").distinct().collect()}
    assert "CASH_APP" in got and "CASH" not in got
    # untouched codes keep their mapping
    assert {"CARD", "NO_CHARGE", "DISPUTE"} <= got


def test_as_of_resolution_splits_on_validity_boundary(spark, typed):
    """'1' resolves to CREDIT before 2024-01-16 and CARD after —
    the inactive predecessor row is reachable through the AS-OF join,
    never through the active-only current-state lookup."""
    good, _ = tf.split_trips(typed)
    pm = F.broadcast(tf.payment_map_ref(spark))
    j = good.where(F.col("payment_src") == "1").join(
        pm,
        (good["payment_src"] == pm["payment_type_src"])
        & (pm["valid_from_utc"] <= good["pickup_ts"])
        & (pm["valid_to_utc"].isNull()
           | (good["pickup_ts"] < pm["valid_to_utc"])),
        "left")
    per_half = {
        (r["h"], r["payment_type_std"]): r["n"]
        for r in j.groupBy(
            (F.dayofmonth("pickup_ts") >= 16).alias("h"),
            "payment_type_std").agg(F.count("*").alias("n")).collect()
    }
    assert all(std == "CREDIT" for (h, std) in per_half if not h)
    assert all(std == "CARD" for (h, std) in per_half if h)
    assert per_half  # non-empty on both sides of the boundary
    assert {h for (h, _) in per_half} == {True, False}
