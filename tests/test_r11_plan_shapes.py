"""Plan-shape pins for the round-11 operators: the delete/update
discovery scan must push its predicate into the parquet scan
(PushedFilters non-empty THROUGH the __dir tagging projection — a
coalesce(pred, false) wrapper is opaque to pushdown and forces
full-file decodes), and the bare-WHERE form must keep the exact
NULL-predicate semantics the coalesce form had."""

from __future__ import annotations

import contextlib
import io
import shutil

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators import txnlog


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def _discovery(spark, path, predicate):
    """The exact frame delete_where/update_where discover over:
    predicate below the (nondeterministic) __dir tag."""
    man = txnlog._read_manifest(path, txnlog.latest_version(path))
    return (txnlog._read_dirs(spark, path, man["dirs"], man)
            .where(F.expr(predicate))
            .withColumn("__dir", txnlog._dir_col_decoded()))


def test_discovery_predicate_reaches_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.0).alias("v"))
    txnlog.commit(df, path, "overwrite", stats_cols=["id"])
    plan = _explain(_discovery(spark, path, "id >= 900 AND k = 3"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no FileScan in the discovery plan"
    # both conjuncts reach the scan
    assert "GreaterThanOrEqual(id,900)" in pushed[0]
    assert "EqualTo(k,3)" in pushed[0]


def test_filter_above_dir_tag_would_block_pushdown(spark, tmp_path):
    """The hazard the filter-first order avoids, pinned so a future
    refactor back to tag-then-filter fails loudly: the __dir tag
    expressions are nondeterministic, and Catalyst refuses to push
    any predicate through a projection containing one."""
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 1.0).alias("v"))
    txnlog.commit(df, path, "overwrite")
    man = txnlog._read_manifest(path, 0)
    tagged_first = (txnlog._read_dirs(spark, path, man["dirs"], man)
                    .withColumn("__dir", txnlog._dir_col_decoded())
                    .where(F.expr("id >= 90")))
    plan = _explain(tagged_first)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThanOrEqual" not in pushed[0]


def test_bare_where_null_semantics_identical(spark, tmp_path):
    """WHERE pred and WHERE coalesce(pred, false) select the same
    rows — predicate-NULL rows match neither — so the pushdown form
    changes no delete/update result."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, g string")
    txnlog.commit(df, path, "overwrite")
    v = txnlog.delete_where(spark, path, "g = 'a'")
    got = {r["id"] for r in txnlog.snapshot(spark, path).collect()}
    assert got == {2, 3}  # NULL-g row survives
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["rows_deleted"] == 1
