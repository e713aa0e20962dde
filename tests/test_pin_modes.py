"""session.pin — the one seam choosing localCheckpoint vs reliable
checkpoint.

At local[n] scale pin() is localCheckpoint; at 1000-executor scale the
same plans run with ``spark.graft.checkpoint.mode=reliable`` +
``spark.checkpoint.dir`` and survive executor loss.  These tests run a
representative ranks.py plan (the repartitionByRange boundary pin — the
lineage-hazard site) under BOTH modes and assert identical results, so
the swap is executed code, not a docstring promise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_nyctaxi_lambda_elt_spark.operators.ranks import with_global_rank
from azure_nyctaxi_lambda_elt_spark.session import CHECKPOINT_MODE_CONF, pin


@pytest.fixture
def restore_mode(spark):
    yield
    spark.conf.set(CHECKPOINT_MODE_CONF, "local")


def _ranked(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 977).alias("v"),
        F.col("id").alias("k"))
    out, totals = with_global_rank(df, [F.asc("v"), F.asc("k")],
                                   value_col="v")
    rows = out.select("k", "__r", "__cum").orderBy("k").collect()
    return [tuple(r) for r in rows], totals


def test_reliable_mode_matches_local(spark, tmp_path, restore_mode):
    spark.conf.set(CHECKPOINT_MODE_CONF, "local")
    local_rows, local_totals = _ranked(spark)

    spark.conf.set(CHECKPOINT_MODE_CONF, "reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    reliable_rows, reliable_totals = _ranked(spark)

    assert local_rows == reliable_rows
    assert local_totals == reliable_totals


def test_reliable_mode_without_dir_raises(spark, restore_mode):
    # a fresh context has no checkpoint dir only before any test set
    # one; emulate by checking the conf-fallback error path directly
    spark.conf.set(CHECKPOINT_MODE_CONF, "reliable")
    df = spark.range(3)
    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="spark.checkpoint.dir"):
            pin(df)
    else:  # dir already set by an earlier test in the session
        assert pin(df).count() == 3


def test_default_mode_is_local(spark):
    # no conf set → localCheckpoint path; just exercises it end-to-end
    assert pin(spark.range(10)).count() == 10
