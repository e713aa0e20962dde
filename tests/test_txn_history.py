"""DESCRIBE HISTORY analog (operators/txnlog.py history()):
newest-first per-version rows from manifest metadata alone —
operation labels from the op descriptors, exact DV-aware row
counts, limit, and the empty-table refusal."""

from __future__ import annotations

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def test_history_labels_counts_and_order(spark, tmp_path):
    path = str(tmp_path / "t")
    kw = dict(stats_cols=["id"])
    txnlog.commit(_df(spark, [(i, i) for i in range(1, 6)]),
                  path, "overwrite", **kw)                       # v0
    txnlog.commit(_df(spark, [(6, 6)]), path, "append", **kw)    # v1
    txnlog.merge_upsert(spark, path, _df(spark, [(2, 22)]),
                        ["id"])                                  # v2
    txnlog.delete_keys(spark, path,
                       spark.createDataFrame([(3,)], "id long"),
                       ["id"])                                   # v3
    txnlog.compact(spark, path)                                  # v4
    h = txnlog.history(spark, path).collect()
    assert [r["version"] for r in h] == [4, 3, 2, 1, 0]
    assert [r["operation"] for r in h] == [
        "maintenance", "delete", "merge", "append", "overwrite"]
    assert [r["rows_visible"] for r in h] == [5, 5, 6, 6, 5]
    assert [r["dv_stores"] for r in h] == [0, 1, 0, 0, 0]
    assert all(r["group_id"] is None for r in h)
    # commit times are monotone as displayed (running wall clock)
    ts = [r["committed_at"] for r in h]
    assert ts == sorted(ts, reverse=True)


def test_history_limit_and_empty_table(spark, tmp_path):
    path = str(tmp_path / "t")
    txnlog.commit(_df(spark, [(1, 1)]), path, "overwrite")
    txnlog.commit(_df(spark, [(2, 2)]), path, "append")
    top = txnlog.history(spark, path, limit=1).collect()
    assert len(top) == 1 and top[0]["version"] == 1
    with pytest.raises(FileNotFoundError):
        txnlog.history(spark, str(tmp_path / "missing"))
