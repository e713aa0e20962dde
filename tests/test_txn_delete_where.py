"""Predicate-level DELETE (operators/txnlog.py delete_where —
``DELETE FROM t WHERE <pred>``): lane selection (DV vs copy-on-write
vs no-op), the key-collision safety probe, SQL NULL semantics,
metadata_count exactness, the DV_MAX_KEYS threshold both ways, and
the WriteSerializable read_version contract."""

from __future__ import annotations

import os

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog
from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
    ConcurrentModification)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _seed(spark, path):
    """Two commits: ids 1-10 (grp a/b alternating), ids 11-20 (grp
    c, plus two NULL-grp rows 19/20)."""
    txnlog.commit(
        _df(spark, [(i, "a" if i % 2 else "b", i * 1.0)
                    for i in range(1, 11)]),
        path, "overwrite", stats_cols=["id"])
    txnlog.commit(
        _df(spark, [(i, None if i >= 19 else "c", i * 1.0)
                    for i in range(11, 21)]),
        path, "append", stats_cols=["id"])
    return txnlog.latest_version(path)


def _ids(spark, path, version=None):
    return {r["id"] for r in
            txnlog.snapshot(spark, path, version).collect()}


def test_dv_lane_small_keyed_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    v = txnlog.delete_where(spark, path, "id % 5 = 0 AND id <= 10",
                            key_cols=["id"])
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "dv"
    # no data dir written: the manifest lists exactly the parent dirs
    assert man["dirs"] == txnlog._read_manifest(path, v - 1)["dirs"]
    assert len(man["dv"]) == 1
    assert _ids(spark, path) == set(range(1, 21)) - {5, 10}
    # exact metadata count through the DV subtraction
    assert txnlog.metadata_count(path) == 18
    # prior version still time-travels whole
    assert _ids(spark, path, v - 1) == set(range(1, 21))


def test_key_collision_forces_rewrite(spark, tmp_path):
    """The safety probe: tombstoning grp='a' keys for a predicate
    that matches only SOME grp='a' rows would kill non-matching rows
    sharing the key — delete_where must detect it and take the
    copy-on-write lane instead."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    v = txnlog.delete_where(spark, path, "grp = 'a' AND v < 4.0",
                            key_cols=["grp"])
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "rewrite"
    assert not man.get("dv")
    # exactly the matched rows died: ids 1, 3 (grp a, v<4)
    assert _ids(spark, path) == set(range(1, 21)) - {1, 3}


def test_rewrite_lane_unkeyed_touches_only_affected_dirs(
        spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    pdirs = txnlog._read_manifest(path, 1)["dirs"]
    v = txnlog.delete_where(spark, path, "grp = 'c'")
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "rewrite"
    # dir 0 (ids 1-10) had no grp='c' rows: carried byte-identical
    assert pdirs[0] in man["dirs"]
    assert pdirs[1] not in man["dirs"]
    # NULL-grp rows (19, 20) SURVIVE: predicate NULL keeps the row
    assert _ids(spark, path) == (set(range(1, 11)) | {19, 20})
    assert txnlog.metadata_count(path) == 12


def test_null_semantics_explicit_is_null(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    txnlog.delete_where(spark, path, "grp IS NULL")
    assert _ids(spark, path) == set(range(1, 19))


def test_zero_match_commits_noop_version(spark, tmp_path):
    path = str(tmp_path / "t")
    parent = _seed(spark, path)
    v = txnlog.delete_where(spark, path, "id > 999",
                            key_cols=["id"])
    assert v == parent + 1
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "noop"
    assert man["dirs"] == txnlog._read_manifest(path, parent)["dirs"]
    assert _ids(spark, path) == set(range(1, 21))


def test_dv_cap_threshold_both_ways(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _seed(spark, path)
    monkeypatch.setattr(txnlog, "DV_MAX_KEYS", 3)
    # 4 matched keys > cap ⇒ rewrite even with key identity
    v = txnlog.delete_where(spark, path, "id <= 4", key_cols=["id"])
    assert txnlog._read_manifest(path, v)["meta"]["lane"] == "rewrite"
    # 3 matched keys <= cap ⇒ DV
    v2 = txnlog.delete_where(spark, path, "id IN (5, 6, 7)",
                             key_cols=["id"])
    assert txnlog._read_manifest(path, v2)["meta"]["lane"] == "dv"
    assert _ids(spark, path) == set(range(8, 21))


def test_delete_where_after_dv_does_not_resurrect(spark, tmp_path):
    """Copy-on-write rewrite over a dir with live tombstones must
    apply them first — a rewrite that reads raw files would
    resurrect the tombstoned rows."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    txnlog.delete_where(spark, path, "id = 2", key_cols=["id"])
    v = txnlog.delete_where(spark, path, "grp = 'b'")
    assert txnlog._read_manifest(path, v)["meta"]["lane"] == "rewrite"
    # id=2 (grp b, tombstoned earlier) stays gone; other b's die now
    assert _ids(spark, path) == ({1, 3, 5, 7, 9}
                                 | set(range(11, 21)))


def test_read_version_conflict_matrix(spark, tmp_path):
    path = str(tmp_path / "t")
    rv = _seed(spark, path)  # rv = 1 (two commits: 0, 1)
    # interleaved disjoint keyed delete rebases fine
    txnlog.delete_keys(spark, path,
                       spark.createDataFrame([(20,)], "id long"),
                       ["id"])
    v = txnlog.delete_where(spark, path, "id = 1", key_cols=["id"],
                            read_version=rv)
    assert v == rv + 2
    # interleaved OVERLAPPING merge refuses
    txnlog.merge_upsert(
        spark, path, _df(spark, [(2, "a", 2.5)]), ["id"])
    with pytest.raises(ConcurrentModification):
        txnlog.delete_where(spark, path, "id = 2", key_cols=["id"],
                            read_version=rv)
    # un-keyed delete_where: ANY interleaved keyed write refuses
    # (no key identity to prove disjointness — the conservative side)
    with pytest.raises(ConcurrentModification):
        txnlog.delete_where(spark, path, "id = 9",
                            read_version=rv)


def test_undeclared_unkeyed_delete_blocks_later_declared_writer(
        spark, tmp_path):
    """The op record of an un-keyed delete_where must read as
    undecidable to LATER declared-snapshot writers."""
    path = str(tmp_path / "t")
    rv = _seed(spark, path)
    txnlog.delete_where(spark, path, "v > 15.0")
    with pytest.raises(ConcurrentModification):
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(1, "a", 1.5)]), ["id"],
                            read_version=rv)


def test_partitioned_table_rewrite_keeps_leaf_invariant(
        spark, tmp_path):
    """On a partitioned table the copy-on-write dir splits per
    partition value like every other commit (dir-per-value is an
    invariant through DELETE, same as MERGE)."""
    path = str(tmp_path / "t")
    df = _df(spark, [(i, "g" + str(i % 3), float(i))
                     for i in range(1, 31)])
    txnlog.commit(df, path, "overwrite", partition_by=["grp"])
    v = txnlog.delete_where(spark, path, "grp = 'g1' AND id < 10")
    man = txnlog._read_manifest(path, v)
    assert man["meta"]["lane"] == "rewrite"
    # every manifest dir is a partition leaf of some claimed dir
    assert all("__p_grp=" in d for d in man["dirs"])
    got = {r["id"] for r in txnlog.snapshot(spark, path).collect()}
    assert got == set(range(1, 31)) - {1, 4, 7}


def test_prune_hint_narrows_discovery(spark, tmp_path):
    """A prune hint consistent with the predicate must not change
    the result (it only narrows which dirs the discovery scan
    opens)."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    v = txnlog.delete_where(spark, path, "id >= 18",
                            key_cols=["id"], prune=("id", 18, 20))
    assert txnlog._read_manifest(path, v)["meta"]["lane"] == "dv"
    # only the second dir's rows could match; result exact
    assert _ids(spark, path) == set(range(1, 18))


def test_shallow_clone_refused(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _seed(spark, src)
    txnlog.shallow_clone(src, dst)
    with pytest.raises(ValueError, match="external dirs"):
        txnlog.delete_where(spark, dst, "id = 1", key_cols=["id"])


def test_auto_prune_range_extraction():
    """The conservative predicate→range parser behind automatic
    discovery pruning: AND-ed simple comparisons contribute, any
    OR/NOT/paren/IS NULL bails entirely, unparseable conjuncts are
    ignored (widening — the safe side)."""
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _ranges_from_predicate as rp)

    assert rp("id >= 5 AND id < 9") == [("id", 5, None),
                                        ("id", None, 9)]
    assert rp("d = '2024-01-05'") == [("d", "2024-01-05",
                                       "2024-01-05")]
    assert rp("id BETWEEN 3 AND 7") == [("id", 3, 7)]
    assert rp("5 <= id") == [("id", 5, None)]
    assert rp("id >= 5 AND uid % 3 = 1") == [("id", 5, None)]
    # r11 widening: a pure-AND paren group flattens, and a function
    # conjunct is ignored (dropping a conjunct only widens)
    assert rp("id >= 5 AND weird_fn(x) = 1") == [("id", 5, None)]
    assert rp("(id >= 5)") == [("id", 5, None)]
    # bail cases: pruning on these would be unsound
    assert rp("id >= 5 OR grp = 'a'") == []
    assert rp("NOT (id >= 5)") == []
    assert rp("grp IS NULL") == []


def test_auto_prune_narrows_discovery_correctly(spark, tmp_path):
    """End to end: a range predicate on a stats column auto-prunes
    the discovery scan to the matching dirs (observable through the
    helper) and the delete result is exact."""
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _auto_prune_names)

    path = str(tmp_path / "t")
    _seed(spark, path)  # dir0: ids 1-10, dir1: ids 11-20, stats on id
    man = txnlog._read_manifest(path, 1)
    kept = _auto_prune_names(path, 1, man, "id >= 18 AND grp <> 'zzz'")
    # "grp <> 'zzz'" is ignored (unparseable conjunct), id >= 18
    # prunes dir0 via its [1, 10] envelope
    assert kept == [man["dirs"][1]]
    v = txnlog.delete_where(spark, path, "id >= 18",
                            key_cols=["id"])
    assert txnlog._read_manifest(path, v)["meta"]["lane"] == "dv"
    assert _ids(spark, path) == set(range(1, 18))


def test_auto_prune_widened_grammar():
    """r11 parser widening: IN lists contribute their literal
    envelope, IS NOT NULL conjuncts are neutral, pure-AND parens
    flatten, and string literals containing AND/OR/parens can never
    manufacture a false range (stashed before tokenizing)."""
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _ranges_from_predicate as rp)

    assert rp("id IN (7, 3, 5)") == [("id", 3, 7)]
    assert rp("d IN ('2024-02-01', '2024-01-05')") \
        == [("d", "2024-01-05", "2024-02-01")]
    assert rp("(id >= 5 AND k = 3)") == [("id", 5, None),
                                         ("k", 3, 3)]
    assert rp("grp IS NOT NULL AND id >= 18") == [("id", 18, None)]
    # a hostile literal must not become a range on another column
    assert rp("grp = 'x AND id = 3 AND'") \
        == [("grp", "x AND id = 3 AND", "x AND id = 3 AND")]
    assert rp("grp = 'a(b))' AND id > 4") \
        == [("grp", "a(b))", "a(b))"), ("id", 4, None)]
    # ORs hiding inside parens still bail after flattening
    assert rp("(id >= 5 OR k = 1) AND v > 2") == []
    assert rp("id IN (3, 'x')") == []  # mixed literal types


def test_auto_prune_timestamp_literal_domain():
    """r12 fix (ADVICE r11, high): SQL timestamp literals use a
    space separator while manifest envelopes store isoformat's 'T';
    since ' ' < 'T', a raw compare pruned dirs whose every row
    matched.  The parser normalizes the literal into the envelope
    domain, and prefix-related ISO bounds (date-only literal vs full
    timestamp envelope) are inconclusive — the dir stays open."""
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _env_provably_gt, _ranges_from_predicate as rp)

    # literals stay RAW in the parsed ranges — domain normalization
    # lives in the compare, which must prove in BOTH string domains
    assert rp("ts <= '2024-01-05 23:59:59'") \
        == [("ts", None, "2024-01-05 23:59:59")]
    # date-only literals pass through (the date-envelope domain)
    assert rp("d = '2024-01-05'") \
        == [("d", "2024-01-05", "2024-01-05")]
    # the r11-ADVICE bug: 'T'-form envelope min vs space-form
    # literal must NOT prove disjointness
    assert not _env_provably_gt("2024-01-05T00:00:00",
                                "2024-01-05 23:59:59")
    # ...while a STRING column whose envelopes are THEMSELVES
    # space-form keeps exact pruning (the r12 self-review catch:
    # normalizing only the literal side would flip the bug here)
    assert not _env_provably_gt("2024-01-05T01:00:00",
                                "2024-01-05 23:00:00")
    assert _env_provably_gt("2024-01-05 10:00:00",
                            "2024-01-05 09:00:00")
    # prefix relation (date-only vs full ISO): can't prove, keep
    assert not _env_provably_gt("2024-01-05T00:00:00", "2024-01-05")
    assert not _env_provably_gt("2024-01-05", "2024-01-05T00:00:00")
    # non-prefix ISO bounds compare exactly
    assert _env_provably_gt("2024-01-06T00:00:00",
                            "2024-01-05T23:59:59")
    assert not _env_provably_gt("2024-01-05T10:00:00",
                                "2024-01-05T23:59:59")
    # plain strings keep the exact total-order compare
    assert _env_provably_gt("applesauce", "apple")
    # mixed-form IN list: no single [lo, hi] covers both domains —
    # the clause bails to no pruning instead of a false envelope
    assert rp("ts IN ('2024-01-05 12:00:00', '2024-01-05T01:00:00')"
              " AND v > 2") == [("v", 2, None)]


def test_timestamp_column_delete_where_prunes_correctly(
        spark, tmp_path):
    """End to end on a TIMESTAMP stats column: the day-05 dir's
    envelope min is '2024-01-05T00:00:00' (isoformat); a space-form
    literal '<= 2024-01-05 23:59:59' must still open the dir and
    delete every day-05 row (pre-fix: the dir was silently pruned
    and the delete matched nothing)."""
    import datetime

    path = str(tmp_path / "tts")
    rows5 = [(i, datetime.datetime(2024, 1, 5, i, 0, 0))
             for i in range(0, 10)]
    rows6 = [(i + 100, datetime.datetime(2024, 1, 6, i, 0, 0))
             for i in range(0, 10)]
    mk = lambda r: spark.createDataFrame(r, "id long, ts timestamp")
    txnlog.commit(mk(rows5), path, "overwrite", stats_cols=["ts"])
    txnlog.commit(mk(rows6), path, "append", stats_cols=["ts"])
    man = txnlog._read_manifest(path, 1)
    # the envelope really is in the isoformat 'T' domain
    assert any(s["ts"][0] == "2024-01-05T00:00:00"
               for s in man["stats"].values())
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _auto_prune_names)

    kept = _auto_prune_names(
        path, 1, man, "ts <= '2024-01-05 23:59:59'")
    assert kept == [man["dirs"][0]]  # day-06 dir pruned, day-05 kept
    v = txnlog.delete_where(spark, path,
                            "ts <= '2024-01-05 23:59:59'")
    assert txnlog.snapshot(spark, path, v).count() == 10
    assert {r["id"] for r in
            txnlog.snapshot(spark, path, v).collect()} \
        == {i + 100 for i in range(10)}
    # date-only literal against the timestamp envelope: prefix is
    # inconclusive, so the day-05 dir (midnight row included) opens
    kept = _auto_prune_names(path, 1, man, "ts <= '2024-01-05'")
    assert man["dirs"][0] in kept


def test_explicit_prune_normalizes_bounds(spark, tmp_path):
    """r12: explicit prune_plan bounds go through the same
    envelope-domain normalization as the automatic parser —
    datetime objects via _json_safe, space-form timestamp strings
    via the literal normalization — and cross-type bounds keep the
    dir instead of raising."""
    import datetime

    path = str(tmp_path / "tts2")
    rows5 = [(i, datetime.datetime(2024, 1, 5, i, 0, 0))
             for i in range(0, 10)]
    rows6 = [(i + 100, datetime.datetime(2024, 1, 6, i, 0, 0))
             for i in range(0, 10)]
    mk = lambda r: spark.createDataFrame(r, "id long, ts timestamp")
    txnlog.commit(mk(rows5), path, "overwrite", stats_cols=["ts"])
    txnlog.commit(mk(rows6), path, "append", stats_cols=["ts"])
    man = txnlog._read_manifest(path, 1)
    # datetime bounds: normalized into the isoformat domain
    kept, _ = txnlog.prune_plan(path, 1, [
        ("ts", datetime.datetime(2024, 1, 5, 0, 0, 0),
         datetime.datetime(2024, 1, 5, 23, 59, 59))])
    assert kept == [man["dirs"][0]]
    # space-form string bounds: same normalization as the parser
    kept, _ = txnlog.prune_plan(path, 1, [
        ("ts", "2024-01-06 00:00:00", "2024-01-06 23:59:59")])
    assert kept == [man["dirs"][1]]
    # cross-type bound: inconclusive, every dir stays open
    kept, _ = txnlog.prune_plan(path, 1, [("ts", 0, 100)])
    assert kept == man["dirs"]


def test_point_set_prune_dual_domain(spark, tmp_path):
    """r12 self-review: prune_point_set must also be exact across
    the space/'T' separator split — a space-form probe against
    isoformat envelopes (timestamp column) and a 'T'-form probe
    against space-form envelopes (string column) both keep the dir
    that holds the value."""
    import datetime

    path = str(tmp_path / "tp")
    rows5 = [(i, datetime.datetime(2024, 1, 5, i, 0, 0))
             for i in range(0, 10)]
    rows6 = [(i + 100, datetime.datetime(2024, 1, 6, i, 0, 0))
             for i in range(0, 10)]
    mk = lambda r: spark.createDataFrame(r, "id long, ts timestamp")
    txnlog.commit(mk(rows5), path, "overwrite", stats_cols=["ts"])
    txnlog.commit(mk(rows6), path, "append", stats_cols=["ts"])
    man = txnlog._read_manifest(path, 1)
    # space-form probe vs 'T' envelopes: day-05 dir must be kept
    kept, _ = txnlog.prune_point_set(
        spark, path, "ts", ["2024-01-05 03:00:00"])
    assert man["dirs"][0] in kept
    assert man["dirs"][1] not in kept  # day-06 provably excluded
    # string column with space-form values: exact pruning preserved
    path2 = str(tmp_path / "ts2")
    mks = lambda r: spark.createDataFrame(r, "id long, s string")
    txnlog.commit(mks([(1, "2024-01-05 01:00:00"),
                       (2, "2024-01-05 09:00:00")]),
                  path2, "overwrite", stats_cols=["s"])
    txnlog.commit(mks([(3, "2024-01-05 10:00:00"),
                       (4, "2024-01-05 23:00:00")]),
                  path2, "append", stats_cols=["s"])
    man2 = txnlog._read_manifest(path2, 1)
    kept, _ = txnlog.prune_point_set(
        spark, path2, "s", ["2024-01-05 05:00:00"])
    assert kept == [man2["dirs"][0]]


def test_string_column_space_envelope_delete_where(spark, tmp_path):
    """r12 self-review: a STRING column whose values (and therefore
    envelopes) are space-form timestamps must still delete exactly —
    one-sided literal normalization would prune the matching dir."""
    path = str(tmp_path / "tss")
    mks = lambda r: spark.createDataFrame(r, "id long, s string")
    txnlog.commit(mks([(i, f"2024-01-05 {i:02d}:00:00")
                       for i in range(1, 24)]),
                  path, "overwrite", stats_cols=["s"])
    txnlog.commit(mks([(100 + i, f"2024-01-06 {i:02d}:00:00")
                       for i in range(1, 24)]),
                  path, "append", stats_cols=["s"])
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _auto_prune_names)

    man = txnlog._read_manifest(path, 1)
    kept = _auto_prune_names(path, 1, man,
                             "s >= '2024-01-05 01:00:00'")
    assert kept == man["dirs"]  # every dir has matching rows
    v = txnlog.delete_where(spark, path,
                            "s >= '2024-01-06 01:00:00'")
    assert txnlog.snapshot(spark, path, v).count() == 23
