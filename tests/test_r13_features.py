"""Round-13 feature pins: manifest-recorded per-dir {n_files,
n_bytes} serving DESCRIBE DETAIL from metadata, conditional MERGE
(merge_upsert_when + the WHEN MATCHED SQL grammar), the reclaimed-
path VACUUM payload through txn_sql, maxBytesPerTrigger admission,
the quote-scanner escape upgrade, and the tz-suffixed-literal
envelope-compare guard."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from azure_nyctaxi_lambda_elt_spark.operators import txnlog, txnsql


def _df(spark, rows, schema="id long, name string, amt double"):
    return spark.createDataFrame(rows, schema)


def _seed(spark, path, n=10):
    txnlog.commit(_df(spark, [(i, f"n{i}", float(i))
                              for i in range(n)]), path, "overwrite")


def _strip_files_key(path: str, version: int) -> None:
    """Rewrite a manifest WITHOUT its ``files`` map (checksum
    recomputed) — simulating a pre-files-era table for the legacy
    fallback paths."""
    mp = txnlog._manifest_path(path, version)
    with open(mp) as fh:
        body = json.load(fh)
    body.pop("files", None)
    body.pop("checksum", None)
    body["checksum"] = txnlog._manifest_checksum(body)
    with open(mp, "w") as fh:
        json.dump(body, fh)


def _true_walk(path: str, dirs) -> tuple[int, int]:
    n = b = 0
    for d in dirs:
        full = d if os.path.isabs(d) else os.path.join(path, d)
        for root, _, fs in os.walk(full):
            for f in fs:
                if f.startswith((".", "_")):
                    continue
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


# ------------------------------------------------------------------
# manifest file/byte records + metadata-served DESCRIBE DETAIL
# ------------------------------------------------------------------
class TestManifestFileStats:
    def test_commit_records_walk_parity(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.commit(_df(spark, [(100, "x", 1.0)]), path, "append")
        man = txnlog._read_manifest(path, 1)
        assert set(man["files"]) == set(man["dirs"])
        for d in man["dirs"]:
            n, b = _true_walk(path, [d])
            assert man["files"][d] == [n, b]

    def test_append_carries_parent_entries(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        m0 = txnlog._read_manifest(path, 0)
        txnlog.commit(_df(spark, [(100, "x", 1.0)]), path, "append")
        m1 = txnlog._read_manifest(path, 1)
        for d, rec in m0["files"].items():
            assert m1["files"][d] == rec

    def test_detail_is_metadata_only(self, spark, tmp_path):
        """The txn_analyze_stats-style pin: delete every data file —
        DESCRIBE DETAIL still serves the recorded totals (the
        docstring's 100 TB cost claim, made true this round)."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        before = txnlog.describe_detail(spark, path).collect()[0]
        for d in txnlog._read_manifest(path, 0)["dirs"]:
            shutil.rmtree(os.path.join(path, d))
        after = txnlog.describe_detail(spark, path).collect()[0]
        assert (after["num_files"], after["size_bytes"]) == \
            (before["num_files"], before["size_bytes"])
        assert after["num_files"] > 0 and after["size_bytes"] > 0

    def test_legacy_manifest_falls_back_to_walk(self, spark,
                                                tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        det = txnlog.describe_detail(spark, path).collect()[0]
        _strip_files_key(path, 0)
        man = txnlog._read_manifest(path, 0)
        assert "files" not in man
        legacy = txnlog.describe_detail(spark, path).collect()[0]
        assert (legacy["num_files"], legacy["size_bytes"]) == \
            (det["num_files"], det["size_bytes"])
        # the NEXT commit records the whole dir set (the one-time
        # migration walk) and metadata-only service resumes
        txnlog.commit(_df(spark, [(100, "x", 1.0)]), path, "append")
        m1 = txnlog._read_manifest(path, 1)
        assert set(m1["files"]) == set(m1["dirs"])

    def test_maintenance_and_rewrite_paths_carry(self, spark,
                                                 tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.commit(_df(spark, [(100, "x", 1.0)]), path, "append")
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(1, "upd", 9.0)]), ["id"])
        txnlog.compact(spark, path)
        v = txnlog.restore(path, to_version=1)
        for w in range(v + 1):
            man = txnlog._read_manifest(path, w)
            assert set(man["files"]) >= set(man["dirs"]), w
            n, b = _true_walk(path, man["dirs"])
            assert (sum(man["files"][d][0] for d in man["dirs"]),
                    sum(man["files"][d][1] for d in man["dirs"])) \
                == (n, b), w

    def test_clone_carries_rekeyed_entries(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _seed(spark, src)
        txnlog.shallow_clone(src, dst)
        man = txnlog._read_manifest(dst, 0)
        assert set(man["files"]) == set(man["dirs"])
        # zero-walk claim: totals equal the source's
        sdet = txnlog.describe_detail(spark, src).collect()[0]
        ddet = txnlog.describe_detail(spark, dst).collect()[0]
        assert (ddet["num_files"], ddet["size_bytes"]) == \
            (sdet["num_files"], sdet["size_bytes"])

    def test_partitioned_commit_records_leaf_dirs(self, spark,
                                                  tmp_path):
        path = str(tmp_path / "t")
        txnlog.commit(
            _df(spark, [(i, f"n{i}", float(i % 3))
                        for i in range(9)]),
            path, "overwrite", partition_by=["amt"])
        man = txnlog._read_manifest(path, 0)
        assert len(man["dirs"]) == 3
        assert set(man["files"]) == set(man["dirs"])
        det = txnlog.describe_detail(spark, path).collect()[0]
        assert (det["num_files"], det["size_bytes"]) == \
            _true_walk(path, man["dirs"])


# ------------------------------------------------------------------
# conditional MERGE — Python API
# ------------------------------------------------------------------
class TestMergeUpsertWhen:
    def test_qualify_split_and_insert(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = _df(spark, [(1, "u1", 99.0),    # qualifies (99 > 1)
                          (2, "u2", 0.5),     # fails (0.5 < 2)
                          (200, "new", 7.0)])
        txnlog.merge_upsert_when(
            spark, path, src, ["id"],
            match_cond="s.amt > t.amt")
        out = {r["id"]: (r["name"], r["amt"])
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[1] == ("u1", 99.0)
        assert out[2] == ("n2", 2.0)          # untouched
        assert out[200] == ("new", 7.0)       # inserted whole
        assert len(out) == 11

    def test_subset_set_with_target_refs(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = _df(spark, [(3, "XXX", 50.0)])
        txnlog.merge_upsert_when(
            spark, path, src, ["id"],
            match_cond="s.amt > t.amt",
            set_exprs={"amt": "t.amt + s.amt",
                       "name": "concat(t.name, '!')"})
        row = [r for r in txnlog.snapshot(spark, path).collect()
               if r["id"] == 3][0]
        assert row["amt"] == 53.0 and row["name"] == "n3!"

    def test_null_condition_keeps_row(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = spark.createDataFrame(
            [(4, "u4", None)], "id long, name string, amt double")
        txnlog.merge_upsert_when(spark, path, src, ["id"],
                                 match_cond="s.amt > t.amt")
        row = [r for r in txnlog.snapshot(spark, path).collect()
               if r["id"] == 4][0]
        assert (row["name"], row["amt"]) == ("n4", 4.0)

    def test_dup_target_sibling_carried(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "a", 1.0), (1, "b", 100.0),
                                  (2, "c", 2.0)]),
                      path, "overwrite")
        # one source row matches BOTH id=1 rows: only the amt=1.0
        # sibling qualifies; the amt=100.0 sibling must survive the
        # rewrite unchanged
        txnlog.merge_upsert_when(
            spark, path, _df(spark, [(1, "upd", 50.0)]), ["id"],
            match_cond="s.amt > t.amt")
        rows = sorted(
            [(r["id"], r["name"], r["amt"])
             for r in txnlog.snapshot(spark, path).collect()])
        assert rows == [(1, "b", 100.0), (1, "upd", 50.0),
                        (2, "c", 2.0)]

    def test_unmatched_keys_do_not_rewrite_their_dir(self, spark,
                                                     tmp_path):
        """A batch where NO matched key qualifies rewrites nothing of
        the matched dirs — the mostly-non-qualifying restatement feed
        touches only the insert dir."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        m0 = txnlog._read_manifest(path, 0)
        src = _df(spark, [(1, "low", -1.0), (300, "new", 1.0)])
        v = txnlog.merge_upsert_when(spark, path, src, ["id"],
                                     match_cond="s.amt > t.amt")
        man = txnlog._read_manifest(path, v)
        assert set(m0["dirs"]) <= set(man["dirs"])  # dir 0 carried
        out = {r["id"]: r["amt"]
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[1] == 1.0 and out[300] == 1.0

    def test_identity_preserved_on_update(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
                      path, "overwrite", identity="rid")
        before = {r["id"]: r["rid"]
                  for r in txnlog.snapshot(spark, path).collect()}
        txnlog.merge_upsert_when(
            spark, path, _df(spark, [(1, "upd", 9.0),
                                     (5, "new", 5.0)]), ["id"],
            match_cond="s.amt > t.amt")
        after = {r["id"]: (r["rid"], r["name"])
                 for r in txnlog.snapshot(spark, path).collect()}
        assert after[1] == (before[1], "upd")
        assert after[2] == (before[2], "b")
        assert after[5][0] not in (before[1], before[2])

    def test_generated_recomputed_not_assignable(self, spark,
                                                 tmp_path):
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
                      path, "overwrite",
                      generated={"g": "id * 2"})
        with pytest.raises(ValueError, match="not assignable"):
            txnlog.merge_upsert_when(
                spark, path, _df(spark, [(1, "u", 9.0)]), ["id"],
                set_exprs={"g": "s.id"})
        txnlog.merge_upsert_when(
            spark, path, _df(spark, [(1, "u", 9.0)]), ["id"],
            match_cond="s.amt > t.amt",
            set_exprs={"amt": "s.amt"})
        out = {r["id"]: (r["amt"], r["g"])
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[1] == (9.0, 2) and out[2] == (2.0, 4)

    def test_refusals(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        dup = _df(spark, [(1, "a", 1.0), (1, "b", 2.0)])
        with pytest.raises(ValueError, match="key-unique"):
            txnlog.merge_upsert_when(spark, path, dup, ["id"])
        with pytest.raises(ValueError, match="not assignable"):
            txnlog.merge_upsert_when(
                spark, path, _df(spark, [(1, "a", 1.0)]), ["id"],
                set_exprs={"id": "s.id + 1"})
        # a typo'd SET name must refuse, not silently add a column
        with pytest.raises(ValueError, match="not columns of"):
            txnlog.merge_upsert_when(
                spark, path, _df(spark, [(1, "a", 1.0)]), ["id"],
                set_exprs={"amtt": "s.amt"})
        # case-insensitively colliding SET names refuse
        with pytest.raises(ValueError, match="collide"):
            txnlog.merge_upsert_when(
                spark, path, _df(spark, [(1, "a", 1.0)]), ["id"],
                set_exprs={"amt": "s.amt", "AMT": "s.amt"})

    def test_set_names_case_insensitive(self, spark, tmp_path):
        """SET AMT against column amt resolves like Spark's default
        case-insensitive column resolution (Delta accepts it too)."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.merge_upsert_when(
            spark, path, _df(spark, [(1, "u", 42.0)]), ["id"],
            set_exprs={"AMT": "s.amt"})
        row = [r for r in txnlog.snapshot(spark, path).collect()
               if r["id"] == 1][0]
        assert row["amt"] == 42.0 and row["name"] == "n1"
        assert "AMT" not in txnlog.snapshot(spark, path).columns

    def test_identity_dup_sibling_refuses(self, spark, tmp_path):
        """A qualifying key with duplicate target rows on an
        IDENTITY table refuses (one restored id per key would
        collide / resurrect a deleted id) — both conditional paths."""
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "a", 1.0), (1, "b", 9.0),
                                  (2, "c", 2.0)]),
                      path, "overwrite", identity="rid")
        # 5.0 beats the amt=1.0 sibling but not the amt=9.0 one —
        # exactly one qualifying row + one surviving sibling
        src = _df(spark, [(1, "upd", 5.0)])
        with pytest.raises(ValueError, match="de-duplicate"):
            txnlog.merge_upsert_when(spark, path, src, ["id"],
                                     match_cond="s.amt > t.amt")
        with pytest.raises(ValueError, match="de-duplicate"):
            txnlog.merge_delete_when(
                spark, path,
                spark.createDataFrame([(1,)], "id long"), ["id"],
                match_cond="t.amt < 5")

    def test_empty_table_inserts_all(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v = txnlog.merge_upsert_when(
            spark, path, _df(spark, [(1, "a", 1.0)]), ["id"],
            match_cond="s.amt > t.amt")
        assert v == 0
        assert txnlog.snapshot(spark, path).count() == 1


# ------------------------------------------------------------------
# SQL grammar: WHEN MATCHED, scanner escapes, VACUUM paths
# ------------------------------------------------------------------
class TestTxnSqlR13:
    def test_when_matched_subset(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.createDataFrame(
            [(1, "XXX", 99.0), (2, "XXX", 0.5)],
            "id long, name string, amt double"
        ).createOrReplaceTempView("r13_mw")
        txnsql.txn_sql(
            spark,
            f"MERGE INTO '{path}' USING r13_mw KEY BY (id) "
            "WHEN MATCHED AND s.amt > t.amt THEN UPDATE SET "
            "amt = s.amt, name = concat(t.name, '>')")
        out = {r["id"]: (r["name"], r["amt"])
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[1] == ("n1>", 99.0)
        assert out[2] == ("n2", 2.0)

    def test_when_matched_set_star_and_case_cond(self, spark,
                                                 tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnsql.txn_sql(
            spark,
            f"MERGE INTO '{path}' USING (SELECT CAST(5 AS LONG) "
            "AS id, 'star' AS name, CAST(-1.0 AS DOUBLE) AS amt) "
            "KEY BY (id) WHEN MATCHED AND CASE WHEN t.amt > 1 "
            "THEN true ELSE false END THEN UPDATE SET *")
        out = {r["id"]: (r["name"], r["amt"])
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[5] == ("star", -1.0)

    def test_key_by_inside_literal_cannot_confuse(self, spark,
                                                  tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnsql.txn_sql(
            spark,
            f"MERGE INTO '{path}' USING (SELECT CAST(7 AS LONG) AS "
            "id, ' KEY BY (trap)' AS name, CAST(0.0 AS DOUBLE) AS "
            "amt) KEY BY (id)")
        out = {r["id"]: r["name"]
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[7] == " KEY BY (trap)"

    @pytest.mark.parametrize("tail", [
        "WHEN MATCHED THEN UPDATE SET",          # empty assignments
        "WHEN MATCHED UPDATE SET *",             # missing THEN
        "WHEN MATCHED AND s.amt > t.amt THEN TRUNCATE",  # no such act
        "WHEN MATCHED THEN UPDATE SET * DELETE WHEN f",  # combined
        "WHEN MATCHED THEN UPDATE SET a b",      # not col = expr
    ])
    def test_when_matched_refusals(self, spark, tmp_path, tail):
        path = str(tmp_path / "t")
        _seed(spark, path)
        with pytest.raises(ValueError, match="txn_sql could not"):
            txnsql.txn_sql(
                spark,
                f"MERGE INTO '{path}' USING x KEY BY (id) {tail}")

    def test_scanner_escapes(self):
        f = txnsql._find_top_keyword
        assert f("a = 'it''s WHERE not' WHERE b", "WHERE") == 22
        assert f('a = "x WHERE y" WHERE b', "WHERE") == 16
        assert f(r"a = 'it\'s WHERE x' WHERE b", "WHERE") == 20
        assert f("a = `odd WHERE id` WHERE b", "WHERE") == 19
        assert f("a = 'unbalanced WHERE", "WHERE") == -1
        s = txnsql._split_top_commas
        assert s("a = 'x,''y'', z', b = 2") == \
            ["a = 'x,''y'', z'", " b = 2"]
        assert s('a = "p,q", b = `c,d`') == ['a = "p,q"', ' b = `c,d`']
        with pytest.raises(ValueError, match="unbalanced"):
            s("a = 'x, b = 2")

    def test_update_with_escaped_literals(self, spark, tmp_path):
        """End to end: a SET value whose literal contains an escaped
        quote + the keyword WHERE must parse and land verbatim."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnsql.txn_sql(
            spark,
            f"UPDATE '{path}' SET name = 'it''s WHERE, ok' "
            "KEY BY (id) WHERE id = 1")
        out = {r["id"]: r["name"]
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[1] == "it's WHERE, ok"

    def test_vacuum_paths_payload(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.commit(_df(spark, [(1, "x", 1.0)]), path,
                      "overwrite")
        txnlog.commit(_df(spark, [(2, "y", 2.0)]), path,
                      "overwrite")
        dry = txnsql.txn_sql(
            spark,
            f"VACUUM '{path}' RETAIN 1 VERSIONS GRACE 0 SECONDS "
            "DRY RUN").collect()[0]
        assert dry["dry_run"] is True
        assert dry["removed_dirs"] == len(dry["paths"]) == 2
        assert dry["paths"] == sorted(dry["paths"])
        real = txnsql.txn_sql(
            spark,
            f"VACUUM '{path}' RETAIN 1 VERSIONS GRACE 0 SECONDS"
        ).collect()[0]
        assert real["paths"] == dry["paths"]  # audit = action
        for p in real["paths"]:
            assert not os.path.exists(os.path.join(path, p))


# ------------------------------------------------------------------
# maxBytesPerTrigger admission
# ------------------------------------------------------------------
class TestMaxBytesPerTrigger:
    def _table(self, spark, tmp_path, n_versions=4):
        path = str(tmp_path / "t")
        for i in range(n_versions):
            txnlog.commit(
                spark.range(500).withColumn("v", F_lit(i)),
                path, "overwrite" if i == 0 else "append")
        man = txnlog._read_manifest(path, n_versions - 1)
        per_v = [man["files"][d][1] for d in sorted(man["files"])]
        return path, per_v

    def test_soft_cap_admits_whole_versions(self, spark, tmp_path):
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path, per_v = self._table(spark, tmp_path)
        rdr = TxnTableStreamReader(
            {"path": path,
             "maxbytespertrigger": str(per_v[0] + 1)})
        rdr.initialOffset()
        o1 = rdr.latestOffset()
        assert o1 == {"version": 1}  # v0 under cap, v1 crosses it
        rdr.commit(o1)
        assert rdr.latestOffset() == {"version": 3}

    def test_jumbo_version_still_flows(self, spark, tmp_path):
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path, _ = self._table(spark, tmp_path)
        rdr = TxnTableStreamReader(
            {"path": path, "maxbytespertrigger": "1"})
        rdr.initialOffset()
        assert rdr.latestOffset() == {"version": 0}

    def test_pre_files_era_fallback_stats_files(self, spark,
                                                tmp_path):
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path, per_v = self._table(spark, tmp_path)
        for v in range(4):
            _strip_files_key(path, v)
        rdr = TxnTableStreamReader(
            {"path": path,
             "maxbytespertrigger": str(per_v[0] + 1)})
        rdr.initialOffset()
        assert rdr.latestOffset() == {"version": 1}

    def test_uncapped_bytes_path_unchanged(self, spark, tmp_path):
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path, _ = self._table(spark, tmp_path)
        rdr = TxnTableStreamReader({"path": path})
        rdr.initialOffset()
        assert rdr.latestOffset() == {"version": 3}


# ------------------------------------------------------------------
# conditional MERGE-DELETE + CONVERT TO txnlog
# ------------------------------------------------------------------
class TestMergeDeleteWhen:
    def test_target_guard_and_unmatched_ignored(self, spark,
                                                tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = spark.createDataFrame(
            [(1,), (2,), (3,), (99,)], "id long")
        txnlog.merge_delete_when(spark, path, src, ["id"],
                                 match_cond="t.amt >= 2")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [0, 1] + list(range(4, 10))

    def test_source_and_target_scopes(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = spark.createDataFrame(
            [(i, 1 if i % 3 == 0 else 0) for i in range(10)],
            "id long, flagged int")
        txnlog.merge_delete_when(
            spark, path, src, ["id"],
            match_cond="s.flagged = 1 AND t.id % 2 = 0")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [i for i in range(10) if i % 6 != 0]

    def test_no_cond_deletes_all_matched(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.merge_delete_when(
            spark, path,
            spark.createDataFrame([(0,), (5,)], "id long"), ["id"])
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [1, 2, 3, 4, 6, 7, 8, 9]

    def test_noop_is_metadata_only_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        m0 = txnlog._read_manifest(path, 0)
        v = txnlog.merge_delete_when(
            spark, path,
            spark.createDataFrame([(777,)], "id long"), ["id"],
            match_cond="t.amt > 0")
        man = txnlog._read_manifest(path, v)
        assert man["dirs"] == m0["dirs"]  # no dir written
        assert man["meta"].get("merge_delete_noop") is True
        # maintenance, not delete: no logical row changed, so a
        # downstream txntable stream must flow past the idle tick
        assert (man.get("op") or {}).get("type") == "maintenance"
        assert txnlog.snapshot(spark, path).count() == 10

    def test_noop_does_not_break_streams(self, spark, tmp_path):
        """A CDC reaper's idle tick (nothing qualifies) must be
        transparent to a non-skip-change txntable stream — the
        crash-loop class the review flagged."""
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path = str(tmp_path / "t")
        _seed(spark, path)
        v = txnlog.merge_delete_when(
            spark, path,
            spark.createDataFrame([(777,)], "id long"), ["id"])
        rdr = TxnTableStreamReader({"path": path})
        rdr.initialOffset()
        # v0 alone plans exactly its parquet files; planning through
        # the no-op version must raise nothing AND add nothing
        v0_parts = [p.file_path for p in
                    rdr.partitions({"version": -1}, {"version": 0})]
        assert v0_parts and all(v0_parts)
        parts = [p.file_path for p in
                 rdr.partitions({"version": -1}, {"version": v})]
        assert parts == v0_parts

    def test_identity_table_delete(self, spark, tmp_path):
        """merge_delete_when on an IDENTITY table: carried rows drop
        the engine-owned column and dying rows take their ids with
        them (the review's crash finding)."""
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0),
                                  (3, "c", 3.0)]),
                      path, "overwrite", identity="rid")
        before = {r["id"]: r["rid"]
                  for r in txnlog.snapshot(spark, path).collect()}
        txnlog.merge_delete_when(
            spark, path,
            spark.createDataFrame([(1,), (2,)], "id long"), ["id"],
            match_cond="t.amt >= 2")
        after = {r["id"]: r["rid"]
                 for r in txnlog.snapshot(spark, path).collect()}
        assert sorted(after) == [1, 3]
        assert after[1] == before[1]  # survivor keeps its id
        assert after[3] == before[3]

    def test_dup_source_keys_deterministic(self, spark, tmp_path):
        """Delete is a set decision: the row dies if ANY pair
        qualifies — dup source keys are allowed (Delta's delete-only
        multi-match rule)."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        src = spark.createDataFrame(
            [(1, 0), (1, 1), (2, 0)], "id long, f int")
        txnlog.merge_delete_when(spark, path, src, ["id"],
                                 match_cond="s.f = 1")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [0] + list(range(2, 10))

    def test_dup_target_sibling_survives(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txnlog.commit(_df(spark, [(1, "low", 1.0), (1, "hi", 9.0),
                                  (2, "c", 2.0)]),
                      path, "overwrite")
        txnlog.merge_delete_when(
            spark, path, spark.createDataFrame([(1,)], "id long"),
            ["id"], match_cond="t.amt < 5")
        rows = sorted((r["id"], r["name"]) for r in
                      txnlog.snapshot(spark, path).collect())
        assert rows == [(1, "hi"), (2, "c")]

    def test_empty_table_refuses(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            txnlog.merge_delete_when(
                spark, str(tmp_path / "missing"),
                spark.createDataFrame([(1,)], "id long"), ["id"])

    def test_sql_then_delete(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.createDataFrame([(i,) for i in range(10)], "id long") \
            .createOrReplaceTempView("r13_del")
        txnsql.txn_sql(
            spark,
            f"MERGE INTO '{path}' USING r13_del KEY BY (id) "
            "WHEN MATCHED AND t.amt > 6 THEN DELETE")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == list(range(7))
        with pytest.raises(ValueError, match="txn_sql could not"):
            txnsql.txn_sql(
                spark,
                f"MERGE INTO '{path}' USING r13_del KEY BY (id) "
                "WHEN MATCHED THEN DELETE trailing")


class TestMergeSyncDelete:
    def test_full_sync(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        keep = spark.createDataFrame(
            [(i, "junk") for i in range(6)], "id long, j string")
        txnlog.merge_sync_delete(spark, path, keep, ["id"])
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == list(range(6))

    def test_target_side_gate(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        keep = spark.createDataFrame([(i,) for i in range(6)],
                                     "id long")
        txnlog.merge_sync_delete(spark, path, keep, ["id"],
                                 match_cond="t.amt < 8")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [0, 1, 2, 3, 4, 5, 8, 9]

    def test_covering_source_is_metadata_noop(self, spark,
                                              tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        keep = spark.createDataFrame([(i,) for i in range(10)],
                                     "id long")
        v = txnlog.merge_sync_delete(spark, path, keep, ["id"])
        man = txnlog._read_manifest(path, v)
        assert man["meta"].get("merge_delete_noop") is True
        assert man["op"]["type"] == "maintenance"

    def test_null_key_rows_kept(self, spark, tmp_path):
        """Documented divergence from Delta: NULL-key target rows
        survive a sync (keyed ops are null-unsafe equality
        throughout this engine)."""
        path = str(tmp_path / "t")
        txnlog.commit(
            spark.createDataFrame(
                [(None, "nk", 0.0), (1, "a", 1.0), (2, "b", 2.0)],
                "id long, name string, amt double"),
            path, "overwrite")
        txnlog.merge_sync_delete(
            spark, path,
            spark.createDataFrame([(1,)], "id long"), ["id"])
        names = {r["name"] for r in
                 txnlog.snapshot(spark, path).collect()}
        assert names == {"nk", "a"}

    def test_full_read_conflict_refuses_disjoint_append(self, spark,
                                                        tmp_path):
        """The sync decision read every key: a concurrent append of
        a key OUTSIDE the source universe must refuse (it would
        silently survive the 'full sync'), even though the keyed
        conflict matrix would call it disjoint-compatible."""
        path = str(tmp_path / "t")
        _seed(spark, path)  # v0
        rv = 0
        # concurrent writer lands an append of key 50 (not in source)
        txnlog.commit(_df(spark, [(50, "late", 5.0)]), path,
                      "append")
        keep = spark.createDataFrame([(i,) for i in range(10)],
                                     "id long")
        with pytest.raises(txnlog.ConcurrentModification,
                           match="full-table read"):
            txnlog.merge_sync_delete(spark, path, keep, ["id"],
                                     read_version=rv)
        # maintenance interleaving stays compatible
        path2 = str(tmp_path / "t2")
        _seed(spark, path2)
        txnlog.commit(_df(spark, [(50, "x", 5.0)]), path2, "append")
        rv2 = txnlog.latest_version(path2)
        txnlog.compact(spark, path2)
        v = txnlog.merge_sync_delete(
            spark, path2,
            spark.createDataFrame([(i,) for i in range(10)],
                                  "id long"),
            ["id"], read_version=rv2)
        assert sorted(r["id"] for r in
                      txnlog.snapshot(spark, path2).collect()) \
            == list(range(10))
        assert v == rv2 + 2

    def test_sql_branch_and_refusal(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.createDataFrame([(i,) for i in range(6)], "id long") \
            .createOrReplaceTempView("r13_sync")
        txnsql.txn_sql(
            spark,
            f"MERGE INTO '{path}' USING r13_sync KEY BY (id) "
            "WHEN NOT MATCHED BY SOURCE AND t.amt < 8 THEN DELETE")
        ids = sorted(r["id"] for r in
                     txnlog.snapshot(spark, path).collect())
        assert ids == [0, 1, 2, 3, 4, 5, 8, 9]
        with pytest.raises(ValueError, match="txn_sql could not"):
            txnsql.txn_sql(
                spark,
                f"MERGE INTO '{path}' USING r13_sync KEY BY (id) "
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")


class TestAlterConstraints:
    def test_lifecycle(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        m0 = txnlog._read_manifest(path, 0)
        v = txnlog.alter_constraints(
            spark, path, add={"amt_nonneg": "amt >= 0"})
        man = txnlog._read_manifest(path, v)
        assert man["dirs"] == m0["dirs"]  # metadata-only
        assert man["op"]["type"] == "maintenance"
        assert man["constraints"] == {"amt_nonneg": "amt >= 0"}
        # the declared set now GATES commits
        with pytest.raises(txnlog.ConstraintViolation):
            txnlog.commit(_df(spark, [(100, "bad", -1.0)]), path,
                          "append")
        assert txnlog.snapshot(spark, path).count() == 10
        # drop, then the same row lands
        v2 = txnlog.alter_constraints(spark, path,
                                      drop=["amt_nonneg"])
        assert txnlog._read_manifest(path, v2)["constraints"] == {}
        txnlog.commit(_df(spark, [(100, "bad", -1.0)]), path,
                      "append")
        assert txnlog.snapshot(spark, path).count() == 11

    def test_add_validates_existing_rows(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)  # amts 0..9
        with pytest.raises(txnlog.ConstraintViolation):
            txnlog.alter_constraints(spark, path,
                                     add={"impossible": "amt > 100"})
        # refusal left no version behind
        assert txnlog.latest_version(path) == 0

    def test_add_respects_tombstones(self, spark, tmp_path):
        """Rows a DV delete made invisible must not fail a new
        constraint (same rule as commit-time ADD)."""
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.delete_keys(
            spark, path,
            spark.createDataFrame([(i,) for i in range(5)],
                                  "id long"), ["id"])
        v = txnlog.alter_constraints(spark, path,
                                     add={"big": "amt >= 5"})
        assert "big" in txnlog._read_manifest(path, v)["constraints"]

    def test_redeclare_and_unknown_drop(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        txnlog.alter_constraints(spark, path,
                                 add={"c1": "amt >= 0"})
        # identical re-declare: idempotent, no validation re-run
        txnlog.alter_constraints(spark, path, add={"c1": "amt >= 0"})
        with pytest.raises(ValueError, match="different expression"):
            txnlog.alter_constraints(spark, path,
                                     add={"c1": "amt > 1"})
        with pytest.raises(ValueError, match="no such constraint"):
            txnlog.alter_constraints(spark, path, drop=["typo"])

    def test_sql_surface(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        row = txnsql.txn_sql(
            spark,
            f"ALTER '{path}' ADD CONSTRAINT nn "
            "CHECK (amt >= 0 AND (name IS NOT NULL))").collect()[0]
        assert row["action"] == "add_constraint"
        assert row["name"] == "nn"
        cons = txnlog._read_manifest(
            path, row["version"])["constraints"]
        assert cons["nn"] == "amt >= 0 AND (name IS NOT NULL)"
        row2 = txnsql.txn_sql(
            spark,
            f"ALTER '{path}' DROP CONSTRAINT nn").collect()[0]
        assert row2["action"] == "drop_constraint"
        assert txnlog._read_manifest(
            path, row2["version"])["constraints"] == {}
        with pytest.raises(ValueError, match="txn_sql could not"):
            txnsql.txn_sql(
                spark, f"ALTER '{path}' ADD CONSTRAINT x y")

    def test_stream_flows_past_alter(self, spark, tmp_path):
        from azure_nyctaxi_lambda_elt_spark.streaming.txn_source \
            import TxnTableStreamReader

        path = str(tmp_path / "t")
        _seed(spark, path)
        v = txnlog.alter_constraints(spark, path,
                                     add={"c": "amt >= 0"})
        rdr = TxnTableStreamReader({"path": path})
        rdr.initialOffset()
        v0 = [p.file_path for p in
              rdr.partitions({"version": -1}, {"version": 0})]
        through = [p.file_path for p in
                   rdr.partitions({"version": -1}, {"version": v})]
        assert through == v0  # the ALTER adds nothing, raises nothing


class TestConvertToTxn:
    def _plain(self, spark, tmp_path, n=10):
        plain = str(tmp_path / "plain")
        _df(spark, [(i, f"n{i}", float(i))
                    for i in range(n)]).write.parquet(plain)
        return plain

    def test_zero_copy_adoption(self, spark, tmp_path):
        plain = self._plain(spark, tmp_path)
        path = str(tmp_path / "t")
        before = _true_walk(plain, ["."][:0] or [plain])
        v = txnlog.convert_to_txn(spark, plain, path,
                                  stats_cols=["id"])
        assert v == 0
        assert txnlog.snapshot(spark, path).count() == 10
        # byte-identical adoption: nothing copied or rewritten
        assert _true_walk(plain, [plain]) == before
        man = txnlog._read_manifest(path, 0)
        assert man["dirs"] == [os.path.abspath(plain)]
        det = txnlog.describe_detail(spark, path).collect()[0]
        assert (det["num_files"], det["size_bytes"]) == before
        # stats envelope recorded -> pruning works immediately
        env = man["stats"][os.path.abspath(plain)]["id"]
        assert env == [0, 9]

    def test_table_is_live_after_convert(self, spark, tmp_path):
        plain = self._plain(spark, tmp_path)
        path = str(tmp_path / "t")
        txnlog.convert_to_txn(spark, plain, path)
        txnlog.commit(_df(spark, [(100, "x", 1.0)]), path, "append")
        txnlog.merge_upsert(spark, path,
                            _df(spark, [(1, "upd", 9.0)]), ["id"])
        out = {r["id"]: r["name"]
               for r in txnlog.snapshot(spark, path).collect()}
        assert out[100] == "x" and out[1] == "upd"
        assert len(out) == 11

    def test_refusals(self, spark, tmp_path):
        plain = self._plain(spark, tmp_path)
        path = str(tmp_path / "t")
        txnlog.convert_to_txn(spark, plain, path)
        with pytest.raises(ValueError, match="already has commits"):
            txnlog.convert_to_txn(spark, plain, path)
        with pytest.raises(ValueError, match="disjoint"):
            txnlog.convert_to_txn(spark, plain, plain)
        # table root INSIDE the adopted dir: future data-v* commits
        # would land inside the referenced data (review finding)
        with pytest.raises(ValueError, match="disjoint"):
            txnlog.convert_to_txn(spark, plain,
                                  os.path.join(plain, "tbl"))
        with pytest.raises(FileNotFoundError):
            txnlog.convert_to_txn(spark, str(tmp_path / "empty"),
                                  str(tmp_path / "t2"))

    def test_sql_convert(self, spark, tmp_path):
        plain = self._plain(spark, tmp_path)
        path = str(tmp_path / "t")
        row = txnsql.txn_sql(
            spark,
            f"CONVERT '{plain}' TO '{path}' STATS (id)").collect()[0]
        assert row["version"] == 0
        assert (row["num_files"], row["size_bytes"]) == \
            _true_walk(plain, [plain])


# ------------------------------------------------------------------
# tz-suffixed literal envelope compares
# ------------------------------------------------------------------
class TestTzSuffixGuard:
    def test_tz_suffixed_detection(self):
        yes = ["2024-01-05 23:00:00+13:00", "2024-01-05T23:00:00Z",
               "2024-01-05 23:00:00-05:00", "2024-01-05 23:00:00+05",
               "2024-01-05T23:00:00.123+0530"]
        no = ["2024-01-05 23:00:00", "2024-01-05T23:00:00.123456",
              "2024-01-05", "hello Z", "plain string", "+13:00"]
        for s in yes:
            assert txnlog._tz_suffixed(s), s
        for s in no:
            assert not txnlog._tz_suffixed(s), s

    def test_env_compare_inconclusive_on_tz(self):
        gt = txnlog._env_provably_gt
        # semantically 2024-01-05 23:00+13:00 = 10:00 UTC, BELOW the
        # envelope hi — string order would wrongly prove disjoint
        assert not gt("2024-01-06 00:00:00",
                      "2024-01-05 23:00:00+13:00")
        assert not gt("2024-01-05 23:00:00+13:00",
                      "2024-01-05 22:00:00")
        assert not gt("2024-01-06T00:00:00Z", "2024-01-05T00:00:00")
        # naive pairs keep proving (the normal prune path)
        assert gt("2024-01-06 00:00:01", "2024-01-06 00:00:00")
        assert gt("b", "a") and not gt("a", "b")

    def test_auto_prune_keeps_dirs_on_tz_literal(self):
        man = {"dirs": ["d0", "d1"],
               "stats": {
                   "d0": {"ts": ["2024-01-01T00:00:00",
                                 "2024-01-05T23:59:59"]},
                   "d1": {"ts": ["2024-01-06T00:00:00",
                                 "2024-01-09T23:59:59"]}}}
        # naive literal: d1 provably > hi bound -> pruned
        kept = txnlog._auto_prune_names(
            ".", 0, man, "ts < '2024-01-05 12:00:00'")
        assert kept == ["d0"]
        # tz-suffixed literal: inconclusive -> every dir stays open
        kept = txnlog._auto_prune_names(
            ".", 0, man, "ts < '2024-01-05 12:00:00+13:00'")
        assert kept == ["d0", "d1"]


def F_lit(v):
    from pyspark.sql import functions as F

    return F.lit(v)
