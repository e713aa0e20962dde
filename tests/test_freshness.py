"""Structural driver-window freshness (plans/freshness.py): the
fingerprinting, dependency-closure, and window-ordering mechanics that
replace the hand-written _CHECK_FIRST/_DRIVER_GREEN rotation."""

from __future__ import annotations

from azure_nyctaxi_lambda_elt_spark.plans import catalog, freshness

SYN_REL = "azure_nyctaxi_lambda_elt_spark/plans/_synthetic.py"


def _mod(src: str) -> freshness._Mod:
    return freshness._Mod(SYN_REL, src)


# ------------------------------------------------------ fingerprints

def test_fingerprint_ignores_docstrings_and_comments():
    a = _mod('def f(x):\n    """old docs."""\n    # note\n    return x + 1\n')
    b = _mod('def f(x):\n    """new docs, citation edit."""\n    return x + 1\n')
    assert (freshness._fp(a.objects["f"][0])
            == freshness._fp(b.objects["f"][0]))


def test_fingerprint_sees_body_changes():
    a = _mod("def f(x):\n    return x + 1\n")
    b = _mod("def f(x):\n    return x + 2\n")
    assert (freshness._fp(a.objects["f"][0])
            != freshness._fp(b.objects["f"][0]))


def test_fingerprint_sees_constant_changes():
    a = _mod("THRESH = 0.85\n")
    b = _mod("THRESH = 0.90\n")
    assert (freshness._fp(a.objects["THRESH"][0])
            != freshness._fp(b.objects["THRESH"][0]))


# ------------------------------------------------- dependency walking

def test_deps_resolve_module_alias_attribute_use():
    m = _mod(
        "from . import trips_feed as tf\n"
        "def q(spark, sf):\n"
        "    return tf.trip_clean(tf.typed_trips(None))\n")
    deps = freshness._deps_of_node(m, m.objects["q"][0])
    tf_rel = "azure_nyctaxi_lambda_elt_spark/plans/trips_feed.py"
    assert (tf_rel, "trip_clean") in deps
    assert (tf_rel, "typed_trips") in deps
    # function-level precision: the alias use must NOT degrade into a
    # whole-module dependency
    assert (tf_rel, None) not in deps


def test_deps_resolve_from_imports_and_local_helpers():
    m = _mod(
        "from ..operators.upsert import write_partition_overwrite\n"
        "def helper(df):\n"
        "    return df\n"
        "def q(spark, sf):\n"
        "    write_partition_overwrite(helper(None), '/tmp/x', ['d'])\n")
    deps = freshness._deps_of_node(m, m.objects["q"][0])
    up_rel = "azure_nyctaxi_lambda_elt_spark/operators/upsert.py"
    assert (up_rel, "write_partition_overwrite") in deps
    assert (SYN_REL, "helper") in deps


def test_deps_resolve_function_scoped_imports():
    m = _mod(
        "def q(spark, sf):\n"
        "    from ..operators import txnlog\n"
        "    return txnlog.commit(None, '/tmp/x')\n")
    deps = freshness._deps_of_node(m, m.objects["q"][0])
    assert ("azure_nyctaxi_lambda_elt_spark/operators/txnlog.py",
            "commit") in deps


def test_oracle_subscript_is_fine_grained():
    m = _mod('ORACLES = {}\nORACLES["a"] = ORACLES["b"]\n')
    assert "a" in m.oracle_nodes
    deps = freshness._deps_of_node(m, m.oracle_nodes["a"][0])
    # aliasing one oracle depends on THAT key's SQL, not on the whole
    # ORACLES literal (which changes whenever any entry's SQL does)
    assert (freshness._ORACLE_DEP, "b") in deps
    assert (SYN_REL, "ORACLES") not in deps


def test_oracle_dict_literal_split_per_key():
    m = _mod('ORACLES = {\n  "x": "SELECT 1",\n  "y": "SELECT 2",\n}\n')
    assert set(m.oracle_nodes) == {"x", "y"}
    fx = freshness._fp(m.oracle_nodes["x"][0])
    m2 = _mod('ORACLES = {\n  "x": "SELECT 1",\n  "y": "SELECT 99",\n}\n')
    assert freshness._fp(m2.oracle_nodes["x"][0]) == fx
    assert (freshness._fp(m2.oracle_nodes["y"][0])
            != freshness._fp(m.oracle_nodes["y"][0]))


def test_closure_reaches_operators_through_plans():
    deps = freshness.closure(
        "azure_nyctaxi_lambda_elt_spark/plans/catalog.py",
        "q_fact_build_star")
    rels = {r for (r, _n) in deps}
    assert "azure_nyctaxi_lambda_elt_spark/plans/trips_feed.py" in rels
    # the fused dim build is part of the fact path since r4
    assert any(r.endswith("operators/dims.py") for r in rels)
    # catalog.py must participate at FUNCTION level only — a whole-
    # module dep would stale every entry on any catalog edit
    assert ("azure_nyctaxi_lambda_elt_spark/plans/catalog.py",
            None) not in deps


# ------------------------------------------------------ evidence/order

def test_evidence_reads_driver_rounds():
    ev = freshness.evidence(catalog.ORACLES)
    # pricing_summary has been green since round 1
    assert ev["pricing_summary"]["last_green_round"] >= 1
    assert ev["pricing_summary"]["attest_commit"]
    # rows-only-by-design entries attest through their rows check
    assert ev["streaming_dedupe"]["last_green_round"] is not None


def test_plan_order_is_complete_and_risk_sorted():
    order = freshness.plan_order(catalog.QUERIES, catalog.ORACLES)
    assert sorted(order) == sorted(catalog.QUERIES)
    fresh = freshness.compute(catalog.QUERIES, catalog.ORACLES)

    def rank(k):
        r = fresh[k]
        if r["last_checked_round"] is None:
            return 0
        if (r["last_green_round"] is None
                or r["last_checked_round"] > r["last_green_round"]):
            return 1
        return 2 if r["stale"] else 3

    ranks = [rank(k) for k in order]
    assert ranks == sorted(ranks), "window head must lead with risk"
    # fresh greens re-attest oldest-first in the tail
    tail = [fresh[k]["last_green_round"] for k in order if rank(k) == 3]
    assert tail == sorted(tail)


def test_dep_change_detection_end_to_end(monkeypatch):
    """A behavioral edit to a dependency's source at the attested
    commit must flag the dep changed; a docstring-only edit must not
    — the property the whole rotation policy rests on."""
    rel = "azure_nyctaxi_lambda_elt_spark/operators/ranks.py"
    current = open(f"/root/repo/{rel}").read()
    behavioral = current.replace(
        "q, rem = divmod(n, buckets)", "q, rem = divmod(n + 1, buckets)")
    assert behavioral != current
    cosmetic = current.replace(
        "Attach a global dense total-order rank",
        "Attach a RENAMED-IN-DOCSTRING global rank")
    assert cosmetic != current

    def fake_src(commit, r):
        if r != rel:
            return freshness._src_at.__wrapped__(commit, r)
        return {"behav": behavioral, "cosm": cosmetic}[commit]

    monkeypatch.setattr(freshness, "_src_at", fake_src)
    freshness._mod_at.cache_clear()
    freshness._fingerprint.cache_clear()
    try:
        dep = (rel, "ntile_expr")
        assert freshness._dep_changed(dep, "behav") is True
        assert freshness._dep_changed(dep, "cosm") is False
        # whole-module comparison follows the same rule
        assert freshness._dep_changed((rel, None), "behav") is True
        assert freshness._dep_changed((rel, None), "cosm") is False
    finally:
        monkeypatch.undo()
        freshness._mod_at.cache_clear()
        freshness._fingerprint.cache_clear()


def test_catalog_query_order_matches_structural_plan():
    order = freshness.plan_order(catalog.QUERIES, catalog.ORACLES)
    assert list(catalog.QUERIES) == order
