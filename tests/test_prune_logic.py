"""Property tests for the pure manifest-pruning logic
(operators/txnlog.py _overlaps / prune_plan): the conservative-skip
invariant — a dir may be skipped ONLY if it cannot hold a matching
row — over randomized envelopes and predicate rectangles, with no
Spark session (the distributed reads are pinned in test_txnlog.py;
this file pins the DECISION rule that gates them at every scale).
"""

from __future__ import annotations

import json
import os
import shutil

from hypothesis import given, settings
from hypothesis import strategies as st

from azure_nyctaxi_lambda_elt_spark.operators import txnlog

OUT = "/tmp/spark_graft_prune_logic_test"

_vals = st.integers(min_value=-50, max_value=50)


def _envelope(draw_lo, draw_hi):
    lo, hi = sorted((draw_lo, draw_hi))
    return [lo, hi]


@st.composite
def _dirs_with_rows(draw):
    """A manifest-shaped stats dict built FROM synthetic row sets, so
    the envelopes are honest [min, max] over known rows."""
    n_dirs = draw(st.integers(min_value=1, max_value=6))
    dirs, stats, rows_by_dir = [], {}, {}
    for i in range(n_dirs):
        name = f"data-v{i:08d}-0000"
        dirs.append(name)
        rows = draw(st.lists(st.tuples(_vals, _vals),
                             min_size=0, max_size=8))
        rows_by_dir[name] = rows
        if rows and draw(st.booleans()):
            a_vals = [r[0] for r in rows]
            b_vals = [r[1] for r in rows]
            stats[name] = {"a": [min(a_vals), max(a_vals)],
                           "b": [min(b_vals), max(b_vals)]}
        # else: dir has no recorded stats — must always be kept
    return dirs, stats, rows_by_dir


def _write_manifest(dirs, stats):
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(os.path.join(OUT, "_txn"))
    body = {"version": 0, "mode": "overwrite", "dirs": dirs,
            "meta": {}, "stats": stats,
            "rows": {}, "bloom_cols": [], "partition_by": []}
    with open(os.path.join(OUT, "_txn", "v00000000.json"), "w") as fh:
        json.dump(body, fh)


@settings(max_examples=200, deadline=None)
@given(data=_dirs_with_rows(),
       a_lo=_vals, a_hi=_vals, b_lo=_vals, b_hi=_vals)
def test_prune_never_skips_a_dir_with_matching_rows(
        data, a_lo, a_hi, b_lo, b_hi):
    dirs, stats, rows_by_dir = data
    a_lo, a_hi = sorted((a_lo, a_hi))
    b_lo, b_hi = sorted((b_lo, b_hi))
    _write_manifest(dirs, stats)
    preds = [("a", a_lo, a_hi), ("b", b_lo, b_hi)]
    kept, all_dirs = txnlog.prune_plan(OUT, None, preds)
    assert all_dirs == dirs
    assert set(kept) <= set(dirs)
    kept_set = set(kept)
    for d, rows in rows_by_dir.items():
        has_match = any(a_lo <= a <= a_hi and b_lo <= b <= b_hi
                        for a, b in rows)
        # the invariant pruning lives or dies by: skipping is only
        # legal when the dir CANNOT hold a matching row
        if has_match:
            assert d in kept_set, (d, rows, preds, stats.get(d))
        # and a dir without recorded stats is always read
        if d not in stats:
            assert d in kept_set


@settings(max_examples=100, deadline=None)
@given(data=_dirs_with_rows(), lo=_vals, hi=_vals)
def test_prune_single_and_conjunction_consistency(data, lo, hi):
    """A one-column predicate keeps a superset of any conjunction
    that includes it, and an unbounded rectangle keeps everything."""
    dirs, stats, _ = data
    lo, hi = sorted((lo, hi))
    _write_manifest(dirs, stats)
    kept_one, _ = txnlog.prune_plan(OUT, None, [("a", lo, hi)])
    kept_two, _ = txnlog.prune_plan(
        OUT, None, [("a", lo, hi), ("b", -50, 50)])
    assert set(kept_two) <= set(kept_one)
    kept_all, _ = txnlog.prune_plan(
        OUT, None, [("a", -50, 50), ("b", -50, 50)])
    assert kept_all == dirs


def test_null_envelope_is_conservative():
    """[null, x], [x, null] and [null, null] envelopes (all-NULL
    partition dirs record these) must always be read."""
    dirs = ["data-v00000000-0000", "data-v00000001-0000",
            "data-v00000002-0000"]
    stats = {dirs[0]: {"a": [None, None]},
             dirs[1]: {"a": [None, 5]},
             dirs[2]: {"a": [5, None]}}
    _write_manifest(dirs, stats)
    kept, _ = txnlog.prune_plan(OUT, None, [("a", 100, 200)])
    assert kept == dirs


_ts_base = st.datetimes(
    min_value=__import__("datetime").datetime(2024, 1, 1),
    max_value=__import__("datetime").datetime(2024, 1, 6))


def _literal_forms(dt):
    """The three ways a SQL consumer writes the instant: date-only
    (midnight), space-separated, isoformat 'T'."""
    return (dt.date().isoformat(),
            dt.strftime("%Y-%m-%d %H:%M:%S"),
            dt.replace(microsecond=0).isoformat())


def _sem(lit):
    """The timestamp a literal means under Spark's cast (date-only =
    midnight)."""
    import datetime

    if len(lit) == 10:
        return datetime.datetime.fromisoformat(lit + "T00:00:00")
    return datetime.datetime.fromisoformat(lit.replace(" ", "T", 1))


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_timestamp_auto_prune_never_skips_matches(data):
    """r12 property (the ADVICE-r11 high bug class): auto-prune over
    TIMESTAMP envelopes (datetime.isoformat strings) against SQL
    literals in any of their three written forms — date-only,
    space-separated, isoformat — may only skip dirs that provably
    hold no matching row, for <=, >=, and BETWEEN predicates."""
    from azure_nyctaxi_lambda_elt_spark.operators.txnlog import (
        _auto_prune_names)

    n_dirs = data.draw(st.integers(min_value=1, max_value=5))
    dirs, stats, rows_by_dir = [], {}, {}
    for i in range(n_dirs):
        name = f"data-v{i:08d}-0000"
        dirs.append(name)
        rows = data.draw(st.lists(
            _ts_base.map(lambda d: d.replace(microsecond=0)),
            min_size=1, max_size=6))
        rows_by_dir[name] = rows
        stats[name] = {"ts": [min(rows).isoformat(),
                              max(rows).isoformat()]}
    man = {"dirs": dirs, "stats": stats}
    a = data.draw(_ts_base)
    b = data.draw(_ts_base)
    la = data.draw(st.sampled_from(_literal_forms(a)))
    lb = data.draw(st.sampled_from(_literal_forms(b)))
    kind = data.draw(st.sampled_from(["le", "ge", "between"]))
    if kind == "le":
        pred = f"ts <= '{la}'"
        match = lambda t: t <= _sem(la)
    elif kind == "ge":
        pred = f"ts >= '{la}'"
        match = lambda t: t >= _sem(la)
    else:
        lo_l, hi_l = (la, lb) if _sem(la) <= _sem(lb) else (lb, la)
        pred = f"ts BETWEEN '{lo_l}' AND '{hi_l}'"
        match = lambda t: _sem(lo_l) <= t <= _sem(hi_l)
    kept = set(_auto_prune_names("/nonexistent", 0, man, pred))
    for d, rows in rows_by_dir.items():
        if any(match(t) for t in rows):
            assert d in kept, (d, pred, stats[d],
                               [r.isoformat() for r in rows])
