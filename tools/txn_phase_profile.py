#!/usr/bin/env python
"""Phase profiler for txn scenario entries (guide §1: measure first).

Wraps the txnlog cost centers with wall-clock timers, runs the named
catalog entries at $SPARK_GRAFT_SF_DIR (default sf0.1), and prints a
per-entry breakdown: how much of the wall went to the data write, the
stats read-back, constraint validation, bloom maintenance, schema
inference, the trips-feed derivation, snapshot reads, and everything
else.  Diagnostic only — never imported by the engine.

Usage: python tools/txn_phase_profile.py txn_delete_vector,txn_history
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)


def _wrap(mod, name, phase):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[phase] += time.perf_counter() - t0
            CALLS[phase] += 1

    setattr(mod, name, timed)
    return orig


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from azure_nyctaxi_lambda_elt_spark.session import get_spark
    from azure_nyctaxi_lambda_elt_spark.operators import txnlog
    from azure_nyctaxi_lambda_elt_spark.plans import trips_feed as tf
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    # cost centers inside commit()/merge/compact
    _wrap(txnlog, "_col_stats", "stats_readback")
    _wrap(txnlog, "_partition_dir_stats", "stats_readback_partitioned")
    _wrap(txnlog, "_validate_constraints", "constraint_validate")
    _wrap(txnlog, "_maintain_bloom", "bloom_maintain")
    _wrap(txnlog, "_analyze_per_dir", "analyze")
    _wrap(txnlog, "_schema_json", "schema_json")
    _wrap(txnlog, "_dir_file_stats", "file_stat_walk")
    _wrap(txnlog, "snapshot", "snapshot_read")
    _wrap(txnlog, "_settle_stale_groups", "settle_groups")
    # the whole commit (includes the above; write = commit - parts)
    _wrap(txnlog, "commit", "commit_total")
    _wrap(txnlog, "_merge_impl", "merge_total")
    _wrap(txnlog, "compact", "compact_total")
    _wrap(txnlog, "optimize_zorder", "zorder_total")
    # the per-entry trips-feed derivation: catalog entries call
    # `trip_clean(...).transform(pin)` — pin (localCheckpoint) is
    # where the derivation actually executes, and catalog.py holds a
    # direct reference, so patch it in that namespace
    import azure_nyctaxi_lambda_elt_spark.plans.catalog as cat
    _wrap(cat, "pin", "pin_materialize")
    _wrap(tf, "trip_clean", "trip_clean_planbuild")

    spark = get_spark("phase-profile")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        for k in list(PHASES):
            PHASES[k] = 0.0
            CALLS[k] = 0
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: {total:.2f}s total")
        shown = 0.0
        for k in sorted(PHASES, key=lambda k: -PHASES[k]):
            if PHASES[k] < 0.005:
                continue
            print(f"  {k:28s} {PHASES[k]:7.2f}s  x{CALLS[k]}")
            if not k.endswith("_total"):
                shown += PHASES[k]
    spark.stop()


if __name__ == "__main__":
    main()
