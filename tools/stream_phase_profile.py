#!/usr/bin/env python
"""Phase profiler for the txn STREAM entries (guide §1: measure first).

Splits txn_stream_read / txn_stream_backpressure wall time into:
  - source_build      build_txn_stream_source (3 trip_clean commits)
  - stream_lifecycle  each availableNow run: .start() .. awaitTermination
  - sink_commit       txnlog.commit calls made from foreachBatch
  - snapshot_read     txnlog.snapshot calls (drain test + final rollup)
  - first_action      everything else (plan/collect of the returned df)

Also reports, per stream lifecycle, the in-lifecycle split the VERDICT
asked for: time to q.start() returning (JVM stream-exec + Python
data-source worker spin-up + offset resolution) vs awaitTermination
(micro-batch planning + data plane + commits).

Usage: python tools/stream_phase_profile.py txn_stream_read[,txn_stream_backpressure]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)
LIFECYCLES: list[tuple[float, float]] = []


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
    from azure_nyctaxi_lambda_elt_spark.streaming import lane
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    _wrap(lane, "build_txn_stream_source", "source_build")
    _wrap(txnlog, "commit", "txn_commit_total")
    _wrap(txnlog, "snapshot", "snapshot_read")

    def run_available_now_timed(writer_builder):
        t0 = time.perf_counter()
        q = writer_builder.trigger(availableNow=True).start()
        t1 = time.perf_counter()
        q.awaitTermination()
        t2 = time.perf_counter()
        LIFECYCLES.append((t1 - t0, t2 - t1))
        PHASES["stream_lifecycle"] += t2 - t0
        CALLS["stream_lifecycle"] += 1

    lane._run_available_now = run_available_now_timed

    spark = get_spark("stream-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        PHASES.clear()
        CALLS.clear()
        LIFECYCLES.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_action = time.perf_counter() - t0
        total = t_build + t_action
        print(f"\n=== {name}: total {total:.2f}s "
              f"(build {t_build:.2f} + action {t_action:.2f})")
        for ph in sorted(PHASES, key=PHASES.get, reverse=True):
            print(f"  {ph:24s} {PHASES[ph]:7.2f}s  x{CALLS[ph]}")
        for i, (start_s, drain_s) in enumerate(LIFECYCLES):
            print(f"  lifecycle[{i}]: start() {start_s:.2f}s  "
                  f"awaitTermination {drain_s:.2f}s")


if __name__ == "__main__":
    main()
