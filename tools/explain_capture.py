#!/usr/bin/env python
"""Capture .explain("formatted") for catalog entries into plans/r13/.

Usage:
    python tools/explain_capture.py before name1,name2,...
    python tools/explain_capture.py after  name1,name2,...

Runs each entry's builder at $SPARK_GRAFT_SF_DIR (default sf0.1) —
scenario entries execute their side effects while building — then
writes the formatted physical plan of the returned frame to
plans/r13/<name>_<tag>.txt.  The judge reads these files to check
plan-shape claims (Exchange count, join strategy, PushedFilters,
Python-eval nodes) against the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from azure_nyctaxi_lambda_elt_spark.session import get_spark
    from azure_nyctaxi_lambda_elt_spark.plans.catalog import QUERIES

    spark = get_spark("explain-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
