"""Structural freshness report: per catalog entry, the last green
driver round, the commit that row attests, and whether the entry's
code/oracle dependency closure changed since — written to
FRESHNESS.json so staleness is visible mechanically instead of by
hand-audit.  Run: python tools/freshness_report.py"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")


def write_report(path="FRESHNESS.json"):
    from azure_nyctaxi_lambda_elt_spark.plans import catalog, freshness

    fresh = freshness.compute(catalog.QUERIES, catalog.ORACLES)
    order = freshness.plan_order(catalog.QUERIES, catalog.ORACLES)
    summary = {
        "never_checked": [k for k in order
                          if fresh[k]["last_checked_round"] is None],
        "latest_row_red": [
            k for k in order
            if fresh[k]["last_checked_round"] is not None
            and (fresh[k]["last_green_round"] is None
                 or fresh[k]["last_checked_round"]
                 > fresh[k]["last_green_round"])],
        "stale": [k for k in order if fresh[k]["stale"]],
        "fresh_green": [
            k for k in order
            if fresh[k]["last_green_round"] is not None
            and not fresh[k]["stale"]
            and fresh[k]["last_checked_round"]
            == fresh[k]["last_green_round"]],
        "window_head_50": order[:50],
    }
    with open(path, "w") as fh:
        json.dump({"summary": {k: len(v) if k != "window_head_50"
                               else v for k, v in summary.items()},
                   "order": order, "entries": fresh}, fh, indent=1)
    print(f"{path}: {len(fresh)} entries — "
          f"{len(summary['stale'])} stale, "
          f"{len(summary['never_checked'])} never checked, "
          f"{len(summary['latest_row_red'])} red, "
          f"{len(summary['fresh_green'])} fresh-green")
    return summary


if __name__ == "__main__":
    write_report()
