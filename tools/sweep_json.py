"""Turn a driver_sim log into a committed sweep artifact.

Usage: python tools/sweep_json.py <driver_sim.log> <sf_dir> > SWEEP_rN.json

The r5/r6 verdicts cited the dual-scale oracle sweep (sf0.01 driver
scale + sf0.1, the 10x run that caught the round(double,6) knife-edge
class) but the evidence lived in builder-session history; this writes
it down as a repo artifact alongside FRESHNESS.json.
"""

from __future__ import annotations

import ast
import json
import re
import sys


def parse(log_path: str, sf_dir: str) -> dict:
    entries: dict[str, dict] = {}
    tail = ""
    with open(log_path, errors="replace") as fh:
        for raw in fh:
            # progress bars ride on \r within one physical line
            for line in raw.split("\r"):
                m = re.search(
                    r"\[\d+/\d+\] (\S+): (OK|FAIL|rows-only|SPARK ERR|"
                    r"ORACLE ERR)\s*(?:\((\d+) rows\))?\s*([\d.]+)?s?",
                    line)
                if m:
                    name, status, rows, secs = m.groups()
                    entries[name] = {
                        "status": {"OK": "pass",
                                   "rows-only": "rows_only"}.get(
                                       status, "fail"),
                        "rows": int(rows) if rows else None,
                        "seconds": float(secs) if secs else None,
                    }
                if " match (" in line:
                    tail = line.strip()
    m = re.search(r"(\d+)/(\d+) match \((\d+) full, (\d+) rows-only\)"
                  r".*fails=(\[.*\])", tail)
    summary = {}
    if m:
        summary = {"matched": int(m.group(1)), "total": int(m.group(2)),
                   "full_oracle": int(m.group(3)),
                   "rows_only": int(m.group(4)),
                   # literal_eval, not eval: log content includes
                   # echoed query names/strings and is not a trusted
                   # code source
                   "fails": ast.literal_eval(m.group(5))}
    return {"sf_dir": sf_dir, "summary": summary, "entries": entries}


if __name__ == "__main__":
    print(json.dumps(parse(sys.argv[1], sys.argv[2]), indent=1))
