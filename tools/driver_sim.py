"""Driver simulation: every __spark_entry__ query vs its DuckDB oracle
at sf0.01 (the driver's correctness scale), entry() smoke first."""
import datetime
import decimal
import hashlib
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1].split(",") if len(sys.argv) > 1 else None

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from azure_nyctaxi_lambda_elt_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(
        tuple(repr(norm(r[i])) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")

    if ONLY is None:
        edf = E.entry(spark)
        erows = edf.collect()
        print(f"entry(): {len(erows)} rows, schema ok", flush=True)

    qs = E.queries()
    ora = E.oracle_sql()
    fails, n_full, n_rows_only = [], 0, 0
    names = [k for k in qs if ONLY is None or k in ONLY]
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as ex:
            fails.append((name, f"spark_err: {ex}"))
            print(f"[{i+1}/{len(names)}] {name}: SPARK ERR {ex}",
                  flush=True)
            continue
        if name not in ora:
            n_rows_only += 1
            print(f"[{i+1}/{len(names)}] {name}: rows-only "
                  f"({len(srows)} rows) {time.time()-t0:.1f}s",
                  flush=True)
            continue
        try:
            cur = con.execute(ora[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            fails.append((name, f"oracle_err: {ex}"))
            print(f"[{i+1}/{len(names)}] {name}: ORACLE ERR {ex}",
                  flush=True)
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = (value_hash(scols, srows) == value_hash(ocols, orows)
                   if ok_rows and ok_schema else False)
        n_full += 1
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append((name, f"rows={ok_rows}({len(srows)}/{len(orows)}) "
                                f"schema={ok_schema} hash={ok_hash}"))
        print(f"[{i+1}/{len(names)}] {name}: {status} "
              f"({len(srows)} rows) {time.time()-t0:.1f}s", flush=True)
    print(f"\n{len(names)-len(fails)}/{len(names)} match "
          f"({n_full} full, {n_rows_only} rows-only); fails={fails}")
    if ONLY is None:
        try:  # structural staleness sidecar for the next verdict
            from tools.freshness_report import write_report
            write_report()
        except Exception as ex:
            print(f"freshness report skipped: {ex}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
